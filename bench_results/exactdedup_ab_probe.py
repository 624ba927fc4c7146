"""ExactDedup drift A/B (VERDICT r4 "What's wrong" #2).

Context: the driver-bench ExactDedup number drifted 2.06 s (r2) → 5.46 (r3)
→ 8.87 (r4) while `fingerprint`/`exact_duplicates` stayed BYTE-IDENTICAL to
the r2 commit (`git diff 209c371..HEAD -- iresearch_spark/textops.py` shows
the two functions unchanged; verified r5). The input is tiny — sf0.1
documents.parquet is 5 000 rows — so the op is pure fixed overhead, and the
drift must come from harness/session state, not the plan.

This probe isolates the two candidate causes in one session each:
  A. fresh session, op alone                      (the op's true cost)
  B. fresh session, after a bench-shaped load     (session-state attribution)
and runs both under driver 4g (current default) and 8g (the r2 default that
changed in 7f488f5), bracketed by the numpy ceiling probe. All samples print
unfiltered.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "7"))


def ceiling() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "ceiling_numpy_probe.py")],
        capture_output=True, text=True,
    )
    return json.loads(out.stdout.strip())


def run_case(mem: str, with_load: bool) -> list[float]:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    code = f"""
import json, os, sys, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import bench
from iresearch_spark import textops
spark = bench.make_spark(32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join({SF_DIR!r}, "documents.parquet"))
if {with_load!r}:
    # bench-shaped session state: a 20k-page build + the 16-task batch,
    # exactly what precedes ExactDedup in run_once
    reader, _ = bench.build_index(spark, 20_000, 32, tag="abload")
    terms = bench.pick_terms(reader)
    tasks = bench.reference_tasks(terms)
    bench.run_batch(reader, tasks, repeat=1)
samples = []
for _ in range({REPS}):
    t0 = time.time()
    textops.exact_duplicates(docs).count()
    samples.append(round(time.time() - t0, 3))
print("SAMPLES", json.dumps(samples))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("SAMPLES"):
            return json.loads(line.split(" ", 1)[1])
    print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
    return []


if __name__ == "__main__":
    print(json.dumps({"probe": "ceiling_pre", **ceiling()}))
    results = {}
    for mem in ("4g", "8g"):
        for with_load in (False, True):
            key = f"{mem}_{'postbench' if with_load else 'fresh'}"
            t0 = time.time()
            results[key] = run_case(mem, with_load)
            print(json.dumps({"case": key, "samples": results[key],
                              "wall_s": round(time.time() - t0, 1)}))
    print(json.dumps({"probe": "ceiling_post", **ceiling()}))
