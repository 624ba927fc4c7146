"""Same-session numpy-kernel-shape ceiling: what 2->8 process parallelism
delivers for the query kernels' workload class (vbyte-ish delta cumsum +
float scoring over ~50 MB working sets) — the memory-bandwidth-bound ceiling
any local[2] vs local[8] comparison of this engine is bounded by. No Spark."""

import json
import multiprocessing as mp
import time


def kernel_spin(q, seconds):
    import numpy as np

    n = 6_500_000  # ~52 MB int64
    deltas = (np.arange(n, dtype=np.int64) % 7) + 1
    t0 = time.time()
    iters = 0
    while time.time() - t0 < seconds:
        ids = np.cumsum(deltas)
        tf = (ids % 13).astype(np.float64)
        s = 2.2 * 3.1 * tf / (0.3 + 0.9 * 1.07 + tf)
        iters += 1
        if s[0] < -1:  # never — keeps the work live
            break
    q.put(iters)


def run(workers: int, seconds: float = 8.0) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=kernel_spin, args=(q, seconds)) for _ in range(workers)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


if __name__ == "__main__":
    out = {}
    for w in (2, 8):
        out[str(w)] = round(run(w), 2)
    out["eff_2_to_8"] = round(out["8"] / out["2"] / 4, 3)
    print(json.dumps(out))
