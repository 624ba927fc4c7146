"""Hardware-ceiling probe: what does 2->8 (and 8->32) of PROCESS parallelism
deliver on this box for pure-CPU work? Establishes the machine's own scaling
ceiling that any local[N] comparison is bounded by (no Spark involved)."""

import json
import multiprocessing as mp
import time


def spin(q, seconds):
    t0 = time.time()
    n = 0
    x = 1.0
    while time.time() - t0 < seconds:
        for _ in range(10000):
            x = x * 1.0000001 + 1e-9
        n += 10000
    q.put(n)


def run(workers: int, seconds: float = 6.0) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=spin, args=(q, seconds)) for _ in range(workers)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


if __name__ == "__main__":
    out = {}
    for w in (2, 8, 32):
        out[str(w)] = round(run(w))
    out["eff_2_to_8"] = round(out["8"] / out["2"] / 4, 3)
    out["eff_8_to_32"] = round(out["32"] / out["8"] / 4, 3)
    print(json.dumps(out))
