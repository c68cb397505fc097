"""Effective-parallelism probe (r4): measures how many PHYSICAL cores
actually back this VM's 32 vCPUs right now.

Why: the scaling criterion (8 -> 32 cpu efficiency >= 0.8) silently
assumes 32 schedulable cores. This box is a shared VM; guest 'steal'
accounting stays in single digits even when the host oversubscribes,
so the honest probe is throughput: run the SAME pure-Python spin
single-process and 32-way, and report aggregate/single. If that ratio
is ~11, a 32-cpu Ray leg can only ever run ~11/8 = 1.4x faster than
an 8-cpu leg no matter how well the engine scales — the efficiency
number measures the HOST, not the code. Run this before/after any
scaling measurement and record both numbers next to it.

Usage: python tools/effective_cores.py [seconds_per_leg]
Prints one JSON line: {"single_mps", "par32_mps", "effective_cores"}.
"""
import json
import multiprocessing as mp
import sys
import time


def spin(seconds: float, q=None):
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < seconds:
        x += 1
    if q is not None:
        q.put(x)
    return x


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    spin(1.0)  # warm
    single = spin(secs) / secs / 1e6
    q = mp.Queue()
    ps = [
        mp.Process(target=spin, args=(secs, q)) for _ in range(32)
    ]
    for p in ps:
        p.start()
    total = 0
    for _ in ps:
        total += q.get()
    for p in ps:
        p.join()
    par = total / secs / 1e6
    print(
        json.dumps(
            {
                "single_mps": round(single, 2),
                "par32_mps": round(par, 2),
                "effective_cores": round(par / single, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
