#!/usr/bin/env python3
"""Host parallel-capacity ceiling: a perfectly-parallel pure-CPU burn
(md5 chains, zero shared state) at increasing worker counts. On a dedicated
host every ratio would be ~1.0; on this virtualized guest the hypervisor
steals CPU, so the measured ceiling bounds what ANY job (including a
perfectly linear Spark stage) can show for 4x-scaling efficiency.

Usage: python3 tools/host_ceiling.py [seconds-per-point]
"""
import hashlib
import multiprocessing as mp
import sys
import time


def burn(args):
    deadline, = args
    h = b"x"
    n = 0
    while time.time() < deadline:
        for _ in range(1000):
            h = hashlib.md5(h).digest()
        n += 1000
    return n


def measure(workers, secs):
    deadline = time.time() + secs
    with mp.Pool(workers) as p:
        counts = p.map(burn, [(deadline,)] * workers)
    return sum(counts) / secs


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    points = [1, 4, 8, 16, 32]
    rates = {}
    print("| workers | md5/s | efficiency vs 4x fewer |")
    print("|---|---|---|")
    for w in points:
        rates[w] = measure(w, secs)
        base = rates.get(w // 4)
        eff = f"{rates[w] / (4 * base):.2f}" if base else "-"
        print(f"| {w} | {rates[w]:,.0f} | {eff} |")


if __name__ == "__main__":
    main()
