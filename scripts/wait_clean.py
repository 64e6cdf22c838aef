"""Block until the host window is clean (hypervisor steal below a bound).

Today's host oscillates between ~0.05% and ~4% steal on a minutes
timescale; per SCALE.md §0 numbers from dirty windows are not
comparable. Poll steal over PROBE_S-second samples and exit when a
sample is below --max (default 0.8%), or after --timeout minutes
(exit code 1) so callers can decide to proceed with a dirty-window
annotation instead of blocking forever.

Usage: python scripts/wait_clean.py [--max 0.8] [--timeout 30]
"""

from __future__ import annotations

import argparse
import sys
import time

PROBE_S = 5


def steal_sample() -> float:
    def t():
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return v[7], sum(v)

    a, b = t()
    time.sleep(PROBE_S)
    c, d = t()
    return 100.0 * (c - a) / max(1, d - b)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=float, default=0.8)
    ap.add_argument("--timeout", type=float, default=30.0, help="minutes")
    args = ap.parse_args()
    t0 = time.time()
    while True:
        s = steal_sample()
        if s <= args.max:
            print(f"clean: steal {s:.2f}%")
            return 0
        if (time.time() - t0) / 60 > args.timeout:
            print(f"timeout: steal still {s:.2f}%")
            return 1
        print(f"dirty: steal {s:.2f}%, waiting...", flush=True)
        time.sleep(25)


if __name__ == "__main__":
    sys.exit(main())
