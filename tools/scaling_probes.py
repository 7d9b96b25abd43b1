"""Spark-free scaling probes for the eta attribution in BENCH.md.

Two microbenchmarks bracket what ANY operator can scale to on this host:

- alu: cache-resident integer mixing (pure compute, ~zero memory traffic).
  Round-4 measurement: 4.4 / 8.3 / 25.8 / 50.0 / 84.7 units/s at
  1/2/8/16/32 procs -> eta(2->8) ~ 0.78, eta(8->32) ~ 0.82. Compute-bound
  kernels CAN scale on this VM.
- stream: large numpy a*x+b (pure memory streaming). Round-2 measurement:
  0.8 / 2.0 / 4.4 / 1.0 GB/s at 1/8/16/32 procs -> streaming stops scaling
  past ~16 threads (eta(8->32) ~ 0.12) and gains only ~1.6x from 2->8.

Every suite query lands between the two in proportion to its bytes/op:
window chains (sort + 3 streaming passes) track the stream curve
(session_locf eta(2->8) 0.39), hash-heavy aggregation and the forest
kernel track the ALU curve (token_rollup 0.62, minhash 0.66, forest kernel
0.72 under multiprocessing).

Usage: python tools/scaling_probes.py [alu|stream]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np


def _alu(_):
    x = np.arange(200_000, dtype=np.uint64)
    for _ in range(300):
        x = x * np.uint64(0x9E3779B97F4A7C15) + np.uint64(12345)
        x ^= x >> np.uint64(29)
    return int(x[0])


def _stream(_):
    a = np.ones(20_000_000)  # 160 MB
    for _ in range(10):
        a = a * 1.000001 + 0.5
    return float(a[0])


def run(kind: str) -> None:
    work = _alu if kind == "alu" else _stream
    unit_bytes = 0 if kind == "alu" else 160e6 * 10 * 2  # rd+wr per unit
    for procs in (1, 2, 8, 16, 32):
        with mp.Pool(procs) as p:
            t0 = time.time()
            p.map(work, range(procs * 2))
            dt = time.time() - t0
        rate = procs * 2 / dt
        extra = f" ({rate * unit_bytes / 1e9:.1f} GB/s)" if unit_bytes else ""
        print(f"{procs:3d} procs: {rate:8.2f} units/s{extra}", flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "alu")
