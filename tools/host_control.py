#!/usr/bin/env python
"""Host-phase control microbenchmark (BENCH.md §1) — prints ONE JSON line.

The sandbox host's deliverable throughput swings ~4x on a timescale of
minutes (shared-VM noisy neighbors, BENCH.md §1), so any engine scaling
pair must be read against the host's SAME-SESSION ceiling.  This probe
measures, with the same taskset pinning the engine pairs use:

- ``cpu_1`` / ``cpu_4``: fixed TOTAL work (sha256 chains) split across 1
  vs 4 pinned workers → strong-scaling efficiency ``cpu_eff``.  On a quiet
  host 1→4 is ~1.0 (four real cores); a sagging value means the host is in
  a phase where even pure CPU doesn't scale — an engine pair measured in
  the same minutes inherits that ceiling.
- ``mem_1`` / ``mem_4``: fixed PER-WORKER work (200 MB numpy copies) at 1
  vs 4 pinned workers → weak-scaling efficiency ``mem_eff``.  This is the
  shared-memory-bus ceiling for bandwidth-bound engine shapes
  (positions+offsets builds).

Usage: ``python tools/host_control.py`` — run immediately before/after a
``bench.py --scaling`` pair and record both lines next to the pair.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import time


def _pin(cpu: int) -> None:
    try:
        os.sched_setaffinity(0, {cpu})
    except (AttributeError, OSError):
        pass


def _cpu_work(args) -> float:
    cpu, chains = args
    _pin(cpu)
    t0 = time.time()
    for i in range(chains):
        h = hashlib.sha256(str(i).encode())
        for _ in range(2000):
            h = hashlib.sha256(h.digest())
    return time.time() - t0


def _mem_work(args) -> float:
    cpu, copies = args
    _pin(cpu)
    import numpy as np

    a = np.random.default_rng(0).integers(0, 255, size=200 * 1024 * 1024 // 8, dtype="int64")
    b = np.empty_like(a)
    t0 = time.time()
    for _ in range(copies):
        np.copyto(b, a)
        np.copyto(a, b)
    return time.time() - t0


def _run(fn, n_workers: int, per_worker_arg: int) -> float:
    """Slowest worker's SELF-MEASURED duration across n_workers pinned
    processes.  The workers time only their measured loop, so process
    spawn, numpy import and the 200 MB RNG array generation stay out of
    the number (pool wall-clock included them — ~0.3-0.6 s, comparable to
    the mem measurement itself, skewing mem_gbps_1w up to ~2× low).
    Sessions logged before 2026-08-18T23:00 used the wall-clock variant;
    their controls are phase INDICATORS (pre/post within one session,
    same method both ends), so the comparison they support is unchanged."""
    ctx = mp.get_context("spawn")
    with ctx.Pool(n_workers) as pool:
        return max(pool.map(fn, [(i, per_worker_arg) for i in range(n_workers)]))


def main() -> None:
    # CPU: fixed total work (3200 chains, ~4 s at 1 worker on a quiet host)
    # -> strong scaling.  Big enough that pool spawn (~0.3 s) is noise.
    cpu_1 = _run(_cpu_work, 1, 3200)
    cpu_4 = _run(_cpu_work, 4, 800)
    # MEM: fixed per-worker work (4 round-trip copies of 200 MB) -> weak
    # scaling.  Also report absolute single-worker bandwidth: on this host
    # memcpy itself has been observed anywhere from 0.3 to >5 GB/s across
    # phases, and the absolute number is the phase indicator.
    mem_1 = _run(_mem_work, 1, 4)
    mem_4 = _run(_mem_work, 4, 4)
    print(json.dumps({
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "cpu_1": round(cpu_1, 2),
        "cpu_4": round(cpu_4, 2),
        "cpu_eff": round(cpu_1 / (4 * cpu_4), 3),
        "mem_1": round(mem_1, 2),
        "mem_4": round(mem_4, 2),
        "mem_eff": round(mem_1 / mem_4, 3),
        "mem_gbps_1w": round(4 * 2 * 0.2 / mem_1, 2),
    }))


if __name__ == "__main__":
    main()
