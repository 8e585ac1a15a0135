"""VERDICT r3 #10: does sorting gather row indices (row-run locality)
beat random order on the TPU slice-row gather?

Context: the search kernel's cost is the per-row gather descriptor issue,
not HBM traffic (CLAUDE.md: same-row-repeated gathers run SLOWER than
random at 2 KiB rows -- 97 vs 112 GB/s). If sorted-ascending indices
gather no faster than random, reordering query slice indices
(kwage.cpp:404-433 probe-loop analog) cannot help end-to-end and the
thread closes with a measured negative.

Variants over the SAME index multiset, [N] flat gather from a
[2^18, W] uint32 matrix (2 KiB rows at W=512, the production fused
width):
  random   -- baseline (what make_query_batch produces today)
  sorted   -- fully ascending (best-case row-run locality)
  blocked  -- sorted within 1024-index blocks (what a cheap per-batch
              device sort could realistically provide)

Timing: device-chained fori_loop, input perturbed per iteration with an
offset that PRESERVES relative order except at one wrap point, slope
between two N, readback at the end (CLAUDE.md measurement discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


LOG2_L = 18
W = 512          # words/row = 2 KiB rows (production fused width)
N = 1 << 16      # gathered rows per pass


def main() -> None:
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    db = jax.jit(
        lambda k: jax.random.bits(k, (1 << LOG2_L, W), dtype=jnp.uint32)
    )(key)

    rng = np.random.default_rng(1)
    base = rng.integers(0, 1 << LOG2_L, size=N, dtype=np.int32)
    variants = {
        "random": base,
        "sorted": np.sort(base),
        "blocked1024": np.concatenate(
            [np.sort(c) for c in base.reshape(-1, 1024)]
        ),
    }
    mask = jnp.int32((1 << LOG2_L) - 1)

    @jax.jit
    def chained(db, idx, n):
        def body(i, acc):
            ix = (idx + i) & mask
            return acc + db[ix].sum(dtype=jnp.uint32)
        return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

    bytes_per_pass = N * W * 4

    def measure(idx_np: np.ndarray) -> float:
        idx = jnp.asarray(idx_np)
        np.asarray(chained(db, idx, 1))  # compile + warm
        res = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(chained(db, idx, 2))
            lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(chained(db, idx, 34))
            hi = time.perf_counter() - t0
            res.append((hi - lo) / 32)
        return sorted(res)[len(res) // 2]

    out = {"shape": [1 << LOG2_L, W], "gathered_rows": N,
           "platform": jax.devices()[0].platform, "gbps": {}}
    for name, idx_np in variants.items():
        per = measure(idx_np)
        out["gbps"][name] = round(bytes_per_pass / per / 1e9, 1)
    out["sorted_vs_random"] = round(
        out["gbps"]["sorted"] / out["gbps"]["random"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
