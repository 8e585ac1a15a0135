"""Headline benchmark: k-mer query throughput of the bit-slice AND-reduce
search kernel on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload: a 2**22-row signature matrix packed for 2048 filters (the
reference's MAX_NUM_FILTER_CHUNK per database file, 1 GiB in HBM), batched
queries of 1024 unique 31-mers each, 5 hash seeds (MAX_NUM_HASH, the most
expensive legal configuration). One "k-mer query" = 5 slice-row probes +
an AND-reduce + hit accumulation across all 2048 filters.

``vs_baseline`` is measured in-run against the host (numpy, single core)
engine on the same database -- the same algorithm the reference kwage
binary executes per file with an in-memory matrix (its disk-seek path is
strictly slower). The reference publishes no absolute numbers
(BASELINE.md), so the CPU-oracle-equivalent is the denominator.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kwage_tpu.ops.search import search_counts

    LOG2_L = 22
    W = 64                 # 2048 filters / 32 bits per word
    NQ, NK, NH = 8, 1024, 5
    ITERS = 30

    # Generate the 1 GiB database ON DEVICE: host RNG + the tunnel transfer
    # cost ~60 s and measure nothing (the real pipeline writes the matrix
    # once and queries it many times).
    key = jax.random.key(0)
    db = jax.jit(
        lambda k: jax.random.bits(k, (1 << LOG2_L, W), dtype=jnp.uint32)
    )(key)
    db.block_until_ready()

    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, 1 << LOG2_L, size=(NQ, NK, NH), dtype=np.int32)
    )
    valid = jnp.ones((NQ, NK), dtype=bool)

    fn = jax.jit(search_counts)
    fn(db, idx, valid).block_until_ready()  # compile + warm

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(db, idx, valid)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    tpu_rate = NQ * NK * ITERS / dt

    # Host (single-core numpy) baseline on a smaller sample, same reduction.
    # A 2^19-row host matrix (128 MiB, well past L3) keeps the host gather
    # memory-bound like the full matrix would be, without the 30 s host-RNG
    # cost of materializing all 1 GiB on CPU.
    H_LOG2 = 19
    db_host = rng.integers(0, 1 << 32, size=(1 << H_LOG2, W), dtype=np.uint32)
    h_idx = np.asarray(idx[:1, :256]) & ((1 << H_LOG2) - 1)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        rows = db_host[h_idx.reshape(-1)].reshape(1, 256, NH, W)
        km = rows[:, :, 0, :]
        for h in range(1, NH):
            km = km & rows[:, :, h, :]
        bits = np.unpackbits(km.view(np.uint8), axis=-1, bitorder="little")
        _ = bits.reshape(1, 256, -1).sum(axis=1)
    cpu_dt = time.perf_counter() - t0
    cpu_rate = 256 * reps / cpu_dt

    print(
        json.dumps(
            {
                "metric": "kmer_queries_per_sec_per_chip",
                "value": round(tpu_rate, 1),
                "unit": "kmer-queries/s (2048 filters, 5 seeds, 2^22-row matrix)",
                "vs_baseline": round(tpu_rate / cpu_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
