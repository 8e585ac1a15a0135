"""Experiment: Pallas VMEM-resident bit-set vs XLA scatter.

Question (VERDICT round 1 / CLAUDE.md thread): can a Pallas kernel that
keeps the packed filter image in VMEM and performs scalar
read-modify-write bit sets beat XLA's scatter (~156 M updates/s measured
on the v5e) for the ingest filter-bit stage?

Shape: image 2^22 bits = [2^17] uint32 words laid out [1024, 128] in
VMEM (512 KiB); indices streamed in SMEM blocks over a sequential grid;
one scalar RMW per index inside a fori_loop.

Run: python tools/exp_pallas_bitset.py  (add JAX_PLATFORMS=cpu for the
interpret-mode correctness check only).

RESULT (v5e, measured 2026-08-17): XLA scatter 161.7 M updates/s;
Pallas VMEM row-RMW 106.0 M updates/s. Mosaic cannot store scalars to
VMEM, so the smallest possible RMW granularity is a (1, 128) lane row
(load + one-hot OR + store per index), and that loses to XLA's tuned
scatter loop by ~1.5x. Conclusion: XLA's scatter IS the filter-bit-set
floor on this hardware; the production path keeps it (with selected-row
compaction so only thresholded rows pay it).
"""

from __future__ import annotations

import os
import time

import numpy as np


LOG2_BITS = 22
W = (1 << LOG2_BITS) // 32          # packed words
ROWS, LANES = W // 128, 128
BLK = 1024                          # indices per grid step (SMEM block)
N = 1 << 20                         # total indices per pass


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"

    def kernel(idx_ref, out_ref):
        # Mosaic cannot store scalars to VMEM ("Cannot store scalars to
        # VMEM"), so the minimum RMW granularity is one (1, 128) lane row:
        # load the row, OR in a one-hot lane mask, store it back.
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(i, carry):
            ix = idx_ref[i]
            w = jax.lax.shift_right_logical(ix, 5)
            row = jax.lax.shift_right_logical(w, 7)
            col = w & 127
            bit = jnp.uint32(1) << (ix & 31).astype(jnp.uint32)
            onehot = jnp.where(lanes == col, bit, jnp.uint32(0))
            cur = out_ref[pl.ds(row, 1), :]
            out_ref[pl.ds(row, 1), :] = cur | onehot
            return carry

        jax.lax.fori_loop(0, BLK, body, 0)

    @jax.jit
    def pallas_bitset(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
            grid=(idx.shape[0] // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda g: (g,), memory_space=pltpu.SMEM)
            ],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda g: (0, 0)),
            interpret=interpret,
        )(idx)

    @jax.jit
    def xla_bitset(idx):
        img = jnp.zeros(1 << LOG2_BITS, jnp.uint8).at[idx].set(1, mode="drop")
        weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
        return (
            (img.reshape(-1, 32).astype(jnp.uint32) * weights)
            .sum(axis=1, dtype=jnp.uint32)
            .reshape(ROWS, LANES)
        )

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 1 << LOG2_BITS, size=N, dtype=np.int32))

    a = np.asarray(pallas_bitset(idx))
    b = np.asarray(xla_bitset(idx))
    assert np.array_equal(a, b), "pallas kernel does not match XLA scatter"
    print(f"correctness OK ({a.sum()} set-word population)")

    if interpret:
        print("interpret mode (no TPU): correctness only")
        return

    def rate(fn):
        @jax.jit
        def chained(idx, n):
            def body(i, acc):
                out = fn((idx + i) & jnp.int32((1 << LOG2_BITS) - 1))
                return acc + out[0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

        np.asarray(chained(idx, 1))
        res = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(chained(idx, 2)); lo = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(chained(idx, 10)); hi = time.perf_counter() - t0
            res.append((hi - lo) / 8)
        return N / sorted(res)[1] / 1e6

    print(f"XLA scatter:    {rate(xla_bitset):8.1f} M updates/s")
    print(f"Pallas VMEM RMW:{rate(pallas_bitset):8.1f} M updates/s")


if __name__ == "__main__":
    main()
