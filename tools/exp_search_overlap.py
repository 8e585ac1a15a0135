"""Can the search reduction hide under the gather DMA? (round 5)

SEARCH_PHASES_r05 proved the headline gap is the dependent reduction
scheduled serially after the seed gather: kmer tree AND +0.086 ms and
CSA popcount +0.055 ms on top of a 0.468 ms gather phase that already
sits AT the measured 179 GB/s W=512 gather ceiling.  The gather is
descriptor-issue-bound, not HBM-bandwidth-bound (819 GB/s peak), so in
principle the VPU reduction could run concurrently with the DMA — XLA
just declines to overlap them in the monolithic formulation.

This experiment measures chunked reformulations of ``counts_kernel``
and ``complete_kernel`` (reference analog kwage.cpp:404-433) that give
the scheduler an explicit opportunity to overlap:

  base       the production monolithic kernel (gather all nk, then fold)
  chunk      lax.scan over nk-chunks; body = gather chunk + fold chunk
             (gather of iteration i+1 is independent of the accumulator)
  prefetch   software pipeline: the loop carries the PREVIOUS chunk's
             gathered words; body = issue gather(chunk i) + fold(chunk
             i-1) — the two sides share no data dependency at all

at chunk sizes 128/256/512 on the exact bench shape.  All variants are
asserted bit-identical to the production kernels first (runs under the
CPU backend too, where only the parity check is meaningful).  Writes
OVERLAP_r{KWAGE_ROUND}.json.

RESULT (round 5, on chip): NEGATIVE — thread closed.  Same-process A/B
spreads (7 slopes per variant, one compile) show base and chunked
distributions overlapping almost entirely (complete med 0.504 vs
0.499 ms, counts 0.565 vs 0.545).  In the chained steady state XLA
already overlaps iteration i+1's seed gather with iteration i's
reduction — the same scheduling freedom that makes gather1 report
>HBM-peak — so pipelining *inside* the kernel adds nothing the outer
chain didn't.  Beware: separate-process comparisons under host load
showed a spurious 1.5x "win" (the base runs absorbed the load).
Production kernels stay monolithic; see OVERLAP_r05.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np

LOG2_L = int(os.environ.get("BENCH_LOG2_L", "22"))
FILES = 8
W = 64 * FILES
NQ = int(os.environ.get("BENCH_NQ", "8"))
NK = int(os.environ.get("BENCH_NK", "1024"))
NH = 5


def build_variants():
    import jax
    import jax.numpy as jnp

    from kwage_tpu.ops.search import (
        _CSA_GROUP,
        _gather_and_reduce_seeds,
        _plane_add,
    )

    def _fold_chunk_planes(acc, km, n_acc):
        """Fold a [nq, ck, W] chunk of match words into n_acc CSA planes.

        Mirrors the production counts_kernel group scan (small compiled
        body — tunnel compiles are expensive) but takes/returns a carried
        accumulator so chunks can stream through it.
        """
        nq, ck, Wl = km.shape
        ng = ck // _CSA_GROUP
        g = jnp.moveaxis(km.reshape(nq, ng, _CSA_GROUP, Wl), 1, 0)

        def step(a, grp):
            gp = [jnp.zeros((nq, Wl), jnp.uint32) for _ in range(6)]
            for k in range(_CSA_GROUP):
                carry = grp[:, k]
                for j in range(6):
                    t = gp[j] & carry
                    gp[j] = gp[j] ^ carry
                    carry = t
            new = _plane_add([a[j] for j in range(n_acc)], gp)[:n_acc]
            return jnp.stack(new), None

        out, _ = jax.lax.scan(step, acc, g)
        return out

    def _expand_planes(planes, n_acc):
        nq, Wl = planes.shape[1], planes.shape[2]
        shifts = jnp.arange(32, dtype=jnp.uint32)
        total = jnp.zeros((nq, Wl, 32), jnp.int32)
        for j in range(n_acc):
            total = total + (
                ((planes[j][..., None] >> shifts) & jnp.uint32(1)).astype(
                    jnp.int32) << j)
        return total.reshape(nq, Wl * 32)

    def counts_chunked(ck):
        def kern(db, idx, valid):
            nq, nk, nh = idx.shape
            n_acc = max(6, nk.bit_length())
            nc = nk // ck
            ix = jnp.moveaxis(idx.reshape(nq, nc, ck, nh), 1, 0)
            vd = jnp.moveaxis(valid.reshape(nq, nc, ck), 1, 0)

            def body(acc, xs):
                ixc, vdc = xs
                km = _gather_and_reduce_seeds(db, ixc, vdc)
                return _fold_chunk_planes(acc, km, n_acc), None

            acc0 = jnp.zeros((n_acc, nq, W), jnp.uint32)
            planes, _ = jax.lax.scan(body, acc0, (ix, vd))
            return _expand_planes(planes, n_acc)

        return kern

    def counts_prefetch(ck):
        def kern(db, idx, valid):
            nq, nk, nh = idx.shape
            n_acc = max(6, nk.bit_length())
            nc = nk // ck
            ix = jnp.moveaxis(idx.reshape(nq, nc, ck, nh), 1, 0)
            vd = jnp.moveaxis(valid.reshape(nq, nc, ck), 1, 0)
            km0 = _gather_and_reduce_seeds(db, ix[0], vd[0])

            def body(carry, xs):
                acc, km_prev = carry
                ixc, vdc = xs
                # gather(i) and fold(i-1) share no data dependency.
                km_next = _gather_and_reduce_seeds(db, ixc, vdc)
                acc = _fold_chunk_planes(acc, km_prev, n_acc)
                return (acc, km_next), None

            acc0 = jnp.zeros((n_acc, nq, W), jnp.uint32)
            (acc, km_last), _ = jax.lax.scan(
                body, (acc0, km0), (ix[1:], vd[1:]))
            acc = _fold_chunk_planes(acc, km_last, n_acc)
            return _expand_planes(acc, n_acc)

        return kern

    def complete_chunked(ck):
        def kern(db, idx, valid):
            nq, nk, nh = idx.shape
            nc = nk // ck
            ix = jnp.moveaxis(idx.reshape(nq, nc, ck, nh), 1, 0)
            vd = jnp.moveaxis(valid.reshape(nq, nc, ck), 1, 0)

            def body(acc, xs):
                ixc, vdc = xs
                km = _gather_and_reduce_seeds(db, ixc, vdc)
                km = jnp.where(vdc[:, :, None], km, jnp.uint32(0xFFFFFFFF))
                return acc & jax.lax.reduce(
                    km, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (1,)
                ), None

            acc0 = jnp.full((nq, W), 0xFFFFFFFF, jnp.uint32)
            acc, _ = jax.lax.scan(body, acc0, (ix, vd))
            return acc

        return kern

    def complete_prefetch(ck):
        def kern(db, idx, valid):
            nq, nk, nh = idx.shape
            nc = nk // ck
            ix = jnp.moveaxis(idx.reshape(nq, nc, ck, nh), 1, 0)
            vd = jnp.moveaxis(valid.reshape(nq, nc, ck), 1, 0)

            def gath(ixc, vdc):
                km = _gather_and_reduce_seeds(db, ixc, vdc)
                return jnp.where(vdc[:, :, None], km,
                                 jnp.uint32(0xFFFFFFFF))

            km0 = gath(ix[0], vd[0])

            def body(carry, xs):
                acc, km_prev = carry
                km_next = gath(*xs)
                acc = acc & jax.lax.reduce(
                    km_prev, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and,
                    (1,))
                return (acc, km_next), None

            acc0 = jnp.full((nq, W), 0xFFFFFFFF, jnp.uint32)
            (acc, km_last), _ = jax.lax.scan(
                body, (acc0, km0), (ix[1:], vd[1:]))
            return acc & jax.lax.reduce(
                km_last, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (1,))

        return kern

    return (counts_chunked, counts_prefetch,
            complete_chunked, complete_prefetch)


def main() -> int:
    from kwage_tpu.utils.runtime import pin_platform_from_env

    pin_platform_from_env()
    import jax
    import jax.numpy as jnp

    from kwage_tpu.ops.search import complete_kernel, counts_kernel

    on_tpu = jax.devices()[0].platform == "tpu"
    # Parity runs on the CPU backend at a small shape (the code paths are
    # shape-independent); the TPU run benches only — each extra compile
    # through this box's tunnel costs 12-80 s.
    log2 = LOG2_L if on_tpu else 14
    nk = NK if on_tpu else 256
    chunks = (512, 256, 128) if on_tpu else (64, 128, 256)
    (counts_chunked, counts_prefetch,
     complete_chunked, complete_prefetch) = build_variants()

    key = jax.random.key(0)
    db = jax.jit(
        lambda k: jax.random.bits(k, (1 << log2, W), dtype=jnp.uint32)
    )(key)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, 1 << log2, size=(NQ, nk, NH), dtype=np.int32))
    valid_np = np.ones((NQ, nk), dtype=bool)
    valid_np[1, (nk * 7) // 10:] = False  # exercise padding semantics
    valid = jnp.asarray(valid_np)
    mask = jnp.int32((1 << log2) - 1)

    if not on_tpu:
        # -- parity gate: every variant bit-identical to production ------
        ref_counts = np.asarray(jax.jit(counts_kernel)(db, idx, valid))
        ref_complete = np.asarray(jax.jit(complete_kernel)(db, idx, valid))
        for ck in chunks:
            for name, mk, ref in (
                    ("counts_chunk", counts_chunked, ref_counts),
                    ("counts_prefetch", counts_prefetch, ref_counts),
                    ("complete_chunk", complete_chunked, ref_complete),
                    ("complete_prefetch", complete_prefetch, ref_complete)):
                got = np.asarray(jax.jit(mk(ck))(db, idx, valid))
                assert (got == ref).all(), (name, ck)
        print(json.dumps({"parity": "ok", "platform": "cpu",
                          "nk": nk, "chunks": chunks}), flush=True)
        return 0

    def chained(kern, reducer):
        @jax.jit
        def run(db, idx, valid, n):
            def body(i, acc):
                ix = (idx + i) & mask
                return acc + reducer(kern(db, ix, valid))
            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

        np.asarray(run(db, idx, valid, 1))

        def measure(n_lo=2, n_hi=50):
            res = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(run(db, idx, valid, n_lo))
                lo = time.perf_counter() - t0
                t0 = time.perf_counter()
                np.asarray(run(db, idx, valid, n_hi))
                hi = time.perf_counter() - t0
                res.append((hi - lo) / (n_hi - n_lo))
            return sorted(res)[len(res) // 2]

        dt = measure()
        return {"ms_per_iter": round(dt * 1e3, 3),
                "kmer_queries_per_s": round(NQ * nk * FILES / dt, 1)}

    r_counts = lambda x: x.sum(dtype=jnp.int32).astype(jnp.uint32)  # noqa: E731
    r_complete = lambda x: x.sum(dtype=jnp.uint32)  # noqa: E731

    out = {"shape": {"log2_rows": log2, "row_bytes": W * 4,
                     "files": FILES, "nq": NQ, "nk": nk, "seeds": NH},
           "variants": {}}
    out["variants"]["counts_base"] = chained(counts_kernel, r_counts)
    out["variants"]["complete_base"] = chained(complete_kernel, r_complete)
    for ck in chunks:
        out["variants"][f"counts_chunk{ck}"] = chained(
            counts_chunked(ck), r_counts)
        out["variants"][f"counts_prefetch{ck}"] = chained(
            counts_prefetch(ck), r_counts)
        out["variants"][f"complete_chunk{ck}"] = chained(
            complete_chunked(ck), r_complete)
        out["variants"][f"complete_prefetch{ck}"] = chained(
            complete_prefetch(ck), r_complete)
        print(json.dumps({k: v for k, v in out["variants"].items()
                          if str(ck) in k}), flush=True)

    print(json.dumps(out), flush=True)
    rnd = os.environ.get("KWAGE_ROUND", "05")
    with open(os.path.join(_REPO_ROOT, f"OVERLAP_r{rnd}.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
