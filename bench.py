"""Headline benchmark: k-mer query throughput of the bit-slice AND-reduce
search kernel on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: a 2**22-row signature matrix fused 8 database files wide
(8 x 2048 filters = 512 uint32 words per slice row, 8 GiB in HBM -- fusing
same-shape shards amortizes the per-row gather cost, the dominant term;
seeds gather sequentially so the intermediate stays one [nq,nk,W] array),
batched queries of 1024 unique 31-mers each, 5 hash seeds (MAX_NUM_HASH,
the most expensive legal configuration). One "k-mer query" = 5 slice-row
probes + AND across seeds + hit-count accumulation over ONE 2048-filter
database file (the reference's unit of search work, kwage.cpp:404-433);
the fused kernel completes 8 of them per gathered row.

Timing is device-chained: N dependent kernel iterations run inside one
jit (indices perturbed per iteration so nothing hoists), timed by the
slope between two N values with a final host readback -- dispatch latency
and the host<->device tunnel never enter the measurement.

``vs_baseline`` is measured in-run against the host (numpy, single core)
engine on the same workload -- the same algorithm the reference kwage
binary executes per file with an in-memory matrix (its per-(k-mer, seed)
disk-seek path, kwage.cpp:404-433, is strictly slower). The reference
publishes no absolute numbers (BASELINE.md), so the CPU-oracle-equivalent
is the denominator.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Env overrides exist for small-scale smoke runs (tests); defaults are the
# headline configuration.
LOG2_L = int(os.environ.get("BENCH_LOG2_L", "22"))
FILES = int(os.environ.get("BENCH_FILES", "8"))  # same-shape files fused
W = 64 * FILES         # uint32 words per slice row (2048 filters per file)
NQ = int(os.environ.get("BENCH_NQ", "8"))
NK = int(os.environ.get("BENCH_NK", "1024"))
NH = 5


def main() -> None:
    # Test hook: emulate the transient chip dropout — fail until the marker
    # file exists (created on the way down), so the NEXT attempt succeeds.
    marker = os.environ.get("KWAGE_BENCH_FAIL_MARKER")
    if marker and not os.path.exists(marker):
        open(marker, "w").close()
        raise RuntimeError("injected transient backend failure")

    from kwage_tpu.utils.runtime import pin_platform_from_env

    pin_platform_from_env()
    import jax
    # Persistent compile cache: repeat runs skip the 20-40 s first compile.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/kwage_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from kwage_tpu.ops.search import search_complete, search_counts

    # Generate the multi-GiB database ON DEVICE: host RNG + the tunnel transfer
    # would cost minutes and measure nothing (the real pipeline writes the
    # matrix once and queries it many times).
    key = jax.random.key(0)
    db = jax.jit(
        lambda k: jax.random.bits(k, (1 << LOG2_L, W), dtype=jnp.uint32)
    )(key)

    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, 1 << LOG2_L, size=(NQ, NK, NH), dtype=np.int32)
    )
    valid = jnp.ones((NQ, NK), dtype=bool)
    mask = jnp.int32((1 << LOG2_L) - 1)

    @jax.jit
    def chained(db, idx, valid, n):
        def body(i, acc):
            ix = (idx + i) & mask
            return acc + search_counts(db, ix, valid).sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    np.asarray(chained(db, idx, valid, 1))  # compile + warm

    def measure(n_lo: int, n_hi: int) -> float:
        res = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(chained(db, idx, valid, n_lo))
            lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(chained(db, idx, valid, n_hi))
            hi = time.perf_counter() - t0
            res.append((hi - lo) / (n_hi - n_lo))
        return sorted(res)[len(res) // 2]  # median

    # Spread: 5 independent slope measurements (each itself a median of 5
    # chained-pair samples). VERDICT r04 flagged a 7% single-sample dip
    # (124.0 -> 114.8 across rounds) that nothing could classify as noise
    # or regression; min/median/max of the headline metric travels with
    # the number from now on.
    rates = sorted(NQ * NK * FILES / measure(2, 50) for _ in range(5))
    tpu_rate = rates[len(rates) // 2]  # 2048-filter file-equivalents

    # Complete-match path (the reference's DEFAULT, threshold=1.0,
    # kwage.cpp:377-384): AND-reduce across k-mers instead of CSA counts.
    @jax.jit
    def chained_complete(db, idx, valid, n):
        def body(i, acc):
            ix = (idx + i) & mask
            return acc + search_complete(db, ix, valid).sum(dtype=jnp.uint32)
        return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

    np.asarray(chained_complete(db, idx, valid, 1))

    def measure_complete(n_lo: int, n_hi: int) -> float:
        res = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(chained_complete(db, idx, valid, n_lo))
            lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(chained_complete(db, idx, valid, n_hi))
            hi = time.perf_counter() - t0
            res.append((hi - lo) / (n_hi - n_lo))
        return sorted(res)[len(res) // 2]

    complete_rate = NQ * NK * FILES / measure_complete(2, 50)

    # Host (single-core numpy) baseline, same reduction on one 2048-filter
    # file. A 2^19-row host matrix (128 MiB, well past L3) keeps the host
    # gather memory-bound like the full matrix would be, without the 30 s
    # host-RNG cost of materializing gigabytes on CPU.
    H_LOG2, HW = min(19, LOG2_L), 64
    HK = min(256, NK)
    db_host = rng.integers(0, 1 << 32, size=(1 << H_LOG2, HW), dtype=np.uint32)
    h_idx = np.asarray(idx[:1, :HK]) & ((1 << H_LOG2) - 1)

    def cpu_pass() -> float:
        t0 = time.perf_counter()
        rows = db_host[h_idx.reshape(-1)].reshape(1, HK, NH, HW)
        km = rows[:, :, 0, :]
        for h in range(1, NH):
            km = km & rows[:, :, h, :]
        bits = np.unpackbits(km.view(np.uint8), axis=-1, bitorder="little")
        _ = bits.reshape(1, HK, -1).sum(axis=1)
        return time.perf_counter() - t0

    cpu_pass()  # warm-up: first-touch faults, allocator
    cpu_dt = sorted(cpu_pass() for _ in range(5))[2]
    cpu_rate = HK / cpu_dt

    print(
        json.dumps(
            {
                "metric": "kmer_queries_per_sec_per_chip",
                "value": round(tpu_rate, 1),
                "unit": f"kmer-queries/s (2048-filter files, 5 seeds, 2^{LOG2_L} rows, {FILES} files fused)",
                "vs_baseline": round(tpu_rate / cpu_rate, 2),
                "complete_match_kmer_queries_per_sec": round(complete_rate, 1),
                "spread": {
                    "n": len(rates),
                    "min": round(rates[0], 1),
                    "median": round(tpu_rate, 1),
                    "max": round(rates[-1], 1),
                },
            }
        )
    )


def _run_with_retries() -> int:
    """Re-exec the measurement in fresh subprocesses, retrying on failure.

    The tunneled TPU backend on this box occasionally drops out transiently
    (backend init errors that fail every device call in seconds). A backend
    failure is sticky for the process that hit it, so each attempt is a
    fresh interpreter; stdout (the single JSON line) is forwarded verbatim
    on success.
    """
    delays = tuple(
        float(d) for d in
        os.environ.get("KWAGE_BENCH_RETRY_DELAYS", "0,30,120,300").split(","))
    # Bounded per attempt: a DOWN chip hangs in backend init with no
    # output, and 4 unbounded attempts would stall the driver for hours.
    # 1800 s comfortably covers the real run (4 jit shapes at 12-80 s
    # tunnel compiles + measurement).
    attempt_timeout = float(os.environ.get("KWAGE_BENCH_ATTEMPT_TIMEOUT", "1800"))
    last = None
    for i, delay in enumerate(delays):
        if delay:
            print(f"bench: retrying in {delay}s (attempt {i + 1}/{len(delays)})",
                  file=sys.stderr, flush=True)
            time.sleep(delay)
        env = dict(os.environ, KWAGE_BENCH_INNER="1")
        try:
            last = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=attempt_timeout)
        except subprocess.TimeoutExpired as e:
            print(f"bench: attempt {i + 1} timed out after {attempt_timeout}s",
                  file=sys.stderr, flush=True)
            last = e
            continue
        if last.returncode == 0 and '"metric"' in last.stdout:
            sys.stdout.write(last.stdout)
            sys.stdout.flush()
            return 0
        tail = (last.stderr or "").strip().splitlines()[-8:]
        print("bench: attempt %d failed (rc=%s)\n%s"
              % (i + 1, last.returncode, "\n".join(tail)),
              file=sys.stderr, flush=True)
    # Every attempt failed (chip down hard): emit one structured line so
    # the recorded artifact says WHY there is no measurement, instead of
    # silently producing nothing. value 0 is unmistakably not a result.
    print(json.dumps({
        "metric": "kmer_file_queries_per_sec",
        "value": 0, "unit": "kq/s", "vs_baseline": 0,
        "error": "accelerator unreachable after all retry attempts",
    }), flush=True)
    return 1


if __name__ == "__main__":
    if os.environ.get("KWAGE_BENCH_INNER"):
        main()
    else:
        sys.exit(_run_with_retries())
