"""Device phases of the production-L proof, against a kept
run_at_scale_prodL.py workdir (so the 17 GB corpus is built once and the
chip-dependent phases can run whenever the tunneled chip is actually up).

Usage: python tools/run_prodL_device.py /tmp/prodL_r05
Appends its phase rows into ATSCALE_PRODL_r{KWAGE_ROUND}.json.

Phases:
  - search_device: kwage --device CLI over the >HBM corpus (the fusion
    budget streams it in chunks), byte-identical to the host CLI;
  - sharded_wave_search: ShardedDatabase groups under the device's REAL
    HBM budget -- the 16 GiB fused matrix cannot be single-wave, so the
    wave streaming is forced by genuine memory pressure (VERDICT r04
    task 1); records wave plan + hit-list parity vs the host engine;
  - maestro_device_build_{cold,warm} at L=26 (SCALE_DEVICE_N accessions,
    default 256).
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import subprocess
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = _REPO_ROOT + (
    os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH") else "")

from run_at_scale_prodL import LPROD, K, _wave_proof  # noqa: E402


def _rss_mb() -> float:
    ru = resource.getrusage(resource.RUSAGE_SELF)
    rc = resource.getrusage(resource.RUSAGE_CHILDREN)
    return (ru.ru_maxrss + rc.ru_maxrss) / 1024.0


def log(results, phase: str, **kw) -> dict:
    rec = {"phase": phase, **kw, "peak_rss_mb": round(_rss_mb(), 1)}
    print(json.dumps(rec), flush=True)
    results.append(rec)
    return rec


def main() -> int:
    from kwage_tpu.parallel.maestro import (
        STATUS_DATABASE_SUCCESS,
        LocalFastaResolver,
        Maestro,
        MaestroOptions,
    )

    work = sys.argv[1]
    corpus = os.path.join(work, "db")
    qfasta = os.path.join(work, "queries.fasta")
    src = os.path.join(work, "fa")
    inv = os.path.join(work, "inv.bin")
    for p in (corpus, qfasta, src, inv):
        assert os.path.exists(p), f"missing {p}: run run_at_scale_prodL first"
    results: list = []

    def run_kwage(cmd: list[str]) -> str:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=14400)
        assert proc.returncode == 0, proc.stderr[-3000:]
        return proc.stdout

    # PRODL_SKIP_SEARCH=1 re-runs only the build phases (each search
    # pass streams the 19.6 GB corpus through the tunnel: ~45 min).
    skip_search = os.environ.get("PRODL_SKIP_SEARCH") == "1"
    wave_rec = {}
    if not skip_search:
        t0 = time.perf_counter()
        host_out = run_kwage([sys.executable, "-m", "kwage_tpu.cli.kwage",
                              "-d", corpus, "-t", "0.8", "-i", qfasta])
        log(results, "search_host_rerun",
            dt_sec=round(time.perf_counter() - t0, 2))

        # Wave plan under real HBM pressure FIRST (the flagship phase --
        # run it before anything that could trip a flaky tunnel).
        wave_rec = _wave_proof(corpus, qfasta, host_out)
        log(results, "sharded_wave_search", **wave_rec)

        t0 = time.perf_counter()
        dev_out = run_kwage([sys.executable, "-m", "kwage_tpu.cli.kwage",
                             "-d", corpus, "-t", "0.8", "-i", qfasta,
                             "--device"])
        log(results, "search_device",
            dt_sec=round(time.perf_counter() - t0, 2),
            byte_identical_to_host=dev_out == host_out)

    n_dev = int(os.environ.get("SCALE_DEVICE_N", "256"))
    for label in ("cold", "warm"):
        dopt = MaestroOptions(
            metadata_file=inv,
            scratch_bloom_dir=os.path.join(work, f"dbl_{label}"),
            scratch_database_dir=os.path.join(work, f"ddb_{label}"),
            status_file=os.path.join(work, f"dst_{label}.bin"),
            min_kmer_count=2,
            kmer_len=K,
            num_workers=2,
            lazy_inventory=True,
            min_log_2_filter_len=LPROD,
            max_log_2_filter_len=LPROD,
            limit_num_download=n_dev,
            device_build=True,
        )
        t0 = time.perf_counter()
        dm = Maestro(dopt, LocalFastaResolver(src))
        dm.restore()
        dm.run()
        dt_d = time.perf_counter() - t0
        n_d = int((dm.status == STATUS_DATABASE_SUCCESS).sum())
        log(results, f"maestro_device_build_{label}", committed=n_d,
            dt_sec=round(dt_d, 1), filters_per_sec=round(n_d / dt_d, 2))
        shutil.rmtree(dopt.scratch_bloom_dir, ignore_errors=True)
        shutil.rmtree(dopt.scratch_database_dir, ignore_errors=True)

    if skip_search:
        ok = all(r.get("committed", 0) > 0 for r in results
                 if r["phase"].startswith("maestro_device_build"))
    else:
        ok = (wave_rec.get("hit_lists_equal_host") is True
              and results[2]["byte_identical_to_host"] is True)
    log(results, "device_done_builds" if skip_search else "device_done",
        ok=ok)
    rnd = os.environ.get("KWAGE_ROUND", "05")
    path = os.path.join(_REPO_ROOT, f"ATSCALE_PRODL_r{rnd}.json")
    existing = []
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing = [r for r in existing
                if r["phase"] not in {x["phase"] for x in results}]
    with open(path, "w") as f:
        json.dump(existing + results, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
