"""Maestro: the database-construction scheduler and worker runtime.

The TPU-native re-design of the reference's MPI master/worker engine
(maestro_main.cpp / worker_main.cpp). The dynamic task queue stays on the
host (the reference's rank-0 event loop becomes a future-based pool over
threads or processes; k-mer counting runs in the native library which
releases the GIL); the per-accession status-byte state machine, retry
queues, per-shape database quotas, periodic atomic checkpoints and
restart rescans are preserved exactly, including the on-disk status-file
format (file_io.cpp:201-282), so a job can be stopped and resumed
interchangeably with the reference semantics.

Work priority per scheduling round (maestro_main.cpp:339-457):
  1. database packing when a BloomParam group reaches its quota
     (forced flush when all accessions are terminal),
  2. Bloom filter creation (streaming) or creation-from-download,
  3. downloads (non-streaming mode), throttled by --delay.

SRA ingestion is a pluggable SourceResolver; the default resolves
accessions to local FASTA/FASTQ files (<source_dir>/<accession>.fasta*),
and a PrefetchResolver shells out to the SRA toolkit like the reference
(worker_main.cpp:384-474) when available.
"""

from __future__ import annotations

import os
import subprocess
import time
from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait
from dataclasses import dataclass, field

import numpy as np

from ..core.accession import accession_to_str
from ..utils.mem_usage import memory_usage
from ..core.hash import MURMUR_HASH_32
from ..core.info import FilterInfo
from ..core.params import (
    BloomParam,
    DEFAULT_FALSE_POSITIVE_PROBABILITY,
    DEFAULT_KMER_LENGTH,
    DEFAULT_MAX_LOG_2_FILTER_LEN,
    DEFAULT_MIN_LOG_2_FILTER_LEN,
    DEFAULT_SRA_MIN_KMER_COUNT,
    filters_per_file_quota,
)
from ..io.bloom_file import BLOOM_MAGIC_COMPLETE, read_bloom_file, write_bloom_file
from ..io.inventory import read_inventory
from ..io.status import read_status_file, write_status_file
from ..pipeline.build_db import build_db_from_bloom_files
from ..pipeline.make_bloom import BloomInvalid, BuildOptions, build_bloom_from_file

# ---------------------------------------------------------------------------
# Status byte vocabulary (maestro.h:8-45). Values must match the reference
# so status files are interchangeable.
# ---------------------------------------------------------------------------
STATUS_INIT = 1
STATUS_DOWNLOAD_SUCCESS = 2
STATUS_DOWNLOAD_FAIL = 3
STATUS_DOWNLOAD_FAIL_1 = 4
STATUS_DOWNLOAD_FAIL_10 = 13
MAX_NUM_DOWNLOAD_FAIL = STATUS_DOWNLOAD_FAIL_10
STATUS_BLOOM_SUCCESS = 14
STATUS_BLOOM_FAIL = 15
STATUS_BLOOM_INVALID = 16
STATUS_DATABASE_SUCCESS = 17
STATUS_DATABASE_FAIL = 18
STATUS_DATABASE_UPLOAD_FAIL = 19
STATUS_BLOOM_FAIL_1 = 20
STATUS_BLOOM_FAIL_10 = 29
STATUS_SKIPPED = 30

STATUS_NAMES = {
    STATUS_INIT: "init",
    STATUS_DOWNLOAD_SUCCESS: "downloaded",
    STATUS_DOWNLOAD_FAIL: "download failed (final)",
    STATUS_BLOOM_SUCCESS: "bloom built",
    STATUS_BLOOM_FAIL: "bloom failed (final)",
    STATUS_BLOOM_INVALID: "bloom invalid",
    STATUS_DATABASE_SUCCESS: "database committed",
    STATUS_DATABASE_FAIL: "database failed",
    STATUS_DATABASE_UPLOAD_FAIL: "database upload failed",
    STATUS_SKIPPED: "skipped",
}

CHECKPOINT_EVERY_SEC = 300  # maestro_main.cpp:63-64


class SourceResolver:
    """Maps an SRA run accession to a local sequence file to digest."""

    def resolve(self, accession: str) -> str | None:  # pragma: no cover
        raise NotImplementedError

    def cleanup(self, accession: str, path: str) -> None:
        pass


class LocalFastaResolver(SourceResolver):
    """Accession -> <source_dir>/<accession>.(fasta|fastq)[.gz]."""

    EXTS = (".fasta", ".fa", ".fna", ".fastq", ".fq",
            ".fasta.gz", ".fa.gz", ".fna.gz", ".fastq.gz", ".fq.gz", ".sra")

    def __init__(self, source_dir: str):
        self.source_dir = source_dir

    def resolve(self, accession: str) -> str | None:
        for ext in self.EXTS:
            path = os.path.join(self.source_dir, accession + ext)
            if os.path.isfile(path):
                return path
        return None


class PrefetchResolver(SourceResolver):
    """Shells out to the SRA toolkit `prefetch` like worker_main.cpp:384-474."""

    def __init__(self, repo_dir: str, max_size_gb: int = 30,
                 prefetch_bin: str = "prefetch"):
        self.repo_dir = repo_dir
        self.max_size_gb = max_size_gb
        self.prefetch_bin = prefetch_bin

    def resolve(self, accession: str) -> str | None:
        cmd = [self.prefetch_bin, "--max-size", f"{self.max_size_gb}G", accession]
        try:
            proc = subprocess.run(cmd, cwd=self.repo_dir, capture_output=True)
        except FileNotFoundError:
            return None
        if proc.returncode != 0:
            return None
        path = os.path.join(self.repo_dir, accession, accession + ".sra")
        return path if os.path.isfile(path) else None

    def cleanup(self, accession: str, path: str) -> None:
        import shutil

        d = os.path.join(self.repo_dir, accession)
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)


class StreamingResolver(SourceResolver):
    """--stream mode: materialize reads directly with fasterq-dump (no
    .sra staging), the closest available analog of the reference's VDB
    streaming workers (maestro --stream; worker_main.cpp SCHEDULE_BLOOM
    streaming branch). Uses the classified-status downloader shared with
    sriracha (sriracha/sra_source.py)."""

    def __init__(self, scratch_dir: str):
        self.scratch_dir = scratch_dir

    def resolve(self, accession: str) -> str | None:
        from ..sriracha.sra_source import DownloadError, resolve_accession

        try:
            return resolve_accession(
                accession, os.path.join(self.scratch_dir, accession)
            )
        except DownloadError:
            return None

    def cleanup(self, accession: str, path: str) -> None:
        import shutil

        d = os.path.join(self.scratch_dir, accession)
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)


@dataclass
class MaestroOptions:
    metadata_file: str = ""
    scratch_bloom_dir: str = ""
    scratch_database_dir: str = ""
    status_file: str = "./__sra_db_status.bin"
    s3_bucket: str = ""
    skip_sra: list[str] = field(default_factory=list)
    false_positive_probability: float = DEFAULT_FALSE_POSITIVE_PROBABILITY
    download_delay: float = 0.0
    min_kmer_count: int = DEFAULT_SRA_MIN_KMER_COUNT
    kmer_len: int = DEFAULT_KMER_LENGTH
    min_log_2_filter_len: int = DEFAULT_MIN_LOG_2_FILTER_LEN
    max_log_2_filter_len: int = DEFAULT_MAX_LOG_2_FILTER_LEN
    max_sra_file_size_GB: int = 30
    hash_func: int = MURMUR_HASH_32
    num_download_attempt: int = 3
    limit_num_download: int = 0  # --halt-after (0 = unlimited)
    retry_bloom: bool = False
    save_bloom: bool = False
    save_db: bool = False
    save_sra: bool = False
    s3_no_write: bool = False
    stream_sra: bool = False  # default: download via prefetch (options.cpp:427)
    verbose: bool = False
    num_workers: int = 4
    # TPU ingest mode: exact-count thresholding on device instead of the
    # host counting-Bloom (see kwage_tpu.ops.counting).
    device_build: bool = False
    # Write zlib-chunked .dbz database files (engine extension).
    compress_db: bool = False
    # Transpose on device via the Pallas packed bit-transpose (engine
    # extension; pays off on PCIe-attached hosts).
    device_transpose: bool = False
    # Seconds between status-histogram displays (reference: 15 min,
    # maestro_main.cpp:63).
    status_display_sec: float = 900.0
    # Index the inventory by (accession, offset) and load FilterInfo
    # records on demand instead of materializing millions of them -- the
    # reference's parse_accession_loc memory profile (file_io.cpp:23-118).
    lazy_inventory: bool = False
    # counting-filter clamp passthrough (tests shrink it)
    min_log_2_count_len: int = 18
    max_log_2_count_len: int = 32

    def build_options(self) -> BuildOptions:
        return BuildOptions(
            kmer_len=self.kmer_len,
            min_kmer_count=self.min_kmer_count,
            false_positive_probability=self.false_positive_probability,
            min_log_2_filter_len=self.min_log_2_filter_len,
            max_log_2_filter_len=self.max_log_2_filter_len,
            hash_func=self.hash_func,
            min_log_2_count_len=self.min_log_2_count_len,
            max_log_2_count_len=self.max_log_2_count_len,
        )


def _bloom_retry_status(attempt: int) -> int:
    return STATUS_BLOOM_FAIL_1 + attempt - 1 if attempt <= 10 else STATUS_BLOOM_FAIL


def _download_retry_status(attempt: int) -> int:
    return STATUS_DOWNLOAD_FAIL_1 + attempt - 1 if attempt <= 10 else STATUS_DOWNLOAD_FAIL


class _LazyInfos:
    """Sequence view over a binary inventory that loads each FilterInfo
    from its file offset on access (parse_accession_loc memory profile:
    the scheduler holds one index entry per accession, not the records)."""

    def __init__(self, path: str):
        from ..io.inventory import scan_inventory_locations

        self._path = path
        pairs = scan_inventory_locations(path)
        self.accession_codes = [a for a, _ in pairs]
        self._offsets = [o for _, o in pairs]

    def __len__(self) -> int:
        return len(self._offsets)

    def __getitem__(self, idx: int) -> FilterInfo:
        from ..io.inventory import read_filter_info_at

        return read_filter_info_at(self._path, self._offsets[idx])


class Maestro:
    """The scheduler. One instance per database-construction job."""

    def __init__(
        self,
        opt: MaestroOptions,
        resolver: SourceResolver,
        infos: list[FilterInfo] | None = None,
    ):
        self.opt = opt
        self.resolver = resolver
        if infos is None:
            if opt.lazy_inventory:
                infos = _LazyInfos(opt.metadata_file)
            else:
                infos = read_inventory(opt.metadata_file)
        self.infos = infos
        if isinstance(infos, _LazyInfos):
            self.accessions = [accession_to_str(a) for a in infos.accession_codes]
        else:
            self.accessions = [accession_to_str(i.run_accession) for i in infos]
        self.status = np.full(len(infos), STATUS_INIT, dtype=np.uint8)
        self.database_index = 0
        self._last_checkpoint = 0.0
        self._last_download = 0.0
        self._num_downloads = 0
        self._start_time = time.time()
        self._last_display = time.time()
        self._total_bp = 0
        self._total_filter_bytes = 0
        self._log = (lambda *a: print(*a)) if opt.verbose else (lambda *a: None)

        os.makedirs(opt.scratch_bloom_dir, exist_ok=True)
        os.makedirs(opt.scratch_database_dir, exist_ok=True)

    # -- state persistence ---------------------------------------------------

    def bloom_path(self, idx: int) -> str:
        return os.path.join(self.opt.scratch_bloom_dir, self.accessions[idx] + ".bloom")

    def restore(self) -> None:
        """restore_status + scratch rescans (maestro_main.cpp:200-240, 618-802)."""
        if os.path.exists(self.opt.status_file):
            self.status, self.database_index = read_status_file(
                self.opt.status_file, len(self.infos)
            )
            self.status = self.status.copy()

        # --retry.bloom resurrects hard failures (maestro_main.cpp:200-217)
        if self.opt.retry_bloom:
            hard_fail = (self.status == STATUS_BLOOM_FAIL) | (
                (self.status >= STATUS_BLOOM_FAIL_1) & (self.status <= STATUS_BLOOM_FAIL_10)
            )
            self.status[hard_fail] = STATUS_INIT

        # --skip marking (maestro_main.cpp:219-240)
        skip = set(self.opt.skip_sra)
        for i, acc in enumerate(self.accessions):
            if acc in skip and self.status[i] in (STATUS_INIT, STATUS_DOWNLOAD_SUCCESS):
                self.status[i] = STATUS_SKIPPED

        # Reconcile claimed Bloom successes with scratch reality: a missing
        # or incomplete .bloom file rolls back to INIT (maestro_main.cpp:699-802).
        for i in np.nonzero(self.status == STATUS_BLOOM_SUCCESS)[0]:
            path = self.bloom_path(int(i))
            ok = False
            if os.path.isfile(path):
                try:
                    with open(path, "rb") as f:
                        ok = f.read(1)[0] == BLOOM_MAGIC_COMPLETE
                except OSError:
                    ok = False
            if not ok:
                self.status[i] = STATUS_INIT

    def checkpoint(self, force: bool = False) -> None:
        now = time.time()
        if force or now - self._last_checkpoint >= CHECKPOINT_EVERY_SEC:
            write_status_file(self.opt.status_file, self.status, self.database_index)
            self._last_checkpoint = now

    def display_status(self, force: bool = False) -> None:
        """Periodic status histogram + cumulative throughput, the analog of
        the reference's 15-minute display (maestro_main.cpp:359-374,
        485-616, 961-984)."""
        now = time.time()
        if not force and now - self._last_display < self.opt.status_display_sec:
            return
        self._last_display = now
        elapsed = max(now - self._start_time, 1e-9)
        total = len(self.status)
        self._log(f"[maestro] status after {elapsed:.0f} sec:")
        for name, count in sorted(self.summary().items()):
            self._log(f"[maestro]   {name}: {count} ({100.0 * count / total:.1f}%)")
        if self._total_bp:
            # Deflation = filter bytes per 2 bits of input sequence
            # (maestro_main.cpp:505-510).
            self._log(
                f"[maestro]   throughput {self._total_bp / elapsed / 1.0e6:.2f} Mbp/sec; "
                f"deflation {self._total_filter_bytes / (2.0 * self._total_bp):.4f}"
            )

    # -- work items ------------------------------------------------------

    def _build_bloom(self, idx: int) -> tuple[int, int, BloomParam | None, float]:
        """Worker task: resolve the source and build one Bloom filter."""
        t0 = time.time()
        acc = self.accessions[idx]
        path = self.resolver.resolve(acc)
        if path is None:
            return idx, STATUS_DOWNLOAD_FAIL, None, time.time() - t0
        try:
            if self.opt.device_build:
                from ..io.sequence import iter_sequences
                from ..pipeline.make_bloom import build_bloom_device

                rec = build_bloom_device(
                    (s for _, s in iter_sequences(path)),
                    self.opt.build_options(),
                    self.infos[idx],
                )
            else:
                rec = build_bloom_from_file(path, self.opt.build_options(), self.infos[idx])
            write_bloom_file(self.bloom_path(idx), rec)
            status = STATUS_BLOOM_SUCCESS
            param = rec.param
        except BloomInvalid:
            status, param = STATUS_BLOOM_INVALID, None
        except Exception:
            status, param = STATUS_BLOOM_FAIL, None
        if not self.opt.save_sra:
            self.resolver.cleanup(acc, path)
        return idx, status, param, time.time() - t0

    def _build_database(self, db_index: int, param: BloomParam,
                        members: list[int]) -> tuple[list[int], int, str, float]:
        t0 = time.time()
        ext = "dbz" if self.opt.compress_db else "db"
        db_path = os.path.join(self.opt.scratch_database_dir, f"sra.{db_index}.{ext}")
        ok = False
        try:
            blooms = [self.bloom_path(i) for i in members]
            if self.opt.compress_db:
                from ..pipeline.build_db import build_dbz_from_bloom_files

                build_dbz_from_bloom_files(db_path, param, blooms)
            else:
                build_db_from_bloom_files(
                    db_path, param, blooms, device=self.opt.device_transpose
                )
            ok = True
        except (ValueError, OSError):
            pass
        if ok and self.opt.s3_bucket and not self.opt.s3_no_write:
            cmd = ["aws", "s3", "cp" if self.opt.save_db else "mv", db_path,
                   f"{self.opt.s3_bucket}/{os.path.basename(db_path)}"]
            proc = subprocess.run(cmd, capture_output=True)
            if proc.returncode != 0:
                return members, STATUS_DATABASE_UPLOAD_FAIL, db_path, time.time() - t0
        if ok and not self.opt.save_bloom:
            for i in members:
                try:
                    os.unlink(self.bloom_path(i))
                except OSError:
                    pass
        return members, STATUS_DATABASE_SUCCESS if ok else STATUS_DATABASE_FAIL, db_path, time.time() - t0

    # -- scheduling --------------------------------------------------------

    def _bloom_candidates(self) -> list[int]:
        """Accessions eligible for Bloom construction; retries first
        (maestro_main.cpp:1374-1379)."""
        retry = []
        fresh = []
        for i, s in enumerate(self.status):
            if STATUS_BLOOM_FAIL_1 <= s <= STATUS_BLOOM_FAIL_10:
                if s - STATUS_BLOOM_FAIL_1 + 1 < self.opt.num_download_attempt:
                    retry.append(i)
            elif s == STATUS_INIT:
                fresh.append(i)
        return retry + fresh

    def _ready_groups(self, pending_bloom: int) -> list[tuple[BloomParam, list[int]]]:
        """BloomParam groups at (or past) quota; when nothing else remains,
        flush partial groups (maestro_main.cpp:410-415)."""
        groups: dict[BloomParam, list[int]] = {}
        for i in np.nonzero(self.status == STATUS_BLOOM_SUCCESS)[0]:
            path = self.bloom_path(int(i))
            try:
                param = read_bloom_file(path, with_bits=False).param
            except (OSError, ValueError, EOFError):
                self.status[i] = STATUS_INIT
                continue
            groups.setdefault(param, []).append(int(i))

        out = []
        for param, members in sorted(groups.items()):
            quota = filters_per_file_quota(param.log_2_filter_len)
            members.sort()
            while len(members) >= quota:
                out.append((param, members[:quota]))
                members = members[quota:]
            if members and pending_bloom == 0:
                out.append((param, members))  # forced flush
        return out

    def run(self) -> None:
        """The event loop: dispatch work, absorb completions, checkpoint."""
        from ..utils import device_trace

        with device_trace():
            self._run()

    def _run(self) -> None:
        opt = self.opt
        self.checkpoint(force=True)
        futures: dict[Future, str] = {}
        in_flight_bloom: set[int] = set()
        in_flight_db: set[int] = set()

        with ThreadPoolExecutor(max_workers=opt.num_workers) as pool:
            while True:
                # 1. database packing
                pending_bloom = len(self._bloom_candidates()) + len(in_flight_bloom)
                if not in_flight_db:
                    for param, members in self._ready_groups(pending_bloom):
                        db_index = self.database_index
                        self.database_index += 1
                        self._log(
                            f"[maestro] building database {db_index} "
                            f"(L={param.log_2_filter_len}, h={param.num_hash}, "
                            f"{len(members)} filters)"
                        )
                        fut = pool.submit(self._build_database, db_index, param, list(members))
                        futures[fut] = "db"
                        in_flight_db.update(members)
                        # Pre-mark as failed so a crash retries on restart
                        # (maestro_main.cpp:1404-1408).
                        for i in members:
                            self.status[i] = STATUS_DATABASE_FAIL

                # 2/3. Bloom creation (+ implicit download in the resolver)
                while len(futures) < opt.num_workers:
                    candidates = [
                        i for i in self._bloom_candidates() if i not in in_flight_bloom
                    ]
                    if not candidates:
                        break
                    if opt.limit_num_download and self._num_downloads >= opt.limit_num_download:
                        break
                    if opt.download_delay > 0:
                        wait_for = self._last_download + opt.download_delay - time.time()
                        if wait_for > 0:
                            time.sleep(wait_for)
                    idx = candidates[0]
                    in_flight_bloom.add(idx)
                    self._num_downloads += 1
                    self._last_download = time.time()
                    # Pre-mark the attempt (crash-safe retry accounting).
                    s = int(self.status[idx])
                    attempt = (s - STATUS_BLOOM_FAIL_1 + 2) if STATUS_BLOOM_FAIL_1 <= s <= STATUS_BLOOM_FAIL_10 else 1
                    self.status[idx] = _bloom_retry_status(min(attempt, 10))
                    fut = pool.submit(self._build_bloom, idx)
                    futures[fut] = "bloom"

                if not futures:
                    break

                done, _ = wait(list(futures), return_when=FIRST_COMPLETED)
                for fut in done:
                    kind = futures.pop(fut)
                    if kind == "bloom":
                        idx, status, param, dt = fut.result()
                        in_flight_bloom.discard(idx)
                        if status == STATUS_BLOOM_SUCCESS:
                            self.status[idx] = STATUS_BLOOM_SUCCESS
                            bp = self.infos[idx].number_of_bases or 0
                            self._total_bp += bp
                            self._total_filter_bytes += param.filter_len // 8
                            self._log(
                                f"[maestro] bloom {self.accessions[idx]} ok "
                                f"(L={param.log_2_filter_len}, h={param.num_hash}) "
                                f"in {dt:.2f}s ({bp / max(dt, 1e-9) / 1.0e6:.2f} Mbp/sec; "
                                f"mem {100.0 * memory_usage():.1f}%)"
                            )
                        elif status == STATUS_BLOOM_INVALID:
                            self.status[idx] = STATUS_BLOOM_INVALID
                            self._log(f"[maestro] bloom {self.accessions[idx]} invalid")
                        elif status == STATUS_DOWNLOAD_FAIL:
                            s = int(self.status[idx])
                            attempt = s - STATUS_BLOOM_FAIL_1 + 1 if STATUS_BLOOM_FAIL_1 <= s <= STATUS_BLOOM_FAIL_10 else 1
                            if attempt >= self.opt.num_download_attempt:
                                self.status[idx] = STATUS_DOWNLOAD_FAIL
                            self._log(f"[maestro] download {self.accessions[idx]} failed (attempt {attempt})")
                        else:  # bloom failure: retry status already pre-marked
                            s = int(self.status[idx])
                            attempt = s - STATUS_BLOOM_FAIL_1 + 1 if STATUS_BLOOM_FAIL_1 <= s <= STATUS_BLOOM_FAIL_10 else 1
                            if attempt >= self.opt.num_download_attempt:
                                self.status[idx] = STATUS_BLOOM_FAIL
                            self._log(f"[maestro] bloom {self.accessions[idx]} failed (attempt {attempt})")
                    else:
                        members, status, db_path, dt = fut.result()
                        in_flight_db.difference_update(members)
                        for i in members:
                            self.status[i] = status
                        self._log(
                            f"[maestro] database {os.path.basename(db_path)} "
                            f"{STATUS_NAMES.get(status, status)} "
                            f"({len(members)} filters) in {dt:.2f}s "
                            f"(mem {100.0 * memory_usage():.1f}%)"
                        )
                        if status == STATUS_DATABASE_SUCCESS:
                            self.checkpoint(force=True)

                self.checkpoint()
                self.display_status()

        self.checkpoint(force=True)
        self.display_status(force=True)

    def summary(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for s in self.status:
            name = STATUS_NAMES.get(int(s), f"state {int(s)}")
            out[name] = out.get(name, 0) + 1
        return out
