"""Maestro scheduler: end-to-end database construction, checkpoint/restart,
retry accounting, and byte parity of the produced databases."""

import hashlib
import json
import os

import numpy as np
import pytest

from kwage_tpu.io.status import read_status_file
from kwage_tpu.io.inventory import write_inventory
from kwage_tpu.core import FilterInfo, str_to_accession
from kwage_tpu.parallel.maestro import (
    LocalFastaResolver,
    Maestro,
    MaestroOptions,
    STATUS_BLOOM_FAIL_1,
    STATUS_DATABASE_SUCCESS,
    STATUS_DOWNLOAD_FAIL,
    STATUS_SKIPPED,
)


@pytest.fixture(scope="module")
def manifest(golden_dir):
    with open(golden_dir / "e2e" / "manifest.json") as f:
        return json.load(f)


def _options(manifest, work, **kw):
    opt = MaestroOptions(
        metadata_file=str(work / "inventory.bin"),
        scratch_bloom_dir=str(work / "bloom"),
        scratch_database_dir=str(work / "db"),
        status_file=str(work / "status.bin"),
        kmer_len=manifest["k"],
        min_kmer_count=manifest["min_kmer_count"],
        false_positive_probability=manifest["fp"],
        min_log_2_filter_len=manifest["minL"],
        max_log_2_filter_len=manifest["maxL"],
        min_log_2_count_len=manifest["minLc"],
        max_log_2_count_len=manifest["maxLc"],
        num_workers=2,
        save_bloom=True,
    )
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


def _write_inventory(manifest, work, accessions=None):
    accs = accessions if accessions is not None else manifest["accessions"]
    infos = [FilterInfo(run_accession=str_to_accession(a)) for a in accs]
    write_inventory(str(work / "inventory.bin"), infos)
    return infos


def _sha(p):
    with open(p, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_full_run_produces_reference_databases(manifest, data_dir, golden_dir, tmp_path):
    """A complete maestro run reproduces the golden .db files byte-for-byte."""
    _write_inventory(manifest, tmp_path)
    opt = _options(manifest, tmp_path)
    m = Maestro(opt, LocalFastaResolver(str(data_dir)))
    m.restore()
    m.run()

    assert all(s == STATUS_DATABASE_SUCCESS for s in m.status), m.summary()
    with open(golden_dir / "e2e" / "digests.json") as f:
        digests = json.load(f)
    for gi in range(len(manifest["db_groups"])):
        got = _sha(tmp_path / "db" / f"sra.{gi}.db")
        assert got == digests[f"sra.{gi}.db"], f"sra.{gi}.db differs"

    # The status checkpoint reflects the final state + database index.
    status, db_index = read_status_file(opt.status_file, len(manifest["accessions"]))
    assert db_index == len(manifest["db_groups"])
    assert (status == STATUS_DATABASE_SUCCESS).all()


def test_device_build_produces_reference_databases(manifest, data_dir, golden_dir, tmp_path):
    """The TPU ingest path (exact-count thresholding on device) reproduces
    the golden reference databases byte-for-byte on this corpus: the
    counting filter is collision-free here, so the reference's
    approximation and the exact count agree."""
    _write_inventory(manifest, tmp_path)
    opt = _options(manifest, tmp_path, device_build=True)
    m = Maestro(opt, LocalFastaResolver(str(data_dir)))
    m.restore()
    m.run()

    assert all(s == STATUS_DATABASE_SUCCESS for s in m.status), m.summary()
    with open(golden_dir / "e2e" / "digests.json") as f:
        digests = json.load(f)
    for gi in range(len(manifest["db_groups"])):
        got = _sha(tmp_path / "db" / f"sra.{gi}.db")
        assert got == digests[f"sra.{gi}.db"], f"sra.{gi}.db differs"


def test_restart_resumes_and_completes(manifest, data_dir, golden_dir, tmp_path):
    """Interrupt after a few downloads; a fresh Maestro resumes from the
    checkpoint and converges to the same final databases."""
    _write_inventory(manifest, tmp_path)
    opt = _options(manifest, tmp_path, limit_num_download=3)
    m = Maestro(opt, LocalFastaResolver(str(data_dir)))
    m.restore()
    m.run()
    assert sum(1 for s in m.status if s != 1) <= 5  # partial progress only

    opt2 = _options(manifest, tmp_path)
    m2 = Maestro(opt2, LocalFastaResolver(str(data_dir)))
    m2.restore()
    m2.run()
    assert all(s == STATUS_DATABASE_SUCCESS for s in m2.status), m2.summary()

    with open(golden_dir / "e2e" / "digests.json") as f:
        digests = json.load(f)
    # Shape groups are rediscovered after restart; compare content by digest set.
    got = sorted(
        _sha(tmp_path / "db" / f) for f in os.listdir(tmp_path / "db") if f.endswith(".db")
    )
    want = sorted(v for k, v in digests.items() if k.endswith(".db"))
    assert got == want


def test_missing_accession_fails_after_retries(manifest, data_dir, tmp_path):
    accs = manifest["accessions"][:2] + ["SRR9999999"]
    _write_inventory(manifest, tmp_path, accs)
    opt = _options(manifest, tmp_path, num_download_attempt=2)
    m = Maestro(opt, LocalFastaResolver(str(data_dir)))
    m.restore()
    m.run()
    assert m.status[2] == STATUS_DOWNLOAD_FAIL
    assert m.status[0] == STATUS_DATABASE_SUCCESS
    assert m.status[1] == STATUS_DATABASE_SUCCESS


def test_skip_marking(manifest, data_dir, tmp_path):
    accs = manifest["accessions"][:3]
    _write_inventory(manifest, tmp_path, accs)
    opt = _options(manifest, tmp_path, skip_sra=[accs[1]])
    m = Maestro(opt, LocalFastaResolver(str(data_dir)))
    m.restore()
    assert m.status[1] == STATUS_SKIPPED
    m.run()
    assert m.status[1] == STATUS_SKIPPED
    assert m.status[0] == STATUS_DATABASE_SUCCESS


def test_rollback_of_incomplete_bloom(manifest, data_dir, tmp_path):
    """A .bloom with the in-progress magic byte is rolled back to INIT on
    restore (maestro_main.cpp:699-802)."""
    accs = manifest["accessions"][:2]
    _write_inventory(manifest, tmp_path, accs)
    opt = _options(manifest, tmp_path)
    m = Maestro(opt, LocalFastaResolver(str(data_dir)))
    m.restore()
    m.run()

    # Corrupt one bloom (mark in-progress) and claim BLOOM_SUCCESS state.
    from kwage_tpu.io.status import write_status_file
    import numpy as np

    bloom = m.bloom_path(0)
    data = bytearray(open(bloom, "rb").read())
    data[0] = 0x00
    open(bloom, "wb").write(bytes(data))
    status = np.array([14, 14], dtype=np.uint8)  # both claim BLOOM_SUCCESS
    write_status_file(opt.status_file, status, 0)

    m2 = Maestro(opt, LocalFastaResolver(str(data_dir)))
    m2.restore()
    assert m2.status[0] == 1  # rolled back to INIT
    assert m2.status[1] == 14


def test_streaming_resolver_without_toolkit(manifest, tmp_path):
    """--stream mode: accessions resolve via fasterq-dump; with no SRA
    toolkit installed every download fails cleanly after the retry budget."""
    from kwage_tpu.parallel.maestro import StreamingResolver

    accs = manifest["accessions"][:2]
    _write_inventory(manifest, tmp_path, accessions=accs)
    opt = _options(manifest, tmp_path, num_download_attempt=1)
    m = Maestro(opt, StreamingResolver(str(tmp_path / "stream")))
    m.restore()
    m.run()
    assert all(s == STATUS_DOWNLOAD_FAIL for s in m.status), m.summary()


def test_flaky_resolver_recovers_via_retries(manifest, data_dir, tmp_path):
    """Fault injection: a resolver that fails each accession's first two
    attempts must still converge through the retry state machine
    (maestro_main.cpp retry queues)."""

    class FlakyResolver(LocalFastaResolver):
        def __init__(self, source_dir):
            super().__init__(source_dir)
            self.attempts = {}

        def resolve(self, accession):
            n = self.attempts.get(accession, 0)
            self.attempts[accession] = n + 1
            if n < 2:
                return None  # simulated download failure
            return super().resolve(accession)

    accs = manifest["accessions"][:4]
    _write_inventory(manifest, tmp_path, accessions=accs)
    opt = _options(manifest, tmp_path, num_download_attempt=3, num_workers=2)
    m = Maestro(opt, FlakyResolver(str(data_dir)))
    m.restore()
    m.run()
    assert all(s == STATUS_DATABASE_SUCCESS for s in m.status), m.summary()

    # With a retry budget below the failure count, accessions fail hard.
    tmp2 = tmp_path / "b"
    tmp2.mkdir()
    _write_inventory(manifest, tmp2, accessions=accs)
    opt2 = _options(manifest, tmp2, num_download_attempt=2, num_workers=2)
    m2 = Maestro(opt2, FlakyResolver(str(data_dir)))
    m2.restore()
    m2.run()
    assert all(s == STATUS_DOWNLOAD_FAIL for s in m2.status), m2.summary()


def test_lazy_inventory_produces_reference_databases(manifest, data_dir, golden_dir, tmp_path):
    """lazy_inventory mode (accession/offset index + on-demand FilterInfo
    loads, the reference's parse_accession_loc memory profile) produces
    the same golden databases."""
    _write_inventory(manifest, tmp_path)
    opt = _options(manifest, tmp_path, lazy_inventory=True)
    m = Maestro(opt, LocalFastaResolver(str(data_dir)))
    m.restore()
    m.run()
    assert all(s == STATUS_DATABASE_SUCCESS for s in m.status), m.summary()
    with open(golden_dir / "e2e" / "digests.json") as f:
        digests = json.load(f)
    for gi in range(len(manifest["db_groups"])):
        assert _sha(tmp_path / "db" / f"sra.{gi}.db") == digests[f"sra.{gi}.db"]
