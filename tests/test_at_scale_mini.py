"""Miniature of the at-scale end-to-end proof (tools/run_at_scale.py).

Locks the full production-shape flow into the suite: maestro run A halts
mid-corpus and flush-packs a partial .db, run B restores from the
checkpoint and packs the rest, merge_db consolidates the partials
(sha256-identical to the reference merge_db oracle when present), and the
merged corpus searched via the kwage CLI is byte-identical to the
reference binary. The full-size run (4350 accessions at L=18, 2 full
2048-filter files) is the tool's default configuration; here the corpus
is shrunk so the whole proof runs in seconds.
"""

import json
import os
import subprocess
import sys


def test_at_scale_mini(tmp_path):
    env = dict(os.environ)
    env.update(
        SCALE_N_ACC="60",
        SCALE_HALT="40",
        SCALE_GENOME="2000",
        SCALE_COV="3",
        SCALE_REQUIRE_FULL="0",  # 60 accessions cannot fill a 2048 file
        SCALE_DEVICE="0",
    )
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "run_at_scale.py")
    proc = subprocess.run(
        [sys.executable, script], env=env, cwd=tmp_path,
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr[-2000:]
    phases = {json.loads(l)["phase"]: json.loads(l)
              for l in proc.stdout.strip().splitlines()}
    assert phases["maestro_run_A"]["committed"] == 40
    assert phases["maestro_run_B_restart"]["committed"] == 20
    assert phases["merge_partials"]["merged_filters"] == 60
    if os.path.isfile("/tmp/oracle/merge_db"):
        assert phases["merge_partials"]["oracle_sha_identical"] is True
    if os.path.isfile("/tmp/oracle/kwage"):
        assert phases["search_host"]["byte_identical_to_oracle"] is True
    assert phases["done"]["ok"] is True
