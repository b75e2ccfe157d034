"""Multi-host (multi-process) evidence: two OS processes x 4 virtual CPU
devices join via jax.distributed and run one train step sharded over the
global mesh — exercising jax.process_count() > 1, which the in-process
8-device mesh used by the rest of the suite cannot (SURVEY.md §2.9).

The heavy lifting lives in __graft_entry__.dryrun_multihost (also a driver
entry point); this test just asserts it completes and that both processes
agree on the replicated loss.
"""

import pytest

import pathlib
import subprocess
import sys

# compile-heavy integration tier: run with the full suite, skip via -m 'not slow'
pytestmark = pytest.mark.slow

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_two_process_sharded_train_step():
    # run in a clean subprocess: this pytest process already owns an
    # 8-device in-process backend (conftest), which must not be the
    # coordinator's device set
    src = (
        "from __graft_entry__ import dryrun_multihost\n"
        "dryrun_multihost(2, 4)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", src], cwd=str(REPO),
        capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multihost(2x4)" in proc.stdout
    assert proc.stdout.count("OK") >= 3  # both children + the summary
