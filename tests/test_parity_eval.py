"""tools/parity_eval.py --selftest: the released-checkpoint parity harness
must stay runnable end to end (import → encode → rerank → R@k) against the
golden-torch fixture, so the BASELINE ±0.3 gate is a one-command affair the
day the released weights are reachable."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

_CACHE_ENV = dict(
    os.environ,
    JAX_COMPILATION_CACHE_DIR=os.environ.get("X2VLM_JAX_CACHE",
                                             "/tmp/x2vlm_jax_cache"),
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
)

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_parity_eval_selftest():
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "parity_eval.py"), "--selftest"],
        capture_output=True, text=True, timeout=900, env=_CACHE_ENV,
        cwd=str(REPO))
    assert res.returncode == 0, res.stdout + res.stderr
    assert "SELFTEST OK" in res.stdout
    # the report renders the gate columns
    assert "paper" in res.stdout and "img_r1" in res.stdout


def test_parse_paper_and_gate():
    sys.path.insert(0, str(REPO / "tools"))
    import parity_eval as pe

    paper = pe.parse_paper("txt_r1=97.4, img_r1=90.0")
    assert paper == {"txt_r1": 97.4, "img_r1": 90.0}
    # within ±0.3 or above passes; below by > 0.3 fails
    assert pe.report({"txt_r1": 97.2, "img_r1": 91.0}, paper) is True
    assert pe.report({"txt_r1": 96.9, "img_r1": 90.0}, paper) is False
    # no paper numbers: ungated, still True
    assert pe.report({"txt_r1": 1.0}, {}) is True
