"""Basecaller parity vs the reference flappie compute chain.

Compiles the unmodified reference sources (networks.c/layers.c/decode.c/...)
with synthetic weights emitted in the flappie model-header format, drives
them on a synthetic raw signal, and requires the JAX rebuild to match every
stage: medmad normalize (exact), flipflop transitions and forward-backward
posteriors (<= 2e-3 in log space), and the Viterbi basecall path +
change-positions (identical). See scripts/flappie_parity/run_parity.py.
"""
import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "flappie_parity", "run_parity.py")
FLAPPIE = "/root/reference/flappie/src"


@pytest.mark.slow
def test_flappie_chain_parity():
    if shutil.which("gcc") is None or not os.path.isdir(FLAPPIE):
        pytest.skip("reference flappie sources or gcc unavailable")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--hidden", "16", "--filters", "12",
         "--winlen", "7", "--nsamples", "1000"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stdout + r.stderr
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["ok"], res
    assert res["path_eq"] and res["chpos_eq"]
    assert res["devs"]["trans"] < 2e-3


@pytest.mark.slow
def test_flappie_chain_parity_wide_window():
    """Production-like winlen 19 exercises different conv edge bookkeeping."""
    if shutil.which("gcc") is None or not os.path.isdir(FLAPPIE):
        pytest.skip("reference flappie sources or gcc unavailable")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--hidden", "8", "--filters", "8",
         "--winlen", "19", "--nsamples", "777", "--temperature", "1.3"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stdout + r.stderr
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["ok"], res
