"""Pallas ACS kernel (interpret mode) golden parity — a representative
subset: punctured rate, RC, beam, multiple list sizes."""
import json

import numpy as np
import pytest

from tests.test_lva_decode import _cases, _load_post, _ref_lists
from nanopore_dna_storage_tpu.config import ConvCodeConfig, DecodeConfig
from nanopore_dna_storage_tpu.ops.lva import LVADecoder

pytestmark = pytest.mark.slow

CASE_NAMES = ["m6_r5_rc0_l8", "m6_r5_rc1_l8", "m6_r1_rc0_l4", "m8_r3_rc1_l4"]


@pytest.mark.parametrize("name", CASE_NAMES)
def test_pallas_interpret_golden(golden_dir, name):
    case = next(c for c in _cases(golden_dir) if c["name"] == name)
    cfg = DecodeConfig(
        code=ConvCodeConfig(mem=case["mem"], rate=case["rate"],
                            msg_len=case["msg_len"], rc=case["rc"]),
        list_size=case["list_size"], max_deviation=case["max_deviation"],
        backend="pallas_interpret")
    dec = LVADecoder(cfg)
    post = _load_post(golden_dir, case["name"])
    msgs, _, valid = dec.decode(post[None])
    got = ["".join(map(str, m)) for m, v in zip(msgs[0], valid[0]) if v]
    assert got == _ref_lists(golden_dir, case["name"]), name


def test_pallas_interpret_hierarchical_merge(golden_dir, monkeypatch):
    """Candidate sets above MERGE_NCAND_MAX run the exact hierarchical
    TOURNAMENT merge: Python-unrolled passes capped at MERGE_NCAND_MAX
    candidates each, levels repeating until one list remains
    (ops/lva_pallas.py). Since v13 the default cap is 512 (no production
    config exceeds it); pin the cap to 128 here so m=6 L=34
    (8*34 = 272 candidates) exercises a multi-level tournament."""
    from nanopore_dna_storage_tpu.ops import lva_pallas
    monkeypatch.setattr(lva_pallas, "MERGE_NCAND_MAX", 128)
    case = next(c for c in _cases(golden_dir) if c["name"] == "m6_r1_rc0_l34")
    assert 8 * case["list_size"] > lva_pallas.MERGE_NCAND_MAX
    cfg = DecodeConfig(
        code=ConvCodeConfig(mem=case["mem"], rate=case["rate"],
                            msg_len=case["msg_len"], rc=case["rc"]),
        list_size=case["list_size"], max_deviation=case["max_deviation"],
        backend="pallas_interpret")
    dec = LVADecoder(cfg)
    post = _load_post(golden_dir, case["name"])
    msgs, _, valid = dec.decode(post[None])
    got = ["".join(map(str, m)) for m, v in zip(msgs[0], valid[0]) if v]
    assert got == _ref_lists(golden_dir, case["name"])


def test_pallas_interpret_tournament_l64(golden_dir):
    """The production m=8 L=64 shape (supplementary §5.2 default list
    size): 8*64 = 512 candidates run as ONE suppression pass under the
    v13 default cap (grouped while-loop rounds), the configuration
    benched on hardware at 4.61 s/read. Reference-binary golden,
    bit-for-bit."""
    case = next(c for c in _cases(golden_dir) if c["name"] == "m8_r1_rc0_l64")
    cfg = DecodeConfig(
        code=ConvCodeConfig(mem=case["mem"], rate=case["rate"],
                            msg_len=case["msg_len"], rc=case["rc"]),
        list_size=case["list_size"], max_deviation=case["max_deviation"],
        backend="pallas_interpret")
    dec = LVADecoder(cfg)
    post = _load_post(golden_dir, case["name"])
    msgs, _, valid = dec.decode(post[None])
    got = ["".join(map(str, m)) for m, v in zip(msgs[0], valid[0]) if v]
    assert got == _ref_lists(golden_dir, case["name"])


def test_pallas_interpret_multitile(golden_dir):
    """Multi-tile conv axis (CT < C): the per-offset block-view expansion
    path used by m=11/14 on hardware, exercised via m=8 with a forced
    128-lane tile."""
    case = next(c for c in _cases(golden_dir) if c["name"] == "m8_r5_rc1_l8")
    cfg = DecodeConfig(
        code=ConvCodeConfig(mem=case["mem"], rate=case["rate"],
                            msg_len=case["msg_len"], rc=case["rc"]),
        list_size=case["list_size"], max_deviation=case["max_deviation"],
        backend="pallas_interpret", pallas_ct=128)
    dec = LVADecoder(cfg)
    post = _load_post(golden_dir, case["name"])
    msgs, _, valid = dec.decode(post[None])
    got = ["".join(map(str, m)) for m, v in zip(msgs[0], valid[0]) if v]
    assert got == _ref_lists(golden_dir, case["name"])
