"""Large-memory (m=11/14) golden decode parity — slow, runs on the CPU mesh."""
import json

import pytest

from tests.test_lva_decode import _cases, _run_case

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("idx", range(16))
def test_golden_decode_parity_large(golden_dir, idx):
    cases = _cases(golden_dir)
    if idx >= len(cases):
        pytest.skip("no such case")
    case = cases[idx]
    if case["mem"] < 11:
        pytest.skip("covered by the fast suite")
    got, _, want = _run_case(golden_dir, case, merge_rounds=None)
    assert got == want, f"decode mismatch for {case['name']}"


def test_l64_golden_parity(golden_dir):
    """The reference's default list size for m=8 is 64 (supplementary 5.2)."""
    case = next(c for c in _cases(golden_dir) if c["list_size"] == 64)
    got, _, want = _run_case(golden_dir, case, merge_rounds=None)
    assert got == want
