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
