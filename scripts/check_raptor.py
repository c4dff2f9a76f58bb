#!/usr/bin/env python3
"""Raptor outer-code reconstruction check.

Equivalent of the reference's historical Raptor-experiment checker
(/root/reference/util/extra/vocab/check_raptor.py): both files are JSON
with a ``symbols`` list of ``[symbol_id, payload]`` pairs; report how
many reconstructed symbols are out of range (id absent from the
original), how many are erroneous (payload mismatch), and exit nonzero
if any survive. The reference script hardcodes two lab paths; this one
takes them as arguments and prints a JSON summary line for tooling.

Usage: python scripts/check_raptor.py ORIGINAL RECONSTRUCTION
"""
import argparse
import json
import sys


def compare_symbol_files(original_path: str, recon_path: str) -> dict:
    with open(recon_path) as f:
        recon = json.load(f)
    with open(original_path) as f:
        orig = json.load(f)
    d_recon = {s[0]: s[1] for s in recon["symbols"]}
    d_orig = {s[0]: s[1] for s in orig["symbols"]}
    out_of_range = [k for k in d_recon if k not in d_orig]
    for k in out_of_range:
        del d_recon[k]
    erroneous = sum(d_recon[k] != d_orig[k] for k in d_recon)
    return {
        "num_original": len(d_orig),
        "num_reconstruction": len(recon["symbols"]),
        "num_out_of_range": len(out_of_range),
        "num_erroneous": erroneous,
        "ok": len(out_of_range) == 0 and erroneous == 0,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("original")
    ap.add_argument("reconstruction")
    args = ap.parse_args()
    summary = compare_symbol_files(args.original, args.reconstruction)
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
