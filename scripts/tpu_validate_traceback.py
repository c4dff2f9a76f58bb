#!/usr/bin/env python3
"""Validate the Pallas traceback decoder on the real TPU.

Computes expected decoded lists with the XLA message-carrying path in a
JAX_PLATFORMS=cpu subprocess, then runs the pallas backend (real TPU via
axon) on the same posts and compares lists bit-for-bit.

Usage: python scripts/tpu_validate_traceback.py [--mem 6] [--rate 1]
       [--list-size 2] [--dev 8] [--msg-len 30] [--rc] [--ct N]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_case(a, rng):
    from nanopore_dna_storage_tpu.config import ConvCodeConfig
    from nanopore_dna_storage_tpu.coding.conv import (conv_encode_bases,
                                                      make_conv_code)
    from nanopore_dna_storage_tpu.io.post import pack_posts
    from nanopore_dna_storage_tpu.ops.synthetic import synthetic_post

    enc = ConvCodeConfig(mem=a.mem, rate=a.rate, msg_len=a.msg_len)
    code = make_conv_code(enc)
    msgs = rng.integers(0, 2, (a.batch, a.msg_len), dtype=np.uint8)
    bases = conv_encode_bases(code, msgs)
    if a.rc:
        bases = [(3 - b)[::-1] for b in bases]
    posts = [synthetic_post(b, rng, noise=0.9) for b in bases]
    packed, nblks = pack_posts(posts)
    return msgs, packed, nblks


def decode(a, packed, nblks, backend, ct=None):
    from nanopore_dna_storage_tpu.config import ConvCodeConfig, DecodeConfig
    from nanopore_dna_storage_tpu.ops.lva import LVADecoder

    cfg = ConvCodeConfig(mem=a.mem, rate=a.rate, msg_len=a.msg_len, rc=a.rc)
    dec = LVADecoder(DecodeConfig(code=cfg, list_size=a.list_size,
                                  max_deviation=a.dev, backend=backend,
                                  pallas_ct=ct))
    return dec.decode(packed, nblks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mem", type=int, default=6)
    ap.add_argument("--rate", type=int, default=1)
    ap.add_argument("--list-size", type=int, default=2)
    ap.add_argument("--dev", type=int, default=8)
    ap.add_argument("--msg-len", type=int, default=30)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--rc", action="store_true")
    ap.add_argument("--ct", type=int, default=None)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--golden", default=None,
                    help="validate against a reference-binary golden case "
                         "instead of a CPU-XLA child: a path relative to "
                         "tests/golden, e.g. decode14/m14_r5_rc0_l4_prod")
    ap.add_argument("--child-cpu", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.golden:
        return run_golden(args)

    rng = np.random.default_rng(args.seed)
    msgs, packed, nblks = build_case(args, rng)

    if args.child_cpu:
        # sitecustomize pins JAX_PLATFORMS=axon; the env var alone is not
        # enough (cf. tests/conftest.py)
        import jax
        jax.config.update("jax_platforms", "cpu")
        m, sc, valid = decode(args, packed, nblks, "xla")
        np.savez(args.child_cpu, m=m, sc=sc, valid=valid)
        return

    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        ref_path = f.name
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, __file__, "--child-cpu", ref_path,
           "--mem", str(args.mem), "--rate", str(args.rate),
           "--list-size", str(args.list_size), "--dev", str(args.dev),
           "--msg-len", str(args.msg_len), "--batch", str(args.batch),
           "--seed", str(args.seed)]
    if args.rc:
        cmd.append("--rc")
    subprocess.run(cmd, env=env, check=True)
    ref = np.load(ref_path + ("" if ref_path.endswith(".npz") else ".npz"))

    import jax
    print("devices:", jax.devices(), flush=True)
    m, sc, valid = decode(args, packed, nblks, "pallas", ct=args.ct)

    ok_valid = bool(np.array_equal(ref["valid"], valid))
    ok_sc = bool(np.allclose(ref["sc"], sc, rtol=1e-5, atol=1e-5))
    ok_m = bool(np.array_equal(ref["m"][ref["valid"]], m[valid]))
    top_ok = bool((m[:, 0] == msgs).all()) if not args.rc else None
    print(json.dumps({"valid_eq": ok_valid, "scores_close": ok_sc,
                      "msgs_eq": ok_m, "top_correct": top_ok}))
    if not (ok_valid and ok_sc and ok_m):
        sys.exit(1)


def run_golden(args):
    """Decode a golden .post with the pallas backend on the REAL TPU and
    require bit-for-bit the reference binary's decoded lists (the golden
    oracle is the C++ itself, no CPU-XLA middleman)."""
    import json as _json
    import pathlib

    gdir = pathlib.Path(REPO) / "tests" / "golden"
    sub, name = args.golden.split("/", 1)
    with open(gdir / sub / "manifest.json") as f:
        case = next(c for c in _json.load(f) if c["name"] == name)
    post = np.fromfile(gdir / sub / f"{name}.post",
                       dtype="<f4").reshape(-1, 5, 8)
    want = (gdir / sub / f"{name}.lists").read_text().split()

    from nanopore_dna_storage_tpu.config import ConvCodeConfig, DecodeConfig
    from nanopore_dna_storage_tpu.ops.lva import LVADecoder
    import jax
    print("devices:", jax.devices(), flush=True)
    dec = LVADecoder(DecodeConfig(
        code=ConvCodeConfig(mem=case["mem"], rate=case["rate"],
                            msg_len=case["msg_len"], rc=case["rc"]),
        list_size=case["list_size"], max_deviation=case["max_deviation"],
        backend="pallas", pallas_ct=args.ct))
    m, sc, valid = dec.decode(post[None])
    got = ["".join(map(str, mm)) for mm, vv in zip(m[0], valid[0]) if vv]
    ok = got == want
    print(json.dumps({"golden": args.golden, "lists_eq": ok,
                      "n_lists": len(got)}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
