#!/usr/bin/env python3
"""Probe the m=8 r=1/2 L=64 Pallas decode on TPU (VERDICT r3 missing #1).

L=64 puts nq*L = 512 candidates into the suppression merge; Mosaic compile
never finished on the single-pass kernel (round 3). The hierarchical merge
(ops/lva_pallas.py, MERGE_NCAND_MAX) caps every pass at 256 candidates —
the shape measured to compile (L=32). This probe compiles + decodes ONE
read and checks the lists against the reference binary.

Run in a subprocess with a generous timeout; a failed TPU compile kills
the axon worker for minutes (see bench.py wait_for_worker).

Usage: python scripts/tpu_m8_probe.py [--msg-len 100] [--list-size 64]
"""
import argparse
import os
import pathlib
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--msg-len", type=int, default=100)
    ap.add_argument("--list-size", type=int, default=64)
    ap.add_argument("--max-deviation", type=int, default=20)
    ap.add_argument("--ct", type=int, default=None,
                    help="conv tile width override (compile-time probe)")
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from nanopore_dna_storage_tpu.config import (ConvCodeConfig,
                                                 DecodeConfig)
    from nanopore_dna_storage_tpu.ops.lva import LVADecoder
    from nanopore_dna_storage_tpu.coding.conv import (make_conv_code,
                                                      conv_encode_bases)
    from nanopore_dna_storage_tpu.ops.synthetic import synthetic_post

    rng = np.random.default_rng(42)
    cfg = ConvCodeConfig(mem=8, rate=1, msg_len=args.msg_len)
    code = make_conv_code(cfg)
    msg = rng.integers(0, 2, (1, cfg.msg_len), dtype=np.uint8)
    bases = conv_encode_bases(code, msg)
    post = synthetic_post(bases[0], rng, noise=1.0)
    print(f"post blocks {post.shape[0]}", flush=True)

    dec = LVADecoder(DecodeConfig(code=cfg, list_size=args.list_size,
                                  max_deviation=args.max_deviation,
                                  backend="pallas", pallas_ct=args.ct))
    t0 = time.perf_counter()
    m, sc, v = dec.decode(post[None])  # compile + first decode
    t_first = time.perf_counter() - t0
    print(f"compile+decode {t_first:.1f}s", flush=True)
    t0 = time.perf_counter()
    m, sc, v = dec.decode(post[None])
    t_run = time.perf_counter() - t0
    got = ["".join(map(str, mm)) for mm, vv in zip(m[0], v[0]) if vv]
    print(f"steady decode {t_run:.2f}s, {len(got)} lists", flush=True)

    if not args.skip_verify:
        td = pathlib.Path(tempfile.mkdtemp())
        pf = td / "p.post"
        post.astype("<f4").tofile(pf)
        subprocess.run(
            ["/tmp/refbin/viterbi_nanopore.out", "-m", "decode", "-i",
             str(pf), "-o", str(td / "out"), "--mem-conv", "8",
             "--msg-len", str(cfg.msg_len), "-l", str(args.list_size),
             "-r", "1", "-t", "4",
             "--max-deviation", str(args.max_deviation)],
            check=True, capture_output=True)
        ref = [ln.strip() for ln in (td / "out").read_text().splitlines()
               if ln.strip()]
        print(f"lists_match: {got == ref}", flush=True)
        assert got == ref
    print("M8 PROBE OK", flush=True)


if __name__ == "__main__":
    main()
