#!/usr/bin/env python3
"""Time the headline m=11 pallas decode at a given conv tile width.

Usage: python scripts/tpu_ct_probe.py [CT]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ct = int(sys.argv[1]) if len(sys.argv) > 1 else None
    from nanopore_dna_storage_tpu.config import ConvCodeConfig, DecodeConfig
    from nanopore_dna_storage_tpu.coding.conv import (
        make_conv_code, conv_encode_bases)
    from nanopore_dna_storage_tpu.ops.synthetic import synthetic_post
    from nanopore_dna_storage_tpu.ops.lva import LVADecoder
    from nanopore_dna_storage_tpu.io.post import pack_posts

    cfg = ConvCodeConfig(mem=11, rate=5, msg_len=180)
    rng = np.random.default_rng(42)
    code = make_conv_code(cfg)
    msgs = rng.integers(0, 2, (2, cfg.msg_len), dtype=np.uint8)
    bases = conv_encode_bases(code, msgs)
    posts = [synthetic_post(b, rng, noise=1.0) for b in bases]
    packed, nblks = pack_posts(posts)

    dec = LVADecoder(DecodeConfig(code=cfg, list_size=8, max_deviation=20,
                                  backend="pallas", pallas_ct=ct))
    dec.decode(packed[:1], nblks[:1])  # compile
    t0 = time.perf_counter()
    for i in range(2):
        dec.decode(packed[i:i + 1], nblks[i:i + 1])
    dt = (time.perf_counter() - t0) / 2
    print(f"ct={ct}: {dt:.3f} s/read", flush=True)


if __name__ == "__main__":
    main()
