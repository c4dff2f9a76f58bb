#!/usr/bin/env python3
"""Execute (not just compile) one decode batch on the TPU and time it.

Usage: python scripts/tpu_run_probe.py <mem> <dev> <B> <chunks> [T] [L] [backend]
Prints RUN-OK with steady-state seconds/read, or dies with the error.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main(mem, dev, B, chunks, T=512, L=8, backend="xla", ct=0):
    from nanopore_dna_storage_tpu.config import ConvCodeConfig, DecodeConfig
    from nanopore_dna_storage_tpu.ops.lva import LVADecoder
    from nanopore_dna_storage_tpu.coding.conv import (make_conv_code,
                                                      conv_encode_bases)
    from nanopore_dna_storage_tpu.ops.synthetic import synthetic_post
    from nanopore_dna_storage_tpu.io.post import pack_posts

    mem, dev, B, chunks, T, L, ct = (
        int(x) for x in (mem, dev, B, chunks, T, L, ct))
    # m=14 r=5/6 needs the 1 pad bit (181, cf. BASELINE.md Table 1)
    msg_len = {6: 100, 8: 100, 11: 180, 14: 181}[mem]
    rate = {6: 1, 8: 5, 11: 5, 14: 5}[mem]
    cfg = ConvCodeConfig(mem=mem, rate=rate, msg_len=msg_len)
    rng = np.random.default_rng(0)
    code = make_conv_code(cfg)
    msgs = rng.integers(0, 2, (B, msg_len), dtype=np.uint8)
    bases = conv_encode_bases(code, msgs)
    posts = [synthetic_post(b, rng, noise=1.0) for b in bases]
    packed, nblks = pack_posts(posts)
    Tp = packed.shape[1]
    dec = LVADecoder(DecodeConfig(code=cfg, list_size=L, max_deviation=dev,
                                  window_chunks=chunks, backend=backend,
                                  pallas_ct=ct or None))
    t0 = time.time()
    out = dec.decode(packed, nblks)
    t1 = time.time()
    out = dec.decode(packed, nblks)
    t2 = time.time()
    top_ok = int((out[0][:, 0] == msgs).all(-1).sum())
    print(f"RUN-OK mem={mem} dev={dev} B={B} chunks={chunks} T={Tp} L={L} "
          f"backend={backend} first={t1 - t0:.1f}s "
          f"steady={(t2 - t1) / B:.2f}s/read top_correct={top_ok}/{B}",
          flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
