#!/usr/bin/env python3
"""Probe which decode configs the axon remote compiler can handle.

Usage: python scripts/tpu_compile_probe.py <mem> <dev> <B> [T]
Compile-only (lower+compile, no execution)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

sys.path.insert(0, "/root/repo")
from nanopore_dna_storage_tpu.config import ConvCodeConfig, DecodeConfig
from nanopore_dna_storage_tpu.ops import lva as L


def main(mem, dev, B, T=512):
    msg_len = {6: 100, 8: 100, 11: 180, 14: 180}[mem]
    rate = {6: 1, 8: 5, 11: 5, 14: 5}[mem]
    cfg = DecodeConfig(code=ConvCodeConfig(mem=mem, rate=rate,
                                           msg_len=msg_len),
                       list_size=8, max_deviation=dev)
    spec, tabs = L.LVASpec.build(cfg)
    consts = L._consts(spec, tabs)
    fn = jax.jit(jax.vmap(partial(L._decode_single, spec, consts)))
    args = (jnp.zeros((B, T, 5, 8), jnp.float32),
            jnp.zeros((B, T), jnp.int32), jnp.full((B,), T, jnp.int32))
    t0 = time.time()
    fn.lower(*args).compile()
    print(f"COMPILE-OK mem={mem} dev={dev} B={B} T={T} "
          f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
