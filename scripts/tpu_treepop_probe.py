#!/usr/bin/env python3
"""Probe which construct in the v12 tree-pop merge aborts the Mosaic
compile: leading-axis reshape pairing, mid-axis static indexing, or
leading-axis concatenate. Run variants on the axon chip one at a time.

Usage: python scripts/tpu_treepop_probe.py [variant ...]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NC, F, CT = 64, 8, 128


def make(variant):
    def kernel(x_ref, h_ref, o_ref, oh_ref):
        csc = x_ref[...]
        ch = h_ref[...]

        if variant == "reshape_pair":
            while csc.shape[0] > 1:
                n2 = (csc.shape[0] // 2) * 2
                p = csc[0:n2].reshape(n2 // 2, 2, *csc.shape[1:])
                q = ch[0:n2].reshape(n2 // 2, 2, *ch.shape[1:])
                a, b = p[:, 0], p[:, 1]
                tk = b > a
                csc = jnp.where(tk, b, a)
                ch = jnp.where(tk, q[:, 1], q[:, 0])
            o_ref[...] = csc[0]
            oh_ref[...] = ch[0]
        elif variant == "halves":
            # split halves instead of adjacent pairs (index order differs,
            # just a lowering probe)
            while csc.shape[0] > 1:
                n = csc.shape[0] // 2
                a, b = csc[:n], csc[n:2 * n]
                ha, hb = ch[:n], ch[n:2 * n]
                tk = b > a
                csc = jnp.where(tk, b, a)
                ch = jnp.where(tk, hb, ha)
            o_ref[...] = csc[0]
            oh_ref[...] = ch[0]
        elif variant == "concat":
            # odd-length level: reshape pairing + leading concat
            csc = csc[0:60]
            ch = ch[0:60]
            while csc.shape[0] > 1:
                n = csc.shape[0]
                n2 = (n // 2) * 2
                p = csc[0:n2].reshape(n2 // 2, 2, *csc.shape[1:])
                q = ch[0:n2].reshape(n2 // 2, 2, *ch.shape[1:])
                tk = p[:, 1] > p[:, 0]
                y = jnp.where(tk, p[:, 1], p[:, 0])
                z = jnp.where(tk, q[:, 1], q[:, 0])
                if n2 < n:
                    y = jnp.concatenate([y, csc[n2:]], axis=0)
                    z = jnp.concatenate([z, ch[n2:]], axis=0)
                csc, ch = y, z
            o_ref[...] = csc[0]
            oh_ref[...] = ch[0]
        elif variant == "argmax":
            # the v10 structure for comparison
            best = jnp.max(csc, axis=0)
            bq = jnp.argmax(csc, axis=0)
            iC = jax.lax.broadcasted_iota(jnp.int32, csc.shape, 0)
            ohot = iC == bq[None]
            o_ref[...] = best
            oh_ref[...] = jnp.where(ohot, ch, 0).sum(0)

    return kernel


def run(variant):
    x = np.random.default_rng(0).normal(size=(NC, F, CT)).astype(np.float32)
    h = np.arange(NC * F * CT, dtype=np.int32).reshape(NC, F, CT)
    fn = pl.pallas_call(
        make(variant),
        out_shape=[jax.ShapeDtypeStruct((F, CT), jnp.float32),
                   jax.ShapeDtypeStruct((F, CT), jnp.int32)],
    )
    o, oh = fn(jnp.asarray(x), jnp.asarray(h))
    n = 60 if variant == "concat" else NC
    ref_best = x[:n].max(0)
    ref_arg = x[:n].argmax(0)
    ref_h = np.take_along_axis(h[:n], ref_arg[None], 0)[0]
    ok_v = np.allclose(np.asarray(o), ref_best)
    ok_h = (np.asarray(oh) == ref_h).all()
    print(f"{variant}: value_ok={ok_v} payload_ok={ok_h}", flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["reshape_pair"]):
        run(v)


def run_when(ct):
    """reshape_pair tree inside a pl.when (the real kernel's structure)."""
    x = np.random.default_rng(0).normal(size=(NC, F, ct)).astype(np.float32)
    h = np.arange(NC * F * ct, dtype=np.int32).reshape(NC, F, ct)

    def kernel(x_ref, h_ref, o_ref, oh_ref):
        @pl.when(x_ref[0, 0, 0] < 1e9)
        def _():
            csc = x_ref[...]
            ch = h_ref[...]
            while csc.shape[0] > 1:
                n2 = (csc.shape[0] // 2) * 2
                p = csc[0:n2].reshape(n2 // 2, 2, *csc.shape[1:])
                q = ch[0:n2].reshape(n2 // 2, 2, *ch.shape[1:])
                a, b = p[:, 0], p[:, 1]
                tk = b > a
                csc = jnp.where(tk, b, a)
                ch = jnp.where(tk, q[:, 1], q[:, 0])
            o_ref[...] = csc[0]
            oh_ref[...] = ch[0]

    fn = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((F, ct), jnp.float32),
                   jax.ShapeDtypeStruct((F, ct), jnp.int32)])
    o, oh = fn(jnp.asarray(x), jnp.asarray(h))
    ref_arg = x.argmax(0)
    ok_v = np.allclose(np.asarray(o), x.max(0))
    ok_h = (np.asarray(oh) == np.take_along_axis(h, ref_arg[None], 0)[0]).all()
    print(f"when ct={ct}: value_ok={ok_v} payload_ok={ok_h}", flush=True)
