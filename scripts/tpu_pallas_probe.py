#!/usr/bin/env python3
"""Micro-probe Mosaic lowerings the LVA pallas kernel depends on.

Each probe is a tiny pallas kernel; run on the real TPU:
  python scripts/tpu_pallas_probe.py [probe ...]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def p_repeat():
    """Lane repeat: out[.., i] = x[.., i//k] (predecessor expansion)."""
    C, k = 1024, 4

    def kern(x_ref, o_ref):
        x = x_ref[...]  # [8, C]
        half = x[:, : C // k]  # [8, C//k]
        rep = jnp.broadcast_to(half[:, :, None], (8, C // k, k))
        o_ref[...] = rep.reshape(8, C)

    x = jnp.asarray(np.random.randn(8, C), jnp.float32)
    y = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8, C),
                                                            jnp.float32))(x)
    ref = np.repeat(np.asarray(x)[:, : C // k], k, axis=1)
    assert np.array_equal(np.asarray(y), ref), "repeat mismatch"
    print("repeat OK")


def p_dynrow():
    """Dynamic row index into a full-array VMEM ref."""
    P, C = 136, 1024

    def kern(i_ref, x_ref, o_ref):
        i = i_ref[0]
        o_ref[...] = x_ref[pl.ds(i, 1)]

    x = jnp.asarray(np.random.randn(P, C), jnp.float32)
    idx = jnp.asarray([37], jnp.int32)
    y = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32))(idx, x)
    assert np.allclose(np.asarray(y)[0], np.asarray(x)[37])
    print("dynrow OK")


def p_int16():
    """int16 compute + store."""
    def kern(x_ref, o_ref):
        v = x_ref[...].astype(jnp.int32) * 64 + 7
        o_ref[...] = v.astype(jnp.int16)

    x = jnp.asarray(np.arange(64 * 1024).reshape(64, 1024) % 33, jnp.int32)
    y = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((64, 1024),
                                                            jnp.int16))(x)
    assert np.array_equal(np.asarray(y),
                          (np.asarray(x) * 64 + 7).astype(np.int16))
    print("int16 OK")


def p_fori():
    """fori_loop carrying [32, C]x4 VMEM values, one-hot select inside."""
    NQ, C, R = 32, 1024, 18

    def kern(x_ref, o_ref):
        x = x_ref[...]  # [NQ, C]

        def body(i, st):
            sc, h, ptr, out = st
            q = jnp.argmax(sc, axis=0)  # [C]
            best = jnp.max(sc, axis=0)
            qi = jax.lax.broadcasted_iota(jnp.int32, (NQ, C), 0)
            oh = qi == q[None, :]
            hh = jnp.where(oh, h, jnp.uint32(0)).sum(0, dtype=jnp.uint32)
            ptr = ptr + oh.astype(jnp.int32)
            sc = jnp.where(oh, sc - 1.0, sc)
            out = out + best + (hh & 1).astype(jnp.int32).astype(jnp.float32) * 0.0
            return sc, h, ptr, out

        st = (x, jnp.full((NQ, C), 3, jnp.uint32),
              jnp.zeros((NQ, C), jnp.int32), jnp.zeros((C,), jnp.float32))
        _, _, ptr, out = jax.lax.fori_loop(0, R, body, st)
        o_ref[...] = out[None] + ptr.sum(0).astype(jnp.float32)[None]

    x = jnp.asarray(np.random.randn(NQ, C), jnp.float32)
    y = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((1, C),
                                                            jnp.float32))(x)
    assert np.isfinite(np.asarray(y)).all()
    print("fori OK")


def p_reshape():
    """Sublane-merge reshape (8, L, C) -> (8L, C)."""
    L, C = 8, 1024

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(8 * L, C)

    x = jnp.asarray(np.random.randn(8, L, C), jnp.float32)
    y = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((8 * L, C),
                                                            jnp.float32))(x)
    assert np.array_equal(np.asarray(y), np.asarray(x).reshape(8 * L, C))
    print("reshape OK")


def p_alias():
    """Grid revisiting + input_output_aliases + scalar-offset index map."""
    P, C, W = 16, 256, 4

    def kern(s_ref, x_ref, stale_ref, o_ref):
        w = pl.program_id(0)
        o_ref[...] = stale_ref[...] + x_ref[...] + w

    x = jnp.asarray(np.random.randn(P, 8, C), jnp.float32)
    stale = jnp.zeros((P, 8, C), jnp.float32)
    s0 = jnp.asarray([3], jnp.int32)
    y = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(W,),
            in_specs=[
                pl.BlockSpec((1, 8, C), lambda w, s: (s[0] + w, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, C), lambda w, s: (s[0] + w, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, C), lambda w, s: (s[0] + w, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((P, 8, C), jnp.float32),
        input_output_aliases={2: 0},
    )(s0, x, stale)
    ref = np.zeros((P, 8, C), np.float32)
    for w in range(W):
        ref[3 + w] = np.asarray(x)[3 + w] + w
    assert np.allclose(np.asarray(y), ref)
    print("alias OK")


ALL = {f.__name__[2:]: f for f in
       (p_repeat, p_dynrow, p_int16, p_fori, p_reshape, p_alias)}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for n in names:
        try:
            ALL[n]()
        except Exception as e:  # noqa: BLE001
            print(f"{n} FAIL: {type(e).__name__}: {str(e)[:300]}")
