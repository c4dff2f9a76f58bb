#!/usr/bin/env python3
"""Probe candidate lowerings for the lane-upsample (predecessor expansion).

Target op: y[.., j] = x[.., j // k] for j in [0, C) — element-repeat along
lanes. Run each probe on the real TPU; prints OK / FAIL / wrong-values.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, K = 1024, 2


def _run(kern, x, shape=None, dtype=None):
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(shape or x.shape,
                                             dtype or x.dtype))(x)


def _check(y, ref, name):
    y = np.asarray(y)
    if np.array_equal(y, ref):
        print(f"{name} OK")
    else:
        print(f"{name} WRONG (got {y[0, :8]}, want {ref[0, :8]})")


def p_take():
    """Static lane gather via jnp.take."""
    idx = jnp.arange(C) // K

    def kern(x_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], idx, axis=1)

    x = jnp.asarray(np.random.randn(8, C), jnp.float32)
    _check(_run(kern, x), np.asarray(x)[:, np.arange(C) // K], "take")


def p_jnprepeat():
    """jnp.repeat along lanes."""
    def kern(x_ref, o_ref):
        o_ref[...] = jnp.repeat(x_ref[...][:, : C // K], K, axis=1)

    x = jnp.asarray(np.random.randn(8, C), jnp.float32)
    _check(_run(kern, x), np.repeat(np.asarray(x)[:, : C // K], K, 1),
           "jnprepeat")


def p_pltpurepeat_semantics():
    """What does pltpu.repeat actually produce?"""
    def kern(x_ref, o_ref):
        o_ref[...] = pltpu.repeat(x_ref[...][:, : C // K], K, axis=1)

    x = jnp.asarray(np.arange(8 * C).reshape(8, C), jnp.float32)
    y = np.asarray(_run(kern, x))
    el = np.repeat(np.asarray(x)[:, : C // K], K, 1)
    tile = np.tile(np.asarray(x)[:, : C // K], (1, K))
    kind = ("element" if np.array_equal(y, el)
            else "tile" if np.array_equal(y, tile) else "other")
    print(f"pltpu.repeat semantics: {kind}")


def p_transpose():
    """Minor-dims transpose [16,128] <-> [128,16] inside kernel."""
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    x = jnp.asarray(np.random.randn(16, 128), jnp.float32)
    y = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
        (128, 16), jnp.float32))(x)
    _check(y, np.asarray(x).T, "transpose")


def p_subl_upsample():
    """Sublane element-repeat [8, C] -> [16?, ..]: y[i] = x[i//2] on axis 0."""
    def kern(x_ref, o_ref):
        x = x_ref[...]  # [8, 128]
        o_ref[...] = jnp.repeat(x, 2, axis=0)

    x = jnp.asarray(np.random.randn(8, 128), jnp.float32)
    y = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(
        (16, 128), jnp.float32))(x)
    _check(y, np.repeat(np.asarray(x), 2, 0), "subl_upsample")


def p_roll():
    """pltpu.roll along lanes + per-lane select."""
    def kern(x_ref, o_ref):
        x = x_ref[...]
        r = pltpu.roll(x, 1, 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (8, C), 1)
        o_ref[...] = jnp.where(j % 2 == 0, x, r)

    x = jnp.asarray(np.random.randn(8, C), jnp.float32)
    xa = np.asarray(x)
    r = np.roll(xa, 1, 1)
    j = np.arange(C)[None, :]
    _check(_run(kern, x), np.where(j % 2 == 0, xa, r), "roll")


def p_butterfly():
    """y[j] = x[j >> 1] via index-tracked butterfly of rolls."""
    def kern(x_ref, o_ref):
        y = x_ref[...]
        j = jax.lax.broadcasted_iota(jnp.int32, (8, C), 1)
        src = j >> 1
        cur = j
        for d in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
            yr = pltpu.roll(y, d, 1)  # yr[j] = y[j - d]
            cr = pltpu.roll(cur, d, 1)
            take = (cr >= src) & (cr < cur)  # moving toward src from above
            y = jnp.where(take, yr, y)
            cur = jnp.where(take, cr, cur)
        o_ref[...] = y

    x = jnp.asarray(np.random.randn(8, C), jnp.float32)
    _check(_run(kern, x), np.asarray(x)[:, np.arange(C) >> 1], "butterfly")


ALL = {f.__name__[2:]: f for f in
       (p_take, p_jnprepeat, p_pltpurepeat_semantics, p_transpose,
        p_subl_upsample, p_roll, p_butterfly)}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for n in names:
        try:
            ALL[n]()
        except Exception as e:  # noqa: BLE001
            print(f"{n} FAIL: {type(e).__name__}: {str(e)[:200]}")
