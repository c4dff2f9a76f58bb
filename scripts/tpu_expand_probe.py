#!/usr/bin/env python3
"""Probe lane-upsample (y[j] = x[j >> logk]) formulations on Mosaic.

The ACS kernel spends ~1/3 of its time in 11-stage roll butterflies doing
this. Candidates:
  bcast_reshape: broadcast_to(x[:, :, None], (.., n, k)).reshape(.., n*k)
  stack_reshape: stack k copies on a new minor axis, reshape
  butterfly:     the current mask butterfly (masks passed as input)
  butterfly3:    butterfly with 3 arrays fused in one [3*8, CT] call
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CT = 2048
S = 8  # sublanes


def bfly_masks(ct, logk):
    src = np.arange(ct) >> logk
    cur = np.arange(ct)
    masks = []
    for _ in range(2):
        d = ct // 2
        while d >= 1:
            cr = np.roll(cur, d)
            take = (cr >= src) & (cr < cur)
            cur = np.where(take, cr, cur)
            masks.append(take)
            d //= 2
        if (cur == src).all():
            break
    assert (cur == src).all()
    return np.stack(masks).astype(np.int32)


def shifts(ct, nst):
    one = [ct >> (1 + i) for i in range(int(np.log2(ct)))]
    return (one * 2)[:nst]


def run(kind: str, k: int):
    logk = int(np.log2(k))
    n = CT // k
    masks_np = bfly_masks(CT, logk)
    nst = masks_np.shape[0]

    def kernel(x_ref, m_ref, o_ref):
        x = x_ref[:]
        if kind == "bcast_reshape":
            sl = x[:, :n]
            y = jnp.broadcast_to(sl[:, :, None], (S, n, k)).reshape(S, CT)
        elif kind == "stack_reshape":
            sl = x[:, :n]
            y = jnp.stack([sl] * k, axis=-1).reshape(S, CT)
        elif kind == "butterfly":
            y = jnp.tile(x[:, :n], (1, k))
            for s, d in enumerate(shifts(CT, nst)):
                y = jnp.where(m_ref[s] != 0, pltpu.roll(y, d, 1), y)
        o_ref[:] = y

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (S, CT)).astype(np.float32))
    m = jnp.asarray(masks_np)
    fn = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, CT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        y = np.asarray(fn(x, m))
    except Exception as e:  # noqa: BLE001
        print(f"{kind} k={k}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return
    want = np.asarray(x)[:, :n].repeat(k, axis=1)
    ok = np.array_equal(y, want)

    def many(x):
        def body(i, acc):
            return acc + fn(x + i.astype(jnp.float32), m)
        return jax.lax.fori_loop(0, 200, body, jnp.zeros((S, CT)))

    manyj = jax.jit(many)
    manyj(x).block_until_ready()
    t0 = time.perf_counter()
    manyj(x).block_until_ready()
    dt = (time.perf_counter() - t0) / 200
    print(f"{kind} k={k}: correct={ok} {dt*1e6:.1f}us/call")


if __name__ == "__main__":
    for kind in (sys.argv[1:] or ["bcast_reshape", "stack_reshape",
                                  "butterfly"]):
        for k in (2, 4):
            run(kind, k)
