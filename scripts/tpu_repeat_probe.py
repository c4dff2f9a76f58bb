#!/usr/bin/env python3
"""Probe: does lane-axis upsampling lower on Mosaic?

The ACS kernel needs y[j] = x[j >> logk] (upsample-by-k along lanes) to
expand conv predecessor lists. Round 1 used an 11-stage roll butterfly;
jnp.repeat / pltpu.repeat along the lane axis would be O(1) passes if it
lowers. This probe checks correctness and timing of both on hardware.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CT = 2048


def run(kind: str, k: int):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        sl = x[:, : CT // k]
        if kind == "jnp_repeat":
            y = jnp.repeat(sl, k, axis=1)
        elif kind == "pltpu_repeat":
            y = pltpu.repeat(sl, k, 1)
        elif kind == "roll_butterfly":
            # reference: what the kernel does today (mask butterfly)
            src = np.arange(CT) >> int(np.log2(k))
            cur = np.arange(CT)
            masks = []
            for _ in range(2):
                d = CT // 2
                while d >= 1:
                    cr = np.roll(cur, d)
                    take = (cr >= src) & (cr < cur)
                    cur = np.where(take, cr, cur)
                    masks.append(take)
                    d //= 2
                if (cur == src).all():
                    break
            y = jnp.tile(sl, (1, k))
            for m, d in zip(masks, ([CT >> (1 + i) for i in
                                     range(int(np.log2(CT)))] * 2)):
                y = jnp.where(jnp.asarray(m), pltpu.roll(y, d, 1), y)
        o_ref[:] = y

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, CT)).astype(np.float32))
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, CT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(fn)
    try:
        y = np.asarray(fn(x))
    except Exception as e:  # noqa: BLE001
        print(f"{kind} k={k}: FAIL {type(e).__name__}: {str(e)[:200]}")
        return
    want = np.asarray(x)[:, : CT // k].repeat(k, axis=1)
    ok = np.array_equal(y, want)
    # time it (loop inside jit to amortize dispatch)

    def many(x):
        def body(i, acc):
            return acc + fn(x + i.astype(jnp.float32))
        return jax.lax.fori_loop(0, 100, body, jnp.zeros((8, CT)))

    manyj = jax.jit(many)
    manyj(x).block_until_ready()
    t0 = time.perf_counter()
    manyj(x).block_until_ready()
    dt = (time.perf_counter() - t0) / 100
    print(f"{kind} k={k}: correct={ok} {dt*1e6:.1f}us/call")


if __name__ == "__main__":
    for kind in (sys.argv[1:] or ["jnp_repeat", "pltpu_repeat",
                                  "roll_butterfly"]):
        for k in (2, 4):
            run(kind, k)
