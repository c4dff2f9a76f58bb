#!/usr/bin/env python3
"""Follow-up MXU probe: why did tpu_mxu_expand_probe measure 0.14 T MAC/s?
Sweep precision / dtype / per-cell matmul size to separate fixed per-call
overhead from the matmul itself.

Usage: python scripts/tpu_mxu_probe2.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 256


def bench(rows, k, ct, prec, dtype, label):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((rows, k)).astype(dtype)
    e = np.zeros((k, ct), dtype)
    for j in range(ct):
        e[(j * k) // ct, j] = 1.0

    def kernel(x_ref, e_ref, o_ref):
        y = jax.lax.dot_general(
            x_ref[...], e_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        o_ref[...] = y

    vm = pltpu.VMEM
    fn = pl.pallas_call(
        kernel, grid=(G,),
        in_specs=[pl.BlockSpec((rows, k), lambda i: (0, 0), memory_space=vm),
                  pl.BlockSpec((k, ct), lambda i: (0, 0), memory_space=vm)],
        out_specs=pl.BlockSpec((rows, ct), lambda i: (0, 0), memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((rows, ct), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))
    fj = jax.jit(fn)
    fj(x, e).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fj(x, e).block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    macs = G * rows * k * ct
    print(f"{label:42s} {dt*1e6:8.0f} us/call {macs/dt/1e12:7.2f} T MAC/s "
          f"({dt/G*1e6:7.2f} us/cell)", flush=True)


def main():
    H = jax.lax.Precision.HIGHEST
    D = jax.lax.Precision.DEFAULT
    bench(256, 128, 512, H, np.float32, "f32 HIGHEST  256x128x512")
    bench(256, 128, 512, D, np.float32, "f32 DEFAULT  256x128x512")
    bench(256, 128, 512, D, jnp.bfloat16, "bf16 DEFAULT 256x128x512")
    bench(256, 512, 512, D, np.float32, "f32 DEFAULT  256x512x512")
    bench(1024, 512, 512, D, np.float32, "f32 DEFAULT 1024x512x512")
    bench(64, 128, 512, H, np.float32, "f32 HIGHEST   64x128x512")
    bench(320, 512, 2048, H, np.float32, "f32 HIGHEST 320x512x2048 (full cell)")
    bench(320, 512, 2048, D, np.float32, "f32 DEFAULT 320x512x2048 (full cell)")


if __name__ == "__main__":
    main()
