#!/usr/bin/env python3
"""Probe: expansion y[j] = x[j >> logk] via MXU matmul with a 0/1
selection matrix, vs the roll butterfly (measured ~0.9 T elem-ops/s vs
3.5 T for plain elementwise — rolls are the kernel's hot section).

Checks (a) lax.dot_general lowers inside a Mosaic kernel at our shapes,
(b) bit-exactness of int32 hash expansion via two exact 16-bit-half f32
matmuls (values < 2^16 are exact under the TPU's bf16 3-pass f32
emulation; HIGHEST requested anyway), (c) throughput vs the butterfly.

Usage: python scripts/tpu_mxu_expand_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, CT, ROWS = 128, 512, 256  # per-candidate rows: 2 hashes x 2 halves x 64
G = 256


def make_E(k=4):
    E = np.zeros((K, CT), np.float32)
    for j in range(CT):
        E[j // k, j] = 1.0
    return E


def kernel(x_ref, e_ref, o_ref):
    # x: int32 [ROWS/4=64 rows of h] -> split halves happens outside for
    # the probe; here x is already f32 halves [ROWS, K]
    x = x_ref[...]
    e = e_ref[...]
    y = jax.lax.dot_general(
        x, e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    o_ref[...] = y


def main():
    rng = np.random.default_rng(0)
    h = rng.integers(0, 1 << 30, (ROWS // 2, K), dtype=np.int64).astype(
        np.int32)
    # 16-bit halves as f32
    x = np.concatenate([(h & 0xFFFF).astype(np.float32),
                        (h >> 16).astype(np.float32)])
    E = make_E(4)
    vm = pltpu.VMEM
    fn = pl.pallas_call(
        kernel, grid=(G,),
        in_specs=[pl.BlockSpec((ROWS, K), lambda i: (0, 0),
                               memory_space=vm),
                  pl.BlockSpec((K, CT), lambda i: (0, 0),
                               memory_space=vm)],
        out_specs=pl.BlockSpec((ROWS, CT), lambda i: (0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((ROWS, CT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))
    fj = jax.jit(fn)
    t0 = time.perf_counter()
    y = np.asarray(fj(x, E))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    # exactness: reassemble and compare to numpy j>>2 expansion
    lo = y[: ROWS // 2].astype(np.int64)
    hi = y[ROWS // 2:].astype(np.int64)
    got = (hi.astype(np.int64) * 65536 + lo).astype(np.int32)
    want = h[:, (np.arange(CT) // 4)]
    print("exact:", (got == want).all(), flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fj(x, E).block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    macs = G * ROWS * K * CT
    print(f"{dt*1e6:.0f} us/call, {macs/dt/1e12:.2f} T MAC/s "
          f"({dt/G*1e6:.2f} us/cell-equivalent)", flush=True)


if __name__ == "__main__":
    main()
