#!/usr/bin/env python3
"""Empirical VPU roofline for the suppression-merge op pattern.

The analytic utilization estimate in bench.py divides counted element-ops
by the v5e VPU's theoretical peak (8x128 lanes x 4 ALUs x ~940 MHz). That
peak assumes perfectly packed, perfectly pipelined vector work; the merge
is a serial chain of full-array reductions and selects. This probe
measures what fraction of theoretical peak the chip actually sustains on:

1. ``stream``: independent elementwise max/add/select sweeps over the
   merge's array shapes — the best case any restructuring could reach;
2. ``merge``: the EXACT per-round op sequence of the production
   suppression merge (max + argmax + one-hot payload extraction + dual
   hash knockout), dependency chain included.

The ratio (kernel analytic utilization) / (merge pattern utilization
here) says how close the real kernel is to ITS OWN op pattern's
practical ceiling — the measurement-backed ceiling argument of
docs/DESIGN.md §5. Writes docs/VPU_ROOFLINE.json with --write.

Usage: python scripts/tpu_vpu_roofline.py [--rounds 8] [--grid 64]
"""
import argparse
import json
import os
import pathlib
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = pathlib.Path(__file__).resolve().parents[1]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NC, F, CT = 64, 8, 512
NEG = float("-inf")
# element-ops per merge round over the [NC, F, CT] candidate array, one
# op per element per arithmetic/compare/select pass (the same accounting
# as bench.estimate_kernel_ops): max 1 + argmax 2 + ohot 1 + 2x(sel+add)
# extraction 4 + eqh 3 + knockout 1 = 12 sweeps
MERGE_SWEEPS = 12
STREAM_SWEEPS = 12


def make_merge_kernel(rounds):
    def kernel(x_ref, h1_ref, h2_ref, o_ref):
        csc = x_ref[...]
        ch1s, ch2s = h1_ref[...], h2_ref[...]
        outs = []
        for _ in range(rounds):
            best = jnp.max(csc, axis=0)
            bq = jnp.argmax(csc, axis=0)
            iC = jax.lax.broadcasted_iota(jnp.int32, csc.shape, 0)
            ohot = iC == bq[None]
            ch1 = jnp.where(ohot, ch1s, 0).sum(0)
            ch2 = jnp.where(ohot, ch2s, 0).sum(0)
            eqh = (ch1s == ch1[None]) & (ch2s == ch2[None])
            csc = jnp.where(eqh, NEG, csc)
            outs.append(best + (ch1 + ch2).astype(jnp.float32))
        o_ref[...] = sum(outs)

    return kernel


def make_stream_kernel(rounds):
    """Same number of full-array sweeps, but independent elementwise work
    (max/add/select chains with fan-out parallelism) — the practical
    best case for this array shape on the VPU."""
    def kernel(x_ref, h1_ref, h2_ref, o_ref):
        a = x_ref[...]
        b = jax.lax.bitcast_convert_type(h1_ref[...], jnp.float32)
        c = jax.lax.bitcast_convert_type(h2_ref[...], jnp.float32)
        acc = a
        for _ in range(rounds):
            # 12 elementwise sweeps, pairwise-independent where possible
            t1 = jnp.maximum(acc, b)
            t2 = acc + c
            t3 = jnp.where(acc > b, c, acc)
            t4 = jnp.maximum(t1, t2)
            t5 = t3 + t1
            t6 = jnp.where(t2 > t3, t4, t5)
            t7 = t4 + t6
            t8 = jnp.maximum(t5, t7)
            t9 = jnp.where(t6 > t7, t8, t1)
            t10 = t8 + t9
            t11 = jnp.maximum(t9, t10)
            acc = jnp.where(t10 > t11, acc, t11)
        o_ref[...] = jnp.max(acc, axis=0)

    return kernel


def run(kind, rounds, grid, reps=5):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(NC, F, CT)).astype(np.float32)
    h = rng.integers(0, 1 << 30, (NC, F, CT), dtype=np.int64).astype(
        np.int32)
    kern = (make_merge_kernel if kind == "merge" else
            make_stream_kernel)(rounds)
    vm = pltpu.VMEM
    fn = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((NC, F, CT), lambda i: (0, 0, 0),
                               memory_space=vm)] * 3,
        out_specs=pl.BlockSpec((F, CT), lambda i: (0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((F, CT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    fj = jax.jit(fn)
    o = fj(x, h, h)
    o.block_until_ready()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fj(x, h, h).block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    sweeps = MERGE_SWEEPS if kind == "merge" else STREAM_SWEEPS
    elem_ops = grid * rounds * sweeps * NC * F * CT
    peak = 8 * 128 * 4 * 0.94e9
    rate = elem_ops / dt
    return {"kind": kind, "rounds": rounds, "grid": grid,
            "wall_s": round(dt, 4),
            "elem_ops_T": round(elem_ops / 1e12, 4),
            "ops_per_s_T": round(rate / 1e12, 3),
            "pct_of_theoretical_peak": round(100 * rate / peak, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    out = {"device": str(jax.devices()[0]),
           "shape": [NC, F, CT],
           "note": "pct_of_theoretical_peak = measured element-ops/s vs "
                   "8*128 lanes * 4 ALUs * 0.94 GHz; 'stream' = "
                   "independent elementwise sweeps (practical best case "
                   "for this shape), 'merge' = the exact production "
                   "suppression-merge round (serial reductions + "
                   "knockout)"}
    for kind in ("stream", "merge"):
        r = run(kind, args.rounds, args.grid)
        out[kind] = r
        print(json.dumps(r), flush=True)
    if args.write:
        (REPO / "docs" / "VPU_ROOFLINE.json").write_text(
            json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
