#!/usr/bin/env python3
"""Bisect which part of the decode graph upsets the axon TPU backend.

Run stages in order with a fresh process each (a crash kills the worker for
a while):  python scripts/tpu_bisect.py <stage>

Stages:
  0  tiny matmul (worker alive?)
  1  scan carrying two [P,C,8,L] buffers with dynamic slice/update
  2  + reshape/tile conv-source expansion and where-masking
  3  + take_along_axis heads over broadcast src + argmax
  4  + one merge round (hash update, one-hot scatter)
  5  full _step via LVADecoder on a tiny m=6 config (B=1)
  6  full smoke bench config (m=6, msg_len=100, L=4, B=2)
"""
import sys
import time

import numpy as np


def main(stage: int):
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    if stage == 0:
        x = jnp.ones((128, 128))
        print(float(jax.jit(lambda a: (a @ a).sum())(x)))
    elif stage in (1, 2, 3, 4):
        P, C, L, W, T = 20, 64, 4, 8, 16
        sc = jnp.full((P, C, 8, L), -jnp.inf)
        sc = sc.at[1, 3, :, 0].set(0.0)
        other = jnp.full((P, C, 8, L), -jnp.inf)

        def step(carry, xs):
            prev, stale = carry
            start1 = xs
            p = jax.lax.dynamic_slice_in_dim(prev, start1, W, axis=0)
            pm1 = jax.lax.dynamic_slice_in_dim(prev, start1 - 1, W, axis=0)
            new = p
            if stage >= 2:
                src1 = jnp.tile(pm1.reshape(W, C // 2, 2, 8, L),
                                (1, 2, 1, 1, 1))
                src2 = jnp.tile(pm1.reshape(W, C // 4, 4, 8, L),
                                (1, 4, 1, 1, 1))
                src = jnp.where(True, src2,
                                jnp.concatenate(
                                    [src1, jnp.full_like(src1, -jnp.inf)],
                                    axis=2))
                new = new + src.max(axis=(2, 3))[:, :, None] * 0
            if stage >= 3:
                ptr = jnp.zeros((W, C, 8, 4, 8), jnp.int32)
                srcb = jnp.broadcast_to(src[:, :, None],
                                        (W, C, 8, 4, 8, L))
                hm = jnp.take_along_axis(
                    srcb, jnp.clip(ptr, 0, L - 1)[..., None], axis=-1)[..., 0]
                q = jnp.argmax(hm.reshape(W, C, 8, 32), axis=-1)
                new = new + (q[..., None] * 0).astype(new.dtype)
            if stage >= 4:
                h = jnp.zeros((W, C, 8), jnp.uint32)
                sh = jnp.ones((W, C, 8), jnp.uint32)
                t = (h << sh) + jnp.uint32(3)
                p1 = jnp.uint32(1073741789)
                t = jnp.where(t >= p1, t - p1, t)
                onehot = jax.nn.one_hot(q % L, L, dtype=jnp.int32)
                new = new + (onehot.sum(-1)[..., None] * 0).astype(new.dtype)
            upd = jax.lax.dynamic_update_slice_in_dim(stale, new, start1,
                                                      axis=0)
            return (upd, prev), ()

        starts = jnp.clip(jnp.arange(T, dtype=jnp.int32) // 2, 0, P - W - 1) + 1
        (a, b), _ = jax.jit(lambda c, s: jax.lax.scan(step, c, s))(
            (sc, other), starts)
        print("stage", stage, "ok", float(jnp.nanmax(
            jnp.where(jnp.isfinite(a), a, 0.0))))
    elif stage == 5:
        from nanopore_dna_storage_tpu.config import (ConvCodeConfig,
                                                     DecodeConfig)
        from nanopore_dna_storage_tpu.ops.lva import LVADecoder
        from nanopore_dna_storage_tpu.ops.synthetic import synthetic_post
        from nanopore_dna_storage_tpu.coding.conv import (make_conv_code,
                                                          conv_encode_bases)

        rng = np.random.default_rng(0)
        cfg = ConvCodeConfig(mem=6, rate=1, msg_len=30)
        code = make_conv_code(cfg)
        msg = rng.integers(0, 2, (1, 30), dtype=np.uint8)
        post = synthetic_post(conv_encode_bases(code, msg)[0], rng)
        dec = LVADecoder(DecodeConfig(code=cfg, list_size=2,
                                      max_deviation=8))
        msgs, sc, valid = dec.decode(post[None])
        print("stage 5 ok; top==true:",
              (msgs[0, 0] == msg[0]).all(), float(sc[0, 0]))
    elif stage == 6:
        import subprocess
        r = subprocess.run([sys.executable, "bench.py", "--smoke",
                            "--skip-cpp", "--reads", "4", "--batch", "2"],
                           capture_output=True, text=True, timeout=500)
        print(r.stdout.strip()[-200:])
        print(r.stderr.strip()[-200:])
    print(f"elapsed {time.time() - t0:.1f}s")


def micro(stage: int):
    import jax
    import jax.numpy as jnp
    import time
    t0 = time.time()
    P, C, L, W = 20, 64, 4, 8
    x = jnp.arange(P * C * 8 * L, dtype=jnp.float32).reshape(P, C, 8, L)
    pm1 = jax.lax.dynamic_slice_in_dim(x, 2, W, axis=0)

    def f7(pm1):  # tile/reshape expansion only
        s1 = jnp.tile(pm1.reshape(W, C // 2, 2, 8, L), (1, 2, 1, 1, 1))
        return s1.sum()

    def f8(pm1):  # concat with -inf fill + where on broadcast bool
        s1 = jnp.tile(pm1.reshape(W, C // 2, 2, 8, L), (1, 2, 1, 1, 1))
        s2 = jnp.tile(pm1.reshape(W, C // 4, 4, 8, L), (1, 4, 1, 1, 1))
        cat = jnp.concatenate([s1, jnp.full_like(s1, -jnp.inf)], axis=2)
        sel = jnp.where(jnp.array([True])[0], s2, cat)
        return jnp.where(jnp.isfinite(sel), sel, 0.0).sum()

    def f9(pm1):  # scan wrapping the tile expansion
        def step(c, _):
            s2 = jnp.tile(pm1.reshape(W, C // 4, 4, 8, L), (1, 4, 1, 1, 1))
            return c + s2.mean(), ()
        out, _ = jax.lax.scan(step, 0.0, None, length=4)
        return out

    fn = {7: f7, 8: f8, 9: f9}[stage]
    print("micro", stage, float(jax.jit(fn)(pm1)), f"{time.time()-t0:.1f}s")


if __name__ == "__main__":
    s = int(sys.argv[1])
    if s >= 7:
        micro(s)
    else:
        main(s)
