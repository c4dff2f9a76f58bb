"""Pallas TPU kernel for the list-Viterbi add-compare-select step.

Phase-1 of the per-block trellis update: for every in-window state
(pos, conv, crf) run the K-way lazy merge (candidate heads, argmax over the
33 predecessors, hash dedup, pointer advance) entirely in VMEM, emitting the
new (score, hash1, hash2) lists plus packed winner selections. Message
materialization (phase 2) stays in XLA — ops/lva.py calls this kernel when
DecodeConfig.backend == "pallas".

Design (see also ops/lva.py docstring):

* grid = (W, C // CT): window position x conv tile. For the headline m=11
  config CT == C == 2048, so each block's predecessor data is exactly one
  previous-position row — DMA'd once, no amplification.
* The conv predecessor structure (prev = (k*s + c) mod C) is realized by
  reshaping the previous-position row [C, 8, L] -> [C/k, k, 8, L] and tiling
  k-fold along the dest axis — done once per block into VMEM scratch, after
  which every merge round runs on lane-aligned [sublane, C] tiles.
* List-slot selection uses one-hot sums over L (TPU has no per-lane gather);
  rounds are pure VPU work.

Selections pack (q * 16 + list_pos), q in [0, 33); -1 = unfilled slot.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCRF = 8
NC = 4
NQ = 1 + NC * NCRF
NEG = float("-inf")

HASH_P1 = 1073741789
HASH_P2 = 1073741783


def _hash_update(h, shift, newbits, p: int):
    pv = jnp.uint32(p)
    t = (h << shift) + newbits
    for _ in range(3):
        t = jnp.where(t >= pv, t - pv, t)
    return t


def _expand_pred(row, k: int, CT: int, c0: int, C: int):
    """row: [C, 8, L] previous-position data -> [k, 8, L, CT] where
    out[c, g, l, s] = row[(k*(c0+s) + c) mod C, g, l] for dest lanes s."""
    L = row.shape[-1]
    r = row.reshape(C // k, k, NCRF, L)  # rows: dest (c0+s) mod (C/k)
    # dest lanes [c0, c0+CT): rows (c0 + s) mod (C/k)
    reps = max(1, (CT * k) // C)  # number of wraparound copies needed
    if C // k >= CT:
        # contiguous slice [c0 mod (C/k), + CT)
        start = c0 % (C // k)
        sl = jax.lax.dynamic_slice_in_dim(r, start, CT, axis=0)
    else:
        # CT > C/k: dest lanes wrap; tile the whole table then slice
        t = jnp.concatenate([r] * reps, axis=0)
        start = c0 % (C // k)
        sl = jax.lax.dynamic_slice_in_dim(t, start, CT, axis=0)
    return sl.transpose(1, 2, 3, 0)  # [k, 8, L, CT]


def _kernel(start_ref,  # scalar prefetch [1] int32 (= start1)
            p_sc, p_h1, p_h2,  # [1, CT, 8, L] stay sources
            r_sc, r_h1, r_h2,  # [1, C, 8, L] previous-position row
            stay_tr_ref,  # [1, 8] f32 (postf[stay_idx], XLA-precomputed)
            move_tr_ref,  # [8, 8] f32 (postf[move_idx])
            base_out,  # [4, CT, 4] int32
            nb1, nb2,  # [1, CT] uint32
            valid,  # [1, CT] int32
            pattern,  # [Ppad] int32 SMEM
            active,  # [1] int32 SMEM
            crfmask,  # [8, 8] int32
            stale_sc, stale_h1, stale_h2,  # [1, CT, 8, L] (aliased outs)
            out_sc, out_h1, out_h2,  # [1, CT, 8, L]
            out_sel,  # [1, CT, 8, L] int32
            *, CT: int, C: int, L: int, R: int, combine_lse: bool):
    w = pl.program_id(0)
    ci = pl.program_id(1)
    c0 = ci * CT
    start1 = start_ref[0]
    pos = start1 + w
    pat = pattern[pos]
    is1 = pat == 0

    stay_tr = stay_tr_ref[0]  # [8]
    move_tr = move_tr_ref[...]  # [f, g]

    # stay sources, conv on lanes
    psc = p_sc[0].transpose(1, 2, 0)  # [8, L, CT]
    ph1 = p_h1[0].transpose(1, 2, 0)
    ph2 = p_h2[0].transpose(1, 2, 0)

    # move candidate lists: [c, g, L, CT] (pattern 0: 2 candidates + padding)
    row_sc = r_sc[0]
    e2 = _expand_pred(row_sc, 2, CT, c0, C)
    e4 = _expand_pred(row_sc, 4, CT, c0, C)
    msrc = jnp.where(is1, jnp.concatenate([e2, jnp.full_like(e2, NEG)], 0), e4)
    h2_2 = _expand_pred(r_h1[0], 2, CT, c0, C)
    h2_4 = _expand_pred(r_h1[0], 4, CT, c0, C)
    mh1 = jnp.where(is1, jnp.concatenate([h2_2, h2_2], 0), h2_4)
    h3_2 = _expand_pred(r_h2[0], 2, CT, c0, C)
    h3_4 = _expand_pred(r_h2[0], 4, CT, c0, C)
    mh2 = jnp.where(is1, jnp.concatenate([h3_2, h3_2], 0), h3_4)

    # move validity/transition [f, c, g, CT]
    bo = base_out[pat].transpose(1, 0)  # [4c, CT]
    f_base = jax.lax.broadcasted_iota(jnp.int32, (NCRF, NC, NCRF, CT), 0) % 4
    match = bo[None, :, None, :] == f_base
    cv = jax.lax.broadcasted_iota(jnp.int32, (NCRF, NC, NCRF, CT), 1) < \
        jnp.where(is1, 2, 4)
    gok = crfmask[...][:, None, :, None] != 0
    mok = match & cv & gok & (pos > 1)
    mtr = jnp.where(mok, move_tr[:, None, :, None], NEG)

    shift_mv = jnp.where(is1, jnp.uint32(1), jnp.uint32(2))
    nb_mv = jnp.where(is1, nb1[0], nb2[0]).astype(jnp.uint32)  # [CT]

    def heads_stay(ptr0):
        acc = jnp.zeros((NCRF, CT), jnp.float32)
        for l in range(L):
            acc += jnp.where(ptr0 == l, psc[:, l, :], 0.0)
        return jnp.where(ptr0 < L, acc + stay_tr[:, None], NEG)

    def heads_move(ptrm):
        acc = jnp.zeros((NCRF, NC, NCRF, CT), jnp.float32)
        for l in range(L):
            acc += jnp.where(ptrm == l, msrc[None, :, :, l, :], 0.0)
        return jnp.where(ptrm < L, acc + mtr, NEG)

    def round_body(_, st):
        ptr0, ptrm, osc, oh1, oh2, osel, acc_n = st
        h0 = heads_stay(ptr0)  # [8, CT]
        hm = heads_move(ptrm)  # [8, 4, 8, CT]
        best = h0
        bq = jnp.zeros((NCRF, CT), jnp.int32)
        for c in range(NC):
            for g in range(NCRF):
                cand = hm[:, c, g, :]
                take = cand > best
                best = jnp.where(take, cand, best)
                bq = jnp.where(take, 1 + c * NCRF + g, bq)
        ok = best > NEG
        is_stay = bq == 0

        pstar = jnp.where(is_stay, ptr0, 0)
        for c in range(NC):
            for g in range(NCRF):
                q = 1 + c * NCRF + g
                pstar = jnp.where(bq == q, ptrm[:, c, g, :], pstar)
        lidx = jnp.clip(pstar, 0, L - 1)

        # winner's source hashes via one-hot over (c, g) then l
        sh1 = jnp.zeros((NCRF, CT), jnp.uint32)
        sh2 = jnp.zeros((NCRF, CT), jnp.uint32)
        for l in range(L):
            at_l = lidx == l
            sh1 = jnp.where(at_l & is_stay, ph1[:, l, :], sh1)
            sh2 = jnp.where(at_l & is_stay, ph2[:, l, :], sh2)
        # collapse (c,g) for each l on the move side
        for c in range(NC):
            for g in range(NCRF):
                q = 1 + c * NCRF + g
                hit = bq == q
                hl1 = jnp.zeros((NCRF, CT), jnp.uint32)
                hl2 = jnp.zeros((NCRF, CT), jnp.uint32)
                for l in range(L):
                    at_l = lidx == l
                    hl1 = jnp.where(at_l, mh1[c, g, l, :][None], hl1)
                    hl2 = jnp.where(at_l, mh2[c, g, l, :][None], hl2)
                sh1 = jnp.where(hit, hl1, sh1)
                sh2 = jnp.where(hit, hl2, sh2)
        sh = jnp.where(is_stay, jnp.uint32(0), shift_mv)
        nb = jnp.where(is_stay, jnp.uint32(0), nb_mv[None, :])
        ch1 = _hash_update(sh1, sh, nb, HASH_P1)
        ch2 = _hash_update(sh2, sh, nb, HASH_P2)

        seen = jnp.zeros((NCRF, CT), bool)
        for l in range(L):
            eq = (oh1[:, l, :] == ch1) & (oh2[:, l, :] == ch2) & (acc_n > l)
            if combine_lse:
                osc = osc.at[:, l, :].set(
                    jnp.where(eq & ok, jnp.logaddexp(osc[:, l, :], best),
                              osc[:, l, :]))
            seen = seen | eq
        accept = ok & (~seen) & (acc_n < L)
        for l in range(L):
            put = accept & (acc_n == l)
            osc = osc.at[:, l, :].set(jnp.where(put, best, osc[:, l, :]))
            oh1 = oh1.at[:, l, :].set(jnp.where(put, ch1, oh1[:, l, :]))
            oh2 = oh2.at[:, l, :].set(jnp.where(put, ch2, oh2[:, l, :]))
            osel = osel.at[:, l, :].set(
                jnp.where(put, bq * 16 + lidx, osel[:, l, :]))
        acc_n = acc_n + accept.astype(jnp.int32)

        ptr0 = ptr0 + (is_stay & ok).astype(jnp.int32)
        adv = ((~is_stay) & ok).astype(jnp.int32)
        onehot_q = jnp.zeros((NCRF, NC, NCRF, CT), jnp.int32)
        for c in range(NC):
            for g in range(NCRF):
                q = 1 + c * NCRF + g
                onehot_q = onehot_q.at[:, c, g, :].set(
                    jnp.where(bq == q, adv, 0))
        ptrm = ptrm + onehot_q
        return ptr0, ptrm, osc, oh1, oh2, osel, acc_n

    st = (
        jnp.zeros((NCRF, CT), jnp.int32),
        jnp.zeros((NCRF, NC, NCRF, CT), jnp.int32),
        jnp.full((NCRF, L, CT), NEG, jnp.float32),
        jnp.zeros((NCRF, L, CT), jnp.uint32),
        jnp.zeros((NCRF, L, CT), jnp.uint32),
        jnp.full((NCRF, L, CT), -1, jnp.int32),
        jnp.zeros((NCRF, CT), jnp.int32),
    )
    st = jax.lax.fori_loop(0, R, round_body, st)
    _, _, osc, oh1, oh2, osel, _ = st

    # position 0 (padded index 1): stay-only, slot 0 only
    ispos0 = pos == 1
    p0 = psc[:, 0, :] + stay_tr[:, None]
    for l in range(L):
        osc = osc.at[:, l, :].set(
            jnp.where(ispos0, p0 if l == 0 else jnp.full_like(p0, NEG),
                      osc[:, l, :]))
        oh1 = oh1.at[:, l, :].set(
            jnp.where(ispos0, ph1[:, l, :], oh1[:, l, :]))
        oh2 = oh2.at[:, l, :].set(
            jnp.where(ispos0, ph2[:, l, :], oh2[:, l, :]))
        osel = osel.at[:, l, :].set(
            jnp.where(ispos0, 0 if l == 0 else -1, osel[:, l, :]))

    wmask = (valid[0] != 0) & (active[0] != 0)  # [CT]
    ssc = stale_sc[0].transpose(1, 2, 0)
    sh1_ = stale_h1[0].transpose(1, 2, 0)
    sh2_ = stale_h2[0].transpose(1, 2, 0)
    m = wmask[None, None, :]
    out_sc[0] = jnp.where(m, osc, ssc).transpose(2, 0, 1)
    out_h1[0] = jnp.where(m, oh1, sh1_).transpose(2, 0, 1)
    out_h2[0] = jnp.where(m, oh2, sh2_).transpose(2, 0, 1)
    out_sel[0] = jnp.where(m, osel, -1).transpose(2, 0, 1)


def acs_step(spec, consts_np: Dict[str, np.ndarray], prev_sc, prev_h1,
             prev_h2, stale_sc, stale_h1, stale_h2, postf, start1, active,
             *, ct: int | None = None, interpret: bool = False):
    """One fused ACS block step. Buffers [P, C, 8, L]; returns
    (new_sc, new_h1, new_h2, sel[W, C, 8, L])."""
    P, C = prev_sc.shape[0], prev_sc.shape[1]
    L, W = spec.list_size, spec.window
    CT = min(ct or 2048, C)
    n_ct = C // CT
    grid = (W, n_ct)

    vm = pltpu.VMEM

    def im_p(w, c, s):
        return (s[0] + w, c, 0, 0)

    def im_row(w, c, s):
        return (s[0] + w - 1, 0, 0, 0)

    specs_in = (
        [pl.BlockSpec((1, CT, NCRF, L), im_p, memory_space=vm)] * 3
        + [pl.BlockSpec((1, C, NCRF, L), im_row, memory_space=vm)] * 3
        + [
            pl.BlockSpec((1, NCRF), lambda w, c, s: (0, 0),
                         memory_space=vm),  # stay_tr
            pl.BlockSpec((NCRF, NCRF), lambda w, c, s: (0, 0),
                         memory_space=vm),  # move_tr
            pl.BlockSpec((4, CT, 4), lambda w, c, s: (0, c, 0),
                         memory_space=vm),
            pl.BlockSpec((1, CT), lambda w, c, s: (0, c), memory_space=vm),
            pl.BlockSpec((1, CT), lambda w, c, s: (0, c), memory_space=vm),
            pl.BlockSpec((1, CT), lambda w, c, s: (s[0] + w, c),
                         memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pattern
            pl.BlockSpec(memory_space=pltpu.SMEM),  # active
            pl.BlockSpec((NCRF, NCRF), lambda w, c, s: (0, 0),
                         memory_space=vm),  # crfmask
        ]
        + [pl.BlockSpec((1, CT, NCRF, L), im_p, memory_space=vm)] * 3
    )
    specs_out = [pl.BlockSpec((1, CT, NCRF, L), im_p, memory_space=vm)] * 3 \
        + [pl.BlockSpec((1, CT, NCRF, L), lambda w, c, s: (w, c, 0, 0),
                        memory_space=vm)]
    out_shape = [
        jax.ShapeDtypeStruct((P, C, NCRF, L), jnp.float32),
        jax.ShapeDtypeStruct((P, C, NCRF, L), jnp.uint32),
        jax.ShapeDtypeStruct((P, C, NCRF, L), jnp.uint32),
        jax.ShapeDtypeStruct((W, C, NCRF, L), jnp.int32),
    ]

    kern = functools.partial(_kernel, CT=CT, C=C, L=L, R=spec.merge_rounds,
                             combine_lse=spec.combine_lse)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=specs_in,
        out_specs=specs_out)
    fn = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={16: 0, 17: 1, 18: 2},
        interpret=interpret,
    )
    stay_tr = postf[jnp.asarray(consts_np["stay_idx"])].reshape(1, NCRF)
    move_tr = postf[jnp.asarray(consts_np["move_idx"])]
    return fn(
        jnp.reshape(jnp.asarray(start1, jnp.int32), (1,)),
        prev_sc, prev_h1, prev_h2,
        prev_sc, prev_h1, prev_h2,  # previous-position rows (same buffers)
        stay_tr.astype(jnp.float32), move_tr.astype(jnp.float32),
        jnp.asarray(consts_np["base_out"], jnp.int32),
        jnp.asarray(consts_np["newbits1"], jnp.uint32).reshape(1, -1),
        jnp.asarray(consts_np["newbits2"], jnp.uint32).reshape(1, -1),
        jnp.asarray(consts_np["valid_state"], jnp.int32),
        jnp.asarray(consts_np["pattern_of_pos"], jnp.int32),
        jnp.reshape(jnp.asarray(active, jnp.int32), (1,)),
        jnp.asarray(consts_np["crf_mask"], jnp.int32),
        stale_sc, stale_h1, stale_h2,
    )
