"""Fused Pallas TPU kernel for the list-Viterbi block step + traceback.

Replaces the per-state message carrying of the XLA path (ops/lva.py) with a
selection-traceback design, and the XLA fused-op soup with one kernel per
signal block. Faithful to ``decode_post_conv_parallel_LVA``
(reference viterbi/viterbi_convolutional_code.cpp:589-858); validated
list-for-list against the XLA path and the golden lists.

Design notes (docs/DESIGN.md §5 has the long version):

* **Bit-reversed conv indexing.** Conv state ``s`` is stored at lane
  ``rev(s)``. In rev space the shift-register predecessors
  ``(k*s + c) mod C`` sit at ``(r >> log2 k) | perm(c) * C/k`` — a contiguous
  slice followed by a lane upsample-by-k, which lowers as a fixed butterfly
  of ``pltpu.roll`` + select with host-precomputed take masks (arbitrary
  lane gathers/repeats do not lower on Mosaic; rolls do).
* **Base-compacted candidate lists.** Bit 0 of both generator polynomials
  is 1 for every supported code, so (dropped bits c) -> emitted base is
  injective per (pattern, lane): after expansion the NC candidate planes
  compact to ONE plane per emitted base, and each CRF destination merges
  1 + |G_f| <= 8 sorted lists (stay + one per legal CRF predecessor,
  cpp:878-889) instead of 1 + 4*|G_f|.
* **Persistent merge heads.** The reference's lazy heap with message dedup
  (cpp:744-799) runs as merge rounds over per-predecessor heads
  (score, hash1, hash2, ptr) kept in VMEM; each round takes the argmax head,
  dedups against accepted entries by dual modular hash, advances the winner's
  pointer and refreshes only its head. The while-loop exits once every lane
  is done (L slots filled or all heads exhausted), which makes the default
  exhaustive round bound nq*L — exact heap semantics — free. The 4 flip
  destinations (and the 4 flops) run as one stacked loop with an F axis
  beside the lanes.
* **Selections, not messages.** The kernel emits, per accepted list slot,
  the winning (predecessor, source-slot) code. Messages are reconstructed
  after the scan by walking selections backward (``traceback_batch``),
  replicating the double-buffer staleness rule: a read at block t sees the
  last write to that position with time parity (t-1) mod 2 — exactly the
  reference's swapped full buffers (cpp:667-687). This removes the
  [states, L, 256-bit] message buffers and their per-block bandwidth
  entirely; HBM carries only scores and hashes.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..trellis import tables as tb

NCRF = 8
NC = 4  # conv candidate slots (2 used by pattern 0)
NEG = float("-inf")

# dual modular-hash dedup primes; hashes are carried as int32 bit patterns
# (unsigned reductions do not lower on Mosaic) — all arithmetic is exact
# mod 2^32, and the conditional subtract treats negative as >= 2^31.
HASH_P1 = 1073741789
HASH_P2 = 1073741783

# static CRF move mask: flip f from any g != f; flop f from flip f-4 only
CRF_MASK = tb.crf_move_mask()  # bool [8, 8]
G_LISTS = [tuple(int(g) for g in range(NCRF) if CRF_MASK[f, g])
           for f in range(NCRF)]
# One merge list per CRF predecessor g: for every supported code the map
# (dropped bits c) -> emitted base is injective per (pattern, conv state)
# because bit 0 of both generator polynomials is 1 (cpp:269-293), so each
# destination (f, g, lane) has AT MOST ONE valid conv candidate c. The
# kernel compacts the NC candidate planes down to one plane per emitted
# base before the merge (asserted per-config in build_consts).
NQ_F = [1 + len(gl) for gl in G_LISTS]
NQ_MAX = max(NQ_F)

# Largest candidate count a single suppression-merge pass may see; larger
# sets run the exact hierarchical TOURNAMENT merge (see merge_group in
# _make_kernel), whose passes are unrolled in Python with each pass body
# kept under this cap. The cap is a COMPILE-budget guard (the axon
# external compile helper SIGKILLs ~15-25 min compiles). History: the
# round-4 per-round body could not compile a 256-candidate pass, forcing
# a 128 cap and a 7-pass tournament for m=8 L=64 (18.5 s/read); the v13
# body (grouped while-loop rounds, one compiled body per L_UNROLL rounds)
# compiles a single 512-candidate pass in budget, and the single pass is
# ~1.8x fewer round-sweeps than the tournament: m=8 L=64 measured
# 4.61 s/read vs 9.43 (tournament, v13) vs 18.5 (round 4).
MERGE_NCAND_MAX = int(os.environ.get("NDS_MERGE_NCAND_MAX", "512"))

# Rounds per while-loop iteration for L > 16 suppression passes: one
# round per iteration pays a scalar-core round-trip per pop (the stall
# v10 removed for small L by full unrolling), while fully unrolling 64
# rounds blows the Mosaic compile budget. 4 splits the difference.
L_UNROLL = int(os.environ.get("NDS_L_UNROLL", "4"))

# Pop implementation for the suppression merge: "argmax" (jnp.max +
# jnp.argmax + one-hot payload extraction) vs "tree" (adjacent-pairs
# reduction carrying payloads). Measured on the v5e chip for m=11 L=8:
# argmax 1.93 s/read, tree 2.10 — Mosaic lowers the fused native
# reductions better than the pairing tree's strided extracts. Env
# override for kernel experiments only.
POP_IMPL = os.environ.get("NDS_POP_IMPL", "argmax")

# Candidate-expansion implementation for MULTI-TILE codes (CT < C, i.e.
# m >= 11): "mxu" computes y[r] = src[r >> logk] as a one-hot
# selection-matrix matmul on the MXU, "roll" is the v1-v13 lane-roll
# butterfly. The VPU roofline (docs/VPU_ROOFLINE.json) measured rolls at
# ~1/4 of elementwise throughput, making the butterfly the kernel's
# dominant section (42% of m=11 wall-clock); a [5*8*L, CT/k]@[CT/k, CT]
# matmul at HIGHEST precision does the same permutation bit-exactly
# (probed: scripts/tpu_mxu_probe3.py — 0/1 columns select f32 payloads
# exactly under the TPU's bf16-multipass f32 emulation, and 16-bit
# integer halves reassemble int32 hashes exactly) at ~0.4 us per
# candidate vs ~2.3 us for the butterfly. Scores ride the matmul with
# -inf clamped to -2^127 (exact in bf16; -inf itself would turn the
# 0-weight products into NaN) and restored after.
EXPAND_IMPL = os.environ.get("NDS_EXPAND_IMPL", "mxu")
CLAMPF = float(-(2.0 ** 127))  # finite stand-in for -inf inside the matmul


def sel_format(L: int):
    """(dtype, shift) of the per-slot selection code q*shift + lsrc.

    q <= 7 (NQ_MAX - 1), so for L <= 16 the code fits int8
    (max 7*16 + 15 = 127), halving the [T, W, 8*L, C] selections buffer -
    decisive for m=14, whose int16 selections alone exceed HBM."""
    return (jnp.int8, 16) if L <= 16 else (jnp.int16, 64)


def bitrev_perm(m: int) -> np.ndarray:
    """perm[r] = bit-reversal of r over m bits (an involution)."""
    s = np.arange(1 << m, dtype=np.int64)
    r = np.zeros_like(s)
    for i in range(m):
        r |= ((s >> i) & 1) << (m - 1 - i)
    return r


def _bfly_masks(ct: int, logk: int) -> np.ndarray:
    """Take masks for the roll butterfly computing y[j] = x[j >> logk].

    Simulates the greedy construction (validated on hardware): at each stage
    d = ct/2 .. 1, lane j accepts the value rolled from j-d iff that value's
    source index moves toward j >> logk without undershooting. Two passes
    guarantee convergence; the assert proves it per (ct, logk).
    """
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
    assert (cur == src).all(), f"butterfly failed ct={ct} logk={logk}"
    n1 = len(masks)
    nst = int(np.log2(ct))
    if n1 == nst:  # one pass sufficed
        return np.stack(masks).astype(np.int32)
    out = np.zeros((2 * nst, ct), np.int32)
    out[: n1] = np.stack(masks)
    return out


class PallasConsts(NamedTuple):
    """Host tables for the kernel + traceback (all conv axes bit-reversed)."""

    perm: np.ndarray  # [C] bit-reversal involution
    borev: np.ndarray  # int32 [4 pat, 4 c, C] base emitted entering rev-state
    nbrev: np.ndarray  # int32 [2, C] newbits (1-bit, 2-bit packed)
    valid: np.ndarray  # int32 [Pv, C] valid-state incl. leading ghost row
    pattern: np.ndarray  # int32 [Pv]
    bfly: np.ndarray  # int32 [2 kvar, NST, CT] butterfly take masks
    stay_idx: np.ndarray  # int32 [8] flat post index of stays
    move_idx: np.ndarray  # int32 [8, 8]
    qmap: np.ndarray  # int32 [8, NQ_MAX] local q -> CRF predecessor g; -1 pad
    cstar: np.ndarray  # int32 [4 pat, 4 base, C] the unique conv candidate c
    #                    emitting base beta into rev-state lane; -1 if none
    init_rev: int
    final_rev: int
    ct: int
    nstages: tuple  # (k=2 stages, k=4 stages), static
    emx: np.ndarray  # f32 [2, CT/2, CT] one-hot expansion matrices:
    #                  emx[kvar][s, r] = 1 iff s == r >> (kvar+1)
    #                  (kvar=1 uses only the first CT/4 rows)


def build_consts(spec, tabs: tb.TrellisTables, ct: int | None = None
                 ) -> PallasConsts:
    code = spec.code
    C = code.nstate_conv
    CT = min(ct or 512, C)
    perm = bitrev_perm(code.mem)
    borev = tabs.base_out.astype(np.int32)[:, perm, :].transpose(0, 2, 1)
    nbrev = np.stack([tabs.newbits1[perm], tabs.newbits2[perm]]).astype(
        np.int32)
    valid = np.concatenate(
        [np.zeros((1, C), bool), tabs.valid_state]).astype(np.int32)[:, perm]
    pattern = np.concatenate([[0], tabs.pattern_of_pos]).astype(np.int32)
    m1 = _bfly_masks(CT, 1)
    m2 = _bfly_masks(CT, 2)
    nst = (m1.shape[0], m2.shape[0])
    bfly = np.zeros((2, max(nst), CT), np.int32)
    bfly[0, : nst[0]] = m1
    bfly[1, : nst[1]] = m2
    qmap = np.full((NCRF, NQ_MAX), -1, np.int32)
    for f in range(NCRF):
        for qi, g in enumerate(G_LISTS[f]):
            qmap[f, 1 + qi] = g
    # the unique candidate c emitting each base (injectivity assert: the
    # compacted merge is exact only if no two c's share a base per lane)
    cstar = np.full((4, 4, C), -1, np.int32)
    for p in range(4):
        ncs = 2 if p == 0 else 4
        for beta in range(4):
            hit = borev[p, :ncs, :] == beta  # [ncs, C]
            assert (hit.sum(axis=0) <= 1).all(), \
                f"base map not injective (pattern {p})"
            any_hit = hit.any(axis=0)
            cstar[p, beta] = np.where(any_hit, hit.argmax(axis=0), -1)
    emx = np.zeros((2, CT // 2, CT), np.float32)
    r = np.arange(CT)
    emx[0, r >> 1, r] = 1.0
    emx[1, r >> 2, r] = 1.0
    return PallasConsts(
        perm=perm, borev=borev, nbrev=nbrev, valid=valid, pattern=pattern,
        bfly=bfly, stay_idx=tb.stay_post_index(), move_idx=tb.move_post_index(),
        qmap=qmap, cstar=cstar, init_rev=int(perm[code.initial_state]),
        final_rev=int(perm[code.final_state]), ct=CT,
        nstages=nst, emx=emx)


def _hupd(h, shift, nb, p: int):
    """(h * 2^shift + nb) mod p on int32 bit patterns (exact mod 2^32;
    negative means >= 2^31, which is always >= p)."""
    t = (h << shift) + nb
    for _ in range(3):
        t = jnp.where((t < 0) | (t >= p), t - p, t)
    return t


def _stage_shifts(ct: int, nst: int):
    """Static roll amounts per butterfly stage: ct/2..1, repeated if the
    mask simulation needed a second pass."""
    one_pass = [ct >> (1 + i) for i in range(int(np.log2(ct)))]
    return (one_pass * 2)[:nst]


def _narrow(spec, consts) -> bool:
    """Whether candidate expansions loop through a single-slot scratch
    (narrow) instead of riding one stacked 4-candidate butterfly (wide).

    The choice is a VMEM-vs-COMPILE-TIME tradeoff: the wide xpd2 scratch
    is 4*3*8*L*CT floats (6.3 MB at L=64, CT=256, so m=8's production
    list runs WIDE), while the narrow path butterflies the full stacked
    row once PER CANDIDATE, which quadruples the dominant Mosaic
    instruction count and blew the external compile-helper's kill budget
    at L=64 (round 4). Narrow only when the wide xpd2 scratch alone
    exceeds 32 MB (e.g. L=64 at CT >= 1024)."""
    wide_bytes = NC * 3 * NCRF * spec.list_size * consts.ct * 4
    return spec.list_size > 16 and wide_bytes > 32 * 1024 * 1024


def _use_mxu(spec, consts) -> bool:
    """MXU selection-matrix expansion: multi-tile wide path only (the
    small-code candidates are rolls of the full row — a different, per-
    candidate matrix — and their expansion is not the bottleneck)."""
    return (consts.ct != spec.code.nstate_conv
            and not _narrow(spec, consts) and EXPAND_IMPL == "mxu")


def _make_kernel(spec, consts: PallasConsts, interpret: bool):
    """Build the per-block ACS kernel (one grid step per (window position,
    conv tile); CRF destinations unrolled inside).

    v2 structure (see docs/DESIGN.md §5): the NC conv-candidate planes are
    expanded once per (kvar, c) with a fused 3-array butterfly (scores and
    both hashes ride one stacked f32 scratch), then COMPACTED by emitted
    base — injectivity of c -> base per lane means each (g, base) keeps at
    most one candidate — so the per-destination merge runs over
    1 + |G_f| <= 8 sorted lists instead of 1 + 4*|G_f| <= 29. The merge
    while-loop exits as soon as every lane is done (L slots filled or all
    heads exhausted), and fully inactive steps (t >= nblk) skip straight to
    a buffer passthrough.
    """
    C = spec.code.nstate_conv
    CT = consts.ct
    L = spec.list_size
    R = spec.merge_rounds
    lse = spec.combine_lse
    sh_k2 = _stage_shifts(CT, consts.nstages[0])
    sh_k4 = _stage_shifts(CT, consts.nstages[1])
    roll = jnp.roll if interpret else pltpu.roll
    small = consts.ct == spec.code.nstate_conv  # one conv tile
    narrow = _narrow(spec, consts)
    mxu = _use_mxu(spec, consts)
    use_k0 = bool((np.asarray(consts.pattern)[1:] == 0).any())
    use_k1 = bool((np.asarray(consts.pattern)[1:] != 0).any())
    i32f = partial(jax.lax.bitcast_convert_type, new_dtype=jnp.float32)
    f32i = partial(jax.lax.bitcast_convert_type, new_dtype=jnp.int32)

    def kernel(start_ref, p_sc, p_h1, p_h2, *rest):
        if small:
            (r_sc, r_h1, r_h2, s_sc, s_h1, s_h2, stay_tr, move_tr,
             borev, nbrev, valid, bfly, pattern, active,
             o_sc, o_h1, o_h2, o_sel, xpd, xpd2, cnd) = rest
        elif mxu:
            mvv = rest[:18]  # [kvar qoff] x (sc, h1, h2) views
            k2v = [mvv[3 * q: 3 * q + 3] for q in range(2)]
            k4v = [mvv[6 + 3 * q: 9 + 3 * q] for q in range(4)]
            (s_sc, s_h1, s_h2, stay_tr, move_tr,
             borev, nbrev, valid, bfly, pattern, active, emx,
             o_sc, o_h1, o_h2, o_sel, xpd, xpd2, cnd, xmx) = rest[18:]
        else:
            mvv = rest[:18]  # [kvar qoff] x (sc, h1, h2) views
            k2v = [mvv[3 * q: 3 * q + 3] for q in range(2)]
            k4v = [mvv[6 + 3 * q: 9 + 3 * q] for q in range(4)]
            (s_sc, s_h1, s_h2, stay_tr, move_tr,
             borev, nbrev, valid, bfly, pattern, active,
             o_sc, o_h1, o_h2, o_sel, xpd, xpd2, cnd) = rest[18:]
        w = pl.program_id(1)  # grid is (conv tile, window position):
        # tile-major so per-tile constant blocks (borev/nbrev/valid/emx and
        # the qoff source views' lane blocking) stay resident across all W
        # positions instead of re-DMAing every cell (the emx block alone is
        # 1 MB; tile-minor order re-fetched it 85k times per m=11 read)
        pos = start_ref[0] + w
        pat = pattern[pos]
        is1 = pat == 0
        act = active[0] != 0

        @pl.when(jnp.logical_not(act))
        def _passthrough():
            # t >= nblk: the reference never runs these steps; keep the
            # stale buffer bit-for-bit and emit no selections.
            for f in range(NCRF):
                o_sc[0, f] = s_sc[0, f]
                o_h1[0, f] = s_h1[0, f]
                o_h2[0, f] = s_h2[0, f]
            o_sel[0] = jnp.full((NCRF * L, CT), -1, sel_format(L)[0])

        @pl.when(act)
        def _main():
            psc, ph1, ph2 = p_sc[0], p_h1[0], p_h2[0]  # [8, L, CT]

            if os.environ.get("NDS_FAKE_CELL"):
                # timing experiment ONLY (wrong lists): a near-empty cell
                # with the same grid, DMAs and outputs — isolates the
                # per-cell fixed cost (DMA issue + grid overhead).
                for f in range(NCRF):
                    o_sc[0, f] = psc[f] + s_sc[0, f] * 0
                    o_h1[0, f] = ph1[f]
                    o_h2[0, f] = ph2[f]
                o_sel[0] = jnp.zeros((NCRF * L, CT), sel_format(L)[0])
                return

            # hoisted butterfly take masks (shared by all expansions)
            takes2 = [bfly[0, s] != 0 for s in range(len(sh_k2))]
            takes4 = [bfly[1, s] != 0 for s in range(len(sh_k4))]

            def butterfly(x, takes, shifts):
                for take, d in zip(takes, shifts):
                    x = jnp.where(take, roll(x, d, x.ndim - 1), x)
                return x

            # ---- expand move sources to destination lanes (rev space) ----
            # dest lane r's candidate c lives at source
            # (r >> logk | qoff*C/k). Scores and both hashes are stacked
            # into one f32 scratch so each expansion is a single 3x-wide
            # butterfly. The butterfly only ever reads source lanes
            # [0, CT/k), so the rest of the working array may hold garbage:
            # a cyclic roll (small codes, one tile) or a k-fold tile (large
            # codes) places the slice without a lane concat, which Mosaic
            # rejects on values sliced out of 5-D blocks.
            if small:
                xpd[0] = r_sc[0]
                xpd[1] = i32f(r_h1[0])
                xpd[2] = i32f(r_h2[0])

            def _fill_src(slot, kvar, c):
                """Stage candidate c's source into xpd2[slot] (a pre-roll
                of the shared stacked row for single-tile codes, a
                per-offset block view for multi-tile codes)."""
                k = 2 << kvar
                n = CT // k
                qoff = c if kvar == 0 else ((c & 1) << 1) | (c >> 1)
                if small:
                    a = (qoff * n) % CT
                    xpd2[slot] = roll(xpd[:], CT - a, 3) if a else xpd[:]
                else:
                    v = k2v[qoff] if kvar == 0 else k4v[qoff]
                    xpd2[slot, 0] = jnp.tile(v[0][0], (1, 1, k))
                    xpd2[slot, 1] = i32f(jnp.tile(v[1][0], (1, 1, k)))
                    xpd2[slot, 2] = i32f(jnp.tile(v[2][0], (1, 1, k)))

            def expand_all(kvar, ncs):
                """All ncs candidate expansions: MXU selection matmuls
                (multi-tile codes) or ONE wide butterfly."""
                if os.environ.get("NDS_FAKE_EXPAND"):
                    # timing experiment ONLY (wrong lists): skip the
                    # butterfly + source staging; feed the stay planes so
                    # downstream work keeps its real shape and cost
                    return [(psc, ph1, ph2)] * ncs
                if mxu:
                    # y[..., r] = v[..., r >> logk] as [5*8*L, n]@[n, CT]
                    # with one-hot columns: exact for f32 scores (HIGHEST;
                    # -inf clamped to -2^127 so 0-weights don't make NaN)
                    # and for int32 hashes via two 16-bit halves.
                    n = CT // (2 << kvar)
                    e = emx[kvar, pl.ds(0, n)]
                    outs = []
                    for c in range(ncs):
                        qoff = c if kvar == 0 else ((c & 1) << 1) | (c >> 1)
                        v = k2v[qoff] if kvar == 0 else k4v[qoff]
                        sc, h1, h2 = v[0][0], v[1][0], v[2][0]
                        xmx[0, :, :, pl.ds(0, n)] = jnp.maximum(sc, CLAMPF)
                        xmx[1, :, :, pl.ds(0, n)] = (
                            h1 & 0xFFFF).astype(jnp.float32)
                        xmx[2, :, :, pl.ds(0, n)] = (
                            h1 >> 16).astype(jnp.float32)
                        xmx[3, :, :, pl.ds(0, n)] = (
                            h2 & 0xFFFF).astype(jnp.float32)
                        xmx[4, :, :, pl.ds(0, n)] = (
                            h2 >> 16).astype(jnp.float32)
                        x2 = xmx[:, :, :, pl.ds(0, n)].reshape(
                            5 * NCRF * L, n)
                        y = jax.lax.dot_general(
                            x2, e, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        ).reshape(5, NCRF, L, CT)
                        sc_e = jnp.where(y[0] == CLAMPF, NEG, y[0])
                        h1_e = y[1].astype(jnp.int32) | (
                            y[2].astype(jnp.int32) << 16)
                        h2_e = y[3].astype(jnp.int32) | (
                            y[4].astype(jnp.int32) << 16)
                        outs.append((sc_e, h1_e, h2_e))
                    return outs
                for c in range(ncs):
                    _fill_src(c, kvar, c)
                y = butterfly(xpd2[0:ncs], takes2 if kvar == 0 else takes4,
                              sh_k2 if kvar == 0 else sh_k4)
                return [(y[c, 0], f32i(y[c, 1]), f32i(y[c, 2]))
                        for c in range(ncs)]

            def expand_one(kvar, c):
                """One candidate through the single-slot scratch (narrow
                path, see _narrow)."""
                _fill_src(0, kvar, c)
                y = butterfly(xpd2[0:1], takes2 if kvar == 0 else takes4,
                              sh_k2 if kvar == 0 else sh_k4)
                return y[0, 0], y[0, 1], y[0, 2]  # f32 bit patterns

            # ---- compact candidates by emitted base ----------------------
            # cand[beta] = the one (c-compacted) move candidate plane per
            # CRF predecessor g: (sc [8,L,CT], h1, h2), hashes updated.
            # The pattern is a single scalar per kernel invocation, so only
            # the matching kvar's expansions run (predicated through the
            # cnd scratch); the other half of the butterfly work is skipped
            # entirely.
            posgate = pos > 1

            def make_cand(kvar):
                ncs = 2 if kvar == 0 else NC
                shift = 1 if kvar == 0 else 2
                nb = nbrev[kvar][None, None, :]

                def bo_of(c):  # [CT] emitted base per lane for candidate c
                    return borev[0, c] if kvar == 0 else \
                        borev[pl.ds(pat, 1), c][0]

                if narrow:
                    # accumulate each candidate straight into the cnd
                    # scratch (f32 bit-pattern domain for the hashes) so
                    # only one expansion is ever live
                    NEGa = jnp.full((NCRF, L, CT), NEG, jnp.float32)
                    Zf = jnp.zeros((NCRF, L, CT), jnp.float32)
                    for beta in range(4):
                        cnd[3 * beta] = NEGa
                        cnd[3 * beta + 1] = Zf
                        cnd[3 * beta + 2] = Zf
                    for c in range(ncs):
                        sc_e, h1f, h2f = expand_one(kvar, c)
                        bo_c = bo_of(c)
                        for beta in range(4):
                            mb = (bo_c == beta)[None, None, :]
                            cnd[3 * beta] = jnp.where(mb, sc_e,
                                                      cnd[3 * beta])
                            cnd[3 * beta + 1] = jnp.where(
                                mb, h1f, cnd[3 * beta + 1])
                            cnd[3 * beta + 2] = jnp.where(
                                mb, h2f, cnd[3 * beta + 2])
                    for beta in range(4):
                        cnd[3 * beta] = jnp.where(posgate, cnd[3 * beta],
                                                  NEG)
                        cnd[3 * beta + 1] = i32f(_hupd(
                            f32i(cnd[3 * beta + 1]), shift, nb, HASH_P1))
                        cnd[3 * beta + 2] = i32f(_hupd(
                            f32i(cnd[3 * beta + 2]), shift, nb, HASH_P2))
                    return

                NEGa = jnp.full((NCRF, L, CT), NEG, jnp.float32)
                Z = jnp.zeros((NCRF, L, CT), jnp.int32)
                acc = [[NEGa, Z, Z] for _ in range(4)]
                exp_c = expand_all(kvar, ncs)
                for c in range(ncs):
                    sc_e, h1_e, h2_e = exp_c[c]
                    bo_c = bo_of(c)
                    for beta in range(4):
                        mb = (bo_c == beta)[None, None, :]
                        a = acc[beta]
                        a[0] = jnp.where(mb, sc_e, a[0])
                        a[1] = jnp.where(mb, h1_e, a[1])
                        a[2] = jnp.where(mb, h2_e, a[2])
                for beta in range(4):
                    sc_b, h1_b, h2_b = acc[beta]
                    cnd[3 * beta] = jnp.where(posgate, sc_b, NEG)
                    cnd[3 * beta + 1] = i32f(_hupd(h1_b, shift, nb, HASH_P1))
                    cnd[3 * beta + 2] = i32f(_hupd(h2_b, shift, nb, HASH_P2))

            # only compile the pattern variants this code's puncture
            # sequence actually uses (rate 1/2 is pure pattern 0: the
            # kvar=1 expansion would double the dominant Mosaic
            # instruction count for nothing)
            if use_k0 and use_k1:
                @pl.when(is1)
                def _():
                    make_cand(0)

                @pl.when(jnp.logical_not(is1))
                def _():
                    make_cand(1)
            elif use_k0:
                make_cand(0)
            else:
                make_cand(1)

            cand = [(cnd[3 * b], f32i(cnd[3 * b + 1]), f32i(cnd[3 * b + 2]))
                    for b in range(4)]

            wm = (valid[pl.ds(pos, 1)][0] != 0) & act  # [CT]
            isp0 = pos == 1

            def _tree_pop(csc, ch1s, ch2s, codes):
                """Global max over the candidate (leading) axis with the
                (h1, h2, selcode) payloads of the winner, by an
                ADJACENT-pairs tree reduction (even vs odd leading slices,
                keep-left on ties). Adjacent pairing is what preserves the
                reference heap's tie order: every combine keeps the lower
                candidate index, and blocks stay index-monotone across
                levels — a strided halving tree would not (the level-2
                winners' original indices are not ordered). Replaces the
                argmax + one-hot + masked-sum extraction (v10) with one
                fused sweep: (ncand-1) x (1 cmp + 4 selects) instead of
                ~3 full candidate-array sweeps per pop."""
                while csc.shape[0] > 1:
                    n2 = (csc.shape[0] // 2) * 2
                    parts = []
                    for x in (csc, ch1s, ch2s, codes):
                        # adjacent pairing via a leading-axis reshape (a
                        # strided slice here lowers as an unsupported
                        # >2-D gather in Mosaic)
                        p = x[0:n2].reshape(n2 // 2, 2, *x.shape[1:])
                        parts.append((p[:, 0], p[:, 1], x[n2:]))
                    (a_sc, b_sc, r_sc) = parts[0]
                    tk = b_sc > a_sc  # strict: keep left (lower idx) on tie
                    nxt = [jnp.where(tk, b, a) for a, b, _ in parts]
                    csc, ch1s, ch2s, codes = [
                        jnp.concatenate([y, r], axis=0) if r.shape[0]
                        else y for y, (_, _, r) in zip(nxt, parts)]
                return csc[0], ch1s[0], ch2s[0], codes[0]

            def _supp_pass(csc0, ch1s, ch2s, csels, iL):
                """One suppression-merge pass: L rounds popping the global
                max over the candidate axis, knocking out its whole
                equal-dual-hash class (see merge_group). ``csels``: int32
                selection codes per candidate, or None to derive the code
                from the candidate's flat index (the single-pass layout
                q*shift + slot). Returns (osc, oh1, oh2, osel).

                For small L the L rounds are UNROLLED and their outputs
                STACKED (the output slot of round r is statically r): a
                lax.while_loop costs scalar-core round-trips per
                iteration that stall the VPU between rounds, and a round
                whose candidates are exhausted puts nothing (best = NEG
                -> ok False), so the early-exit check is semantically
                redundant. Large L (m=8's production 64) keeps the
                early-exit loop but runs L_UNROLL rounds per iteration —
                fully unrolling 64 tree-rounds would blow the Mosaic
                compile budget, while one round per iteration pays a
                scalar-core stall per pop.
                """
                ncand, F, _ = csc0.shape
                if csels is None and (POP_IMPL == "tree" or lse):
                    iC = jax.lax.broadcasted_iota(
                        jnp.int32, (ncand, F, CT), 0)
                    # + (h >> 31) is always zero (hashes live in [0, p),
                    # p < 2^30) but the compiler cannot fold it: a pure
                    # iota-derived value keeps a lane-REPLICATED Mosaic
                    # layout whose extract_strided_slice in the pairing
                    # tree crashes ApplyVectorLayout ("limits[i] <=
                    # dim(i)"); the data dependence forces a materialized
                    # lane-varying layout. (The argmax pop instead keeps
                    # csels=None and derives the code from the popped
                    # index arithmetically — no candidate-sized sweep.)
                    csels = (iC // L) * sel_format(L)[1] + (iC % L) \
                        + (ch1s >> 31)

                if lse:
                    # lse combines the whole duplicate class's path mass
                    # at pop time (extra/viterbi_nanopore.cpp:883-888) and
                    # needs the per-round eqh mass sum anyway; keep the
                    # masked-put structure (experimental mode, small L)
                    def body(st, rnd):
                        (csc, osc, oh1, oh2, osel) = st
                        best, ch1, ch2, code = _tree_pop(
                            csc, ch1s, ch2s, csels)
                        ok = best > NEG
                        eqh = (ch1s == ch1[None]) & (ch2s == ch2[None])
                        val = best + jnp.log(jnp.sum(
                            jnp.where(eqh & (csc > NEG),
                                      jnp.exp(csc - best[None]), 0.0),
                            axis=0))
                        csc = jnp.where(eqh, NEG, csc)
                        put = (iL == rnd) & ok[None]
                        osc = jnp.where(put, val[None], osc)
                        oh1 = jnp.where(put, ch1[None], oh1)
                        oh2 = jnp.where(put, ch2[None], oh2)
                        osel = jnp.where(put, code[None], osel)
                        return (csc, osc, oh1, oh2, osel)

                    st = (
                        csc0,
                        jnp.full((L, F, CT), NEG, jnp.float32),
                        jnp.zeros((L, F, CT), jnp.int32),
                        jnp.zeros((L, F, CT), jnp.int32),
                        jnp.full((L, F, CT), -1, jnp.int32),
                    )
                    for rnd in range(L):
                        st = body(st, rnd)
                    return st[1], st[2], st[3], st[4]

                def _argmax_pop(csc):
                    """v10-style pop: native max/argmax reductions over
                    the candidate axis + one-hot payload extraction.
                    Lowers to fused Mosaic multi-reductions that beat the
                    pairing tree on hardware (see POP_IMPL)."""
                    best = jnp.max(csc, axis=0)
                    bq = jnp.argmax(csc, axis=0)
                    iC = jax.lax.broadcasted_iota(
                        jnp.int32, csc.shape, 0)
                    ohot = iC == bq[None]
                    ch1 = jnp.where(ohot, ch1s, 0).sum(0)
                    ch2 = jnp.where(ohot, ch2s, 0).sum(0)
                    if csels is None:  # single-pass layout: arithmetic
                        code = (bq // L) * sel_format(L)[1] + (bq % L)
                    else:
                        code = jnp.where(ohot, csels, 0).sum(0)
                    return best, ch1, ch2, code

                def pop_round(csc):
                    """One pop: winner + class knockout. Returns the
                    popped (val, h1, h2, code) planes and the updated
                    candidate scores."""
                    if POP_IMPL == "tree":
                        best, ch1, ch2, code = _tree_pop(csc, ch1s, ch2s,
                                                         csels)
                    else:
                        best, ch1, ch2, code = _argmax_pop(csc)
                    ok = best > NEG
                    eqh = (ch1s == ch1[None]) & (ch2s == ch2[None])
                    csc = jnp.where(eqh, NEG, csc)
                    return csc, (best,
                                 jnp.where(ok, ch1, 0),
                                 jnp.where(ok, ch2, 0),
                                 jnp.where(ok, code, -1))

                if L <= 16:
                    csc, outs = csc0, []
                    for _ in range(L):
                        csc, o = pop_round(csc)
                        outs.append(o)
                    return tuple(
                        jnp.stack([o[a] for o in outs]) for a in range(4))

                def wcond(c):
                    rnd, csc, _, alive = c
                    return (rnd < L) & alive

                def wbody(c):
                    rnd, csc, (osc, oh1, oh2, osel), _ = c
                    any_ok = jnp.bool_(False)
                    for j in range(L_UNROLL):
                        csc, (val, ch1, ch2, code) = pop_round(csc)
                        ok = val > NEG
                        any_ok = any_ok | jnp.any(ok)
                        put = (iL == rnd + j) & ok[None]
                        osc = jnp.where(put, val[None], osc)
                        oh1 = jnp.where(put, ch1[None], oh1)
                        oh2 = jnp.where(put, ch2[None], oh2)
                        osel = jnp.where(put, code[None], osel)
                    return (rnd + L_UNROLL, csc, (osc, oh1, oh2, osel),
                            any_ok)

                st0 = (jnp.full((L, F, CT), NEG, jnp.float32),
                       jnp.zeros((L, F, CT), jnp.int32),
                       jnp.zeros((L, F, CT), jnp.int32),
                       jnp.full((L, F, CT), -1, jnp.int32))
                _, _, st, _ = jax.lax.while_loop(
                    wcond, wbody,
                    (jnp.int32(0), csc0, st0, jnp.bool_(True)))
                return st

            def merge_group(fs):
                """One stacked merge over CRF destinations ``fs``: state
                arrays carry an F axis next to the lanes, so all
                destinations run as ONE merge loop. Destinations with
                fewer predecessor lists (flops: stay + 1) pad with NEG
                rows — a NEG candidate can never win a pop, and real
                candidates keep their relative order per destination, so
                pop order (and tie-breaking) is unchanged. Running all 8
                CRF destinations together fills the (8, lane) vregs that
                an F=4 stack would leave half-padded — the merge is the
                dominant VPU cost, so sublane utilization doubles for
                ~1.25x fewer vector instructions overall."""
                nq = max(NQ_F[f] for f in fs)
                F = len(fs)
                iL = jax.lax.broadcasted_iota(jnp.int32, (L, F, CT), 0)

                def fstack(parts):  # F x [L, CT] -> [L, F, CT]
                    return jnp.moveaxis(jnp.stack(parts), 0, 1)

                stay_sc = fstack([psc[f] + stay_tr[0, f] for f in fs])
                stay_h1 = fstack([ph1[f] for f in fs])
                stay_h2 = fstack([ph2[f] for f in fs])
                rows_sc, rows_h1, rows_h2 = [stay_sc], [stay_h1], [stay_h2]
                negrow = jnp.full((L, CT), NEG, jnp.float32)
                zrow = jnp.zeros((L, CT), jnp.int32)
                for qi in range(nq - 1):
                    r_sc, r_h1, r_h2 = [], [], []
                    for f in fs:
                        if qi < len(G_LISTS[f]):
                            g = G_LISTS[f][qi]
                            r_sc.append(cand[f % 4][0][g] + move_tr[f, g])
                            r_h1.append(cand[f % 4][1][g])
                            r_h2.append(cand[f % 4][2][g])
                        else:
                            r_sc.append(negrow)
                            r_h1.append(zrow)
                            r_h2.append(zrow)
                    rows_sc.append(fstack(r_sc))
                    rows_h1.append(fstack(r_h1))
                    rows_h2.append(fstack(r_h2))
                # --- suppression merge: pop the global max, accept it into
                # the (static) slot of the current round, and knock out its
                # whole message class (equal dual hash) so every later pop
                # is automatically distinct. Exactly L rounds reproduce the
                # reference heap's top-L-with-dedup (pops arrive in score
                # order; the suppressed duplicates are precisely the ones
                # the heap would discard at pop time, cpp:744-799). No
                # pointers, no head refresh.
                ncand = nq * L
                if os.environ.get("NDS_FAKE_MERGE"):
                    # timing experiment ONLY (wrong lists): consume every
                    # candidate row with one cheap reduce so the
                    # expansion work is not dead-code-eliminated, but
                    # skip the L suppression rounds — the wall-clock
                    # delta vs a normal run isolates the merge cost.
                    osc = sum(rows_sc)
                    oh1 = sum(rows_h1)
                    oh2 = sum(rows_h2)
                    osel = iL
                elif ncand <= MERGE_NCAND_MAX or lse:
                    csc0 = jnp.stack(rows_sc).reshape(ncand, F, CT)
                    ch1s = jnp.stack(rows_h1).reshape(ncand, F, CT)
                    ch2s = jnp.stack(rows_h2).reshape(ncand, F, CT)
                    osc, oh1, oh2, osel = _supp_pass(
                        csc0, ch1s, ch2s, None, iL)
                else:
                    # Hierarchical TOURNAMENT merge for large candidate
                    # sets (m=8's production L=64 -> 8*64 = 512
                    # candidates). Entries start as the nq sorted rows;
                    # each level groups up to ``gsz`` entries (so no pass
                    # exceeds MERGE_NCAND_MAX candidates) and takes every
                    # group's top-L-with-dedup, until one entry remains.
                    # Exact for max-combining AT EVERY LEVEL: a class
                    # outside its group's top-L is beaten by L distinct
                    # classes within the group, each of which also beats
                    # it globally — so it cannot be in the global top-L.
                    # (Not exact for lse mass-combining, which therefore
                    # keeps the single pass above; lse is the old
                    # binary's experimental mode and has no L>16 config.)
                    # COMPILE-TIME structure: passes are unrolled in
                    # Python (see below) with every pass body capped at
                    # MERGE_NCAND_MAX candidates — keeping each body
                    # small is the difference between fitting the
                    # external compile-helper budget and being SIGKILLed
                    # by it.
                    sh = sel_format(L)[1]
                    gsz = max(2, MERGE_NCAND_MAX // L)
                    # + (h >> 31) == 0 forces a materialized layout (see
                    # the iota note in _supp_pass)
                    entries = [
                        (rows_sc[q], rows_h1[q], rows_h2[q],
                         q * sh + jax.lax.broadcasted_iota(
                             jnp.int32, (L, F, CT), 0)
                         + (rows_h1[q] >> 31))
                        for q in range(nq)]
                    while len(entries) > 1:
                        g = min(gsz, len(entries))
                        ng = len(entries) // g  # full groups this level
                        # passes are unrolled in Python: neither
                        # lax.scan's stacked outputs nor dynamic_slice on
                        # values lower in Mosaic, and the per-pass bodies
                        # are small enough (<= MERGE_NCAND_MAX cands)
                        # that unrolling stays within the compile budget
                        nxt = []
                        for i in range(ng):
                            nxt.append(_supp_pass(
                                *[jnp.concatenate(
                                    [entries[i * g + j][a]
                                     for j in range(g)])
                                  for a in range(4)],
                                iL))
                        entries = nxt + entries[ng * g:]  # + leftovers
                    osc, oh1, oh2, osel = entries[0]

                # position 0 (padded row 1): stay-only, slot 0 scored, all
                # list slots carried through unchanged (cpp:706-713)
                p0 = jnp.where(iL == 0, stay_sc, NEG)
                osc = jnp.where(isp0, p0, osc)
                oh1 = jnp.where(isp0, stay_h1, oh1)
                oh2 = jnp.where(isp0, stay_h2, oh2)
                osel = jnp.where(isp0, iL, osel)

                for fi, f in enumerate(fs):
                    o_sc[0, f] = jnp.where(wm[None], osc[:, fi], s_sc[0, f])
                    o_h1[0, f] = jnp.where(wm[None], oh1[:, fi], s_h1[0, f])
                    o_h2[0, f] = jnp.where(wm[None], oh2[:, fi], s_h2[0, f])
                return jnp.where(wm[None, None], osel, -1)  # [L, F, CT]

            sel_all = merge_group(list(range(NCRF)))
            o_sel[0] = jnp.moveaxis(sel_all, 1, 0).reshape(
                NCRF * L, CT).astype(sel_format(L)[0])

    return kernel


def acs_block(spec, consts: PallasConsts, cdev: Dict, prev, stale, postf,
              start1, active, interpret: bool = False):
    """One signal-block ACS step over the full beam window.

    prev/stale: (sc f32, h1 i32, h2 i32), each [P, 8, L, C] (conv axis
    bit-reversed). Returns (new_sc, new_h1, new_h2, sel[W, 8L, C] i16);
    the new buffers alias the stale ones.
    """
    p_sc, p_h1, p_h2 = prev
    s_sc, s_h1, s_h2 = stale
    P, _, L, C = p_sc.shape
    CT = consts.ct
    n_ct = C // CT
    W = spec.window
    NST = consts.bfly.shape[1]
    Pv = cdev["valid"].shape[0]

    stay_tr = postf[cdev["stay_idx"]].reshape(1, NCRF)
    move_tr = postf[cdev["move_idx"]]
    small = CT == C

    vm = pltpu.VMEM
    b_tile = pl.BlockSpec((1, NCRF, L, CT),
                          lambda ci, w, s: (s[0] + w, 0, 0, ci),
                          memory_space=vm)
    if small:
        b_row = pl.BlockSpec((1, NCRF, L, C),
                             lambda ci, w, s: (s[0] + w - 1, 0, 0, 0),
                             memory_space=vm)
        mv_specs = [b_row] * 3
        mv_args = [p_sc, p_h1, p_h2]
    else:
        # Per-candidate-offset views of the UNRESHAPED previous-position
        # row: candidate qoff of width-k expansion reads source lanes
        # [qoff*C/k + ci*CT/k, ...+CT/k), i.e. lane-block qoff*n_ct + ci of
        # a (CT/k)-wide blocking. Reshaped whole-array views here would
        # cost XLA a full-buffer copy per call (~71 MB x6 for m=11).
        def b_part(k, qoff):
            return pl.BlockSpec(
                (1, NCRF, L, CT // k),
                lambda ci, w, s, _q=qoff: (s[0] + w - 1, 0, 0,
                                           _q * n_ct + ci),
                memory_space=vm)

        mv_specs = [b_part(2, q) for q in range(2) for _ in range(3)] + \
            [b_part(4, q) for q in range(4) for _ in range(3)]
        mv_args = [p_sc, p_h1, p_h2] * 6
    in_specs = (
        [b_tile] * 3 + mv_specs + [b_tile] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM),  # stay_tr
           pl.BlockSpec(memory_space=pltpu.SMEM)]  # move_tr
        + [pl.BlockSpec((4, 4, CT), lambda ci, w, s: (0, 0, ci),
                        memory_space=vm),
           pl.BlockSpec((2, CT), lambda ci, w, s: (0, ci), memory_space=vm),
           pl.BlockSpec((Pv, CT), lambda ci, w, s: (0, ci), memory_space=vm),
           pl.BlockSpec((2, NST, CT), lambda ci, w, s: (0, 0, 0),
                        memory_space=vm),
           pl.BlockSpec(memory_space=pltpu.SMEM),  # pattern
           pl.BlockSpec(memory_space=pltpu.SMEM)])  # active
    mxu = _use_mxu(spec, consts)
    if mxu:
        in_specs.append(pl.BlockSpec((2, CT // 2, CT),
                                     lambda ci, w, s: (0, 0, 0),
                                     memory_space=vm))  # emx
    out_specs = [b_tile] * 3 + [
        pl.BlockSpec((1, NCRF * L, CT), lambda ci, w, s: (w, 0, ci),
                     memory_space=vm)]
    out_shape = [
        jax.ShapeDtypeStruct((P, NCRF, L, C), jnp.float32),
        jax.ShapeDtypeStruct((P, NCRF, L, C), jnp.int32),
        jax.ShapeDtypeStruct((P, NCRF, L, C), jnp.int32),
        jax.ShapeDtypeStruct((W, NCRF * L, C), sel_format(L)[0]),
    ]
    stale_base = 1 + 3 + len(mv_args)  # arg index of s_sc (incl. scalar)
    kern = _make_kernel(spec, consts, interpret)
    fn = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_ct, W), in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((3, NCRF, L, CT), jnp.float32),
                            pltpu.VMEM(
                                (1 if _narrow(spec, consts) else
                                 (4 if (consts.pattern[1:] != 0).any()
                                  else 2),
                                 3, NCRF, L, CT), jnp.float32),
                            pltpu.VMEM((12, NCRF, L, CT), jnp.float32)]
            + ([pltpu.VMEM((5, NCRF, L, CT // 2), jnp.float32)]
               if mxu else [])),
        out_shape=out_shape,
        input_output_aliases={stale_base: 0, stale_base + 1: 1,
                              stale_base + 2: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the stack high-water exceeds the default 16M scoped limit for
            # large codes (srcall per CRF destination); physical VMEM on
            # v5e/v4 is 128M, so raise the scoped cap and keep CT modest
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    extra = (cdev["emx"],) if mxu else ()
    return fn(
        jnp.reshape(jnp.asarray(start1, jnp.int32), (1,)),
        p_sc, p_h1, p_h2, *mv_args, s_sc, s_h1, s_h2,
        stay_tr.astype(jnp.float32), move_tr.astype(jnp.float32),
        cdev["borev"], cdev["nbrev"], cdev["valid"], cdev["bfly"],
        cdev["pattern"], jnp.reshape(jnp.asarray(active, jnp.int32), (1,)),
        *extra)


# ---------------------------------------------------------------------------
# Forward scan + traceback (chunked over signal blocks)
# ---------------------------------------------------------------------------
#
# The forward emits per-block selections consumed by the traceback. Keeping
# the whole [T, W, 8L, C] selections tensor inside ONE jitted
# forward+traceback program made XLA hold roughly two copies of it (the
# scan ys plus the reverse-scan view), which pinned batch=1 and OOM'd
# m=14 r=1/2. The decode now runs as a host-orchestrated loop of jitted
# CHUNK programs over K-block slices: forward chunks carry the (prev,
# stale) buffers with donation (so the carries alias in place) and emit
# only their own K-block selections slice; traceback chunks walk the
# slices in reverse, dropping each slice's device buffer as soon as it is
# consumed. Peak HBM is one selections copy plus one buffer set, and the
# chunk loop is the natural seam for sharding (parallel/mesh.py wraps the
# chunk programs in shard_map over the batch axis). Host<->device traffic
# stays at O(posts + lists): the axon tunnel moves ~30 MB/s, so selections
# can never leave the device.


def _init_buffers(spec, consts: PallasConsts):
    C, L = spec.code.nstate_conv, spec.list_size
    P = spec.npos_pad  # includes the leading ghost row
    sc = jnp.full((P, NCRF, L, C), NEG, jnp.float32)
    sc = sc.at[1, :, 0, consts.init_rev].set(0.0)
    h = jnp.zeros((P, NCRF, L, C), jnp.int32)
    o = jnp.full((P, NCRF, L, C), NEG, jnp.float32)
    return (sc, h, h, o, jnp.zeros_like(h), jnp.zeros_like(h))


def _forward_chunk(spec, consts, cdev, interpret, carry, post, starts,
                   active):
    """Scan the ACS kernel over one K-block slice.

    carry: ((sc,h1,h2) prev, (sc,h1,h2) stale); post [K,5,8]; starts [K];
    active [K] bool. Returns (carry', sels0, sels1) with selections paired
    ([K/2, W, 8L, C] each) for even/odd blocks of the slice.

    Two blocks per scan step: the (prev, stale) buffer roles swap every
    block, and a one-block step would permute the scan carry — which XLA
    implements as full-buffer copies (~430 MB/step for m=11). The 2-block
    step returns each buffer in the carry slot it arrived in, so with the
    kernel's input_output_aliases the whole scan runs copy-free.
    """
    K = post.shape[0]
    assert K % 2 == 0

    def step(carry, xs):
        pA, pB = carry  # pA = prev (sc,h1,h2), pB = stale
        post2, start2, act2 = xs  # leading axis 2
        n0 = acs_block(
            spec, consts, cdev, pA, pB,
            post2[0].reshape(-1), start2[0] + 1, act2[0], interpret)
        n1 = acs_block(
            spec, consts, cdev, n0[:3], pA,
            post2[1].reshape(-1), start2[1] + 1, act2[1], interpret)
        # n1 occupies pA's storage, n0 pB's: carry slots keep their buffers
        return (n1[:3], n0[:3]), (n0[3], n1[3])

    pair = lambda a: a.reshape((K // 2, 2) + a.shape[1:])  # noqa: E731
    carry, (sels0, sels1) = jax.lax.scan(
        step, carry, (pair(post), pair(starts), pair(active)))
    return carry, sels0, sels1


def _final_scores(spec, consts, carry, T, nblk):
    """Scores at (last position, final conv state) [8, L] after all chunks.

    The buffer written at the read's last active step t = nblk-1: carry[0]
    was written at block T-1, carry[1] at block T-2 (cf. ops/lva.py).
    """
    same = (T - nblk) % 2 == 0
    fsc = jnp.where(same, carry[0][0], carry[1][0])
    last_row = spec.code.nstate_pos - 1 + 1
    return fsc[last_row, :, :, consts.final_rev]  # [8, L]


def window_bounds(starts_np: np.ndarray, nblk: int, npos_pad: int, W: int):
    """Per padded row, the first/last block t (< nblk) whose beam window
    [starts[t]+1, starts[t]+W] covers it. Rows never covered get
    (0, -10)."""
    rows = np.arange(npos_pad)
    s = np.asarray(starts_np[:nblk])
    tlo = np.searchsorted(s, rows - W, side="left")
    thi = np.searchsorted(s, rows - 1, side="right") - 1
    none = tlo > thi
    tlo = tlo.copy()
    thi = thi.copy()
    tlo[none] = 0
    thi[none] = -10
    return tlo.astype(np.int32), thi.astype(np.int32)


def _tb_init(spec, consts, tlo, thi, nblk):
    """Initial traceback state: all 8*L chains parked at the final state."""
    L = spec.list_size
    nch = NCRF * L
    Mw = -(-(spec.code.config.msg_len + spec.code.mem) // 32)
    last_row = spec.code.nstate_pos - 1 + 1
    ch = jnp.arange(nch, dtype=jnp.int32)
    par0 = (nblk - 1) % 2
    tw0 = _lastwrite(tlo, thi, jnp.full((nch,), last_row), nblk - 1, par0)
    return dict(
        pos=jnp.full((nch,), last_row, jnp.int32),
        conv=jnp.full((nch,), consts.final_rev, jnp.int32),
        f=ch // L, slot=ch % L,
        tw=tw0,
        words=jnp.zeros((nch, Mw), jnp.int32),
        bitcnt=jnp.zeros((nch,), jnp.int32),
        alive=jnp.ones((nch,), bool),
        okend=jnp.zeros((nch,), bool),
    )


def _lastwrite(tlo, thi, row, tmax, par):
    """Largest block t' <= tmax with parity ``par`` whose window wrote
    ``row``; -1 if the read would hit the initial buffers."""
    x = jnp.minimum(tmax, thi[row])
    x = x - ((x - par) & 1)
    return jnp.where(x >= tlo[row], x, -1)


def _tb_chunk(spec, consts, tbdev, tlo, thi, st, t0, sels0, sels1, starts):
    """Walk one K-block selections slice backward (blocks t0..t0+K-1),
    carrying the traceback state across chunks.

    Reconstructs packed messages for all 8*L final-state chains,
    replicating the reference's double-buffer staleness: the value a block
    t read for row r was written at the largest t' <= t-1 with
    t' = t-1 (mod 2) and r inside window(t'); if no such t', the read hit
    the initial buffers (parity-1 buffer holds the single seeded state,
    cpp:607-620,667-687).
    """
    C = spec.code.nstate_conv
    L = spec.list_size
    Mw = st["words"].shape[-1]
    K = 2 * sels0.shape[0]
    qmap, pattern, nbrev = tbdev["qmap"], tbdev["pattern"], tbdev["nbrev"]
    cstar = tbdev["cstar"]  # [4 pat, 4 base, C]
    lastwrite = partial(_lastwrite, tlo, thi)
    wi_ids = jnp.arange(Mw, dtype=jnp.int32)

    def step(st, xs):
        t, sel_t, start_t = xs
        act = st["alive"] & (st["tw"] == t)
        w_i = jnp.clip(st["pos"] - start_t - 1, 0, sel_t.shape[0] - 1)
        flat = (w_i * (NCRF * L) + st["f"] * L + st["slot"]) * C + st["conv"]
        code = jnp.take(sel_t.reshape(-1), flat).astype(jnp.int32)
        sshift = sel_format(L)[1]
        q = jnp.clip(code // sshift, 0, NQ_MAX - 1)
        lsrc = jnp.clip(code % sshift, 0, L - 1)
        g = qmap[st["f"], q]  # CRF predecessor
        is_stay = q == 0
        pat = pattern[st["pos"]]
        kvar = jnp.where(pat == 0, 0, 1)
        nb = nbrev[kvar, st["conv"]]
        # the conv candidate is determined by (pattern, emitted base, lane):
        # the base of a move into CRF state f is f % 4 (cpp:890-904)
        beta = st["f"] % 4
        cflat = (jnp.clip(pat, 0, 3) * 4 + beta) * C + st["conv"]
        c = jnp.clip(jnp.take(cstar.reshape(-1), cflat), 0, 3)
        rev2c = (c & 1) * 2 + (c >> 1)
        csrc = jnp.where(kvar == 0, (st["conv"] >> 1) + c * (C // 2),
                         (st["conv"] >> 2) + rev2c * (C // 4))
        off = st["bitcnt"] % 32
        widx = st["bitcnt"] // 32
        lo = nb << off
        hi = jnp.where(off == 0, 0, (nb >> 1) >> (31 - off))
        add = jnp.where(wi_ids[None] == widx[:, None], lo[:, None], 0) | \
            jnp.where(wi_ids[None] == widx[:, None] + 1, hi[:, None], 0)
        do_move = act & ~is_stay
        words = jnp.where(do_move[:, None], st["words"] | add, st["words"])
        bitcnt = jnp.where(do_move, st["bitcnt"] + 1 + kvar, st["bitcnt"])
        npos = jnp.where(is_stay, st["pos"], st["pos"] - 1)
        nconv = jnp.where(is_stay, st["conv"], csrc)
        nf = jnp.where(is_stay, st["f"], g)
        ntw = lastwrite(npos, t - 1, (t - 1) & 1)
        hit_init = act & (ntw < 0)
        okend = st["okend"] | (hit_init & (((t - 1) & 1) == 1)
                               & (npos == 1) & (nconv == consts.init_rev)
                               & (lsrc == 0))
        return dict(
            pos=jnp.where(act, npos, st["pos"]),
            conv=jnp.where(act, nconv, st["conv"]),
            f=jnp.where(act, nf, st["f"]),
            slot=jnp.where(act, lsrc, st["slot"]),
            tw=jnp.where(act, ntw, st["tw"]),
            words=words, bitcnt=bitcnt,
            alive=st["alive"] & ~(act & (ntw < 0)),
            okend=okend), ()

    # paired reverse scan matching the forward's 2-block steps: within a
    # pair, the odd block runs first when walking backward
    def pair_step(st, xs):
        tp, sel_t0, sel_t1, start_t0, start_t1 = xs
        st, _ = step(st, (tp + 1, sel_t1, start_t1))
        return step(st, (tp, sel_t0, start_t0))

    ts = t0 + jnp.arange(0, K, 2, dtype=jnp.int32)
    st, _ = jax.lax.scan(
        pair_step, st,
        (ts, sels0, sels1,
         starts.reshape(K // 2, 2)[:, 0], starts.reshape(K // 2, 2)[:, 1]),
        reverse=True)
    return st


class PallasDecoder:
    """Batched list-Viterbi decode via the fused kernel + traceback.

    The decode is a host-orchestrated loop of jitted chunk programs (see
    the chunking note above _init_buffers). ``mesh`` wraps every chunk
    program in ``shard_map`` over the mesh's 'data' axis, sharding the
    batch — pallas_call is not partitionable by GSPMD, so this is THE
    multi-chip path (parallel/mesh.py builds on it). B=1 runs unbatched
    programs: vmap at B=1 materializes a squeeze/copy of every carry
    buffer around each kernel call (~0.7 s/read for m=11).
    """

    def __init__(self, spec, tabs, ct: int | None = None,
                 chunk_blocks: int = 128, mesh=None):
        self.spec = spec
        self.interpret = spec.backend == "pallas_interpret"
        self.consts = build_consts(spec, tabs, ct)
        self.chunk_blocks = max(2, chunk_blocks - chunk_blocks % 2)
        self.mesh = mesh
        c = self.consts
        self._cdev = dict(
            borev=jnp.asarray(c.borev), nbrev=jnp.asarray(c.nbrev),
            valid=jnp.asarray(c.valid), bfly=jnp.asarray(c.bfly),
            pattern=jnp.asarray(c.pattern),
            stay_idx=jnp.asarray(c.stay_idx),
            move_idx=jnp.asarray(c.move_idx),
            emx=jnp.asarray(c.emx))
        self._tbdev = dict(
            qmap=jnp.asarray(c.qmap), pattern=jnp.asarray(c.pattern),
            nbrev=jnp.asarray(c.nbrev), cstar=jnp.asarray(c.cstar))
        self._fns = {}

    # -- per-(batch-size, chunk) jitted chunk programs (cached) ------------
    def _get_fns(self, B: int | None, K: int):
        """B=None: unbatched programs; B>=1: vmapped (+ shard_mapped when a
        mesh is set) programs over a leading batch axis."""
        if (B, K) in self._fns:
            return self._fns[(B, K)]
        spec, c = self.spec, self.consts
        L = spec.list_size

        def fwd(carry, post, starts, active, i):
            # chunk slicing happens INSIDE jit: eager slicing of global
            # (multi-host) arrays is not allowed, and this also avoids a
            # dispatched slice program per chunk
            sl = partial(jax.lax.dynamic_slice_in_dim, start_index=i,
                         slice_size=K, axis=0)
            return _forward_chunk(spec, c, self._cdev, self.interpret,
                                  carry, sl(post), sl(starts), sl(active))

        def tb(tlo, thi, st, t0, s0, s1, starts):
            starts_c = jax.lax.dynamic_slice_in_dim(starts, t0, K, axis=0)
            return _tb_chunk(spec, c, self._tbdev, tlo, thi, st, t0, s0,
                             s1, starts_c)

        def init():
            b = _init_buffers(spec, c)
            return (b[:3], b[3:])

        def tbinit(tlo, thi, nblk):
            return _tb_init(spec, c, tlo, thi, nblk)

        def fin(carry, tT, nblk):
            return _final_scores(spec, c, carry, tT, nblk)

        def order(fin_sc, words, okend):
            flat = fin_sc.reshape(-1)
            idx = jnp.argsort(-flat, stable=True)[:L]
            return flat[idx], words[idx], okend[idx]

        if B is not None:
            ndev = (1 if self.mesh is None
                    else self.mesh.devices.size)
            assert B % ndev == 0, "batch must divide over the mesh"
            # inside shard_map the program sees the LOCAL batch shard
            if B // ndev == 1:
                # one read per device (the production scale-out point):
                # vmap over the kernel breaks carry-buffer aliasing and
                # copies every buffer around every kernel call; squeeze
                # the unit batch axis ONCE per chunk program instead
                addb = partial(jax.tree.map, lambda x: x[None])
                dropb = partial(jax.tree.map, lambda x: x[0])
                fwd_u, tb_u, init_u = fwd, tb, init
                fwd = lambda c, p, s, a, i: addb(  # noqa: E731
                    fwd_u(dropb(c), p[0], s[0], a[0], i))
                tb = lambda lo, hi, st, t0, s0, s1, s: addb(  # noqa: E731
                    tb_u(lo[0], hi[0], dropb(st), t0, s0[0], s1[0], s[0]))
                init = lambda: addb(init_u())  # noqa: E731
                tbinit = jax.vmap(tbinit)
                fin = jax.vmap(fin, in_axes=(0, None, 0))
                order = jax.vmap(order)
            else:
                fwd = jax.vmap(fwd, in_axes=(0, 0, 0, 0, None))
                tb = jax.vmap(tb, in_axes=(0, 0, 0, None, 0, 0, 0))
                init = jax.vmap(init, axis_size=B // ndev)
                tbinit = jax.vmap(tbinit)
                fin = jax.vmap(fin, in_axes=(0, None, 0))
                order = jax.vmap(order)
            if self.mesh is not None:
                from jax.experimental.shard_map import shard_map
                P = jax.sharding.PartitionSpec
                d, r = P("data"), P()
                mesh = self.mesh
                cspec = ((d, d, d), (d, d, d))  # carry pytree

                def smap(f, in_specs, out_specs):
                    return shard_map(f, mesh=mesh, in_specs=in_specs,
                                     out_specs=out_specs,
                                     check_rep=False)

                stspec = dict(pos=d, conv=d, f=d, slot=d, tw=d, words=d,
                              bitcnt=d, alive=d, okend=d)
                fwd = smap(fwd, (cspec, d, d, d, r), (cspec, d, d))
                tb = smap(tb, (d, d, stspec, r, d, d, d), stspec)
                init = smap(init, (), cspec)
                tbinit = smap(tbinit, (d, d, d), stspec)
                fin = smap(fin, (cspec, r, d), d)
                order = smap(order, (d, d, d), (d, d, d))
        fns = dict(
            fwd=jax.jit(fwd, donate_argnums=(0,)),
            tb=jax.jit(tb, donate_argnums=(2, 4, 5)),
            init=jax.jit(init),
            tbinit=jax.jit(tbinit),
            fin=jax.jit(fin),
            order=jax.jit(order),
        )
        self._fns[(B, K)] = fns
        return fns

    def prep(self, posts, starts, nblks):
        """Host-side prep: pad T to whole chunks, build the traceback
        coverage tables and the active mask. Returns numpy arrays
        (posts, starts, nblks_i32, tlo, thi, active)."""
        spec = self.spec
        W, Pp = spec.window, spec.npos_pad
        posts = np.asarray(posts, np.float32)
        starts = np.asarray(starts, np.int32)
        nblks = np.asarray(nblks)
        B, T = posts.shape[:2]
        K = min(self.chunk_blocks, T)
        if T % K:  # pad to a whole number of chunks (inactive blocks)
            padT = K - T % K
            posts = np.concatenate(
                [posts, np.zeros((B, padT, 5, 8), np.float32)], axis=1)
            starts = np.concatenate(
                [starts, np.repeat(starts[:, -1:], padT, axis=1)], axis=1)
            T += padT
        tlo = np.zeros((B, Pp), np.int32)
        thi = np.zeros((B, Pp), np.int32)
        for b, n in enumerate(nblks):
            tlo[b], thi[b] = window_bounds(starts[b], int(n), Pp, W)
        active = np.arange(T)[None, :] < nblks[:, None]
        return posts, starts, nblks.astype(np.int32), tlo, thi, active

    def decode_device(self, posts, starts, nblks, tlo, thi, active,
                      unbatched: bool = False):
        """Chunk-loop decode over committed device arrays (global arrays
        under a mesh; see class docstring). All inputs batch-leading unless
        ``unbatched``. Returns device arrays (scores [B?,L], words int32
        [B?,L,Mw], okend [B?,L])."""
        T = posts.shape[-3]
        K = min(self.chunk_blocks, T)
        fns = self._get_fns(None if unbatched else posts.shape[0], K)

        carry = fns["init"]()
        chunks = []
        for i in range(0, T, K):
            carry, s0, s1 = fns["fwd"](carry, posts, starts, active,
                                       jnp.int32(i))
            chunks.append((s0, s1))
        fin_sc = fns["fin"](carry, jnp.int32(T), nblks)
        del carry

        st = fns["tbinit"](tlo, thi, nblks)
        for i in reversed(range(len(chunks))):
            s0, s1 = chunks[i]
            chunks[i] = None  # free the slice once consumed (donated)
            st = fns["tb"](tlo, thi, st, jnp.int32(i * K), s0, s1, starts)
        return fns["order"](fin_sc, st["words"], st["okend"])

    def decode(self, posts, starts, nblks):
        """posts [B,T,5,8] f32, starts [B,T] i32, nblks [B] -> packed words
        uint32 [B,L,Mw], scores [B,L], valid [B,L]."""
        posts, starts, nblks, tlo, thi, active = self.prep(
            posts, starts, nblks)
        B = posts.shape[0]
        unb = B == 1 and self.mesh is None
        sq = (lambda a: a[0]) if unb else (lambda a: a)
        if self.mesh is not None:
            bsh = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data"))
            put = partial(jax.device_put, device=bsh)
        else:
            put = jnp.asarray
        sc, words, okend = self.decode_device(
            put(sq(posts)), put(sq(starts)), put(sq(nblks)), put(sq(tlo)),
            put(sq(thi)), put(sq(active)), unbatched=unb)
        sc = np.asarray(sc)
        msgs = np.asarray(words).view(np.uint32)
        okend = np.asarray(okend)
        if unb:
            sc, msgs, okend = sc[None], msgs[None], okend[None]
        valid = (sc > -np.inf) & okend
        return msgs, sc, valid
