"""Flip-flop CRF forward-backward transition posteriors.

Batched JAX rebuild of transpost_crf_flipflop (flappie/src/decode.c:377-497):
given per-block transition weights [T, 40] it computes, for every block and
every allowed transition, log P(transition | whole signal), normalized per
block over the 40 entries (log_row_normalise, flappie_matrix.c:450-467).
The [T, 40] output reshapes to the decoder's [T, 5, 8] post layout
(rows to-flip A..T from each of 8 states; row 4 = into the from-state's flop).

This is the tensor handed to the list-Viterbi trellis — in the reference it
crosses a process boundary as the 160-byte/block ``.post`` file
(flappie.c:267-272); here it stays on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NBASE = 4
NSTATE = 8
NPARAM = 40


def _fwd_step(prev, t):
    """t: [5, 8] block transitions; prev: [8]."""
    flip = jax.nn.logsumexp(t[:NBASE] + prev[None, :], axis=1)
    flop = jnp.logaddexp(prev[NBASE:] + t[NBASE, NBASE:],
                         prev[:NBASE] + t[NBASE, :NBASE])
    return jnp.concatenate([flip, flop])


def _bwd_step(nxt, t):
    """Backward vector update (decode.c:466-489). nxt = bwd at blk+1."""
    # contributions of moving into flip b1 (from any state) and into flop
    from_flip_to_flop = nxt[NBASE:] + t[NBASE, :NBASE]  # source flip states
    stay_flop = nxt[NBASE:] + t[NBASE, NBASE:]  # source flop states
    into_flips = jax.nn.logsumexp(t[:NBASE] + nxt[:NBASE, None], axis=0)  # [8]
    flip_part = jnp.logaddexp(from_flip_to_flop, into_flips[:NBASE])
    flop_part = jnp.logaddexp(stay_flop, into_flips[NBASE:])
    return jnp.concatenate([flip_part, flop_part])


def transition_posteriors(trans: jnp.ndarray, nblk=None) -> jnp.ndarray:
    """trans: [T, 40] -> log posteriors [T, 5, 8], per-block normalized.

    nblk: optional valid-block count (padded sequences); beyond it the output
    is garbage (masked passthrough keeps the valid prefix exact).
    """
    T = trans.shape[0]
    t58 = trans.reshape(T, NBASE + 1, NSTATE)
    active = (jnp.arange(T) < nblk) if nblk is not None else jnp.ones(T, bool)

    def fstep(prev, xs):
        t, act = xs
        new = _fwd_step(prev, t)
        new = jnp.where(act, new, prev)
        return new, prev  # emit fwd vector *before* this block

    init = jnp.zeros((NSTATE,), trans.dtype)
    _, fwd = jax.lax.scan(fstep, init, (t58, active))  # fwd[t] = alpha_t

    def bstep(nxt, xs):
        t, act = xs
        new = _bwd_step(nxt, t)
        new = jnp.where(act, new, nxt)
        return new, nxt  # emit beta_{t+1}

    binit = jnp.zeros((NSTATE,), trans.dtype)
    _, bwd_next = jax.lax.scan(bstep, binit, (t58, active), reverse=True)

    # tpost[t, to-row, from] = alpha_t[from] + beta_{t+1}[dest] + trans
    flip_rows = fwd[:, None, :] + bwd_next[:, :NBASE, None] + t58[:, :NBASE]
    dest_of_from = jnp.concatenate(
        [bwd_next[:, NBASE:], bwd_next[:, NBASE:]], axis=1)  # flop(from%4)
    stay_row = fwd + dest_of_from + t58[:, NBASE]
    tp = jnp.concatenate([flip_rows, stay_row[:, None, :]], axis=1)
    # per-block normalization over all 40 entries
    logz = jax.nn.logsumexp(tp.reshape(T, NPARAM), axis=1)
    return tp - logz[:, None, None]


def batched_transition_posteriors(trans: jnp.ndarray,
                                  nblk: jnp.ndarray) -> jnp.ndarray:
    """vmap over reads: trans [B, T, 40], nblk [B] -> [B, T, 5, 8]."""
    return jax.vmap(transition_posteriors)(trans, nblk)
