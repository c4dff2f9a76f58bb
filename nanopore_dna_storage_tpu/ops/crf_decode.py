"""Viterbi basecall over the flip-flop CRF (batched JAX).

Rebuild of decode_crf_flipflop + change_positions
(flappie/src/decode.c:119-204, 66-79): max-product forward pass over the 8
flip/flop states with traceback, then basecall extraction at state-change
blocks. The state-change block indices are the reference's ``.trans`` file
(flappie.c:280-285), used for barcode localization in the posterior.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NBASE = 4
NSTATE = 8


def viterbi_flipflop(post: jnp.ndarray, nblk=None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """post: [T, 5, 8] log scores -> (path [T+1] int32, score).

    path[0] is the start state (zero-init scores, decode.c:130-142).
    nblk: optional valid-block count for padded inputs; beyond it the scan
    carries state through unchanged (identity backpointers), so the traceback
    and final argmax reflect block nblk exactly.
    """
    T = post.shape[0]
    active = (jnp.arange(T) < nblk) if nblk is not None else jnp.ones(T, bool)

    def fstep(prev, xs):
        t, act = xs
        # moves into flip b1 from any state
        cand_flip = t[:NBASE] + prev[None, :]  # [4, 8]
        flip_bp = jnp.argmax(cand_flip, axis=1).astype(jnp.int32)
        flip = jnp.max(cand_flip, axis=1)
        # flop b2: stay vs move from flip (tie -> stay, matching the
        # strict-inequality update in decode.c:158-164)
        stay = prev[NBASE:] + t[NBASE, NBASE:]
        move = prev[:NBASE] + t[NBASE, :NBASE]
        take_move = move > stay
        flop = jnp.where(take_move, move, stay)
        flop_bp = jnp.where(take_move, jnp.arange(NBASE, dtype=jnp.int32),
                            jnp.arange(NBASE, dtype=jnp.int32) + NBASE)
        new = jnp.concatenate([flip, flop])
        bp = jnp.concatenate([flip_bp, flop_bp])
        ident = jnp.arange(NSTATE, dtype=jnp.int32)
        new = jnp.where(act, new, prev)
        bp = jnp.where(act, bp, ident)
        return new, bp

    init = jnp.zeros((NSTATE,), post.dtype)
    final, bps = jax.lax.scan(fstep, init, (post, active))  # bps [T,8]
    last = jnp.argmax(final).astype(jnp.int32)
    score = final[last]

    def bstep(state, bp):
        prev_state = bp[state]
        return prev_state, state

    first, rev_path = jax.lax.scan(bstep, last, bps, reverse=True)
    path = jnp.concatenate([first[None], rev_path])
    return path, score


def viterbi_flipflop_batch(posts: jnp.ndarray, nblk=None):
    if nblk is None:
        return jax.vmap(viterbi_flipflop)(posts)
    return jax.vmap(viterbi_flipflop)(posts, nblk)


def basecall_from_path(path: np.ndarray, nblk: int
                       ) -> Tuple[str, np.ndarray]:
    """(basecall string, block index of each base) from a state path.

    change_positions (decode.c:66-79): a base is emitted at every block where
    the state differs from the previous block; position range is [1, nblk).
    """
    path = np.asarray(path)[: nblk + 1]
    ch = np.nonzero(path[1:nblk] != path[:nblk - 1])[0] + 1
    bases = "ACGT"
    call = "".join(bases[int(path[i]) % NBASE] for i in ch)
    return call, ch.astype(np.int64)
