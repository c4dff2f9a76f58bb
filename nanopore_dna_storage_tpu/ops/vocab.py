"""Vocabulary (k-mer word) Viterbi decoding over flip-flop posteriors.

JAX rebuild of ``decode_post_vocab`` (reference
viterbi/extra/viterbi_nanopore.cpp:398-602): the message is a sequence of
``msg_len`` words from a fixed DNA vocabulary; the decoder runs max-product
Viterbi over the joint state (msg position, word, position-in-word,
flip/flop bit) plus 8 pre-message init states, with traceback, and emits the
word index sequence.

State layout here is a dense padded tensor [npos, nwords, maxlen, 2] with
-inf at positions past each word's length; transitions are four masked
vectorized terms (stay, init entry, word boundary, within-word advance).
The traceback stores the winning predecessor's packed state id per state per
block (uint32), enough for exact path recovery.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..trellis.tables import stay_post_index, move_post_index, crf_move_mask

NBASE = 4
NCRF = 8
NEG_INF = -jnp.inf


def load_vocab_file(path: str) -> List[str]:
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


class VocabTables:
    def __init__(self, words: Sequence[str], msg_len: int):
        lut = {c: i for i, c in enumerate("ACGT")}
        self.words = list(words)
        self.msg_len = msg_len
        self.nwords = len(words)
        self.maxlen = max(len(w) for w in words)
        self.wordlen = np.asarray([len(w) for w in words], np.int32)
        base = np.zeros((self.nwords, self.maxlen), np.int32)
        for i, w in enumerate(words):
            for j, c in enumerate(w):
                base[i, j] = lut[c]
        self.base = base  # [W, P]
        self.valid = (np.arange(self.maxlen)[None, :]
                      < self.wordlen[:, None])  # [W, P]
        self.last_idx = self.wordlen - 1


def _pack_state(npos, nwords, maxlen):
    """state id = (((pos*nwords + w)*maxlen + p)*2 + ff) + NCRF; init = 0..7."""
    def pack(pos, w, p, ff):
        return ((pos * nwords + w) * maxlen + p) * 2 + ff + NCRF
    return pack


def decode_post_vocab(post: np.ndarray, msg_len: int,
                      words: Sequence[str]) -> np.ndarray:
    """post [T, 5, 8] -> word-index message [msg_len] (int32).

    Mirrors the reference exactly, including tie-breaking (strict > updates,
    candidate enumeration order) and the final argmax over word-end states.
    """
    vt = VocabTables(words, msg_len)
    T = post.shape[0]
    if T < msg_len:
        raise ValueError("Too small post matrix")
    W, P = vt.nwords, vt.maxlen
    npos = msg_len

    postf = jnp.asarray(post.reshape(T, 40), jnp.float32)
    stay_idx = jnp.asarray(stay_post_index())  # [8]
    move_idx = jnp.asarray(move_post_index())  # [to, from]
    crfmask = jnp.asarray(crf_move_mask())  # [to, from]

    base = jnp.asarray(vt.base)  # [W, P]
    valid = jnp.asarray(vt.valid)
    wordlen = jnp.asarray(vt.wordlen)
    # crf state of vocab state (w, p, ff)
    crf = base[:, :, None] + jnp.asarray([0, NBASE])[None, None, :]  # [W,P,2]
    pack = _pack_state(npos, W, P)
    # packed ids of all vocab states [pos, W, P, 2]
    pos_ids = np.arange(npos)
    ids = ((pos_ids[:, None, None, None] * W
            + np.arange(W)[None, :, None, None]) * P
           + np.arange(P)[None, None, :, None]) * 2 \
        + np.arange(2)[None, None, None, :] + NCRF
    ids = jnp.asarray(ids, jnp.uint32)
    # predecessor ids for the word-boundary transition: state (pos-1, w1,
    # wordlen[w1]-1, ff1); crf of those predecessors
    bnd_ids_w1 = ((pos_ids[:, None, None] - 1) * W
                  + np.arange(W)[None, :, None]) * P
    bnd_ids = (bnd_ids_w1 + np.asarray(vt.last_idx)[None, :, None]) * 2 \
        + np.arange(2)[None, None, :] + NCRF  # [pos, W1, 2]
    bnd_ids = jnp.asarray(bnd_ids, jnp.uint32)
    last_base = jnp.asarray(vt.base[np.arange(vt.nwords), vt.last_idx])
    bnd_crf = last_base[:, None] + jnp.asarray([0, NBASE])[None, :]  # [W1,2]

    def step(carry, pt):
        init_s, vs = carry  # [8], [pos, W, P, 2]
        stay_tr = pt[stay_idx]  # [8]
        move_tr = pt[move_idx]  # [to, from]

        # init states: stay only
        new_init = init_s + stay_tr
        init_bp = jnp.arange(NCRF, dtype=jnp.uint32)

        # vocab states
        sc_stay = vs + stay_tr[crf][None]  # [pos, W, P, 2]
        bp = ids  # stay backpointer (first candidate, cpp:480-485)
        best = sc_stay

        # from init states: only pos == 0 and p == 0
        cand_init = init_s[None, None, None, None, :] + \
            move_tr[crf][None]  # [1?, W, P, 2, from]
        cand_init = jnp.where(crfmask[crf][None], cand_init, NEG_INF)
        init_best = jnp.max(cand_init, axis=-1)  # [1(bcast pos), W, P, 2]
        init_arg = jnp.argmax(cand_init, axis=-1).astype(jnp.uint32)
        m0 = (jnp.arange(npos)[:, None, None, None] == 0) & \
            (jnp.arange(P)[None, None, :, None] == 0)
        take = m0 & (init_best > best)
        bp = jnp.where(take, init_arg, bp)
        best = jnp.where(take, init_best, best)

        # word boundary: pos>0, p==0; predecessors (pos-1, w1, last, ff1)
        safe_bnd = jnp.clip(bnd_ids.astype(jnp.int32) - NCRF, 0, None)
        prev_bnd = vs.reshape(-1)[safe_bnd.reshape(-1)].reshape(
            npos, W, 2)  # [pos, W1, 2] (garbage at pos 0, masked below)
        # candidate score for dest (pos, w, p, 2): over (w1, ff1)
        tr_bnd = move_tr[crf][:, :, :, bnd_crf]  # [W, P, 2, W1, 2]
        okc = crfmask[crf][:, :, :, bnd_crf]
        cand = prev_bnd[:, None, None, None, :, :] + tr_bnd[None]
        cand = jnp.where(okc[None], cand, NEG_INF)
        cand2 = cand.reshape(npos, W, P, 2, -1)
        b_best = jnp.max(cand2, axis=-1)
        b_arg = jnp.argmax(cand2, axis=-1)
        b_bp = jnp.take_along_axis(
            jnp.broadcast_to(bnd_ids.reshape(npos, 1, 1, 1, -1),
                             cand2.shape).astype(jnp.uint32),
            b_arg[..., None].astype(jnp.int32), axis=-1)[..., 0]
        mb = (jnp.arange(npos)[:, None, None, None] > 0) & \
            (jnp.arange(P)[None, None, :, None] == 0)
        take = mb & (b_best > best)
        bp = jnp.where(take, b_bp, bp)
        best = jnp.where(take, b_best, best)

        # within-word: p > 0, predecessor (pos, w, p-1, ff1)
        prev_in = jnp.concatenate(
            [jnp.full_like(vs[:, :, :1], NEG_INF), vs[:, :, :-1]], axis=2)
        prev_crf = jnp.concatenate(
            [crf[:, :1], crf[:, :-1]], axis=1)  # [W, P, 2]
        # tr[w,p,ff2,ff1] = move_tr[crf[w,p,ff2], prev_crf[w,p,ff1]]
        tr_w = move_tr[crf[:, :, :, None], prev_crf[:, :, None, :]]
        ok_w = crfmask[crf[:, :, :, None], prev_crf[:, :, None, :]]
        cand_w = prev_in[:, :, :, None, :] + tr_w[None]
        cand_w = jnp.where(ok_w[None], cand_w, NEG_INF)
        w_best = jnp.max(cand_w, axis=-1)
        w_arg = jnp.argmax(cand_w, axis=-1).astype(jnp.uint32)
        # packed id of (pos, w, p-1, ff1): strip the dest ff, add ff1
        ff_dest = jnp.arange(2, dtype=jnp.uint32)[None, None, None, :]
        w_bp = ids - 2 - ff_dest + w_arg
        mw = jnp.arange(P)[None, None, :, None] > 0
        take = mw & (w_best > best)
        bp = jnp.where(take, w_bp, bp)
        best = jnp.where(take, w_best, best)

        # invalid (padded) positions stay -inf
        best = jnp.where(valid[None, :, :, None], best, NEG_INF)
        full_bp = jnp.concatenate([init_bp, bp.reshape(-1)])
        return (new_init, best), full_bp

    init_carry = (jnp.zeros((NCRF,), jnp.float32),
                  jnp.full((npos, W, P, 2), NEG_INF, jnp.float32))
    (init_s, vs), bps = jax.lax.scan(step, init_carry, postf)

    # final state: pos = npos-1, p = wordlen-1, both ff; argmax
    fin = np.asarray(vs[npos - 1])  # [W, P, 2]
    cand_sc = fin[np.arange(vt.nwords), vt.last_idx]  # [W, 2]
    w_star, ff_star = np.unravel_index(np.argmax(cand_sc), cand_sc.shape)
    pack_id = ((npos - 1) * W + w_star) * P + vt.last_idx[w_star]
    state = np.uint32(pack_id * 2 + ff_star + NCRF)

    bps = np.asarray(bps)  # [T, S]
    path = np.empty(T + 1, np.uint32)
    path[T] = state
    for t in range(T, 0, -1):
        path[t - 1] = bps[t - 1, path[t]]

    # extract message: word index at every pos increment (cpp:583-599)
    msg = []
    cur_pos = -1
    for st in path:
        if st < NCRF:
            continue
        v = int(st) - NCRF
        ff = v % 2
        v //= 2
        p = v % P
        v //= P
        w = v % W
        pos = v // W
        if pos > cur_pos:
            if pos != cur_pos + 1 or p != 0:
                raise RuntimeError("inconsistent vocab path")
            cur_pos = pos
            msg.append(w)
    if len(msg) != msg_len:
        raise RuntimeError("decoded message length mismatch")
    return np.asarray(msg, np.int32)
