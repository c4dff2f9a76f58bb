"""Standalone basecalling: raw signal -> fastq/fasta (flappie CLI parity).

Reproduces flappie's per-read flow (flappie.c:235-305): trim + medmad
normalize, flip-flop network forward, forward-backward posterior, Viterbi
basecall over the posterior, per-base phred qualities from the chosen
transition posteriors (util.h:196-217), fastq/fasta emit
(flappie_output.c:92-133). Batched over reads on device.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..models import flipflop as ff
from ..ops.fwdbwd import batched_transition_posteriors
from ..ops.crf_decode import viterbi_flipflop_batch, basecall_from_path
from ..signal.normalize import medmad_normalize, trim_and_segment

MAX_POST_PROB = 0.99999  # util.h clip


def phred_char(p: np.ndarray) -> np.ndarray:
    p = np.clip(p, 0.0, MAX_POST_PROB)
    q = -(10.0 * np.log10(np.e)) * np.log1p(-p)
    return np.clip(np.round(33.0 + q), 33, 126).astype(np.uint8)


@dataclasses.dataclass
class Basecall:
    read_id: str
    sequence: str
    quality: str
    block_index: np.ndarray  # block of each base (the .trans data)
    score: float
    nblocks: int
    trimmed: Tuple[int, int]
    posterior: Optional[np.ndarray] = None  # [T,5,8] log posteriors


class Basecaller:
    def __init__(self, params=None, cfg: Optional[ff.FlipflopConfig] = None,
                 seed: int = 0):
        import jax

        self.cfg = cfg or ff.FlipflopConfig()
        self.params = params if params is not None else ff.init_params(
            self.cfg, seed)

        def run(params, signal, nsamples):
            trans = ff.flipflop_transitions(params, self.cfg, signal,
                                            nsamples)
            nblk = -(-nsamples // self.cfg.stride)
            post = batched_transition_posteriors(trans, nblk)
            paths, scores = viterbi_flipflop_batch(post, nblk)
            return post, paths, scores

        self._run = jax.jit(run)

    def basecall(self, read_ids: Sequence[str],
                 signals: Sequence[np.ndarray], *, trim: bool = True,
                 keep_posterior: bool = False,
                 bucket: int = 512) -> List[Basecall]:
        """Basecall a batch of raw signals (variable length, padded)."""
        prepped = []
        ranges = []
        for sig in signals:
            if trim:
                s, e = trim_and_segment(sig)
                if s >= e:
                    s, e = 0, len(sig)
            else:
                s, e = 0, len(sig)
            prepped.append(medmad_normalize(sig[s:e]))
            ranges.append((s, e))
        ns = np.asarray([len(p) for p in prepped], np.int32)
        T = -(-int(ns.max()) // bucket) * bucket
        batch = np.zeros((len(prepped), T), np.float32)
        for i, p in enumerate(prepped):
            batch[i, : len(p)] = p
        post, paths, scores = self._run(self.params, batch, ns)
        post = np.asarray(post)
        paths = np.asarray(paths)
        out = []
        for i, rid in enumerate(read_ids):
            nblk = -(-int(ns[i]) // self.cfg.stride)
            call, ch = basecall_from_path(paths[i], nblk)
            # per-base quality: posterior prob of the transition taken at the
            # base's block (flappie.c:273-279 via qpath)
            probs = []
            for idx in ch:
                frm, to = int(paths[i][idx - 1]), int(paths[i][idx])
                row = to if to < 4 else 4
                probs.append(np.exp(post[i, idx - 1, row, frm]))
            qual = "".join(map(chr, phred_char(np.asarray(probs))))
            out.append(Basecall(
                read_id=rid, sequence=call, quality=qual, block_index=ch,
                score=float(scores[i]), nblocks=nblk, trimmed=ranges[i],
                posterior=post[i, :nblk] if keep_posterior else None))
        return out


def write_fastq(path: str, calls: Iterable[Basecall]) -> None:
    with open(path, "w") as f:
        for c in calls:
            f.write(f"@{c.read_id}\n{c.sequence}\n+\n{c.quality}\n")


def write_fasta(path: str, calls: Iterable[Basecall]) -> None:
    with open(path, "w") as f:
        for c in calls:
            f.write(f">{c.read_id}\n{c.sequence}\n")


def write_sam(path: str, calls: Iterable[Basecall]) -> None:
    """Unaligned SAM records (flappie_output.c:69-90): flag 4, no ref."""
    with open(path, "w") as f:
        f.write("@HD\tVN:1.4\tSO:unknown\n")
        for c in calls:
            f.write(f"{c.read_id}\t4\t*\t0\t0\t*\t*\t0\t0\t"
                    f"{c.sequence}\t{c.quality}\n")
