#!/usr/bin/env python3
"""Signal-fidelity accuracy at a PRODUCTION config (VERDICT r2 #8).

Trains the kmer=6 hermetic-pore basecaller from scratch, then runs the
full signal loop (msg -> conv encode -> squiggle -> basecaller -> fwd-bwd
-> list-Viterbi -> CRC/index) at m=11 r=5/6 L=8 max-dev 20 — the
reference's evaluated regime (supplementary Table 3) — and writes a
Table-3-style correct/erasure/error breakdown to docs/SIGNAL_FIDELITY.json.

Absolute numbers are NOT comparable to the published table (the hermetic
hash pore model replaces scrappie's trained levels, declared in
signal/squiggle.py); the point is a recorded end-to-end accuracy at
production scale through the real signal stack.

Usage: python scripts/signal_fidelity_report.py [--reads 48]
       [--train-steps 1500] [--backend pallas|xla] [--experiment 7]
"""
import argparse
import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=48)
    ap.add_argument("--train-steps", type=int, default=4000)
    ap.add_argument("--list-size", type=int, default=8)
    ap.add_argument("--backend", default="pallas",
                    choices=["xla", "pallas", "pallas_interpret"])
    ap.add_argument("--experiment", type=int, default=7,
                    help="published experiment id (7 = m=11 r=5/6)")
    ap.add_argument("--kmer", type=int, default=6)
    ap.add_argument("--batch", type=int, default=2,
                    help="decode batch; m=11 selections cap one v5e chip "
                         "at ~2-4 reads per batch (docs/DESIGN.md §6)")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--profile", default="clean",
                    choices=["clean", "published"],
                    help="channel profile: 'clean' = iid hermetic channel; "
                         "'published' = + chimeric/junk reads, error "
                         "bursts, baseline drift, flank mis-trim "
                         "(signal/squiggle.PUBLISHED_PROFILE, calibrated "
                         "against supplementary Table 3)")
    ap.add_argument("--params-cache", default="/tmp/nds_fidelity_params.npz",
                    help="trained-basecaller cache (training is "
                         "profile-independent; calibration sweeps reuse it)")
    ap.add_argument("--override", default=None,
                    help="comma-separated ChannelProfile field overrides "
                         "for calibration sweeps, e.g. "
                         "'burst_rate=0.01,drift=0.15'")
    ap.add_argument("--out", default=None,
                    help="output JSON (default docs/SIGNAL_FIDELITY.json)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from nanopore_dna_storage_tpu.models import flipflop as ff
    from nanopore_dna_storage_tpu.pipeline.encode import encode_bytes
    from nanopore_dna_storage_tpu.pipeline.experiments import experiment
    from nanopore_dna_storage_tpu.pipeline.simulate import (
        simulate_and_decode_signal)

    exp = experiment(args.experiment)
    rng = np.random.default_rng(args.seed)
    # enough data for a handful of distinct oligos (file recovery is
    # covered elsewhere; this measures per-read decode accuracy)
    data = rng.integers(0, 256, exp.bytes_per_oligo * 6, np.uint8).tobytes()
    enc = encode_bytes(data, exp)

    # kmer=6 pore model needs more capacity than the kmer=1 smoke config.
    # Constant lr=1e-2 DIVERGES on this config (the round-3 0/48 result:
    # 99.7% basecall error after 4000 steps); warmup+cosine at 3e-3
    # converges to ~8.8% — the reference's real-data regime (8.4%,
    # supplementary §7; scripts/basecall_error_probe.py).
    model_cfg = ff.FlipflopConfig(winlen=11, stride=2, conv_filters=32,
                                  hidden=64, layer_dirs=("b", "f", "b"))
    params = None
    cache = pathlib.Path(args.params_cache) if args.params_cache else None
    if cache is not None and cache.exists():
        import jax.numpy as jnp
        with np.load(cache) as z:
            params = {k: jnp.asarray(z[k]) for k in z.files}
        print(f"# loaded trained params from {cache}", flush=True)

    profile = None
    if args.profile == "published":
        import dataclasses

        from nanopore_dna_storage_tpu.signal.squiggle import (
            PUBLISHED_PROFILE)
        profile = PUBLISHED_PROFILE
        if args.override:
            kv = dict(s.split("=") for s in args.override.split(","))
            profile = dataclasses.replace(
                profile, **{k: (int(v) if k == "flank_bases" else float(v))
                            for k, v in kv.items()})
            print(f"# profile overrides: {kv}", flush=True)

    t0 = time.perf_counter()
    stats, params = simulate_and_decode_signal(
        enc, exp, num_reads=args.reads, list_size=args.list_size,
        seed=args.seed, max_deviation=20, train_steps=args.train_steps,
        kmer=args.kmer, model_cfg=model_cfg, train_seq_len=60,
        learning_rate=3e-3, lr_schedule=True, params=params,
        batch=args.batch, backend=args.backend, profile=profile)
    dt = time.perf_counter() - t0
    if cache is not None and not cache.exists():
        np.savez(cache, **{k: np.asarray(v) for k, v in params.items()})

    n = stats.num_reads
    correct = stats.list_correct
    erasure = n - stats.crc_pass  # no CRC-passing candidate in the list
    error = stats.crc_pass - correct  # CRC passed but wrong index/payload
    out = {
        "config": f"m={exp.conv_mem} r index {exp.conv_rate} "
                  f"L={args.list_size} max_dev=20 kmer={args.kmer}",
        "experiment": args.experiment,
        "profile": args.profile,
        "backend": args.backend,
        "train_steps": args.train_steps,
        "num_reads": n,
        "num_correct": correct,
        "num_erasure_CRC": erasure,
        "num_error_CRC": error,
        "pct_correct": round(100.0 * correct / n, 2),
        "top_correct": stats.top_correct,
        "unique_indices": stats.unique_indices,
        "wall_s": round(dt, 1),
        "note": "hermetic pore model with residual scale calibrated so the "
                "from-scratch-trained basecaller reaches the reference's "
                "published real-data basecall error (~8.4-8.8%, "
                "supplementary §7; signal/squiggle.py RESID_SCALE) — "
                "Table-3 decode accuracy is the comparison anchor",
    }
    dest = pathlib.Path(args.out) if args.out else \
        REPO / "docs" / "SIGNAL_FIDELITY.json"
    dest.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
