#!/usr/bin/env python3
"""Benchmark: reads/s list-Viterbi-decoded on TPU vs single-core reference C++.

Headline config (BASELINE.json): m=11, r=5/6, msg_len=180, list_size=8,
max_deviation=20 — the production decode of generate_decoded_lists.py.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

vs_baseline = (TPU reads/s) / (single-core C++ reads/s). The C++ rate is
measured locally if the reference binary can be built (cached in
.bench_baseline.json), since the reference publishes no throughput numbers
(BASELINE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import tempfile
import time

import numpy as np

# persistent compile cache: the m>=11 kernels take minutes to compile and
# every bench attempt runs in a fresh subprocess (axon worker crash
# isolation) — must be set before jax initializes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = pathlib.Path(__file__).resolve().parent
BASELINE_CACHE = REPO / ".bench_baseline.json"
REF_SRC = "/root/reference/viterbi/viterbi_convolutional_code.cpp"


def build_ref_binary() -> str | None:
    out = "/tmp/refbin/viterbi_nanopore.out"
    if os.path.exists(out):
        return out
    if not os.path.exists(REF_SRC):
        return None
    os.makedirs("/tmp/refbin", exist_ok=True)
    r = subprocess.run(
        ["g++", REF_SRC, "-std=c++11", "-o", out, "-I",
         os.path.dirname(REF_SRC), "-fopenmp", "-O3", "-march=native"],
        capture_output=True)
    return out if r.returncode == 0 else None


def gen_posts(cfg, n_reads: int, seed: int):
    from nanopore_dna_storage_tpu.coding.conv import (
        make_conv_code, conv_encode_bases)
    from nanopore_dna_storage_tpu.ops.synthetic import synthetic_post

    rng = np.random.default_rng(seed)
    code = make_conv_code(cfg)
    msgs = rng.integers(0, 2, (n_reads, cfg.msg_len), dtype=np.uint8)
    bases = conv_encode_bases(code, msgs)
    posts = [synthetic_post(b, rng, noise=1.0) for b in bases]
    return posts, msgs


def measure_cpp(binary: str, posts, cfg, list_size: int, dev: int,
                max_reads: int = 3) -> float:
    """Single-core C++ seconds per read."""
    td = pathlib.Path(tempfile.mkdtemp())
    times = []
    for i, post in enumerate(posts[:max_reads]):
        pf = td / f"{i}.post"
        post.astype("<f4").tofile(pf)
        t0 = time.perf_counter()
        subprocess.run(
            [binary, "-m", "decode", "-i", str(pf), "-o", str(td / "out"),
             "--mem-conv", str(cfg.mem), "--msg-len", str(cfg.msg_len),
             "-l", str(list_size), "-r", str(cfg.rate), "-t", "1",
             "--max-deviation", str(dev)],
            check=True, capture_output=True)
        times.append(time.perf_counter() - t0)
    return float(np.mean(times))


# TPU v5e VPU peak: (8, 128) vector lanes x 4 independent ALUs x ~940 MHz
# clock ~= 3.85e12 f32 element-ops/s per core (jax-ml scaling-book hardware
# model). The decode has no matmuls, so this — not MFU — is the roofline.
VPU_PEAK_OPS = 8 * 128 * 4 * 0.94e9


def estimate_kernel_ops(spec, consts, nblk: int) -> float:
    """Analytic VPU element-op count for one read through the ACS kernel
    (ops/lva_pallas.py): butterfly expansions + base compaction + hash
    updates + the suppression merge, summed over the beam window and all
    conv tiles per block. Counts one op per element per arithmetic/select
    pass; used for the absolute utilization estimate in --profile."""
    L = spec.list_size
    C = spec.code.nstate_conv
    CT = consts.ct
    n_ct = C // CT
    W = spec.window
    NCRF = 8
    plane = NCRF * L * CT  # one [8, L, CT] plane
    # average candidate count over trellis positions (pattern 0 -> 2, else 4)
    pats = consts.pattern[1:]
    ncs = float(np.where(pats == 0, 2, 4).mean())
    nst = float(np.where(pats == 0, consts.nstages[0],
                         consts.nstages[1]).mean())
    butterfly = 2 * nst * 3 * ncs * plane  # roll + select per stage/plane
    compact = 3 * ncs * 4 * plane  # per-base accumulate selects
    hashes = 4 * 2 * 11 * plane  # 4 betas x 2 hashes x (shl+add+3x(2cmp+sub))
    merge = 0.0
    # one F=8 merge over all CRF destinations (kernel v11): flop rows pad
    # to the flips' nq=8 with NEG — the padded rows still execute, so
    # they count as executed ops (utilization = executed/peak)
    for nq, F in ((8, 8),):
        cand = nq * L * F * CT
        outp = L * F * CT
        merge += L * (12 * cand + 4 * outp)  # L rounds: max/argmax/ohot/
        #                                      2x extract/dedup-knockout
    cell = butterfly + compact + hashes + merge
    return float(nblk) * W * n_ct * cell


def profile_breakdown(dec, packed, nblks, outdir="/tmp/nds_bench_trace"):
    """Capture a device trace of one decode and return {op: seconds} plus
    the kernel (pallas closed_call) share of device time — the utilization
    figure for this VPU-bound workload (there are no matmuls to MFU)."""
    import collections
    import glob
    import gzip

    import jax

    with jax.profiler.trace(outdir):
        dec.decode(packed, nblks)
    fs = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))
    if not fs:
        return None
    with gzip.open(fs[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in str(pids.get(e.get("pid"), "")):
            dur[e["name"]] += e.get("dur", 0)
    total = max((d for n, d in dur.items() if n.startswith("jit")),
                default=0)
    # the chunked decode runs many jit programs per read; device time is
    # their sum, not the max single program
    total = max(total,
                sum(d for n, d in dur.items() if n.startswith("jit")))
    kern = sum(d for n, d in dur.items() if "closed_call" in n)
    top = {n: round(d / 1e6, 3) for n, d in dur.most_common(8)}
    out = {"device_total_s": round(total / 1e6, 3),
           "kernel_s": round(kern / 1e6, 3),
           "kernel_share": round(kern / total, 3) if total else None,
           "top_ops": top}
    if getattr(dec, "_pallas", None) is not None and kern:
        ops = sum(estimate_kernel_ops(dec.spec, dec._pallas.consts, int(n))
                  for n in np.asarray(nblks))
        out["vpu_ops_est"] = round(ops / 1e12, 3)
        out["vpu_util_est"] = round(ops / (kern / 1e6) / VPU_PEAK_OPS, 3)
    return out


def verify_lists(dec, packed, nblks, posts, cfg, list_size, dev,
                 n_verify: int) -> bool | None:
    """Decode the first reads with the reference binary on the SAME posts
    and require bit-for-bit identical lists (BASELINE.json: 'identical
    decoded lists required'). Returns None if the binary can't be built."""
    binary = build_ref_binary()
    if not binary:
        return None
    td = pathlib.Path(tempfile.mkdtemp())
    m, sc, v = dec.decode(packed[:n_verify], nblks[:n_verify])
    match = True
    for i in range(n_verify):
        pf = td / f"{i}.post"
        posts[i].astype("<f4").tofile(pf)
        of = td / f"{i}.out"
        subprocess.run(
            [binary, "-m", "decode", "-i", str(pf), "-o", str(of),
             "--mem-conv", str(cfg.mem), "--msg-len", str(cfg.msg_len),
             "-l", str(list_size), "-r", str(cfg.rate), "-t", "4",
             "--max-deviation", str(dev)],
            check=True, capture_output=True)
        ref = [ln.strip() for ln in of.read_text().splitlines()
               if ln.strip()]
        got = ["".join(map(str, mm)) for mm, vv in zip(m[i], v[i]) if vv]
        if ref != got:
            match = False
            print(f"# verify MISMATCH read {i}: ref {len(ref)} lists, "
                  f"got {len(got)}", flush=True)
    return match


def wait_for_worker(max_wait_s: float = 180.0) -> bool:
    """A TPU compile crash kills the axon worker for a while; poll until a
    trivial jitted op succeeds in a fresh subprocess."""
    import sys
    deadline = time.time() + max_wait_s
    probe = ("import jax, jax.numpy as jnp;"
             "print(float(jax.jit(lambda x: (x @ x).sum())"
             "(jnp.ones((128, 128)))))")
    while time.time() < deadline:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=120)
        except subprocess.TimeoutExpired:
            # a wedged worker can HANG the probe rather than error it
            continue
        if r.returncode == 0:
            return True
        time.sleep(10)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny m=6 config for CI")
    ap.add_argument("--config", default="m11",
                    choices=["m11", "m14", "m14best", "m8"],
                    help="m11 = headline production decode; m14 = the "
                         "largest-trellis config (m=14 r=5/6 L=4, C=16384); "
                         "m14best = the best-reading-cost config (m=14 "
                         "r=1/2 L=4, supplementary Table 2); m8 = the "
                         "large-list config (m=8 r=1/2 L=64, experiment 0)")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--reads", type=int, default=0)
    ap.add_argument("--skip-cpp", action="store_true")
    ap.add_argument("--backend", default="pallas",
                    choices=["xla", "pallas", "pallas_interpret"])
    ap.add_argument("--merge-rounds", type=int, default=None)
    ap.add_argument("--ct", type=int, default=None,
                    help="override the Pallas conv tile width "
                         "(DecodeConfig.pallas_ct; default 512)")
    ap.add_argument("--profile", action="store_true",
                    help="also capture a device trace and report the "
                         "kernel share of device time")
    ap.add_argument("--sharded", action="store_true",
                    help="decode through ShardedDecoder on a 1-chip mesh "
                         "(the scale-out path) instead of the bare "
                         "LVADecoder; m11/m14/m8 configs only")
    ap.add_argument("--verify", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="decode the first read(s) with the reference "
                         "binary on the same posts and require identical "
                         "lists (adds lists_match to the JSON). Default: "
                         "on for the m11 config (the reference m=14 "
                         "decode costs ~25 min of CPU, opt in with "
                         "--verify)")
    ap.add_argument("--child", action="store_true",
                    help="internal: single-batch attempt, no fallback")
    args = ap.parse_args()
    if args.verify is None:
        args.verify = args.config == "m11" and not args.smoke

    from nanopore_dna_storage_tpu.config import ConvCodeConfig, DecodeConfig
    from nanopore_dna_storage_tpu.ops.lva import LVADecoder
    from nanopore_dna_storage_tpu.io.post import pack_posts

    if args.smoke:
        cfg = ConvCodeConfig(mem=6, rate=1, msg_len=100)
        list_size, dev = 4, 16
        batch = args.batch or 8
        n_reads = args.reads or 16
        metric = "reads_per_s_m6_r1_l4_smoke"
    elif args.config == "m14":
        # the largest trellis (C=16384): m=14 r=5/6 L=4 with the 1 pad bit
        # (msg_len 181, BASELINE.md Table 1); hardware-validated at
        # 8.24 s/read via scripts/tpu_run_probe.py
        cfg = ConvCodeConfig(mem=14, rate=5, msg_len=181)
        list_size, dev = 4, 20
        batch = args.batch or 1
        n_reads = args.reads or 2
        metric = "reads_per_s_m14_r5l6_l4"
    elif args.config == "m14best":
        # the best-reading-cost config: m=14 r=1/2 L=4, 4.42 bases/bit
        # (supplementary Table 2; experiment 2 uses msg_len 100)
        cfg = ConvCodeConfig(mem=14, rate=1, msg_len=100)
        list_size, dev = 4, 20
        batch = args.batch or 1
        n_reads = args.reads or 2
        metric = "reads_per_s_m14_r1l2_l4"
    elif args.config == "m8":
        # the large-list config: m=8 r=1/2 L=64 (default list size 64 for
        # m=8, supplementary §5.2; experiment 0 msg_len 100)
        cfg = ConvCodeConfig(mem=8, rate=1, msg_len=100)
        list_size, dev = 64, 20
        batch = args.batch or 1
        n_reads = args.reads or 2
        metric = "reads_per_s_m8_r1l2_l64"
    else:
        cfg = ConvCodeConfig(mem=11, rate=5, msg_len=180)
        list_size, dev = 8, 20
        # batch 1 is the single-chip throughput point at kernel v8
        # (chunked): 2.44 s/read at B=1 vs 3.94 at B=2 and 3.91 at B=4 —
        # the decode is VPU-compute-bound (99% kernel share) and vmap over
        # the kernel additionally breaks carry-buffer aliasing, so larger
        # batches only add copies. Scale-out shards READS over chips
        # (parallel/mesh.py), not bigger per-chip batches.
        batch = args.batch or 1
        n_reads = args.reads or 4
        metric = "reads_per_s_m11_r5l6_l8"

    metric_base = metric
    if args.sharded:
        metric += "_sharded"
    posts, _ = gen_posts(cfg, n_reads, seed=42)
    packed, nblks = pack_posts(posts)

    def make_decoder():
        if not args.sharded:
            return LVADecoder(DecodeConfig(code=cfg, list_size=list_size,
                                           max_deviation=dev,
                                           backend=args.backend,
                                           merge_rounds=args.merge_rounds,
                                           pallas_ct=args.ct))
        # the scale-out path: same chunk programs under shard_map over a
        # (here 1-chip) data mesh + device-side CRC/index classify
        from nanopore_dna_storage_tpu.parallel.mesh import (
            ShardedDecoder, data_mesh)
        from nanopore_dna_storage_tpu.pipeline.experiments import experiment
        exp_id = {"m11": 7, "m14": 8, "m8": 0}.get(args.config)
        if exp_id is None:
            raise SystemExit("--sharded supports configs m11/m14/m8 only")
        exp = experiment(exp_id)
        assert exp.msg_len() == cfg.msg_len
        sd = ShardedDecoder(exp, list_size=list_size, rc=False,
                            max_deviation=dev, mesh=data_mesh(),
                            backend=args.backend)
        num_oligos = 1 << exp.framing.index_len

        class _Shim:
            def decode(self, posts, nblks):
                res = sd.decode(posts, nblks, num_oligos)
                return res.msgs, res.scores, res.scores > -np.inf

        return _Shim()

    def run_with_batch(b):
        dec = make_decoder()
        dec.decode(packed[:b], nblks[:b])  # warmup/compile
        t0 = time.perf_counter()
        done = 0
        while done < n_reads:
            sel = slice(done, min(done + b, n_reads))
            nsel = sel.stop - sel.start
            if nsel < b:  # keep a fixed compiled shape
                idx = list(range(sel.start, sel.stop)) + [0] * (b - nsel)
                dec.decode(packed[idx], nblks[idx])
            else:
                dec.decode(packed[sel], nblks[sel])
            done += nsel
        rps = n_reads / (time.perf_counter() - t0)
        if args.profile:
            prof = profile_breakdown(dec, packed[:b], nblks[:b])
            print(f"# profile: {json.dumps(prof)}", flush=True)
        if args.verify:
            nver = 1 if cfg.mem >= 14 else min(n_reads, 2)
            ok = verify_lists(dec, packed, nblks, posts, cfg, list_size,
                              dev, nver)
            print(f"# lists_match: {json.dumps(ok)}", flush=True)
        return rps

    # a crashed/flaky TPU worker or HBM pressure should degrade, not fail.
    # Each batch attempt runs in an isolated subprocess: a failed compile
    # kills the axon TPU worker for a while, so an in-process fallback to a
    # smaller batch would inherit a dead client. The parent waits for worker
    # recovery between attempts.
    tpu_rps = None
    lists_match = None
    if args.child:
        tpu_rps = run_with_batch(batch)
    else:
        import sys
        # only ever fall back to SMALLER batches: larger ones cost more HBM
        # and would burn the child timeout on a doomed compile
        for b in [x for x in dict.fromkeys([batch, 2, 1]) if 1 <= x <= batch]:
            cmd = [sys.executable, __file__, "--child", "--batch", str(b),
                   "--reads", str(n_reads), "--skip-cpp",
                   "--backend", args.backend, "--config", args.config]
            if args.smoke:
                cmd.append("--smoke")
            if args.profile:
                cmd.append("--profile")
            cmd.append("--verify" if args.verify else "--no-verify")
            if args.sharded:
                cmd.append("--sharded")
            if args.merge_rounds is not None:
                cmd += ["--merge-rounds", str(args.merge_rounds)]
            if args.ct is not None:
                cmd += ["--ct", str(args.ct)]
            try:
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=2400 if args.verify else 1200)
            except subprocess.TimeoutExpired:
                print(f"# batch {b} timed out", flush=True)
                continue
            for ln in r.stdout.splitlines():
                if ln.startswith("# profile"):
                    print(ln, flush=True)
                if ln.startswith("# lists_match:"):
                    lists_match = json.loads(ln.split(":", 1)[1])
            line = next((ln for ln in r.stdout.splitlines()
                         if ln.startswith("{")), None)
            if r.returncode == 0 and line:
                res = json.loads(line)
                if res.get("value"):
                    tpu_rps = float(res["value"])
                    batch = b
                    break
            err = (r.stderr or r.stdout).strip().splitlines()
            print(f"# batch {b} failed: {err[-1][:160] if err else '?'}",
                  flush=True)
            wait_for_worker()
    if tpu_rps is None:
        print(json.dumps({"metric": metric, "value": None,
                          "unit": "reads/s", "vs_baseline": None}))
        return

    key = f"{metric_base}_cpp"
    baseline = {}
    if BASELINE_CACHE.exists():
        baseline = json.loads(BASELINE_CACHE.read_text())
    if key not in baseline and not args.skip_cpp:
        binary = build_ref_binary()
        if binary:
            # m=14 takes ~15 min/read single-core; one read is enough for
            # the denominator (decode time is data-independent to ~1%)
            spr = measure_cpp(binary, posts, cfg, list_size, dev,
                              max_reads=1 if cfg.mem >= 14 else 3)
            baseline[key] = 1.0 / spr
            BASELINE_CACHE.write_text(json.dumps(baseline))
    cpp_rps = baseline.get(key)
    vs = tpu_rps / cpp_rps if cpp_rps else None

    out = {
        "metric": metric,
        "value": round(tpu_rps, 3),
        "unit": "reads/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "backend": args.backend,
        "batch": batch,
        "s_per_read": round(1.0 / tpu_rps, 3),
        "cpp_s_per_read": round(1.0 / cpp_rps, 1) if cpp_rps else None,
    }
    if args.verify and not args.child:
        out["lists_match"] = lists_match
    print(json.dumps(out))


if __name__ == "__main__":
    main()
