#!/usr/bin/env python3
"""Measure the axon TPU worker's per-execution duration limit.

Hypothesis (DESIGN.md §5): the m=8 XLA-backend decode and the m>=11
exhaustive-rounds XLA programs "fault the worker" not because of their
content but because each is ONE long device execution, and the worker
enforces a per-execution deadline; the Pallas path survives because v9
chunked it into short executions. This probe quantifies the limit with
a neutral program: a jitted fori_loop of dependent 512x512 matmuls,
calibrated to a target wall duration, run in a FRESH subprocess per
trial (a fault kills the worker for a while; the parent polls a tiny
matmul to measure recovery).

Usage:
  python scripts/tpu_exec_limit_probe.py              # orchestrate trials
  python scripts/tpu_exec_limit_probe.py --child N    # one execution of N iters
  python scripts/tpu_exec_limit_probe.py --calibrate  # print iters/sec

Writes docs/EXEC_LIMIT.json with per-trial survive/fault + recovery.
"""
import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def _child(iters: int) -> None:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, n):
        def body(_, a):
            return jnp.tanh(a @ a) * 0.999
        return jax.lax.fori_loop(0, n, body, x)

    x = jnp.ones((1024, 1024), jnp.float32) * 0.01
    # warm the compile with a 1-iter call; NOTE the axon tunnel's
    # block_until_ready returns at dispatch, so time through a host
    # materialization (bool()) which genuinely waits for the result
    bool(jnp.isfinite(run(x, 1)).all())
    t0 = time.perf_counter()
    ok = bool(jnp.isfinite(run(x, iters)).all())
    dt = time.perf_counter() - t0
    print(json.dumps({"iters": iters, "exec_s": round(dt, 4), "ok": ok}),
          flush=True)


def _alive(timeout: float = 60.0) -> float:
    """Seconds until a fresh process can run a tiny matmul (worker alive)."""
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < timeout:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax,jax.numpy as jnp;"
             "print((jnp.ones((8,8))@jnp.ones((8,8))).sum())"],
            capture_output=True, timeout=120)
        if r.returncode == 0:
            return round(time.perf_counter() - t0, 1)
        time.sleep(5)
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--calibrate", action="store_true")
    ap.add_argument("--durations", default="15,30,60,120,240,480")
    ap.add_argument("--out", default=str(REPO / "docs" / "EXEC_LIMIT.json"))
    args = ap.parse_args()

    if args.child is not None:
        _child(args.child)
        return

    def trial(iters: int) -> dict:
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, __file__, "--child", str(iters)],
            capture_output=True, text=True, timeout=1800)
        wall = round(time.perf_counter() - t0, 1)
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            payload = json.loads(line)
        except json.JSONDecodeError:
            payload = None
        return {"iters": iters, "wall_s": wall, "rc": r.returncode,
                "result": payload,
                "stderr_tail": r.stderr.strip().splitlines()[-3:]
                if r.returncode else []}

    # calibrate iters/sec with a short run
    cal = trial(20000)
    if not cal["result"] or not cal["result"]["exec_s"]:
        print(json.dumps({"error": "calibration failed", "cal": cal}))
        return
    ips = cal["result"]["iters"] / cal["result"]["exec_s"]
    print(f"calibration: {ips:.0f} iters/s", flush=True)
    if args.calibrate:
        return

    trials = [cal]
    for target in [float(d) for d in args.durations.split(",")]:
        iters = max(1, int(target * ips))
        print(f"target {target}s -> {iters} iters", flush=True)
        t = trial(iters)
        t["target_s"] = target
        if t["rc"] != 0 or not (t["result"] or {}).get("ok", False):
            t["recovery_s"] = _alive(timeout=600)
        trials.append(t)
        print(json.dumps(t), flush=True)
        if t["rc"] != 0:
            break  # first fault bounds the limit; stop burning worker

    out = {"note": "per-execution duration probe on the axon TPU worker: "
                   "a jitted fori_loop of dependent 512x512 matmuls per "
                   "trial, fresh process each; first faulting duration "
                   "bounds the worker's per-execution limit",
           "iters_per_s": round(ips, 1), "trials": trials}
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
