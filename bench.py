"""Benchmark entry point — prints ONE JSON line on stdout.

Headline metric: per-solve wall time of the reference's published benchmark
config — pairwise point-to-plane ICP on Bunny_RealData/cloudXYZ_0.xyz
(16.7k pts), synthetic pose + noise(0.1, 0.1), SE(3) parameterization,
<=50 LM iterations (reference: README.md:137 "ceres SophusSE3 0.083 s",
single CPU thread; see BASELINE.md). vs_baseline = 0.083 / ours.

Methodology: this rig reaches the TPU through an RPC tunnel with a ~25 ms
per-call floor and unreliable async completion, so naive per-call timing is
meaningless. Instead K solves are chained *inside one jitted fori_loop*
(each with an index-perturbed input so nothing can be cached/folded), a
scalar is fetched to force completion, and the per-solve time is the slope
between two chain lengths — which cancels the constant RPC/dispatch floor
exactly. This also reflects production use: batched on-device pipelines,
not one RPC per solve.
"""
from __future__ import annotations

import json
import sys
import time

CERES_SE3_P2PL_SECONDS = 0.083  # README.md:137


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def enable_compile_cache():
    import os

    import jax

    # TPU-class backends only: XLA:CPU entries are machine-specific AOT
    # results that SIGILL other hosts (see mv_lm_icp_tpu/__init__.py).
    # With no platform configured at all, only proceed when a non-CPU
    # backend is already initialized — never guess toward the hazard.
    p = (getattr(jax.config, "jax_platforms", None)
         or os.environ.get("JAX_PLATFORMS", "") or "")
    first = p.split(",")[0].strip().lower()
    if first == "cpu":
        return
    if not first:
        try:
            from jax._src import xla_bridge

            if not (xla_bridge.backends_are_initialized()
                    and jax.default_backend() != "cpu"):
                return
        except Exception:
            return
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache")
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        log(f"compilation cache unavailable: {e}")


def chain_time(make_chain, k1=8, k2=32, reps=3):
    """Per-iteration seconds via two-point slope; cancels RPC floor.

    Pick (k1, k2) so (k2-k1) * per-iter-time >> the tunnel's per-fetch
    jitter (a few ms): the round-3 closed-form '11x regression' was this
    method measuring a 0.34 ms chain delta through ~ms-level jitter.

    Returns (slope from min-of-reps, spread dict with every rep — the
    artifact's variance record, VERDICT r3 #8)."""
    f1, f2 = make_chain(k1), make_chain(k2)
    float(f1())  # compile
    float(f2())
    t1s = [_timed_fetch(f1) for _ in range(reps)]
    t2s = [_timed_fetch(f2) for _ in range(reps)]
    slope = max((min(t2s) - min(t1s)) / (k2 - k1), 1e-9)
    # worst-case slope across rep pairings bounds the jitter's leverage
    hi = max((max(t2s) - min(t1s)) / (k2 - k1), 1e-9)
    lo = max((min(t2s) - max(t1s)) / (k2 - k1), 1e-9)
    spread = {
        "k": [k1, k2], "reps": reps,
        "t1_ms": [round(t * 1e3, 2) for t in t1s],
        "t2_ms": [round(t * 1e3, 2) for t in t2s],
        "slope_ms": round(slope * 1e3, 4),
        "slope_lo_ms": round(lo * 1e3, 4),
        "slope_hi_ms": round(hi * 1e3, 4),
    }
    return slope, spread


def _timed_fetch(f):
    t0 = time.perf_counter()
    float(f())  # scalar fetch forces full completion
    return time.perf_counter() - t0


def drift_check(spreads):
    """Compare this run's per-metric slopes against the newest recorded
    BENCH_r*.json; flag >2x drift loudly (VERDICT r3 #8 — the silent
    0.014 -> 0.163 ms closed-form swing). During a driver round the
    newest artifact is the PREVIOUS round's (the current round's file is
    written after this run); on a manual re-run it may be this round's
    own record, so the reference file is logged with every flag."""
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    prevs = sorted(f for f in os.listdir(here)
                   if re.match(r"BENCH_r\d+\.json$", f))
    if not prevs:
        return
    try:
        with open(os.path.join(here, prevs[-1])) as fh:
            prev = json.load(fh)
        tail = prev.get("tail", "")
    except Exception:
        return
    # previous rounds record ms values in the stderr tail lines
    pats = {
        "lm": r"LM: ([\d.]+) ms/solve",
        "closedform": r"closed-form p2pt: ([\d.]+) ms/solve",
        "multiview": r"fused[^:]*: ([\d.]+) ms/round",
    }
    for name, pat in pats.items():
        if name not in spreads:
            continue
        m = re.search(pat, tail)
        if not m:
            continue
        old = float(m.group(1))
        new = spreads[name]["slope_ms"]
        ratio = max(new, 1e-9) / max(old, 1e-9)
        if ratio > 2.0 or ratio < 0.5:
            log(f"DRIFT {name}: {old:.3f} -> {new:.3f} ms "
                f"({ratio:.2f}x vs {prevs[-1]}) — check spread "
                f"{spreads[name]}")


def main():
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from mv_lm_icp_tpu.ops import se3
    from mv_lm_icp_tpu.solvers import closedform, lm
    from mv_lm_icp_tpu.utils import datasets

    log(f"devices: {jax.devices()}")
    pts_np, nor_np = datasets.load_single_cloud()
    pts = jnp.asarray(pts_np, jnp.float32)
    nor = jnp.asarray(nor_np, jnp.float32)
    gt = se3.add_noise(jax.random.PRNGKey(42),
                       datasets.synthetic_pairwise_pose(jnp.float32),
                       0.1, 0.1)
    dst = se3.apply(gt, pts)
    nor_dst = se3.rotate_only(gt, nor)

    def lm_chain(k):
        @jax.jit
        def run():
            def body(i, acc):
                d = dst + (1e-7 * i)   # defeat folding; negligible physics
                est, stats = lm.solve_pairwise(
                    pts, d, nor_dst, param_name="se3",
                    metric="point_to_plane")
                return acc + jnp.sum(est) + stats.final_cost
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    spreads = {}
    # 56 * 1.6 ms ~ 90 ms chain delta: far above tunnel jitter
    t_lm, spreads["lm"] = chain_time(lm_chain, k1=8, k2=64)
    log(f"pairwise p2pl se3 LM: {t_lm*1e3:.2f} ms/solve "
        f"(spread {spreads['lm']['slope_lo_ms']:.2f}.."
        f"{spreads['lm']['slope_hi_ms']:.2f} ms)")
    est, _ = lm.solve_pairwise(pts, dst, nor_dst, param_name="se3",
                               metric="point_to_plane")
    dt, dr = se3.pose_diff(gt, est)
    log(f"accuracy: diff_tra={float(dt):.2e} diff_rot={float(dr):.2e} deg")

    def cf_chain(k):
        @jax.jit
        def run():
            def body(i, acc):
                d = dst + (1e-7 * i)
                return acc + jnp.sum(closedform.point_to_point(pts, d))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    # ~0.04 ms/solve: 448 iterations ~ 20 ms chain delta, vs the 0.34 ms
    # the round-3 config measured through ms-level jitter (the "11x
    # regression" was measurement resolution, not a kernel change)
    t_cf, spreads["closedform"] = chain_time(cf_chain, k1=64, k2=512)
    log(f"closed-form p2pt: {t_cf*1e3:.3f} ms/solve (ref 1 ms; spread "
        f"{spreads['closedform']['slope_lo_ms']:.3f}.."
        f"{spreads['closedform']['slope_hi_ms']:.3f} ms)")

    # secondary: full multiview ICP round at the reference's FULL default
    # workload (18 Bunny frames x 16.9k pts, knn=2, cutoff=0.05, robust
    # p2pl SE3, PCA normals) via the fused on-device outer loop, slope
    # between 2- and 6-round programs.
    try:
        from mv_lm_icp_tpu.models import frameset, pipeline
        from mv_lm_icp_tpu.utils import datasets as ds

        raw = ds.load_raw_frames(ds.BUNNY_DIR, limit=40, step=2,
                                 sigma=0.02, sigmat=0.01, seed=0)
        fs = frameset.from_raw(raw, dtype=jnp.float32)

        def mv_chain(k):
            cfg = pipeline.ICPConfig(rounds=k, knn=2, cutoff=0.05,
                                     metric="point_to_plane", robust=True,
                                     use_pallas=True)

            @jax.jit
            def run():
                fs2, costs, _ = pipeline.run_icp_fused(fs, cfg)
                return jnp.sum(fs2.poses) + costs[-1]
            return run

        t_mv, spreads["multiview"] = chain_time(mv_chain, k1=2, k2=6)
        log(f"multiview ICP round (18 frames x 16.9k pts, fused, "
            f"pallas NN): {t_mv*1e3:.1f} ms/round (spread "
            f"{spreads['multiview']['slope_lo_ms']:.1f}.."
            f"{spreads['multiview']['slope_hi_ms']:.1f} ms)")
    except Exception as e:  # secondary metrics must never break the line
        log(f"multiview bench skipped: {e}")

    # secondary: on-device Pallas-vs-XLA NN exactness (kernel correctness
    # as a checked artifact on the REAL backend, not just interpret mode)
    try:
        from mv_lm_icp_tpu.kernels import nn_pallas
        from mv_lm_icp_tpu.ops import nn as nn_ops
        import numpy as np

        q = dst[: 8192]
        idx_p, d2_p = nn_pallas.nn_1(q, pts, jnp.ones(pts.shape[0], bool))
        idx_x, d2_x = nn_ops.nn_1(q, pts, jnp.ones(pts.shape[0], bool),
                                  chunk=2048)
        same = int(np.sum(np.asarray(idx_p) == np.asarray(idx_x)))
        assert same == q.shape[0], f"Pallas/XLA argmin mismatch: {same}"
        log(f"on-device NN exactness: Pallas == XLA argmin on "
            f"{same}/{q.shape[0]} queries (backend: "
            f"{jax.devices()[0].platform})")
    except Exception as e:
        log(f"NN exactness probe skipped: {e}")

    # secondary: mixed-precision accuracy (f32 LM + 3 f64 GN polish steps)
    # in a subprocess because it needs jax_enable_x64 from startup. The
    # probe runs on a strided cloud (accuracy is size-independent) and
    # hits the committed .jax_cache so cold remote compiles can't blow
    # the budget (the round-2 failure mode). Three outcomes are kept
    # distinct: measured, accuracy REGRESSION, environment skip.
    try:
        import os
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ, JAX_ENABLE_X64="1",
                   PYTHONPATH=here + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        # retry loop: the tunnel's async result fetch is intermittently
        # flaky (a fetch can hang forever AFTER all compute finished —
        # measured good runs take ~60-90 s warm), so four modest
        # attempts beat one long one (observed hang rate ~50% per run). The server-side compile cache is
        # warm after the first attempt even if its fetch hangs.
        line = ""
        for attempt in range(4):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(here, "benchmarks",
                                                  "accuracy_f64.py")],
                    env=env, capture_output=True, text=True, timeout=200)
            except subprocess.TimeoutExpired:
                log(f"f64 accuracy probe attempt {attempt + 1} timed out "
                    "(200s) — retrying (flaky tunnel fetch)")
                continue
            line = (out.stdout.strip().splitlines()[-1]
                    if out.stdout else "")
            if line:
                break
            # fast failure with empty stdout is NOT a timeout: surface
            # the real reason per attempt instead of mislabeling it
            tail = ("\n".join(out.stderr.strip().splitlines()[-4:])
                    if out.stderr else "<empty>")
            log(f"f64 accuracy probe attempt {attempt + 1} produced no "
                f"output (rc={out.returncode}); stderr tail: {tail}")
        else:
            raise RuntimeError(
                "f64 accuracy probe failed after 4 attempts "
                "(timeouts or empty output — see attempt logs above)")
        if line:
            acc = json.loads(line)
            log(f"f64-refined accuracy ({acc['backend']}, "
                f"{acc['n_points']} pts): "
                f"diff_tra {acc['f32_diff_tra']:.2e} (f32) -> "
                f"{acc['diff_tra']:.2e} (+3 GN f64 steps, "
                f"{acc['refine_ms_naive']:.0f} ms naive); reference f64 "
                "Ceres: ~6e-11 (README.md:142-150)")
            if not acc["diff_tra"] < 1e-10:
                log(f"f64 accuracy REGRESSION: diff_tra "
                    f"{acc['diff_tra']:.3e} >= 1e-10 — investigate")
    except Exception as e:
        log(f"f64 accuracy probe skipped ({type(e).__name__}: {e})")

    # secondary: multiview f64 accuracy (VERDICT r4 #6) — the fused f32
    # Bunny alternation polished by 3 f64 Gauss-Newton steps of the joint
    # system (api.refine_multiview), reported on the actual accuracy bar
    # (alignment RMSE + joint-cost decrease). Subprocess for x64 startup.
    try:
        import os
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ, JAX_ENABLE_X64="1",
                   PYTHONPATH=here + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        line = ""
        for attempt in range(3):
            try:
                out = subprocess.run(
                    [sys.executable,
                     os.path.join(here, "benchmarks",
                                  "accuracy_multiview_f64.py")],
                    env=env, capture_output=True, text=True, timeout=300)
            except subprocess.TimeoutExpired:
                log(f"multiview f64 probe attempt {attempt + 1} timed "
                    "out (300s) — retrying")
                continue
            line = (out.stdout.strip().splitlines()[-1]
                    if out.stdout else "")
            if line:
                break
            tail = ("\n".join(out.stderr.strip().splitlines()[-4:])
                    if out.stderr else "<empty>")
            log(f"multiview f64 probe attempt {attempt + 1} produced no "
                f"output (rc={out.returncode}); stderr tail: {tail}")
        if line:
            acc = json.loads(line)
            log(f"multiview f64 polish ({acc['backend']}, "
                f"{acc['frames']} frames x {acc['points_per_frame']} "
                f"pts): RMSE {acc['rmse_init']:.5f} -> "
                f"{acc['rmse_f32']:.6f} (f32) -> {acc['rmse_f64']:.6f} "
                f"(+3 GN f64 steps); joint cost "
                f"{acc['cost_f32_at64']:.9g} -> {acc['cost_f64']:.9g}")
        else:
            log("multiview f64 probe skipped (no output after retries)")
    except Exception as e:
        log(f"multiview f64 probe skipped ({type(e).__name__}: {e})")

    log("spreads: " + json.dumps(spreads))
    drift_check(spreads)

    result = {
        "metric": "pairwise_p2pl_se3_lm_solve",
        "value": round(t_lm, 6),
        "unit": "s",
        "vs_baseline": round(CERES_SE3_P2PL_SECONDS / t_lm, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
