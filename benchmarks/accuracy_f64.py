"""On-device f64 accuracy probe (run with JAX_ENABLE_X64=1).

Measures the mixed-precision pairwise path on the current backend: f32
trust-region LM + 3 f64 Gauss-Newton polish steps
(solvers/lm.refine_pairwise). Target: the reference's double-precision
magnitudes (reference: README.md:142-150 — Ceres diff_tra ~6e-11).
Prints one JSON line: {"diff_tra":..., "diff_rot_deg":...,
"refine_ms":..., "f32_diff_tra":...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    # accuracy is size-independent (the probe measures the f64 Gauss-
    # Newton fixed point, not statistics); stride 4 shrinks the compile
    # surface ~4x so the probe survives cold remote-compile tunnels
    # (the round-2 driver bench timed it out at full size)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    # persistent compile cache: the f64 kernels recompile through the
    # remote-compile tunnel otherwise (minutes per cold run)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # 0.0: the axon rig compiles SERVER-side and caches there, so a
        # re-compile jax times at <1 s would never be persisted client-
        # side with the usual threshold — then a fresh rig (server cache
        # cold) pays the full f64 compile (~25 min measured round 4)
        # again. Persist everything so .jax_cache alone can warm any rig.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from mv_lm_icp_tpu.ops import se3
    from mv_lm_icp_tpu.solvers import lm
    from mv_lm_icp_tpu.utils import datasets

    # the package import above re-applies its own threshold (1.0 s);
    # re-lower AFTER it so the 0.0 actually sticks — on this rig the
    # server-side compile cache makes every jax-timed compile sub-second,
    # which the default threshold would never persist client-side
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    pts_np, nor_np = datasets.load_single_cloud()
    pts_np = pts_np[::args.stride]
    nor_np = nor_np[::args.stride]
    pts64 = jnp.asarray(pts_np, jnp.float64)
    nor64 = jnp.asarray(nor_np, jnp.float64)
    gt = se3.add_noise(jax.random.PRNGKey(42),
                       datasets.synthetic_pairwise_pose(jnp.float64),
                       0.1, 0.1)
    dst64 = se3.apply(gt, pts64)
    nor_dst64 = se3.rotate_only(gt, nor64)
    pts, dst, nor_dst = (a.astype(jnp.float32)
                         for a in (pts64, dst64, nor_dst64))

    est32, _ = lm.solve_pairwise(pts, dst, nor_dst, param_name="se3",
                                 metric="point_to_plane")
    dt32, _ = se3.pose_diff(gt, est32.astype(jnp.float64))

    ref, _ = lm.refine_pairwise(est32, pts64, dst64, nor_dst64,
                                metric="point_to_plane", iters=3)
    jax.block_until_ready(ref)          # compile
    t0 = time.perf_counter()
    reps = args.reps
    for i in range(reps):
        # index-perturbed input (negligible physics) so no dispatch/result
        # cache can skip the execution; (i+1) so the first timed rep also
        # differs from the warmup inputs
        r_i, _ = lm.refine_pairwise(est32, pts64, dst64 + 1e-15 * (i + 1),
                                    nor_dst64, metric="point_to_plane",
                                    iters=3)
        jax.block_until_ready(r_i)
    refine_ms = (time.perf_counter() - t0) / reps * 1e3
    dt, dr = se3.pose_diff(gt, ref)
    # ONE device->host fetch for all scalars: the tunnel's async result
    # fetch is intermittently flaky (observed: a scalar fetch hanging
    # forever after all compute finished), so minimize exposure — the
    # caller (bench.py) retries the whole subprocess on a hang
    import numpy as np

    vals = np.asarray(jnp.stack([dt32, dt, dr]))
    print(json.dumps({
        "backend": jax.devices()[0].platform,
        "n_points": int(pts_np.shape[0]),
        "f32_diff_tra": float(vals[0]),
        "diff_tra": float(vals[1]),
        "diff_rot_deg": float(vals[2]),
        "refine_ms_naive": round(refine_ms, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
