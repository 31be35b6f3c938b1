"""Multiview CPU-vs-TPU A/B at the FULL reference workload.

Same-workload counterpart to bench.py's multiview secondary metric: the
reference's default configuration (reference: src/main_multiview.cpp:30-51,
150-169 — Bunny dir, limit=40, step=2 -> 18 frames x ~16.9k pts, knn=2,
cutoff=0.05, robust p2pl SE3, PCA normals) through the SAME fused
on-device outer loop, on a chosen backend. BASELINE.json's >=10x
iteration-throughput target is measured by running this once with
--platform cpu (this host) and once on the TPU (default).

Prints one JSON line {"platform":..., "ms_per_round":..., "rmse":...}.
ms/round is the slope between a k1-round and a k2-round fused program,
cancelling compile and dispatch overheads on both backends equally.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="cpu or default (tpu)")
    ap.add_argument("--k1", type=int, default=1)
    ap.add_argument("--k2", type=int, default=3)
    ap.add_argument("--pallas", action="store_true", default=None,
                    help="force the Pallas NN kernel (default: only on tpu)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from mv_lm_icp_tpu.models import frameset, pipeline
    from mv_lm_icp_tpu.utils import datasets as ds
    from mv_lm_icp_tpu.utils import metrics

    platform = jax.devices()[0].platform
    use_pallas = (platform == "tpu" if args.pallas is None else args.pallas)
    raw = ds.load_raw_frames(ds.BUNNY_DIR, limit=40, step=2,
                             sigma=0.02, sigmat=0.01, seed=0)
    fs = frameset.from_raw(raw, dtype=jnp.float32)
    print(f"platform={platform} frames={fs.num_frames} "
          f"pts={fs.num_points} pallas={use_pallas}", file=sys.stderr)

    def run_k(k):
        cfg = pipeline.ICPConfig(rounds=k, knn=2, cutoff=0.05,
                                 metric="point_to_plane", robust=True,
                                 use_pallas=use_pallas)

        @jax.jit
        def go():
            fs2, costs, _ = pipeline.run_icp_fused(fs, cfg)
            return fs2, costs[-1]

        fs2, c = go()
        jax.block_until_ready(c)  # compile + first run
        t0 = time.perf_counter()
        fs2, c = go()
        jax.block_until_ready(c)
        return time.perf_counter() - t0, fs2

    t1, _ = run_k(args.k1)
    t2, fs2 = run_k(args.k2)
    ms_round = (t2 - t1) / (args.k2 - args.k1) * 1e3
    rmse = float(metrics.alignment_rmse(fs2))
    print(f"k1={args.k1}: {t1:.2f}s  k2={args.k2}: {t2:.2f}s",
          file=sys.stderr)
    print(json.dumps({"platform": platform,
                      "ms_per_round": round(ms_round, 2),
                      "rounds_timed": [args.k1, args.k2],
                      "rmse_after_k2": rmse}))


if __name__ == "__main__":
    main()
