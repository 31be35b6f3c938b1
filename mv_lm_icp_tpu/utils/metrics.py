"""Evaluation metrics and run summaries.

Replicates the reference's accuracy reporting (``poseDiff`` strings,
include/common.h:259-282; ``summary`` quantile table, common.h:290-329) and
adds the alignment-RMSE-vs-ground-truth metric that BASELINE.json keys on.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3


def pose_errors(poses: jnp.ndarray, gt_poses: jnp.ndarray):
    """Per-frame (diff_tra [F], diff_rot_deg [F])."""
    return se3.pose_diff(poses, gt_poses)


def mean_pose_error(poses, gt_poses):
    dt, dr = pose_errors(poses, gt_poses)
    return float(jnp.mean(dt)), float(jnp.mean(dr))


def alignment_rmse(fs) -> float:
    """RMSE of estimated-vs-GT global point positions over valid points.

    The 'converged alignment RMSE on Bunny/dinosaur' number from
    BASELINE.json: for each frame, points mapped by the estimated pose vs
    the ground-truth pose, masked root-mean-square over the scene.
    """
    est = jax.vmap(se3.apply)(fs.poses, fs.points)
    gt = jax.vmap(se3.apply)(fs.gt_poses, fs.points)
    d2 = jnp.sum((est - gt) ** 2, axis=-1)
    w = fs.valid.astype(d2.dtype)
    return float(jnp.sqrt(jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0)))


def gauge_aligned_rmse(fs, stride: int = 4) -> float:
    """Alignment RMSE after removing the global gauge: the estimated
    scene is rigidly aligned to the GT scene (closed-form Eggert SVD on
    the merged clouds) before the RMSE — the ATE-style metric.

    Why it exists: the raw :func:`alignment_rmse` conflates registration
    quality with the anchor's own pose error — frame 0 is pinned at its
    NOISY initial pose (the gauge), so even a PERFECT relative
    registration scores sqrt(mean |T0_noisy p - T0_gt p|^2) > 0 (3.78 on
    the dinosaur workload, where converged solvers plateau at 3.3-3.5 and
    an early-stopped solver can score 2.86 by simply not registering all
    the way). This metric answers "how well are the surfaces mutually
    registered" independent of where the gauge put them.
    """
    import numpy as np

    from ..solvers import closedform

    est = jax.vmap(se3.apply)(fs.poses, fs.points)
    gt = jax.vmap(se3.apply)(fs.gt_poses, fs.points)
    v = np.asarray(fs.valid).reshape(-1)
    e = np.asarray(est).reshape(-1, 3)[v][::stride]
    g = np.asarray(gt).reshape(-1, 3)[v][::stride]
    pose = closedform.point_to_point(jnp.asarray(e), jnp.asarray(g))
    e_aligned = se3.apply(pose, jnp.asarray(e))
    d2 = jnp.sum((e_aligned - jnp.asarray(g)) ** 2, axis=-1)
    return float(jnp.sqrt(jnp.mean(d2)))


class DivergenceWatch:
    """Detect a diverging ICP run: the tracked metric (alignment RMSE or
    cost) rising ``patience`` consecutive rounds.

    The reference's divergence detector is its interactive viewer (you
    watch the red frusta drift from the green ones, Visualize.cpp:243-245);
    headless runs need an automatic one. The known failure mode is
    low-overlap creep (step=8 Bunny: RMSE 0.0149 -> 0.037 over 20 rounds,
    BENCHMARKS.md 'low-overlap drift'), fixed by the median-prune
    rejection — so the warning suggests ``--prune`` when it is off.
    """

    def __init__(self, patience: int = 3, min_rel_rise: float = 1e-3):
        self.patience = patience
        # a rise only counts above this relative threshold — converged
        # runs wobble at the last digits of the plateau and must not trip
        self.min_rel_rise = min_rel_rise
        self.prev = None
        self.rising = 0
        self.fired = False

    def update(self, value: float, prune_on: bool = False) -> bool:
        """Feed this round's metric; True (+ a UserWarning) on divergence."""
        import warnings

        if self.prev is not None and \
                value > self.prev * (1.0 + self.min_rel_rise):
            self.rising += 1
        else:
            # any non-rising round (drop OR plateau within the rise
            # threshold) breaks the consecutive streak — otherwise rises
            # separated by plateaus accumulate and fire spuriously on a
            # long wobbling-but-converged run
            self.rising = 0
        self.prev = value
        if self.rising >= self.patience and not self.fired:
            self.fired = True
            hint = ("" if prune_on else
                    " — try --prune (rejects matches with dist > "
                    "1.5*median; stabilizes low-overlap scenes)")
            warnings.warn(
                f"ICP appears to be DIVERGING: the alignment metric rose "
                f"{self.rising} consecutive rounds{hint}", stacklevel=2)
            return True
        return False


def pose_diff_report(poses, gt_poses, label: str = "") -> str:
    """Reference-style per-frame accuracy lines (common.h:278-280)."""
    dt, dr = pose_errors(poses, gt_poses)
    lines = []
    for i in range(poses.shape[0]):
        lines.append(f"{label}frame {i}\t diff_tra:{float(dt[i]):.6g}"
                     f"\t diff_rot_degrees:{float(dr[i]):.6g}")
    return "\n".join(lines)


def summary(values, name: str = "") -> str:
    """R-style quantile summary string (common.h:290-329)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = v.size
    if n == 0:
        return f"Summary of 0 {name}: empty"
    mean = float(v.mean())
    std = float(np.sqrt(np.mean(v * v) - mean * mean))
    pick = lambda frac: float(v[min(int(n * frac), n - 1)])
    return (
        f"Summary of {n} {name}:\n"
        "Min\t.25\tMed\tMean\t.75\tMax \tStd\n"
        f"{v[0]:.4g} \t{pick(.25):.4g} \t{pick(.5):.4g} \t"
        f"{round(mean * 100) * 0.01:.4g} \t{pick(.75):.4g} \t"
        f"{v[-1]:.4g} \t{round(std * 100) * 0.01:.4g}"
    )
