"""Checkpoint/resume for ICP runs.

The reference has none (SURVEY §5: state lives in Frame::pose, text files
are the only serialization). Here every outer round can snapshot the full
optimization state — poses, round index, RNG key — to a single .npz, and a
run can resume exactly. Cloud data is not duplicated (reload from the
dataset); poses are the state.
"""
from __future__ import annotations

import numpy as np


def save(path: str, fs, round_idx: int = 0, rng_key=None, extra=None):
    payload = {
        "poses": np.asarray(fs.poses),
        "gt_poses": np.asarray(fs.gt_poses),
        "fixed": np.asarray(fs.fixed),
        "round": np.asarray(round_idx),
    }
    if rng_key is not None:
        payload["rng_key"] = np.asarray(rng_key)
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def restore(path: str, fs):
    """Returns (fs with restored poses/gt_poses/fixed, round_idx,
    rng_key or None). ``extra_*`` entries saved via ``extra=`` come back
    through :func:`restore_extra` (e.g. the learned window W)."""
    import jax.numpy as jnp

    data = np.load(path)
    fs = fs.replace(
        poses=jnp.asarray(data["poses"], fs.poses.dtype),
        gt_poses=jnp.asarray(data["gt_poses"], fs.gt_poses.dtype),
        fixed=jnp.asarray(data["fixed"]),
    )
    rng = data["rng_key"] if "rng_key" in data else None
    return fs, int(data["round"]), rng


def restore_extra(path: str) -> dict:
    """The ``extra=`` payload of a checkpoint, keys un-prefixed."""
    data = np.load(path)
    return {k[len("extra_"):]: data[k] for k in data.files
            if k.startswith("extra_")}
