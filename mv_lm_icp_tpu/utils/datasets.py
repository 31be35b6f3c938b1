"""Dataset wrappers for the sample scenes: frame discovery, loading,
padding to fixed device shapes, and the reference's pose-initialization
semantics.

Replicates ``loadFrames`` (reference: src/main_multiview.cpp:53-100):

- discover ``cloud*``, ``pose*``, ``groundtruth*`` files (length-then-lex
  ordered, common.h:149-155),
- stride ``step`` with cap ``limit`` frames (main_multiview.cpp:63),
- ``fake`` mode loads frame 0 repeatedly (main_multiview.cpp:66),
- dinosaur-style (separate groundtruth files): pose = pose file,
  gt = groundtruth file (main_multiview.cpp:74-76),
- bunny-style (poses only): gt = pose file, pose = gt perturbed with
  ``add_noise(sigma, sigmat)`` except frame 0 which stays exact
  (main_multiview.cpp:78-85).

Clouds are ragged on disk; on device they live padded to a common point
count (rounded up to ``pad_multiple``) with a validity mask — the
fixed-shape SoA layout every kernel in this framework assumes.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3
from . import io

BUNNY_DIR = "/root/reference/samples/Bunny_RealData"
DINOSAUR_DIR = "/root/reference/samples/dinosaur"
SCENE_XYZ = "/root/reference/samples/scene.xyz"


@dataclasses.dataclass
class RawFrames:
    """Host-side (numpy, ragged) frame data before device padding."""

    points: List[np.ndarray]          # each (Ni, 3) f64
    normals: List[np.ndarray]         # each (Ni, 3) f64
    poses: np.ndarray                 # (F, 7) se3 params (initial estimates)
    gt_poses: np.ndarray              # (F, 7) se3 params (ground truth)


def _host_cpu():
    """Context pinning tiny host-side prep math to the local CPU backend.

    In the TPU session every jnp op otherwise dispatches through the
    device tunnel (~25-800 ms per call, tens of seconds per first
    compile) — 18 frames of pose conversions and noise injection cost
    ~74 s that way, ~0.2 s on host CPU."""
    return jax.default_device(jax.devices("cpu")[0])


def _mat_to_se3(mat: np.ndarray) -> np.ndarray:
    # no explicit dtype: stays f64 when x64 is enabled (CPU tests), f32
    # otherwise (TPU) — avoids the noisy truncation warning either way
    with _host_cpu():
        return np.asarray(se3.from_matrix(jnp.asarray(mat)))


def load_raw_frames(dir_path: str, *, limit: int = 40, step: int = 2,
                    fake: bool = False, sigma: float = 0.02,
                    sigmat: float = 0.01, seed: int = 0,
                    relocalize_with_gt: bool = False) -> RawFrames:
    """Load a frame directory with the reference's initialization semantics.

    ``relocalize_with_gt`` (dinosaur-style datasets): the shipped dinosaur
    clouds are ALREADY globally registered (identity poses align
    consecutive scans to median NN distance ~1 unit, while applying the
    pose/groundtruth files scatters them by ~15-100 units — they are the
    original SfM camera matrices, not registering transforms). To obtain a
    well-posed multiview problem where the groundtruth files are, by
    construction, the registering poses, each cloud is re-expressed in its
    own camera frame: ``local_i = gt_i^-1(cloud_i)``. The pose files then
    act as realistic noisy initial estimates (~1.6 deg rotation offset).
    The reference loads these files as-is (main_multiview.cpp:74-76) and
    would scatter the shipped clouds — a latent data-semantics quirk it
    never hits because its default dir is the Bunny
    (main_multiview.cpp:39-40, dinosaur commented out)."""
    clouds = io.discover(dir_path, "cloud")
    poses_f = io.discover(dir_path, "pose")
    gt_f = io.discover(dir_path, "groundtruth")
    if not clouds:
        raise FileNotFoundError(f"no cloud* files in {dir_path}")

    pts_list, nor_list, poses, gts = [], [], [], []
    have_gt = len(gt_f) == len(clouds)
    count = 0
    with _host_cpu():
        key = jax.random.PRNGKey(seed)
        for i in range(0, len(clouds), step):
            if count >= limit:
                break
            j = 0 if fake else i
            p, n = io.load_xyz(clouds[j])
            pts_list.append(p)
            nor_list.append(n)
            if have_gt:
                pose_i = _mat_to_se3(io.load_matrix4d(poses_f[i]))
                gt_i = _mat_to_se3(io.load_matrix4d(gt_f[i]))
                if relocalize_with_gt:
                    inv = se3.inverse(jnp.asarray(gt_i))
                    pts_list[-1] = np.asarray(
                        se3.apply(inv, jnp.asarray(pts_list[-1])))
                    nor_list[-1] = np.asarray(
                        se3.rotate_only(inv, jnp.asarray(nor_list[-1])))
                poses.append(pose_i)
                gts.append(gt_i)
            else:
                gt = _mat_to_se3(io.load_matrix4d(poses_f[i]))
                gts.append(gt)
                if i == 0:
                    poses.append(gt)
                else:
                    key, sub = jax.random.split(key)
                    poses.append(np.asarray(se3.add_noise(
                        sub, jnp.asarray(gt), sigma, sigmat)))
            count += 1
    return RawFrames(pts_list, nor_list,
                     np.stack(poses), np.stack(gts))


def pad_clouds(points: List[np.ndarray], normals: List[np.ndarray],
               pad_multiple: int = 256, pad_value: float = 1e6,
               n_points: Optional[int] = None):
    """Pad ragged clouds to a fixed (F, N, 3) + validity mask (F, N).

    Padding coordinates are pushed far away (``pad_value``) so that even an
    unmasked NN query cannot select them; the mask is still the source of
    truth for every reduction.
    """
    F = len(points)
    nmax = max(p.shape[0] for p in points)
    if n_points is not None:
        nmax = max(nmax, n_points)
    N = -(-nmax // pad_multiple) * pad_multiple
    pts = np.full((F, N, 3), pad_value, dtype=np.float64)
    nor = np.zeros((F, N, 3), dtype=np.float64)
    nor[..., 2] = -1.0
    mask = np.zeros((F, N), dtype=bool)
    for f, (p, n) in enumerate(zip(points, normals)):
        k = p.shape[0]
        pts[f, :k] = p
        nor[f, :k] = n
        mask[f, :k] = True
    return pts, nor, mask


def load_single_cloud(path: str = None):
    """Load one cloud (default: Bunny frame 0) -> (points, normals) numpy.

    The pairwise benchmark fixture (main_pairwise.cpp:34).
    """
    path = path or f"{BUNNY_DIR}/cloudXYZ_0.xyz"
    return io.load_xyz(path)


def make_scene_frames(path: str = None, num_frames: int = 8,
                      overlap: float = 0.5, sigma: float = 0.02,
                      sigmat: float = 0.01, seed: int = 0,
                      replicate: int = 1) -> RawFrames:
    """Synthetic multiview problem from a single scene cloud.

    The 'large synthetic scene sharded across hosts' configuration
    (BASELINE.json configs[4]): the scene (default: the reference's
    samples/scene.xyz, 5.4k points) is cut into ``num_frames`` overlapping
    slabs along its longest axis; each slab becomes a frame stored in its
    own local coordinates (GT pose = slab's global placement), and the
    initial estimates are GT perturbed with add_noise (frame 0 exact,
    mirroring the Bunny initialization, main_multiview.cpp:78-85).
    ``replicate`` tiles the cloud with jittered copies to scale the
    problem up for multi-chip benchmarks.
    """
    path = path or SCENE_XYZ
    pts, nor = io.load_xyz(path)
    if replicate > 1:
        # tile copies in space along the longest axis (constant point
        # density — jittering copies in place would just multiply every
        # grid-hash bucket's occupancy) with a small jitter so replicas
        # aren't bitwise duplicates
        rng = np.random.default_rng(seed + 1)
        ax = int(np.argmax(pts.max(0) - pts.min(0)))
        extent = float(pts[:, ax].max() - pts[:, ax].min()) * 1.02
        copies = []
        for c in range(replicate):
            shift = np.zeros(3)
            shift[ax] = c * extent
            copies.append(pts + shift
                          + rng.normal(scale=1e-4, size=(1, 3)))
        pts = np.concatenate(copies, axis=0)
        nor = np.tile(nor, (replicate, 1))
    axis = int(np.argmax(pts.max(0) - pts.min(0)))
    order = np.argsort(pts[:, axis], kind="stable")
    pts, nor = pts[order], nor[order]
    n = pts.shape[0]
    # slab windows with the requested fractional overlap
    width = int(n / (num_frames - (num_frames - 1) * overlap)) \
        if num_frames > 1 else n
    stride = max(1, int(width * (1 - overlap)))
    with _host_cpu():
        return _make_scene_slabs(pts, nor, num_frames, width, stride, n,
                                 sigma, sigmat, seed)


def _make_scene_slabs(pts, nor, num_frames, width, stride, n, sigma,
                      sigmat, seed):
    key = jax.random.PRNGKey(seed)
    pts_list, nor_list, poses, gts = [], [], [], []
    for f in range(num_frames):
        lo = min(f * stride, max(0, n - width))
        sl = slice(lo, min(lo + width, n))
        key, kpose, knoise = jax.random.split(key, 3)
        # camera-like GT trajectory: translation tracks the slab centre so
        # the kNN pose graph (translation distance) recovers slab
        # adjacency, exactly as real scan trajectories do; rotation is a
        # small random attitude change per frame.
        centre = pts[sl].mean(0)
        rot = 0.1 * jax.random.normal(kpose, (3,), jnp.float64)
        tau = jnp.concatenate([jnp.asarray(centre), rot])
        gt = np.asarray(se3.exp(tau))
        # frame cloud in local coordinates: g^-1(scene points)
        inv = se3.inverse(jnp.asarray(gt))
        pts_list.append(np.asarray(se3.apply(inv, jnp.asarray(pts[sl]))))
        nor_list.append(np.asarray(se3.rotate_only(inv,
                                                   jnp.asarray(nor[sl]))))
        gts.append(gt)
        if f == 0:
            poses.append(gt)
        else:
            poses.append(np.asarray(se3.add_noise(
                knoise, jnp.asarray(gt), sigma, sigmat)))
    return RawFrames(pts_list, nor_list, np.stack(poses), np.stack(gts))


def synthetic_pairwise_pose(dtype=jnp.float64) -> jnp.ndarray:
    """The exact synthetic GT pose of main_pairwise.cpp:44-54.

    q = AngleAxis(pi/4, X) * AngleAxis(1, Y) * AngleAxis(-0.2, Z),
    t = (0.01, -0.01, -0.005).
    """
    from ..ops import quat

    qx = quat.from_axis_angle(jnp.asarray([np.pi / 4, 0, 0], dtype))
    qy = quat.from_axis_angle(jnp.asarray([0.0, 1.0, 0.0], dtype))
    qz = quat.from_axis_angle(jnp.asarray([0.0, 0.0, -0.2], dtype))
    q = quat.multiply(quat.multiply(qx, qy), qz)
    t = jnp.asarray([0.01, -0.01, -0.005], dtype)
    return jnp.concatenate([q, t])
