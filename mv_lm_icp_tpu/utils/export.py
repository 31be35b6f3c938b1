"""Host-side scene export — the headless replacement for the reference's
OpenGL viewer (reference: src/internal/Visualize.cpp; SURVEY §2.1 #11 marks
it 'optional host viz' for the TPU build).

Exports the current registration state as standard point-cloud files any
desktop viewer (MeshLab/CloudCompare) opens:

- per-frame or merged .xyz (points + normals, the reference's own format)
- merged .ply with per-frame colors (estimate red-ish ramp, GT green —
  matching the viewer's estimated-red / GT-green convention,
  Visualize.cpp:243-245)
"""
from __future__ import annotations

import numpy as np

from ..ops import se3


def _global_points(fs, use_gt=False):
    import jax

    poses = fs.gt_poses if use_gt else fs.poses
    pts = jax.vmap(se3.apply)(poses, fs.points)
    nor = jax.vmap(se3.rotate_only)(poses, fs.normals)
    return np.asarray(pts), np.asarray(nor), np.asarray(fs.valid)


def write_xyz(path: str, fs, use_gt: bool = False):
    """Merged global cloud in the reference's 6-column .xyz format."""
    pts, nor, valid = _global_points(fs, use_gt)
    rows = np.concatenate([pts[valid], nor[valid]], axis=1)
    np.savetxt(path, rows, fmt="%.6f")
    return rows.shape[0]


def write_pose_frusta_ply(path: str, fs, scale: float = 0.02):
    """Camera frusta as PLY line edges: estimates red, ground truth green.

    The headless equivalent of the viewer's pose rendering
    (Visualize.cpp:243-245 draws GT green next to estimated red;
    include/frustum.h builds the pyramid geometry).
    """
    import jax

    def frustum_vertices(poses):
        # apex + 4 image-plane corners, in each camera's local frame
        local = np.array([
            [0, 0, 0],
            [-1, -0.75, 1.5], [1, -0.75, 1.5],
            [1, 0.75, 1.5], [-1, 0.75, 1.5],
        ]) * scale
        import jax.numpy as jnp

        return np.asarray(jax.vmap(
            lambda x: se3.apply(x, jnp.asarray(local)))(poses))

    est = frustum_vertices(fs.poses)
    gt = frustum_vertices(fs.gt_poses)
    F = est.shape[0]
    verts, colors, edges = [], [], []
    eidx = [(0, 1), (0, 2), (0, 3), (0, 4),
            (1, 2), (2, 3), (3, 4), (4, 1)]
    for group, color in ((est, (255, 0, 0)), (gt, (0, 255, 0))):
        for f in range(F):
            base = len(verts)
            verts.extend(group[f])
            colors.extend([color] * 5)
            edges.extend([(base + a, base + b) for a, b in eidx])
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n"
                 f"element vertex {len(verts)}\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "property uchar red\nproperty uchar green\n"
                 "property uchar blue\n"
                 f"element edge {len(edges)}\n"
                 "property int vertex1\nproperty int vertex2\n"
                 "end_header\n")
        for (x, y, z), (r, g, b) in zip(verts, colors):
            fh.write(f"{x:.6f} {y:.6f} {z:.6f} {r} {g} {b}\n")
        for a, b in edges:
            fh.write(f"{a} {b}\n")
    return len(verts)


def write_ply(path: str, fs, include_gt: bool = False):
    """Colored merged cloud: frames ramp red->blue; GT overlay green."""
    pts, _, valid = _global_points(fs, use_gt=False)
    F = pts.shape[0]
    chunks = []
    colors = []
    for f in range(F):
        p = pts[f][valid[f]]
        chunks.append(p)
        c = np.zeros((p.shape[0], 3), np.uint8)
        c[:, 0] = int(255 * (1 - f / max(F - 1, 1)))
        c[:, 2] = int(255 * (f / max(F - 1, 1)))
        colors.append(c)
    if include_gt:
        gpts, _, gvalid = _global_points(fs, use_gt=True)
        for f in range(F):
            p = gpts[f][gvalid[f]]
            chunks.append(p)
            c = np.zeros((p.shape[0], 3), np.uint8)
            c[:, 1] = 255
            colors.append(c)
    xyz = np.concatenate(chunks, axis=0)
    rgb = np.concatenate(colors, axis=0)
    with open(path, "wb") as fh:
        header = (
            "ply\nformat ascii 1.0\n"
            f"element vertex {xyz.shape[0]}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        fh.write(header.encode())
        for (x, y, z), (r, g, b) in zip(xyz, rgb):
            fh.write(f"{x:.6f} {y:.6f} {z:.6f} {r} {g} {b}\n".encode())
    return xyz.shape[0]
