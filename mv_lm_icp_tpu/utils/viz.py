"""Headless scene renderer — PNG snapshots of the registration state.

Replaces the reference's interactive OpenGL viewer (reference:
src/internal/Visualize.cpp + include/frustum.h; SURVEY §2.1 #11) with
matplotlib renders of the same draw set, keyed by the same toggles the
viewer binds to keys (Visualize.cpp:627-688):

- per-frame point clouds under their CURRENT poses, one color per frame
  (drawFrame, Visualize.cpp:238-278),
- camera frusta: ground truth green, estimates red (Visualize.cpp:243-245,
  frustum wireframe from frustum.h:9-101),
- pose-graph edges between camera centres with per-edge weight labels
  (drawEdges, Visualize.cpp:412-481),
- optional normals as short segments (drawNormals, Visualize.cpp:219-236).

Where the viewer's spin()/spinToggle() re-render per ICP round
(main_multiview.cpp:168), :func:`snapshot_callback` plugs into
``pipeline.run_icp(callback=...)`` and writes one PNG per round.

Everything is host-side numpy/matplotlib — none of this touches the
device path. matplotlib is imported lazily so the core library never
depends on it.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..ops import se3


def _require_mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _frustum_segments(pose7: np.ndarray, scale: float):
    """Wireframe camera frustum for one pose (frustum.h:9-101): apex at the
    camera centre, 4 rays to a rectangle at depth ``scale`` along +z.

    Plain numpy — one of these runs per frame per snapshot, and tiny
    device dispatches cost ~25-800 ms each through the TPU tunnel."""
    w, h, d = 0.8 * scale, 0.6 * scale, 1.0 * scale
    corners = np.asarray(
        [[0, 0, 0], [-w, -h, d], [w, -h, d], [w, h, d], [-w, h, d]],
        np.float64)
    q, t = np.asarray(pose7[:4], np.float64), np.asarray(pose7[4:7],
                                                         np.float64)
    x, y, z, w4 = q
    R = np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w4), 2 * (x * z + y * w4)],
        [2 * (x * y + z * w4), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w4)],
        [2 * (x * z - y * w4), 2 * (y * z + x * w4), 1 - 2 * (x * x + y * y)],
    ])
    pts = corners @ R.T + t
    apex, quad = pts[0], pts[1:]
    segs = [(apex, c) for c in quad]
    segs += [(quad[i], quad[(i + 1) % 4]) for i in range(4)]
    return segs


def render_scene(fs, edges=None, weights=None, *, path: str,
                 corr=None, corr_edge: Optional[int] = None,
                 max_corr_lines: int = 200,
                 max_points_per_frame: int = 2000, show_gt: bool = True,
                 show_normals: bool = False, frustum_scale: float = 0.02,
                 elev: float = -70.0, azim: float = -90.0,
                 title: Optional[str] = None, dpi: int = 120) -> str:
    """Render the FrameSet to a PNG. Returns ``path``.

    Args:
      fs: FrameSet (current poses are drawn; gt_poses as green frusta).
      edges: optional [E, 2] pose-graph edges (drawn between camera
        centres, as the viewer's drawEdges).
      weights: optional [E] per-edge labels (the viewer draws edge
        weights when toggled, Visualize.cpp:447-473).
      corr / corr_edge: optional Correspondences + selected edge index —
        draws up to ``max_corr_lines`` sampled correspondence lines from
        the edge's source points to their matched destination points,
        both under CURRENT poses (the viewer's selected-edge
        correspondence display, Visualize.cpp:412-481; keyboard edge
        selection at :627-688). Lines for a well-registered edge shrink
        to dots; a bad edge shows as a comb of long strokes.
      max_points_per_frame: subsample cap per frame for plot speed.
      show_normals: draw a sparse normal quiver (key 'n' in the viewer).
    """
    plt = _require_mpl()
    import jax

    # pin the transform math to host CPU: in a TPU session these little
    # dispatches otherwise go through the device tunnel per snapshot
    with jax.default_device(jax.devices("cpu")[0]):
        pts_g = np.asarray(jax.vmap(se3.apply)(fs.poses, fs.points))
        nor_g = (np.asarray(jax.vmap(se3.rotate_only)(fs.poses, fs.normals))
                 if show_normals else None)
    valid = np.asarray(fs.valid)
    poses = np.asarray(fs.poses)
    gts = np.asarray(fs.gt_poses)
    F = pts_g.shape[0]

    fig = plt.figure(figsize=(9, 9))
    ax = fig.add_subplot(111, projection="3d")
    cmap = plt.colormaps["turbo"]
    for f in range(F):
        p = pts_g[f][valid[f]]
        if p.shape[0] > max_points_per_frame:
            sel = np.linspace(0, p.shape[0] - 1, max_points_per_frame,
                              dtype=np.int64)
            p = p[sel]
        ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=0.3,
                   color=cmap(f / max(F - 1, 1)), depthshade=False)
        if show_normals:
            q = pts_g[f][valid[f]][::200]
            n = nor_g[f][valid[f]][::200] * frustum_scale
            for a, b in zip(q, q + n):
                ax.plot(*np.stack([a, b]).T, lw=0.3, color="gray")
        for seg in _frustum_segments(poses[f], frustum_scale):
            ax.plot(*np.stack(seg).T, lw=0.8, color="red")
        if show_gt:
            for seg in _frustum_segments(gts[f], frustum_scale):
                ax.plot(*np.stack(seg).T, lw=0.8, color="green")

    if edges is not None:
        e = np.asarray(edges)
        centres = poses[:, 4:7]
        for k in range(e.shape[0]):
            a, b = centres[e[k, 0]], centres[e[k, 1]]
            hot = corr_edge is not None and k == int(corr_edge)
            ax.plot(*np.stack([a, b]).T, lw=1.5 if hot else 0.5,
                    color="magenta" if hot else "black", alpha=0.7)
            if weights is not None:
                mid = 0.5 * (a + b)
                ax.text(mid[0], mid[1], mid[2],
                        f"{float(np.asarray(weights)[k]):.3g}", fontsize=5)

    if corr is not None and corr_edge is not None and edges is not None:
        # selected-edge correspondence lines (Visualize.cpp:412-481):
        # src point (current src pose) -> matched dst point (current dst
        # pose), valid matches only, evenly subsampled
        k = int(corr_edge)
        e = np.asarray(edges)
        src_f, dst_f = int(e[k, 0]), int(e[k, 1])
        nn = np.asarray(corr.nn_idx[k])
        ok = np.asarray(corr.valid[k])
        idx = np.nonzero(ok)[0]
        if idx.size > max_corr_lines:
            idx = idx[np.linspace(0, idx.size - 1, max_corr_lines,
                                  dtype=np.int64)]
        a = pts_g[src_f][idx]
        b = pts_g[dst_f][nn[idx]]
        for pa, pb in zip(a, b):
            ax.plot(*np.stack([pa, pb]).T, lw=0.4, color="magenta",
                    alpha=0.8)

    ax.view_init(elev=elev, azim=azim)
    ax.set_box_aspect((1, 1, 1))
    lo, hi = np.percentile(pts_g[valid], [1, 99], axis=0)
    mid, span = 0.5 * (lo + hi), 0.55 * float((hi - lo).max())
    ax.set_xlim(mid[0] - span, mid[0] + span)
    ax.set_ylim(mid[1] - span, mid[1] + span)
    ax.set_zlim(mid[2] - span, mid[2] + span)
    if title:
        ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return path


def snapshot_callback(out_dir: str, edges=None, **render_kwargs):
    """A ``pipeline.run_icp`` callback writing ``round_NNN.png`` per round
    — the headless equivalent of the viewer's per-round spinToggle(2)
    (main_multiview.cpp:168)."""

    def cb(i, fs, corr, stats):
        render_scene(
            fs, edges=edges,
            weights=None if corr is None else corr.weight,
            path=os.path.join(out_dir, f"round_{i:03d}.png"),
            title=f"round {i}  cost={float(stats.final_cost):.4g}",
            **render_kwargs)

    return cb


def render_turntable(fs, path: str, *, n_views: int = 36,
                     seconds: float = 4.0, elev: float = -70.0,
                     edges=None, weights=None, corr=None,
                     corr_edge=None, show_gt: bool = True,
                     show_normals: bool = False, **render_kwargs) -> str:
    """Animated-GIF turntable of the registration state — the headless
    stand-in for the viewer's interactive orbit (Visualize.cpp:627-757:
    spin()/keyboard navigation around the scene). Renders ``n_views``
    azimuth steps of the same draw set render_scene exposes (clouds,
    red/green frusta, edges + weights, the selected edge's
    correspondence lines, normals) and assembles them with PIL.

    Returns ``path``. Everything is host-side; safe in TPU sessions.
    """
    import tempfile

    from PIL import Image

    frames = []
    with tempfile.TemporaryDirectory() as td:
        for i in range(n_views):
            p = os.path.join(td, f"v{i:03d}.png")
            render_scene(fs, edges=edges, weights=weights, corr=corr,
                         corr_edge=corr_edge, path=p, show_gt=show_gt,
                         show_normals=show_normals, elev=elev,
                         azim=-90.0 + 360.0 * i / n_views,
                         **render_kwargs)
            frames.append(Image.open(p).convert("P"))
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        frames[0].save(path, save_all=True, append_images=frames[1:],
                       duration=int(seconds * 1000 / n_views), loop=0)
    return path
