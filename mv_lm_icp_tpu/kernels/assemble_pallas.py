"""Pallas TPU kernel: fused normal-equation assembly for the se3 multiview
systems.

The hot loop of every joint solve is Hessian assembly: evaluate the
residual/Jacobians per correspondence and contract them into per-edge 6x6
blocks (the reference evaluates the same quantities with Ceres jets per
residual block, reference: src/internal/icp-ceres.cpp:270-292 and the
functors in include/icp-ceres.h:236-316). The XLA path
(`ops/residuals.p2pl_system_terms`) stacks A = [J_h | J_k | r] as an (N, 13)
array in HBM and contracts A^T diag(w) A — measured at ~14% of the HBM
ceiling because the stacked system matrix plus inputs stream ~85 MB per
evaluation (BENCHMARKS.md roofline). This kernel never materializes A:
it streams the packed inputs (p, q, n, mask — 10 f32 planes) exactly once,
computes the residual and the 13 Jacobian components in registers, and
accumulates the symmetric 13x13 Gram matrix

    M = sum_n w_n a_n a_n^T,      a = [J_h(6) | J_k(6) | r]

in a VMEM scratch block, one program per (edge, point-tile). Everything
downstream (gradients g = M[:12, 12], blocks H_** = M[:12, :12], cost) is a
cheap unpack in XLA. Traffic drops to the irreducible ~24 MB of inputs.

Modes (static):
- ``lm_p2pl``  — scalar point-to-plane residual r = d . (R_k n), IRLS
  weight from the robust loss: ONE a-vector per point (the LM multiview
  default, solvers/multiview.py).
- ``lm_p2pt``  — 3-vector point-to-point residual: THREE a-vectors per
  point sharing the loss weight of s = |r|^2.
- ``gicp_p2pl`` — g2o GICP information W = nn^T + e(I - nn^T)
  (icp-g2o.cpp:119-129): the three cartesian rows with weight e plus the
  normal-projected row with weight (1 - e); cost = 0.5 sum r^T W r falls
  out of M[12, 12].
- ``gicp_p2pt`` — identity information: the three cartesian rows.

Losses (static, Ceres semantics — ops/robust.py): trivial / soft_l1 /
soft_l1_norm, evaluated per point inside the kernel from the per-edge
robust scale.

Exact parity with the einsum path (same summands, tile-blocked f32
accumulation order) is tested in tests/test_assemble_pallas.py; on CPU the
kernel runs in interpreter mode.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed per-edge scalar layout (f32, SMEM): R_h row-major, t_h, R_k
# row-major, t_k, robust scale, GICP tangent precision e
_RH, _TH, _RK, _TK, _SCALE, _EPREC = 0, 9, 12, 21, 24, 25
_NSCALARS = 28          # padded

_I0 = np.int32(0)   # x64-safe index-map zero (literal 0 traces as i64)
_TRI = np.stack(np.triu_indices(13), axis=1)      # (91, 2) upper-tri pairs
_NROWS = 92                                        # 91 tri + 1 cost row
_ROWS_PAD = 96                                     # sublane-aligned

# gather map: flat (E, 91) upper-tri sums -> dense symmetric (E, 13, 13)
_UNPACK = np.zeros((13, 13), np.int32)
_UNPACK[_TRI[:, 0], _TRI[:, 1]] = np.arange(91)
_UNPACK[_TRI[:, 1], _TRI[:, 0]] = _UNPACK[_TRI[:, 0], _TRI[:, 1]]


def resolve_assembly(assembly: str, param_name: str, use_autodiff: bool,
                     dtype) -> bool:
    """Whether a solver should take the fused kernel path.

    The kernel covers the se3 tangent space in f32 with analytic
    Jacobians (the flagship configuration); everything else keeps the
    einsum path. ``"auto"`` additionally requires a real TPU backend —
    off-TPU the kernel would run in interpreter mode, far slower than
    XLA's einsums (the CPU test suite exercises the kernel directly in
    tests/test_assemble_pallas.py instead).
    """
    eligible = (param_name == "se3" and not use_autodiff
                and jnp.dtype(dtype) == jnp.float32)
    if assembly == "einsum":
        return False
    if assembly == "fused":
        if not eligible:
            raise ValueError(
                "assembly='fused' needs param_name='se3', analytic "
                "Jacobians and float32 inputs; got "
                f"({param_name!r}, autodiff={use_autodiff}, {dtype})")
        return True
    if assembly == "auto":
        return eligible and jax.devices()[0].platform == "tpu"
    raise ValueError(f"unknown assembly mode {assembly!r}")


class PackedEdges(NamedTuple):
    """Per-edge clouds in kernel layout: (E, 10, R, 128) f32 planes
    [px py pz qx qy qz nx ny nz mask], point axis folded to (R, 128)."""
    data: jnp.ndarray
    n_points: int


def pack_edges(p: jnp.ndarray, q: jnp.ndarray, n: jnp.ndarray,
               mask: jnp.ndarray, tr: int = 32) -> PackedEdges:
    """Lay out gathered per-edge arrays once per solve (they are
    pose-invariant across LM iterations; the transpose cost is paid once,
    the kernel then streams lane-major planes).

    Args: p/q/n (E, N, 3); mask (E, N) validity (0 rows contribute
    nothing). ``tr`` is the kernel's point-tile height in 128-lane rows;
    the point axis pads to a multiple of tr*128.
    """
    E, N = p.shape[0], p.shape[1]
    rows = -(-N // 128)
    rows = -(-rows // tr) * tr
    npad = rows * 128

    def plane(x):
        x = x.astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (0, npad - N)))
        return x.reshape(E, rows, 128)

    planes = [plane(p[..., i]) for i in range(3)]
    planes += [plane(q[..., i]) for i in range(3)]
    planes += [plane(n[..., i]) for i in range(3)]
    planes.append(plane(mask.astype(jnp.float32)))
    return PackedEdges(data=jnp.stack(planes, axis=1), n_points=N)


def _loss_wrho(s, scale, loss: str):
    """(w, rho) of the robust loss, per point (ops/robust.py formulas)."""
    if loss == "trivial":
        return jnp.ones_like(s), s
    b = scale * scale
    if loss == "soft_l1":
        b = jnp.maximum(b, jnp.finfo(jnp.float32).tiny)
        root = jnp.sqrt(1.0 + s / b)
        return 1.0 / root, 2.0 * b * (root - 1.0)
    if loss == "soft_l1_norm":
        b = jnp.maximum(b, jnp.finfo(jnp.float32).eps)
        root = jnp.sqrt(1.0 + s / b)
        return (1.0 / b) / root, 2.0 * (root - 1.0)
    raise ValueError(f"unknown loss {loss!r}")


def _kernel(sc_ref, data_ref, out_ref, *, mode: str, loss: str):
    """One (edge, point-tile) program: accumulate the 13x13 Gram rows.

    sc_ref: (1, 1, _NSCALARS) SMEM per-edge scalars (the leading unit
    axis keeps the block equal to the trailing array dims — Mosaic
    rejects a (1, S) block of an (E, S) array); data_ref: (1, 10, TR,
    128) input planes; out_ref: (1, _ROWS_PAD, 128) accumulator — row
    tri(j,k) holds the lane-partial sums of M[j,k], row 91 the cost term.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    d = data_ref[0]
    px, py, pz = d[0], d[1], d[2]
    qx, qy, qz = d[3], d[4], d[5]
    nx, ny, nz = d[6], d[7], d[8]
    m = d[9]

    s = [sc_ref[0, 0, i] for i in range(_NSCALARS)]
    h = s[_RH:_RH + 9]          # R_h row-major
    th = s[_TH:_TH + 3]
    k = s[_RK:_RK + 9]
    tk = s[_TK:_TK + 3]
    scale = s[_SCALE]
    eprec = s[_EPREC]

    def rot(R, x, y, z):
        return (R[0] * x + R[1] * y + R[2] * z,
                R[3] * x + R[4] * y + R[5] * z,
                R[6] * x + R[7] * y + R[8] * z)

    def rot_t(R, x, y, z):      # R^T v
        return (R[0] * x + R[3] * y + R[6] * z,
                R[1] * x + R[4] * y + R[7] * z,
                R[2] * x + R[5] * y + R[8] * z)

    def cross(ax, ay, az, bx, by, bz):
        return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

    # global-frame difference d = (R_h p + t_h) - (R_k q + t_k)
    gx, gy, gz = rot(h, px, py, pz)
    bx, by, bz = rot(k, qx, qy, qz)
    dx = gx + th[0] - (bx + tk[0])
    dy = gy + th[1] - (by + tk[1])
    dz = gz + th[2] - (bz + tk[2])

    rows = []   # (weight, a[13]) virtual residual rows
    if mode in ("lm_p2pl", "gicp_p2pl"):
        # rotated dst normal, the p2pl a-vector (ops/residuals.
        # _se3_p2pl_fast): J_h = [u, p x u], J_k = [-n, n x w2 - q x n].
        # The n x w2 piece is the rotated-normal derivative
        # d . d(R_k n)/drot_k of the p2pl ENERGY (icp-ceres.h:109-141);
        # GICP differentiates r^T W r with W held constant (g2o treats
        # the information matrix as a measurement), so its normal row is
        # the projected p2pt Jacobian — without that term.
        ngx, ngy, ngz = rot(k, nx, ny, nz)
        rn = dx * ngx + dy * ngy + dz * ngz
        ux, uy, uz = rot_t(h, ngx, ngy, ngz)          # R_h^T ng
        c1x, c1y, c1z = cross(px, py, pz, ux, uy, uz)
        c3x, c3y, c3z = cross(qx, qy, qz, nx, ny, nz)
        if mode == "lm_p2pl":
            w2x, w2y, w2z = rot_t(k, dx, dy, dz)      # R_k^T d
            c2x, c2y, c2z = cross(nx, ny, nz, w2x, w2y, w2z)
        else:
            c2x = c2y = c2z = 0.0
        a_n = (ux, uy, uz, c1x, c1y, c1z,
               -nx, -ny, -nz, c2x - c3x, c2y - c3y, c2z - c3z, rn)
    if mode != "lm_p2pl":
        # cartesian rows of [J_h | J_k | r] for the p2pt residual:
        # J_h = [R_h | -R_h hat(p)], J_k = [-R_k | R_k hat(q)]
        # (ops/residuals.residuals_and_jacobians, se3 branch).
        # (R hat(v))[c, :] columns expand to 2-term differences.
        def jrot(R, x, y, z, c, sign):
            # sign * -(R hat(v))[c, :] given row c of R
            r0, r1, r2 = R[3 * c], R[3 * c + 1], R[3 * c + 2]
            return (sign * (r2 * y - r1 * z),
                    sign * (r0 * z - r2 * x),
                    sign * (r1 * x - r0 * y))

        cart = []
        rvec = (dx, dy, dz)
        for c in range(3):
            rh_row = (h[3 * c], h[3 * c + 1], h[3 * c + 2])
            rk_row = (k[3 * c], k[3 * c + 1], k[3 * c + 2])
            cart.append(rh_row + jrot(h, px, py, pz, c, 1.0)
                        + tuple(-v for v in rk_row)
                        + jrot(k, qx, qy, qz, c, -1.0) + (rvec[c],))

    if mode == "lm_p2pl":
        w, rho = _loss_wrho(rn * rn, scale, loss)
        rows.append((w * m, a_n))
        costrow = rho * m
    elif mode == "lm_p2pt":
        s2 = dx * dx + dy * dy + dz * dz
        w, rho = _loss_wrho(s2, scale, loss)
        wm = w * m
        rows += [(wm, a) for a in cart]
        costrow = rho * m
    elif mode == "gicp_p2pl":
        em = eprec * m
        rows += [(em, a) for a in cart]
        rows.append(((1.0 - eprec) * m, a_n))
        # chi = r^T W r accumulates as sum_v w_v a_v[12]^2 = M[12,12];
        # costrow mirrors it so the unpack is uniform across modes
        costrow = em * (dx * dx + dy * dy + dz * dz) \
            + (1.0 - eprec) * m * (rn * rn)
    elif mode == "gicp_p2pt":
        rows += [(m, a) for a in cart]
        costrow = m * (dx * dx + dy * dy + dz * dz)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    # accumulate the upper triangle: M[j, k] += sum_sublanes w a_j a_k
    acc = [None] * 91
    for w, a in rows:
        wa = [w * a[j] for j in range(13)]
        for t_idx, (j, kk) in enumerate(_TRI):
            part = jnp.sum(wa[j] * a[kk], axis=0, keepdims=True)
            acc[t_idx] = part if acc[t_idx] is None else acc[t_idx] + part
    for t_idx in range(91):
        out_ref[0, t_idx:t_idx + 1, :] += acc[t_idx]
    out_ref[0, 91:92, :] += jnp.sum(costrow, axis=0, keepdims=True)


def pack_scalars(R_h, t_h, R_k, t_k, scale=None, eprec=0.0):
    """Per-edge scalar block (E, 1, _NSCALARS) f32 from batched poses."""
    E = R_h.shape[0]
    f32 = jnp.float32
    if scale is None:
        scale = jnp.zeros((E,), f32)
    eprec = jnp.broadcast_to(jnp.asarray(eprec, f32), (E,))
    return jnp.concatenate([
        R_h.reshape(E, 9).astype(f32), t_h.astype(f32),
        R_k.reshape(E, 9).astype(f32), t_k.astype(f32),
        scale.astype(f32)[:, None], eprec[:, None],
        jnp.zeros((E, _NSCALARS - 26), f32),
    ], axis=1)[:, None, :]


@functools.partial(jax.jit, static_argnames=("mode", "loss", "tr",
                                             "interpret"))
def system_terms(packed: PackedEdges, scalars: jnp.ndarray, *,
                 mode: str = "lm_p2pl", loss: str = "soft_l1",
                 tr: int = 32, interpret: bool | None = None):
    """Fused per-edge normal-equation terms.

    Args: ``packed`` from :func:`pack_edges` (same ``tr``); ``scalars``
    (E, _NSCALARS) from :func:`pack_scalars` — recomputed every LM
    iteration from the current poses (cheap), while ``packed`` streams
    unchanged.

    Returns (cost_e (E,), g_h (E, 6), g_k (E, 6), H_hh, H_hk, H_kk
    (E, 6, 6)) — the same tuple as the edge terms in
    solvers/multiview.make_multiview_system / solvers/posegraph._gicp_terms.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    E, _, rows, _ = packed.data.shape
    assert rows % tr == 0, (rows, tr)
    grid = (E, rows // tr)
    out = pl.pallas_call(
        functools.partial(_kernel, mode=mode, loss=loss),
        grid=grid,
        # index maps return np.int32 zeros: under jax_enable_x64 a
        # literal 0 traces as i64, which Mosaic cannot legalize
        in_specs=[
            pl.BlockSpec((1, 1, _NSCALARS),
                         lambda e, t: (e, _I0, _I0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 10, tr, 128),
                         lambda e, t: (e, _I0, t, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROWS_PAD, 128),
                               lambda e, t: (e, _I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, _ROWS_PAD, 128), jnp.float32),
        interpret=interpret,
    )(scalars, packed.data)
    sums = jnp.sum(out[:, :_NROWS, :], axis=-1)        # (E, 92)
    M = sums[:, _UNPACK.reshape(-1)].reshape(E, 13, 13)
    cost_e = 0.5 * sums[:, 91]
    return (cost_e, M[:, :6, 12], M[:, 6:12, 12],
            M[:, :6, :6], M[:, :6, 6:12], M[:, 6:12, 6:12])
