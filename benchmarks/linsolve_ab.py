"""Linear-solver A/B at frame scale: dense Cholesky vs explicit Schur vs
block-Jacobi PCG vs ITERATIVE_SCHUR (PCG on the reduced system).

The reference configures ITERATIVE_SCHUR + SCHUR_JACOBI on Windows
(reference: src/internal/icp-ceres.cpp:76-80); VERDICT r4 #7 asks for the
measured crossover on TPU. The system is the multiview normal-equations
shape: damped SPD [6F, 6F] with knn=2 ring block sparsity; each solver
gets K solves chained in one jitted fori_loop (the bench.py slope
discipline — cancels the RPC floor).

Run: python benchmarks/linsolve_ab.py [--frames 64 256 1024] [--platform cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ring_system(F, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    H = np.zeros((F, 6, F, 6), np.float32)
    for i in range(F):
        A = rng.normal(size=(8, 6)).astype(np.float32)
        H[i, :, i, :] += A.T @ A + 6 * np.eye(6, dtype=np.float32)
        j = (i + 1) % F
        B = rng.normal(size=(6, 6)).astype(np.float32) * 0.3
        H[i, :, j, :] += B
        H[j, :, i, :] += B.T
    Hm = H.reshape(6 * F, 6 * F)
    Hm = 0.5 * (Hm + Hm.T)
    g = rng.normal(size=6 * F).astype(np.float32)
    return Hm, g


def edges_ring(F):
    import numpy as np

    i = np.arange(F)
    return np.stack([np.concatenate([i, i]),
                     np.concatenate([(i + 1) % F, (i - 1) % F])], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="+",
                    default=[64, 256, 1024])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--pcg-tol", type=float, default=1e-6)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mv_lm_icp_tpu.solvers import pcg as pcg_mod
    from mv_lm_icp_tpu.solvers import schur as schur_mod

    print(f"devices: {jax.devices()}  pcg tol {args.pcg_tol}")

    def chain(solve, H, g, k):
        @jax.jit
        def run():
            def body(i, acc):
                d = solve(H + (1e-6 * i) * jnp.eye(H.shape[0], dtype=H.dtype),
                          g)
                return acc + d[0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    def slope(solve, H, g, k1=2, k2=10):
        f1, f2 = chain(solve, H, g, k1), chain(solve, H, g, k2)
        float(f1())
        float(f2())
        t1 = min(timed(f1) for _ in range(3))
        t2 = min(timed(f2) for _ in range(3))
        return max((t2 - t1) / (k2 - k1), 0.0)

    def timed(f):
        t0 = time.perf_counter()
        float(f())
        return time.perf_counter() - t0

    def dense(H, g):
        L = jnp.linalg.cholesky(H)
        return jax.scipy.linalg.cho_solve((L, True), -g)

    print(f"{'F':>6} {'dense chol':>12} {'schur':>12} {'pcg':>12} "
          f"{'iter-schur':>12} {'pcg err':>10}")
    for F in args.frames:
        Hm, g = ring_system(F)
        H = jnp.asarray(Hm)
        gj = jnp.asarray(g)
        elim = schur_mod.independent_set(edges_ring(F), F)
        solvers = {
            "dense": dense,
            "schur": schur_mod.make_schur_solver(elim),
            "pcg": pcg_mod.make_pcg_solver(tol=args.pcg_tol),
            "iter-schur": pcg_mod.make_pcg_solver(tol=args.pcg_tol,
                                                  elim=elim),
        }
        times = {}
        for name, s in solvers.items():
            # chain deltas must clear the tunnel's ~ms jitter: small
            # systems solve in ~0.1 ms, so chain hundreds of them
            k1, k2 = (2, 10) if F >= 1024 else (8, 136)
            times[name] = slope(s, H, gj, k1=k1, k2=k2)
        want = np.asarray(dense(H, gj))
        got = np.asarray(jax.jit(solvers["pcg"])(H, gj))
        err = float(np.abs(got - want).max() / np.abs(want).max())
        print(f"{F:>6} {times['dense']*1e3:>10.3f}ms "
              f"{times['schur']*1e3:>10.3f}ms {times['pcg']*1e3:>10.3f}ms "
              f"{times['iter-schur']*1e3:>10.3f}ms {err:>10.2e}")


if __name__ == "__main__":
    main()
