"""Profiling/tracing hooks.

Replaces the reference's observability tooling (CPUTimer tables + Ceres
FullReport + the viewer's FPS counter, SURVEY §5) with the JAX-native
equivalents: ``jax.profiler`` trace capture for TensorBoard/Perfetto and
named annotation scopes around pipeline phases.
"""
from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mvicp_trace", enabled: bool = True):
    """Capture a device trace around a block:

        with tracing.trace("/tmp/t"):
            run_icp(...)

    Open the result with TensorBoard or ui.perfetto.dev.
    """
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def lm_report(stats, label: str = "LM") -> str:
    """Compact solver report — the stand-in for Ceres FullReport()
    (icp-ceres.cpp:94), including the termination reason."""
    from ..solvers.lm import reason_str

    return (f"{label}: iterations={int(stats.iterations)} "
            f"final_cost={float(stats.final_cost):.6g} "
            f"|grad|_max={float(stats.grad_max):.3g} "
            f"converged={bool(stats.converged)} "
            f"termination={reason_str(stats)}")
