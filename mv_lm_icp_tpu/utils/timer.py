"""Phase wall-clock timing.

Replacement for the reference's CPUTimer (reference: include/CPUTimer.h,
src/internal/CPUTimer.cpp:12-36): tic/toc pairs accumulate named wall-clock
spans; ``print_all_timings`` emits the end-of-run table. ``toc`` optionally
blocks on a jax array so device work is actually included in the span
(the reference is synchronous CPU; we are not).
"""
from __future__ import annotations

import time
from collections import OrderedDict


class Timer:
    def __init__(self):
        self._t0 = None
        self.timings = OrderedDict()

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self, name: str, block_on=None):
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.timings[name] = self.timings.get(name, 0.0) + dt
        return dt

    def print_all_timings(self):
        print("==== Timings (s) ====")
        for name, sec in self.timings.items():
            print(f"  {name:30s} {sec:10.4f}")
        print(f"  {'TOTAL':30s} {sum(self.timings.values()):10.4f}")
