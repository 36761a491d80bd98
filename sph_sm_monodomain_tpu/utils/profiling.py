"""Profiling helpers: jax.profiler traces + scan-amortized timing.

TPU replacement for the reference's hand-rolled chrono pairs
(SURVEY.md §5 'Tracing / profiling'; SPH_SM_monodomain.cpp:794-824) —
phase-level numbers come from utils/report.profile_phases; this module adds
whole-program traces and honest wall-time measurement utilities.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sphsm_trace"):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_chained(step_fn, state, steps: int = 50, discard: int = 2):
    """Honest per-step wall time: chain `steps` dependent calls (each call's
    input is the previous output, so no caching/dedup can hide work), block
    at the end, discard the first `discard` timings (compile/warmup).

    Returns (seconds_per_step, final_state).
    """
    # warmup/compile
    out = step_fn(state)
    st = out[0] if isinstance(out, tuple) else out
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), st)

    st = state
    t0 = time.time()
    for _ in range(steps):
        out = step_fn(st)
        st = out[0] if isinstance(out, tuple) else out
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), st)
    return (time.time() - t0) / steps, st
