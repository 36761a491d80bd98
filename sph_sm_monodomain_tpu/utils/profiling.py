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


def time_chained(step_fn, state, steps: int = 50):
    """Per-step wall time of `steps` chained dependent calls (each call's
    input is the previous output, so no caching/dedup can hide work),
    ended with an actual VALUE FETCH — on the remote-TPU tunnel
    `block_until_ready` does not reliably synchronize (DEVELOPMENT.md
    'Benchmarking on the remote TPU'), only a fetch does.

    Caveat: each call pays the per-dispatch floor (~33 ms through the
    tunnel), so this measures the DISPATCHED path, not pure device time —
    use report._scan_time / bench.py's chained scan chunks for headline
    per-step numbers, and this helper when the per-call path itself is
    what's being measured.

    Returns (seconds_per_step, final_state).
    """
    import numpy as np

    def fetch(st):
        # value fetch = the only trustworthy sync point on the tunnel
        return float(np.asarray(st.pos[0, 0]))

    # warmup/compile
    out = step_fn(state)
    fetch(out[0] if isinstance(out, tuple) else out)

    st = state
    t0 = time.time()
    for _ in range(steps):
        out = step_fn(st)
        st = out[0] if isinstance(out, tuple) else out
    fetch(st)
    return (time.time() - t0) / steps, st
