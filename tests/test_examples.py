"""Smoke tests: the committed example scripts must run end-to-end (tiny
sizes, CPU). Guards the showcase/demo entry points against API rot —
the examples are the framework's equivalent of the reference's demo app
(main.cpp) and are referenced from README/docs."""

import runpy
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).parent.parent / "examples"


def _run(script, *args):
    argv0 = sys.argv
    try:
        sys.argv = [str(EXAMPLES / script), *map(str, args)]
        runpy.run_path(str(EXAMPLES / script), run_name="__main__")
    finally:
        sys.argv = argv0


@pytest.mark.slow
def test_contraction_demo_runs():
    _run("contraction_demo.py", "susane", 6)
    assert (EXAMPLES / "out" / "voltage_trace.png").exists()


@pytest.mark.slow
def test_fhn_wave_demo_runs():
    _run("fhn_wave_demo.py", 8)


@pytest.mark.slow
def test_fit_stimulus_demo_recovers():
    # Newton on jax.grad of a 4-step rollout; 3 iterations is enough to
    # assert the loss strictly decreases (full convergence is the demo's
    # job, not the smoke test's)
    _run("fit_stimulus_demo.py", 4, 3)
