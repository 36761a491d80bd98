"""Smoke tests: the committed example scripts must run end-to-end (tiny
sizes, CPU). Guards the showcase/demo entry points against API rot —
the examples are the framework's equivalent of the reference's demo app
(main.cpp) and are referenced from README/docs."""

import re
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
    trace = EXAMPLES / "out" / "voltage_trace.png"
    trace.unlink(missing_ok=True)  # a stale artifact must not mask a skip
    _run("contraction_demo.py", "susane", 6)
    assert trace.exists()


@pytest.mark.slow
def test_fhn_wave_demo_runs():
    _run("fhn_wave_demo.py", 8)


@pytest.mark.slow
def test_fit_fhn_fused_demo_recovers(capsys):
    # gradient descent THROUGH the fused Laplacian kernel (custom VJP,
    # variants._lap_vm_factory); the demo raises SystemExit if the
    # recovery misses 1%
    _run("fit_fhn_fused_demo.py", 6, 3)
    out = capsys.readouterr().out
    m = re.search(r"recovered amplitude .* \(([\d.]+)% off\)", out)
    assert m, f"demo output changed: {out[-300:]}"
    assert float(m.group(1)) < 1.0, out[-300:]


@pytest.mark.slow
def test_fit_material_demo_recovers(capsys):
    # Adam on jax.grad w.r.t. DYNAMIC physics params (config.PARAM_FIELDS)
    # through a 6-step coupled rollout; the demo raises SystemExit if K or
    # mu misses the hidden material by more than 20%
    _run("fit_material_demo.py", 6, 100)
    out = capsys.readouterr().out
    m = re.search(r"recovered K=([\d.]+) .*mu=([\d.]+)", out)
    assert m, f"demo output changed: {out[-300:]}"


@pytest.mark.slow
def test_fit_material_flagship_smoke(capsys):
    # the flagship-scale variant of the material fit: per-step
    # jax.checkpoint rematerialization so long adjoints fit HBM. The CPU
    # smoke guards the checkpointed-grad path against API rot on the toy
    # cloud; iters=12 keeps the convergence SystemExit disarmed (a 6-step
    # rollout cannot identify mu — convergence is covered at 6 steps/100
    # iters by test_fit_material_demo_recovers and at flagship scale by
    # the committed TPU run in DEVELOPMENT.md)
    _run("fit_material_flagship.py", "susane", 6, 12)
    out = capsys.readouterr().out
    assert "value_and_grad:" in out, out[-300:]
    m = re.search(r"recovered K=([\d.]+) .*mu=([\d.]+)", out)
    assert m, f"demo output changed: {out[-300:]}"


@pytest.mark.slow
def test_fit_stimulus_demo_recovers(capsys):
    # Newton on jax.grad of a 4-step rollout: the scalar inverse problem
    # is near-linear in the amplitude, so 3 iterations must land within
    # 1% of the hidden amplitude (the demo prints the recovery error)
    _run("fit_stimulus_demo.py", 4, 3)
    out = capsys.readouterr().out
    m = re.search(r"recovered amplitude .* \(([\d.]+)% off\)", out)
    assert m, f"demo output changed: {out[-300:]}"
    assert float(m.group(1)) < 1.0, out[-300:]
