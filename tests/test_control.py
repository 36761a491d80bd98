"""Runtime-control tests (C15/C16 interactive parity).

The reference's GLUT keyboard handler (main.cpp:393-408) pauses (SPACE),
fires turnOffStim ('q') and exits (ESC) mid-run. The headless equivalents
are run_protocol's callback-command contract and the CLI's RunController
control file.
"""

import numpy as np
import pytest

from sph_sm_monodomain_tpu import build_scene, run_protocol
from sph_sm_monodomain_tpu.cli import RunController


@pytest.mark.slow
def test_run_protocol_callback_commands():
    scene = build_scene("susane")
    calls = []

    def cb(done, st):
        calls.append(done)
        if done == 2:
            return {"stim_off": True}   # the 'q' key
        if done == 4:
            return {"stop": True}       # ESC
        return None

    state, aux, _ = run_protocol(scene, num_steps=10, stim_off_step=8,
                                 chunk=2, callback=cb)
    # stopped early: callbacks at 2, 4 only (not 6, 8, 10)
    assert calls == [2, 4]
    # stim-off fired via control, not via the (never-reached) protocol step
    n = scene.num_particles
    np.testing.assert_array_equal(np.asarray(state.stim)[:n], -10000.0)
    assert np.isfinite(np.asarray(state.pos)[:n]).all()


def test_run_controller_file_commands(tmp_path):
    ctl = tmp_path / "ctl"
    saved = {}
    ctl.write_text("stim-off\nsave out.npz\nbogus\n")
    c = RunController(str(ctl),
                      save_fn=lambda p, st, done: saved.update(
                          p=p, st=st, done=done))
    cmd = c(2, "STATE")
    assert cmd.get("stim_off") is True
    # save_fn receives the executed-step count so checkpoints record the
    # true global step (ADVICE r2)
    assert saved == {"p": "out.npz", "st": "STATE", "done": 2}
    # consumed by OFFSET (the file is append-only; truncating raced with a
    # concurrent `echo cmd >>`): a second poll re-reads nothing
    saved.clear()
    assert not c(4, "STATE")
    assert saved == {}

    with open(ctl, "a") as f:               # append like `echo stop >>`
        f.write("stop\n")
    assert c(6, "STATE").get("stop") is True


def test_run_controller_pause_resume(tmp_path):
    ctl = tmp_path / "ctl"
    ctl.write_text("")
    c = RunController(str(ctl), pause_steps=[3], poll_s=0.01)

    import threading

    def release():
        ctl.write_text("resume\n")

    t = threading.Timer(0.2, release)
    t.start()
    cmd = c(3, None)   # blocks until the timer writes 'resume'
    t.join()
    assert not cmd.get("stop")
    assert c.paused is False
