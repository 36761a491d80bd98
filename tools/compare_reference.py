"""One-command fidelity comparison against the ACTUAL reference C++ engine.

Compiles the reference read-only from /root/reference with the headless
test-harness driver (tests/reference_harness/driver.cpp, summary mode),
runs BOTH engines through the full app protocol (num_steps with
turnOffStim at the midpoint, main.cpp:73/329-334) on the same scene
positions, and plots the mean-displacement and mean-voltage curves plus
their absolute deviation. This is the committed, reproducible source of
docs/showcase/fidelity_500step.png and the README fidelity numbers.

Usage:
    python tools/compare_reference.py                     # biceps_18475, 500 steps
    python tools/compare_reference.py --scene biceps_1 --steps 200
    python tools/compare_reference.py --cpu               # force CPU for ours
"""

import argparse
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
# ONE build recipe shared with the fidelity test suite (so the tool and
# the tests can never compile different reference binaries)
from reference_harness.build import (BUILD, build_reference_driver,  # noqa: E402
                                     reference_available)


def run_reference(exe: Path, positions: np.ndarray, steps: int,
                  stim_off: int, stim_cube: bool = False):
    """(mean_displacement[steps], mean_vm[steps], wall_seconds)."""
    cloud = BUILD / "cloud.txt"
    np.savetxt(cloud, positions, fmt="%.9g")
    t0 = time.time()
    out = subprocess.run(
        [str(exe), str(cloud), str(steps), str(stim_off),
         "0", "0", "0", "1", str(int(stim_cube))],  # summary mode
        check=True, capture_output=True, text=True).stdout
    wall = time.time() - t0
    disp, vm = [], []
    for ln in out.splitlines():
        if ln.startswith("S "):
            _, _, d, v = ln.split()
            disp.append(float(d))
            vm.append(float(v))
    if len(disp) != steps:
        sys.exit(f"reference driver returned {len(disp)} rows, "
                 f"expected {steps}")
    return np.asarray(disp), np.asarray(vm), wall


def run_ours(scene_name: str, steps: int, stim_off: int, force_cpu: bool):
    """(mean_displacement[steps], mean_vm[steps], wall_seconds, backend)."""
    import jax
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import sph_sm_monodomain_tpu as smt

    scene = smt.build_scene(scene_name)
    n = scene.num_particles
    orig = np.asarray(scene.state.orig_pos)[:n]

    # per-step curves come from the in-scan trajectory recording
    # (record_every=1) — one device dispatch per chunk, not per step
    t0 = time.time()
    _state, _aux, traj = smt.run_protocol(
        scene, num_steps=steps, stim_off_step=stim_off, record_every=1)
    wall = time.time() - t0
    pos = np.asarray(traj["pos"])[:, :n]           # (steps, n, 3)
    disp = np.linalg.norm(pos - orig[None], axis=-1).mean(axis=1)
    vm = np.asarray(traj["vm"])[:, :n].mean(axis=1)
    return disp, vm, wall, jax.default_backend()


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--scene", default="biceps_18475",
                    help="scene name (must be a raw reference cloud scene)")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--stim-off-step", type=int, default=None)
    ap.add_argument("--out", default=None,
                    help="output PNG (default: a per-scene filename under "
                         "docs/showcase/ so scenes never clobber each "
                         "other's committed artifact)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX engine onto CPU")
    args = ap.parse_args()
    if args.out is None:
        name = ("fidelity_500step.png" if args.scene == "biceps_18475"
                else f"fidelity_{args.scene}_500step.png")
        args.out = str(REPO / "docs" / "showcase" / name)
    if not reference_available():
        sys.exit("reference tree or g++ unavailable")
    stim_off = (args.steps // 2 if args.stim_off_step is None
                else args.stim_off_step)

    # the reference driver must see EXACTLY the positions our scene seeds
    # (incl. the 3000+every-7th subsample rule for biceps_18475)
    from sph_sm_monodomain_tpu.utils.io import scene_positions
    from sph_sm_monodomain_tpu.config import SimConfig
    pts = scene_positions(args.scene, SimConfig())
    print(f"{args.scene}: {pts.shape[0]} particles, {args.steps} steps, "
          f"stim off at {stim_off}")

    exe = build_reference_driver()
    # build_scene applies the cube stim protocol (turnOnStim_Cube) to the
    # cube scene and the mesh protocol to every cloud scene — mirror that
    r_disp, r_vm, r_wall = run_reference(exe, pts, args.steps, stim_off,
                                         stim_cube=(args.scene == "cube"))
    print(f"reference C++: {r_wall:.1f}s "
          f"({1e3 * r_wall / args.steps:.1f} ms/step)")

    o_disp, o_vm, o_wall, backend = run_ours(args.scene, args.steps,
                                             stim_off, args.cpu)
    print(f"ours ({backend}): {o_wall:.1f}s wall incl. compile "
          f"(in-scan per-step trajectory recording)")

    dd = np.abs(o_disp - r_disp)
    dv = np.abs(o_vm - r_vm)
    peak = np.abs(r_disp).max()
    print(f"mean-displacement: max |dev| {dd.max():.3g} "
          f"({100 * dd.max() / peak:.2f}% of peak {peak:.3g})")
    print(f"mean-voltage:      max |dev| {dv.max():.3g}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    steps_ax = np.arange(args.steps)
    axes[0].plot(steps_ax, r_disp, label="reference C++", lw=2)
    axes[0].plot(steps_ax, o_disp, "--", label=f"ours ({backend})", lw=1.5)
    axes[0].axvline(stim_off, color="gray", ls=":", lw=1)
    axes[0].set_title(f"mean displacement (max dev {dd.max():.1e})")
    axes[0].set_xlabel("step")
    axes[0].legend()
    axes[1].plot(steps_ax, r_vm, label="reference C++", lw=2)
    axes[1].plot(steps_ax, o_vm, "--", label=f"ours ({backend})", lw=1.5)
    axes[1].axvline(stim_off, color="gray", ls=":", lw=1)
    axes[1].set_title(f"mean Vm (max dev {dv.max():.1e})")
    axes[1].set_xlabel("step")
    axes[1].legend()
    fig.suptitle(f"{args.scene}, {pts.shape[0]} particles: "
                 f"full {args.steps}-step protocol, stim off at {stim_off}")
    fig.tight_layout()
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.out, dpi=110)
    print(f"plot -> {args.out}")


if __name__ == "__main__":
    main()
