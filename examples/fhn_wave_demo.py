"""Monodomain-only demo: FHN voltage wave on a frozen biceps cloud
(BASELINE.json config 3: 'diffusion + reaction, frozen particles').

Stimulates a small apex region and renders the propagating wave with the
voltage colormap.

Run:  python examples/fhn_wave_demo.py [steps]
"""

import sys

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))
from pathlib import Path

import numpy as np

import sph_sm_monodomain_tpu as smt
from sph_sm_monodomain_tpu.models import variants
from sph_sm_monodomain_tpu.ops.electrophysiology import set_stim
from sph_sm_monodomain_tpu.utils.render import render_points, save_png

OUT = Path(__file__).parent / "out" / "fhn_wave"


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    scene = smt.build_scene("biceps_18475", stim=False)
    cfg, state = scene.cfg, scene.state
    n = scene.num_particles

    # stimulate a small region at the muscle apex (min-x end)
    pts = np.asarray(state.pos)[:n]
    apex = pts[np.argmin(pts[:, 0])]
    state = set_stim(state, tuple(apex), 0.005, cfg.stim_strength, cfg)
    n_stim = int((np.asarray(state.stim)[:n] > 0).sum())
    print(f"{n} particles, {n_stim} stimulated at apex {apex.round(3)}")

    tables = variants.monodomain_prepare(state, cfg, scene.cell_capacity,
                                         scene.neighbor_capacity)
    OUT.mkdir(parents=True, exist_ok=True)
    every = max(steps // 25, 1)
    for i in range(0, steps, every):
        state = variants.simulate_monodomain_only(state, tables, cfg,
                                                  num_steps=every)
        img = render_points(state, cfg, mode="voltage",
                            azimuth=0.4, elevation=0.25, vrange=(0.0, 15.0))
        save_png(str(OUT / f"wave_{i + every:05d}.png"), img)
        vm = np.asarray(state.vm)[:n]
        print(f"step {i + every}: Vm [{vm.min():.1f}, {vm.max():.1f}], "
              f"active front: {(np.abs(vm) > 1).sum()} particles")
    print(f"frames -> {OUT}")


if __name__ == "__main__":
    main()
