"""Per-scene HBM footprint of the compiled fused step, from XLA's own
memory analysis — the tool-computed version of DEVELOPMENT.md's
"~2.4 kB of program buffers per particle puts the one-chip limit at ~5M"
derivation (the x448 scene fails AOT compile with "Used 19.74G of
15.75G hbm").

For each scene this AOT-lowers and compiles the production fused step
(no execution — safe for scenes too big to run) and prints XLA's
argument/output/temp/code sizes, bytes per particle, and the projected
single-chip particle ceiling at the device's HBM capacity.

Usage:
  python tools/hbm_footprint.py [--scenes biceps_full,biceps_full:56]
      [--hbm-gib 15.75]

Scene spec: name[:replicate].
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = "biceps_full,biceps_full:7,biceps_full:56,biceps_full:224"


def footprint(scene, scan: int = 0, donate: bool = False, unroll: int = 1):
    """(arg, out, temp, code) bytes of the compiled fused step — or, with
    scan > 0, of the scan-wrapped simulate program (the one production
    chunks actually run; its carry copies are what hit the HBM wall
    first, which is why the empirical OOM scale sits below the
    single-step projection).

    donate/unroll reproduce the round-4 production large-scene dispatch
    (models.monodomain.run_protocol: donated input state + unrolled scan
    body): donation lets XLA alias the input state into outputs/carries,
    and unrolling gives buffer assignment straight-line code it can share
    temps across — together they are what lifted the one-chip ceiling
    past x224."""
    import jax
    from sph_sm_monodomain_tpu.models.monodomain import step_fused
    from sph_sm_monodomain_tpu.ops.shape_matching import sm_invariants

    cfg = scene.cfg
    sm_inv = jax.jit(lambda s: sm_invariants(s, cfg))(scene.state)

    def step(st):
        out, _aux = step_fused(st, cfg, scene.q_block, scene.block_window,
                               scene.sub_block or 128,
                               impl=scene.fused_impl or "v4", sm_inv=sm_inv)
        return out

    dargs = (0,) if donate else ()
    if scan > 0:
        def run(st):
            out, _ = jax.lax.scan(lambda c, _: (step(c), None), st, None,
                                  length=scan, unroll=unroll)
            return out
        compiled = jax.jit(run, donate_argnums=dargs) \
            .lower(scene.state).compile()
    else:
        compiled = jax.jit(step, donate_argnums=dargs) \
            .lower(scene.state).compile()
    ma = compiled.memory_analysis()
    # donated inputs alias into outputs; memory_analysis reports the alias
    # bytes separately — subtract them so the total is live HBM, not
    # double-counted buffers
    alias = int(getattr(ma, "alias_size_in_bytes", 0) or 0)
    return (int(ma.argument_size_in_bytes),
            int(ma.output_size_in_bytes) - alias,
            int(ma.temp_size_in_bytes), int(ma.generated_code_size_in_bytes))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--scenes", default=DEFAULT,
                    help="comma list of name[:replicate]")
    ap.add_argument("--hbm-gib", type=float, default=15.75,
                    help="device HBM available to programs (v5e: 15.75)")
    ap.add_argument("--scan", type=int, default=0,
                    help="compile a scan of this many steps instead of "
                         "one step (the production chunk program)")
    ap.add_argument("--donate", action="store_true",
                    help="donate the input state (run_protocol's "
                         "large-scene dispatch)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="scan unroll factor (run_protocol auto-uses 4 "
                         "on very large scenes)")
    args = ap.parse_args()

    import sph_sm_monodomain_tpu as smt

    hbm = args.hbm_gib * 2 ** 30
    print(f"{'scene':>20} {'N':>9} {'args MB':>9} {'out MB':>8} "
          f"{'temp MB':>8} {'code MB':>8} {'B/particle':>10} "
          f"{'ceiling':>9}")
    for spec in args.scenes.split(","):
        parts = spec.split(":")
        rep = int(parts[1]) if len(parts) > 1 else 1
        sc = smt.build_scene(parts[0], replicate=rep)
        n = sc.num_particles
        try:
            a, o, t, c = footprint(sc, scan=args.scan, donate=args.donate,
                                   unroll=args.unroll)
        except Exception as e:  # OOM at compile is a valid data point
            msg = str(e).split("\n")[0][:70]
            print(f"{spec:>20} {n:>9} compile failed: {msg}")
            continue
        total = a + o + t + c
        bpp = total / n
        # arguments/outputs/temps scale with N; code is ~constant. The
        # projected ceiling solves (total - code) * (N'/N) + code = hbm.
        ceiling = int((hbm - c) / max(total - c, 1) * n)
        name = parts[0] if rep == 1 else f"{parts[0]}_x{rep}"
        print(f"{name:>20} {n:>9} {a / 2**20:>9.1f} {o / 2**20:>8.1f} "
              f"{t / 2**20:>8.1f} {c / 2**20:>8.1f} {bpp:>10.0f} "
              f"{ceiling:>9,}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
