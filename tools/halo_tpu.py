"""Price the ppermute-halo path COMPILED on the real TPU (1-device mesh).

Until round 4 every halo artifact was CPU interpret mode (tests force
jax_platforms=cpu; the driver dryrun runs in a CPU-forced subprocess), so
the Mosaic compilability of the halo kernels' machinery — bitcast id
transport, dynamic-slice halo packing, shard_map+Pallas composition — was
unproven, and the slab overhead (2 local sorts + 2 plane exchanges per
step on top of the v4 sweeps) was unpriced. A 1-device mesh compiles the
IDENTICAL shard_map program (ppermute with a single participant is a
self-copy; every capacity/padding path is exercised) on the real chip.

Outputs, per scene scale:
  - numerics: 3 halo steps vs 3 single-chip v4 steps, matched by particle
    identity after unshard (catches Mosaic-only miscompiles)
  - halo ms/step (scan-amortized, best-of), v4 ms/step same-session, and
    the overhead ratio

Usage: python tools/halo_tpu.py [replicate] [scan_length] [--check]
                                [--row OUT.csv]
       (flagship tiers: replicate 7 = 129k particles, 56 = 1.03M)

--row appends the measurement as one line of results_tpu_halo.csv (the
committed artifact for the halo-on-TPU pricing; see that file's header).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import sph_sm_monodomain_tpu as smt
from sph_sm_monodomain_tpu.models.monodomain import step_fused
from sph_sm_monodomain_tpu.ops.shape_matching import sm_invariants
from sph_sm_monodomain_tpu.parallel import halo_step as H
from sph_sm_monodomain_tpu.parallel.sharded_step import make_mesh


def _by_identity(state, n_expect):
    """Active rows sorted by particle identity (orig_pos is unique per
    particle and migration-invariant), for layout-free comparison."""
    act = np.asarray(state.active)
    op = np.asarray(state.orig_pos)[act]
    order = np.lexsort((op[:, 2], op[:, 1], op[:, 0]))
    assert op.shape[0] == n_expect, (op.shape[0], n_expect)
    return {f: np.asarray(getattr(state, f))[act][order]
            for f in ("pos", "vel", "vm", "dens", "iion", "w")}


HALO_ROW_HEADER = ("scene;particles;devices;Halo Step Duration;"
                   "v4 Anchor Step;Overhead;Padded Rows;Scan Length;"
                   "Compile s;backend")


def append_halo_row(path, scene, n, devices, halo_s, v4_s, pad_factor,
                    length, compile_s, backend):
    """Append one halo pricing row (report-style ;-separated, %g values).

    Kept as a function so tests can exercise the artifact format without
    a TPU run."""
    new = not os.path.exists(path) or os.path.getsize(path) == 0
    with open(path, "a") as f:
        if new:
            f.write("# ppermute-halo path priced COMPILED on real hardware"
                    " (tools/halo_tpu.py).\n"
                    "# Overhead = halo/v4 same-session; it buys O(N/D) "
                    "state+compute per device\n"
                    "# (break-even D ~= Overhead). Durations in seconds"
                    " per step, scan-amortized.\n")
            f.write(HALO_ROW_HEADER + "\n")
        f.write(f"{scene};{n};{devices};{halo_s:g};{v4_s:g};"
                f"{halo_s / v4_s:g};{pad_factor:g};{length};"
                f"{compile_s:g};{backend}\n")


def main():
    argv = sys.argv[1:]
    # --row takes its path only via --row=PATH; bare --row means the default
    # artifact. (A space-separated value would swallow the next positional —
    # `halo_tpu.py --row 56` must mean replicate=56, not out-file "56".)
    row_out = None
    kept = []
    for a in argv:
        if a == "--row":
            row_out = "results_tpu_halo.csv"
        elif a.startswith("--row="):
            row_out = a.split("=", 1)[1] or "results_tpu_halo.csv"
        else:
            kept.append(a)
    argv = kept
    check = "--check" in argv
    slack = next((float(a.split("=", 1)[1]) for a in argv
                  if a.startswith("--slack=")), 1.2)
    args = [a for a in argv if not a.startswith("--")]
    rep = int(args[0]) if args else 7
    length = int(args[1]) if len(args) > 1 else 20

    sc = smt.build_scene("biceps_full", replicate=rep)
    cfg, n = sc.cfg, sc.num_particles
    sub_q = sc.sub_block or 128
    wc = sc.block_window
    mesh = make_mesh(jax.devices()[:1])
    print(f"x{rep}: N={n} backend={jax.default_backend()} "
          f"qb={sc.q_block} wc={wc} subq={sub_q}", flush=True)

    halo0, s_cap, mig, hcap = H.shard_state_halo(sc.state, mesh, cfg,
                                                 slack=slack,
                                                 q_block=sc.q_block)
    print(f"halo capacities: S={s_cap} ({s_cap / max(n, 1):.2f}x rows) "
          f"mig={mig} halo={hcap}", flush=True)

    if check:
        nsteps = int(os.environ.get("HALO_CHECK_STEPS", "3"))
        t0 = time.time()
        step_fn = H.make_halo_step(mesh, cfg, mig, hcap, q_block=sc.q_block,
                                   w_chunk=wc, sub_q=sub_q)
        h = halo0
        for _ in range(nsteps):
            h, ovf = step_fn(h)
        assert int(ovf) == 0, f"halo overflow {int(ovf)}"
        dense = H.unshard_state_halo(h, n, cfg)
        print(f"halo {nsteps}-step + unshard ok ({time.time() - t0:.0f}s "
              f"incl Mosaic compile)", flush=True)

        def run_v4_steps(st):
            sm_inv = jax.jit(lambda s: sm_invariants(s, cfg))(st)
            for _ in range(nsteps):
                st, _ = step_fused(st, cfg, sc.q_block, wc, sub_q,
                                   impl="v4", sm_inv=sm_inv)
            return st

        st = run_v4_steps(sc.state)

        # The pass bar is v4's OWN fp-noise floor: rerun v4 on the same
        # particles in a shuffled row order (physically identical; only
        # the f32 reduction order changes — the SM moment sums over N
        # terms carry ~sqrt(N)*eps relative noise, amplified x(alpha/dt)
        # into corrected_vel and on through XSPH/forces). Measured on
        # hardware at 129k the shuffle floor is ~4x the halo deltas —
        # fixed tolerances tighter than this floor are not achievable by
        # ANY reduction layout, including v4 against itself.
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        full = np.arange(sc.state.capacity)
        tile_r = getattr(cfg, "sm_tile_rows", 0)
        if tile_r and tile_r > 0:
            # the contig segment-reduction form (large f*K) REQUIRES
            # tile-contiguous rows — a global shuffle would violate its
            # layout contract (garbage goals, not a numerics floor), so
            # perturb the reduction order WITHIN each cluster tile only
            for lo in range(0, n, tile_r):
                hi = min(lo + tile_r, n)
                full[lo:hi] = lo + rng.permutation(hi - lo)
        else:
            full[:n] = rng.permutation(n)
        permj = jnp.asarray(full)
        st0p = jax.tree_util.tree_map(
            lambda x: x[permj] if getattr(x, "ndim", 0) >= 1
            and x.shape[0] == sc.state.capacity else x, sc.state)
        floor = _by_identity(run_v4_steps(st0p), n)

        a, b = _by_identity(dense, n), _by_identity(st, n)
        bad = []
        for f in ("pos", "vel", "vm", "dens", "iion", "w"):
            err = float(np.abs(a[f] - b[f]).max())
            nf = float(np.abs(floor[f] - b[f]).max())
            tol = max(4.0 * nf, 1e-5)
            print(f"  max|halo - v4| {f}: {err:.2e} "
                  f"(v4 shuffle-noise floor {nf:.2e}, tol {tol:.2e})",
                  flush=True)
            if err >= tol:
                bad.append((f, err, nf))
        assert not bad, f"diverged beyond the v4 noise floor: {bad}"
        print("numerics: halo matches single-chip v4 on TPU within v4's "
              "own reduction-order noise", flush=True)

    # --- scan-amortized halo ms/step -----------------------------------
    sim = H.make_halo_simulate(mesh, cfg, mig, hcap, num_steps=length,
                               q_block=sc.q_block, w_chunk=wc, sub_q=sub_q)
    t0 = time.time()
    h, ovf = sim(halo0)
    assert int(ovf) == 0
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        h, ovf = sim(halo0)
        int(ovf)
        best = min(best, (time.time() - t0) / length)
    halo_ms = best * 1e3
    print(f"halo_d1: {halo_ms:.2f} ms/step (compile {compile_s:.0f}s, "
          f"scan {length})", flush=True)

    # --- same-session v4 single-chip anchor ----------------------------
    sm_inv = jax.jit(lambda s: sm_invariants(s, cfg))(sc.state)

    @jax.jit
    def run_v4(st):
        def body(c, _):
            out, _aux = step_fused.__wrapped__(c, cfg, sc.q_block, wc,
                                               sub_q, impl="v4",
                                               sm_inv=sm_inv)
            return out, None
        out, _ = jax.lax.scan(body, st, None, length=length)
        return out

    out = run_v4(sc.state)
    float(out.pos[0, 0])
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        out = run_v4(sc.state)
        float(out.pos[0, 0])
        best = min(best, (time.time() - t0) / length)
    v4_ms = best * 1e3
    print(f"v4 single-chip anchor: {v4_ms:.2f} ms/step", flush=True)
    print(f"slab overhead: {halo_ms / v4_ms:.2f}x "
          f"(sorts + exchanges + {s_cap / max(n, 1):.2f}x padded rows)",
          flush=True)
    if row_out:
        append_halo_row(row_out, f"halo_d1_x{rep}", n, 1, halo_ms / 1e3,
                        v4_ms / 1e3, s_cap / max(n, 1), length, compile_s,
                        jax.default_backend())
        print(f"row appended to {row_out}", flush=True)


if __name__ == "__main__":
    main()
