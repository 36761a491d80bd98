"""Ablation timings for the fused coupled step on the real chip.

Each config compiles ONE lax.scan program of STEPS iterations whose carry
chains (every iteration depends on the previous one's data), runs it once to
compile, then times REPS chained executions ending with a value fetch — the
only trustworthy discipline through the axon tunnel (DEVELOPMENT.md).

Usage: python tools/ablate_fused.py [scene] [config ...]
Configs: full book sort gath swpa swpb sm
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sph_sm_monodomain_tpu as smt
from sph_sm_monodomain_tpu.ablation.legacy_sweeps import (
    sweep_a, sweep_b, sweep_bookkeeping)
from sph_sm_monodomain_tpu.ops.shape_matching import corrected_velocity
from sph_sm_monodomain_tpu.models.monodomain import step_fused

STEPS = 100
REPS = 3


def timeit(fn, args):
    out = fn(*args)                       # compile + warmup
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    cur = args
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*cur)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, time.time() - t0)
        # chain: feed outputs forward where shapes allow
        cur = tuple(o if isinstance(o, jax.Array) and o.shape == a.shape
                    else a for o, a in zip(jax.tree_util.tree_leaves(out),
                                           cur)) \
            if len(jax.tree_util.tree_leaves(out)) == len(cur) else args
    return best / STEPS * 1e3             # ms per scanned step


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "biceps_full"
    only = set(sys.argv[2:])
    # the q_block scans include blocks up to 1024, and the default
    # (no-filter) run executes ALL configs — pad the capacity
    # unconditionally so every config's divisibility check passes
    sc = smt.build_scene(scene_name)
    cap = -(-sc.state.capacity // 1024) * 1024
    if cap != sc.state.capacity:
        sc = smt.build_scene(scene_name, pad_to=cap)
    st, cfg = sc.state, sc.cfg
    qb, wc = sc.q_block, sc.block_window
    print(f"scene={scene_name} n={sc.num_particles} cap={st.capacity} "
          f"q_block={qb} w={wc}", flush=True)

    book = jax.jit(lambda p, a: sweep_bookkeeping(p, a, cfg, qb),
                   static_argnums=())
    order, inv, qs, qe, bs, bl = jax.block_until_ready(
        book(st.pos, st.active))
    fields16 = jnp.stack([st.pos[:, 0]] * 16, axis=1)

    def run(name, fn, args):
        if only and name not in only:
            return
        ms = timeit(fn, args)
        print(f"{name:6s} {ms:8.3f} ms/step", flush=True)

    # ---- full fused step ----
    @jax.jit
    def full(state):
        def body(s, _):
            s, _aux = step_fused(s, cfg, qb, wc)
            return s, ()
        s, _ = jax.lax.scan(body, state, None, length=STEPS)
        return s
    run("full", full, (st,))

    # ---- full fused step, v2 kernels at several tunings ----
    for sub_q, wc2 in [(32, 128), (64, 128), (32, 256), (16, 128)]:
        name = f"v2_{sub_q}_{wc2}"
        if only and name not in only:
            continue
        @jax.jit
        def full2(state, sub_q=sub_q, wc2=wc2):
            def body(s, _):
                s, _aux = step_fused(s, cfg, qb, wc2, sub_q, impl="v2")
                return s, ()
            s, _ = jax.lax.scan(body, state, None, length=STEPS)
            return s
        run(name, full2, (st,))

    # ---- full fused step, v3 kernels (via simulate: sm_inv hoisted) ----
    for sub_q, wc3 in [(64, 128), (32, 128), (64, 256), (128, 128),
                       (128, 256), (256, 256), (128, 384), (64, 384),
                       (256, 384), (256, 512)]:
        name = f"v3_{sub_q}_{wc3}"
        if only and name not in only:
            continue
        def full3(state, sub_q=sub_q, wc3=wc3):
            out = smt.simulate(state, cfg, sc.cell_capacity,
                               sc.neighbor_capacity, num_steps=STEPS,
                               fused=True, q_block=max(qb, sub_q),
                               w_window=wc3, sub_q=sub_q)
            return out[0]
        run(name, full3, (st,))

    # ---- full fused step, v4 kernels (merged z-plane windows) ----
    for qb4, sub_q, wc4 in [(128, 64, 128), (128, 128, 128), (512, 128, 128),
                            (128, 64, 256), (128, 128, 256), (512, 128, 256),
                            (512, 256, 256), (512, 256, 384),
                            (1024, 256, 128), (512, 128, 384)]:
        name = f"v4_{qb4}_{sub_q}_{wc4}"
        if only and name not in only:
            continue
        def full4(state, qb4=qb4, sub_q=sub_q, wc4=wc4):
            out = smt.simulate(state, cfg, sc.cell_capacity,
                               sc.neighbor_capacity, num_steps=STEPS,
                               fused=True, q_block=qb4,
                               w_window=wc4, sub_q=sub_q, impl="v4")
            return out[0]
        run(name, full4, (st,))

    # ---- v4 step with SM / bookkeeping knocked out (timing-only ablation,
    # physics wrong; isolates each component's marginal cost in situ) ----
    for knock in ("nosm", "nobook", "nosm_nobook"):
        name = f"v4x_{knock}"
        if only and name not in only:
            continue
        from sph_sm_monodomain_tpu.models import monodomain as M
        from sph_sm_monodomain_tpu.ops import pallas_sweeps as PS
        orig_cv = M.corrected_velocity
        orig_bk = PS.sweep_bookkeeping3
        if "nosm" in knock:
            M.corrected_velocity = \
                lambda s, c, axis_name=None, sm_inv=None: s.replace(
                    corrected_vel=s.vel)
        if "nobook" in knock:
            consts = jax.block_until_ready(
                jax.jit(lambda p, a: orig_bk(p, a, cfg, 128))(
                    st.pos, st.active))
            PS.sweep_bookkeeping3 = lambda p, a, c, w: consts
        try:
            def full4x(state):
                def body(s, _):
                    # bypass the step_fused jit wrapper: its trace cache
                    # keys on statics only and would ignore the monkeypatch
                    s, _aux = M._step_fused_v4(s, cfg, 128, 128, 128)
                    return s, ()
                s, _ = jax.lax.scan(body, state, None, length=STEPS)
                return s
            run(name, jax.jit(full4x), (st,))
        finally:
            M.corrected_velocity = orig_cv
            PS.sweep_bookkeeping3 = orig_bk

    # ---- full fused step, v3 kernels with explicit q_block ----
    for qb3, sub_q, wc3 in [(256, 64, 128), (512, 64, 128), (256, 32, 128),
                            (512, 128, 128), (1024, 64, 128),
                            (256, 64, 256), (512, 32, 128)]:
        name = f"v3q_{qb3}_{sub_q}_{wc3}"
        if only and name not in only:
            continue
        def full3q(state, qb3=qb3, sub_q=sub_q, wc3=wc3):
            out = smt.simulate(state, cfg, sc.cell_capacity,
                               sc.neighbor_capacity, num_steps=STEPS,
                               fused=True, q_block=qb3,
                               w_window=wc3, sub_q=sub_q)
            return out[0]
        run(name, full3q, (st,))

    # ---- v3 kernels in isolation (hoisted bookkeeping) ----
    if not only or {"swpa3", "swpb3", "glue3"} & only:
        from sph_sm_monodomain_tpu.ops.pallas_sweeps import (
            sweep_bookkeeping2)
        from sph_sm_monodomain_tpu.ops.fused_step import (
            feats_from_out_a, sweep_a3, sweep_b3)
        sub3, wc3 = 64, 256
        order2, inv2, blo2, bhi2, chash2 = jax.block_until_ready(
            jax.jit(lambda p, a: sweep_bookkeeping2(p, a, cfg, sub3))(
                st.pos, st.active))
        n = st.capacity
        z = jnp.zeros((n,), jnp.float32)
        fields0 = jnp.concatenate(
            [st.pos, st.vel, st.mass[:, None], st.dens[:, None],
             st.vm[:, None], st.stim[:, None], st.iion[:, None],
             st.w[:, None], chash2[:, None],
             jnp.zeros((n, 3), jnp.float32)], axis=1)
        fs0 = jax.block_until_ready(fields0[order2])

        @jax.jit
        def f_swpa3(fs):
            feats_a = jnp.stack(
                [fs0[:, 0], fs0[:, 1], fs0[:, 2], fs0[:, 3], fs0[:, 4],
                 fs0[:, 5], fs0[:, 6] / fs0[:, 7], fs0[:, 6], z, z, z, z,
                 fs0[:, 12], z, z, z], axis=0)
            def body(f, _):
                out_a = sweep_a3(f, feats_a, blo2, bhi2, 128, wc3, cfg,
                                 sub_q=sub3)
                return f * (1.0 - 1e-12) + 1e-12 * out_a, ()
            f, _ = jax.lax.scan(body, fs, None, length=STEPS)
            return f
        run("swpa3", f_swpa3, (fs0,))

        out_a0 = jax.block_until_ready(
            jax.jit(lambda f: sweep_a3(
                f, jnp.stack([f[:, 0], f[:, 1], f[:, 2], f[:, 3], f[:, 4],
                              f[:, 5], f[:, 6] / f[:, 7], f[:, 6], z, z, z,
                              z, f[:, 12], z, z, z], axis=0),
                blo2, bhi2, 128, wc3, cfg, sub_q=sub3))(fs0))

        @jax.jit
        def f_swpb3(qm):
            vol = jnp.where(out_a0[:, 8] > 0, out_a0[:, 10] / out_a0[:, 8],
                            0.0)
            feats_b = feats_from_out_a(out_a0, vol)
            def body(q, _):
                out_b = sweep_b3(q, feats_b, blo2, bhi2, 128, wc3, cfg,
                                 sub_q=sub3)
                return q * (1.0 - 1e-12) + 1e-12 * out_b, ()
            q, _ = jax.lax.scan(body, qm, None, length=STEPS)
            return q
        run("swpb3", f_swpb3, (out_a0,))

        # glue only: fields concat + sorted gather + 2 feature stacks +
        # unsort gather, no pallas calls
        @jax.jit
        def f_glue3(state):
            def body(s, _):
                fields = jnp.concatenate(
                    [s.pos, s.corrected_vel, s.mass[:, None],
                     s.dens[:, None], s.vm[:, None], s.stim[:, None],
                     s.iion[:, None], s.w[:, None], chash2[:, None],
                     jnp.zeros((n, 3), jnp.float32)], axis=1)
                fs = fields[order2]
                vol_prev = jnp.where(fs[:, 7] > 0, fs[:, 6] / fs[:, 7], 0.)
                feats_a = jnp.stack(
                    [fs[:, 0], fs[:, 1], fs[:, 2], fs[:, 3], fs[:, 4],
                     fs[:, 5], vol_prev, fs[:, 6], z, z, z, z, fs[:, 12],
                     z, z, z], axis=0)
                feats_b = feats_from_out_a(fs, vol_prev)
                ou = jnp.concatenate([fs, fs[:, 3:6] + feats_b[0, :, None]],
                                     axis=1)[inv2]
                s = s.replace(dens=ou[:, 7], pres=ou[:, 8],
                              vm=ou[:, 6] * (1 - 1e-12) + 1e-12 * s.vm,
                              pos=s.pos + 1e-15 * ou[:, 0:3])
                return s, ()
            s, _ = jax.lax.scan(body, state, None, length=STEPS)
            return s
        run("glue3", f_glue3, (st,))

    # ---- v2 bookkeeping only ----
    if not only or "book2" in only:
        from sph_sm_monodomain_tpu.ops.pallas_sweeps import sweep_bookkeeping2
        @jax.jit
        def f_book2(pos):
            def body(p, _):
                o, i, lo2, hi2, ch = sweep_bookkeeping2(p, st.active, cfg, 64)
                p = p + (o[0] % 2).astype(jnp.float32) * 1e-7 \
                    + (i[0] % 2).astype(jnp.float32) * 1e-7
                return p, ()
            p, _ = jax.lax.scan(body, pos, None, length=STEPS)
            return p
        run("book2", f_book2, (st.pos,))

    # ---- shape matching with hoisted invariants ----
    if not only or "sm2" in only:
        from sph_sm_monodomain_tpu.ops.shape_matching import sm_invariants
        sminv = sm_invariants(st, cfg)
        @jax.jit
        def f_sm2(state):
            def body(s, _):
                s = corrected_velocity(s, cfg, sm_inv=sminv)
                s = s.replace(pos=s.pos + 1e-9 * s.corrected_vel)
                return s, ()
            s, _ = jax.lax.scan(body, state, None, length=STEPS)
            return s
        run("sm2", f_sm2, (st,))

    # ---- bookkeeping only ----
    @jax.jit
    def f_book(pos):
        def body(p, _):
            o, i, a, b, c, d = sweep_bookkeeping(p, st.active, cfg, qb)
            p = p + (o[0] % 2).astype(jnp.float32) * 1e-7
            return p, ()
        p, _ = jax.lax.scan(body, pos, None, length=STEPS)
        return p
    run("book", f_book, (st.pos,))

    # ---- ids + argsort only ----
    gx, gy, gz = cfg.grid_size
    @jax.jit
    def f_sort(pos):
        def body(p, _):
            coords = (p / cfg.cell_size).astype(jnp.int32)
            x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
            inside = ((x >= 0) & (x < gx) & (y >= 0) & (y < gy)
                      & (z >= 0) & (z < gz))
            ids = jnp.where(inside & st.active, x + gx * (y + gy * z),
                            cfg.num_cells)
            o = jnp.argsort(ids, stable=True)
            p = p + (o[0] % 2).astype(jnp.float32) * 1e-7
            return p, ()
        p, _ = jax.lax.scan(body, pos, None, length=STEPS)
        return p
    run("sort", f_sort, (st.pos,))

    # ---- the two (N,16) permute gathers ----
    @jax.jit
    def f_gath(fields):
        def body(f, _):
            fs = f[order]
            back = fs[inv]
            return f * (1.0 - 1e-12) + 1e-12 * back, ()
        f, _ = jax.lax.scan(body, fields, None, length=STEPS)
        return f
    run("gath", f_gath, (fields16,))

    # ---- sweep A only (bookkeeping hoisted) ----
    pos_s = st.pos[order]
    mass_s = st.mass[order]
    @jax.jit
    def f_swpa(cvel_s, vol_s):
        def body(c, _):
            cv, vol = c
            dens, xsph = sweep_a(pos_s, cv, vol, mass_s, qs, qe, bs, bl,
                                 qb, wc, cfg)
            cv = cv + 1e-9 * xsph
            vol = mass_s / jnp.maximum(dens, 1.0)
            return (cv, vol), ()
        c, _ = jax.lax.scan(body, (cvel_s, vol_s), None, length=STEPS)
        return c
    vol0 = mass_s / st.dens[order]
    run("swpa", f_swpa, (jnp.zeros_like(pos_s), vol0))

    # ---- sweep B only ----
    @jax.jit
    def f_swpb(ivel_s, vm_s):
        def body(c, _):
            iv, vm = c
            acc, lap = sweep_b(pos_s, iv, vol0, mass_s * 0.0, vm, qs, qe,
                               bs, bl, qb, wc, cfg)
            return (iv + 1e-9 * acc, vm + 1e-9 * lap), ()
        c, _ = jax.lax.scan(body, (ivel_s, vm_s), None, length=STEPS)
        return c
    run("swpb", f_swpb, (jnp.zeros_like(pos_s), mass_s * 0.0))

    # ---- pointwise glue: EOS + FHN + integrate (no sweeps/book) ----
    from sph_sm_monodomain_tpu.ops.integrate import update_properties
    from sph_sm_monodomain_tpu.ops.electrophysiology import fhn_cell_model

    @jax.jit
    def f_pw(state):
        def body(s, _):
            pres = cfg.k_stiffness * (s.dens - cfg.stand_density) \
                - s.vm * cfg.voltage_constant
            pres = jnp.where(s.stim > 0.0,
                             jnp.clip(pres, -cfg.max_pressure,
                                      cfg.max_pressure), -0.0)
            s = s.replace(pres=pres)
            s = fhn_cell_model(s, cfg)
            s = update_properties(s, cfg)
            return s, ()
        s, _ = jax.lax.scan(body, state, None, length=STEPS)
        return s
    run("pw", f_pw, (st,))

    # ---- the two 16-field stacks (no gather) ----
    @jax.jit
    def f_stk(state):
        def body(s, _):
            f = jnp.stack([s.pos[:, 0], s.pos[:, 1], s.pos[:, 2],
                           s.vel[:, 0], s.vel[:, 1], s.vel[:, 2],
                           s.mass, s.dens, s.vm, s.stim, s.iion, s.w,
                           s.mass, s.mass, s.mass, s.mass], axis=1)
            g = jnp.stack([f[:, 0], f[:, 1], f[:, 2], f[:, 3], f[:, 4],
                           f[:, 5], f[:, 6], f[:, 7], f[:, 8], f[:, 9],
                           f[:, 10], f[:, 11], f[:, 12], f[:, 13],
                           f[:, 14], f[:, 15]], axis=1)
            s = s.replace(dens=s.dens + 1e-12 * g[:, 7])
            return s, ()
        s, _ = jax.lax.scan(body, state, None, length=STEPS)
        return s
    run("stk", f_stk, (st,))

    # ---- combined single-int32 sort (ids<<15 | idx) ----
    @jax.jit
    def f_sort2(pos):
        iota = jnp.arange(pos.shape[0], dtype=jnp.int32)
        def body(p, _):
            coords = (p / cfg.cell_size).astype(jnp.int32)
            x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
            inside = ((x >= 0) & (x < gx) & (y >= 0) & (y < gy)
                      & (z >= 0) & (z < gz))
            ids = jnp.where(inside & st.active, x + gx * (y + gy * z),
                            cfg.num_cells)
            comb = jnp.sort(ids * 32768 + iota)
            o = comb & 32767
            p = p + (o[0] % 2).astype(jnp.float32) * 1e-7
            return p, ()
        p, _ = jax.lax.scan(body, pos, None, length=STEPS)
        return p
    run("sort2", f_sort2, (st.pos,))

    # ---- shape matching only ----
    @jax.jit
    def f_sm(state):
        def body(s, _):
            s = corrected_velocity(s, cfg)
            s = s.replace(pos=s.pos + 1e-9 * s.corrected_vel)
            return s, ()
        s, _ = jax.lax.scan(body, state, None, length=STEPS)
        return s
    run("sm", f_sm, (st,))


if __name__ == "__main__":
    main()
