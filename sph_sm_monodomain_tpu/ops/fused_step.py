"""v3 fully-fused coupled step: two Pallas sweeps, near-zero XLA glue.

Builds on the v2 machinery of ops/pallas_sweeps.py (sorted candidate
windows, in-kernel 3x3x3 stencil masks) and additionally folds every
pointwise phase of the reference step into the sweep kernels:

  sweep A (kernel): XSPH + density gather (calculate_intermediate_velocity
      cpp:669-701 + Compute_Density_SingPressure cpp:448-513) with an
      epilogue computing the EOS pressure + voltage coupling + stim gate
      (cpp:486-503) and the FHN reaction ODEs (calculate_cell_model
      cpp:575-593).
  sweep B (kernel): pressure/viscosity forces + Vm Laplacian gather
      (Compute_Force cpp:515-573) with an epilogue performing the full
      semi-implicit Euler integration, voltage update, wall reflection and
      AABB clamp (Update_Properties cpp:596-651).

The matrices are laid out so that NO XLA work happens between the kernels
except one (16, N) candidate-feature stack: sweep A's output matrix IS
sweep B's query matrix.

Layouts (16 f32 columns per particle, sorted order):
  QM_A / fs:  [pos3 | cvel3 | mass | dens_prev | vm | stim | iion | w |
               chash | - | - | -]
  OUT_A/QM_B: [pos3 | ivel3 | pres | vm | dens | react | mass | iion' |
               chash | - | - | w']   (react = (iion' - stim*dt/m)/Cm)
  OUT_B:      [pos'3 | vel'3 | vm' | dens | pres | iion' | w' | inter_vm |
               acc3 | -]
Feature rows (16, N): [pos3 | vel3 | vol | pres | vm | - - - | chash | ...]
(sweep A reads vol_prev/mass in the pres/vm slots). `chash` is the f32
linear cell hash driving the in-kernel stencil mask (see
pallas_sweeps.sweep_bookkeeping2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from .pallas_sweeps import (_COORD_SENTINEL, _RUN_OFFSETS,
                            VMEM_FEATS_LIMIT_BYTES, _interpret_default,
                            _PAIR_EPS, _slice_rows, hash_axis_perm)

# candidate arrays above this double-buffer their per-chunk DMA in the v4
# gather loop; below it the blocking copy is already latency-hidden and the
# dynamic buffer-slot indexing only adds overhead (measured, DEVELOPMENT.md)
DB_FEATS_MIN_BYTES = 32 * 2 ** 20

# chunks per async copy on the double-buffered HBM-feats path: each DMA
# fills G compute chunks' worth of scratch, so the per-chunk ISSUE latency
# (the dominant HBM-path cost at 1M+ particles — see the roofline section
# of DEVELOPMENT.md; the raw bytes would be <1 ms at peak bandwidth)
# amortizes G-ways while the (sub_q, w_chunk) accumulator tiles — whose
# widening was measured as a 2.55 -> 3.07 ms ALU loss — stay untouched.
# Extra bytes DMA'd past a window's end are latency-free on this
# latency-bound path and land on lanes the stencil mask / inert-feature
# contract already zeroes.
# Measured same-session at x56 (1.03M particles, 20-step scans, 2026-08-19):
# G=1 231.3 / G=2 192.1 / G=4 184.3 / G=8 187.3 ms/step — G=4 wins
# (-20.3% vs G=1); at G=8 the over-computed masked lanes past each
# window's end (avg window ~6 chunks -> cdiv rounds to 8 either way, but
# G=8 over-copies short windows too) eat the remaining issue savings.
DB_GROUP_CHUNKS = 4


# --- dynamic physics parameters (config.PARAM_FIELDS) in-kernel -------------
# Slot layout of the optional (1, 16) f32 SMEM operand carrying the physics
# constants the sweep kernels consume. When the operand is absent the
# constants are baked as f32 immediates (the production default — zero cost,
# byte-identical to the pre-dynamic kernels). FHN voltage constants arrive
# pre-combined (denom = Vp - Vr, asd = (Vt - Vr)/(Vp - Vr), cpp:583-586) and
# the monodomain scale as vm_scale = sigma/(Beta*Cm) (cpp:571): the kernel
# reads scalars, it does not re-derive them.
_DYN_SLOTS = ("velocity_mixing", "k_stiffness", "stand_density",
              "voltage_constant", "fh_vr", "fh_denom", "fh_asd",
              "fh_c1", "fh_c2", "fh_c3", "fh_c4", "cm_capacitance",
              "mu_viscosity", "vm_scale")  # 14 used; 2 spare slots


class _PhysConsts:
    """Namespace of per-kernel physics scalars (see _DYN_SLOTS)."""
    __slots__ = _DYN_SLOTS

    def __init__(self, **kw):
        for k in _DYN_SLOTS:
            setattr(self, k, kw[k])


def _derived_consts(cfg: SimConfig) -> dict:
    """The 14 dynamic scalars from a (possibly traced) config."""
    return dict(
        velocity_mixing=cfg.velocity_mixing,
        k_stiffness=cfg.k_stiffness,
        stand_density=cfg.stand_density,
        voltage_constant=cfg.voltage_constant,
        fh_vr=cfg.fh_vr,
        fh_denom=cfg.fh_vp - cfg.fh_vr,
        fh_asd=(cfg.fh_vt - cfg.fh_vr) / (cfg.fh_vp - cfg.fh_vr),
        fh_c1=cfg.fh_c1, fh_c2=cfg.fh_c2, fh_c3=cfg.fh_c3, fh_c4=cfg.fh_c4,
        cm_capacitance=cfg.cm_capacitance,
        mu_viscosity=cfg.mu_viscosity,
        vm_scale=cfg.sigma / (cfg.beta_sv_ratio * cfg.cm_capacitance),
    )


def build_dynp(cfg_eff: SimConfig):
    """(1, 16) f32 dynamic-params operand from a resolve_params'd config
    (fields may be tracers)."""
    vals = _derived_consts(cfg_eff)
    vec = jnp.stack([jnp.asarray(vals[k], jnp.float32)
                     for k in _DYN_SLOTS]
                    + [jnp.float32(0.0)] * (16 - len(_DYN_SLOTS)))
    return vec.reshape(1, 16)


def _phys_consts(cfg: SimConfig, dynp_ref=None) -> _PhysConsts:
    """Kernel-side constants: baked f32 immediates from the static config,
    or scalar reads from the SMEM dynamic-params operand."""
    if dynp_ref is None:
        return _PhysConsts(**{k: jnp.float32(v)
                              for k, v in _derived_consts(cfg).items()})
    return _PhysConsts(**{k: dynp_ref[0, i]
                          for i, k in enumerate(_DYN_SLOTS)})


def _gather_loop(blk_lo_ref, blk_hi_ref, feats_ref, scratch, w_chunk,
                 qh, base, pair_fn, accs, cfg: SimConfig,
                 hbm_feats: bool):
    """Shared 9-run candidate enumeration: applies `pair_fn(cand, mask,
    accs) -> accs` to every (16, w_chunk) candidate chunk. The mask is the
    hash-distance stencil test |hash_q + d_r - hash_c| <= 1 alone — it is
    exact: rows outside the nominal window bounds can never satisfy it,
    zero-padded rows are inert (mass = vol = 0), inactive rows carry a
    hash sentinel, and a pair passes under at most one run offset (offsets
    differ by >= Gx > 2), so overlapping windows cannot double-count."""
    gx, gy, _ = cfg.grid_size
    for r in range(9):
        d_r = float(gx * (_RUN_OFFSETS[r, 0] + gy * _RUN_OFFSETS[r, 1]))
        qhd = qh + jnp.float32(d_r)
        w_lo = blk_lo_ref[base * 16 + r]
        w_hi = blk_hi_ref[base * 16 + r]
        start = pl.multiple_of((w_lo // 128) * 128, 128)
        trips = pl.cdiv(w_hi - start, w_chunk)

        def chunk(c, carry, start=start, qhd=qhd):
            off = pl.multiple_of(start + c * w_chunk, 128)
            if hbm_feats:
                buf, sem = scratch
                cp = pltpu.make_async_copy(
                    feats_ref.at[:, pl.ds(off, w_chunk)], buf, sem)
                cp.start()
                cp.wait()
                cand = buf[:, :]
            else:
                cand = feats_ref[:, pl.ds(off, w_chunk)]
            stencil = jnp.abs(qhd - cand[12:13, :]) <= 1.0
            return pair_fn(cand, stencil, carry)

        # chunk 0 runs straight-line: almost every window fits one chunk
        # (the tuner sizes w_chunk that way), and running it on an EMPTY
        # window is harmless — the stencil test masks every lane — so no
        # branch is needed. The dynamic loop only covers the rare tail.
        accs = chunk(0, accs)
        accs = jax.lax.fori_loop(1, trips, chunk, accs)
    return accs


def _gather_loop4(blk_lo_ref, blk_hi_ref, feats_ref, scratch, w_chunk,
                  qcx, qcyz, base, pair_fn, accs, cfg: SimConfig,
                  hbm_feats: bool, db_feats: bool = False,
                  mask: str = "full"):
    """v4 candidate enumeration: THREE merged z-plane windows per sub-block
    (one per dz offset), each covering the full 3x3 (dx, dy) footprint of
    the sub-block's hash interval in that plane.

    The 9 (dy, dz) runs of `_gather_loop` live at hash offsets dy*Gx +
    dz*Gx*Gy; the three dy-runs of one dz are only ~Gx cells apart, so for
    typical blocks their windows nearly abut — merging them trades a few
    gap lanes for 3x fewer window setups and fewer ragged-chunk roundups
    (measured net win on v5e, see DEVELOPMENT.md).

    mask="full" (sweep B) is the exact per-axis cell test |cx_q - cx_c|
    <= 1 and |cyz_q + Gm*ds - cyz_c| <= 1 on two f32 features (cx =
    fast-axis cell coord, cyz = mid + Gm*slow combined coord; both <
    2^21, exact in f32; axis roles from pallas_sweeps.hash_axis_perm —
    x-major on the standard cubic world). It accepts exactly the
    reference's 27-cell stencil pairs plus boundary wrap pairs (mid_q=0
    with mid_c=Gm-1 one slow-plane lower, etc.) that are >= one world
    edge minus two cells apart — far outside every kernel support, so
    their contribution is exactly 0. Out-of-grid / inactive lanes carry
    a sentinel cx. Rows outside the nominal windows can never pass
    (their cyz differs by >= 2 for every ds), and a pair passes under at
    most one slow-offset window, so overlapping windows cannot
    double-count.

    mask="yz" (sweep A only) drops the |cx_q - cx_c| half: sweep A's only
    pair weight is Poly6, whose support radius equals the cell size, so
    every fast-axis-distant or fast-wrap pair the cx test would reject
    already gets weight exactly 0 from the in-kernel max(h^2 - r^2, 0)
    support clamp (cells >= 2 apart on an axis are > h apart on that
    axis). The cyz half MUST stay: it is what makes the three run windows
    disjoint per pair (a chunk-aligned over-read below/above one run's
    bounds can reach rows of the neighboring run's window, and those rows
    can be genuine in-support neighbors — without the cyz test they would
    be double-counted). It also re-derives the window bounds exactly, so
    over-read rows outside every run never pass. Lanes the cx sentinel
    used to hide (inactive / out-of-grid rows, whose cyz feature is 0,
    not a sentinel) are instead inert by the FEATURE contract: sweep-A
    candidate builders zero the mass and vol columns on dead lanes (see
    build_qm_feats), and every sweep-A accumulator term scales by one of
    them. Sweep B cannot use this: B_spline_2's support is 2h, so the
    reference's 27-cell truncation (cpp:562-563) is NOT implied by the
    weight — B keeps the full test for fidelity."""
    gm = cfg.grid_size[hash_axis_perm(cfg)[1]]
    for r in range(3):
        qd = qcyz + jnp.float32((r - 1) * gm)
        w_lo = blk_lo_ref[base * 4 + r]
        w_hi = blk_hi_ref[base * 4 + r]
        start = pl.multiple_of((w_lo // 128) * 128, 128)
        trips = pl.cdiv(w_hi - start, w_chunk)

        def mask_pairs(cand, carry, qd=qd):
            stencil = jnp.abs(qd - cand[13:14, :]) <= 1.0
            if mask == "full":
                stencil &= jnp.abs(qcx - cand[12:13, :]) <= 1.0
            return pair_fn(cand, stencil, carry)

        if hbm_feats and db_feats:
            # double-buffered GROUP DMA: one async copy fills G compute
            # chunks of scratch (group g streams into the other buffer
            # while group g-1's G chunks compute), so the per-copy issue
            # latency amortizes G-ways with zero extra accumulator ALU.
            # Engaged only for very large candidate arrays
            # (>= DB_FEATS_MIN_BYTES): at 1.03M particles the 66 MB array
            # spans enough DRAM rows that a blocking per-chunk copy costs
            # ~0.4 us latency each (272 -> 240 ms/step from plain
            # double-buffering alone); at 129k the latency is already
            # hidden and the dynamic buffer-slot indexing measured 33%
            # SLOWER (23.7 -> 31.4). G = group width / w_chunk comes from
            # the scratch shape (_call_kernel3 sizes it; DB_GROUP_CHUNKS).
            buf, sems = scratch
            gw = buf.shape[2]                          # G * w_chunk
            ng = gw // w_chunk
            # clamp target so a one-past-the-end prefetch of FULL group
            # width stays inside the zero-padded tail
            pad_clamp = ((feats_ref.shape[1] - gw) // 128) * 128

            def copy(g, slot, start=start):
                # floor-align the pad clamp so the 128-multiple promise
                # holds for ANY capacity; an under-aligned clamp may read a
                # few real rows into the dead prefetch, which is harmless
                off = pl.multiple_of(
                    jnp.minimum(start + g * gw, pad_clamp), 128)
                return pltpu.make_async_copy(
                    feats_ref.at[:, pl.ds(off, gw)],
                    buf.at[slot], sems.at[slot])

            copy(0, 0).start()
            groups = pl.cdiv(w_hi - start, gw)

            def group_db(g, carry):
                cur = jax.lax.rem(g, 2)
                copy(g, cur).wait()
                copy(g + 1, 1 - cur).start()
                # all G sub-chunks compute (even past w_hi): over-read
                # lanes are rows outside this run's window — the cyz test
                # re-derives the bounds, so they never pass — or the inert
                # zero-padded tail; branching on the tail count was the
                # measured accumulator-eviction loss (DEVELOPMENT.md)
                for k in range(ng):
                    carry = mask_pairs(
                        buf[cur][:, k * w_chunk:(k + 1) * w_chunk], carry)
                return carry

            accs = jax.lax.fori_loop(0, groups, group_db, accs)
            # exactly one prefetch is still in flight (the prologue's for
            # an empty window): retire it so the semaphores stay balanced
            # for the next window
            tail = jnp.maximum(groups, 0)
            copy(tail, jax.lax.rem(tail, 2)).wait()
        elif hbm_feats:
            buf, sem = scratch

            def chunk_dma(c, carry, start=start):
                off = pl.multiple_of(start + c * w_chunk, 128)
                cp = pltpu.make_async_copy(
                    feats_ref.at[:, pl.ds(off, w_chunk)], buf, sem)
                cp.start()
                cp.wait()
                return mask_pairs(buf[:, :], carry)

            accs = chunk_dma(0, accs)
            accs = jax.lax.fori_loop(1, trips, chunk_dma, accs)
        else:
            def chunk(c, carry, start=start):
                off = pl.multiple_of(start + c * w_chunk, 128)
                return mask_pairs(feats_ref[:, pl.ds(off, w_chunk)], carry)

            accs = chunk(0, accs)
            accs = jax.lax.fori_loop(1, trips, chunk, accs)
    return accs


def _pair_step_a(cand, m, carry, qx, qy, qz, qcv, h2, p6c):
    """One masked candidate chunk of the XSPH + density gather, in the
    reference's per-pair difference form (cpp:483, 688-695). Candidate
    rows: [x y z | vx vy vz | vol_prev | mass | ...].

    The Poly6 support test r^2 <= h^2 is folded into the weight as
    max(h^2 - r^2, 0) — exactly 0 for every out-of-support pair, bit-equal
    for every in-support pair — so `m` only needs to carry whatever the
    geometry cannot decide (the run-window disjointness test; see
    _gather_loop4 mask="yz")."""
    a_d, a_x, a_y, a_z = carry
    dx = qx - cand[0:1, :]
    dy = qy - cand[1:2, :]
    dz = qz - cand[2:3, :]
    r2 = dx * dx + dy * dy + dz * dz
    t = jnp.maximum(h2 - r2, 0.0)
    w6 = jnp.where(m, p6c * t * t * t, 0.0)
    wv = w6 * cand[6:7, :]                               # * vol_prev_j
    return (a_d + w6 * cand[7:8, :],
            a_x + wv * (cand[3:4, :] - qcv[:, 0:1]),
            a_y + wv * (cand[4:5, :] - qcv[:, 1:2]),
            a_z + wv * (cand[5:6, :] - qcv[:, 2:3]))


def _pair_step_b(cand, m, carry, qx, qy, qz, qp, qiv, qvm, h, inv_h,
                 spiky_c, bs_c, mu, with_ep):
    """One masked candidate chunk of the force + Vm Laplacian gather, in
    the reference's per-pair difference form (cpp:550-563). Candidate
    rows: [x y z | vx vy vz | vol | pres | vm | ...]."""
    a_ax, a_ay, a_az, a_lap = carry
    dx = qx - cand[0:1, :]
    dy = qy - cand[1:2, :]
    dz = qz - cand[2:3, :]
    r2 = dx * dx + dy * dy + dz * dz
    p = m & (r2 > _PAIR_EPS)                             # cpp:546
    inv_rr = jax.lax.rsqrt(jnp.where(p, r2, 1.0))
    rr = r2 * inv_rr
    # fold the pair mask into the volume ONCE: every weight below scales
    # by volm, so masked lanes contribute exactly 0
    volm = jnp.where(p, cand[6:7, :], 0.0)
    # spiky support [0, h] via relu(h - r) (hr < 0 -> weight 0)
    hr = jnp.maximum(h - rr, 0.0)
    common = volm * (spiky_c * hr)
    f_p = common * (hr * (-0.5) * inv_rr) * (qp + cand[7:8, :])
    f_v = mu * common
    a_ax = a_ax + (f_v * (cand[3:4, :] - qiv[:, 0:1]) - f_p * dx)
    a_ay = a_ay + (f_v * (cand[4:5, :] - qiv[:, 1:2]) - f_p * dy)
    a_az = a_az + (f_v * (cand[5:6, :] - qiv[:, 2:3]) - f_p * dz)
    if with_ep:
        qr = rr * inv_h
        # B_spline_2 (cpp:186-196) in relu form:
        #   qr < 1: bs_c*(-3 + 4.5 qr);  1 <= qr < 2: bs_c*1.5*(2-qr)
        # == bs_c*(1.5*relu(2 - qr) - 6*relu(1 - qr))
        w2 = bs_c * (1.5 * jnp.maximum(2.0 - qr, 0.0)
                     - 6.0 * jnp.maximum(1.0 - qr, 0.0))
        a_lap = a_lap + (volm * w2) * (cand[8:9, :] - qvm)
    return (a_ax, a_ay, a_az, a_lap)


def _a_epilogue(cfg: SimConfig, with_ep: bool, mass, vm, stim, iion,
                w_rec, dens, P: _PhysConsts | None = None):
    """EOS pressure + stim gate + FHN reaction on gathered densities
    (Compute_Density_SingPressure cpp:483-503 + calculate_cell_model
    cpp:575-593). Shapes broadcast; returns (dens', pres, react, iion',
    w'). `P` carries the physics scalars (baked from `cfg` when None —
    the dynamic-params path passes SMEM reads instead; clamps, quirk
    switches and geometry always come from the static cfg)."""
    if P is None:
        P = _phys_consts(cfg)
    dt = jnp.float32(cfg.time_delta)
    h2 = jnp.float32(cfg.kernel_h * cfg.kernel_h)
    p6c = jnp.float32(cfg.poly6_constant)
    if cfg.quirk_double_self_density:                    # cpp:483
        dens = dens + mass * (p6c * h2 * h2 * h2)
    pres = P.k_stiffness * (dens - P.stand_density)      # cpp:486
    if with_ep:
        pres = pres - vm * P.voltage_constant            # cpp:491
    pres_c = jnp.clip(pres, -cfg.max_pressure, cfg.max_pressure)
    if cfg.quirk_pressure_stim_gate:                     # cpp:493-503
        pres = jnp.where(stim > 0.0, pres_c, jnp.float32(-0.0))
    else:
        pres = pres_c

    if with_ep:
        # FHN reaction (calculate_cell_model, cpp:575-593)
        u = (vm - P.fh_vr) / P.fh_denom
        d_iion = dt * (P.fh_c1 * u * (u - P.fh_asd) * (u - 1.0)
                       + P.fh_c2 * w_rec) / mass
        iion_n = (iion + d_iion) if cfg.quirk_iion_accumulate else d_iion
        w_n = w_rec + dt * P.fh_c3 * (u - P.fh_c4 * w_rec) / mass
        react = (iion_n - stim * (dt / mass)) \
            / P.cm_capacitance                           # cpp:571
    else:
        zero = jnp.zeros_like(dens)
        iion_n, w_n, react = zero, zero, zero
    return dens, pres, react, iion_n, w_n


def _b_epilogue(cfg: SimConfig, with_ep: bool, qpos, qiv, qvm, dens,
                react, mass, acc_raw, lap, P: _PhysConsts | None = None):
    """Acceleration normalization + voltage update + semi-implicit Euler +
    walls (Compute_Force tail cpp:568-571 + Update_Properties
    cpp:596-651). Returns (pos', vel', vm', inter_vm, acc). `P` as in
    `_a_epilogue`."""
    if P is None:
        P = _phys_consts(cfg)
    dt = jnp.float32(cfg.time_delta)
    dens_g = jnp.where(dens > 0.0, dens, 1.0)
    acc = acc_raw / dens_g                               # cpp:568
    dtm = dt / mass
    if with_ep:
        inter_vm = lap + P.vm_scale * lap - react        # cpp:571
        vm_new = qvm + inter_vm * dtm                    # cpp:612
        vm_new = jnp.clip(vm_new, -cfg.max_voltage, cfg.max_voltage)
    else:
        inter_vm = jnp.zeros_like(qvm)
        vm_new = qvm

    # semi-implicit Euler + walls (cpp:596-651); the fixed-particle /
    # inactive-lane keeps happen in original order after the unsort
    vel = qiv + acc * dtm                                # cpp:608
    pos = qpos + vel * dt                                # cpp:609
    p_cols, v_cols = [], []
    for ax in range(3):
        wlim = jnp.float32(cfg.world_size[ax])
        p = pos[:, ax:ax + 1]
        v = vel[:, ax:ax + 1]
        low = p < 0.0
        high = p >= wlim
        v = jnp.where(low | high, v * jnp.float32(cfg.wall_hit), v)
        p = jnp.where(low, 0.0, p)
        p = jnp.where(high, wlim - 1e-4, p)
        p_cols.append(jnp.clip(p, 0.0, wlim))            # cpp:649
        v_cols.append(v)
    return (jnp.concatenate(p_cols, axis=1), jnp.concatenate(v_cols, axis=1),
            vm_new, inter_vm, acc)


def _kernel_a3(blk_lo_ref, blk_hi_ref, *refs, cfg: SimConfig, w_chunk: int,
               sub_q: int, with_ep: bool, stencil: str = "hash9",
               hbm_feats: bool = False, db_feats: bool = False,
               dyn: bool = False):
    """XSPH + density gather, then EOS + FHN epilogue. Writes OUT_A.
    With dyn=True the first input ref is the (1, 16) SMEM dynamic-params
    operand (_DYN_SLOTS); physics scalars read from it instead of being
    baked as immediates."""
    if dyn:
        dynp_ref, qm_ref, feats_ref, out_ref, *scratch = refs
    else:
        dynp_ref = None
        qm_ref, feats_ref, out_ref, *scratch = refs
    P = _phys_consts(cfg, dynp_ref)
    bid = pl.program_id(0)
    nsub = qm_ref.shape[0] // sub_q
    h2 = jnp.float32(cfg.kernel_h * cfg.kernel_h)
    p6c = jnp.float32(cfg.poly6_constant)

    for sb in range(nsub):
        lo_q = sb * sub_q
        base = bid * nsub + sb
        sl = slice(lo_q, lo_q + sub_q)
        qx = qm_ref[sl, 0:1]
        qy = qm_ref[sl, 1:2]
        qz = qm_ref[sl, 2:3]
        qcv = qm_ref[sl, 3:6]
        mass = qm_ref[sl, 6:7]
        vm = qm_ref[sl, 8:9]
        stim = qm_ref[sl, 9:10]
        qh = qm_ref[sl, 12:13]
        qcyz = qm_ref[sl, 13:14]

        # per-pair difference form (the reference's own accumulation shape,
        # cpp:688-695): 4 accumulators keep the chunk loop register-resident
        def pair(cand, m, carry, qx=qx, qy=qy, qz=qz, qcv=qcv):
            return _pair_step_a(cand, m, carry, qx, qy, qz, qcv, h2, p6c)

        zeros = jnp.zeros((sub_q, w_chunk), jnp.float32)
        if stencil == "xyz3":
            # mask="yz": Poly6's support clamp subsumes the fast-axis cell
            # test (see _gather_loop4); requires the feats_a inert-lane
            # contract (mass/vol zeroed on dead rows, build_qm_feats) AND
            # cell_size >= kernel_h (cells >= 2 apart must be > h apart —
            # the reference's own geometry, cpp:31). A finer grid keeps the
            # full reference 27-cell stencil semantics.
            mask_a = "yz" if cfg.cell_size >= cfg.kernel_h else "full"
            a_d, a_x, a_y, a_z = _gather_loop4(
                blk_lo_ref, blk_hi_ref, feats_ref, scratch, w_chunk,
                qh, qcyz, base, pair, (zeros,) * 4, cfg, hbm_feats,
                db_feats, mask=mask_a)
        else:
            a_d, a_x, a_y, a_z = _gather_loop(
                blk_lo_ref, blk_hi_ref, feats_ref, scratch, w_chunk,
                qh, base, pair, (zeros,) * 4, cfg, hbm_feats)

        red = lambda a: jnp.sum(a, axis=1, keepdims=True)
        ivel = qcv + jnp.concatenate(
            [red(a_x), red(a_y), red(a_z)], axis=1) \
            * P.velocity_mixing                              # cpp:699
        dens, pres, react, iion_n, w_n = _a_epilogue(
            cfg, with_ep, mass, vm, stim, qm_ref[sl, 10:11],
            qm_ref[sl, 11:12], red(a_d), P=P)

        out_ref[sl, 0:3] = qm_ref[sl, 0:3]                   # pos
        out_ref[sl, 3:6] = ivel
        out_ref[sl, 6:7] = pres
        out_ref[sl, 7:8] = vm
        out_ref[sl, 8:9] = dens
        out_ref[sl, 9:10] = react
        out_ref[sl, 10:11] = mass
        out_ref[sl, 11:12] = iion_n
        out_ref[sl, 12:15] = qm_ref[sl, 12:15]               # chash, spares
        out_ref[sl, 15:16] = w_n


def _kernel_b3(blk_lo_ref, blk_hi_ref, *refs, cfg: SimConfig, w_chunk: int,
               sub_q: int, with_ep: bool, stencil: str = "hash9",
               hbm_feats: bool = False, db_feats: bool = False,
               dyn: bool = False):
    """Force + Vm Laplacian gather, then full integration epilogue
    (Update_Properties, cpp:596-651). Reads OUT_A as QM, writes OUT_B.
    `dyn` as in `_kernel_a3`."""
    if dyn:
        dynp_ref, qm_ref, feats_ref, out_ref, *scratch = refs
    else:
        dynp_ref = None
        qm_ref, feats_ref, out_ref, *scratch = refs
    P = _phys_consts(cfg, dynp_ref)
    bid = pl.program_id(0)
    nsub = qm_ref.shape[0] // sub_q
    h = jnp.float32(cfg.kernel_h)
    inv_h = jnp.float32(1.0 / cfg.kernel_h)
    spiky_c = jnp.float32(cfg.spiky_constant)
    bs_c = jnp.float32(cfg.b_spline_constant)
    mu = P.mu_viscosity

    for sb in range(nsub):
        lo_q = sb * sub_q
        base = bid * nsub + sb
        sl = slice(lo_q, lo_q + sub_q)
        qpos = qm_ref[sl, 0:3]
        qx = qm_ref[sl, 0:1]
        qy = qm_ref[sl, 1:2]
        qz = qm_ref[sl, 2:3]
        qiv = qm_ref[sl, 3:6]
        qp = qm_ref[sl, 6:7]
        qvm = qm_ref[sl, 7:8]
        dens = qm_ref[sl, 8:9]
        react = qm_ref[sl, 9:10]
        mass = qm_ref[sl, 10:11]
        qh = qm_ref[sl, 12:13]
        qcyz = qm_ref[sl, 13:14]

        # per-pair difference form, exactly the reference's accumulation
        # shape (cpp:550-563): acc -= f_p*(pos_i - pos_j), acc +=
        # f_v*(u_j - u_i), lap += vw*(vm_j - vm_i). 4 accumulators keep the
        # chunk loop register-resident (10 split-sum tiles spilled to VMEM).
        def pair(cand, m, carry, qx=qx, qy=qy, qz=qz, qp=qp, qiv=qiv,
                 qvm=qvm):
            return _pair_step_b(cand, m, carry, qx, qy, qz, qp, qiv, qvm,
                                h, inv_h, spiky_c, bs_c, mu, with_ep)

        zeros = jnp.zeros((sub_q, w_chunk), jnp.float32)
        if stencil == "xyz3":
            a_ax, a_ay, a_az, a_lap = _gather_loop4(
                blk_lo_ref, blk_hi_ref, feats_ref, scratch, w_chunk,
                qh, qcyz, base, pair, (zeros,) * 4, cfg, hbm_feats,
                db_feats)
        else:
            a_ax, a_ay, a_az, a_lap = _gather_loop(
                blk_lo_ref, blk_hi_ref, feats_ref, scratch, w_chunk,
                qh, base, pair, (zeros,) * 4, cfg, hbm_feats)

        red = lambda a: jnp.sum(a, axis=1, keepdims=True)
        pos_n, vel_n, vm_new, inter_vm, acc = _b_epilogue(
            cfg, with_ep, qpos, qiv, qvm, dens, react, mass,
            jnp.concatenate([red(a_ax), red(a_ay), red(a_az)], axis=1),
            red(a_lap), P=P)

        out_ref[sl, 0:3] = pos_n
        out_ref[sl, 3:6] = vel_n
        out_ref[sl, 6:7] = vm_new
        out_ref[sl, 7:8] = dens
        out_ref[sl, 8:9] = qp
        out_ref[sl, 9:10] = qm_ref[sl, 11:12]                # iion'
        out_ref[sl, 10:11] = qm_ref[sl, 15:16]               # w'
        out_ref[sl, 11:12] = inter_vm
        out_ref[sl, 12:15] = acc
        out_ref[sl, 15:16] = jnp.zeros((sub_q, 1), jnp.float32)


def _call_kernel3(kernel, feats_t, qmat, blk_lo, blk_hi, q_block, w_chunk,
                  sub_q, cfg, with_ep, interpret, q_slice=None,
                  stencil: str = "hash9", dynp=None):
    stride = 4 if stencil == "xyz3" else 16  # windows per sub-block (flat)
    if sub_q > q_block or q_block % sub_q:
        raise ValueError(f"sub_q={sub_q} must divide q_block={q_block}")
    if (qmat.shape[0] // sub_q) * stride * 8 > 900_000:
        raise ValueError(
            f"sub_q={sub_q} yields {qmat.shape[0] // sub_q} window blocks; "
            "their SMEM-prefetched bounds would exceed the 1 MB scalar "
            "memory budget — use a larger sub_q")
    if q_slice is not None:
        off, cnt = q_slice
        qmat = _slice_rows(qmat, off, cnt)
        blk_lo = jax.lax.dynamic_slice(blk_lo, (off // sub_q * stride,),
                                       (cnt // sub_q * stride,))
        blk_hi = jax.lax.dynamic_slice(blk_hi, (off // sub_q * stride,),
                                       (cnt // sub_q * stride,))
    n = qmat.shape[0]
    if n % q_block:
        raise ValueError(f"query rows {n} not divisible by q_block="
                         f"{q_block}; pad the state capacity")
    b = n // q_block
    padded = feats_t.size + 16 * w_chunk
    hbm_feats = padded * 4 > VMEM_FEATS_LIMIT_BYTES
    db_feats = padded * 4 > DB_FEATS_MIN_BYTES
    # group-DMA width on the double-buffered HBM path (DB_GROUP_CHUNKS):
    # the zero-padded tail must cover one FULL group so the one-past-the-
    # end prefetch always lands on inert lanes
    group = DB_GROUP_CHUNKS if (stencil == "xyz3" and hbm_feats
                                and db_feats) else 1
    feats_t = jnp.pad(feats_t, ((0, 0), (0, w_chunk * group)))
    in_specs = [
        pl.BlockSpec((q_block, 16), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=(pltpu.HBM if hbm_feats
                                   else pltpu.VMEM)),
    ]
    inputs = (qmat, feats_t)
    if dynp is not None:
        # dynamic physics params ride along as one (1, 16) SMEM operand
        # (scalars must be 2-D in SMEM); see _DYN_SLOTS
        in_specs.insert(0, pl.BlockSpec((1, 16), lambda i, *_: (0, 0),
                                        memory_space=pltpu.SMEM))
        inputs = (dynp, qmat, feats_t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((q_block, 16), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        # very large xyz3 candidate arrays double-buffer a GROUP DMA (two
        # group-wide buffers + two sems, _gather_loop4); otherwise one
        # blocking chunk buffer
        scratch_shapes=(
            [] if not hbm_feats
            else [pltpu.VMEM((2, 16, w_chunk * group), jnp.float32),
                  pltpu.SemaphoreType.DMA((2,))]
            if (stencil == "xyz3" and db_feats)
            else [pltpu.VMEM((16, w_chunk), jnp.float32),
                  pltpu.SemaphoreType.DMA(())]),
    )
    kw = {} if dynp is None else {"dyn": True}
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg, w_chunk=w_chunk, sub_q=sub_q,
                          with_ep=with_ep, stencil=stencil,
                          hbm_feats=hbm_feats, db_feats=db_feats, **kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 16), jnp.float32),
        interpret=interpret,
    )(blk_lo, blk_hi, *inputs)


def sweep_a3(fs, feats_a, blk_lo, blk_hi, q_block: int, w_chunk: int,
             cfg: SimConfig, with_ep: bool = True,
             interpret: bool | None = None, q_slice=None,
             sub_q: int = 64, stencil: str = "hash9", dynp=None):
    """QM_A (N,16) + feature matrix -> OUT_A (N,16), sorted order.

    stencil="hash9": 9 (dy,dz) run windows + linear-hash mask (bookkeeping
    from sweep_bookkeeping2); "xyz3": 3 merged z-plane windows + per-axis
    (cx, cyz) mask (sweep_bookkeeping3). `dynp`: optional (1, 16) traced
    physics-constant operand (build_dynp) — None bakes cfg's values."""
    if interpret is None:
        interpret = _interpret_default()
    return _call_kernel3(_kernel_a3, feats_a, fs, blk_lo, blk_hi, q_block,
                         w_chunk, sub_q, cfg, with_ep, interpret, q_slice,
                         stencil=stencil, dynp=dynp)


def sweep_b3(out_a, feats_b, blk_lo, blk_hi, q_block: int, w_chunk: int,
             cfg: SimConfig, with_ep: bool = True,
             interpret: bool | None = None, q_slice=None,
             sub_q: int = 64, stencil: str = "hash9", dynp=None):
    """OUT_A (N,16) + feature matrix -> OUT_B (N,16), sorted order."""
    if interpret is None:
        interpret = _interpret_default()
    return _call_kernel3(_kernel_b3, feats_b, out_a, blk_lo, blk_hi,
                         q_block, w_chunk, sub_q, cfg, with_ep, interpret,
                         q_slice, stencil=stencil, dynp=dynp)


def _kernel_lap3(blk_lo_ref, blk_hi_ref, qm_ref, feats_ref, out_ref,
                 *scratch, cfg: SimConfig, w_chunk: int, sub_q: int,
                 with_ep: bool, stencil: str = "xyz3",
                 hbm_feats: bool = False, db_feats: bool = False):
    """Vm-Laplacian-ONLY gather for the frozen-geometry monodomain mode
    (the diffusion half of Compute_Force, cpp:562-563, with none of the
    force math): two accumulators instead of sweep B's four plus the
    force feature traffic. Geometry is static in that mode, so callers
    hoist the bookkeeping once and run only this per step.

    qm cols: [x y z | vm | - ... | cx @12, cyz @13]
    feats rows: [x y z | vol | vm | - ... | cx @12, cyz @13, -, -]
    out col 0: lap_i = sum_j vol_j * B_spline_2(r) * (vm_j - vm_i).

    The mask stays the FULL per-axis test: B_spline_2's support is 2h,
    so the reference's 27-cell truncation is a semantic mask the weight
    cannot reproduce (same argument as sweep B, _gather_loop4)."""
    bid = pl.program_id(0)
    nsub = qm_ref.shape[0] // sub_q
    inv_h = jnp.float32(1.0 / cfg.kernel_h)
    bs_c = jnp.float32(cfg.b_spline_constant)

    for sb in range(nsub):
        lo_q = sb * sub_q
        base = bid * nsub + sb
        sl = slice(lo_q, lo_q + sub_q)
        qx = qm_ref[sl, 0:1]
        qy = qm_ref[sl, 1:2]
        qz = qm_ref[sl, 2:3]
        qvm = qm_ref[sl, 3:4]
        qh = qm_ref[sl, 12:13]
        qcyz = qm_ref[sl, 13:14]

        def pair(cand, m, carry, qx=qx, qy=qy, qz=qz):
            a_vw, a_vwvm = carry
            dx = qx - cand[0:1, :]
            dy = qy - cand[1:2, :]
            dz = qz - cand[2:3, :]
            r2 = dx * dx + dy * dy + dz * dz
            p = m & (r2 > _PAIR_EPS)                         # cpp:546
            inv_rr = jax.lax.rsqrt(jnp.where(p, r2, 1.0))
            qr = (r2 * inv_rr) * inv_h
            # B_spline_2 (cpp:186-196) in relu form (see _pair_step_b)
            w2 = bs_c * (1.5 * jnp.maximum(2.0 - qr, 0.0)
                         - 6.0 * jnp.maximum(1.0 - qr, 0.0))
            vw = jnp.where(p, cand[3:4, :] * w2, 0.0)
            return (a_vw + vw, a_vwvm + vw * cand[4:5, :])

        zeros = jnp.zeros((sub_q, w_chunk), jnp.float32)
        if stencil != "xyz3":
            raise NotImplementedError("sweep_lap3 runs on the xyz3 "
                                      "merged-window bookkeeping only")
        a_vw, a_vwvm = _gather_loop4(
            blk_lo_ref, blk_hi_ref, feats_ref, scratch, w_chunk,
            qh, qcyz, base, pair, (zeros,) * 2, cfg, hbm_feats, db_feats)

        red = lambda a: jnp.sum(a, axis=1, keepdims=True)
        out_ref[sl, 0:1] = red(a_vwvm) - red(a_vw) * qvm
        out_ref[sl, 1:16] = jnp.zeros((sub_q, 15), jnp.float32)


def sweep_lap3(qm, feats, blk_lo, blk_hi, q_block: int, w_chunk: int,
               cfg: SimConfig, interpret: bool | None = None,
               q_slice=None, sub_q: int = 128):
    """Laplacian-only sweep over xyz3 merged windows -> (N,16) with the
    Laplacian in column 0 (sorted order). See _kernel_lap3."""
    if interpret is None:
        interpret = _interpret_default()
    return _call_kernel3(_kernel_lap3, feats, qm, blk_lo, blk_hi,
                         q_block, w_chunk, sub_q, cfg, True, interpret,
                         q_slice, stencil="xyz3")


def feats_from_out_a(out_a, vol):
    """(16, N) candidate features for sweep B from OUT_A columns."""
    n = out_a.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    return jnp.stack([out_a[:, 0], out_a[:, 1], out_a[:, 2],
                      out_a[:, 3], out_a[:, 4], out_a[:, 5],
                      vol, out_a[:, 6], out_a[:, 7], z, z, z,
                      out_a[:, 12], out_a[:, 13], z, z], axis=0)


def build_qm_feats(state, f1, f2, order):
    """Sorted QM_A matrix + sweep-A candidate features (single source of
    the implicit column contract — see the module docstring layouts).

    f1/f2: the two stencil feature columns in ORIGINAL order (chash +
    zeros for the hash9 stencil; cx + cyz for xyz3). Returns (fs (N,16),
    feats_a (16,N)); requires state.corrected_vel to be current.

    Sweep-A inert-lane contract: dead candidate rows (inactive /
    out-of-grid, f1 == sentinel) get mass = vol = 0 here, because the
    xyz3 sweep-A mask no longer tests the sentinel-bearing cx feature
    (_gather_loop4 mask="yz") — every sweep-A accumulator term scales by
    one of the two, so zeroing them is what keeps dead rows contributing
    exactly nothing. The QUERY matrix `fs` keeps the real mass (the FHN
    epilogue divides by it)."""
    n = state.pos.shape[0]
    fields = jnp.concatenate([
        state.pos, state.corrected_vel, state.mass[:, None],
        state.dens[:, None], state.vm[:, None], state.stim[:, None],
        state.iion[:, None], state.w[:, None], f1[:, None], f2[:, None],
        jnp.zeros((n, 2), jnp.float32)], axis=1)
    fs = fields[order]
    return fs, feats_a_from_fs(fs)


def feats_a_from_fs(fs):
    """(16, N) sweep-A candidate features from a QM_A matrix — the SINGLE
    implementation of the sweep-A inert-lane contract, shared by the
    single-chip, gather-sharded and halo paths (their QM_A matrices are
    built differently but carry the same columns). Dead rows (sentinel in
    the f1/cx column 12: inactive core padding, invalid exchanged halo
    rows, edge devices' all-sentinel blocks) get mass = vol = 0 — every
    sweep-A accumulator term scales by one of the two, which is what
    keeps them inert now that the xyz3 sweep-A mask no longer tests the
    sentinel-bearing feature (mask="yz"). Live rows have f1 >= 0 (a cell
    coordinate or linear hash)."""
    n = fs.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    live = fs[:, 12] >= 0.0
    mass_c = jnp.where(live, fs[:, 6], 0.0)
    vol_prev = jnp.where(live & (fs[:, 7] > 0.0), fs[:, 6] / fs[:, 7], 0.0)
    return jnp.stack([fs[:, 0], fs[:, 1], fs[:, 2], fs[:, 3], fs[:, 4],
                      fs[:, 5], vol_prev, mass_c, z, z, z, z,
                      fs[:, 12], fs[:, 13], z, z], axis=0)


# ---------------------------------------------------------------------------
# v5: packed per-sub-block candidate slabs
# ---------------------------------------------------------------------------
#
# The v4 merged windows test ~2300 candidate slots per query on the flagship
# cloud against ~470 stencil-true candidates: the window spans the full
# dilated HASH interval, which at G_fast = 38 is dominated by rows whose
# fast-axis cell is far outside the query's +-1 range. v5 removes that waste
# structurally: sweep_bookkeeping5 computes the nine TIGHT dilated runs per
# sub-block and left-packs their rows; an XLA row-gather materializes each
# block's candidates as a dense private slab (B, 16, kb); the kernel sweeps
# its own slab with per-block dynamic trip counts. Measured on the flagship
# cloud: ~876 tested slots/query at sub_q=32 (2.6x fewer), at the cost of
# one gathered slab write+read per sweep (~61 MB vs the 1.2 MB shared
# feature matrix). No SMEM window bounds, no start alignment, no manual
# HBM DMA: the slabs ride the Pallas pipeline via BlockSpec.

# Slab feature rows mirror the v4 (16, N) candidate layout exactly
# ([pos3 | vel3 | vol | mass/pres | vm | - - - | cf cm cs | -]): 16 rows
# = two aligned (8, 128) sublane tiles, so every row slice the kernel
# takes stays tile-local. A 12-row layout saved 25% slab bandwidth but
# put the coordinate rows across a tile boundary — Mosaic relayouts blew
# the compile time up ~10x and the kernel ran slower.
_PACK_ROWS = 16


def _kernel_a5(trips_ref, qm_ref, packed_ref, out_ref, *, cfg: SimConfig,
               w_chunk: int, sub_q: int, with_ep: bool,
               static_trips: bool = False):
    """Packed-slab XSPH + density gather + EOS/FHN epilogue. Writes OUT_A.

    Phase 1 (per sub-block): sweep the block's slab, store raw gather sums
    in the output columns. Phase 2 (whole q_block): the pointwise epilogue
    runs once over full-width tiles, so small sub_q does not inflate the
    epilogue op count."""
    bid = pl.program_id(0)
    q = qm_ref.shape[0]
    nsub = q // sub_q
    h2 = jnp.float32(cfg.kernel_h * cfg.kernel_h)
    p6c = jnp.float32(cfg.poly6_constant)

    for sb in range(nsub):
        sl = slice(sb * sub_q, (sb + 1) * sub_q)
        base = bid * nsub + sb
        qx = qm_ref[sl, 0:1]
        qy = qm_ref[sl, 1:2]
        qz = qm_ref[sl, 2:3]
        qcv = qm_ref[sl, 3:6]
        qcf = qm_ref[sl, 12:13]
        qcm = qm_ref[sl, 13:14]
        qcs = qm_ref[sl, 14:15]

        def chunk(c, carry, sb=sb, qx=qx, qy=qy, qz=qz, qcv=qcv,
                  qcf=qcf, qcm=qcm, qcs=qcs):
            off = pl.multiple_of(c * w_chunk, 128)
            cand = packed_ref[sb, :, pl.ds(off, w_chunk)]    # (16, Wc)
            m = ((jnp.abs(qcf - cand[12:13, :]) <= 1.0)
                 & (jnp.abs(qcm - cand[13:14, :]) <= 1.0)
                 & (jnp.abs(qcs - cand[14:15, :]) <= 1.0))
            return _pair_step_a(cand, m, carry, qx, qy, qz, qcv, h2, p6c)

        zeros = jnp.zeros((sub_q, w_chunk), jnp.float32)
        accs = chunk(0, (zeros,) * 4)
        if static_trips:
            # fully unrolled sweep of the padded slab: ~kb/avg-union more
            # masked ALU, but no SMEM trip reads and a branch-free
            # straight-line loop body Mosaic can software-pipeline
            kb = packed_ref.shape[2]
            for c in range(1, kb // w_chunk):
                accs = chunk(c, accs)
            a_d, a_x, a_y, a_z = accs
        else:
            a_d, a_x, a_y, a_z = jax.lax.fori_loop(1, trips_ref[base],
                                                   chunk, accs)
        red = lambda a: jnp.sum(a, axis=1, keepdims=True)
        out_ref[sl, 8:9] = red(a_d)
        out_ref[sl, 3:4] = red(a_x)
        out_ref[sl, 4:5] = red(a_y)
        out_ref[sl, 5:6] = red(a_z)

    # block-wide pointwise epilogue (full q_block rows)
    mass = qm_ref[:, 6:7]
    vm = qm_ref[:, 8:9]
    stim = qm_ref[:, 9:10]
    ivel = qm_ref[:, 3:6] + out_ref[:, 3:6] \
        * jnp.float32(cfg.velocity_mixing)                   # cpp:699
    dens, pres, react, iion_n, w_n = _a_epilogue(
        cfg, with_ep, mass, vm, stim, qm_ref[:, 10:11], qm_ref[:, 11:12],
        out_ref[:, 8:9])
    out_ref[:, 0:3] = qm_ref[:, 0:3]                         # pos
    out_ref[:, 3:6] = ivel
    out_ref[:, 6:7] = pres
    out_ref[:, 7:8] = vm
    out_ref[:, 8:9] = dens
    out_ref[:, 9:10] = react
    out_ref[:, 10:11] = mass
    out_ref[:, 11:12] = iion_n
    out_ref[:, 12:15] = qm_ref[:, 12:15]                     # cf, cm, cs
    out_ref[:, 15:16] = w_n


def _kernel_b5(trips_ref, qm_ref, packed_ref, out_ref, *, cfg: SimConfig,
               w_chunk: int, sub_q: int, with_ep: bool,
               static_trips: bool = False):
    """Packed-slab force + Vm Laplacian gather + integration epilogue.
    Reads OUT_A as QM, writes OUT_B (same column contract as _kernel_b3)."""
    bid = pl.program_id(0)
    q = qm_ref.shape[0]
    nsub = q // sub_q
    h = jnp.float32(cfg.kernel_h)
    inv_h = jnp.float32(1.0 / cfg.kernel_h)
    spiky_c = jnp.float32(cfg.spiky_constant)
    bs_c = jnp.float32(cfg.b_spline_constant)
    mu = jnp.float32(cfg.mu_viscosity)

    for sb in range(nsub):
        sl = slice(sb * sub_q, (sb + 1) * sub_q)
        base = bid * nsub + sb
        qx = qm_ref[sl, 0:1]
        qy = qm_ref[sl, 1:2]
        qz = qm_ref[sl, 2:3]
        qiv = qm_ref[sl, 3:6]
        qp = qm_ref[sl, 6:7]
        qvm = qm_ref[sl, 7:8]
        qcf = qm_ref[sl, 12:13]
        qcm = qm_ref[sl, 13:14]
        qcs = qm_ref[sl, 14:15]

        def chunk(c, carry, sb=sb, qx=qx, qy=qy, qz=qz, qp=qp, qiv=qiv,
                  qvm=qvm, qcf=qcf, qcm=qcm, qcs=qcs):
            off = pl.multiple_of(c * w_chunk, 128)
            cand = packed_ref[sb, :, pl.ds(off, w_chunk)]    # (16, Wc)
            m = ((jnp.abs(qcf - cand[12:13, :]) <= 1.0)
                 & (jnp.abs(qcm - cand[13:14, :]) <= 1.0)
                 & (jnp.abs(qcs - cand[14:15, :]) <= 1.0))
            return _pair_step_b(cand, m, carry, qx, qy, qz, qp, qiv, qvm,
                                h, inv_h, spiky_c, bs_c, mu, with_ep)

        zeros = jnp.zeros((sub_q, w_chunk), jnp.float32)
        accs = chunk(0, (zeros,) * 4)
        if static_trips:
            kb = packed_ref.shape[2]
            for c in range(1, kb // w_chunk):
                accs = chunk(c, accs)
            a_ax, a_ay, a_az, a_lap = accs
        else:
            a_ax, a_ay, a_az, a_lap = jax.lax.fori_loop(
                1, trips_ref[base], chunk, accs)
        red = lambda a: jnp.sum(a, axis=1, keepdims=True)
        out_ref[sl, 12:13] = red(a_ax)
        out_ref[sl, 13:14] = red(a_ay)
        out_ref[sl, 14:15] = red(a_az)
        out_ref[sl, 11:12] = red(a_lap)

    # block-wide integration epilogue (full q_block rows)
    pos_n, vel_n, vm_new, inter_vm, acc = _b_epilogue(
        cfg, with_ep, qm_ref[:, 0:3], qm_ref[:, 3:6], qm_ref[:, 7:8],
        qm_ref[:, 8:9], qm_ref[:, 9:10], qm_ref[:, 10:11],
        out_ref[:, 12:15], out_ref[:, 11:12])
    iion_n = qm_ref[:, 11:12]
    w_n = qm_ref[:, 15:16]
    dens = qm_ref[:, 8:9]
    qp_all = qm_ref[:, 6:7]
    out_ref[:, 0:3] = pos_n
    out_ref[:, 3:6] = vel_n
    out_ref[:, 6:7] = vm_new
    out_ref[:, 7:8] = dens
    out_ref[:, 8:9] = qp_all
    out_ref[:, 9:10] = iion_n
    out_ref[:, 10:11] = w_n
    out_ref[:, 11:12] = inter_vm
    out_ref[:, 12:15] = acc
    out_ref[:, 15:16] = jnp.zeros((q, 1), jnp.float32)


def _call_kernel5(kernel, packed, qmat, trips, q_block, w_chunk, sub_q,
                  cfg, with_ep, interpret, static_trips=False):
    n = qmat.shape[0]
    b, rows, kb = packed.shape
    if rows != _PACK_ROWS:
        raise ValueError(f"packed slab has {rows} feature rows, expected "
                         f"{_PACK_ROWS}")
    if sub_q > q_block or q_block % sub_q:
        raise ValueError(f"sub_q={sub_q} must divide q_block={q_block}")
    if n % q_block:
        raise ValueError(f"query rows {n} not divisible by q_block="
                         f"{q_block}; pad the state capacity")
    if kb % w_chunk:
        raise ValueError(f"kb={kb} must be a multiple of w_chunk={w_chunk}")
    if b * sub_q != n:
        raise ValueError(f"packed blocks {b} x sub_q={sub_q} != rows {n}")
    # the (B,) trips array is scalar-prefetched whole into SMEM: same
    # ~900 kB honest budget as _call_kernel3's window bounds (1 MB SMEM
    # minus headroom). Multi-million-particle scenes at small sub_q
    # overflow it — fail here with guidance instead of an opaque Mosaic
    # compile error.
    if b * 4 > 900_000:
        raise ValueError(
            f"v5 trips array ({b} blocks x 4 B = {b * 4 / 1e6:.2f} MB) "
            "exceeds the SMEM scalar-prefetch budget; use a larger sub_q "
            f"(>= {int((n * 4 // 900_000 // 128 + 1) * 128)}) or the v4 "
            "impl for this capacity")
    nsub = q_block // sub_q
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                               # trips (B,)
        grid=(n // q_block,),
        in_specs=[
            pl.BlockSpec((q_block, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsub, _PACK_ROWS, kb), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_block, 16), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg, w_chunk=w_chunk, sub_q=sub_q,
                          with_ep=with_ep, static_trips=static_trips),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 16), jnp.float32),
        interpret=interpret,
    )(trips, qmat, packed)


def sweep_a5(fs, packed_a, trips, q_block: int, w_chunk: int,
             cfg: SimConfig, with_ep: bool = True,
             interpret: bool | None = None, sub_q: int = 32,
             static_trips: bool = False):
    """QM_A (N,16) + packed slabs (B,16,kb) -> OUT_A (N,16), sorted order."""
    if interpret is None:
        interpret = _interpret_default()
    return _call_kernel5(_kernel_a5, packed_a, fs, trips, q_block, w_chunk,
                         sub_q, cfg, with_ep, interpret,
                         static_trips=static_trips)


def sweep_b5(out_a, packed_b, trips, q_block: int, w_chunk: int,
             cfg: SimConfig, with_ep: bool = True,
             interpret: bool | None = None, sub_q: int = 32,
             static_trips: bool = False):
    """OUT_A (N,16) + packed slabs (B,16,kb) -> OUT_B (N,16)."""
    if interpret is None:
        interpret = _interpret_default()
    return _call_kernel5(_kernel_b5, packed_b, out_a, trips, q_block,
                         w_chunk, sub_q, cfg, with_ep, interpret,
                         static_trips=static_trips)


def build_qm_feats5(state, cf, cm, cs, order):
    """Sorted QM_A (N,16) for the v5 step: the build_qm_feats layout with
    the three per-axis cell coordinates at columns 12-14 (feeding the
    exact in-kernel stencil mask and the packed candidate slabs)."""
    n = state.pos.shape[0]
    fields = jnp.concatenate([
        state.pos, state.corrected_vel, state.mass[:, None],
        state.dens[:, None], state.vm[:, None], state.stim[:, None],
        state.iion[:, None], state.w[:, None], cf[:, None], cm[:, None],
        cs[:, None], jnp.zeros((n, 1), jnp.float32)], axis=1)
    return fields[order]


def _pack_candidates(cols, src, kb):
    """Row-gather candidate features into per-block slabs (B, 16, kb).

    `cols`: _PACK_ROWS (N,) arrays in SORTED order; `src`: (B*kb,) sorted-
    row indices from sweep_bookkeeping5, sentinel N for empty slots. The
    sentinel row is zero except a _COORD_SENTINEL fast-axis coordinate, so
    padded slots fail the stencil mask and carry inert (vol = mass = 0)
    features either way."""
    mat = jnp.stack(cols, axis=1)                            # (N, 16)
    pad = jnp.zeros((1, _PACK_ROWS),
                    jnp.float32).at[0, 12].set(_COORD_SENTINEL)
    mat = jnp.concatenate([mat, pad], axis=0)
    b = src.shape[0] // kb
    return mat[src].reshape(b, kb, _PACK_ROWS).swapaxes(1, 2)


def pack_feats_a5(fs, src, kb):
    """Sweep-A candidate slabs from the sorted QM_A matrix."""
    vol_prev = jnp.where(fs[:, 7] > 0.0, fs[:, 6] / fs[:, 7], 0.0)
    z = jnp.zeros_like(vol_prev)
    return _pack_candidates(
        [fs[:, 0], fs[:, 1], fs[:, 2], fs[:, 3], fs[:, 4], fs[:, 5],
         vol_prev, fs[:, 6], z, z, z, z,
         fs[:, 12], fs[:, 13], fs[:, 14], z], src, kb)


def pack_feats_b5(out_a, vol_now, src, kb):
    """Sweep-B candidate slabs from OUT_A columns."""
    z = jnp.zeros_like(vol_now)
    return _pack_candidates(
        [out_a[:, 0], out_a[:, 1], out_a[:, 2], out_a[:, 3], out_a[:, 4],
         out_a[:, 5], vol_now, out_a[:, 6], out_a[:, 7], z, z, z,
         out_a[:, 12], out_a[:, 13], out_a[:, 14], z], src, kb)


def apply_out_fused(state, out_a, out_b, inv=None):
    """Unsort OUT_A/OUT_B (inv=None skips the unsort for callers whose
    state already lives in sorted layout, e.g. the halo path) and write
    the step's results back into the state (fixed/inactive keeps) — the
    SINGLE writeback carrying the output-column contract for every fused
    step, single- or multi-chip."""
    ou = jnp.concatenate([out_b, out_a[:, 3:6]], axis=1)
    if inv is not None:
        ou = ou[inv]
    act = state.active
    upd = act & ~state.fixed
    return state.replace(
        pos=jnp.where(upd[:, None], ou[:, 0:3], state.pos),
        vel=jnp.where(upd[:, None], ou[:, 3:6], state.vel),
        vm=jnp.where(act, ou[:, 6], state.vm),
        dens=ou[:, 7], pres=ou[:, 8], iion=ou[:, 9], w=ou[:, 10],
        inter_vm=ou[:, 11], acc=ou[:, 12:15], inter_vel=ou[:, 16:19])
