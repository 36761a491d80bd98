"""Independent NumPy oracle for the coupled SPH+SM+monodomain step.

A direct, unoptimized O(N^2) transcription of the physics described in
SURVEY.md / the reference engine, written against the SAME spec but sharing
no code with the JAX implementation (np.linalg.eigh instead of Jacobi, dense
pair masks instead of bucket tables). Used as ground truth for the jitted
grid-based step.

The pair set is STENCIL-faithful: the reference only visits the 27 adjacent
hash cells (cell edge == h), which truncates the B-spline-2 voltage kernel
(support 2h) at cell distance 1 — the oracle replicates that, not a pure
distance cutoff.
"""

import numpy as np


def _pair_mask(pos, cfg):
    cell = (pos / cfg.cell_size).astype(np.int64)  # trunc toward zero (pos>=0)
    d = np.abs(cell[:, None, :] - cell[None, :, :])
    return (d <= 1).all(axis=-1)


def _poly6(r2, cfg):
    h2 = cfg.kernel_h ** 2
    return np.where((r2 >= 0) & (r2 <= h2),
                    cfg.poly6_constant * (h2 - r2) ** 3, 0.0)


def _spiky(r, cfg):
    h = cfg.kernel_h
    return np.where((r >= 0) & (r <= h),
                    -cfg.spiky_constant * (h - r) ** 2, 0.0)


def _visco(r, cfg):
    h = cfg.kernel_h
    return np.where((r >= 0) & (r <= h), cfg.spiky_constant * (h - r), 0.0)


def _bspline2(r, cfg):
    q = r / cfg.kernel_h
    c = cfg.b_spline_constant
    return np.where((q >= 0) & (q < 1), c * (-3.0 + 4.5 * q),
                    np.where((q >= 1) & (q < 2), c * 1.5 * (2.0 - q), 0.0))


def _polar_R(A):
    lam, U = np.linalg.eigh(A.T @ A)
    inv_sqrt = np.where(lam <= 0, 0.0, 1.0 / np.sqrt(np.maximum(lam, 1e-300)))
    S1 = (U * inv_sqrt) @ U.T
    return A @ S1


def oracle_step(s, cfg):
    """One full coupled step on a dict of float64 arrays:
    pos, vel, predicted_vel, corrected_vel, inter_vel, mass, dens, pres,
    vm, inter_vm, iion, stim, w, orig_pos, goal_pos, fixed."""
    s = {k: np.array(v) for k, v in s.items()}
    n = s["pos"].shape[0]
    dt = cfg.time_delta
    g = np.array(cfg.gravity)

    # --- phase 2a: external forces (gravity only, overwrites) ---
    free = ~s["fixed"]
    pv = s["predicted_vel"].copy()
    pv[free] = s["vel"][free] + g * dt / s["mass"][free, None]
    s["predicted_vel"] = pv

    # --- phase 2b: shape matching -> goal positions ---
    m = s["mass"].copy()
    m_cm = m * np.where(s["fixed"], 100.0, 1.0)
    cm = (m_cm @ s["pos"]) / m_cm.sum()
    ocm = (m_cm @ s["orig_pos"]) / m_cm.sum()
    p = s["pos"] - cm
    q = s["orig_pos"] - ocm
    Apq = (p * m[:, None]).T @ q
    Aqq = (q * m[:, None]).T @ q
    if not cfg.allow_flip and np.linalg.det(Apq) < 0:
        Apq[0, 1] *= -1; Apq[1, 1] *= -1; Apq[2, 2] *= -1
    R = _polar_R(Apq)
    A = Apq @ np.linalg.inv(Aqq)
    if cfg.volume_conservation:
        det = np.linalg.det(A)
        if det != 0.0:
            A *= min(1.0 / np.sqrt(abs(det)), 2.0)
    T = R * (1 - cfg.sm_beta) + A * cfg.sm_beta
    goal = s["goal_pos"].copy()
    goal[free] = q[free] @ T.T + cm
    s["goal_pos"] = goal

    s["corrected_vel"] = s["predicted_vel"] + (goal - s["pos"]) * \
        (cfg.sm_alpha / dt)

    # --- pair geometry (27-cell stencil) ---
    adj = _pair_mask(s["pos"], cfg)
    diff = s["pos"][:, None, :] - s["pos"][None, :, :]
    r2 = (diff ** 2).sum(-1)
    r = np.sqrt(r2)

    # --- phase 3: XSPH intermediate velocity (prev dens) ---
    w6 = _poly6(r2, cfg) * adj
    volm = s["mass"] / s["dens"]
    dv = s["corrected_vel"][None, :, :] - s["corrected_vel"][:, None, :]
    s["inter_vel"] = s["corrected_vel"] + cfg.velocity_mixing * \
        np.einsum("ij,ijk->ik", w6 * volm[None, :], dv)

    # --- phase 4: density + pressure ---
    dens = (w6 * s["mass"][None, :]).sum(1)
    if cfg.quirk_double_self_density:
        dens = dens + s["mass"] * _poly6(np.zeros(n), cfg)
    pres = cfg.k_stiffness * (dens - cfg.stand_density) \
        - s["vm"] * cfg.voltage_constant
    clamped = np.clip(pres, -cfg.max_pressure, cfg.max_pressure)
    if cfg.quirk_pressure_stim_gate:
        pres = np.where(s["stim"] > 0, clamped, -0.0)
    else:
        pres = clamped
    s["dens"], s["pres"] = dens, pres

    # --- phase 5: FHN cell model ---
    denom = cfg.fh_vp - cfg.fh_vr
    asd = (cfg.fh_vt - cfg.fh_vr) / denom
    u = (s["vm"] - cfg.fh_vr) / denom
    d_iion = dt * (cfg.fh_c1 * u * (u - asd) * (u - 1.0)
                   + cfg.fh_c2 * s["w"]) / s["mass"]
    s["iion"] = (s["iion"] + d_iion) if cfg.quirk_iion_accumulate else d_iion
    s["w"] = s["w"] + dt * cfg.fh_c3 * (u - cfg.fh_c4 * s["w"]) / s["mass"]

    # --- phase 6: force + voltage diffusion ---
    pair = adj & (r2 > 1e-12)
    r_safe = np.where(pair, r, 1.0)
    volj = (s["mass"] / s["dens"])[None, :]
    f_pres = volj * (s["pres"][:, None] + s["pres"][None, :]) / 2 \
        * _spiky(r_safe, cfg)
    acc = -np.einsum("ij,ijk->ik", np.where(pair, f_pres / r_safe, 0.0), diff)
    dv = s["inter_vel"][None, :, :] - s["inter_vel"][:, None, :]
    f_visc = volj * cfg.mu_viscosity * _visco(r_safe, cfg)
    acc += np.einsum("ij,ijk->ik", np.where(pair, f_visc, 0.0), dv)
    acc /= s["dens"][:, None]
    lap = (np.where(pair, (s["vm"][None, :] - s["vm"][:, None]) * volj
                    * _bspline2(r_safe, cfg), 0.0)).sum(1)
    s["acc"] = acc
    s["inter_vm"] = lap + (cfg.sigma / (cfg.beta_sv_ratio
                                        * cfg.cm_capacitance)) * lap \
        - (s["iion"] - s["stim"] * dt / s["mass"]) / cfg.cm_capacitance

    # --- phase 7: update + walls + clamps ---
    vel = s["inter_vel"] + acc * dt / s["mass"][:, None]
    pos = s["pos"] + vel * dt
    vel[s["fixed"]] = s["vel"][s["fixed"]]
    pos[s["fixed"]] = s["pos"][s["fixed"]]
    vm = s["vm"] + s["inter_vm"] * dt / s["mass"]
    vm = np.clip(vm, -cfg.max_voltage, cfg.max_voltage)
    world = np.array(cfg.world_size)
    low = pos < 0
    high = pos >= world[None, :]
    vel = np.where(low | high, vel * cfg.wall_hit, vel)
    pos = np.where(low, 0.0, pos)
    pos = np.where(high, world[None, :] - 1e-4, pos)
    pos = np.clip(pos, 0.0, world[None, :])
    s["vel"], s["pos"], s["vm"] = vel, pos, vm
    return s


def oracle_turn_off_stim(s):
    s = {k: np.array(v) for k, v in s.items()}
    for k, v in (("stim", -10000.0), ("vm", 0.0), ("inter_vm", 0.0),
                 ("iion", 0.0), ("pres", -10000.0), ("w", 0.0)):
        s[k] = np.full_like(s[k], v)
    return s


def state_to_oracle(state, n):
    """Convert the first n (active) lanes of a ParticleState to float64 dicts."""
    return {
        "pos": np.asarray(state.pos, np.float64)[:n],
        "vel": np.asarray(state.vel, np.float64)[:n],
        "predicted_vel": np.asarray(state.predicted_vel, np.float64)[:n],
        "corrected_vel": np.asarray(state.corrected_vel, np.float64)[:n],
        "inter_vel": np.asarray(state.inter_vel, np.float64)[:n],
        "acc": np.asarray(state.acc, np.float64)[:n],
        "mass": np.asarray(state.mass, np.float64)[:n],
        "dens": np.asarray(state.dens, np.float64)[:n],
        "pres": np.asarray(state.pres, np.float64)[:n],
        "vm": np.asarray(state.vm, np.float64)[:n],
        "inter_vm": np.asarray(state.inter_vm, np.float64)[:n],
        "iion": np.asarray(state.iion, np.float64)[:n],
        "stim": np.asarray(state.stim, np.float64)[:n],
        "w": np.asarray(state.w, np.float64)[:n],
        "orig_pos": np.asarray(state.orig_pos, np.float64)[:n],
        "goal_pos": np.asarray(state.goal_pos, np.float64)[:n],
        "fixed": np.asarray(state.fixed)[:n],
    }
