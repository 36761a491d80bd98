"""FitzHugh-Nagumo membrane model and stimulus control.

Replaces components C11 and C13 of the reference
(/root/reference/SPH_SM_monodomain/SPH_SM_monodomain.cpp:575-593, 704-783).

Reference quirks preserved:
  - Iion is ACCUMULATED (`+=`) each step, not assigned (cpp:589).
  - set_stim compares squared distance against an UNSQUARED radius (cpp:712),
    so the effective radius is sqrt(radius).
  - turnOffStim sets stim=-10000 / pres=-10000 and zeroes all EP state
    (cpp:764-783); the trailing `if stim > 0` reset there is dead code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..state import ParticleState


def fhn_cell_model(state: ParticleState, cfg: SimConfig) -> ParticleState:
    """FHN reaction ODE step (calculate_cell_model, cpp:575-593)."""
    denom = cfg.fh_vp - cfg.fh_vr
    asd = (cfg.fh_vt - cfg.fh_vr) / denom
    u = (state.vm - cfg.fh_vr) / denom
    dt = cfg.time_delta
    d_iion = dt * (cfg.fh_c1 * u * (u - asd) * (u - 1.0)
                   + cfg.fh_c2 * state.w) / state.mass
    if cfg.quirk_iion_accumulate:
        iion = state.iion + d_iion                          # `+=` quirk, cpp:589
    else:
        iion = d_iion
    w = state.w + dt * cfg.fh_c3 * (u - cfg.fh_c4 * state.w) / state.mass
    return state.replace(iion=iion, w=w)


def _stim_threshold(radius: float, cfg: SimConfig) -> float:
    # dist^2 <= radius (quirk) vs dist^2 <= radius^2 (corrected)
    return radius if cfg.quirk_stim_radius_squared else radius * radius


def set_stim(state: ParticleState, center, radius: float, strength: float,
             cfg: SimConfig) -> ParticleState:
    """Stimulate particles around one center (set_stim, cpp:704-717)."""
    center = jnp.asarray(center, dtype=state.pos.dtype)
    d2 = jnp.sum((state.pos - center[None, :]) ** 2, axis=-1)
    hit = state.active & (d2 <= _stim_threshold(radius, cfg))
    return state.replace(stim=jnp.where(hit, strength, state.stim),
                         is_stim_on=jnp.asarray(True))


def stim_hits_from_centers(pos: jax.Array, active: jax.Array, centers,
                           radius: float, cfg: SimConfig,
                           chunk: int = 256) -> jax.Array:
    """Union of set_stim spheres over many centers, chunked to bound memory.

    Vectorizes the reference's per-position set_stim loop
    (turnOnStim_Mesh/Cube, cpp:719-762) without materializing the full
    N x M distance matrix.
    """
    centers = np.asarray(centers, dtype=np.float32)
    m = centers.shape[0]
    if m == 0:
        return jnp.zeros(pos.shape[0], dtype=bool)
    pad = (-m) % chunk
    if pad:
        far = np.full((pad, 3), 1e9, dtype=np.float32)
        centers = np.concatenate([centers, far], axis=0)
    blocks = jnp.asarray(centers).reshape(-1, chunk, 3)
    thresh = _stim_threshold(radius, cfg)

    def body(hit, block):
        # per-axis difference form: three (chunk, N) temps instead of one
        # (chunk, N, 3) — the broadcast cube hit 6.4 GB per iteration at
        # 2M particles and crashed the TPU worker (DEVELOPMENT.md, scale
        # ceiling investigation)
        d2 = sum((pos[None, :, k] - block[:, None, k]) ** 2
                 for k in range(3))
        return hit | jnp.any(d2 <= thresh, axis=0), None

    hit, _ = jax.lax.scan(body, jnp.zeros(pos.shape[0], dtype=bool), blocks)
    return hit & active


def turn_on_stim_mesh(state: ParticleState, positions,
                      cfg: SimConfig,
                      tile_width: float | None = None,
                      centers_are_cloud: bool = True) -> ParticleState:
    """Stimulate the whole cloud + pin tendon anchors (turnOnStim_Mesh,
    cpp:745-762): stim sphere radius 0.01 around every loaded position, then
    fix particles with x in [0, 0.07] or (x >= 0.90 and y >= 0.80).

    `centers_are_cloud`: the reference unions a set_stim sphere around
    EVERY loaded position — each particle is distance 0 from its own
    center, so the union is exactly the active cloud and the O(N*M)
    distance pass is pure waste (it cost ~43 T lane-ops and a 6.4 GB
    broadcast temp per scan step at 2M particles — the >1.5M single-chip
    scale ceiling of rounds 2-3, see DEVELOPMENT.md). Pass False only if
    `positions` is NOT the cloud that seeded `state`.

    `tile_width`: for multi-muscle scenes (several clouds tiled along x),
    apply the anchor predicates in tile-local x so every muscle gets its
    tendon anchors."""
    if centers_are_cloud:
        hit = state.active
    else:
        hit = stim_hits_from_centers(state.pos, state.active, positions,
                                     0.01, cfg)
    stim = jnp.where(hit, cfg.stim_strength, state.stim)
    x, y = state.pos[:, 0], state.pos[:, 1]
    if tile_width is not None:
        x = jnp.mod(x, jnp.asarray(tile_width, x.dtype))
    anchors = ((x >= 0.0) & (x <= 0.07)) | ((x >= 0.90) & (y >= 0.80))
    fixed = state.fixed | (anchors & state.active)
    return state.replace(stim=stim, fixed=fixed, is_stim_on=jnp.asarray(True))


def turn_on_stim_cube(state: ParticleState, positions,
                      cfg: SimConfig,
                      tile_width: float | None = None) -> ParticleState:
    """Stimulate two x-slabs + pin two floor strips (turnOnStim_Cube,
    cpp:719-743).

    `tile_width`: for replicated multi-muscle worlds, evaluate the x
    predicates on the TILE-LOCAL x (x mod tile_width) so every tile gets
    the reference's two slabs/strips — absolute x would select essentially
    the whole of every tile past the first (same convention as
    turn_on_stim_mesh's tile-aware anchors)."""
    positions = np.asarray(positions, dtype=np.float32)
    px = positions[:, 0] % tile_width if tile_width else positions[:, 0]
    sel = (((px >= 0.45) & (px <= 0.48))
           | ((px > 1.0) & (positions[:, 2] <= 1.05)))
    hit = stim_hits_from_centers(state.pos, state.active, positions[sel],
                                 0.001, cfg)
    stim = jnp.where(hit, cfg.stim_strength, state.stim)
    x, y = state.pos[:, 0], state.pos[:, 1]
    if tile_width:
        x = jnp.mod(x, tile_width)
    floor = ((y == 0.0) & (x <= 0.48)) | ((y == 0.0) & (x >= 1.0))  # cpp:738
    fixed = state.fixed | (floor & state.active)
    return state.replace(stim=stim, fixed=fixed, is_stim_on=jnp.asarray(True))


def turn_off_stim(state: ParticleState, cfg: SimConfig) -> ParticleState:
    """Reset all EP state and close the pressure gate (turnOffStim,
    cpp:764-783)."""
    act = state.active
    neg = jnp.asarray(-10000.0, state.stim.dtype)
    zero = jnp.zeros_like(state.vm)
    return state.replace(
        stim=jnp.where(act, neg, state.stim),
        vm=jnp.where(act, zero, state.vm),
        inter_vm=jnp.where(act, zero, state.inter_vm),
        iion=jnp.where(act, zero, state.iion),
        pres=jnp.where(act, neg, state.pres),
        w=jnp.where(act, zero, state.w),
        is_stim_on=jnp.asarray(False),
    )
