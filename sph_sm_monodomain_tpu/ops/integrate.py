"""Semi-implicit Euler integration, wall handling, clamps.

Replaces component C12 (Update_Properties,
/root/reference/SPH_SM_monodomain/SPH_SM_monodomain.cpp:596-651).

Semantics preserved:
  - vel = inter_vel + acc*dt/m (acc was already divided by density in the
    force phase — the extra mass division is a reference quirk, cpp:608).
  - position/velocity update skipped for fixed particles (cpp:606-610); the
    voltage update applies to ALL particles (cpp:612-616), clamped at
    +-max_voltage.
  - per-axis wall reflection vel *= Wall_Hit (= -1) with position snap to
    [0, World - 1e-4] (cpp:618-647), then a final AABB clamp to
    [0, World] (cpp:649, m3Bounds::clamp).

Padded (inactive) lanes are left untouched so they stay parked outside the
grid.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SimConfig
from ..state import ParticleState


def update_properties(state: ParticleState, cfg: SimConfig) -> ParticleState:
    dt = cfg.time_delta
    vel = state.inter_vel + state.acc * (dt / state.mass)[:, None]  # cpp:608
    pos = state.pos + vel * dt                                      # cpp:609
    # fixed particles keep pos/vel (cpp:606-610)
    vel = jnp.where(state.fixed[:, None], state.vel, vel)
    pos = jnp.where(state.fixed[:, None], state.pos, pos)

    vm = state.vm + state.inter_vm * dt / state.mass                # cpp:612
    vm = jnp.clip(vm, -cfg.max_voltage, cfg.max_voltage)            # cpp:613-616

    world = jnp.asarray(cfg.world_size, dtype=pos.dtype)
    # per-axis wall reflection + snap (cpp:618-647)
    low = pos < 0.0
    high = pos >= world[None, :]
    vel = jnp.where(low | high, vel * cfg.wall_hit, vel)
    pos = jnp.where(low, 0.0, pos)
    pos = jnp.where(high, world[None, :] - 1e-4, pos)
    # final AABB clamp (cpp:649; m3Bounds min=0, max=world, cpp:60-61)
    pos = jnp.clip(pos, 0.0, world[None, :])

    act = state.active
    return state.replace(
        pos=jnp.where(act[:, None], pos, state.pos),
        vel=jnp.where(act[:, None], vel, state.vel),
        vm=jnp.where(act, vm, state.vm),
    )
