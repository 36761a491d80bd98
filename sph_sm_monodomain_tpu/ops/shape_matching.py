"""Shape matching (Mueller et al.) with velocity correction.

Replaces component C7 (/root/reference/SPH_SM_monodomain/SPH_SM_monodomain.cpp:
215-446, 653-667). The reference's serial accumulation loops become two MXU
matmuls ((3,N)@(N,3) and (3,N)@(N,9)/(9,N)@(N,9)) plus a tiny fixed-iteration
polar decomposition — under multi-chip sharding the matmuls psum across the
mesh (see parallel/sharded_step.py); nothing here forces a host sync.

Reference quirks preserved:
  - fixed particles weigh x100 in the center-of-mass only (cpp:247), plain
    mass in Apq/Aqq (cpp:267).
  - anti-flip negates entries (0,1), (1,1), (2,2) when det(Apq) < 0
    (cpp:294-299) — in the quadratic path the same entries of A9's linear
    block, applied AFTER the beta blend (cpp:410-414).
  - gravity unconditionally overwrites any external-force contribution to
    predicted_vel (cpp:226-231 vs 218-223) — `apply_external_forces` keeps
    that behavior in strict mode.
  - volume conservation clamps 1/sqrt(|det|) at 2.0 (cpp:311-320, 416-427).
  - corrected_vel has NO fixed-particle skip (cpp:663-666).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

from ..config import SimConfig
from ..state import ParticleState
from .linalg import det3, invert3, polar_decomposition, pseudo_inverse

# widest blocked-q column count that still fits one lane tile: below this
# the clustered segment reductions use the blocked matmul form (tests
# monkeypatch it to 0 to exercise the contig / one-hot forms at small K)
_BLOCKED_MAX_LANES = 128

# anti-flip sign pattern: negate (0,1), (1,1), (2,2) (cpp:296-298)
import numpy as _np
_FLIP_SIGNS = _np.array([[1.0, -1.0, 1.0],
                         [1.0, -1.0, 1.0],
                         [1.0, 1.0, -1.0]], dtype=_np.float32)


def apply_external_forces(state: ParticleState, cfg: SimConfig,
                          external_forces=None) -> ParticleState:
    """predicted_vel = vel + g*dt/m for non-fixed particles (cpp:215-232).

    `external_forces` (N,3) mirrors the reference's forcesArray API; in strict
    mode its contribution is overwritten by the gravity loop exactly like
    cpp:229 overwrites cpp:222 (and the reference always passes NULL anyway).
    """
    g = jnp.asarray(cfg.gravity, dtype=state.vel.dtype)
    pv = state.vel + g[None, :] * (cfg.time_delta / state.mass)[:, None]
    if external_forces is not None and not cfg.strict_reference_mode:
        pv = pv + external_forces * (cfg.time_delta / state.mass)[:, None]
    pv = jnp.where(state.fixed[:, None], state.predicted_vel, pv)
    return state.replace(predicted_vel=pv)


class SMInvariants(NamedTuple):
    """Step-invariant shape-matching moments.

    orig_pos, mass, fixed and active never change during a run, so the
    rest-shape side of the reference's per-step reduction loops
    (cpp:244-291) is constant: computing it once per simulate() call
    removes half the per-step SM passes. `None` fields belong to the
    unused match path (linear vs quadratic)."""
    mass_cm_sum: jax.Array       # sum of cm-weighted masses (cpp:244-253)
    ocm: jax.Array               # (3,) rest-shape center of mass
    q: jax.Array                 # (N,3) orig_pos - ocm (cpp:263)
    mq: jax.Array                # (3,) sum of m*q (for the Apq split)
    aqq_inv: jax.Array | None    # (3,3) Aqq^-1 (cpp:281-291, 307)
    q9: jax.Array | None         # (N,9) quadratic basis (cpp:348-350)
    mq9: jax.Array | None        # (9,) sum of m*q9
    a9qq_pinv: jax.Array | None  # (9,9) pseudo-inverse (cpp:383-388)
    # clustered blocked-form hoists (sm_clusters > 1 and f*K <= 128; also
    # step-invariant between row migrations — sm_rebind_rows refreshes):
    cid: jax.Array | None = None   # (N,) owning cluster
    w_cm: jax.Array | None = None  # (N,K) cm-weighted one-hot
    qb: jax.Array | None = None    # (N,K*f) block-sparse rest basis


def cluster_ids(orig_pos: jax.Array, cfg: SimConfig) -> jax.Array:
    """(N,) int32 shape-matching cluster of each particle: its rest-shape
    x-tile index (multi-muscle scenes tile muscles along x at equal width,
    utils/io.scene_positions). Constant for the whole run — it follows
    orig_pos through any permutation or migration."""
    k = cfg.sm_clusters
    tile_w = cfg.world_size[0] / k
    cid = jnp.floor(orig_pos[:, 0] / jnp.asarray(tile_w, orig_pos.dtype))
    return jnp.clip(cid.astype(jnp.int32), 0, k - 1)


def _cluster_onehot(cid: jax.Array, k: int, dtype) -> jax.Array:
    """(N, K) one-hot cluster matrix: per-cluster sums become (K,N)@(N,F)
    MXU contractions — the scatter-free TPU form of segment_sum."""
    return (cid[:, None] == jnp.arange(k, dtype=cid.dtype)[None, :]) \
        .astype(dtype)


def sm_invariants(state: ParticleState, cfg: SimConfig,
                  axis_name: str | None = None) -> SMInvariants:
    """Precompute the rest-shape moments of `project_positions`.

    With cfg.sm_clusters == K > 1 every scalar/moment field carries a
    leading (K,) batch axis (one independent match per cluster); q / q9
    stay per-row, centered on the OWNING cluster's rest center."""
    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    dtype = state.pos.dtype
    act = state.active.astype(dtype)
    m = state.mass * act
    m_cm = m * jnp.where(state.fixed, cfg.fixed_mass_scale, 1.0)
    k = cfg.sm_clusters
    if k > 1:
        cid = cluster_ids(state.orig_pos, cfg)
        oh = _cluster_onehot(cid, k, dtype)
        # guard: an all-inactive cluster (possible only for degenerate
        # scenes) divides by 1 instead of 0 so no NaN can leak out
        mass_cm_sum = jnp.maximum(
            allsum(jnp.matmul(m_cm, oh, precision=_HI)), 1e-30)     # (K,)
        ocm = allsum(jnp.matmul(oh.T, m_cm[:, None] * state.orig_pos,
                                precision=_HI)) / mass_cm_sum[:, None]
        q = state.orig_pos - ocm[cid]
        mq = allsum(jnp.matmul(oh.T, m[:, None] * q, precision=_HI))
        if not cfg.quadratic_match:
            outer = (q * m[:, None])[:, :, None] * q[:, None, :]
            aqq = allsum(jnp.matmul(oh.T, outer.reshape(-1, 9),
                                    precision=_HI)).reshape(k, 3, 3)
            inv = SMInvariants(mass_cm_sum, ocm, q, mq,
                               jax.vmap(invert3)(aqq), None, None, None)
            return _hoist_blocked(inv, cid, oh, m_cm, k)
        x, y, z = q[:, 0], q[:, 1], q[:, 2]
        q9 = jnp.stack([x, y, z, x * x, y * y, z * z, x * y, y * z, z * x],
                       axis=1)
        mq9 = allsum(jnp.matmul(oh.T, m[:, None] * q9, precision=_HI))
        outer9 = (q9 * m[:, None])[:, :, None] * q9[:, None, :]
        a9qq = allsum(jnp.matmul(oh.T, outer9.reshape(-1, 81),
                                 precision=_HI)).reshape(k, 9, 9)
        pinv = jax.vmap(lambda a: pseudo_inverse(a, cfg.jacobi_iterations))(
            a9qq)
        inv = SMInvariants(mass_cm_sum, ocm, q, mq, None, q9, mq9, pinv)
        return _hoist_blocked(inv, cid, oh, m_cm, k)

    mass_cm_sum = allsum(jnp.sum(m_cm))
    ocm = allsum(jnp.matmul(m_cm, state.orig_pos, precision=_HI)) \
        / mass_cm_sum
    q = state.orig_pos - ocm
    mq = allsum(jnp.matmul(m, q, precision=_HI))
    if not cfg.quadratic_match:
        aqq = allsum(jnp.matmul((q * m[:, None]).T, q, precision=_HI))
        return SMInvariants(mass_cm_sum, ocm, q, mq, invert3(aqq),
                            None, None, None)
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    q9 = jnp.stack([x, y, z, x * x, y * y, z * z, x * y, y * z, z * x],
                   axis=1)
    mq9 = allsum(jnp.matmul(m, q9, precision=_HI))
    a9qq = allsum(jnp.matmul((q9 * m[:, None]).T, q9, precision=_HI))
    return SMInvariants(mass_cm_sum, ocm, q, mq, None, q9, mq9,
                        pseudo_inverse(a9qq, cfg.jacobi_iterations))


def _hoist_blocked(sm_inv: SMInvariants, cid, oh, m_cm,
                   k: int) -> SMInvariants:
    """Attach the blocked-form per-row hoists (cid, w_cm, qb) when the
    cluster axis fits one lane tile — these are step-invariant and save
    rebuilding (N,K)/(N,K*f) arrays in every project_positions call."""
    qf = sm_inv.q if sm_inv.q9 is None else sm_inv.q9
    f = qf.shape[1]
    if f * k > _BLOCKED_MAX_LANES:
        return sm_inv
    qb = (oh[:, :, None] * qf[:, None, :]).reshape(qf.shape[0], k * f)
    return sm_inv._replace(cid=cid, w_cm=m_cm[:, None] * oh, qb=qb)


def sm_rebind_rows(sm_inv: SMInvariants, state: ParticleState,
                   cfg: SimConfig | None = None) -> SMInvariants:
    """Recompute the PER-ROW members of hoisted SM invariants after a
    permutation or migration of the particle rows (the scalar moments are
    permutation-invariant; q / q9 / the blocked-form hoists are row-aligned
    and must follow the rows). `cfg` is required for clustered invariants
    (sm_clusters > 1)."""
    if sm_inv.ocm.ndim == 2:
        cid = cluster_ids(state.orig_pos, cfg)
        q = state.orig_pos - sm_inv.ocm[cid]
    else:
        q = state.orig_pos - sm_inv.ocm
    if sm_inv.q9 is None:
        sm_inv = sm_inv._replace(q=q)
    else:
        x, y, z = q[:, 0], q[:, 1], q[:, 2]
        q9 = jnp.stack([x, y, z, x * x, y * y, z * z, x * y, y * z, z * x],
                       axis=1)
        sm_inv = sm_inv._replace(q=q, q9=q9)
    if sm_inv.qb is not None:
        dtype = state.pos.dtype
        act = state.active.astype(dtype)
        m_cm = state.mass * act * jnp.where(state.fixed,
                                            cfg.fixed_mass_scale, 1.0)
        k = sm_inv.ocm.shape[0]
        sm_inv = _hoist_blocked(sm_inv._replace(cid=None, w_cm=None,
                                                qb=None),
                                cid, _cluster_onehot(cid, k, dtype), m_cm,
                                k)
    return sm_inv


def _volume_scale(det, dtype):
    """1/sqrt(|det|) clamped at 2, or 1 when det == 0 (cpp:311-320)."""
    nz = det != 0.0
    s = 1.0 / jnp.sqrt(jnp.abs(jnp.where(nz, det, 1.0)))
    s = jnp.minimum(s, 2.0)
    return jnp.where(nz, s, jnp.asarray(1.0, dtype))


def _linear_transform(Apq, aqq_inv, cfg: SimConfig, dtype):
    """Apq -> blended goal transform T (cpp:294-322); vmap-able over a
    leading cluster axis."""
    if not cfg.allow_flip:
        flip = det3(Apq) < 0.0
        Apq = jnp.where(flip, Apq * _FLIP_SIGNS, Apq)
    R, _ = polar_decomposition(Apq, cfg.jacobi_iterations)
    A = jnp.matmul(Apq, aqq_inv, precision=_HI)            # cpp:307-309
    if cfg.volume_conservation:
        A = A * _volume_scale(det3(A), dtype)              # cpp:311-320
    return R * (1.0 - cfg.sm_beta) + A * cfg.sm_beta       # cpp:322


def _quadratic_transform(Apq, A9pq, a9qq_pinv, cfg: SimConfig, dtype):
    """(Apq, A9pq) -> quadratic goal transform A9 (3,9) (cpp:294-302,
    331-427); vmap-able over a leading cluster axis."""
    if not cfg.allow_flip:
        flip = det3(Apq) < 0.0
        Apq = jnp.where(flip, Apq * _FLIP_SIGNS, Apq)
    R, _ = polar_decomposition(Apq, cfg.jacobi_iterations)
    A9 = jnp.matmul(A9pq, a9qq_pinv, precision=_HI) * cfg.sm_beta
    A9 = A9.at[:, :3].add((1.0 - cfg.sm_beta) * R)         # cpp:390-403
    det = det3(A9[:, :3])                                  # cpp:405-408
    if not cfg.allow_flip:                                 # cpp:410-414
        flip = det < 0.0
        signs9 = jnp.ones((3, 9), dtype).at[0, 1].set(-1.0) \
                    .at[1, 1].set(-1.0).at[2, 2].set(-1.0)
        A9 = jnp.where(flip, A9 * signs9, A9)
    if cfg.volume_conservation:                            # cpp:416-427
        A9 = A9 * _volume_scale(det, dtype)
    return A9


def project_positions(state: ParticleState, cfg: SimConfig,
                      axis_name: str | None = None,
                      sm_inv: SMInvariants | None = None) -> jnp.ndarray:
    """Goal positions from a global best-fit transform (cpp:234-446).

    Returns new goal_pos; fixed particles keep their previous goal
    (cpp:324-329 / 429-443 skip fixed).

    When `axis_name` is given (inside shard_map over a particle-sharded
    mesh), every global accumulation — mass sum, centers of mass, Apq
    (and the 9-D moments in the quadratic path) — is psum'd across the mesh;
    the tiny decomposition then runs replicated on every device. This is the
    TPU-native form of the serial reduction loops (SURVEY.md §2).

    `sm_inv` (see sm_invariants) carries the rest-shape constants; drivers
    compute it once per run. The deforming-side moment splits as
    Apq = sum(m pos q^T) - cm (x) sum(m q)  (exact up to fp reassociation),
    so the per-step work is ONE (3,N)@(N,3) MXU pass plus the cm reduction.
    """
    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    if sm_inv is None:
        sm_inv = sm_invariants(state, cfg, axis_name)

    dtype = state.pos.dtype
    act = state.active.astype(dtype)
    m = state.mass * act                                   # plain mass (cpp:267)
    m_cm = m * jnp.where(state.fixed, cfg.fixed_mass_scale, 1.0)  # cpp:247
    q = sm_inv.q
    posm = state.pos * m[:, None]

    if sm_inv.ocm.ndim == 2:
        # Clustered multi-muscle match (cfg.sm_clusters > 1), one
        # independent transform per cluster. Segment-reduction forms, by
        # preference:
        #   blocked  (f*K <= 128 lanes, f = 3 linear / 9 quadratic): fold
        #            the cluster axis into matmul COLUMNS via a per-row
        #            block-sparse q (zero outside the owning cluster's
        #            column block) — the per-step cost is the same three
        #            thin MXU matmuls as the global path, for any row
        #            order, sharded or not.
        #   contig   (cfg.sm_tile_rows, rows tile-contiguous): reshape +
        #            batched einsums — for large K where blocked columns
        #            exceed one lane tile.
        #   one-hot  general fallback (permuted rows, large K).
        k = sm_inv.ocm.shape[0]
        n = state.pos.shape[0]
        q9 = sm_inv.q9
        f = 3 if q9 is None else 9
        qf = q if q9 is None else q9
        mqf = sm_inv.mq if q9 is None else sm_inv.mq9
        tile_r = cfg.sm_tile_rows
        # the hoisted per-row arrays (cid / w_cm / qb) exist exactly when
        # the blocked form applies (f*K <= one lane tile, sm_invariants)
        blocked = sm_inv.qb is not None
        contig = (not blocked and tile_r > 0 and axis_name is None
                  and k * tile_r <= n)
        if blocked:
            cid, w_cm, qb = sm_inv.cid, sm_inv.w_cm, sm_inv.qb
            cm = allsum(jnp.matmul(w_cm.T, state.pos, precision=_HI)) \
                / sm_inv.mass_cm_sum[:, None]              # (K, 3)
            Afpq = allsum(jnp.matmul(posm.T, qb, precision=_HI)) \
                .reshape(3, k, f).transpose(1, 0, 2) \
                - cm[:, :, None] * mqf[:, None, :]         # (K, 3, f)
        elif contig:
            nk = k * tile_r
            r3 = lambda v: v[:nk].reshape(k, tile_r, -1)
            cm = jnp.sum(r3(m_cm[:, None] * state.pos), axis=1) \
                / sm_inv.mass_cm_sum[:, None]              # (K, 3)
            qf_r = r3(qf)
            Afpq = jnp.einsum("ktc,ktd->kcd", r3(posm), qf_r,
                              precision=_HI) \
                - cm[:, :, None] * mqf[:, None, :]
        else:
            cid = cluster_ids(state.orig_pos, cfg)
            oh = _cluster_onehot(cid, k, dtype)
            cm = allsum(jnp.matmul(oh.T, m_cm[:, None] * state.pos,
                                   precision=_HI)) \
                / sm_inv.mass_cm_sum[:, None]              # (K, 3)
            outer = posm[:, :, None] * qf[:, None, :]      # (N, 3, f)
            Afpq = allsum(jnp.matmul(oh.T, outer.reshape(n, 3 * f),
                                     precision=_HI)).reshape(k, 3, f) \
                - cm[:, :, None] * mqf[:, None, :]

        if q9 is None:
            # the linear path's Apq IS the (K,3,3) moment
            T = jax.vmap(lambda a, ai: _linear_transform(a, ai, cfg,
                                                         dtype))(
                Afpq, sm_inv.aqq_inv)                      # (K, 3, 3)
        else:
            # quadratic: Apq (for the polar R) is the first 3 columns of
            # the 9-D moment (q9[:, :3] == q, cpp:348-350)
            T = jax.vmap(lambda a, a9, p: _quadratic_transform(
                a, a9, p, cfg, dtype))(Afpq[:, :, :3], Afpq,
                                       sm_inv.a9qq_pinv)   # (K, 3, 9)

        if blocked:
            goal = jnp.matmul(qb, T.transpose(0, 2, 1).reshape(k * f, 3),
                              precision=_HI) + cm[cid]
        elif contig:
            # precision=_HI: on TPU the default einsum precision is bf16
            # on the MXU, and the three goal forms round DIFFERENTLY —
            # the halo slab path and the dense path then disagree by
            # ~1e-3 on goals, amplified to ~0.1 on velocities through
            # alpha*(goal-pos)/dt (caught by tools/halo_tpu.py --check)
            goal_nk = jnp.einsum("ktd,kcd->ktc", qf_r, T,
                                 precision=_HI) + cm[:, None, :]
            goal = jnp.concatenate([goal_nk.reshape(nk, 3),
                                    state.goal_pos[nk:]], axis=0)
        else:
            goal = jnp.einsum("nd,ncd->nc", qf, T[cid],
                              precision=_HI) + cm[cid]
        return jnp.where(state.fixed[:, None], state.goal_pos, goal)

    cm = allsum(jnp.matmul(m_cm, state.pos, precision=_HI)) \
        / sm_inv.mass_cm_sum                               # cpp:244-253
    Apq = allsum(jnp.matmul(posm.T, q, precision=_HI)) \
        - cm[:, None] * sm_inv.mq[None, :]                 # cpp:269-279

    if not cfg.quadratic_match:
        # anti-flip BEFORE polar decomposition in the linear path (cpp:294-302)
        T = _linear_transform(Apq, sm_inv.aqq_inv, cfg, dtype)
        goal = jnp.matmul(q, T.T, precision=_HI) + cm      # cpp:324-329
    else:
        q9 = sm_inv.q9                                     # cpp:348-350
        A9pq = allsum(jnp.matmul(posm.T, q9, precision=_HI)) \
            - cm[:, None] * sm_inv.mq9[None, :]            # (3,9), cpp:352-381
        A9 = _quadratic_transform(Apq, A9pq, sm_inv.a9qq_pinv, cfg, dtype)
        goal = jnp.matmul(q9, A9.T, precision=_HI) + cm    # cpp:429-443

    return jnp.where(state.fixed[:, None], state.goal_pos, goal)


def corrected_velocity(state: ParticleState, cfg: SimConfig,
                       axis_name: str | None = None,
                       sm_inv: SMInvariants | None = None,
                       external_forces=None) -> ParticleState:
    """Full SM velocity-correction phase (calculate_corrected_velocity,
    cpp:653-667): external forces -> goal positions -> corrected_vel.

    `external_forces` (N,3) is forwarded to apply_external_forces — the
    reference's forcesArray API; honored only outside strict mode (in
    strict mode gravity overwrites it, cpp:229, like the reference)."""
    state = apply_external_forces(state, cfg, external_forces)
    goal = project_positions(state, cfg, axis_name=axis_name, sm_inv=sm_inv)
    cv = state.predicted_vel + (goal - state.pos) * (
        (1.0 / cfg.time_delta) * cfg.sm_alpha)             # cpp:661-666
    return state.replace(goal_pos=goal, corrected_vel=cv)
