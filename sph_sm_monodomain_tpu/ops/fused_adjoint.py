"""Hand adjoint for the coupled fused sweeps (v4 xyz3): gradients at
fused-kernel speed for the FULL SPH + monodomain step.

The production sweeps (ops/fused_step.py) are Pallas kernels — opaque to
autodiff — so coupled-model gradients used to pay the slow XLA step per
evaluation (fine at 18k, prohibitive at 1M+; VERDICT r4 item 6). The
frozen-cloud Laplacian already proved the pattern
(models.variants._lap_vm_factory); this module extends it to the full
nonlinear sweeps.

Structure of the VJP, per sweep:

1.  The in-kernel PAIR SUMS are recovered from the sweep's own output
    (every epilogue is invertible on the saved inputs: ivel = cv +
    mixing*xsph, dens = raw + self-term, acc = raw/dens, inter_vm =
    (1+s)·lap − react), and the POINTWISE epilogue's VJP is taken by
    `jax.vjp` over the SAME jnp functions the kernel traces
    (`_a_epilogue` / `_b_epilogue`) — bit-identical math, zero
    hand-derived pointwise calculus.

2.  The pair-sum VJP is ONE extra Pallas sweep per kernel over the SAME
    sorted windows. The stencil (|Δcell| <= 1 per axis) and the r² > eps
    self-exclusion are symmetric, so particle p's cotangent has two
    contributions — p as query i (terms weighted by p's own output
    cotangent) and p as candidate j (terms weighted by its NEIGHBORS'
    cotangents) — and both are sums over the same neighbor set: the
    backward kernel gathers [neighbor state | neighbor cotangents] as
    candidate features and accumulates both roles in one pass. No
    scatter, no transpose, no second window table.

Derivatives (pair forms; C = poly6_constant, S = spiky_constant,
t = max(h²−r², 0), w6 = C t³, hr = max(h−r, 0), w2 = B_spline_2(r/h)):

sweep A   dens_i = Σ_j w6 m_j ;  X_i = Σ_j w6 vol_j (v_j − v_i)
  with s_ij = ḡd_i m_j + vol_j (ḡx_i·(v_j − v_i)) and Δ = pos_i − pos_j:
  d pos_p = −6C Σ_q t² (s_pq + s_qp) Δ_pq
  d v_p   = −ḡx_p Σ_q w6 vol_q + vol_p Σ_q w6 ḡx_q
  d m_p   = Σ_q w6 ḡd_q          (self-pair included, as in the forward)
  d vol_p = Σ_q w6 (ḡx_q·(v_p − v_q))

sweep B   acc_i = Σ_j [μS vol_j hr (u_j−u_i) + (S/2) vol_j hr²/r (P_i+P_j) Δ]
          lap_i = Σ_j vol_j w2 (vm_j − vm_i)
  d P_p   = (S/2) Σ_q hr²/r [vol_q (ḡa_p·Δ) − vol_p (ḡa_q·Δ)]
  d u_p   = μS Σ_q hr [vol_p ḡa_q − vol_q ḡa_p]
  d vm_p  = Σ_q w2 [vol_p ḡl_q − vol_q ḡl_p]
  d vol_p = Σ_q ℓ_qp / vol_p     (every forward term is linear in vol_j)
  d pos_p = Σ_q (G_pq − G_qp)    (G = per-pair ∂/∂pos_i; see kernel)
  d μ     = Σ_pairs S vol_j hr (ḡa_i·(u_j − u_i))   (one extra accumulator)

μ is the only PAIR-side physics constant; every other dynamic constant
(config.PARAM_FIELDS) enters an epilogue, so its cotangent falls out of
the jax.vjp in step 1 — which is what makes `jax.grad` w.r.t. (K, μ, σ,
FHN constants, ...) work through this path at fused speed
(examples/fit_material_flagship.py --fused).

Gradients are defined w.r.t. the CONTINUOUS pair math; the discrete
sort/window structure is geometry bookkeeping (constant per step), the
same convention as the XLA autodiff path whose neighbor table is an
integer gather. Reference semantics cites: sweep math cpp:448-513,
515-573, 669-701 (see ops/fused_step.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..config import SimConfig
from .fused_step import (_DYN_SLOTS, _a_epilogue, _b_epilogue, _call_kernel3,
                         _gather_loop4, _phys_consts, build_dynp,
                         feats_a_from_fs, feats_from_out_a)
from .pallas_sweeps import _PAIR_EPS, _interpret_default


def _f0_like(*arrs):
    """Zero cotangents, float0 for integer operands (custom_vjp contract)."""
    out = []
    for a in arrs:
        if jnp.issubdtype(a.dtype, jnp.integer):
            out.append(np.zeros(a.shape, jax.dtypes.float0))
        else:
            out.append(jnp.zeros_like(a))
    return tuple(out)


# ---------------------------------------------------------------------------
# backward Pallas kernels (one sweep each; both pair roles per pass)
# ---------------------------------------------------------------------------

def _kernel_bwd_a(blk_lo_ref, blk_hi_ref, *refs, cfg: SimConfig,
                  w_chunk: int, sub_q: int, with_ep: bool,
                  stencil: str = "xyz3", hbm_feats: bool = False,
                  db_feats: bool = False, dyn: bool = False):
    """Sweep-A pair-sum VJP. qm/feats cols/rows:
    [pos3 | v3 | vol | mass | ḡd | ḡx3 | cx | cyz | -]
    out: [d_pos3 | d_v3 | d_vol | d_mass | 0...]. Full per-axis mask
    (dead lanes carry the cx sentinel; their cotangents never enter)."""
    if dyn:
        _dynp_ref, qm_ref, feats_ref, out_ref, *scratch = refs
    else:
        qm_ref, feats_ref, out_ref, *scratch = refs
    bid = pl.program_id(0)
    nsub = qm_ref.shape[0] // sub_q
    h2 = jnp.float32(cfg.kernel_h * cfg.kernel_h)
    p6c = jnp.float32(cfg.poly6_constant)

    for sb in range(nsub):
        sl = slice(sb * sub_q, (sb + 1) * sub_q)
        base = bid * nsub + sb
        qx = qm_ref[sl, 0:1]
        qy = qm_ref[sl, 1:2]
        qz = qm_ref[sl, 2:3]
        qv = qm_ref[sl, 3:6]
        qvol = qm_ref[sl, 6:7]
        qm_mass = qm_ref[sl, 7:8]
        qgd = qm_ref[sl, 8:9]
        qgx = qm_ref[sl, 9:12]
        qh = qm_ref[sl, 12:13]
        qcyz = qm_ref[sl, 13:14]

        def pair(cand, m, carry, qx=qx, qy=qy, qz=qz, qv=qv, qvol=qvol,
                 qm_mass=qm_mass, qgd=qgd, qgx=qgx):
            (aPx, aPy, aPz, aB, aDx, aDy, aDz, aE, aF) = carry
            dx = qx - cand[0:1, :]
            dy = qy - cand[1:2, :]
            dz = qz - cand[2:3, :]
            r2 = dx * dx + dy * dy + dz * dz
            tm = jnp.where(m, jnp.maximum(h2 - r2, 0.0), 0.0)
            t2 = tm * tm
            w6 = p6c * (t2 * tm)
            # velocity differences v_q(cand) - v_p(query) per axis
            dvx = cand[3:4, :] - qv[:, 0:1]
            dvy = cand[4:5, :] - qv[:, 1:2]
            dvz = cand[5:6, :] - qv[:, 2:3]
            volq = cand[6:7, :]
            mq = cand[7:8, :]
            gdq = cand[8:9, :]
            gxx, gxy, gxz = cand[9:10, :], cand[10:11, :], cand[11:12, :]
            # s_pq = ḡd_p m_q + vol_q (ḡx_p·(v_q − v_p))
            s_pq = qgd * mq + volq * (qgx[:, 0:1] * dvx + qgx[:, 1:2] * dvy
                                      + qgx[:, 2:3] * dvz)
            # X = ḡx_q·(v_p − v_q); s_qp = ḡd_q m_p + vol_p X
            xq = -(gxx * dvx + gxy * dvy + gxz * dvz)
            s_qp = gdq * qm_mass + qvol * xq
            tt = t2 * (s_pq + s_qp)
            return (aPx + tt * dx, aPy + tt * dy, aPz + tt * dz,
                    aB + w6 * volq,
                    aDx + w6 * gxx, aDy + w6 * gxy, aDz + w6 * gxz,
                    aE + w6 * gdq, aF + w6 * xq)

        zeros = jnp.zeros((sub_q, w_chunk), jnp.float32)
        accs = _gather_loop4(blk_lo_ref, blk_hi_ref, feats_ref, scratch,
                             w_chunk, qh, qcyz, base, pair, (zeros,) * 9,
                             cfg, hbm_feats, db_feats)
        red = lambda a: jnp.sum(a, axis=1, keepdims=True)
        m6c = jnp.float32(-6.0 * cfg.poly6_constant)
        out_ref[sl, 0:1] = m6c * red(accs[0])
        out_ref[sl, 1:2] = m6c * red(accs[1])
        out_ref[sl, 2:3] = m6c * red(accs[2])
        sB = red(accs[3])
        out_ref[sl, 3:4] = qvol * red(accs[4]) - qgx[:, 0:1] * sB
        out_ref[sl, 4:5] = qvol * red(accs[5]) - qgx[:, 1:2] * sB
        out_ref[sl, 5:6] = qvol * red(accs[6]) - qgx[:, 2:3] * sB
        out_ref[sl, 6:7] = red(accs[8])                      # d_vol
        out_ref[sl, 7:8] = red(accs[7])                      # d_mass
        out_ref[sl, 8:16] = jnp.zeros((sub_q, 8), jnp.float32)


def _kernel_bwd_b(blk_lo_ref, blk_hi_ref, *refs, cfg: SimConfig,
                  w_chunk: int, sub_q: int, with_ep: bool,
                  stencil: str = "xyz3", hbm_feats: bool = False,
                  db_feats: bool = False, dyn: bool = False):
    """Sweep-B pair-sum VJP. qm/feats cols/rows:
    [pos3 | u3 | vol | P | vm | ḡa3 | cx | cyz | ḡl]
    out: [d_pos3 | d_u3 | d_P | d_vm | d_vol | d_μ_partial | 0...]."""
    if dyn:
        dynp_ref, qm_ref, feats_ref, out_ref, *scratch = refs
        P = _phys_consts(cfg, dynp_ref)
    else:
        qm_ref, feats_ref, out_ref, *scratch = refs
        P = _phys_consts(cfg)
    bid = pl.program_id(0)
    nsub = qm_ref.shape[0] // sub_q
    h = jnp.float32(cfg.kernel_h)
    inv_h = jnp.float32(1.0 / cfg.kernel_h)
    spk = jnp.float32(cfg.spiky_constant)
    bs_c = jnp.float32(cfg.b_spline_constant)
    bsd = jnp.float32(cfg.b_spline_constant / cfg.kernel_h)
    mu = P.mu_viscosity

    for sb in range(nsub):
        sl = slice(sb * sub_q, (sb + 1) * sub_q)
        base = bid * nsub + sb
        qx = qm_ref[sl, 0:1]
        qy = qm_ref[sl, 1:2]
        qz = qm_ref[sl, 2:3]
        qu = qm_ref[sl, 3:6]
        qvol = qm_ref[sl, 6:7]
        qP = qm_ref[sl, 7:8]
        qvm = qm_ref[sl, 8:9]
        qga = qm_ref[sl, 9:12]
        qh_ = qm_ref[sl, 12:13]
        qcyz = qm_ref[sl, 13:14]
        qgl = qm_ref[sl, 14:15]

        def pair(cand, m, carry, qx=qx, qy=qy, qz=qz, qu=qu, qvol=qvol,
                 qP=qP, qvm=qvm, qga=qga, qgl=qgl):
            (gx_, gy_, gz_, ux, uy, uz, aP, aVM, aVOL, aMU) = carry
            dx = qx - cand[0:1, :]
            dy = qy - cand[1:2, :]
            dz = qz - cand[2:3, :]
            r2 = dx * dx + dy * dy + dz * dz
            p = m & (r2 > _PAIR_EPS)                         # cpp:546
            inv_r = jax.lax.rsqrt(jnp.where(p, r2, 1.0))
            rr = r2 * inv_r
            hrm = jnp.where(p, jnp.maximum(h - rr, 0.0), 0.0)
            qr = rr * inv_h
            w2m = jnp.where(p, bs_c * (1.5 * jnp.maximum(2.0 - qr, 0.0)
                                       - 6.0 * jnp.maximum(1.0 - qr, 0.0)),
                            0.0)
            # w2' masked to the active pieces (relu subgradient 0 at kinks,
            # matching what autodiff of the forward relu form would give)
            w2pm = jnp.where(p, bsd * (6.0 * (qr < 1.0) - 1.5 * (qr < 2.0)),
                             0.0)
            volq = cand[6:7, :]
            Pq = cand[7:8, :]
            vmq = cand[8:9, :]
            gax, gay, gaz = cand[9:10, :], cand[10:11, :], cand[11:12, :]
            glq = cand[14:15, :]
            dux = cand[3:4, :] - qu[:, 0:1]                  # u_q − u_p
            duy = cand[4:5, :] - qu[:, 1:2]
            duz = cand[5:6, :] - qu[:, 2:3]
            gaP_d = qga[:, 0:1] * dx + qga[:, 1:2] * dy + qga[:, 2:3] * dz
            gaQ_d = gax * dx + gay * dy + gaz * dz
            gaP_du = qga[:, 0:1] * dux + qga[:, 1:2] * duy + qga[:, 2:3] * duz
            gaQ_du = gax * dux + gay * duy + gaz * duz
            psum = qP + Pq
            hr2ir = hrm * hrm * inv_r
            # d_P: (S/2) hr²/r [vol_q (ḡa_p·Δ) − vol_p (ḡa_q·Δ)]
            aP = aP + hr2ir * (volq * gaP_d - qvol * gaQ_d)
            # d_u: μS hr [vol_p ḡa_q − vol_q ḡa_p]
            ux = ux + hrm * (qvol * gax - volq * qga[:, 0:1])
            uy = uy + hrm * (qvol * gay - volq * qga[:, 1:2])
            uz = uz + hrm * (qvol * gaz - volq * qga[:, 2:3])
            # d_vm: w2 [vol_p ḡl_q − vol_q ḡl_p]
            aVM = aVM + w2m * (qvol * glq - volq * qgl)
            # d_vol (candidate role): ℓ_qp / vol_p
            #   = ḡa_q·[μS hr (u_p−u_q) − (S/2) hr²/r (P_p+P_q) Δ]
            #     + ḡl_q w2 (vm_p − vm_q)
            aVOL = aVOL + (mu * spk) * hrm * (-gaQ_du) \
                - (0.5 * spk) * hr2ir * psum * gaQ_d \
                + w2m * glq * (qvm - vmq)
            # d_μ (query role only; globally sums over all pairs):
            #   S vol_q hr (ḡa_p·(u_q − u_p))
            aMU = aMU + spk * volq * hrm * gaP_du
            # d_pos_p = Σ_q [∂ℓ_pq/∂pos_p + ∂ℓ_qp/∂pos_p]; r is symmetric
            # (∂r/∂pos_p = Δ/r in BOTH roles) so hr/w2 chain terms share
            # their radial factor, while terms explicit in Δ flip sign on
            # the candidate role:
            #   visc: μS hr(r) (ḡ·du) with hr' = −1 →
            #         μS (Δ/r) (vol_p ḡa_q·du − vol_q ḡa_p·du)
            #   pres: Y hr²/r (ḡ·Δ): iso term hr²/r (Y_q ḡa_p − Y_p ḡa_q),
            #         radial term −(2hr/r² + hr²/r³) Δ (Y_q ḡa_p·Δ −
            #         Y_p ḡa_q·Δ)  [(ḡ·Δ_qp) and the Δ_qp prefactor flip
            #         together, and ∂(ḡ·Δ_qp)/∂pos_p = −ḡ flips the iso]
            #   lap:  vol vm_diff w2'(r) Δ/r; vm_diff flips with the role,
            #         Δ/r does not → roles ADD on the (ḡl) weights
            supp = jnp.where(p, inv_r, 0.0)
            # hr' = −1 holds only INSIDE the spiky support: stencil pairs
            # with r > h have hr clamped at 0 with subgradient 0 (matching
            # autodiff of the forward's max(h − r, 0)), so the visc d_pos
            # term must gate on it — the radial/iso/lap terms carry their
            # own hrm / w2pm factors and gate themselves
            visc = jnp.where(hrm > 0.0, (mu * spk) * supp, 0.0) \
                * (qvol * gaQ_du - volq * gaP_du)
            cpre = (0.5 * spk) * psum
            radial = cpre * (2.0 * hrm + hr2ir) * supp * supp \
                * (volq * gaP_d - qvol * gaQ_d)
            lapr = w2pm * supp * (volq * qgl * (vmq - qvm)
                                  + qvol * glq * (qvm - vmq))
            scal = visc - radial + lapr
            iso = cpre * hr2ir
            gx_ = gx_ + scal * dx + iso * (volq * qga[:, 0:1] - qvol * gax)
            gy_ = gy_ + scal * dy + iso * (volq * qga[:, 1:2] - qvol * gay)
            gz_ = gz_ + scal * dz + iso * (volq * qga[:, 2:3] - qvol * gaz)
            return (gx_, gy_, gz_, ux, uy, uz, aP, aVM, aVOL, aMU)

        zeros = jnp.zeros((sub_q, w_chunk), jnp.float32)
        accs = _gather_loop4(blk_lo_ref, blk_hi_ref, feats_ref, scratch,
                             w_chunk, qh_, qcyz, base, pair, (zeros,) * 10,
                             cfg, hbm_feats, db_feats)
        red = lambda a: jnp.sum(a, axis=1, keepdims=True)
        out_ref[sl, 0:1] = red(accs[0])
        out_ref[sl, 1:2] = red(accs[1])
        out_ref[sl, 2:3] = red(accs[2])
        musp = mu * spk
        out_ref[sl, 3:4] = musp * red(accs[3])
        out_ref[sl, 4:5] = musp * red(accs[4])
        out_ref[sl, 5:6] = musp * red(accs[5])
        out_ref[sl, 6:7] = jnp.float32(0.5 * cfg.spiky_constant) \
            * red(accs[6])                                   # d_P
        out_ref[sl, 7:8] = red(accs[7])                      # d_vm
        out_ref[sl, 8:9] = red(accs[8])                      # d_vol
        out_ref[sl, 9:10] = red(accs[9])                     # d_μ partial
        out_ref[sl, 10:16] = jnp.zeros((sub_q, 6), jnp.float32)


# ---------------------------------------------------------------------------
# custom-VJP primitives
# ---------------------------------------------------------------------------

def _epi_a_jnp(cfg: SimConfig, raw_d, raw_x, fs, dynp):
    """jnp replica of _kernel_a3's epilogue + copies: pair sums -> OUT_A.
    Bit-identical ops to the kernel (same _a_epilogue), so jax.vjp of this
    IS the kernel epilogue's VJP."""
    P = _phys_consts(cfg, dynp)
    ivel = fs[:, 3:6] + raw_x * P.velocity_mixing            # cpp:699
    dens, pres, react, iion_n, w_n = _a_epilogue(
        cfg, True, fs[:, 6:7], fs[:, 8:9], fs[:, 9:10], fs[:, 10:11],
        fs[:, 11:12], raw_d[:, None], P=P)
    return jnp.concatenate([
        fs[:, 0:3], ivel, pres, fs[:, 8:9], dens, react, fs[:, 6:7],
        iion_n, fs[:, 12:15], w_n], axis=1)


def _epi_b_jnp(cfg: SimConfig, raw_acc, raw_lap, out_a, dynp):
    """jnp replica of _kernel_b3's epilogue + copies: pair sums -> OUT_B."""
    P = _phys_consts(cfg, dynp)
    pos_n, vel_n, vm_new, inter_vm, acc = _b_epilogue(
        cfg, True, out_a[:, 0:3], out_a[:, 3:6], out_a[:, 7:8],
        out_a[:, 8:9], out_a[:, 9:10], out_a[:, 10:11], raw_acc,
        raw_lap[:, None], P=P)
    n = out_a.shape[0]
    return jnp.concatenate([
        pos_n, vel_n, vm_new, out_a[:, 8:9], out_a[:, 6:7],
        out_a[:, 11:12], out_a[:, 15:16], inter_vm, acc,
        jnp.zeros((n, 1), jnp.float32)], axis=1)


def make_diff_sweeps(cfg: SimConfig, q_block: int, w_chunk: int,
                     sub_q: int, interpret: bool | None = None):
    """(sweep_a3_vjp, sweep_b3_vjp): custom-VJP coupled sweeps (xyz3).

    Both take (qm, dynp, blk_lo, blk_hi) and return the production
    kernel's (N, 16) output; `dynp` is the (1, 16) physics-constant
    operand (build_dynp) and RECEIVES cotangents, so jax.grad flows to
    any traced config.PARAM_FIELDS override. Candidate features are built
    inside (feats_a_from_fs / feats_from_out_a), so each primitive has a
    single differentiable tensor input and its VJP needs no split between
    query- and candidate-side cotangents — the backward kernels return
    the per-particle TOTALS both roles sum to."""
    from .fused_step import sweep_a3, sweep_b3
    if interpret is None:
        interpret = _interpret_default()
    kw = dict(q_block=q_block, w_chunk=w_chunk, sub_q=sub_q, cfg=cfg,
              with_ep=True, interpret=interpret, stencil="xyz3")
    mu_slot = _DYN_SLOTS.index("mu_viscosity")

    def _bwd_call(kernel, feats_t, qmat, blk_lo, blk_hi, dynp):
        return _call_kernel3(kernel, feats_t, qmat, blk_lo, blk_hi,
                             q_block, w_chunk, sub_q, cfg, True, interpret,
                             None, stencil="xyz3", dynp=dynp)

    @jax.custom_vjp
    def sweep_a_vjp(fs, dynp, blk_lo, blk_hi):
        return sweep_a3(fs, feats_a_from_fs(fs), blk_lo, blk_hi,
                        q_block, w_chunk, cfg, sub_q=sub_q,
                        interpret=interpret, stencil="xyz3", dynp=dynp)

    def a_fwd(fs, dynp, blk_lo, blk_hi):
        out = sweep_a_vjp(fs, dynp, blk_lo, blk_hi)
        return out, (fs, dynp, blk_lo, blk_hi, out)

    def a_bwd(res, g):
        fs, dynp, blk_lo, blk_hi, out = res
        # recover the pair sums the epilogue consumed
        mix = dynp[0, _DYN_SLOTS.index("velocity_mixing")]
        safe = jnp.where(mix != 0.0, mix, 1.0)
        raw_x = jnp.where(mix != 0.0, (out[:, 3:6] - fs[:, 3:6]) / safe, 0.0)
        raw_d = out[:, 8]
        if cfg.quirk_double_self_density:                    # cpp:483
            h2 = cfg.kernel_h * cfg.kernel_h
            raw_d = raw_d - fs[:, 6] * jnp.float32(
                cfg.poly6_constant * h2 * h2 * h2)
        # 1. pointwise epilogue VJP (jnp replica of the kernel epilogue)
        _, evjp = jax.vjp(
            lambda rd, rx, f, dp: _epi_a_jnp(cfg, rd, rx, f, dp),
            raw_d, raw_x, fs, dynp)
        g_rd, g_rx, d_fs, d_dynp = evjp(g)
        # 2. pair-sum VJP: one backward sweep (both roles per pass)
        n = fs.shape[0]
        live = fs[:, 12] >= 0.0
        vol_prev = jnp.where(live & (fs[:, 7] > 0.0),
                             fs[:, 6] / fs[:, 7], 0.0)
        mass_c = jnp.where(live, fs[:, 6], 0.0)
        qm = jnp.concatenate([
            fs[:, 0:6], vol_prev[:, None], mass_c[:, None],
            g_rd[:, None], g_rx, fs[:, 12:14],
            jnp.zeros((n, 2), jnp.float32)], axis=1)
        kout = _bwd_call(_kernel_bwd_a, qm.T, qm, blk_lo, blk_hi, None)
        d_fs = d_fs.at[:, 0:6].add(kout[:, 0:6])
        # vol_prev = mass/dens_prev chain (only live rows carry it)
        d_vol = kout[:, 6]
        inv_dp = jnp.where(live & (fs[:, 7] > 0.0), 1.0 / fs[:, 7], 0.0)
        d_fs = d_fs.at[:, 6].add(
            jnp.where(live, kout[:, 7], 0.0) + d_vol * inv_dp)
        d_fs = d_fs.at[:, 7].add(-d_vol * vol_prev * inv_dp)
        return (d_fs, d_dynp) + _f0_like(blk_lo, blk_hi)

    sweep_a_vjp.defvjp(a_fwd, a_bwd)

    @jax.custom_vjp
    def sweep_b_vjp(out_a, dynp, blk_lo, blk_hi):
        vol_now = jnp.where(out_a[:, 8] > 0.0,
                            out_a[:, 10] / out_a[:, 8], 0.0)
        return sweep_b3(out_a, feats_from_out_a(out_a, vol_now), blk_lo,
                        blk_hi, q_block, w_chunk, cfg, sub_q=sub_q,
                        interpret=interpret, stencil="xyz3", dynp=dynp)

    def b_fwd(out_a, dynp, blk_lo, blk_hi):
        out = sweep_b_vjp(out_a, dynp, blk_lo, blk_hi)
        return out, (out_a, dynp, blk_lo, blk_hi, out)

    def b_bwd(res, g):
        out_a, dynp, blk_lo, blk_hi, out = res
        # recover pair sums: acc = raw/densg; inter_vm = (1+s) lap − react
        densg = jnp.where(out_a[:, 8:9] > 0.0, out_a[:, 8:9], 1.0)
        raw_acc = out[:, 12:15] * densg
        scale = dynp[0, _DYN_SLOTS.index("vm_scale")]
        raw_lap = (out[:, 11] + out_a[:, 9]) / (1.0 + scale)
        _, evjp = jax.vjp(
            lambda ra, rl, oa, dp: _epi_b_jnp(cfg, ra, rl, oa, dp),
            raw_acc, raw_lap, out_a, dynp)
        g_ra, g_rl, d_oa, d_dynp = evjp(g)
        n = out_a.shape[0]
        live = out_a[:, 12] >= 0.0
        vol_now = jnp.where(live & (out_a[:, 8] > 0.0),
                            out_a[:, 10] / out_a[:, 8], 0.0)
        qm = jnp.concatenate([
            out_a[:, 0:6], vol_now[:, None], out_a[:, 6:8],
            g_ra, out_a[:, 12:14], g_rl[:, None],
            jnp.zeros((n, 1), jnp.float32)], axis=1)
        kout = _bwd_call(_kernel_bwd_b, qm.T, qm, blk_lo, blk_hi, dynp)
        d_oa = d_oa.at[:, 0:6].add(kout[:, 0:6])
        d_oa = d_oa.at[:, 6].add(kout[:, 6])                 # d_P
        d_oa = d_oa.at[:, 7].add(kout[:, 7])                 # d_vm
        # vol_now = mass/dens chain
        d_vol = kout[:, 8]
        inv_d = jnp.where(live & (out_a[:, 8] > 0.0),
                          1.0 / out_a[:, 8], 0.0)
        d_oa = d_oa.at[:, 10].add(d_vol * inv_d)
        d_oa = d_oa.at[:, 8].add(-d_vol * vol_now * inv_d)
        d_dynp = d_dynp.at[0, mu_slot].add(jnp.sum(kout[:, 9]))
        return (d_oa, d_dynp) + _f0_like(blk_lo, blk_hi)

    sweep_b_vjp.defvjp(b_fwd, b_bwd)
    return sweep_a_vjp, sweep_b_vjp


def step_fused_diff(state, cfg: SimConfig, q_block: int, w_chunk: int,
                    sub_q: int = 128, sm_inv=None, params=None):
    """Differentiable v4 coupled step: the production fused sweeps forward,
    hand-adjoint Pallas sweeps backward (one extra sweep per kernel).
    Drop-in for models.monodomain.step_fused(impl="v4") under jax.grad —
    same trajectory (the forward IS the v4 program, with the dynamic-params
    operand always attached), gradients w.r.t. the state AND any traced
    `params` overrides (config.PARAM_FIELDS). For long rollouts wrap the
    step in jax.checkpoint exactly like the XLA path."""
    from ..config import resolve_params
    from ..ops.shape_matching import corrected_velocity
    from .fused_step import apply_out_fused, build_qm_feats
    from .pallas_sweeps import sweep_bookkeeping3

    cfg_eff = resolve_params(cfg, params)
    dynp = build_dynp(cfg_eff)
    sweep_a_vjp, sweep_b_vjp = make_diff_sweeps(cfg, q_block, w_chunk,
                                                sub_q)
    order, inv, blk_lo, blk_hi, cx, cyz = sweep_bookkeeping3(
        state.pos, state.active, cfg, sub_q)
    state = corrected_velocity(state, cfg_eff, sm_inv=sm_inv)
    fs, _ = build_qm_feats(state, cx, cyz, order)
    out_a = sweep_a_vjp(fs, dynp, blk_lo, blk_hi)
    out_b = sweep_b_vjp(out_a, dynp, blk_lo, blk_hi)
    return apply_out_fused(state, out_a, out_b, inv)
