"""IMU preintegration on SO(3)/R3 with bias Jacobians and noise propagation.

Rebuilds the reference ``IMU::Preintegrated`` (reference src/ImuTypes.cc:341-430
IntegrateNewMeasurement, include/ImuTypes.h:155-266) as a `lax.scan` over a
fixed-capacity measurement buffer:

per measurement (bias-corrected acc a, gyro w, dt) — the reference's exact
update order (SURVEY A.4):
    dP += dV·dt + 0.5·dR·a·dt²
    dV += dR·a·dt
    A/B noise-propagation blocks with Wacc = skew(a)
    position/velocity bias Jacobians JPa, JPg, JVa, JVg
    dR ← Normalize(dR · Exp(w·dt)), JRg update with right Jacobian
    C[0:9,0:9] ← A C Aᵀ + B Nga Bᵀ ;  C[9:15,9:15] += NgaWalk

Bias update without re-integration via first-order correction
(``GetDeltaRotation/Velocity/Position(b)``, include/ImuTypes.h:221-223) is
`corrected_delta`. GRAVITY = 9.81 (include/ImuTypes.h:40).

All state is a NamedTuple of arrays → jit/vmap friendly; a whole keyframe
interval preintegrates in one fused scan on device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie

GRAVITY = 9.81
GRAVITY_VEC = jnp.asarray([0.0, 0.0, -GRAVITY])


class PreintState(NamedTuple):
    dR: jax.Array     # (3,3)
    dV: jax.Array     # (3,)
    dP: jax.Array     # (3,)
    # bias Jacobians
    JRg: jax.Array    # (3,3) d dR / d gyro-bias
    JVg: jax.Array
    JVa: jax.Array
    JPg: jax.Array
    JPa: jax.Array
    C: jax.Array      # (15,15) covariance [dR dV dP | bg ba]
    dT: jax.Array     # () total time
    bias_g: jax.Array # (3,) bias used at integration time
    bias_a: jax.Array


def init_state(bias_g=None, bias_a=None, dtype=jnp.float32) -> PreintState:
    z3 = jnp.zeros(3, dtype)
    e3 = jnp.eye(3, dtype=dtype)
    return PreintState(
        dR=e3, dV=z3, dP=z3,
        JRg=jnp.zeros((3, 3), dtype), JVg=jnp.zeros((3, 3), dtype),
        JVa=jnp.zeros((3, 3), dtype), JPg=jnp.zeros((3, 3), dtype),
        JPa=jnp.zeros((3, 3), dtype),
        C=jnp.zeros((15, 15), dtype), dT=jnp.zeros((), dtype),
        bias_g=z3 if bias_g is None else bias_g,
        bias_a=z3 if bias_a is None else bias_a,
    )


def integrate_measurement(s: PreintState, acc, gyro, dt, nga: jax.Array,
                          nga_walk: jax.Array) -> PreintState:
    """One reference-order update. nga: (6,6) measurement noise (gyro², acc²)·freq;
    nga_walk: (6,6) random-walk covariance (reference Calib::Set)."""
    a = acc - s.bias_a
    w = gyro - s.bias_g

    # position/velocity first with the *old* dR (reference order)
    dP = s.dP + s.dV * dt + 0.5 * (s.dR @ a) * dt * dt
    dV = s.dV + (s.dR @ a) * dt

    Wacc = lie.hat(a)
    eye = jnp.eye(3, dtype=s.dR.dtype)
    # A (9x9), B (9x6) noise propagation (reference src/ImuTypes.cc:361-379)
    A = jnp.zeros((9, 9), s.dR.dtype)
    B = jnp.zeros((9, 6), s.dR.dtype)
    A = A.at[3:6, 0:3].set(-s.dR @ Wacc * dt)
    A = A.at[6:9, 0:3].set(-0.5 * s.dR @ Wacc * dt * dt)
    A = A.at[6:9, 3:6].set(eye * dt)
    A = A.at[3:6, 3:6].set(eye)
    A = A.at[6:9, 6:9].set(eye)
    B = B.at[3:6, 3:6].set(s.dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * s.dR * dt * dt)

    # bias Jacobians for P/V (reference :385-389)
    JPa = s.JPa + s.JVa * dt - 0.5 * s.dR * dt * dt
    JPg = s.JPg + s.JVg * dt - 0.5 * (s.dR @ Wacc) @ s.JRg * dt * dt
    JVa = s.JVa - s.dR * dt
    JVg = s.JVg - (s.dR @ Wacc) @ s.JRg * dt

    # rotation update (reference :395-403)
    wdt = w * dt
    dRi = lie.so3_exp(wdt)
    Jr = lie.so3_right_jacobian(wdt)
    dR = lie.normalize_rotation(s.dR @ dRi)
    A = A.at[0:3, 0:3].set(dRi.T)
    B = B.at[0:3, 0:3].set(Jr * dt)
    JRg = dRi.T @ s.JRg - Jr * dt

    # covariance (reference :407-409)
    C9 = A @ s.C[0:9, 0:9] @ A.T + B @ nga @ B.T
    C = s.C.at[0:9, 0:9].set(C9)
    C = C.at[9:15, 9:15].set(s.C[9:15, 9:15] + nga_walk)

    return PreintState(dR=dR, dV=dV, dP=dP, JRg=JRg, JVg=JVg, JVa=JVa,
                       JPg=JPg, JPa=JPa, C=C, dT=s.dT + dt,
                       bias_g=s.bias_g, bias_a=s.bias_a)


def preintegrate(acc: jax.Array, gyro: jax.Array, dts: jax.Array,
                 valid: jax.Array, bias_g, bias_a,
                 noise_gyro: float, noise_acc: float,
                 walk_gyro: float, walk_acc: float, freq: float) -> PreintState:
    """Preintegrate a fixed-capacity measurement buffer (N,3),(N,3),(N,),(N,).

    Invalid slots are skipped branchlessly. Noise densities are continuous-time
    (reference YAML IMU.NoiseGyro etc.); scaled by sqrt(freq) like the
    reference (src/Tracking.cc ParseIMUParamFile → Calib::Set).
    """
    dtype = acc.dtype
    sf = jnp.sqrt(jnp.asarray(freq, dtype))
    ng = (noise_gyro * sf) ** 2
    na = (noise_acc * sf) ** 2
    nga = jnp.diag(jnp.asarray([ng, ng, ng, na, na, na], dtype))
    wg = (walk_gyro / sf) ** 2 * freq  # per-sample walk: sigma_w^2 * dt ≈ walk²·dt
    wa = (walk_acc / sf) ** 2 * freq
    # per-step walk covariance uses dt of the step; approximate with diag(walk²·dt)
    def step(s, x):
        a, w, dt, v = x
        walk = jnp.diag(jnp.concatenate([
            jnp.full(3, walk_gyro ** 2, dtype) * dt,
            jnp.full(3, walk_acc ** 2, dtype) * dt]))
        s2 = integrate_measurement(s, a, w, dt, nga, walk)
        s_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(v, new, old), s2, s)
        return s_out, None

    s0 = init_state(bias_g, bias_a, dtype)
    s, _ = jax.lax.scan(step, s0, (acc, gyro, dts, valid))
    return s


def compose(a: PreintState, b: PreintState) -> PreintState:
    """Compose consecutive preintegrations (a then b) into one block.

    Mirrors the reference's ``MergePrevious`` used when keyframes are culled
    (src/LocalMapping.cc KeyFrameCulling inertial branch). The JVg coupling
    term through dR is first-order approximated. The 9×9 delta covariance is
    propagated through the composition's linearization
        δθ_ab = dR_bᵀ δθ_a + δθ_b
        δV_ab = δV_a − dR_a·[dV_b]× δθ_a + dR_a δV_b
        δP_ab = δP_a + dT_b δV_a − dR_a·[dP_b]× δθ_a + dR_a δP_b
    (the bias random-walk blocks simply add)."""
    dtype = a.dR.dtype
    dR = a.dR @ b.dR
    dV = a.dV + a.dR @ b.dV
    dP = a.dP + a.dV * b.dT + a.dR @ b.dP
    JRg = b.dR.T @ a.JRg + b.JRg
    JVg = a.JVg + a.dR @ b.JVg
    JVa = a.JVa + a.dR @ b.JVa
    JPg = a.JPg + a.JVg * b.dT + a.dR @ b.JPg
    JPa = a.JPa + a.JVa * b.dT + a.dR @ b.JPa
    eye = jnp.eye(3, dtype=dtype)
    A = jnp.zeros((9, 9), dtype)
    A = A.at[0:3, 0:3].set(b.dR.T)
    A = A.at[3:6, 0:3].set(-a.dR @ lie.hat(b.dV))
    A = A.at[3:6, 3:6].set(eye)
    A = A.at[6:9, 0:3].set(-a.dR @ lie.hat(b.dP))
    A = A.at[6:9, 3:6].set(eye * b.dT)
    A = A.at[6:9, 6:9].set(eye)
    # the new-segment V/P deltas enter rotated by dR_a; δθ_b enters directly
    Ba = jax.scipy.linalg.block_diag(eye, a.dR, a.dR)
    C9 = A @ a.C[0:9, 0:9] @ A.T + Ba @ b.C[0:9, 0:9] @ Ba.T
    C = jnp.zeros((15, 15), dtype)
    C = C.at[0:9, 0:9].set(C9)
    C = C.at[9:15, 9:15].set(a.C[9:15, 9:15] + b.C[9:15, 9:15])
    return PreintState(dR=dR, dV=dV, dP=dP, JRg=JRg, JVg=JVg, JVa=JVa,
                       JPg=JPg, JPa=JPa, C=C, dT=a.dT + b.dT,
                       bias_g=a.bias_g, bias_a=a.bias_a)


def corrected_delta(s: PreintState, bias_g, bias_a):
    """First-order bias-corrected (dR, dV, dP) (reference GetDeltaRotation/
    Velocity/Position(Bias), src/ImuTypes.cc)."""
    dbg = bias_g - s.bias_g
    dba = bias_a - s.bias_a
    dR = s.dR @ lie.so3_exp(s.JRg @ dbg)
    dV = s.dV + s.JVg @ dbg + s.JVa @ dba
    dP = s.dP + s.JPg @ dbg + s.JPa @ dba
    return dR, dV, dP


def predict_state(R_wb, t_wb, v_w, s: PreintState, bias_g, bias_a):
    """IMU state propagation over the preintegrated interval (reference
    Tracking::PredictStateIMU src/Tracking.cc:1616):
        R2 = R1·ΔR, v2 = v1 + g·t + R1·ΔV, p2 = p1 + v1·t + ½g·t² + R1·ΔP."""
    dR, dV, dP = corrected_delta(s, bias_g, bias_a)
    g = GRAVITY_VEC.astype(R_wb.dtype)
    t = s.dT
    R2 = lie.normalize_rotation(R_wb @ dR)
    v2 = v_w + g * t + R_wb @ dV
    p2 = t_wb + v_w * t + 0.5 * g * t * t + R_wb @ dP
    return R2, p2, v2


def inertial_residual(R1, p1, v1, R2, p2, v2, bg, ba, s: PreintState):
    """9-dim preintegration residual (reference EdgeInertial include/G2oTypes.h:
    500-549): [er, ev, ep] with gravity; poses are body-in-world (R_wb, p_wb)."""
    dR, dV, dP = corrected_delta(s, bg, ba)
    g = GRAVITY_VEC.astype(R1.dtype)
    t = s.dT
    er = lie.so3_log(dR.T @ (R1.T @ R2))
    ev = R1.T @ (v2 - v1 - g * t) - dV
    ep = R1.T @ (p2 - p1 - v1 * t - 0.5 * g * t * t) - dP
    return jnp.concatenate([er, ev, ep])
