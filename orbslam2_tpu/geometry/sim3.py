"""Sim(3) similarity transforms (rotation + translation + scale).

Used by loop closing: Sim3 solving (reference src/Sim3Solver.cc) and the
essential-graph optimization over 7-DoF vertices (reference
src/Optimizer.cc:773-1039). Represented as a dict-free tuple of arrays
``(s, R, t)`` with broadcastable batch dims, plus an 8-float packed vector
``(s, qw, qx, qy, qz, tx, ty, tz)`` for map storage.

exp/log use the closed-form Sim(3) formulas (sigma = log s) so the pose
graph can take tangent-space Gauss-Newton steps.
"""

from __future__ import annotations

import jax.numpy as jnp

from orbslam2_tpu.geometry import se3

_EPS = 1e-8


def make(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray):
    return (jnp.asarray(s), R, t)


def identity(dtype=jnp.float32):
    return (jnp.ones((), dtype), jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype))


def from_se3(T: jnp.ndarray):
    return (jnp.ones(T.shape[:-2], T.dtype), se3.rotation(T), se3.translation(T))


def to_se3(S) -> jnp.ndarray:
    """Drop scale into translation: T = [R, t/s] (reference src/Optimizer.cc:1000-1010
    recovers SE3 as [R, t/s] after essential-graph optimization)."""
    s, R, t = S
    return se3.make(R, t / s[..., None])


def apply(S, p: jnp.ndarray) -> jnp.ndarray:
    """q = s * R p + t."""
    s, R, t = S
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def compose(A, B):
    """A o B: s = sa sb, R = Ra Rb, t = sa Ra tb + ta."""
    sa, Ra, ta = A
    sb, Rb, tb = B
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
    )


def inverse(S):
    s, R, t = S
    Rt = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / s
    return (sinv, Rt, -sinv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t))


def pack(S) -> jnp.ndarray:
    """(s, R, t) -> [..., 8] = (s, qw, qx, qy, qz, tx, ty, tz)."""
    s, R, t = S
    q = se3.rot_to_quat(R)
    return jnp.concatenate([s[..., None], q, t], axis=-1)


def unpack(v: jnp.ndarray):
    return (v[..., 0], se3.quat_to_rot(v[..., 1:5]), v[..., 5:8])


def exp(xi: jnp.ndarray):
    """sim(3) exp: [..., 7] = (rho(3), phi(3), sigma) -> (s, R, t).

    Uses the W-matrix closed form: t = W rho, with
    W = A I + B Wx + C Wx^2 where the coefficients fold in e^sigma terms.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.exp_so3(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    Wx = se3.hat(phi)
    Wx2 = Wx @ Wx

    sig = sigma
    small_sig = jnp.abs(sig) < 1e-3
    # A0 = (e^sigma - 1)/sigma
    A0 = jnp.where(small_sig, 1.0 + sig / 2.0 + sig * sig / 6.0, (s - 1.0) / jnp.where(small_sig, 1.0, sig))

    small_th = theta2 < 1e-4
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom = sig * sig + theta2
    denom = jnp.maximum(denom, _EPS)
    # standard Sim3 W coefficients (see Strasdat's PhD thesis, eq. for expmap)
    a = s * sin_t
    b = s * cos_t
    # B = (a*sigma + (1-b)*theta) / (theta * (sigma^2 + theta^2))
    # C = (A0 - ((b-1)*sigma + a*theta)/(sigma^2+theta^2)) / theta^2
    B = jnp.where(
        small_th,
        # theta -> 0 limit: B -> (e^s (s-1) + 1)/s^2 ; Taylor for small s too
        jnp.where(small_sig, 0.5 + sig / 3.0, (s * (sig - 1.0) + 1.0) / denom),
        (a * sig + (1.0 - b) * theta) / (jnp.maximum(theta, _EPS) * denom),
    )
    C = jnp.where(
        small_th,
        jnp.where(small_sig, 1.0 / 6.0 + sig / 8.0, (A0 - (s * (sig - 1.0) + 1.0) * 2.0 / denom) * 0.0 + (s * (0.5 * sig * sig - sig + 1.0) - 1.0) / jnp.maximum(sig * denom, _EPS)),
        (A0 - ((b - 1.0) * sig + a * theta) / denom) / jnp.maximum(theta2, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), Wx.shape)
    W = A0[..., None, None] * eye + B[..., None, None] * Wx + C[..., None, None] * Wx2
    t = (W @ rho[..., None])[..., 0]
    return (s, R, t)


def log(S) -> jnp.ndarray:
    """Inverse of exp, via solving W rho = t (3x3 solve, batched)."""
    s, R, t = S
    sigma = jnp.log(s)
    phi = se3.log_so3(R)
    # rebuild W with the same coefficients as exp()
    xi_rot = jnp.concatenate(
        [jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1
    )
    # reuse exp's W by probing: W = [exp(rho=e_i) t columns]; cheaper: recompute directly
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    Wx = se3.hat(phi)
    Wx2 = Wx @ Wx
    sig = sigma
    small_sig = jnp.abs(sig) < 1e-3
    A0 = jnp.where(small_sig, 1.0 + sig / 2.0 + sig * sig / 6.0, (s - 1.0) / jnp.where(small_sig, 1.0, sig))
    small_th = theta2 < 1e-4
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom = jnp.maximum(sig * sig + theta2, _EPS)
    a = s * sin_t
    b = s * cos_t
    B = jnp.where(
        small_th,
        jnp.where(small_sig, 0.5 + sig / 3.0, (s * (sig - 1.0) + 1.0) / denom),
        (a * sig + (1.0 - b) * theta) / (jnp.maximum(theta, _EPS) * denom),
    )
    C = jnp.where(
        small_th,
        jnp.where(small_sig, 1.0 / 6.0 + sig / 8.0, (s * (0.5 * sig * sig - sig + 1.0) - 1.0) / jnp.maximum(sig * denom, _EPS)),
        (A0 - ((b - 1.0) * sig + a * theta) / denom) / jnp.maximum(theta2, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), Wx.shape)
    W = A0[..., None, None] * eye + B[..., None, None] * Wx + C[..., None, None] * Wx2
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
