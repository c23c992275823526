"""SE(3) rigid transforms as batched JAX ops.

Poses are stored as 4x4 row-major matrices ``T = [[R, t], [0, 1]]`` mapping
world coordinates to camera coordinates (``Tcw`` in the reference's
convention, e.g. reference src/Tracking.cc:447-456). All functions broadcast
over leading batch dimensions and are jit/vmap/grad-safe.

The exp/log maps implement the standard se(3) <-> SE(3) formulas with
Taylor fallbacks near theta=0 so gradients stay finite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat: [..., 3] -> [..., 3, 3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle [..., 3] -> rotation [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    W = hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos(t))/t^2 with small-angle Taylor series
    small = theta2 < 1e-4
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation [..., 3, 3] -> axis-angle [..., 3].

    DIFFERENTIABLE AT IDENTITY: arccos' blows up at cos = ±1, and theta
    previously fed the *selected* small-angle Taylor branch, so forward-
    mode tangents (jacfwd) of any residual that is exactly zero came out
    NaN — which silently zeroed every pose-graph Gauss-Newton step whose
    graph contained one exactly-satisfied edge (loop correction builds
    its edge measurements from the current poses, so MOST edges are).
    The arccos input is clamped strictly inside (-1, 1) and the small
    branch uses sin^2(theta) = |w|^2 (a polynomial in R) instead of
    theta, so no lane's selected value depends on a non-finite tangent."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin2 = jnp.sum(w * w, axis=-1)              # sin^2(theta), smooth in R
    theta = jnp.arccos(jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7))
    sin_t = jnp.sin(theta)
    # theta / (2 sin theta), Taylor near 0 (theta^2 ~ sin^2 to O(theta^4))
    small = (cos_t > 0.99995)[..., None]        # theta < 1e-2
    scale = jnp.where(
        small,
        0.5 + sin2[..., None] / 12.0,
        theta[..., None] / jnp.maximum(2.0 * sin_t[..., None], _EPS),
    )
    w_generic = 2.0 * scale * w
    # Near theta = pi, sin(theta) ~ 0 and the generic formula breaks down:
    # recover axis from the symmetric part diag(R) = cos t I + (1-cos t) aa^T.
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0)
    axis = jnp.sqrt(axis2)
    # fix signs from off-diagonal sums (a_i a_j terms)
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]
    # choose the dominant axis positive, infer the others' signs
    a0, a1, a2 = axis[..., 0], axis[..., 1], axis[..., 2]
    dom0 = (a0 >= a1) & (a0 >= a2)
    dom1 = (~dom0) & (a1 >= a2)
    sign1 = jnp.where(dom0, jnp.sign(s01 + _EPS), 1.0)
    sign2 = jnp.where(dom0, jnp.sign(s02 + _EPS), jnp.where(dom1, jnp.sign(s12 + _EPS), 1.0))
    sign0 = jnp.where(dom0, 1.0, jnp.where(dom1, jnp.sign(s01 + _EPS), jnp.sign(s02 + _EPS)))
    axis_signed = jnp.stack([a0 * sign0, a1 * sign1, a2 * sign2], axis=-1)
    w_pi = theta[..., None] * axis_signed
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp: twist [..., 6] (rho, phi) -> [..., 4, 4].

    Convention: xi[..., :3] translation part rho, xi[..., 3:] rotation phi.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    W = hat(phi)
    W2 = W @ W
    small = theta2 < 1e-4
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a * W + b * W2
    V = eye + b * W + c * W2
    t = (V @ rho[..., None])[..., 0]
    return make(R, t)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log: [..., 4, 4] -> twist [..., 6] (rho, phi)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = log_so3(R)
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    W = hat(phi)
    W2 = W @ W
    small = theta2 < 1e-4
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - a/(2b)) W^2
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - a / (2.0 * b)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef * W2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def make(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble [..., 4, 4] from R [..., 3, 3] and t [..., 3]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form rigid inverse (no linear solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make(Rt, -(Rt @ t[..., None])[..., 0])


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def apply(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Transform points: T [..., 4, 4], p [..., 3] -> [..., 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, p) + t


def camera_center(Tcw: jnp.ndarray) -> jnp.ndarray:
    """Camera center in world coords: Ow = -R^T t (reference KeyFrame::GetCameraCenter)."""
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation [..., 3, 3] -> unit quaternion [..., 4] (w, x, y, z), w >= 0.

    Branch-free Shepperd-style method: compute all four candidate quads and
    select the best-conditioned one with jnp.where (jit-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidates, each scaled by its own 4*q_i^2 = 1 + 2 m_ii - tr (or 1 + tr)
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4 candidates, 4 components]
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def normalize_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation back onto SO(3) via quaternion round-trip."""
    return quat_to_rot(rot_to_quat(R))
