"""Closed-form Sim(3) estimation (Horn's quaternion method) + batched RANSAC.

Replaces `Sim3Solver` (reference src/Sim3Solver.cc): the sequential 5-at-a-
time RANSAC over 3-point minimal sets (iterate, :142-219) becomes one
batched sweep — every hypothesis solves Horn's absolute orientation
(centroids :222-233, M = Pr1 Pr2^T, 4x4 N-matrix eigendecomposition ->
quaternion :235-292, scale :300-322) and is scored by mutual reprojection
(:347-370) in parallel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import Intrinsics


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    s: jnp.ndarray          # scale
    R: jnp.ndarray          # [3, 3]
    t: jnp.ndarray          # [3]
    inliers: jnp.ndarray    # [N] bool
    num_inliers: jnp.ndarray


def horn_sim3(p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray, fix_scale: bool = False):
    """Weighted closed-form similarity aligning p2 -> p1.

    p1, p2: [N, 3]; w: [N] weights (0/1 masks fine). Returns (s, R, t) with
    p1 ~ s R p2 + t (reference Sim3Solver::ComputeSim3, src/Sim3Solver.cc:222-345).
    """
    wn = w / jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.sum(p1 * wn[:, None], axis=0)
    c2 = jnp.sum(p2 * wn[:, None], axis=0)
    q1 = p1 - c1
    q2 = p2 - c2
    M = jnp.einsum("ni,n,nj->ij", q1, wn, q2)  # Σ w q1 q2^T
    # Horn's 4x4 N matrix
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.asarray(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    vals, vecs = jnp.linalg.eigh(N)
    q = vecs[:, -1]  # largest eigenvalue -> quaternion (w, x, y, z)
    # with M = sum q1 q2^T this quaternion rotates frame 1 into frame 2;
    # we want p1 ~ s R p2 + t, so take the transpose
    R = se3.quat_to_rot(q).T
    # scale: s = <q1, R q2> / |q2|^2  (reference :300-322)
    Rq2 = q2 @ R.T
    num = jnp.sum(w[:, None] * q1 * Rq2)
    den = jnp.sum(w[:, None] * q2 * q2)
    s = jnp.where(fix_scale, 1.0, num / jnp.maximum(den, 1e-12))
    t = c1 - s * (R @ c2)
    return s, R, t


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def ransac_sim3(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    mask: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    Tcw1: jnp.ndarray,
    Tcw2: jnp.ndarray,
    K: Intrinsics,
    key: jnp.ndarray,
    iters: int = 128,
    min_inliers: int = 20,
    fix_scale: bool = False,
) -> Sim3Result:
    """Batched Sim3 RANSAC over matched 3-D point pairs.

    p1/p2 are WORLD points observed by KF1/KF2 respectively (as in the
    reference, transformed to each camera frame first); uv1/uv2 are the
    observed pixel coords in each KF; sigma2_* per-pair chi2 scale. The
    inlier check is mutual reprojection with per-pair 9.21*sigma^2 gates
    (reference ctor src/Sim3Solver.cc:36-114 and CheckInliers :347-370).
    """
    # camera-frame coordinates
    pc1 = se3.apply(Tcw1, p1)
    pc2 = se3.apply(Tcw2, p2)

    N = p1.shape[0]
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    prob = mask.astype(jnp.float32) / n_valid
    samples = jax.random.choice(key, N, shape=(iters, 3), replace=True, p=prob)

    def project(p, z_eps=1e-3):
        z = jnp.maximum(p[..., 2], z_eps)
        return jnp.stack(
            [K.fx * p[..., 0] / z + K.cx, K.fy * p[..., 1] / z + K.cy], -1
        )

    def one(idx):
        w3 = jnp.ones(3)
        s, R, t = horn_sim3(pc1[idx], pc2[idx], w3, fix_scale=fix_scale)
        # S12 maps cam2 coords into cam1; check both directions
        p2in1 = s * (pc2 @ R.T) + t
        sinv = 1.0 / jnp.maximum(s, 1e-9)
        p1in2 = sinv * ((pc1 - t) @ R)
        e1 = jnp.sum((project(p2in1) - uv1) ** 2, -1)
        e2 = jnp.sum((project(p1in2) - uv2) ** 2, -1)
        inl = mask & (e1 < 9.21 * sigma2_1) & (e2 < 9.21 * sigma2_2)
        inl = inl & (p2in1[:, 2] > 0) & (p1in2[:, 2] > 0)
        return jnp.sum(inl), s, R, t

    counts, ss, Rs, ts = jax.vmap(one)(samples)
    best = jnp.argmax(counts)
    s, R, t = ss[best], Rs[best], ts[best]
    # refine on the best inlier set (one weighted re-solve)
    p2in1 = s * (pc2 @ R.T) + t
    sinv = 1.0 / jnp.maximum(s, 1e-9)
    p1in2 = sinv * ((pc1 - t) @ R)
    e1 = jnp.sum((project(p2in1) - uv1) ** 2, -1)
    e2 = jnp.sum((project(p1in2) - uv2) ** 2, -1)
    inl = mask & (e1 < 9.21 * sigma2_1) & (e2 < 9.21 * sigma2_2)
    s2, R2, t2 = horn_sim3(pc1, pc2, inl.astype(jnp.float32), fix_scale=fix_scale)
    p2in1 = s2 * (pc2 @ R2.T) + t2
    p1in2 = (1.0 / jnp.maximum(s2, 1e-9)) * ((pc1 - t2) @ R2)
    e1 = jnp.sum((project(p2in1) - uv1) ** 2, -1)
    e2 = jnp.sum((project(p1in2) - uv2) ** 2, -1)
    inl2 = mask & (e1 < 9.21 * sigma2_1) & (e2 < 9.21 * sigma2_2)
    better = jnp.sum(inl2) >= jnp.sum(inl)
    s_f = jnp.where(better, s2, s)
    R_f = jnp.where(better, R2, R)
    t_f = jnp.where(better, t2, t)
    inl_f = jnp.where(better, inl2, inl)
    n = jnp.sum(inl_f)
    return Sim3Result(
        success=n >= min_inliers, s=s_f, R=R_f, t=t_f, inliers=inl_f, num_inliers=n
    )
