"""EPnP: camera pose from 3D-2D correspondences, batched RANSAC.

Replaces `PnPsolver` (reference src/PnPsolver.cc): the sequential
RANSAC-over-EPnP loop (`iterate` :131-223) becomes one vmapped sweep where
every hypothesis runs the EPnP linear solve — control points by centroid +
PCA (:330-368), barycentric coordinates (:371-400), the 2n x 12 M matrix
(:403-445), the beta1 nullspace case (:653-685) — followed by a
Horn/Procrustes alignment for (R, t) (the role of estimate_R_and_t :553-597)
and chi2 inlier counting (`CheckInliers` :269-303).

The reference's beta cases N=2,3,4 with Gauss-Newton refinement squeeze the
last bits of accuracy from the minimal set; here the RANSAC winner is
refined by re-solving on ALL its inliers, which serves the same purpose
with batched linear algebra only.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import Intrinsics
from orbslam2_tpu.solvers.horn import horn_sim3


class PnPResult(NamedTuple):
    success: jnp.ndarray
    Tcw: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


def _epnp_solve(pw: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray, K: Intrinsics):
    """Weighted EPnP (beta1 case) on [N, 3] / [N, 2] with weights [N].

    Returns Tcw [4, 4]. Weights of 0 drop points (fixed shapes).
    """
    wn = w / jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(pw * wn[:, None], axis=0)
    q = pw - c0
    cov = jnp.einsum("ni,n,nj->ij", q, wn, q)
    eigval, eigvec = jnp.linalg.eigh(cov)
    # control points: centroid + principal axes (reference :330-368)
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-9))
    ctrl_w = jnp.concatenate(
        [c0[None], c0[None] + (eigvec * scale[None, :]).T], axis=0
    )  # [4, 3]

    # barycentric coordinates: solve [4,4] for each point (reference :371-400)
    Cmat = jnp.concatenate([ctrl_w.T, jnp.ones((1, 4))], axis=0)  # [4, 4]
    ph = jnp.concatenate([pw, jnp.ones((pw.shape[0], 1))], axis=1)  # [N, 4]
    alphas = jnp.linalg.solve(
        Cmat + 1e-9 * jnp.eye(4), ph.T
    ).T  # [N, 4]

    # M matrix rows (reference :403-445)
    fu, fv, uc, vc = K.fx, K.fy, K.cx, K.cy
    u = uv[:, 0]
    v = uv[:, 1]
    sw = jnp.sqrt(wn)[:, None]
    # rows interleaved as [N, 4 ctrl, 3 coords]: entries a_j * (fu, 0, uc - u)
    zero = jnp.zeros_like(u)
    ru = jnp.stack([jnp.broadcast_to(fu, u.shape), zero, uc - u], axis=-1)  # [N,3]
    rv = jnp.stack([zero, jnp.broadcast_to(fv, v.shape), vc - v], axis=-1)
    Mu = (alphas[:, :, None] * ru[:, None, :]).reshape(-1, 12) * sw
    Mv = (alphas[:, :, None] * rv[:, None, :]).reshape(-1, 12) * sw
    M = jnp.concatenate([Mu, Mv], axis=0)  # [2N, 12]
    MtM = M.T @ M
    _, vecs = jnp.linalg.eigh(MtM)
    vker = vecs[:, 0].reshape(4, 3)  # candidate camera-frame control points

    # beta1: scale the kernel so control-point distances match the world's
    dw = ctrl_w[:, None, :] - ctrl_w[None, :, :]
    dv = vker[:, None, :] - vker[None, :, :]
    ndw = jnp.sqrt(jnp.sum(dw * dw, axis=-1) + 1e-12)
    ndv = jnp.sqrt(jnp.sum(dv * dv, axis=-1) + 1e-12)
    beta = jnp.sum(ndw * ndv) / jnp.maximum(jnp.sum(ndv * ndv), 1e-12)
    ctrl_c = beta * vker
    # cheirality: points must have positive depth on average
    pc = alphas @ ctrl_c  # [N, 3]
    sign = jnp.where(jnp.sum(wn * pc[:, 2]) < 0, -1.0, 1.0)
    pc = pc * sign

    # rigid alignment world -> camera (reference estimate_R_and_t :553-597)
    s, R, t = horn_sim3(pc, pw, w, fix_scale=True)
    return se3.make(R, t)


def _reproj_chi2(Tcw, pw, uv, K: Intrinsics, inv_sigma2):
    pc = se3.apply(Tcw, pw)
    z = jnp.where(pc[:, 2] > 1e-3, pc[:, 2], 1e-3)
    pu = K.fx * pc[:, 0] / z + K.cx
    pv = K.fy * pc[:, 1] / z + K.cy
    e2 = (pu - uv[:, 0]) ** 2 + (pv - uv[:, 1]) ** 2
    return e2 * inv_sigma2, pc[:, 2] > 0


@partial(jax.jit, static_argnames=("iters", "sample_size"))
def ransac_pnp(
    pw: jnp.ndarray,
    uv: jnp.ndarray,
    mask: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    K: Intrinsics,
    key: jnp.ndarray,
    iters: int = 256,
    sample_size: int = 6,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    """Batched EPnP RANSAC (reference PnPsolver::iterate, src/PnPsolver.cc:131-223).

    pw [N, 3] world points, uv [N, 2] undistorted pixels, mask [N],
    inv_sigma2 [N] per-match octave information.
    """
    N = pw.shape[0]
    prob = mask.astype(jnp.float32) / jnp.maximum(jnp.sum(mask), 1)
    samples = jax.random.choice(key, N, shape=(iters, sample_size), replace=True, p=prob)

    def one(idx):
        T = _epnp_solve(pw[idx], uv[idx], jnp.ones(sample_size), K)
        chi2, zpos = _reproj_chi2(T, pw, uv, K, inv_sigma2)
        inl = mask & zpos & (chi2 < chi2_th)
        return jnp.sum(inl), T

    counts, Ts = jax.vmap(one)(samples)
    best = jnp.argmax(counts)
    T = Ts[best]
    chi2, zpos = _reproj_chi2(T, pw, uv, K, inv_sigma2)
    inl = mask & zpos & (chi2 < chi2_th)
    # refine on all inliers (the role of PnPsolver::Refine :226-266)
    T2 = _epnp_solve(pw, uv, inl.astype(jnp.float32), K)
    chi2b, zposb = _reproj_chi2(T2, pw, uv, K, inv_sigma2)
    inl2 = mask & zposb & (chi2b < chi2_th)
    better = jnp.sum(inl2) >= jnp.sum(inl)
    T_f = jnp.where(better, T2, T)
    inl_f = jnp.where(better, inl2, inl)
    n = jnp.sum(inl_f)
    return PnPResult(success=n >= min_inliers, Tcw=T_f, inliers=inl_f, num_inliers=n)
