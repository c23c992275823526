"""EPnP: camera pose from 3D-2D correspondences, batched RANSAC.

Replaces `PnPsolver` (reference src/PnPsolver.cc): the sequential
RANSAC-over-EPnP loop (`iterate` :131-223) becomes one vmapped sweep where
every hypothesis runs the EPnP linear solve — control points by centroid +
PCA (:330-368), barycentric coordinates (:371-400), the 2n x 12 M matrix
(:403-445), the beta1 nullspace case (:653-685) — followed by a
Horn/Procrustes alignment for (R, t) (the role of estimate_R_and_t :553-597)
and chi2 inlier counting (`CheckInliers` :269-303).

The reference's beta cases N=1,2,3 with Gauss-Newton refinement
(find_betas_approx_* :616-685, gauss_newton :786-807) are implemented as a
batched case sweep: the 4 smallest eigenvectors of M^T M span the kernel,
three least-squares beta initializations are each polished by a fixed
6-step GN on the control-point distance constraints, and the candidate
with the lowest weighted reprojection error wins — all inside the vmapped
RANSAC hypothesis, so the whole case tree is one fused program. The RANSAC
winner is additionally refined by re-solving on ALL its inliers
(PnPsolver::Refine :226-266).
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
    # kernel basis: the 4 smallest eigenvectors (reference keeps 4 null-
    # space candidates, compute_ccs/compute_pcs use linear combinations)
    Vk = vecs[:, :4].T.reshape(4, 4, 3)  # [basis, ctrl, 3]

    # control-point distance constraints over the 6 unordered pairs:
    # ||sum_k beta_k (v_k[i]-v_k[j])||^2 = ||cw_i - cw_j||^2. With
    # G_p[k,l] = (v_k[i]-v_k[j]).(v_l[i]-v_l[j]) the residual is the
    # quadratic form beta^T G_p beta - rho_p — a cleaner equivalent of the
    # reference's L_6x10 expansion (compute_L_6x10 :712-745).
    iu, ju = jnp.triu_indices(4, k=1)
    dv = Vk[:, iu, :] - Vk[:, ju, :]  # [4, 6, 3]
    G = jnp.einsum("kpc,lpc->pkl", dv, dv)  # [6, 4, 4]
    dwp = ctrl_w[iu] - ctrl_w[ju]
    rho = jnp.sum(dwp * dwp, axis=-1)  # [6]

    def _lstsq(A, b):
        AtA = A.T @ A + 1e-9 * jnp.eye(A.shape[1])
        return jnp.linalg.solve(AtA, A.T @ b)

    # beta initializations (reference find_betas_approx_1/2/3 :616-685)
    # case 1: unknowns (B11, B12, B13, B14)
    A1 = jnp.stack([G[:, 0, 0], 2 * G[:, 0, 1], 2 * G[:, 0, 2], 2 * G[:, 0, 3]], axis=1)
    b1 = _lstsq(A1, rho)
    b1_0 = jnp.sqrt(jnp.abs(b1[0]) + 1e-12)
    beta_c1 = jnp.concatenate([b1_0[None], b1[1:] / b1_0])
    # case 2: unknowns (B11, B12, B22)
    A2 = jnp.stack([G[:, 0, 0], 2 * G[:, 0, 1], G[:, 1, 1]], axis=1)
    b2 = _lstsq(A2, rho)
    s2 = jnp.sign(b2[1]) * jnp.sign(b2[0] + 1e-30)
    beta_c2 = jnp.stack(
        [jnp.sqrt(jnp.abs(b2[0]) + 1e-12), s2 * jnp.sqrt(jnp.abs(b2[2]) + 1e-12), 0.0, 0.0]
    )
    # case 3: unknowns (B11, B12, B22, B13, B23)
    A3 = jnp.stack(
        [G[:, 0, 0], 2 * G[:, 0, 1], G[:, 1, 1], 2 * G[:, 0, 2], 2 * G[:, 1, 2]], axis=1
    )
    b3 = _lstsq(A3, rho)
    b3_0 = jnp.sqrt(jnp.abs(b3[0]) + 1e-12)
    s3 = jnp.sign(b3[1]) * jnp.sign(b3[0] + 1e-30)
    beta_c3 = jnp.stack([b3_0, s3 * jnp.sqrt(jnp.abs(b3[2]) + 1e-12), b3[3] / b3_0, 0.0])

    # Gauss-Newton on the distance constraints from each init (reference
    # gauss_newton :786-807; 6 fixed iterations, tiny 6x4 system)
    def gn(beta0):
        def step(beta, _):
            Gb = jnp.einsum("pkl,l->pk", G, beta)  # [6, 4]
            r = jnp.sum(Gb * beta[None, :], axis=1) - rho
            J = 2.0 * Gb
            JtJ = J.T @ J + 1e-8 * jnp.eye(4)
            return beta - jnp.linalg.solve(JtJ, J.T @ r), None

        return jax.lax.scan(step, beta0, None, length=6)[0]

    betas = jax.vmap(gn)(jnp.stack([beta_c1, beta_c2, beta_c3]))  # [3, 4]

    def recover(beta):
        ctrl_c = jnp.einsum("k,kij->ij", beta, Vk)  # [4, 3]
        pc = alphas @ ctrl_c  # [N, 3]
        # cheirality: points must have positive depth on average
        sign = jnp.where(jnp.sum(wn * pc[:, 2]) < 0, -1.0, 1.0)
        pc = pc * sign
        # rigid alignment world -> camera (reference estimate_R_and_t :553-597)
        _, R, t = horn_sim3(pc, pw, w, fix_scale=True)
        T = se3.make(R, t)
        pcr = se3.apply(T, pw)
        z = jnp.where(pcr[:, 2] > 1e-3, pcr[:, 2], 1e-3)
        du = fu * pcr[:, 0] / z + uc - u
        dvv = fv * pcr[:, 1] / z + vc - v
        err = jnp.sum(wn * (du * du + dvv * dvv))
        return T, err

    Ts, errs = jax.vmap(recover)(betas)
    # best beta case by weighted reprojection error (reference iterate
    # :176-210 compares the three cases' reprojection errors)
    return Ts[jnp.argmin(errs)]


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
