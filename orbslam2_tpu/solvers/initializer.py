"""Monocular map initialization: parallel H/F RANSAC + reconstruction.

Replaces the reference `Initializer` (reference src/Initializer.cc): the
200 sequential RANSAC iterations with two transient threads for H and F
(src/Initializer.cc:86-134) become two fully batched hypothesis sweeps —
every 8-point minimal set is solved and scored in one vmapped pass, the
model choice RH = SH/(SH+SF) > 0.40 (src/Initializer.cc:127-134) and the
4-hypothesis (F) / 8-motion (H) cheirality arbitration (CheckRT,
src/Initializer.cc:880-996) are batched too.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3, triangulate
from orbslam2_tpu.geometry.camera import Intrinsics


class InitResult(NamedTuple):
    success: jnp.ndarray      # bool
    T21: jnp.ndarray          # [4, 4] pose of frame 2 wrt frame 1 (Tcw with world = cam1)
    points3d: jnp.ndarray     # [N, 3] triangulated points (frame-1 camera coords)
    good: jnp.ndarray         # [N] bool which matches triangulated well
    used_homography: jnp.ndarray


def _normalize(xy: jnp.ndarray, mask: jnp.ndarray):
    """Hartley normalization (reference Initializer::Normalize,
    src/Initializer.cc:821-877): zero mean, unit average absolute deviation."""
    w = mask.astype(xy.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (xy * w[:, None]).sum(0) / n
    d = jnp.abs(xy - mean) * w[:, None]
    md = jnp.maximum(d.sum(0) / n, 1e-9)
    s = 1.0 / md
    xn = (xy - mean) * s
    T = jnp.asarray(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return xn, T


def _solve_nullspace(A: jnp.ndarray) -> jnp.ndarray:
    """Smallest right-singular vector of A via eigh(A^T A) — batched-friendly."""
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, v = jnp.linalg.eigh(AtA)
    return v[..., :, 0]


def _compute_h(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """DLT homography from 8 correspondences [8, 2] each -> H21 [3, 3]
    (reference ComputeH21, src/Initializer.cc:253-300)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], -1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], -1)
    A = jnp.concatenate([r1, r2], axis=0)  # [16, 9]
    h = _solve_nullspace(A)
    return h.reshape(3, 3)


def _compute_f(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Normalized 8-point fundamental [8, 2] -> F21 with rank-2 projection
    (reference ComputeF21, src/Initializer.cc:303-338)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], -1
    )  # [8, 9]
    f = _solve_nullspace(A).reshape(3, 3)
    U, D, Vt = jnp.linalg.svd(f)
    D = D.at[2].set(0.0)
    return U @ jnp.diag(D) @ Vt


def _score_h(H21, x1, x2, mask, sigma2):
    """Symmetric transfer error score (reference CheckHomography,
    src/Initializer.cc:341-418). Returns (score, inliers)."""
    th = 5.991
    inv_s2 = 1.0 / sigma2
    H12 = jnp.linalg.inv(H21 + 1e-12 * jnp.eye(3))

    def transfer(H, a, b):
        ah = jnp.concatenate([a, jnp.ones((a.shape[0], 1))], -1)
        bh = ah @ H.T
        w = jnp.where(jnp.abs(bh[:, 2:3]) < 1e-9, 1e-9, bh[:, 2:3])
        p = bh[:, :2] / w
        return jnp.sum((p - b) ** 2, -1)

    chi1 = transfer(H12, x2, x1) * inv_s2
    chi2 = transfer(H21, x1, x2) * inv_s2
    ok = (chi1 < th) & (chi2 < th) & mask
    score = jnp.sum(jnp.where(mask & (chi1 < th), th - chi1, 0.0)) + jnp.sum(
        jnp.where(mask & (chi2 < th), th - chi2, 0.0)
    )
    return score, ok


def _score_f(F21, x1, x2, mask, sigma2):
    """Epipolar distance score (reference CheckFundamental,
    src/Initializer.cc:421-492)."""
    th = 3.841
    th_score = 5.991
    inv_s2 = 1.0 / sigma2
    o = jnp.ones((x1.shape[0], 1))
    h1 = jnp.concatenate([x1, o], -1)
    h2 = jnp.concatenate([x2, o], -1)
    l2 = h1 @ F21.T  # epipolar line in img2
    l1 = h2 @ F21
    d2 = (jnp.sum(l2 * h2, -1) ** 2) / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = (jnp.sum(l1 * h1, -1) ** 2) / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    c1 = d1 * inv_s2
    c2 = d2 * inv_s2
    ok = (c1 < th) & (c2 < th) & mask
    score = jnp.sum(jnp.where(mask & (c1 < th), th_score - c1, 0.0)) + jnp.sum(
        jnp.where(mask & (c2 < th), th_score - c2, 0.0)
    )
    return score, ok


def _check_rt(R, t, x1, x2, mask, K: Intrinsics, sigma2):
    """Cheirality + reprojection test for one motion hypothesis
    (reference CheckRT, src/Initializer.cc:880-996).

    Returns (n_good, good_mask, parallax_cos50, points3d)."""
    T1 = se3.identity()
    T2 = se3.make(R, t)
    pw = triangulate.triangulate_two_view(x1, x2, T1, T2, K)
    finite = jnp.all(jnp.isfinite(pw), -1)
    pc1 = pw
    pc2 = se3.apply(T2, pw)
    c1 = jnp.zeros(3)
    c2 = se3.camera_center(T2)
    cosp = triangulate.parallax_cos(pw, c1, c2)
    z_ok = (pc1[:, 2] > 0) & (pc2[:, 2] > 0)
    # reprojection
    fx, fy, cx, cy = K.fx, K.fy, K.cx, K.cy
    p1 = jnp.stack([fx * pc1[:, 0] / pc1[:, 2] + cx, fy * pc1[:, 1] / pc1[:, 2] + cy], -1)
    p2 = jnp.stack([fx * pc2[:, 0] / pc2[:, 2] + cx, fy * pc2[:, 1] / pc2[:, 2] + cy], -1)
    e1 = jnp.sum((p1 - x1) ** 2, -1)
    e2 = jnp.sum((p2 - x2) ** 2, -1)
    th2 = 4.0 * sigma2
    good = mask & finite & z_ok & (e1 < th2) & (e2 < th2) & (cosp < 0.99998)
    n_good = jnp.sum(good)
    # parallax of the 50th best point (reference takes the 50th smallest)
    cos_sorted = jnp.sort(jnp.where(good, cosp, 1.0))
    idx = jnp.minimum(jnp.maximum(n_good - 1, 0), 49)
    par = cos_sorted[idx]
    return n_good, good, par, pw


@partial(jax.jit, static_argnames=("iters",))
def initialize(
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    mask: jnp.ndarray,
    K: Intrinsics,
    key: jnp.ndarray,
    sigma: float = 1.0,
    iters: int = 256,
) -> InitResult:
    """Full two-view bootstrap. xy1/xy2 [N, 2] matched undistorted pixels.

    Deterministic given `key` (reference seeds DUtils RNG with 0,
    src/Initializer.cc:90).
    """
    N = xy1.shape[0]
    sigma2 = sigma * sigma
    n_valid = jnp.maximum(jnp.sum(mask), 1)

    # --- batched minimal samples (valid indices only, with replacement
    # fallback when < 8 matches) ---
    p = mask.astype(jnp.float32) / n_valid
    samples = jax.random.choice(key, N, shape=(iters, 8), replace=True, p=p)

    x1n, T1 = _normalize(xy1, mask)
    x2n, T2 = _normalize(xy2, mask)

    def one_h(idx):
        Hn = _compute_h(x1n[idx], x2n[idx])
        H21 = jnp.linalg.inv(T2) @ Hn @ T1
        s, _ = _score_h(H21, xy1, xy2, mask, sigma2)
        return s, H21

    def one_f(idx):
        Fn = _compute_f(x1n[idx], x2n[idx])
        F21 = T2.T @ Fn @ T1
        s, _ = _score_f(F21, xy1, xy2, mask, sigma2)
        return s, F21

    sh, Hs = jax.vmap(one_h)(samples)
    sf, Fs = jax.vmap(one_f)(samples)
    bh = jnp.argmax(sh)
    bf = jnp.argmax(sf)
    SH, H21 = sh[bh], Hs[bh]
    SF, F21 = sf[bf], Fs[bf]
    _, inl_h = _score_h(H21, xy1, xy2, mask, sigma2)
    _, inl_f = _score_f(F21, xy1, xy2, mask, sigma2)

    rh = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = rh > 0.40  # reference src/Initializer.cc:131

    # --- motion hypotheses ---
    Km = K.K

    # F -> E -> 4 hypotheses (reference DecomposeE + ReconstructF)
    E = Km.T @ F21 @ Km
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    tu = U[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-9)
    f_Rs = jnp.stack([R1, R1, R2, R2])
    f_ts = jnp.stack([tu, -tu, tu, -tu])

    # H -> 8 motions (Faugeras; reference ReconstructH src/Initializer.cc:610-801)
    A = jnp.linalg.inv(Km) @ H21 @ Km
    Ua, Da, Vta = jnp.linalg.svd(A)
    d1, d2, d3 = Da[0], Da[1], Da[2]
    s_det = jnp.linalg.det(Ua) * jnp.linalg.det(Vta)
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1v = jnp.asarray([aux1, aux1, -aux1, -aux1])
    x3v = jnp.asarray([aux3, -aux3, aux3, -aux3])
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    st = jnp.asarray([aux_st, -aux_st, -aux_st, aux_st])

    def h_case_pos(i):
        Rp = jnp.asarray(
            [[ct, 0.0, -st[i]], [0.0, 1.0, 0.0], [st[i], 0.0, ct]]
        )
        R = s_det * Ua @ Rp @ Vta
        tp = jnp.asarray([x1v[i], 0.0, -x3v[i]]) * (d1 - d3)
        t = Ua @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-9)

    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sp = jnp.asarray([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def h_case_neg(i):
        Rp = jnp.asarray(
            [[cp, 0.0, sp[i]], [0.0, -1.0, 0.0], [sp[i], 0.0, -cp]]
        )
        R = s_det * Ua @ Rp @ Vta
        tp = jnp.asarray([x1v[i], 0.0, x3v[i]]) * (d1 + d3)
        t = Ua @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-9)

    h_Rs = []
    h_ts = []
    for i in range(4):
        R, t = h_case_pos(i)
        h_Rs.append(R)
        h_ts.append(t)
    for i in range(4):
        R, t = h_case_neg(i)
        h_Rs.append(R)
        h_ts.append(t)
    h_Rs = jnp.stack(h_Rs)
    h_ts = jnp.stack(h_ts)

    inliers = jnp.where(use_h, inl_h, inl_f)
    # evaluate all 12 hypotheses, but only the relevant family can win
    all_Rs = jnp.concatenate([f_Rs, h_Rs])      # [12, 3, 3]
    all_ts = jnp.concatenate([f_ts, h_ts])
    fam_ok = jnp.concatenate(
        [jnp.full(4, ~use_h), jnp.full(8, use_h)]
    )

    n_good, goods, pars, pws = jax.vmap(
        lambda R, t: _check_rt(R, t, xy1, xy2, inliers, K, 4.0 * sigma2)
    )(all_Rs, all_ts)
    n_good = jnp.where(fam_ok, n_good, -1)
    best = jnp.argmax(n_good)
    best_n = n_good[best]
    second_n = jnp.sort(n_good)[-2]
    n_inl = jnp.sum(inliers)
    min_good = jnp.maximum(0.9 * n_inl, 50.0)
    # unique winner + enough support + enough parallax
    # (reference src/Initializer.cc:495-606 for F; :574 nsimilar check)
    ok = (
        (best_n.astype(jnp.float32) > min_good)
        & (second_n < 0.75 * best_n)
        & (pars[best] < 0.9998)
    )
    T21 = se3.make(all_Rs[best], all_ts[best])
    return InitResult(
        success=ok,
        T21=T21,
        points3d=pws[best],
        good=goods[best],
        used_homography=use_h,
    )
