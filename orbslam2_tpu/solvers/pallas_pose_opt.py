"""Pallas TPU kernel: the ENTIRE robust pose-GN schedule in one kernel.

`solvers/pose_opt.pose_optimize` expresses each Gauss-Newton iteration as
~30 small XLA ops over [N]-sized arrays; a 4x10 schedule is 40 sequential
dependency-chained steps and the per-frame track program spends most of its
~11 ms walking them (the FLOPs are trivial — [1024] edges x a 6-dof state).
This kernel keeps the whole observation set in VMEM as eight (8, L) channel
planes, carries the pose as 12 scalars, and runs every round/iteration of
the schedule inside ONE kernel launch: residuals + analytic Jacobians on
the VPU, the 21 H entries / 6 b entries as masked vector reductions, and
the 6x6 Cholesky solve + se(3) Rodrigues update in scalar math. The math
line-for-line mirrors pose_opt.pose_optimize (reference
src/Optimizer.cc:239-450 semantics: Huber kernel on the first two rounds,
chi2 inlier reclassification after every round).

Falls back to the jnp implementation off-TPU; `interpret=True` exercises
the kernel in tests on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbslam2_tpu.geometry.camera import Intrinsics
from orbslam2_tpu.solvers import pose_opt
from orbslam2_tpu.solvers.pose_opt import (
    CHI2_MONO,
    CHI2_STEREO,
    PoseObservations,
    PoseOptResult,
)

_SUB = 8          # sublanes per channel plane
_LANE = 128       # lane quantum


def _chol6_solve(H, b):
    """Scalar 6x6 Cholesky solve (mirrors pose_opt.solve6_spd)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _exp_se3_scalar(dx):
    """Rodrigues SE(3) exp on 6 scalars -> (R 3x3 list, t 3 list).

    Same Taylor switches as geometry/se3.exp_se3."""
    rx, ry, rz, wx, wy, wz = dx
    t2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(jnp.maximum(t2, 1e-8))
    small = t2 < 1e-4
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / t2)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (1.0 - a) / t2)
    # W and W^2 entries
    W = [[0.0, -wz, wy], [wz, 0.0, -wx], [-wy, wx, 0.0]]
    W2 = [
        [-(wy * wy + wz * wz), wx * wy, wx * wz],
        [wx * wy, -(wx * wx + wz * wz), wy * wz],
        [wx * wz, wy * wz, -(wx * wx + wy * wy)],
    ]
    R = [[(1.0 if i == j else 0.0) + a * W[i][j] + b * W2[i][j]
          for j in range(3)] for i in range(3)]
    V = [[(1.0 if i == j else 0.0) + b * W[i][j] + c * W2[i][j]
          for j in range(3)] for i in range(3)]
    rho = [rx, ry, rz]
    t = [sum(V[i][k] * rho[k] for k in range(3)) for i in range(3)]
    return R, t


def _make_kernel(rounds: int, iters: int):
    def kernel(kp_ref, data_ref, tout_ref, stat_ref):
        fx = kp_ref[0, 0]
        fy = kp_ref[0, 1]
        cx = kp_ref[0, 2]
        cy = kp_ref[0, 3]
        bf = kp_ref[0, 4]
        # initial pose scalars
        T = [kp_ref[0, 8 + i] for i in range(12)]  # r00..r22, tx..tz row-major

        px = data_ref[0]
        py = data_ref[1]
        pz = data_ref[2]
        um = data_ref[3]
        vm = data_ref[4]
        urm = data_ref[5]
        isig = data_ref[6]
        mask0 = data_ref[7]          # 1.0 / 0.0
        is2 = urm >= 0.0
        chi2_th = jnp.where(is2, CHI2_STEREO, CHI2_MONO)
        delta = jnp.sqrt(chi2_th)

        def residuals(T):
            r00, r01, r02, r10, r11, r12, r20, r21, r22, tx, ty, tz = T
            pcx = r00 * px + r01 * py + r02 * pz + tx
            pcy = r10 * px + r11 * py + r12 * pz + ty
            pcz = r20 * px + r21 * py + r22 * pz + tz
            valid = pcz > 1e-3
            zs = jnp.where(valid, pcz, 1.0)
            iz = 1.0 / zs
            iz2 = iz * iz
            u = fx * pcx * iz + cx
            v = fy * pcy * iz + cy
            urp = u - bf * iz
            r0 = um - u
            r1 = vm - v
            r2 = jnp.where(is2, urm - urp, 0.0)
            return pcx, pcy, pcz, iz, iz2, valid, r0, r1, r2

        mask = mask0 > 0.5
        for rnd in range(rounds):
            kernel_on = rnd < 2
            mask_f = mask.astype(jnp.float32)

            def gn_iter(_, T, mask_f=mask_f, kernel_on=kernel_on):
                pcx, pcy, pcz, iz, iz2, valid, r0, r1, r2 = residuals(T)
                active_b = (mask_f > 0.5) & valid
                active = active_b.astype(jnp.float32)
                # padded slots may hold NaN: select, don't multiply
                r0 = jnp.where(active_b, r0, 0.0)
                r1 = jnp.where(active_b, r1, 0.0)
                r2 = jnp.where(active_b, r2, 0.0)
                e2 = r0 * r0 + r1 * r1 + r2 * r2
                chi2 = e2 * isig
                en = jnp.sqrt(jnp.maximum(chi2, 1e-12))
                if kernel_on:
                    w_h = jnp.where(en > delta, delta / en, 1.0)
                else:
                    w_h = 1.0
                w = isig * w_h * active

                # J rows (see pose_opt._residuals_jacobians):
                #   du  = (a, 0, c),  a = fx iz,      c = -fx pcx iz2
                #   dv  = (0, b, c2), b = fy iz,      c2 = -fy pcy iz2
                #   dur = (a, 0, c3), c3 = c + bf iz2   (stereo rows only)
                a = fx * iz
                c = -fx * pcx * iz2
                b_ = fy * iz
                c2 = -fy * pcy * iz2
                c3 = c + bf * iz2
                s2 = is2.astype(jnp.float32)

                J0 = [-a, jnp.zeros_like(a), -c, -c * py,
                      -(a * pcz - c * px), a * py]
                J1 = [jnp.zeros_like(a), -b_, -c2, b_ * pcz - c2 * py,
                      c2 * px, -b_ * px]
                J2 = [(-a) * s2, jnp.zeros_like(a), (-c3) * s2,
                      (-c3 * py) * s2, (-(a * pcz - c3 * px)) * s2,
                      (a * py) * s2]

                wJ0 = [w * j for j in J0]
                wJ1 = [w * j for j in J1]
                wJ2 = [w * j for j in J2]
                H = [[None] * 6 for _ in range(6)]
                for j in range(6):
                    for k in range(j, 6):
                        H[j][k] = jnp.sum(
                            wJ0[j] * J0[k] + wJ1[j] * J1[k] + wJ2[j] * J2[k]
                        )
                        H[k][j] = H[j][k]
                bvec = [
                    jnp.sum(wJ0[j] * r0 + wJ1[j] * r1 + wJ2[j] * r2)
                    for j in range(6)
                ]
                tr = H[0][0] + H[1][1] + H[2][2] + H[3][3] + H[4][4] + H[5][5]
                damp = 1e-5 * (tr / 6.0 + 1e-6)
                for j in range(6):
                    H[j][j] = H[j][j] + damp
                negb = [-x for x in bvec]
                dx = _chol6_solve(H, negb)
                b2 = sum(x * x for x in bvec)
                ok = (b2 > 1e-20)
                for x in dx:
                    ok = ok & jnp.isfinite(x)
                okf = ok.astype(jnp.float32)
                dx = [x * okf for x in dx]
                Rd, td = _exp_se3_scalar(dx)
                r00, r01, r02, r10, r11, r12, r20, r21, r22, tx, ty, tz = T
                Ro = [[r00, r01, r02], [r10, r11, r12], [r20, r21, r22]]
                to = [tx, ty, tz]
                Rn = [[sum(Rd[i][k] * Ro[k][j] for k in range(3))
                       for j in range(3)] for i in range(3)]
                tn = [sum(Rd[i][k] * to[k] for k in range(3)) + td[i]
                      for i in range(3)]
                return (Rn[0][0], Rn[0][1], Rn[0][2], Rn[1][0], Rn[1][1],
                        Rn[1][2], Rn[2][0], Rn[2][1], Rn[2][2],
                        tn[0], tn[1], tn[2])

            T = jax.lax.fori_loop(0, iters, gn_iter, tuple(T))
            # chi2 reclassification on the round's final pose
            _, _, _, _, _, valid, r0, r1, r2 = residuals(T)
            m0 = (mask0 > 0.5) & valid
            r0 = jnp.where(m0, r0, 0.0)
            r1 = jnp.where(m0, r1, 0.0)
            r2 = jnp.where(m0, r2, 0.0)
            chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * isig
            mask = m0 & valid & (chi2 <= chi2_th)

        # final chi2 at the solution (masked slots zeroed)
        _, _, _, _, _, valid, r0, r1, r2 = residuals(T)
        chi2 = (r0 * r0 + r1 * r1 + r2 * r2) * isig
        chi2 = jnp.where(mask0 > 0.5, chi2, 0.0)

        for i in range(12):
            tout_ref[0, i] = T[i]
        stat_ref[0] = mask.astype(jnp.float32)
        stat_ref[1] = chi2

    return kernel


@partial(jax.jit, static_argnames=("rounds", "iters", "interpret"))
def pose_optimize_pallas(
    Tcw0: jnp.ndarray,
    obs: PoseObservations,
    K: Intrinsics,
    rounds: int = 4,
    iters: int = 10,
    interpret: bool = False,
) -> PoseOptResult:
    """Drop-in replacement for pose_opt.pose_optimize on TPU."""
    N = obs.pw.shape[0]
    B = _SUB * _LANE
    Np = pl.cdiv(N, B) * B
    L = Np // _SUB

    def plane(x, pad_value):
        x = x.astype(jnp.float32)
        if Np != N:
            x = jnp.pad(x, (0, Np - N), constant_values=pad_value)
        return x.reshape(_SUB, L)

    data = jnp.stack(
        [
            plane(obs.pw[:, 0], 0.0),
            plane(obs.pw[:, 1], 0.0),
            plane(obs.pw[:, 2], 0.0),
            plane(obs.uv[:, 0], 0.0),
            plane(obs.uv[:, 1], 0.0),
            plane(obs.ur, -1.0),
            plane(obs.inv_sigma2, 1.0),
            plane(obs.mask.astype(jnp.float32), 0.0),
        ]
    )
    kp = jnp.zeros((1, 24), jnp.float32)
    kp = kp.at[0, 0].set(K.fx).at[0, 1].set(K.fy)
    kp = kp.at[0, 2].set(K.cx).at[0, 3].set(K.cy).at[0, 4].set(K.bf)
    Tflat = jnp.concatenate(
        [Tcw0[:3, :3].reshape(-1), Tcw0[:3, 3]]
    ).astype(jnp.float32)
    kp = jax.lax.dynamic_update_slice(kp, Tflat[None, :], (0, 8))

    tout, stat = pl.pallas_call(
        _make_kernel(rounds, iters),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 12), jnp.float32),
            jax.ShapeDtypeStruct((2, _SUB, L), jnp.float32),
        ],
        interpret=interpret,
    )(kp, data)

    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(tout[0, :9].reshape(3, 3))
    T = T.at[:3, 3].set(tout[0, 9:12])
    inliers = stat[0].reshape(-1)[:N] > 0.5
    chi2 = stat[1].reshape(-1)[:N]
    return PoseOptResult(
        Tcw=T,
        inliers=inliers,
        num_inliers=jnp.sum(inliers),
        chi2=chi2,
    )


def pose_optimize_fast(Tcw0, obs, K, rounds: int = 4, iters: int = 10):
    """Dispatch: fused Pallas kernel on TPU, jnp reference elsewhere.

    ORBSLAM_TPU_NO_PALLAS=1 forces the jnp path on TPU (A/B debugging)."""
    import os

    platform = jax.devices()[0].platform
    disabled = os.environ.get("ORBSLAM_TPU_NO_PALLAS", "0").lower() not in ("", "0", "false")
    if platform in ("tpu", "axon") and not disabled:
        return pose_optimize_pallas(Tcw0, obs, K, rounds=rounds, iters=iters)
    return pose_opt.pose_optimize(Tcw0, obs, K, rounds=rounds, iters=iters)
