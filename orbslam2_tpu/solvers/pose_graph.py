"""Sim(3) pose-graph ("essential graph") optimization.

Replaces `Optimizer::OptimizeEssentialGraph` (reference
src/Optimizer.cc:773-1039): 7-DoF Sim3 vertices per keyframe, edges from
loop closures, the spanning tree, and strong covisibilities (weight >= 100,
minFeat at :800), Gauss-Newton with tangent-space updates, then Sim3 -> SE3
recovery ([R, t/s], :1000-1010) and landmark re-mapping (:1012-1039).

TPU design: the edge residual e = log(S_meas_ji o S_i o S_j^-1) and its
Jacobians (forward-mode, vmapped over edges) are batched; the sparse
Hessian is scatter-added into a dense [7K, 7K] system and solved with
Cholesky — at essential-graph sizes (K <= a few hundred) the dense solve
is faster on the MXU than any sparse machinery.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_tpu.geometry import se3, sim3


class PoseGraphProblem(NamedTuple):
    vertices: jnp.ndarray    # [K, 8] packed sim3 S_iw (world -> cam i)
    vertex_valid: jnp.ndarray  # [K] bool
    vertex_fixed: jnp.ndarray  # [K] bool (loop KF fixed; reference :822)
    edge_i: jnp.ndarray      # [E] int32
    edge_j: jnp.ndarray      # [E] int32
    edge_meas: jnp.ndarray   # [E, 8] packed S_ji measurement (cam i -> cam j)
    edge_valid: jnp.ndarray  # [E] bool
    edge_weight: jnp.ndarray  # [E] float (1.0 normal, boost for loop edges)


def _edge_residual(delta_i, delta_j, Si_pack, Sj_pack, meas_pack):
    """e = log(S_meas_ji o (exp(di) o S_i) o (exp(dj) o S_j)^-1) [7]."""
    Si = sim3.compose(sim3.exp(delta_i), sim3.unpack(Si_pack))
    Sj = sim3.compose(sim3.exp(delta_j), sim3.unpack(Sj_pack))
    Sji = sim3.unpack(meas_pack)
    err = sim3.compose(sim3.compose(Sji, Si), sim3.inverse(Sj))
    return sim3.log(err)


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 20) -> jnp.ndarray:
    """Returns optimized packed sim3 vertices [K, 8]."""
    K = prob.vertices.shape[0]

    def gn_iter(verts, _):
        H, g = edge_system(
            verts, prob.edge_i, prob.edge_j, prob.edge_meas,
            prob.edge_valid, prob.edge_weight, prob.vertex_fixed, K,
        )
        free = prob.vertex_valid & ~prob.vertex_fixed
        dx = damp_and_solve(H, g, free)
        return apply_update(verts, dx), None

    verts, _ = jax.lax.scan(gn_iter, prob.vertices, None, length=iters)
    return verts


def edge_system(verts, edge_i, edge_j, edge_meas, edge_valid, edge_weight,
                vertex_fixed, K: int):
    """Assemble the Gauss-Newton normal equations (H [K,K,7,7], g [K,7])
    from a batch of Sim3 edges. Shared by the single-chip solver above and
    the edge-sharded distributed solver (parallel/sharded_pose_graph.py),
    whose shards each call this on their edge slice and psum the results."""
    zero7 = jnp.zeros(7)

    def jac_fn(Si_p, Sj_p, m_p):
        Ji = jax.jacfwd(_edge_residual, argnums=0)(zero7, zero7, Si_p, Sj_p, m_p)
        Jj = jax.jacfwd(_edge_residual, argnums=1)(zero7, zero7, Si_p, Sj_p, m_p)
        r = _edge_residual(zero7, zero7, Si_p, Sj_p, m_p)
        return r, Ji, Jj

    Si_p = verts[edge_i]
    Sj_p = verts[edge_j]
    r, Ji, Jj = jax.vmap(jac_fn)(Si_p, Sj_p, edge_meas)  # [E,7], [E,7,7] x2
    w = jnp.where(edge_valid, edge_weight, 0.0)
    free_i = ~vertex_fixed[edge_i]
    free_j = ~vertex_fixed[edge_j]
    # gate with where, not multiply: a disabled PADDING edge (i == j,
    # identity measurement) has a NaN Jacobian at log(identity), and
    # NaN * 0 stays NaN
    wf_i = (w * free_i)[:, None, None]
    wf_j = (w * free_j)[:, None, None]
    Ji = jnp.where(wf_i > 0, Ji * wf_i, 0.0)
    Jj = jnp.where(wf_j > 0, Jj * wf_j, 0.0)
    rw = jnp.where(w[:, None] > 0, r * w[:, None], 0.0)

    H = jnp.zeros((K, K, 7, 7))
    ii = edge_i
    jj = edge_j
    H = H.at[ii, ii].add(jnp.einsum("eai,eaj->eij", Ji, Ji))
    H = H.at[jj, jj].add(jnp.einsum("eai,eaj->eij", Jj, Jj))
    Hij = jnp.einsum("eai,eaj->eij", Ji, Jj)
    H = H.at[ii, jj].add(Hij)
    H = H.at[jj, ii].add(jnp.swapaxes(Hij, -1, -2))
    g = jnp.zeros((K, 7))
    g = g.at[ii].add(jnp.einsum("eai,ea->ei", Ji, rw))
    g = g.at[jj].add(jnp.einsum("eai,ea->ei", Jj, rw))
    return H, g


def damp_and_solve(H, g, free):
    """Mask fixed/invalid vertices, add trace-scaled damping, dense solve.
    Returns the tangent update dx [K, 7]."""
    K = g.shape[0]
    eye7 = jnp.eye(7)
    H = H * (free[:, None, None, None] & free[None, :, None, None])
    diag = jnp.arange(K)
    tr = jnp.trace(H[diag, diag], axis1=-2, axis2=-1)
    H = H.at[diag, diag].add(
        jnp.where(
            free[:, None, None],
            1e-6 * eye7 * jnp.maximum(tr[:, None, None] / 7.0, 1e-6) + 1e-8 * eye7,
            eye7,
        )
    )
    g = g * free[:, None]

    Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
    dx = jnp.linalg.solve(Hd, -g.reshape(7 * K)).reshape(K, 7)
    return jnp.where(
        free[:, None] & jnp.all(jnp.isfinite(dx), -1, keepdims=True), dx, 0.0
    )


def apply_update(verts, dx):
    return jax.vmap(
        lambda d, v: sim3.pack(sim3.compose(sim3.exp(d), sim3.unpack(v)))
    )(dx, verts)


def se3_to_pack(Tcw: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> packed sim3 with s = 1."""
    return sim3.pack(sim3.from_se3(Tcw))


def pack_to_se3(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed sim3 -> SE3 with scale folded into translation
    (reference src/Optimizer.cc:1000-1010)."""
    return sim3.to_se3(sim3.unpack(packed))


def remap_points(
    points: jnp.ndarray,
    ref_kf: jnp.ndarray,
    old_pack: jnp.ndarray,
    new_pack: jnp.ndarray,
) -> jnp.ndarray:
    """Carry landmarks through their reference keyframe's correction:
    p' = S_new^-1(S_old(p)) (reference src/Optimizer.cc:1012-1039)."""
    K = old_pack.shape[0]
    ref = jnp.clip(ref_kf, 0, K - 1)
    S_old = sim3.unpack(old_pack[ref])
    S_new = sim3.unpack(new_pack[ref])
    return sim3.apply(sim3.inverse(S_new), sim3.apply(S_old, points))
