"""Distributed Sim(3) pose-graph optimization over a device mesh.

The essential-graph optimization (reference src/Optimizer.cc:773-1039) is
edge-dominated: each Gauss-Newton iteration evaluates a residual and two
7x7 Jacobian blocks per edge. For KITTI-length trajectories (K >= 1024,
E in the thousands) the edge work is the scalable axis:

* EDGES are sharded across the mesh's ``edges`` axis — each device runs
  the forward-mode Jacobian sweep over its slice only and keeps the
  per-edge blocks LOCAL;
* the inner solve is matrix-free block-Jacobi PCG
  (solvers/pose_graph.pcg_solve): each CG step does the Hessian-vector
  product on the local edge slice and `psum`s a single [K, 7] vector —
  the round-2 design psum'd a dense [K,K,7,7] system (49 K^2 floats) and
  then solved (7K)^3 REPLICATED, which anti-scaled 1 -> 8 devices
  (SCALING_r02: 626 -> 5203 ms/iter); the collective here is 7K floats;
* the [K,7,7] diagonal blocks + gradient are psum'd once per GN iteration
  to build the preconditioner (replicated, O(K*49) — tiny).

Same jitted step on 1 device or N (SURVEY.md §4 mesh-parametrized
testing); matches `solvers/pose_graph.optimize_pose_graph_pcg` bit-for-bit
on a 1-device mesh and numerically on any mesh (psum reorders additions).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from orbslam2_tpu.solvers import pose_graph as pg


@partial(jax.jit, static_argnames=("mesh", "iters", "cg_iters"))
def sharded_optimize_pose_graph(
    prob: pg.PoseGraphProblem, mesh: Mesh, iters: int = 20, cg_iters: int = 64
) -> jnp.ndarray:
    """Edge-sharded pose-graph GN with a matrix-free PCG inner solve.
    `prob.edge_*` arrays must have length a multiple of the mesh size (pad
    with edge_valid=False rows). Returns optimized packed sim3 vertices
    [K, 8] (replicated)."""
    K = prob.vertices.shape[0]
    espec = P("edges")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), espec, espec, espec, espec, espec),
        out_specs=P(),
        check_vma=False,
    )
    def run(verts0, vfixed, vvalid, ei, ej, emeas, evalid, eweight):
        free = vvalid & ~vfixed
        Ai, Aj = pg.incidence_onehot(ei, ej, K)  # local edge slice

        def gn_iter(verts, _):
            rw, Ji, Jj = pg.edge_jacobians(
                verts, ei, ej, emeas, evalid, eweight, vfixed
            )
            D, g = pg.assemble_diag_g(Ji, Jj, Ai, Aj, rw)
            # [K,7,7] + [K,7] once per GN iteration (preconditioner + rhs)
            D = jax.lax.psum(D, "edges")
            g = jax.lax.psum(g, "edges")
            # each CG step psums one [K,7] vector (the Hessian-vector
            # product over the local edge slice)
            dx = pg.pcg_solve(
                Ji, Jj, ei, ej, Ai, Aj, D, g, free, cg_iters,
                reduce_fn=lambda y: jax.lax.psum(y, "edges"),
            )
            return pg.apply_update(verts, dx), None

        verts, _ = jax.lax.scan(gn_iter, verts0, None, length=iters)
        return verts

    return run(
        prob.vertices, prob.vertex_fixed, prob.vertex_valid,
        prob.edge_i, prob.edge_j, prob.edge_meas,
        prob.edge_valid, prob.edge_weight,
    )


def make_edges_mesh(n_devices: int | None = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("edges",))


def pad_edges(prob: pg.PoseGraphProblem, n_devices: int) -> pg.PoseGraphProblem:
    """Pad the edge arrays to a multiple of the mesh size with invalid rows."""
    E = prob.edge_i.shape[0]
    pad = (-E) % n_devices
    if pad == 0:
        return prob
    zi = jnp.zeros(pad, prob.edge_i.dtype)
    return prob._replace(
        edge_i=jnp.concatenate([prob.edge_i, zi]),
        edge_j=jnp.concatenate([prob.edge_j, zi]),
        edge_meas=jnp.concatenate(
            [prob.edge_meas, jnp.tile(pg.se3_to_pack(jnp.eye(4))[None], (pad, 1))]
        ),
        edge_valid=jnp.concatenate([prob.edge_valid, jnp.zeros(pad, bool)]),
        edge_weight=jnp.concatenate([prob.edge_weight, jnp.zeros(pad)]),
    )
