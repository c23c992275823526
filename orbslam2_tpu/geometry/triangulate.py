"""Batched two-view DLT triangulation.

Replaces the reference's per-point 4x4 SVD (`Initializer::Triangulate`,
reference src/Initializer.cc:804-818; also used in
`LocalMapping::CreateNewMapPoints`, src/LocalMapping.cc:355-370) with one
batched linear solve over all candidate matches at once — the TPU-idiomatic
shape is [N, 4, 4] batched eigendecomposition instead of N tiny SVDs in a
loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from orbslam2_tpu.geometry.camera import Intrinsics


def _projection_matrix(Tcw: jnp.ndarray, K: Intrinsics) -> jnp.ndarray:
    """P = K [R | t] as [..., 3, 4]."""
    return jnp.einsum("ij,...jk->...ik", K.K, Tcw[..., :3, :4])


def triangulate_dlt(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    P1: jnp.ndarray,
    P2: jnp.ndarray,
) -> jnp.ndarray:
    """DLT triangulation, batched.

    Args:
      uv1, uv2: pixel coords in each view, [..., 2].
      P1, P2: 3x4 projection matrices (broadcast against batch dims).

    Returns:
      World points [..., 3] (homogeneous solution dehomogenized; w clamped).

    The 4x4 system A x = 0 is solved via the eigenvector of A^T A with the
    smallest eigenvalue — `eigh` batches cleanly on TPU where tiny SVDs
    would serialize.
    """
    rows = [
        uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        uv2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        uv2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # [..., 4, 4]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = vecs[..., :, 0]  # [..., 4]
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-10, 1e-10, w)
    return X[..., :3] / w[..., None]


def triangulate_two_view(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    Tcw1: jnp.ndarray,
    Tcw2: jnp.ndarray,
    K: Intrinsics,
) -> jnp.ndarray:
    """Triangulate pixel matches between two posed views -> world points [..., 3]."""
    P1 = _projection_matrix(Tcw1, K)
    P2 = _projection_matrix(Tcw2, K)
    return triangulate_dlt(uv1, uv2, P1, P2)


def parallax_cos(
    pw: jnp.ndarray, center1: jnp.ndarray, center2: jnp.ndarray
) -> jnp.ndarray:
    """cos of the ray parallax angle at each world point [..., 3].

    Used to arbitrate DLT-vs-stereo depth (reference src/LocalMapping.cc:317-353)
    and to validate initialization (reference src/Initializer.cc:880-996).
    """
    r1 = pw - center1
    r2 = pw - center2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)
