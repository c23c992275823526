"""Hamming distance over packed 256-bit ORB descriptors.

Replaces the reference's SWAR popcount `ORBmatcher::DescriptorDistance`
(reference src/ORBmatcher.cc:46-63) with batched XOR+popcount producing
whole [N, M] distance matrices in one pass — brute-force dense matching is
the TPU-idiomatic substitute for the reference's grid/BoW candidate
pruning, because the VPU eats the full matrix faster than the host could
prune it.

Descriptors are [*, 8] uint32 (256 bits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def popcount_u32(v: jnp.ndarray) -> jnp.ndarray:
    """Per-lane popcount of uint32 (classic SWAR bit tricks)."""
    v = v.astype(jnp.uint32)
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance: a, b [..., 8] uint32 -> [...] int32."""
    return jnp.sum(popcount_u32(jnp.bitwise_xor(a, b)), axis=-1)


@jax.jit
def distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming: a [N, 8], b [M, 8] -> [N, M] int32 (0..256)."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(popcount_u32(x), axis=-1)


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """[..., 8] uint32 -> [..., 256] {0,1} uint8 (for matmul-based scoring)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*desc.shape[:-1], 256).astype(jnp.uint8)


@jax.jit
def distance_matrix_mxu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming via +-1 matmul on the MXU.

    hamming = (256 - <sa, sb>) / 2 where s = 2*bit - 1. For large N, M this
    rides the systolic array instead of the VPU. Exact for bf16? No —
    accumulate in f32 (values bounded by 256 so f32 is exact).
    """
    sa = unpack_bits(a).astype(jnp.bfloat16) * 2 - 1
    sb = unpack_bits(b).astype(jnp.bfloat16) * 2 - 1
    dot = jax.lax.dot_general(
        sa, sb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return ((256.0 - dot) * 0.5).astype(jnp.int32)
