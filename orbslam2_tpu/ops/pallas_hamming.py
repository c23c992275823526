"""Pallas TPU kernel: tiled all-pairs Hamming distance over packed
256-bit ORB descriptors.

The jnp reference implementation (ops/hamming.py) broadcasts an
[N, M, 8] uint32 XOR before reducing — XLA fuses it, but the fused loop
still walks N*M*8 lanes from HBM-resident operands per output tile. This
kernel keeps a [TN, 8] x [TM, 8] pair of descriptor tiles in VMEM, unrolls
the 8-word XOR+popcount accumulation on the VPU, and writes one [TN, TM]
int32 tile — the canonical Pallas tiling pattern for the matcher's hottest
primitive (SURVEY.md §7 step 3).

Falls back to the jnp implementation off-TPU (the kernel also runs under
``interpret=True`` in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbslam2_tpu.ops import hamming as hamming_ref

TILE_N = 256
TILE_M = 256


def _popcount(v):
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _kernel(a_ref, b_ref, out_ref):
    # a_ref: [TILE_N, 8] uint32; b_ref: [TILE_M, 8] uint32
    acc = jnp.zeros((a_ref.shape[0], b_ref.shape[0]), jnp.int32)
    for w in range(8):  # unrolled word loop: 8 VPU XOR+popcount passes
        aw = a_ref[:, w][:, None]            # [TN, 1]
        bw = b_ref[:, w][None, :]            # [1, TM]
        acc = acc + _popcount(jnp.bitwise_xor(aw, bw))
    out_ref[:, :] = acc


def _pad_to(x, n):
    if x.shape[0] == n:
        return x
    return jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))


@partial(jax.jit, static_argnames=("interpret",))
def distance_matrix_pallas(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """All-pairs Hamming: a [N, 8], b [M, 8] uint32 -> [N, M] int32."""
    N, M = a.shape[0], b.shape[0]
    Np = pl.cdiv(N, TILE_N) * TILE_N
    Mp = pl.cdiv(M, TILE_M) * TILE_M
    ap = _pad_to(a, Np)
    bp = _pad_to(b, Mp)
    out = pl.pallas_call(
        _kernel,
        grid=(Np // TILE_N, Mp // TILE_M),
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, TILE_M), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.int32),
        interpret=interpret,
    )(ap, bp)
    return out[:N, :M]


def distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, jnp reference elsewhere."""
    platform = jax.devices()[0].platform
    if platform in ("tpu", "axon"):
        return distance_matrix_pallas(a, b)
    return hamming_ref.distance_matrix(a, b)
