"""Pallas Hamming kernel vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import hamming
from orbslam2_tpu.ops.pallas_hamming import distance_matrix_pallas


@pytest.mark.parametrize("n,m", [(256, 256), (100, 300), (512, 1024)])
def test_matches_reference(rng, n, m):
    a = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (m, 8), dtype=np.uint32))
    ref = np.asarray(hamming.distance_matrix(a, b))
    got = np.asarray(distance_matrix_pallas(a, b, interpret=True))
    np.testing.assert_array_equal(ref, got)
