"""Fused Pallas norm kernels (interpret mode on CPU) vs jnp reference."""

import numpy as np
import pytest

from hierarchical_block_sparse_lib_tpu.kernels import pallas_norms


@pytest.mark.parametrize("cap,b", [(7, 8), (32, 16), (33, 8), (1, 8)])
def test_block_frob_squared_kernel(cap, b):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((cap, b, b)).astype(np.float32)
    data[cap // 2] = 0  # a zero (padding-style) block
    got = np.asarray(pallas_norms.block_frob_squared(data, chunk=8))
    want = np.sum(data.astype(np.float64) ** 2, axis=(1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("tau", [0.0, 3.0, 1e9])
def test_norms_and_keep_kernel(tau):
    rng = np.random.default_rng(1)
    cap, b = 21, 8
    data = rng.standard_normal((cap, b, b)).astype(np.float32)
    data[3] = 0
    n2, keep = pallas_norms.norms_and_keep(data, np.float32(tau), chunk=8)
    want = np.sum(data.astype(np.float64) ** 2, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(n2), want, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(keep), want > tau**2)
