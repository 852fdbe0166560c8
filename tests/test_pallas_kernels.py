"""Pallas kernel correctness (interpret mode on CPU) vs the XLA path."""

import numpy as np
import pytest

import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm
from hierarchical_block_sparse_lib_tpu.utils import generators as gen


@pytest.mark.parametrize("b", [8, 16])
def test_pallas_spgemm_matches_xla(b):
    n = 128
    r, c, v = gen.banded_coo(n, 6, seed=0)
    dA = gen.dense_oracle(r, c, v, n)
    A = hbsm.from_coo(r, c, v, n, block_size=b)
    n_pairs, n_out = plan_spgemm(A, A)
    C_p, info_p = hbsm.spgemm(
        A, A, pair_cap=n_pairs, out_cap=n_out, backend="pallas"
    )
    C_x, _ = hbsm.spgemm(A, A, pair_cap=n_pairs, out_cap=n_out, backend="xla")
    np.testing.assert_allclose(
        np.asarray(hbsm.to_dense(C_p)),
        np.asarray(hbsm.to_dense(C_x)),
        rtol=1e-6,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(hbsm.to_dense(C_p)), dA @ dA, rtol=2e-4, atol=1e-3
    )
    assert int(info_p.n_block_pairs) == n_pairs


def test_pallas_spgemm_with_padding_pairs():
    """pair_cap > actual pairs: trash segment must not pollute output."""
    n, b = 64, 8
    r, c, v = gen.random_block_sparse_coo(n, b, 0.3, seed=1)
    dA = gen.dense_oracle(r, c, v, n)
    A = hbsm.from_coo(r, c, v, n, block_size=b)
    n_pairs, n_out = plan_spgemm(A, A)
    C, info = hbsm.spgemm(
        A, A, pair_cap=n_pairs * 2 + 7, out_cap=n_out + 3, backend="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(hbsm.to_dense(C)), dA @ dA, rtol=2e-4, atol=1e-3
    )


def test_pallas_empty():
    A = hbsm.empty(64, 64, 8, cap=4)
    C, info = hbsm.spgemm(A, A, pair_cap=4, out_cap=4, backend="pallas")
    assert np.all(np.asarray(hbsm.to_dense(C)) == 0)
