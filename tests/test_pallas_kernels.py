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


@pytest.mark.parametrize("tb", [(False, False), (True, False), (False, True)])
def test_rows_backend_matches_xla(tb):
    """Row-panel kernel (interpret) vs XLA on a rectangular product."""
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm_ex

    ta, tbb = tb
    rng = np.random.default_rng(9)
    n, m, k, b = 96, 144, 120, 8
    dA = (rng.standard_normal((n, k)) * (rng.random((n, k)) < 0.3)).astype(
        np.float32
    )
    dB = (rng.standard_normal((k, m)) * (rng.random((k, m)) < 0.25)).astype(
        np.float32
    )
    A = hbsm.from_dense(dA.T if ta else dA, block_size=b)
    B = hbsm.from_dense(dB.T if tbb else dB, block_size=b)
    import hierarchical_block_sparse_lib_tpu.ops.basic as basic

    Ae = basic.transpose(A) if ta else A
    Be = basic.transpose(B) if tbb else B
    pc, oc, mbr, mcr = plan_spgemm_ex(Ae, Be)
    C_r, info_r = hbsm.spgemm(
        A, B, pair_cap=pc, out_cap=oc, transpose_a=ta, transpose_b=tbb,
        backend="rows", row_caps=(mbr, mcr), alpha=0.5,
    )
    C_x, _ = hbsm.spgemm(
        A, B, pair_cap=pc, out_cap=oc, transpose_a=ta, transpose_b=tbb,
        backend="xla", alpha=0.5,
    )
    np.testing.assert_allclose(
        np.asarray(hbsm.to_dense(C_r)),
        np.asarray(hbsm.to_dense(C_x)),
        rtol=1e-6,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(hbsm.to_dense(C_r)), 0.5 * (dA @ dB), rtol=2e-4, atol=1e-3
    )
    assert int(info_r.n_block_pairs) == pc


@pytest.mark.parametrize("tier", [(2, 2), (1, 2), (1, 1)])
def test_rows_backend_pipeline_tiers(tier, monkeypatch):
    """All VMEM pipeline tiers (acc/panel parities) produce identical
    results; lower tiers serve dense-row problems that exceed VMEM."""
    from hierarchical_block_sparse_lib_tpu.kernels import pallas_gemm_rows
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm_ex

    monkeypatch.setattr(pallas_gemm_rows, "_tier", lambda *a, **k: tier)
    rng = np.random.default_rng(12)
    n, b = 128, 8
    d = (rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.4)).astype(
        np.float32
    )
    A = hbsm.from_dense(d, block_size=b)
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    C, info = hbsm.spgemm(
        A, A, pair_cap=pc, out_cap=oc, backend="rows", row_caps=(mbr, mcr)
    )
    np.testing.assert_allclose(
        np.asarray(hbsm.to_dense(C)), d @ d, rtol=2e-4, atol=1e-3
    )
    assert int(info.n_block_pairs) == pc


@pytest.mark.parametrize("chunk", [37, 128])
def test_gather_gemm_accumulate_chunked(chunk):
    """Multi-chunk path: segments spanning chunk boundaries accumulate
    exactly (carry-in aliasing), including trailing padding pairs."""
    import jax.numpy as jnp
    from hierarchical_block_sparse_lib_tpu.core.block_matrix import SENTINEL
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm import (
        gather_gemm_accumulate,
    )
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import spgemm_symbolic

    n, b = 160, 8
    rng = np.random.default_rng(5)
    d = (rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.25)).astype(
        np.float32
    )
    A = hbsm.from_dense(d, block_size=b)
    n_pairs, n_out = plan_spgemm(A, A)
    assert n_pairs > 2 * chunk  # actually exercises multiple chunks
    pair_cap = n_pairs + 5  # some padding pairs too
    a_idx, b_idx, c_id, total, raw = spgemm_symbolic(A, A, pair_cap)
    first = jnp.concatenate([jnp.ones((1,), bool), c_id[1:] != c_id[:-1]])
    valid = c_id != SENTINEL
    seg = jnp.where(valid, jnp.cumsum(first) - 1, n_out).astype(jnp.int32)

    out_chunked = gather_gemm_accumulate(
        A.data, A.data, a_idx, b_idx, seg, n_out, chunk=chunk
    )
    out_single = gather_gemm_accumulate(
        A.data, A.data, a_idx, b_idx, seg, n_out, chunk=pair_cap
    )
    np.testing.assert_allclose(
        np.asarray(out_chunked), np.asarray(out_single), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("density", [0.5, 0.12])
def test_rows_backend_high_precision_bf16x3(density):
    """precision='high' on the rows kernel (manual bf16x3 hi/lo split —
    XLA's Precision.HIGH, which Mosaic's dot can't express) must land
    between 'default' (1-pass bf16) and 'highest': operand error drops
    from ~2^-8 to ~2^-16 grade.  Both densities so the wide panel-dot
    path (dense rows) AND the per-pair dot path (narrow rows) run it."""
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm_ex

    rng = np.random.default_rng(33)
    n, b = 128, 8
    d = (rng.standard_normal((n, n)) * (rng.random((n, n)) < density)).astype(
        np.float32
    )
    A = hbsm.from_dense(d, block_size=b)
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    ref = d.astype(np.float64) @ d.astype(np.float64)
    scale = np.abs(ref).max()
    errs = {}
    for prec in ("default", "high", "highest"):
        C, info = hbsm.spgemm(
            A, A, pair_cap=pc, out_cap=oc, backend="rows",
            row_caps=(mbr, mcr), precision=prec,
        )
        got = np.asarray(hbsm.to_dense(C), dtype=np.float64)
        errs[prec] = np.abs(got - ref).max() / scale
        assert int(info.n_block_pairs) == pc
    # On CPU interpret mode 'default' does NOT truncate to bf16 (that is
    # TPU MXU behavior), so the default-vs-high ordering is only
    # observable on hardware; what IS checkable here is the bf16x3
    # numerics grade: ~2^-16 operand error (~1e-5), far better than real
    # 1-pass bf16 (~2e-3) and worse than full f32.
    assert errs["high"] < 2e-5, errs
    assert errs["high"] > 1e-7, errs  # proves the split path really ran
    assert errs["highest"] < errs["high"], errs


def _banded_dense(nb, b, hw, seed=5):
    rng = np.random.default_rng(seed)
    d = np.zeros((nb * b, nb * b), np.float32)
    for i in range(nb):
        for j in range(max(0, i - hw), min(nb, i + hw + 1)):
            d[i * b:(i + 1) * b, j * b:(j + 1) * b] = rng.standard_normal(
                (b, b)
            )
    return d


@pytest.mark.parametrize("nb,hw", [(21, 2), (16, 1), (24, 3)])
def test_groups_backend_banded(nb, hw):
    """Row-group kernel (B-slab reuse across consecutive A rows) vs the
    dense oracle on banded structures — multiple bandwidths, a partial
    last group (nb=21 not divisible by any pow2 G), and the planner's
    G/capacity choice including its B-traffic reuse accounting."""
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_groups import (
        plan_groups,
    )

    b = 128
    d = _banded_dense(nb, b, hw)
    A = hbsm.from_dense(d, block_size=b)
    plan = plan_groups(A, A)
    assert plan is not None and plan.g >= 2
    assert plan.reuse > 1.5  # the whole point: slab < per-pair B traffic
    pc, oc = plan_spgemm(A, A)
    C, info = hbsm.spgemm(
        A, A, pair_cap=pc, out_cap=oc, backend="groups",
        group_caps=plan.caps,
    )
    got = np.asarray(hbsm.to_dense(C))
    ref = d @ d
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
    assert int(info.n_block_pairs) == pc
    assert not bool(info.row_overflow)


def test_groups_backend_accum_union():
    """Fused beta-accumulate on the groups backend: union slots with no
    product contribution must be zero-flushed in-kernel (same exact-fill
    contract as the rows kernel) so beta*D lands on clean slots."""
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_groups import (
        plan_groups,
    )

    nb, b = 16, 128
    rng = np.random.default_rng(9)
    d = _banded_dense(nb, b, 1)
    A = hbsm.from_dense(d, block_size=b)
    dd = np.zeros_like(d)
    dd[:b, -b:] = rng.standard_normal((b, b))  # off-support union block
    D = hbsm.from_dense(dd, block_size=b)
    plan = plan_groups(A, A)
    pc, oc = plan_spgemm(A, A)
    C, _ = hbsm.spgemm(
        A, A, pair_cap=pc, out_cap=oc + 2, backend="groups",
        group_caps=plan.caps, accum=D, beta=0.5,
    )
    got = np.asarray(hbsm.to_dense(C))
    ref = d @ d + 0.5 * dd
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_groups_overflow_flagged():
    """Undersized group caps (stale plan after structure growth) must
    set MultiplyInfo.row_overflow — never silent (repo convention)."""
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_groups import (
        plan_groups,
    )

    nb, b = 16, 128
    d = _banded_dense(nb, b, 2)
    A = hbsm.from_dense(d, block_size=b)
    plan = plan_groups(A, A)
    pc, oc = plan_spgemm(A, A)
    g, am, sm, cm = plan.caps
    # Slab capacity below the true max (bucketing rounds to 8: go low).
    _, info = hbsm.spgemm(
        A, A, pair_cap=pc, out_cap=oc, backend="groups",
        group_caps=(g, am, 8, cm),
    )
    assert bool(info.row_overflow)


def test_plan_groups_rejects_nonlocal():
    """For scattered structures the union slab approaches nnz(B) and no
    G fits VMEM: the planner must return None (callers keep rows)."""
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_groups import (
        plan_groups,
    )

    rng = np.random.default_rng(3)
    nb, b = 64, 128
    n_blocks = nb * nb // 2
    ids = np.sort(rng.choice(nb * nb, n_blocks, replace=False)).astype(
        np.int32
    )
    import jax.numpy as jnp

    A = hbsm.BlockMatrix(
        ids=jnp.asarray(ids),
        data=jnp.zeros((n_blocks, b, b), jnp.float32),
        nnz=jnp.asarray(n_blocks, jnp.int32),
        n_rows=nb * b,
        n_cols=nb * b,
        block_size=b,
    )
    assert plan_groups(A, A) is None


def test_groups_backend_bf16_and_high_precision():
    """Groups backend with bf16 storage (operand-exact single pass) and
    f32 precision='high' (bf16x3 split via the shared mxu helper)."""
    import jax.numpy as jnp
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_groups import (
        plan_groups,
    )

    nb, b = 12, 128
    d = _banded_dense(nb, b, 1, seed=13)
    ref = d.astype(np.float64) @ d.astype(np.float64)
    scale = np.abs(ref).max()

    A = hbsm.from_dense(d, block_size=b)
    plan = plan_groups(A, A)
    pc, oc = plan_spgemm(A, A)
    C, _ = hbsm.spgemm(
        A, A, pair_cap=pc, out_cap=oc, backend="groups",
        group_caps=plan.caps, precision="high",
    )
    err_high = np.abs(
        np.asarray(hbsm.to_dense(C), np.float64) - ref
    ).max() / scale
    # bf16x3 grade: far better than 1-pass bf16, worse than full f32.
    assert 1e-8 < err_high < 2e-5, err_high

    Ab = hbsm.BlockMatrix(
        ids=A.ids, data=A.data.astype(jnp.bfloat16), nnz=A.nnz,
        n_rows=A.n_rows, n_cols=A.n_cols, block_size=b,
    )
    Cb, _ = hbsm.spgemm(
        Ab, Ab, pair_cap=pc, out_cap=oc, backend="groups",
        group_caps=plan.caps,
    )
    err_b = np.abs(
        np.asarray(hbsm.to_dense(Cb), np.float64) - ref
    ).max() / scale
    assert err_b < 2e-2, err_b  # bf16 storage grade
