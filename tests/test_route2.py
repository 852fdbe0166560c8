"""Two-level (host x chip) block routing (parallel.route2) on the
virtual 8-device mesh factored 2x4 and 4x2: correctness vs the dense
oracle, DCN-vs-flat traffic invariants, and counter parity
(SURVEY.md section 6.8 ICI/DCN mandate; VERDICT r2 item 3)."""

import numpy as np
import pytest

import jax

import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.parallel import dist, route, route2

from tests.test_route import _b5_style_matrix


@pytest.fixture(scope="module", params=[(2, 4), (4, 2)])
def mesh_hc(request):
    h, c = request.param
    assert len(jax.devices()) >= h * c
    return route2.make_mesh_2level(h, c), h, c


def test_2level_spgemm_matches_oracle(mesh_hc):
    mesh, h, c = mesh_hc
    n, b = 1024, 16
    d, A = _b5_style_matrix(n, b, seed=3)
    Ad = dist.distribute(A, dist.make_mesh(h * c))
    plan = route2.plan_route_2level(Ad, Ad, h, c)
    C, stats = route2.dist_spgemm_2level(
        Ad, Ad, mesh, plan, backend="xla"
    )
    got = np.asarray(hbsm.to_dense(dist.undistribute(C)))
    np.testing.assert_allclose(got, d @ d, rtol=2e-4, atol=5e-3)
    assert not bool(stats["overflow"])
    # Counter parity with the single-device planner.
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm

    n_pairs, _ = plan_spgemm(A, A)
    assert int(stats["n_block_pairs"]) == n_pairs
    assert plan.total_pairs == n_pairs
    assert int(np.asarray(stats["per_device_pairs"]).sum()) == n_pairs


def test_2level_dcn_never_exceeds_flat(mesh_hc):
    """The union-share transport must ship every block across DCN at
    most once per destination host: dcn_blocks <= the flat plan's
    inter-host copies, strictly less when sibling chips share remote
    panels (the banded B5 mix guarantees sharing)."""
    mesh, h, c = mesh_hc
    n, b = 1024, 16
    d, _ = _b5_style_matrix(n, b, seed=7, extra_random=16)
    # Dense block column 0: every chip needs B block-row 0, so host 0
    # chip 0's row-0 panel is shared by ALL sibling chips remotely.
    d[:, :b] = 0.01
    A = hbsm.from_dense(d, block_size=b)
    Ad = dist.distribute(A, dist.make_mesh(h * c))
    plan = route2.plan_route_2level(Ad, Ad, h, c)
    assert plan.dcn_blocks <= plan.dcn_blocks_flat
    if c > 1:
        assert plan.dcn_blocks < plan.dcn_blocks_flat
    # The flat plan agrees about what crosses hosts.
    fplan = route.plan_route(Ad, Ad, h * c)
    assert plan.dcn_blocks_flat <= fplan.blocks_routed
    # Result capacity must match the flat plan's (same receive sets).
    assert plan.out_cap == fplan.out_cap


def test_2level_alpha_and_out_cap(mesh_hc):
    mesh, h, c = mesh_hc
    n, b = 512, 16
    d, A = _b5_style_matrix(n, b, seed=11)
    Ad = dist.distribute(A, dist.make_mesh(h * c))
    plan = route2.plan_route_2level(Ad, Ad, h, c)
    C, stats = route2.dist_spgemm_2level(
        Ad, Ad, mesh, plan, alpha=-0.5, backend="xla"
    )
    got = np.asarray(hbsm.to_dense(dist.undistribute(C)))
    np.testing.assert_allclose(got, -0.5 * (d @ d), rtol=2e-4, atol=5e-3)
    assert not bool(stats["overflow"])
