"""Eager convenience multiply: exact host planning + the fastest kernel.

`spgemm` is the jit-composable core (static capacities supplied by the
caller); `matmul` is the eager front door that plans capacities exactly
on the host (C++ planner) and dispatches the row-panel kernel when it
fits — the one-liner equivalent of the reference's
``multiply(A, tA, B, tB, C)`` (SURVEY.md C5).
"""

from __future__ import annotations

import jax

from hierarchical_block_sparse_lib_tpu.core.block_matrix import BlockMatrix
from hierarchical_block_sparse_lib_tpu.ops import basic
from hierarchical_block_sparse_lib_tpu.ops.spgemm import (
    plan_spgemm_ex,
    spgemm,
)


def matmul(
    a: BlockMatrix,
    b: BlockMatrix,
    alpha: float | jax.Array = 1.0,
    transpose_a: bool = False,
    transpose_b: bool = False,
    precision: str = "highest",
    backend: str = "auto",
):
    """C = alpha * op(A) @ op(B), exactly sized.  Returns (C, MultiplyInfo).

    Eager (plans on host per structure); inside jit/scan loops use
    `spgemm` with precomputed capacities instead.

    Banded structures: this functional front door deliberately does
    NOT auto-route through the dense-band tier — the pack/unpack
    boundary conversions cost ~4 eager dispatches (measured 133 ms
    total vs 27 ms for the block path at B1 on the axon backend,
    `scripts/bench_band_route.py`), so per-call routing only pays when
    the band form is HELD across calls.  Use `ops.band` directly
    (pack once, `band_mm` per iteration: 29-37 us/iter at B1 = ~3.7x
    the block path's honest rate), or the OO
    `api.HierarchicalBlockSparseMatrix.multiply`, which probes the
    structure (`band_probe`) and keeps results band-RESIDENT across
    multiplies automatically.
    """
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_groups import (
        plan_groups,
    )

    ae = basic.transpose(a) if transpose_a else a
    be = basic.transpose(b) if transpose_b else b
    pc, oc, mbr, mcr = plan_spgemm_ex(ae, be)
    # Slab kernels (groups v4 / roll v5) pay only in the OVERHEAD-
    # dominated regime: few pairs per block-row, where the per-row grid
    # cost of the rows kernel can't amortize.  Hardware A/B (round 3,
    # f32-highest, after the rows kernel's cross-row flow pipeline):
    #   pairs/row  8.7 (B1 banded)      -> groups wins 1.51x
    #   pairs/row 24.6 (16384, hw=256)  -> rows wins 1.18x
    #   pairs/row ~79  (hw=512, two n)  -> rows wins or ties
    # Big bands are MXU-pass-bound, not B-traffic-bound (DESIGN.md
    # section 8 ablations), so predicted traffic reduction does NOT
    # translate to time there.  (The v5 rolling-window kernel was
    # retired in round 4 after two rounds of no reproducible win.)
    gplan = None
    if pc < 16 * max(ae.nb_rows, 1):
        gplan = plan_groups(ae, be)
    return spgemm(
        ae,
        be,
        pair_cap=max(pc, 1),
        out_cap=max(oc, 1),
        alpha=alpha,
        precision=precision,
        backend=backend,
        row_caps=(mbr, mcr),
        group_caps=gplan.caps if gplan is not None else None,
    )


def syrk(
    a: BlockMatrix,
    alpha: float | jax.Array = 1.0,
    transpose: bool = False,
    precision: str = "highest",
    backend: str = "auto",
    full: bool = True,
):
    """Symmetric rank-k product: C = alpha * A @ A^T (or A^T @ A with
    `transpose=True`) — the reference-style symm/rank-k surface
    (SURVEY.md section 9.2), *symmetry-exploiting*: only upper-triangle
    (block_row <= block_col) outputs are computed on the MXU, roughly
    halving the leaf-GEMM count vs the generic multiply; the lower
    triangle is mirrored afterwards as C_ji = C_ij^T (cheap transpose +
    structural union, no GEMMs).

    With `full=False` only the upper-triangle part is returned.
    `info.n_block_pairs` counts the GEMMs actually performed (upper
    pairs).  Returns (C, MultiplyInfo)."""
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_syrk

    ae = basic.transpose(a) if transpose else a
    at = basic.transpose(ae)
    plan = plan_syrk(ae)
    cu, info = spgemm(
        ae,
        at,
        pair_cap=max(plan.pairs_raw, 1),
        gemm_cap=max(plan.pairs_upper, 1),
        out_cap=max(plan.out_upper, 1),
        alpha=alpha,
        precision=precision,
        backend=backend,
        row_caps=(plan.max_b_row, plan.max_c_row),
        syrk_upper=True,
    )
    if not full:
        return cu, info
    low = basic.transpose(basic.triu(cu, strict=True))
    c, add_ovf = basic.add_with_info(cu, low, cap=max(plan.out_full, 1))
    import dataclasses

    info = dataclasses.replace(info, out_overflow=info.out_overflow | add_ovf)
    return c, info
