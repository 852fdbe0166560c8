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
    """
    ae = basic.transpose(a) if transpose_a else a
    be = basic.transpose(b) if transpose_b else b
    pc, oc, mbr, mcr = plan_spgemm_ex(ae, be)
    return spgemm(
        ae,
        be,
        pair_cap=max(pc, 1),
        out_cap=max(oc, 1),
        alpha=alpha,
        precision=precision,
        backend=backend,
        row_caps=(mbr, mcr),
    )


def syrk(
    a: BlockMatrix,
    alpha: float | jax.Array = 1.0,
    transpose: bool = False,
    precision: str = "highest",
    backend: str = "auto",
):
    """Symmetric rank-k product: C = alpha * A @ A^T (or A^T @ A with
    `transpose=True`) — the reference-style symm/rank-k convenience
    (SURVEY.md section 9.2) over the same planned multiply.
    Returns (C, MultiplyInfo)."""
    return matmul(
        a, a,
        alpha=alpha,
        transpose_a=transpose,
        transpose_b=not transpose,
        precision=precision,
        backend=backend,
    )
