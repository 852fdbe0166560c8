"""Matrix polynomials over the block-sparse format.

The general matrix-polynomial workload behind BASELINE.json:9: evaluate
p(A) = sum_k c_k A^k with per-power norm truncation (Horner form), and a
Chebyshev recurrence variant.  Every power is a hierarchical SpGEMM; the
truncation threshold gives the reference's error-controlled sparse
approximate multiplication semantics.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from hierarchical_block_sparse_lib_tpu.core.block_matrix import BlockMatrix
from hierarchical_block_sparse_lib_tpu.core.assembly import eye
from hierarchical_block_sparse_lib_tpu.ops import basic
from hierarchical_block_sparse_lib_tpu.ops.spgemm import spgemm
from hierarchical_block_sparse_lib_tpu.ops.truncate import truncate


def polynomial(
    a: BlockMatrix,
    coeffs: Sequence[float],
    tau: float,
    pair_cap: int,
    out_cap: int,
    backend: str = "auto",
):
    """Horner evaluation p(A) = c0 I + c1 A + ... + cn A^n with truncation
    after every multiply.  Returns (P, total_block_pairs, overflow):
    `overflow` is True if any multiply exceeded pair_cap/out_cap (result
    then incomplete — raise the caps)."""
    n = a.n_rows
    ident = eye(n, a.block_size, dtype=a.dtype, cap=a.nb_rows)
    acc = basic.scale(ident, coeffs[-1])
    total_pairs = jnp.zeros((), jnp.int32)
    overflow = jnp.zeros((), bool)
    for c in reversed(coeffs[:-1]):
        # Horner step acc <- acc@A + c*I in ONE structural pass via the
        # fused beta-accumulate; a union overflow (support past out_cap,
        # previously a silent repack drop) is reported via out_overflow.
        acc, info = spgemm(
            acc, a, pair_cap=pair_cap, out_cap=out_cap, backend=backend,
            accum=ident, beta=c,
        )
        total_pairs = total_pairs + info.n_block_pairs
        overflow = (
            overflow | info.pair_overflow | info.out_overflow
            | info.row_overflow
        )
        acc = truncate(acc, tau)
    return acc, total_pairs, overflow
