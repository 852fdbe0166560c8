"""Hierarchical block-sparse matrix-matrix multiply (SpGEMM).

Reference parity (SURVEY.md C5, section 4.2): the reference recurses over
the quadtree (8 child multiplies per node, zero-child short-circuit) and
runs BLAS GEMM at surviving leaf pairs.  Here the entire recursion is
replaced by (BASELINE.json:5):

1. **symbolic phase** — vectorized block-pair matching over the two
   sorted id arrays: for each stored A block (i,k), binary-search B's
   row-k range; enumerate all (a_idx, b_idx) pairs with a prefix-sum +
   searchsorted expansion (no per-pair host loop);
2. **numeric phase** — ONE batched MXU GEMM over all gathered pairs
   (XLA `dot_general` path here; fused Pallas gather-GEMM-accumulate in
   `kernels.pallas_gemm`), followed by a segment-sum accumulation into
   the distinct output blocks.

The zero-child short-circuit of the reference is inherited exactly: only
stored-x-stored block pairs are ever enumerated, so the block-multiply
count matches the reference's `no_of_block_multiplies` counter
(SURVEY.md C12) and is reported in `MultiplyInfo`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hierarchical_block_sparse_lib_tpu.core.block_matrix import (
    SENTINEL,
    BlockMatrix,
)
from hierarchical_block_sparse_lib_tpu.ops import basic


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MultiplyInfo:
    """Exact operation counters (the reference's instrumentation,
    SURVEY.md C12) — these ARE the benchmark metric (nnz-block GEMMs)."""

    n_block_pairs: jax.Array  # int32[] — leaf GEMMs performed
    n_out_blocks: jax.Array  # int32[] — distinct output blocks
    pair_overflow: jax.Array  # bool[] — pair_cap too small (results dropped)
    out_overflow: jax.Array  # bool[] — out_cap too small (results dropped)


@partial(jax.jit, static_argnames=("pair_cap",))
def spgemm_symbolic(a: BlockMatrix, b: BlockMatrix, pair_cap: int):
    """Enumerate contributing block pairs, sorted by output block id.

    Returns (a_idx, b_idx, c_id, total_pairs): int32[pair_cap] arrays;
    entries past `total_pairs` have c_id == SENTINEL.  Sorted by c_id so
    the numeric phase can accumulate segments sequentially.
    """
    a_valid = a.valid_mask()
    a_row = a.ids // a.nb_cols
    a_col = jnp.where(a_valid, a.ids % a.nb_cols, a.nb_cols)  # miss key
    b_row = jnp.where(b.valid_mask(), b.ids // b.nb_cols, b.nb_rows + 1)
    b_col = b.ids % b.nb_cols

    # Row-k range of B for each A block's column k (B ids are row-major
    # sorted, so each block-row of B is a contiguous run).
    lo = jnp.searchsorted(b_row, a_col, side="left")
    hi = jnp.searchsorted(b_row, a_col, side="right")
    cnt = jnp.where(a_valid, hi - lo, 0)
    offs = jnp.cumsum(cnt)
    total = offs[-1]

    # Expand: pair p belongs to A entry e = first index with offs[e] > p.
    p = jnp.arange(pair_cap, dtype=jnp.int32)
    e = jnp.searchsorted(offs, p, side="right").astype(jnp.int32)
    e_c = jnp.minimum(e, a.cap - 1)
    base = jnp.where(e_c > 0, offs[e_c - 1], 0)
    t = p - base
    valid_p = p < total
    a_idx = e_c
    b_idx = jnp.minimum(lo[e_c] + t, b.cap - 1)
    c_id = jnp.where(
        valid_p, a_row[e_c] * b.nb_cols + b_col[b_idx], SENTINEL
    ).astype(jnp.int32)

    order = jnp.argsort(c_id)
    return a_idx[order], b_idx[order], c_id[order], total.astype(jnp.int32)


_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _xla_numeric(a_data, b_data, a_idx, b_idx, acc_dtype, precision):
    """Gather + batched MXU GEMM via dot_general (the portable path)."""
    pa = a_data[a_idx]
    pb = b_data[b_idx]
    return jax.lax.dot_general(
        pa,
        pb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=acc_dtype,
        precision=_PRECISION[precision],
    )


@partial(
    jax.jit,
    static_argnames=(
        "pair_cap",
        "out_cap",
        "backend",
        "transpose_a",
        "transpose_b",
        "precision",
    ),
)
def spgemm(
    a: BlockMatrix,
    b: BlockMatrix,
    pair_cap: int,
    out_cap: int,
    alpha: float | jax.Array = 1.0,
    transpose_a: bool = False,
    transpose_b: bool = False,
    backend: str = "auto",
    precision: str = "highest",
):
    """C = alpha * op(A) @ op(B); returns (C, MultiplyInfo).

    `pair_cap` bounds the number of leaf GEMMs and `out_cap` the distinct
    output blocks (static shapes — the XLA sparsity idiom).  Overflow is
    reported in MultiplyInfo, never silent.  Use `plan_spgemm` (host) or
    `pair_bound` to size them.

    backend: 'xla' (gather + dot_general), 'pallas' (fused
    gather-GEMM-accumulate kernel, TPU), or 'auto'.

    precision: MXU input precision for f32 data — 'highest' (default;
    matches the C++ reference's f32 numerics via multi-pass MXU),
    'high', or 'default' (single-pass bf16 inputs: ~2e-3 rel error,
    fastest).  Ignored for non-f32 dtypes.
    """
    if transpose_a:
        a = basic.transpose(a)
    if transpose_b:
        b = basic.transpose(b)
    if a.n_cols != b.n_rows or a.block_size != b.block_size:
        raise ValueError(
            f"inner dims/block mismatch: {a.n_cols}x{a.block_size} vs "
            f"{b.n_rows}x{b.block_size}"
        )
    a_idx, b_idx, c_id, total = spgemm_symbolic(a, b, pair_cap)

    first = jnp.concatenate([jnp.ones((1,), bool), c_id[1:] != c_id[:-1]])
    valid_p = c_id != SENTINEL
    seg = jnp.cumsum(first) - 1
    seg = jnp.where(valid_p, seg, out_cap)  # trash segment -> dropped
    n_unique = jnp.sum(first & valid_p).astype(jnp.int32)

    if backend == "auto":
        use_pallas = (
            jax.default_backend() == "tpu" and a.block_size % 8 == 0
        )
        if use_pallas:
            try:
                from hierarchical_block_sparse_lib_tpu.kernels import (
                    pallas_gemm as _pg,  # noqa: F401
                )
            except ImportError:
                use_pallas = False
        backend = "pallas" if use_pallas else "xla"
    acc_dtype = jnp.promote_types(a.dtype, jnp.float32)
    if backend == "pallas":
        from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm import (
            gather_gemm_accumulate,
        )

        out_data = gather_gemm_accumulate(
            a.data, b.data, a_idx, b_idx, seg, out_cap, precision=precision
        )
    else:
        prod = _xla_numeric(
            a.data, b.data, a_idx, b_idx, acc_dtype, precision
        )
        out_data = (
            jnp.zeros((out_cap, a.block_size, b.block_size), acc_dtype)
            .at[seg]
            .add(prod, mode="drop")
        )
    out_data = (out_data * jnp.asarray(alpha, acc_dtype)).astype(a.dtype)
    out_ids = (
        jnp.full((out_cap,), SENTINEL, jnp.int32).at[seg].set(c_id, mode="drop")
    )
    c = BlockMatrix(
        ids=out_ids,
        data=out_data,
        nnz=jnp.minimum(n_unique, out_cap),
        n_rows=a.n_rows,
        n_cols=b.n_cols,
        block_size=a.block_size,
    )
    info = MultiplyInfo(
        n_block_pairs=total,
        n_out_blocks=n_unique,
        pair_overflow=total > pair_cap,
        out_overflow=n_unique > out_cap,
    )
    return c, info


def plan_spgemm(a: BlockMatrix, b: BlockMatrix):
    """Host-side exact symbolic plan: returns (n_pairs, n_out_blocks).

    The symbolic phase of SpGEMM run on host (numpy) to size pair_cap /
    out_cap before tracing.  A C++ fast path lives in `runtime.native`.
    """
    from hierarchical_block_sparse_lib_tpu.runtime import native

    a_ids = np.asarray(a.ids)
    b_ids = np.asarray(b.ids)
    return native.plan_spgemm(
        a_ids, b_ids, a.nb_cols, b.nb_rows, b.nb_cols
    )


def pair_bound(a: BlockMatrix, b: BlockMatrix) -> int:
    """Cheap static upper bound on pair count: cap(A) * max-row-nnz(B) is
    unavailable statically, so fall back to cap(A)*cap(B) clamped by the
    dense bound.  Prefer `plan_spgemm` for tight sizing."""
    dense = a.nb_rows * a.nb_cols * b.nb_cols
    return int(min(a.cap * b.cap, dense))
