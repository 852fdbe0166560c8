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
    # row_caps too small for the row-panel kernel (its in-kernel clamp
    # would otherwise produce silently-wrong panels); always False for the
    # other backends.
    row_overflow: jax.Array
    # True when a `plan=` was supplied but some operand's id structure
    # diverged from what the plan was built for — the numeric phase then
    # gathered stale pairs and the result is WRONG.  Always False when no
    # plan is used.  Every planned primitive self-validates (never
    # silent).
    plan_mismatch: jax.Array
    # Exact logical-leaf multiply count (reference leaf granularity, e.g.
    # 16/32) when per-tile occupancy masks are supplied via
    # a_leaf_occ/b_leaf_occ (see ops.repack.coarsen(track_leaves=True));
    # -1 when not tracked.  This is the counter comparable to the
    # reference's `no_of_block_multiplies` at ITS leaf size; n_block_pairs
    # counts MXU-tile pairs (SURVEY.md section 8.5).
    n_leaf_multiplies: jax.Array


@partial(
    jax.jit, static_argnames=("pair_cap", "filter_by_norm", "syrk_upper")
)
def spgemm_symbolic(
    a: BlockMatrix,
    b: BlockMatrix,
    pair_cap: int,
    tau: float | jax.Array = 0.0,
    filter_by_norm: bool = False,
    syrk_upper: bool = False,
):
    """Enumerate contributing block pairs, sorted by output block id.

    Returns (a_idx, b_idx, c_id, total, raw_total): int32[pair_cap]
    arrays; entries past `total` have c_id == SENTINEL.  Sorted by c_id
    so the numeric phase can accumulate segments sequentially.  `total`
    is the number of surviving pairs, `raw_total` the unfiltered pair
    count (enumeration overflows iff raw_total > pair_cap).

    With `filter_by_norm=True`, pairs whose a-priori product norm bound
    ``||A_ik||_F * ||B_kj||_F <= tau`` are dropped before the numeric
    phase — the reference lineage's SpAMM-style error-controlled
    approximate multiply (SURVEY.md section 1: "sparse approximate
    multiplication with error control" for purification); the total
    dropped Frobenius mass is bounded by the sum of skipped bounds.
    Because the sort moves survivors to the front, the caller can slice
    the pair lists to a tight `gemm_cap` < pair_cap and spend MXU time
    on surviving pairs only (the symbolic workspace is cheap int32;
    the numeric batch is the b^3 cost).
    """
    a_valid = a.valid_mask()
    a_row = a.ids // a.nb_cols
    a_col = jnp.where(a_valid, a.ids % a.nb_cols, a.nb_cols)  # miss key
    b_row = jnp.where(b.valid_mask(), b.ids // b.nb_cols, b.nb_rows + 1)
    b_col = b.ids % b.nb_cols

    # Row-k range of B for each A block's column k (B ids are row-major
    # sorted, so each block-row of B is a contiguous run).
    # method="sort": TPU gathers are slow; the default binary-search
    # lowering costs log2(cap) gather passes (~200-300 us at cap~1k),
    # while the argsort-of-concatenation lowering is one fused sort
    # (~18 us measured) — 11-17x faster for every cap here.
    # One row-start table (ONE sort over capB + nb_rows) then serves
    # both range ends as gathers, instead of two sorted searchsorteds
    # over capB + capA each.
    b_row_start = jnp.searchsorted(
        b_row,
        jnp.arange(b.nb_rows + 1, dtype=jnp.int32),
        side="left",
        method="sort",
    ).astype(jnp.int32)
    # Padding rows carry the miss key nb_rows: lo == hi == end-of-valid.
    lo = b_row_start[jnp.minimum(a_col, b.nb_rows)]
    hi = b_row_start[jnp.minimum(a_col + 1, b.nb_rows)]
    cnt = jnp.where(a_valid, hi - lo, 0)
    offs = jnp.cumsum(cnt)
    total = offs[-1]

    # Expand: pair p belongs to A entry e = first index with offs[e] > p.
    p = jnp.arange(pair_cap, dtype=jnp.int32)
    e = jnp.searchsorted(
        offs, p, side="right", method="sort"
    ).astype(jnp.int32)
    e_c = jnp.minimum(e, a.cap - 1)
    base = jnp.where(e_c > 0, offs[e_c - 1], 0)
    t = p - base
    valid_p = p < total
    a_idx = e_c
    b_idx = jnp.minimum(lo[e_c] + t, b.cap - 1)
    if filter_by_norm:
        from hierarchical_block_sparse_lib_tpu.ops.norms import (
            block_frob_squared,
        )

        # Compare squared quantities to avoid per-block sqrt.
        an2 = block_frob_squared(a)
        bn2 = block_frob_squared(b)
        tau2 = jnp.square(jnp.asarray(tau, jnp.float32))
        valid_p = valid_p & (an2[a_idx] * bn2[b_idx] > tau2)
    if syrk_upper:
        # Symmetric-product enumeration (C = A @ A^T with b = A^T):
        # keep only upper-triangle outputs i <= j; the caller mirrors
        # C_ji = C_ij^T afterwards, halving the leaf-GEMM count
        # (SURVEY.md section 9.2 rank-k surface).
        valid_p = valid_p & (a_row[e_c] <= b_col[b_idx])
    c_id = jnp.where(
        valid_p, a_row[e_c] * b.nb_cols + b_col[b_idx], SENTINEL
    ).astype(jnp.int32)
    raw_total = total.astype(jnp.int32)
    if filter_by_norm or syrk_upper:
        total = jnp.sum(valid_p).astype(jnp.int32)

    order = jnp.argsort(c_id)
    return (
        a_idx[order],
        b_idx[order],
        c_id[order],
        total.astype(jnp.int32),
        raw_total,
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SymbolicPlan:
    """Device-resident symbolic plan (the output of `spgemm_symbolic`),
    reusable across `spgemm` calls while BOTH operands keep exactly the
    same id structure (fixed-sparsity iteration: stencil applications,
    repeated C = A@B with frozen supports).  Skips the symbolic phase —
    sorts, row-range matching, pair expansion — entirely; only the
    numeric phase runs.  Build with `make_plan`.

    When built with ``accum_ids=``/``out_cap=``, the union-merge of the
    beta-accumulate path (its own sort + two searchsorteds per call) is
    precomputed too: `out_ids`/`seg`/`pos_acc`/`n_unique` are the union
    structure of the product support with the accumulator support, and
    ``spgemm(..., plan=..., accum=...)`` then runs ONLY the numeric
    phase + scatters — the whole structural cost of a fixed-support
    C = alpha*AB + beta*D collapses to zero."""

    a_idx: jax.Array  # int32[pair_cap]
    b_idx: jax.Array  # int32[pair_cap]
    c_id: jax.Array  # int32[pair_cap], sorted, SENTINEL padded
    total: jax.Array  # int32[] surviving pairs
    raw_total: jax.Array  # int32[] unfiltered enumeration size
    # Operand id structure the plan was built for — compared on use and
    # reported via MultiplyInfo.plan_mismatch (a stale plan gathers
    # wrong pairs; the check keeps that loud, two int compares).
    a_ids: jax.Array | None = None  # int32[capA]
    b_ids: jax.Array | None = None  # int32[capB]
    # Optional precomputed accumulate-union structure (else None).
    out_ids: jax.Array | None = None  # int32[out_cap] union ids
    seg: jax.Array | None = None  # int32[pair_cap] pair -> union slot
    pos_acc: jax.Array | None = None  # int32[acc_cap] accum -> union slot
    n_unique: jax.Array | None = None  # int32[] distinct union blocks
    acc_ids: jax.Array | None = None  # int32[acc_cap] planned accum ids
    # Optional symmetric-mirror structure (make_plan(sym_mirror=True)):
    # for a SYMMETRIC product structure, mirror_src[j] is the union slot
    # holding the transpose of slot j's block (own index for
    # upper/diagonal slots); total_syrk counts the upper-triangle pairs
    # (the GEMMs the syrk_upper kernel actually runs).  mirror_ok is
    # False when the union id set was not symmetric (stale/asymmetric
    # plan — folded into plan_mismatch, never silent).
    mirror_src: jax.Array | None = None  # int32[out_cap]
    total_syrk: jax.Array | None = None  # int32[]
    mirror_ok: jax.Array | None = None  # bool[]


def make_plan(
    a: BlockMatrix,
    b: BlockMatrix,
    pair_cap: int,
    tau: float | jax.Array = 0.0,
    filter_by_norm: bool = False,
    syrk_upper: bool = False,
    accum_ids: jax.Array | None = None,
    out_cap: int | None = None,
    sym_mirror: bool = False,
) -> SymbolicPlan:
    """Run the symbolic phase once and package it for reuse via
    ``spgemm(..., plan=...)``.  Valid while both operands' id arrays are
    unchanged (data may change freely); with `filter_by_norm` the norm
    filter is frozen at planning time.  Staleness is self-checked at use
    (MultiplyInfo.plan_mismatch).

    With `accum_ids` (the accumulator's sorted id array) and `out_cap`,
    the beta-accumulate union structure is precomputed as well — the
    matching ``spgemm(..., plan=..., accum=...)`` call must use the same
    `out_cap` and an accumulator with exactly these ids.

    With `sym_mirror=True` (requires accum_ids/out_cap; operands and
    union structurally SYMMETRIC), the plan additionally carries the
    mirror map for the planned-symmetric multiply: the caller runs
    ``spgemm(..., plan=..., syrk_upper=True)`` — generic union slots,
    upper-triangle GEMMs only on the TPU kernel — then overwrites the
    strictly-lower slots with transposed upper blocks via `mirror_src`
    (one gather, zero structural ops; see models.purification.sp2_step
    symmetric+plan).  NOTE this differs from `syrk_upper=True` here,
    which would build UPPER-ONLY pair lists and output structure."""
    sym = spgemm_symbolic(
        a, b, pair_cap, tau=tau, filter_by_norm=filter_by_norm,
        syrk_upper=syrk_upper,
    )
    # The plan records the POST-transpose-flag operand structure the
    # symbolic phase saw; spgemm compares after its own transpose step.
    rec = dict(a_ids=a.ids, b_ids=b.ids)
    if accum_ids is None:
        if sym_mirror:
            raise ValueError("sym_mirror requires accum_ids/out_cap")
        return SymbolicPlan(*sym, **rec)
    if out_cap is None:
        raise ValueError("make_plan(accum_ids=...) requires out_cap")
    out_ids, seg, pos_acc, n_unique = basic.union_merge(
        sym[2], accum_ids, out_cap
    )
    mirror = {}
    if sym_mirror:
        if a.n_rows != a.n_cols:
            raise ValueError("sym_mirror needs a square matrix")
        nb = a.nb_rows
        c_id = sym[2]
        cv = c_id != SENTINEL
        crow = jnp.where(cv, c_id // nb, 0)
        ccol = jnp.where(cv, c_id % nb, 0)
        total_syrk = jnp.sum(cv & (crow <= ccol)).astype(jnp.int32)
        ov = out_ids != SENTINEL
        orow = jnp.where(ov, out_ids // nb, 0)
        ocol = jnp.where(ov, out_ids % nb, 0)
        mid = jnp.where(ov, ocol * nb + orow, SENTINEL).astype(jnp.int32)
        src = jnp.searchsorted(
            out_ids, mid, side="left", method="sort"
        ).astype(jnp.int32)
        src = jnp.clip(src, 0, out_ids.shape[0] - 1)
        lower = ov & (orow > ocol)
        # Asymmetric union (no transpose partner stored) is a plan bug
        # or structural asymmetry: loud via mirror_ok.
        mirror_ok = jnp.all(
            jnp.where(lower, out_ids[src] == mid, True)
        )
        mirror = dict(
            mirror_src=jnp.where(lower, src, jnp.arange(
                out_ids.shape[0], dtype=jnp.int32
            )),
            total_syrk=total_syrk,
            mirror_ok=mirror_ok,
        )
    return SymbolicPlan(
        *sym, **rec, out_ids=out_ids, seg=seg, pos_acc=pos_acc,
        n_unique=n_unique, acc_ids=accum_ids, **mirror,
    )


_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def alpha_is_one_static(alpha) -> bool:
    return isinstance(alpha, (int, float)) and float(alpha) == 1.0


def resolve_backend(
    block_size,
    dtype,
    nbc_b: int,
    pair_cap: int,
    row_caps=None,
    group_caps=None,
    filter_by_norm: bool = False,
    syrk_upper: bool = False,
) -> str:
    """The backend `spgemm(backend="auto")` will execute with, as a
    host-side decision callers can log/inspect (VERDICT r4 item 2: the
    bench must record the backend that actually ran).  Mirrors the
    dispatch rules exactly — spgemm itself calls this."""
    from hierarchical_block_sparse_lib_tpu.kernels import (
        pallas_gemm_fine,
        pallas_gemm_groups,
        pallas_gemm_rows,
    )

    on_tpu = jax.default_backend() == "tpu"
    if jnp.dtype(dtype) == jnp.float64:
        # The Pallas kernels accumulate in f32; f64 (x64 mode, CPU)
        # must take the dtype-clean dot_general path.
        return "xla"
    if (
        on_tpu
        and group_caps is not None
        and not filter_by_norm
        and not syrk_upper
        and pallas_gemm_groups.supported(
            block_size, dtype, *group_caps[1:], nbc_b
        )
    ):
        return "groups"
    if (
        on_tpu
        and row_caps is not None
        # Below ~1k pairs the row-panel kernel's per-grid-row fixed
        # costs (one grid step per A block-row regardless of row
        # occupancy) exceed the stream kernel's per-pair costs:
        # measured on B1 (278 pairs) rows=634 ns/pair vs
        # stream=362 ns/pair, crossing over as pair counts reach
        # the thousands (B2: rows wins 18-24%).  pair_cap is the
        # static trace-time proxy for the pair count.
        and pair_cap >= 1024
        and pallas_gemm_rows.supported(
            block_size, dtype, row_caps[0], row_caps[1], nbc_b
        )
    ):
        return "rows"
    if block_size % (128 if on_tpu else 8) == 0:
        return "pallas"
    if (
        on_tpu
        and row_caps is not None
        and not filter_by_norm
        and not syrk_upper
        and pallas_gemm_fine.supported(
            block_size, dtype, row_caps[0], row_caps[1], nbc_b
        )
    ):
        # Sub-128 leaves (the reference's configured 16/32): the
        # flat-layout block-diagonal row kernel (round 5) — Mosaic
        # rejects sub-128 block slices, so the 128-tile kernels cannot
        # run, but [b,b] blocks stored as [b^2/128,128] flat tiles can
        # (kernels/pallas_gemm_fine.py).
        return "fine"
    # Remaining sub-128 cases run the gather+dot_general fallback
    # (scripts/bench_b32_backend.py).
    return "xla"


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


# Bound the materialized gather of the XLA path: 2 * chunk * b^2 * 4B
# (e.g. 1 GB at b=128, chunk=8192 per operand gather + product).
_XLA_PAIR_CHUNK = 8192


def _xla_numeric_accumulate(
    a_data, b_data, a_idx, b_idx, seg, out_shape, acc_dtype, precision
):
    """Chunked gather-GEMM-scatter: memory-bounded for any pair count."""
    pairs = a_idx.shape[0]
    out = jnp.zeros(out_shape, acc_dtype)
    if pairs <= _XLA_PAIR_CHUNK:
        prod = _xla_numeric(a_data, b_data, a_idx, b_idx, acc_dtype, precision)
        return out.at[seg].add(prod, mode="drop")
    n_chunks = -(-pairs // _XLA_PAIR_CHUNK)
    pad = n_chunks * _XLA_PAIR_CHUNK - pairs
    if pad:
        a_idx = jnp.concatenate([a_idx, jnp.zeros((pad,), jnp.int32)])
        b_idx = jnp.concatenate([b_idx, jnp.zeros((pad,), jnp.int32)])
        seg = jnp.concatenate(
            [seg, jnp.full((pad,), out_shape[0], jnp.int32)]
        )
    def body(out, sl):
        ai, bi, sg = sl
        prod = _xla_numeric(a_data, b_data, ai, bi, acc_dtype, precision)
        return out.at[sg].add(prod, mode="drop"), None

    ck = _XLA_PAIR_CHUNK
    slices = (
        a_idx.reshape(n_chunks, ck),
        b_idx.reshape(n_chunks, ck),
        seg.reshape(n_chunks, ck),
    )
    out, _ = jax.lax.scan(body, out, slices)
    return out


@partial(
    jax.jit,
    static_argnames=(
        "pair_cap",
        "out_cap",
        "backend",
        "transpose_a",
        "transpose_b",
        "precision",
        "filter_by_norm",
        "gemm_cap",
        "row_caps",
        "group_caps",
        "syrk_upper",
        "accum_aligned",
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
    tau: float | jax.Array = 0.0,
    filter_by_norm: bool = False,
    gemm_cap: int | None = None,
    row_caps: tuple[int, int] | None = None,
    group_caps: tuple[int, int, int, int] | None = None,
    syrk_upper: bool = False,
    a_leaf_occ: jax.Array | None = None,
    b_leaf_occ: jax.Array | None = None,
    accum: BlockMatrix | None = None,
    beta: float | jax.Array = 1.0,
    plan: SymbolicPlan | None = None,
    accum_aligned: bool = False,
):
    """C = alpha * op(A) @ op(B) [+ beta * accum]; returns (C, MultiplyInfo).

    `plan` (from `make_plan`) skips the symbolic phase for
    fixed-structure iteration; it must have been built for these
    operands' exact id structure and this `pair_cap`/`tau` configuration
    (data may differ).

    `accum` fuses the BLAS-gemm-style beta-accumulate (the reference's
    ``multiply`` writes INTO C, SURVEY.md C5): C's structure becomes the
    union of the product support and accum's support, and beta*accum is
    added in the same pass — one structural op instead of the
    spgemm-then-add chain (which costs a full extra sort + two extra
    passes over the block tensor; fusing it cut the SP2 purification
    step ~30%).  `alpha`/`beta` may be traced scalars.

    `pair_cap` bounds the number of enumerated block pairs and `out_cap`
    the distinct output blocks (static shapes — the XLA sparsity idiom).
    Overflow is reported in MultiplyInfo, never silent.  Use
    `plan_spgemm` (host) or `pair_bound` to size them.

    backend: 'xla' (gather + dot_general), 'pallas' (streaming
    gather-GEMM-accumulate kernel, TPU), 'rows' (row-panel kernel —
    fastest for general structures; needs `row_caps`), 'groups'
    (row-group kernel — B-slab reuse across consecutive A rows, fastest
    for banded/local structures; needs `group_caps`), or 'auto'
    (prefers groups > rows > pallas for the caps supplied).  [The v5
    rolling-window kernel was retired in round 4: two rounds of
    hardware A/B never produced a reproducible win — BASELINE.md.]

    row_caps: (max_b_row, max_c_row) from `plan_spgemm_ex` — static
    per-row capacities that let the row-panel kernel cache contiguous
    B-row panels and C-row accumulators in VMEM.  With 'auto' on TPU,
    providing row_caps selects the row-panel kernel when it fits.

    group_caps: (G, a_grp_max, slab_max, c_grp_max) from
    `kernels.pallas_gemm_groups.plan_groups` (or GroupPlan.caps) —
    per-row-group capacities for the group kernel.  With 'auto' on TPU,
    group_caps takes precedence over row_caps when supported (the
    planner only returns a plan when the structure is local enough to
    win).  Incompatible with `filter_by_norm`/`syrk_upper` (those fall
    back to rows/stream).

    precision: MXU input precision for f32 data — 'highest' (default;
    matches the C++ reference's f32 numerics via multi-pass MXU),
    'high' (3-pass bf16: XLA's Precision.HIGH; the rows kernel
    implements it as a manual hi/lo bf16 split since Mosaic's dot only
    exposes DEFAULT/HIGHEST — ~1e-5 rel at ~half the MXU passes of
    highest; the other Pallas backends round it up to HIGHEST), or
    'default' (single-pass bf16 inputs: ~2e-3 rel error, fastest).
    Ignored for non-f32 dtypes.

    Error-controlled (SpAMM-style) multiply: with `filter_by_norm=True`,
    block pairs with ||A_ik||_F * ||B_kj||_F <= tau are skipped.  Pass
    `gemm_cap` (sized by `plan_spamm`) to shrink the batched-GEMM shape
    to the surviving pairs — the symbolic workspace stays `pair_cap`
    (cheap int32), the MXU batch shrinks to `gemm_cap` (the b^3 cost).
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
    plan_mismatch = jnp.zeros((), bool)
    if plan is None:
        a_idx, b_idx, c_id, total, raw_total = spgemm_symbolic(
            a, b, pair_cap, tau=tau, filter_by_norm=filter_by_norm,
            syrk_upper=syrk_upper,
        )
    else:
        if plan.a_idx.shape[0] != pair_cap:
            raise ValueError(
                f"plan built for pair_cap={plan.a_idx.shape[0]}, "
                f"got {pair_cap}"
            )
        a_idx, b_idx, c_id = plan.a_idx, plan.b_idx, plan.c_id
        total, raw_total = plan.total, plan.raw_total
        # Self-check: a stale plan gathers wrong pairs — compare the
        # operands' id structure against what the plan was built for
        # (capacity changes count as drift; static shape check).
        if plan.a_ids is not None:
            for got, want in ((a.ids, plan.a_ids), (b.ids, plan.b_ids)):
                if got.shape != want.shape:
                    plan_mismatch = plan_mismatch | jnp.ones((), bool)
                else:
                    plan_mismatch = plan_mismatch | jnp.any(got != want)
    gemm_cap = pair_cap if gemm_cap is None else min(gemm_cap, pair_cap)
    if gemm_cap < pair_cap:
        # Survivors sort before SENTINEL padding: slicing keeps them all
        # as long as total <= gemm_cap (overflow reported below).
        a_idx = a_idx[:gemm_cap]
        b_idx = b_idx[:gemm_cap]
        c_id = c_id[:gemm_cap]

    if a_leaf_occ is not None:
        # Logical-leaf multiply count for pair (A_ik, B_kj): the inner
        # leaf index w contributes (leaves in A's leaf-col w) x (leaves
        # in B's leaf-row w) products; sum over pairs.  Chunked to bound
        # the [pairs, f] gather footprint.
        ca = jnp.sum(a_leaf_occ, axis=1, dtype=jnp.int32)  # [capA, f]
        rb = jnp.sum(b_leaf_occ, axis=2, dtype=jnp.int32)  # [capB, f]
        pv = c_id != SENTINEL
        pairs_n = a_idx.shape[0]
        ck = _XLA_PAIR_CHUNK
        if pairs_n <= ck:
            n_leaf = jnp.sum(
                jnp.where(
                    pv, jnp.sum(ca[a_idx] * rb[b_idx], axis=-1), 0
                )
            ).astype(jnp.int32)
        else:
            n_chunks = -(-pairs_n // ck)
            pad = n_chunks * ck - pairs_n
            ai_p = jnp.concatenate([a_idx, jnp.zeros((pad,), jnp.int32)])
            bi_p = jnp.concatenate([b_idx, jnp.zeros((pad,), jnp.int32)])
            pv_p = jnp.concatenate([pv, jnp.zeros((pad,), bool)])

            def body(tot, sl):
                ai, bi, m = sl
                return (
                    tot
                    + jnp.sum(
                        jnp.where(m, jnp.sum(ca[ai] * rb[bi], axis=-1), 0)
                    ),
                    None,
                )

            n_leaf, _ = jax.lax.scan(
                body,
                jnp.zeros((), jnp.int32),
                (
                    ai_p.reshape(n_chunks, ck),
                    bi_p.reshape(n_chunks, ck),
                    pv_p.reshape(n_chunks, ck),
                ),
            )
    else:
        n_leaf = jnp.full((), -1, jnp.int32)

    valid_p = c_id != SENTINEL
    if accum is None:
        first = jnp.concatenate(
            [jnp.ones((1,), bool), c_id[1:] != c_id[:-1]]
        )
        seg = jnp.cumsum(first) - 1
        seg = jnp.where(valid_p, seg, out_cap)  # trash segment -> dropped
        n_unique = jnp.sum(first & valid_p).astype(jnp.int32)
        out_ids_pre = (
            jnp.full((out_cap,), SENTINEL, jnp.int32)
            .at[seg]
            .set(c_id, mode="drop")
        )
        pos_acc = None
    else:
        if (accum.n_rows, accum.n_cols) != (a.n_rows, b.n_cols):
            raise ValueError("accum shape mismatch")
        if accum.block_size != a.block_size:
            raise ValueError("accum block_size mismatch")
        if accum_aligned:
            # ALIGNED accumulate (VERDICT r4 item 4): the output
            # structure IS the accumulator's (product support must be a
            # subset — the frozen-routed final-union regime,
            # route.freeze_route_plan).  The row-panel kernel then
            # initializes its VMEM row accumulators FROM accum instead
            # of zeroing, and the post-kernel union gather-add (the
            # 0.46-0.9 ms routed-stage overhead) disappears.
            if accum.cap != out_cap:
                raise ValueError(
                    f"accum_aligned needs accum.cap == out_cap "
                    f"({accum.cap} != {out_cap})"
                )
            out_ids_pre = accum.ids
            seg = None
            pos_acc = None
            n_unique = accum.nnz
            # Membership self-check (never silent): every product block
            # must land in an accumulator slot.  With a plan built for
            # this alignment (make_plan(accum_ids=...)) the check is
            # two id compares; the planless fallback pays a
            # searchsorted (a full sort per call — measured ~1 ms at
            # B2 union size, do not take this path in hot loops).
            if plan is not None and plan.acc_ids is not None:
                if accum.ids.shape != plan.acc_ids.shape:
                    plan_mismatch = plan_mismatch | jnp.ones((), bool)
                else:
                    plan_mismatch = plan_mismatch | jnp.any(
                        accum.ids != plan.acc_ids
                    )
            else:
                pos = jnp.searchsorted(
                    accum.ids, c_id, side="left", method="sort"
                )
                pos_c = jnp.clip(pos, 0, out_cap - 1)
                plan_mismatch = plan_mismatch | jnp.any(
                    jnp.where(
                        c_id != SENTINEL, accum.ids[pos_c] != c_id, False
                    )
                )
                # Sorted-unique invariant of the alignment target.
                plan_mismatch = plan_mismatch | jnp.any(
                    (accum.ids[1:] == accum.ids[:-1])
                    & accum.valid_mask()[1:]
                )
        elif plan is not None and plan.out_ids is not None:
            # Precomputed union structure (make_plan(accum_ids=...)):
            # valid only for an accumulator with the planned ids — also
            # self-checked into plan_mismatch.
            if plan.out_ids.shape[0] != out_cap:
                raise ValueError(
                    f"plan union built for out_cap="
                    f"{plan.out_ids.shape[0]}, got {out_cap}"
                )
            out_ids_pre = plan.out_ids
            # Keep the slot map aligned with the (possibly gemm_cap-
            # sliced) pair arrays.
            seg = plan.seg[:gemm_cap]
            pos_acc, n_unique = plan.pos_acc, plan.n_unique
            if accum.ids.shape != plan.acc_ids.shape:
                plan_mismatch = plan_mismatch | jnp.ones((), bool)
            else:
                plan_mismatch = plan_mismatch | jnp.any(
                    accum.ids != plan.acc_ids
                )
        else:
            # Output structure = union(product support, accum support):
            # union slots for BOTH inputs come back through one argsort's
            # inverse permutation (basic.union_merge) — int32 only, the
            # block data never moves through this.
            acc_ids = jnp.where(
                accum.valid_mask(), accum.ids, SENTINEL
            ).astype(jnp.int32)
            out_ids_pre, seg, pos_acc, n_unique = basic.union_merge(
                c_id, acc_ids, out_cap
            )
    if backend == "auto":
        backend = resolve_backend(
            a.block_size, a.dtype, b.nb_cols, pair_cap,
            row_caps=row_caps, group_caps=group_caps,
            filter_by_norm=filter_by_norm, syrk_upper=syrk_upper,
        )
    if accum_aligned:
        if accum is None:
            raise ValueError("accum_aligned requires accum")
        if backend != "rows":
            raise ValueError(
                "accum_aligned requires the rows backend (got "
                f"{backend!r}); supply row_caps that fit"
            )
        if not alpha_is_one_static(alpha):
            raise ValueError("accum_aligned supports alpha == 1 only")
    acc_dtype = jnp.promote_types(a.dtype, jnp.float32)
    if backend == "groups":
        from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_groups import (
            groups_spgemm,
        )

        if group_caps is None:
            raise ValueError(
                "backend='groups' requires group_caps (plan_groups)"
            )
        if filter_by_norm or syrk_upper:
            raise ValueError(
                "backend='groups' supports neither filter_by_norm nor "
                "syrk_upper; use the rows backend"
            )
        gr, agm, sgm, cgm = (int(x) for x in group_caps)
        out_data = groups_spgemm(
            a.ids, a.data, b.ids, b.data, out_ids_pre,
            a.nb_rows, b.nb_rows, b.nb_cols, out_cap,
            g_rows=gr, a_grp_max=agm, slab_max=sgm, c_grp_max=cgm,
            precision=precision,
        )
    elif backend == "rows":
        from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_rows import (
            rows_spgemm,
        )

        if row_caps is None:
            raise ValueError("backend='rows' requires row_caps (plan_spgemm_ex)")
        if filter_by_norm:
            # Same norms/threshold the symbolic phase used, so the
            # kernel's skip decisions match out_ids exactly.
            from hierarchical_block_sparse_lib_tpu.ops.norms import (
                block_frob_squared as _bfs,
            )

            fkw = dict(
                a_norms2=_bfs(a),
                b_norms2=_bfs(b),
                tau2=jnp.square(jnp.asarray(tau, jnp.float32)),
            )
        else:
            fkw = {}
        if accum_aligned:
            accd = accum.data
            if not (isinstance(beta, (int, float)) and float(beta) == 1.0):
                # Non-literal-1 beta: pre-scale the accumulator (one
                # fused pass) — the kernel itself accumulates at beta=1.
                accd = (
                    accd.astype(acc_dtype)
                    * jnp.asarray(beta, acc_dtype)
                ).astype(jnp.float32)
            fkw["acc_data"] = accd
        out_data = rows_spgemm(
            a.ids, a.data, b.ids, b.data, out_ids_pre,
            a.nb_rows, b.nb_rows, b.nb_cols, out_cap,
            row_caps[0], row_caps[1], precision=precision,
            triu=syrk_upper, **fkw,
        )
    elif backend == "fine":
        from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_fine import (
            fine_spgemm,
        )

        if row_caps is None:
            raise ValueError("backend='fine' requires row_caps (plan_spgemm_ex)")
        if filter_by_norm or syrk_upper:
            raise ValueError(
                "backend='fine' supports neither filter_by_norm nor "
                "syrk_upper; use the xla backend at sub-128 leaves"
            )
        out_data = fine_spgemm(
            a.ids, a.data, b.ids, b.data, out_ids_pre,
            a.nb_rows, b.nb_rows, b.nb_cols, out_cap,
            row_caps[0], row_caps[1], precision=precision,
        )
    elif backend == "pallas":
        from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_stream import (
            gather_gemm_accumulate_stream,
        )

        out_data = gather_gemm_accumulate_stream(
            a.data, b.data, a_idx, b_idx, seg, out_cap, precision=precision
        )
    else:
        out_data = _xla_numeric_accumulate(
            a.data, b.data, a_idx, b_idx, seg,
            (out_cap, a.block_size, b.block_size), acc_dtype, precision,
        )
    out_ids = out_ids_pre
    if backend in ("rows", "fine"):
        # The kernel clamps per-row block counts to the (bucketed) static
        # row caps; an undersized plan would silently drop panel entries.
        # Flag it here from the true per-row maxima (ADVICE.md r1 high).
        from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_rows import (
            _bucket,
        )

        b_rowv = jnp.where(b.valid_mask(), b.ids // b.nb_cols, b.nb_rows)
        max_b_row = jnp.max(
            jnp.zeros((b.nb_rows + 1,), jnp.int32).at[b_rowv].add(1)[:-1]
        )
        c_valid = out_ids != SENTINEL
        c_rowv = jnp.where(c_valid, out_ids // b.nb_cols, a.nb_rows)
        max_c_row = jnp.max(
            jnp.zeros((a.nb_rows + 1,), jnp.int32).at[c_rowv].add(1)[:-1]
        )
        row_overflow = (max_b_row > _bucket(max(row_caps[0], 1))) | (
            max_c_row > _bucket(max(row_caps[1], 1))
        )
    elif backend == "groups":
        # Mirror of the rows check for the group kernel's three static
        # capacities: true per-group maxima vs the (bucketed) caps — an
        # undersized/stale plan must never be silent (ADVICE.md r1).
        from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_groups import (
            _bucket as _gbucket,
        )

        g_rows, a_gm, s_gm, c_gm = group_caps
        ngrp = -(-a.nb_rows // g_rows)
        a_valid = a.valid_mask()
        a_rowv = jnp.where(a_valid, a.ids // a.nb_cols, a.nb_rows)
        gidv = jnp.clip(a_rowv // g_rows, 0, ngrp - 1)
        pad = ~a_valid
        a_grp = (
            jnp.zeros((ngrp,), jnp.int32)
            .at[gidv]
            .add(jnp.where(pad, 0, 1))
        )
        a_colv = a.ids % a.nb_cols
        kmin = (
            jnp.full((ngrp,), b.nb_rows, jnp.int32)
            .at[gidv]
            .min(jnp.where(pad, b.nb_rows, a_colv).astype(jnp.int32))
        )
        kmax = (
            jnp.full((ngrp,), -1, jnp.int32)
            .at[gidv]
            .max(jnp.where(pad, -1, a_colv).astype(jnp.int32))
        )
        b_rowv = jnp.where(b.valid_mask(), b.ids // b.nb_cols, b.nb_rows)
        b_row_cnt = jnp.zeros((b.nb_rows + 1,), jnp.int32).at[b_rowv].add(1)
        b_row_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(b_row_cnt[:-1])]
        ).astype(jnp.int32)
        slab = jnp.where(
            kmax >= 0,
            b_row_start[jnp.clip(kmax + 1, 0, b.nb_rows)]
            - b_row_start[jnp.clip(kmin, 0, b.nb_rows)],
            0,
        )
        c_valid = out_ids != SENTINEL
        c_rowv = jnp.where(c_valid, out_ids // b.nb_cols, a.nb_rows)
        c_gidv = jnp.clip(c_rowv // g_rows, 0, ngrp - 1)
        c_grp = (
            jnp.zeros((ngrp,), jnp.int32)
            .at[c_gidv]
            .add(jnp.where(c_valid, 1, 0))
        )
        row_overflow = (
            (jnp.max(a_grp) > _gbucket(a_gm))
            | (jnp.max(slab) > _gbucket(s_gm))
            | (jnp.max(c_grp) > _gbucket(c_gm))
        )
    else:
        row_overflow = jnp.zeros((), bool)
    alpha_is_one = alpha_is_one_static(alpha)
    exact_fill = backend in ("rows", "groups", "fine")
    if exact_fill and alpha_is_one and a.dtype == out_data.dtype:
        # The row-panel kernel writes every used slot exactly and
        # zero-fills the tail in-kernel: no post-pass needed — this
        # saves a full read+write of the output (the dominant cost of
        # small multiplies).
        pass
    else:
        # Zero padding slots: the pair-stream Pallas kernels leave
        # never-visited output windows with undefined buffer content,
        # and the all-zero-padding invariant (core.block_matrix) is what
        # makes whole-array reductions correct.  XLA fuses this mask
        # into the alpha-scale pass.
        slot_valid = out_ids != SENTINEL
        if accum is not None and not exact_fill:
            # Union slots with no product contribution are never visited
            # by the stream kernel (undefined windows); keep only slots
            # some pair actually wrote (beta*accum lands afterwards).
            slot_valid = slot_valid & (
                jnp.zeros((out_cap + 1,), bool)
                .at[seg]
                .set(True, mode="drop")[:out_cap]
            )
        out_data = jnp.where(
            slot_valid[:, None, None],
            out_data * jnp.asarray(alpha, acc_dtype),
            0,
        ).astype(a.dtype)
    if accum is not None and not accum_aligned:
        # Fused beta-accumulate.  Formulated as a GATHER-add, not a
        # scatter-add: invert pos_acc with a tiny int32 scatter, `take`
        # accum's block per union slot (absent -> zero fill), and add —
        # block gathers run ~1.5-2.3x the block scatter's effective
        # bandwidth on v5e (scripts/profile_scan.py, round 3) and the
        # elementwise add fuses with the alpha-scale pass above instead
        # of a separate read-modify-write over the union buffer.
        # pos_acc maps each valid accum slot to a UNIQUE union slot
        # (sorted-unique ids invariant), so the inverse is well-defined;
        # accum padding routes to the dropped trash slot as before.
        # That invariant is load-bearing here: duplicate accum ids would
        # have been SUMMED by a scatter-add but the inverse-map gather
        # keeps an arbitrary one — check it and report loudly via
        # plan_mismatch (structure-contract violation; ADVICE r3).
        # Sorted ids put duplicates adjacent, so one vector compare.
        plan_mismatch = plan_mismatch | jnp.any(
            (accum.ids[1:] == accum.ids[:-1]) & accum.valid_mask()[1:]
        )
        acc_cap = accum.cap
        acc_src = (
            jnp.full((out_cap,), acc_cap, jnp.int32)
            .at[pos_acc]
            .set(jnp.arange(acc_cap, dtype=jnp.int32), mode="drop")
        )
        acc_blocks = jnp.take(
            accum.data, acc_src, axis=0, mode="fill", fill_value=0
        )
        # Padding slots compute out + beta*0 here; a non-finite traced
        # beta would NaN them (breaking the all-zero-padding invariant),
        # but such a beta already poisons every VALID slot too, so the
        # run is lost either way — no extra mask needed (ADVICE r3).
        out_data = (
            out_data.astype(acc_dtype)
            + jnp.asarray(beta, acc_dtype) * acc_blocks.astype(acc_dtype)
        ).astype(a.dtype)
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
        pair_overflow=(raw_total > pair_cap) | (total > gemm_cap),
        out_overflow=n_unique > out_cap,
        row_overflow=row_overflow,
        plan_mismatch=plan_mismatch,
        n_leaf_multiplies=n_leaf,
    )
    return c, info


def plan_spgemm_ex(a: BlockMatrix, b: BlockMatrix):
    """Host-side exact plan: (n_pairs, n_out_blocks, max_b_row, max_c_row).

    The row maxima feed `spgemm(..., row_caps=(max_b_row, max_c_row))`
    to enable the row-panel kernel.  C++ fast path in `runtime.native`.
    """
    from hierarchical_block_sparse_lib_tpu.runtime import native

    return native.plan_spgemm_ex(
        np.asarray(a.ids), np.asarray(b.ids), a.nb_cols, b.nb_rows, b.nb_cols
    )


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


class SyrkPlan:
    """Exact host plan for the symmetric product C = A @ A^T with
    upper-triangle-only (i <= j) enumeration (SURVEY.md section 9.2)."""

    __slots__ = (
        "pairs_raw", "pairs_upper", "out_upper", "out_diag",
        "max_b_row", "max_c_row",
    )

    def __init__(self, pairs_raw, pairs_upper, out_upper, out_diag,
                 max_b_row, max_c_row):
        self.pairs_raw = pairs_raw          # unfiltered enumeration size
        self.pairs_upper = pairs_upper      # leaf GEMMs actually done
        self.out_upper = out_upper          # distinct i<=j output blocks
        self.out_diag = out_diag            # of which diagonal (i==j)
        self.max_b_row = max_b_row          # row-panel kernel caps
        self.max_c_row = max_c_row

    @property
    def out_full(self):
        """Distinct output blocks after mirroring."""
        return 2 * self.out_upper - self.out_diag


def plan_syrk(a: BlockMatrix) -> SyrkPlan:
    """Host-side exact plan for `syrk` (C = A @ A^T, upper-only pairs).

    The symbolic workspace still enumerates all `pairs_raw` candidates
    (pair_cap), but only `pairs_upper` survive to the MXU batch
    (gemm_cap) — about half of the generic matmul(A, A^T) count."""
    ids = np.asarray(a.ids, np.int64)
    ids = ids[ids != int(SENTINEL)]
    nbc, nbr = a.nb_cols, a.nb_rows
    row, col = ids // nbc, ids % nbc
    # A^T in canonical sorted order; its block-rows are A's block-cols.
    at = np.sort(col * nbr + row)
    at_row, at_col = at // nbr, at % nbr
    lo = np.searchsorted(at_row, col, side="left")
    hi = np.searchsorted(at_row, col, side="right")
    cnt = hi - lo
    pairs_raw = int(cnt.sum())
    offs = np.concatenate([[0], np.cumsum(cnt)])
    max_b_row = int(np.bincount(col).max()) if ids.size else 0
    pairs_upper = 0
    out_ids: set = set()
    CHUNK = 1 << 22
    for s in range(0, pairs_raw, CHUNK):
        p = np.arange(s, min(s + CHUNK, pairs_raw))
        e = np.searchsorted(offs, p, side="right") - 1
        t = p - offs[e]
        j = lo[e] + t
        keep = row[e] <= at_col[j]
        pairs_upper += int(keep.sum())
        cid = (row[e] * nbr + at_col[j])[keep]
        out_ids.update(np.unique(cid).tolist())
    if out_ids:
        oid = np.fromiter(out_ids, np.int64)
        out_diag = int(np.sum(oid // nbr == oid % nbr))
        max_c_row = int(np.bincount(oid // nbr).max())
    else:
        out_diag = max_c_row = 0
    return SyrkPlan(
        pairs_raw, pairs_upper, len(out_ids), out_diag, max_b_row, max_c_row
    )


def plan_spamm(a: BlockMatrix, b: BlockMatrix, tau: float):
    """Host-side exact plan for the norm-filtered multiply: returns
    (n_surviving_pairs, n_out_blocks) when pairs with
    ||A_ik||*||B_kj|| <= tau are skipped."""
    from hierarchical_block_sparse_lib_tpu.ops.norms import block_frob_squared
    from hierarchical_block_sparse_lib_tpu.runtime import native

    a_norms = np.sqrt(np.asarray(block_frob_squared(a)))
    b_norms = np.sqrt(np.asarray(block_frob_squared(b)))
    return native.plan_spamm(
        np.asarray(a.ids), a_norms, np.asarray(b.ids), b_norms,
        a.nb_cols, b.nb_rows, b.nb_cols, tau,
    )


def spamm_error_bound(a: BlockMatrix, b: BlockMatrix, tau: float) -> float:
    """A-priori certificate for the norm-filtered multiply:
    ||A@B - spamm(A,B,tau)||_F <= this bound (sum of skipped pair
    bounds).  Host-side, exact for the given structure."""
    from hierarchical_block_sparse_lib_tpu.ops.norms import block_frob_squared
    from hierarchical_block_sparse_lib_tpu.runtime import native

    a_norms = np.sqrt(np.asarray(block_frob_squared(a)))
    b_norms = np.sqrt(np.asarray(block_frob_squared(b)))
    return native.spamm_error_bound(
        np.asarray(a.ids), a_norms, np.asarray(b.ids), b_norms,
        a.nb_cols, b.nb_cols, tau,
    )


def spamm(
    a: BlockMatrix,
    b: BlockMatrix,
    tau: float | jax.Array,
    pair_cap: int,
    out_cap: int,
    gemm_cap: int | None = None,
    **kw,
):
    """Error-controlled approximate multiply C ~= A @ B skipping block
    products with ||A_ik||_F * ||B_kj||_F <= tau (the reference lineage's
    SpAMM primitive for purification, SURVEY.md section 1).

    ||C - A@B||_F is bounded by the sum of skipped pair bounds.  Size
    `pair_cap` with `plan_spgemm` (unfiltered enumeration workspace) and
    `gemm_cap`/`out_cap` with `plan_spamm` (surviving MXU batch).
    """
    return spgemm(
        a, b, pair_cap=pair_cap, out_cap=out_cap, tau=tau,
        filter_by_norm=True, gemm_cap=gemm_cap, **kw,
    )


def pair_bound(a: BlockMatrix, b: BlockMatrix) -> int:
    """Cheap static upper bound on pair count: cap(A) * max-row-nnz(B) is
    unavailable statically, so fall back to cap(A)*cap(B) clamped by the
    dense bound.  Prefer `plan_spgemm` for tight sizing."""
    dense = a.nb_rows * a.nb_cols * b.nb_cols
    return int(min(a.cap * b.cap, dense))
