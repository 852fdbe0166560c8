"""EXPERIMENTAL multi-row row-panel SpGEMM kernel (VERDICT r3 item 5).

The row-panel kernel (`pallas_gemm_rows.py`) runs one grid step per A
block-row.  The round-3 B2 ablation (DESIGN.md section 8) put the dot
phase at ~100% MXU peak with ~0.53 ms of ADDITIVE per-row fixed costs
(accumulator init, flush DMA chains, scalar bookkeeping) that Mosaic
will not overlap — at B2-tile128's ~6 blocks/row, 128 grid steps each
pay them.  This variant batches R = `rows_per_step` consecutive block
rows per grid step, the one restructure round 3 did not try:

- ONE contiguous flush per batch (C rows are adjacent in HBM), cutting
  flush descriptor chains ~R-fold;
- one vectorized accumulator zero per batch instead of per-slot loops;
- 1/R as many grid steps paying Mosaic's per-step scalar prologue.

Costs: the slot table becomes [R, nbc] (flattened in SMEM) because
sibling rows reuse column values, and the accumulator panel must hold a
whole batch's output slots (`c_batch_max` — host-planned exact), which
forces acc_p=1 at b=128 for R >= 4.

Scope: plain product only (no triu/filter/accum fusion) — this is a
measurement vehicle.  Standing A/B: `scripts/bench_rows_mr.py`; per the
roll-kernel precedent it gets promoted into `spgemm` dispatch only on a
reproducible win, else documented and deleted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hierarchical_block_sparse_lib_tpu.kernels.mxu import make_mxu_dot
from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_rows import (
    _VMEM_BUDGET,
    _bucket,
)


def tier_mr(b: int, dtype, b_row_max: int, c_batch_max: int):
    """(acc_p, panel_p) fitting VMEM for the batched accumulator, or
    None."""
    itemsize = jnp.dtype(dtype).itemsize
    bb = _bucket(max(b_row_max, 1))
    cb = _bucket(max(c_batch_max, 1))
    for acc_p, panel_p in ((2, 3), (2, 2), (1, 2)):
        vmem = (
            panel_p * bb * b * b * itemsize
            + acc_p * cb * b * b * 4
            + panel_p * b * b * itemsize
        )
        if vmem <= _VMEM_BUDGET:
            return acc_p, panel_p
    return None


def supported(b, dtype, b_row_max, c_batch_max, nbc, rows_per_step):
    return (
        b % 128 == 0
        and rows_per_step * nbc <= 1 << 17  # SMEM slot table
        and jnp.dtype(dtype) != jnp.float64
        and tier_mr(b, dtype, b_row_max, c_batch_max) is not None
    )


def _make_kernel(
    b, b_row_max, c_batch_max, nbc, precision, n_batches, out_cap,
    acc_p, panel_p, wide, rows_per_step, cap_b,
):
    R = rows_per_step
    # pl.when branches are traced unconditionally, so even never-
    # executed chunk slices must fit the operand (see pallas_gemm_rows).
    rb_max = min(b_row_max, cap_b)
    chunk_sizes = [1 << k for k in range(max(rb_max.bit_length(), 1))]
    chunk_sizes.reverse()
    flush_sizes = [
        1 << k
        for k in range(max(min(c_batch_max, out_cap).bit_length(), 1))
    ]
    flush_sizes.reverse()
    mxu_dot = make_mxu_dot(precision)

    def kernel(
        a_batch_start_ref,  # SMEM int32[n_batches+1]
        a_col_ref,  # SMEM int32[capA]
        a_rloc_ref,  # SMEM int32[capA]: A block's row within its batch
        b_row_start_ref,  # SMEM int32[nbrB+1]
        b_col_ref,  # SMEM int32[capB]
        c_batch_start_ref,  # SMEM int32[n_batches+1]
        c_rloc_ref,  # SMEM int32[out_cap]: C slot's row within batch
        ccol_ref,  # SMEM int32[out_cap]
        a_hbm,
        b_hbm,
        o_hbm,
        a_buf,  # VMEM [panel_p, b, b]
        b_panel,  # VMEM [panel_p, b_row_max, b, b]
        acc,  # VMEM [acc_p, c_batch_max, b, b] f32
        postable,  # SMEM int32[R * nbc]
        state,  # SMEM int32[1 + acc_p]
        a_sems,
        p_sems,
        f_sems,
        z_sem,
    ):
        i = pl.program_id(0)
        a_total = a_batch_start_ref[n_batches]

        @pl.when(i == 0)
        def _():
            for s in range(1 + acc_p):
                state[s] = 0

        a_lo = a_batch_start_ref[i]
        a_cnt = a_batch_start_ref[i + 1] - a_lo
        c_lo = c_batch_start_ref[i]
        c_cnt = jnp.minimum(
            c_batch_start_ref[i + 1] - c_lo, c_batch_max
        )

        def fetch_a(par, e):
            pltpu.make_async_copy(
                a_hbm.at[e], a_buf.at[par], a_sems.at[par]
            ).start()

        def wait_a(par):
            pltpu.make_async_copy(
                a_hbm.at[0], a_buf.at[par], a_sems.at[par]
            ).wait()

        def panel_op(par, blo, bcnt, do_start):
            for ci, s in enumerate(chunk_sizes):
                @pl.when((bcnt & s) != 0)
                def _(ci=ci, s=s):
                    off = bcnt & ~(2 * s - 1)
                    dma = pltpu.make_async_copy(
                        b_hbm.at[pl.ds(blo + off, s)],
                        b_panel.at[par, pl.ds(off, s)],
                        p_sems.at[par, ci],
                    )
                    if do_start:
                        dma.start()
                    else:
                        dma.wait()

        def _panel_range(e):
            k = a_col_ref[e]
            blo = b_row_start_ref[k]
            bcnt = jnp.minimum(b_row_start_ref[k + 1] - blo, b_row_max)
            return blo, bcnt

        def fetch_e(par, e):
            fetch_a(par, e)
            blo, bcnt = _panel_range(e)
            panel_op(par, blo, bcnt, True)

        def wait_e(par, e):
            wait_a(par)
            blo, bcnt = _panel_range(e)
            panel_op(par, blo, bcnt, False)

        # Global (cross-batch) continuous fetch pipeline, lookahead
        # panel_p - 1 (see pallas_gemm_rows "flow").
        for j in range(panel_p - 1):
            @pl.when(jnp.logical_and(i == 0, j < a_total))
            def _(j=j):
                fetch_e(j, j)

        def flush_op(par, dst_lo, cnt, do_start):
            for ci, fs in enumerate(flush_sizes):
                @pl.when((cnt & fs) != 0)
                def _(ci=ci, fs=fs):
                    off = cnt & ~(2 * fs - 1)
                    dma = pltpu.make_async_copy(
                        acc.at[par, pl.ds(off, fs)],
                        o_hbm.at[pl.ds(dst_lo + off, fs)],
                        f_sems.at[par, ci],
                    )
                    if do_start:
                        dma.start()
                    else:
                        dma.wait()

        has_work = c_cnt > 0
        fpar = jax.lax.rem(state[0], acc_p)

        def prep_acc():
            @pl.when(state[1 + fpar] > 0)
            def _():
                flush_op(fpar, 0, state[1 + fpar], False)
                state[1 + fpar] = 0

            # ONE vectorized zero of the whole batch panel (the per-slot
            # loop of the single-row kernel is scalar-core-priced).
            acc[fpar] = jnp.zeros((c_batch_max, b, b), jnp.float32)

            def init_slot(s, _):
                postable[
                    c_rloc_ref[c_lo + s] * nbc + ccol_ref[c_lo + s]
                ] = s
                return 0

            jax.lax.fori_loop(0, c_cnt, init_slot, 0)

        def compute_e(par, e):
            blo, bcnt = _panel_range(e)
            rbase = a_rloc_ref[e] * nbc

            if wide:
                def chunk(off, csize):
                    flat = b_panel[par, pl.ds(off, csize)].reshape(
                        csize * b, b
                    )
                    prod = mxu_dot(
                        a_buf[par], flat, (((1,), (1,)), ((), ()))
                    )
                    for idx in range(csize):
                        pos = jnp.clip(
                            postable[rbase + b_col_ref[blo + off + idx]],
                            0, c_batch_max - 1,
                        )
                        acc[fpar, pos] += prod[:, idx * b:(idx + 1) * b]

                n8 = bcnt // 8

                def body8(t8, _):
                    chunk(t8 * 8, 8)
                    return 0

                jax.lax.fori_loop(0, n8, body8, 0)
                for s_ in (4, 2, 1):
                    @pl.when((bcnt & s_) != 0)
                    def _(s_=s_):
                        off = (bcnt & ~(s_ - 1)) - s_
                        chunk(off, s_)
                return

            def dotloop(t2, _):
                prod = mxu_dot(
                    a_buf[par],
                    b_panel[par, t2],
                    (((1,), (0,)), ((), ())),
                )
                pos = jnp.clip(
                    postable[rbase + b_col_ref[blo + t2]],
                    0, c_batch_max - 1,
                )
                acc[fpar, pos] += prod
                return 0

            jax.lax.fori_loop(0, bcnt, dotloop, 0)

        @pl.when(has_work)
        def _():
            prep_acc()

        @pl.when(a_cnt > 0)
        def _():
            def eloop(t, _):
                e = a_lo + t
                par = jax.lax.rem(e, panel_p)
                nxt = e + panel_p - 1

                @pl.when(nxt < a_total)
                def _():
                    fetch_e(jax.lax.rem(nxt, panel_p), nxt)

                wait_e(par, e)

                @pl.when(has_work)
                def _():
                    compute_e(par, e)

                return 0

            jax.lax.fori_loop(0, a_cnt, eloop, 0)

        @pl.when(has_work)
        def _():
            # ONE contiguous flush for the whole batch (sibling rows'
            # slot ranges are adjacent in the sorted output).
            flush_op(fpar, c_lo, c_cnt, True)
            state[1 + fpar] = c_cnt
            state[0] = state[0] + 1

        @pl.when(i == n_batches - 1)
        def _():
            for par in range(acc_p):
                @pl.when(state[1 + par] > 0)
                def _(par=par):
                    flush_op(par, 0, state[1 + par], False)
                    state[1 + par] = 0
            used = c_batch_start_ref[n_batches]
            zc = min(c_batch_max, out_cap)
            acc[0] = jnp.zeros((c_batch_max, b, b), jnp.float32)
            nfull = jnp.maximum((out_cap - used) // zc, 0)

            def zchunk(t, _):
                dma = pltpu.make_async_copy(
                    acc.at[0, pl.ds(0, zc)],
                    o_hbm.at[pl.ds(used + t * zc, zc)],
                    z_sem,
                )
                dma.start()
                dma.wait()
                return 0

            jax.lax.fori_loop(0, nfull, zchunk, 0)

            def zfill(s, _):
                dma = pltpu.make_async_copy(
                    acc.at[0, 0], o_hbm.at[s], z_sem
                )
                dma.start()
                dma.wait()
                return 0

            jax.lax.fori_loop(used + nfull * zc, out_cap, zfill, 0)

        return

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbr", "nbrB", "nbc", "out_cap", "b_row_max", "c_batch_max",
        "rows_per_step", "precision", "interpret", "wide",
    ),
)
def rows_mr_spgemm(
    a_ids: jax.Array,
    a_data: jax.Array,
    b_ids: jax.Array,
    b_data: jax.Array,
    out_ids: jax.Array,
    nbr: int,
    nbrB: int,
    nbc: int,
    out_cap: int,
    b_row_max: int,
    c_batch_max: int,
    rows_per_step: int = 4,
    precision: str = "highest",
    interpret: bool | None = None,
    wide: bool | None = None,
) -> jax.Array:
    """f32[out_cap, b, b]: like `rows_spgemm` but with R block rows per
    grid step.  `c_batch_max` must bound the total output slots of any
    R-row batch (host-planned exact; undersizing produces garbage — the
    caller checks, this is an experimental path)."""
    b = a_data.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R = rows_per_step
    n_batches = -(-nbr // R)
    nbr_pad = n_batches * R
    b_row_max = _bucket(max(b_row_max, 1))
    c_batch_max = _bucket(max(c_batch_max, 1))

    sent = jnp.int32(jnp.iinfo(jnp.int32).max)
    # Sentinel padding maps PAST the padded grid so no batch claims it.
    a_rowv = jnp.where(
        a_ids == sent, jnp.int32(nbr_pad), a_ids // jnp.int32(nbrB)
    )
    batch_edges = jnp.arange(n_batches + 1, dtype=jnp.int32) * R
    a_batch_start = jnp.searchsorted(
        a_rowv, batch_edges, side="left", method="sort"
    ).astype(jnp.int32)
    a_col = jnp.where(a_ids == sent, 0, a_ids % jnp.int32(nbrB)).astype(
        jnp.int32
    )
    a_rloc = jnp.where(a_ids == sent, 0, a_rowv % R).astype(jnp.int32)
    b_rowv = jnp.where(
        b_ids == sent, jnp.int32(nbrB), b_ids // jnp.int32(nbc)
    )
    b_row_start = jnp.searchsorted(
        b_rowv, jnp.arange(nbrB + 1, dtype=jnp.int32), side="left",
        method="sort",
    ).astype(jnp.int32)
    b_col = jnp.where(b_ids == sent, 0, b_ids % jnp.int32(nbc)).astype(
        jnp.int32
    )
    c_rowv = jnp.where(
        out_ids == sent, jnp.int32(nbr_pad), out_ids // jnp.int32(nbc)
    )
    c_batch_start = jnp.searchsorted(
        c_rowv, batch_edges, side="left", method="sort"
    ).astype(jnp.int32)
    c_rloc = jnp.where(out_ids == sent, 0, c_rowv % R).astype(jnp.int32)
    ccol = jnp.where(out_ids == sent, 0, out_ids % jnp.int32(nbc)).astype(
        jnp.int32
    )

    tier = tier_mr(b, a_data.dtype, b_row_max, c_batch_max)
    if tier is None:
        raise ValueError(
            f"caps ({b_row_max},{c_batch_max}) exceed VMEM at b={b}"
        )
    acc_p, panel_p = tier
    if wide is None:
        wide = b_row_max >= 5
    if wide:
        b_data = jnp.swapaxes(b_data, -1, -2)
    kernel = _make_kernel(
        b, b_row_max, c_batch_max, nbc, precision, n_batches, out_cap,
        acc_p, panel_p, wide, R, b_data.shape[0],
    )
    vma = getattr(jax.typeof(a_data), "vma", frozenset())
    n_chunk_sizes = max(min(b_row_max, b_data.shape[0]).bit_length(), 1)
    n_flush_sizes = max(min(c_batch_max, out_cap).bit_length(), 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_batches,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((panel_p, b, b), a_data.dtype),
            pltpu.VMEM((panel_p, b_row_max, b, b), b_data.dtype),
            pltpu.VMEM((acc_p, c_batch_max, b, b), jnp.float32),
            pltpu.SMEM((R * nbc,), jnp.int32),
            pltpu.SMEM((1 + acc_p,), jnp.int32),
            pltpu.SemaphoreType.DMA((panel_p,)),
            pltpu.SemaphoreType.DMA((panel_p, n_chunk_sizes)),
            pltpu.SemaphoreType.DMA((acc_p, n_flush_sizes)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (out_cap, b, b), jnp.float32, vma=vma
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        a_batch_start, a_col, a_rloc, b_row_start, b_col,
        c_batch_start, c_rloc, ccol, a_data, b_data,
    )
    return out
