"""Row-panel SpGEMM kernel: panel-cached, descriptor-lean, near-roofline.

Third-generation numeric phase for hierarchical SpGEMM.  The pair-stream
kernels (`pallas_gemm.py`, `pallas_gemm_stream.py`) pay per-*pair* DMA
descriptor costs (~1 us of scalar-core work per pair on v5e) because each
pair gathers its own A and B blocks.  This kernel exploits the canonical
row-major sorted layout, in which three things are **contiguous in HBM**:

- the blocks of one block-row of A  (one DMA per A row),
- the blocks of one block-row of B  (one panel DMA per stored A block),
- the output slots of one block-row of C (one flush DMA per C row).

Algorithm (grid = one step per A block-row i):

  load ccol positions of C row i -> SMEM postable; zero a compact VMEM
  accumulator panel (one slot per distinct output column of the row)
  for each stored A block (i,k):                # A blocks of row i
      fetch A(i,k) block + B row-k panel (contiguous, double-buffered,
          power-of-two DMA decomposition: no overfetch, <= log2 descriptors)
      for each stored B block (k,j) in the panel:
          acc[postable[j]] += A(i,k) @ B(k,j)   # MXU; serial per slot
  flush acc -> C row i's slot range (exact power-of-two DMA decomposition
      of the c_cnt-block flush — no overstore; rows' slot ranges are
      disjoint, so flushes from different rows never touch the same slot)

Descriptor count ~ nnz(A) + 2*rows instead of ~3*pairs; HBM traffic drops
to (nnz(A) + pairs + outs) * block_bytes — the roofline for this layout.
B traffic still dominates (pairs * block); A-block reuse across its whole
B panel is what the pair-stream design could not express.

Static panel capacities (B_ROW_MAX >= max stored blocks in any B row,
C_ROW_MAX >= max distinct outputs in any C row) come from the host
planner (`runtime.native.plan_spgemm_ex`) and bound VMEM; `supported()`
reports whether a problem fits this kernel (else callers fall back to
the stream kernel).

The padding tail of the output (slots [n_out, out_cap)) is untouched or
overstored garbage — callers mask by slot validity (spgemm does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 'high' is implemented manually (bf16x3 hi/lo split, kernels/mxu.py):
# Mosaic's dot lowering supports only DEFAULT/HIGHEST, but XLA's
# Precision.HIGH on TPU IS the 3-pass bf16 algorithm, so the manual
# split reproduces it exactly — ~half the MXU passes of HIGHEST at
# ~2^-16-grade operand representation (vs 2^-8 default, 2^-24 highest).
from hierarchical_block_sparse_lib_tpu.kernels.mxu import make_mxu_dot

# VMEM budget for panels (bytes); v5e has ~16 MB less pipeline overheads.
# 13.5 MB verified to compile with the (1,1) tier at b=128.
_VMEM_BUDGET = int(13.5 * 1024 * 1024)


def _bucket(n: int) -> int:
    """Round up to a multiple of 8 (min 8) — bounds recompilation churn
    without the up-to-2x VMEM waste of power-of-two rounding."""
    return max(-(-n // 8) * 8, 8)


def _tier(b: int, dtype, b_row_max: int, c_row_max: int):
    """(acc_parities, panel_parities) of the largest pipeline tier that
    fits VMEM, or None.  Tiers (2,4)/(2,3) deepen the flow pipeline's
    fetch lookahead to panel_p-1 blocks (measured neutral on B2 —
    fetch exposure there is only ~8% by the nofetch ablation — but they
    cost nothing and cover latency-spiky panel mixes); (2,2) fully
    double-buffers; (1,2) halves the accumulator (each row waits its
    own previous flush, a few us); (1,1) also single-buffers B panels
    (panel fetch no longer hidden — ~20% at b=128, acceptable for the
    dense-row regimes that need it)."""
    itemsize = jnp.dtype(dtype).itemsize
    bb = _bucket(max(b_row_max, 1))
    cb = _bucket(max(c_row_max, 1))
    for acc_p, panel_p in ((2, 4), (2, 3), (2, 2), (1, 2), (1, 1)):
        vmem = (
            panel_p * bb * b * b * itemsize
            + acc_p * cb * b * b * 4
            + panel_p * b * b * itemsize
        )
        if vmem <= _VMEM_BUDGET:
            return acc_p, panel_p
    return None


def supported(b: int, dtype, b_row_max: int, c_row_max: int, nbc: int) -> bool:
    """Can the row-panel kernel run this problem within VMEM/SMEM?"""
    return (
        b % 128 == 0
        and nbc <= 4096
        and jnp.dtype(dtype) != jnp.float64  # kernel accumulates in f32
        and _tier(b, dtype, b_row_max, c_row_max) is not None
    )


def _make_kernel(
    b, b_row_max, c_row_max, nbc, precision, n_rows_grid, out_cap,
    acc_p, panel_p, filtered, triu, wide, cap_b, g8, with_acc=False,
):
    # Continuous cross-row fetch pipeline ("flow"): fetch_e/wait_e depend
    # only on the global A-block index e (a_col[e] picks the B panel), so
    # the double-buffer parity can be GLOBAL (e % 2) instead of per-row.
    # Block e+1 is prefetched at block e's iteration regardless of row
    # boundaries, removing the first-fetch latency the per-row pipeline
    # exposes at every grid step (~2-4 us x nbr on narrow random rows —
    # B2's gap to the dense rate; VERDICT r2 item 7).  The lookahead is
    # panel_p - 1 (NOT panel_p: the prefetch must never overwrite the
    # slot being computed from).  triu narrows the panel by the row
    # index, so syrk keeps the per-row pipeline (wrapper clamps its
    # panel_p to 2).
    flow = panel_p >= 2 and not triu
    # Panel DMA granularity g8: per-descriptor scalar-core issue cost
    # (~150-250 cycles) dominates narrow-panel regimes (B2: ~2.5 pow2
    # chunks per ~6-block panel), so panel transfers are rounded UP to
    # g8-block granularity — ONE descriptor covers any panel <= g8
    # blocks.  The wrapper pads b_data by g8 blocks so overfetch stays
    # in bounds; overfetched buffer slots are never read (reads bound
    # by bcnt).  Power-of-two DMA sizes (all >= g8) cover every g8-bit
    # of any rounded bcnt <= round_g8(b_row_max); cap_b is the PADDED
    # operand capacity (pl.when branches are traced unconditionally, so
    # even never-executed chunk slices must stay in bounds).
    rb_max = -(-min(b_row_max, cap_b) // g8) * g8
    chunk_sizes = [
        1 << k
        for k in range(g8.bit_length() - 1, max(rb_max.bit_length(), 1))
    ]
    chunk_sizes.reverse()  # e.g. [16, 8] at g8=8
    # Same for C-row flushes (exact pow2 decomposition: no overstore, so
    # the output is allocated at exactly out_cap and rows never race).
    flush_sizes = [
        1 << k
        for k in range(max(min(c_row_max, out_cap).bit_length(), 1))
    ]
    flush_sizes.reverse()

    mxu_dot = make_mxu_dot(precision)

    def kernel(
        a_row_start_ref,  # SMEM int32[nbr+1]
        a_col_ref,  # SMEM int32[capA]
        b_row_start_ref,  # SMEM int32[nbrB+1]
        b_col_ref,  # SMEM int32[capB]
        c_row_start_ref,  # SMEM int32[nbr+1]
        ccol_ref,  # SMEM int32[out_cap]
        *rest,
    ):
        if filtered:
            # SpAMM filter operands: per-block squared norms + tau^2.
            an2_ref, bn2_ref, tau2_ref = rest[:3]
            rest = rest[3:]
        if with_acc:
            # Aligned accumulator input: same slot order as out_ids —
            # rows load their previous-union values instead of zeroing
            # (the in-kernel beta-accumulate, VERDICT r4 item 4).
            acc_hbm = rest[2]
            rest = rest[:2] + rest[3:]
        (
            a_hbm,  # ANY [capA, b, b]
            b_hbm,  # ANY [capB, b, b]
            o_hbm,  # ANY [out_cap, b, b] f32
            a_buf,  # VMEM [panel_p, b, b]
            b_panel,  # VMEM [panel_p, b_row_max, b, b]
            acc,  # VMEM [acc_p, c_row_max, b, b] f32
            postable,  # SMEM int32[nbc]
            state,  # SMEM int32[4]: 0 flush ctr; 1+par pending flush cnt
            a_sems,  # DMA [panel_p]
            p_sems,  # DMA [panel_p, len(chunk_sizes)]
            f_sems,  # DMA [acc_p, len(flush_sizes)]
            z_sem,  # DMA [] (tail zero-fill)
        ) = rest
        i = pl.program_id(0)
        a_total = a_row_start_ref[n_rows_grid]

        @pl.when(i == 0)
        def _():
            state[0] = 0
            state[1] = 0
            state[2] = 0
            state[3] = 0  # with_acc: next-row load prefetched flag

        a_lo = a_row_start_ref[i]
        a_cnt = a_row_start_ref[i + 1] - a_lo
        c_lo = c_row_start_ref[i]
        # Defensive clamp: with undersized row caps (symbolic overflow,
        # already flagged by the caller) results are garbage but every
        # access stays in bounds.
        c_cnt = jnp.minimum(c_row_start_ref[i + 1] - c_lo, c_row_max)

        def fetch_a(par, e):
            pltpu.make_async_copy(
                a_hbm.at[e], a_buf.at[par], a_sems.at[par]
            ).start()

        def wait_a(par):
            pltpu.make_async_copy(
                a_hbm.at[0], a_buf.at[par], a_sems.at[par]
            ).wait()

        def panel_op(par, blo, bcnt, do_start):
            # Power-of-two decomposition of the contiguous B-row slice,
            # ROUNDED UP to g8 blocks (overfetch <= g8-1 blocks rides the
            # wrapper's pad): the chunk of size s starts at offset
            # (rcnt & ~(2s-1)).
            rcnt = ((bcnt + g8 - 1) // g8) * g8
            for ci, s in enumerate(chunk_sizes):
                @pl.when((rcnt & s) != 0)
                def _(ci=ci, s=s):
                    off = rcnt & ~(2 * s - 1)
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
            if triu:
                # Symmetric (syrk) mode: columns within a B row are
                # sorted, so the j >= i pairs form a suffix — narrow the
                # panel to it.  Saves the lower-triangle DMA and MXU
                # work exactly, and every fetched pair is then valid
                # (wide dots need no per-pair skip).
                def cnt_lt(t, acc2):
                    return acc2 + (b_col_ref[blo + t] < i).astype(jnp.int32)

                skip = jax.lax.fori_loop(0, bcnt, cnt_lt, jnp.int32(0))
                blo = blo + skip
                bcnt = bcnt - skip
            return blo, bcnt

        def fetch_e(par, e):
            fetch_a(par, e)
            blo, bcnt = _panel_range(e)
            panel_op(par, blo, bcnt, True)

        def wait_e(par, e):
            wait_a(par)
            blo, bcnt = _panel_range(e)
            panel_op(par, blo, bcnt, False)

        if flow:
            # Prologue of the global fetch chain: the first panel_p - 1
            # blocks (lookahead depth), block j into parity j.
            for j in range(panel_p - 1):
                @pl.when(jnp.logical_and(i == 0, j < a_total))
                def _(j=j):
                    fetch_e(j, j)

        def flush_op(par, dst_lo, cnt, do_start):
            # Pow2 decomposition of the c_cnt-block flush; for waits the
            # dst offset is irrelevant (the semaphore count is per size).
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

        # c_cnt > 0 with a_cnt == 0 happens only when out_ids carries
        # slots beyond the product support (spgemm's fused-accumulate
        # union): the row must still be flushed (as zeros) so every
        # union slot is defined.  For plain product out_ids the two
        # conditions coincide (a product row implies stored A blocks).
        has_work = c_cnt > 0
        fpar = jax.lax.rem(state[0], acc_p)

        if with_acc:
            def acc_load(par, lo, cnt, do_start):
                for ci, fs in enumerate(flush_sizes):
                    @pl.when((cnt & fs) != 0)
                    def _(ci=ci, fs=fs):
                        off = cnt & ~(2 * fs - 1)
                        dma = pltpu.make_async_copy(
                            acc_hbm.at[pl.ds(lo + off, fs)],
                            acc.at[par, pl.ds(off, fs)],
                            f_sems.at[par, ci],
                        )
                        if do_start:
                            dma.start()
                        else:
                            dma.wait()

        def prep_acc():
            # This parity's previous flush must drain before its
            # accumulator is zeroed/loaded for reuse.
            @pl.when(state[1 + fpar] > 0)
            def _():
                flush_op(fpar, 0, state[1 + fpar], False)
                state[1 + fpar] = 0

            # Build the column->slot table, and zero the used
            # accumulator slots (never-flushed tail slots are never
            # read) — or, with an aligned accumulator input, LOAD the
            # row's previous-union values instead (products then
            # accumulate on top: the fused in-kernel beta-accumulate).
            def init_slot(s, _):
                postable[ccol_ref[c_lo + s]] = s
                if not with_acc:
                    acc[fpar, s] = jnp.zeros((b, b), jnp.float32)
                return 0

            jax.lax.fori_loop(0, c_cnt, init_slot, 0)
            if with_acc:
                # Wait for the prefetched load (issued by the previous
                # row — overlapping its flush and this row's panel
                # fetches; a start+wait HERE exposed the full load
                # latency per row and measured WORSE than the XLA
                # gather-add it replaces), or cold-load on the first
                # row / after a workless gap.
                @pl.when(state[3] == 0)
                def _():
                    acc_load(fpar, c_lo, c_cnt, True)

                acc_load(fpar, c_lo, c_cnt, False)
                state[3] = 0

        def compute_e(par, e):
            blo, bcnt = _panel_range(e)

            if wide:
                # Panel-wide MXU dots (the per-pair dot is issue-bound
                # at ~128 cycles/pass on one MXU; a [b, t*b] wide-N dot
                # spreads across the chip's MXUs).  The panel holds
                # BLOCK-TRANSPOSED B data, so
                #   A @ [B_k,j1 | B_k,j2 | ...]
                #   = dot(A, stack(B^T blocks), contract lhs1 rhs1).
                def chunk(off, csize):
                    flat = b_panel[par, pl.ds(off, csize)].reshape(
                        csize * b, b
                    )
                    prod = mxu_dot(
                        a_buf[par], flat, (((1,), (1,)), ((), ()))
                    )  # [b, csize*b]
                    # Static unroll: csize is compile-time, so each
                    # product block is a static lane-slice (Mosaic
                    # has no dynamic_slice on values).
                    for idx in range(csize):
                        pos = jnp.clip(
                            postable[b_col_ref[blo + off + idx]],
                            0, c_row_max - 1,
                        )
                        acc[fpar, pos] += prod[:, idx * b:(idx + 1) * b]

                # Fixed-size 8-panels + pow2 tail cover any bcnt with
                # bounded SSA value sizes (prod <= [b, 8b] = 512 KB).
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
                def compute():
                    prod = mxu_dot(
                        a_buf[par],
                        b_panel[par, t2],
                        (((1,), (0,)), ((), ())),
                    )
                    pos = jnp.clip(
                        postable[b_col_ref[blo + t2]], 0, c_row_max - 1
                    )
                    acc[fpar, pos] += prod

                # triu needs no per-pair check here: _panel_range
                # already narrowed the panel to the j >= i suffix.
                if filtered:
                    # Skip the MXU work for pairs below the SpAMM
                    # bound — the exact comparison the symbolic
                    # phase used, so out_ids stays consistent.
                    @pl.when(an2_ref[e] * bn2_ref[blo + t2] > tau2_ref[0])
                    def _():
                        compute()
                else:
                    compute()
                return 0

            jax.lax.fori_loop(0, bcnt, dotloop, 0)

        def run_flush():
            # Exact-size flush: rows' slot ranges are disjoint, so
            # flushes from different rows never race.
            flush_op(fpar, c_lo, c_cnt, True)
            state[1 + fpar] = c_cnt
            state[0] = state[0] + 1

        if flow:
            # The fetch chain is global: block 0 is fetched by the i==0
            # prologue (above), block e+1 by block e's iteration.  The
            # chain must advance through EVERY stored A block, including
            # rows whose product support is empty (all matching B rows
            # empty -> c_cnt == 0): the eloop runs on a_cnt > 0, only
            # the accumulation is gated on has_work.
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
                run_flush()
        else:
            @pl.when(has_work)
            def _():
                prep_acc()

                if panel_p == 2:
                    fetch_e(0, a_lo)

                def eloop(t, _):
                    par = jax.lax.rem(t, panel_p)
                    e = a_lo + t

                    if panel_p == 2:
                        @pl.when(t + 1 < a_cnt)
                        def _():
                            fetch_e(1 - par, e + 1)
                    else:
                        fetch_e(0, e)

                    wait_e(par, e)
                    compute_e(par, e)
                    return 0

                jax.lax.fori_loop(0, a_cnt, eloop, 0)
                run_flush()

        if with_acc:
            # Prefetch the NEXT row's accumulator load so it overlaps
            # this row's flush and the next row's panel fetches.
            @pl.when(i + 1 < n_rows_grid)
            def _():
                nc_lo = c_row_start_ref[i + 1]
                nc_cnt = jnp.minimum(
                    c_row_start_ref[i + 2] - nc_lo, c_row_max
                )

                @pl.when((nc_cnt > 0) & (state[3] == 0))
                def _():
                    # The parity the next workful row will use (state[0]
                    # already advanced if this row flushed).
                    p_next = jax.lax.rem(state[0], acc_p)

                    @pl.when(state[1 + p_next] > 0)
                    def _():
                        flush_op(p_next, 0, state[1 + p_next], False)
                        state[1 + p_next] = 0

                    acc_load(p_next, nc_lo, nc_cnt, True)
                    state[3] = 1

        @pl.when(i == n_rows_grid - 1)
        def _():
            for par in range(acc_p):
                @pl.when(state[1 + par] > 0)
                def _(par=par):
                    flush_op(par, 0, state[1 + par], False)
                    state[1 + par] = 0
            # Zero-fill unused tail slots [n_unique, out_cap) so the
            # all-zero-padding invariant holds without a caller-side
            # full-array mask pass.  Chunked by whole accumulator panels
            # (c_row_max blocks per DMA): with a 4x-oversized out_cap
            # (purification regime) per-block DMAs cost milliseconds.
            used = c_row_start_ref[n_rows_grid]
            zc = min(c_row_max, out_cap)
            acc[0] = jnp.zeros((c_row_max, b, b), jnp.float32)
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
        "nbr", "nbrB", "nbc", "out_cap", "b_row_max", "c_row_max",
        "precision", "interpret", "triu", "wide",
    ),
)
def rows_spgemm(
    a_ids: jax.Array,  # int32[capA] sorted (SENTINEL padded)
    a_data: jax.Array,  # [capA, b, b]
    b_ids: jax.Array,  # int32[capB] sorted
    b_data: jax.Array,  # [capB, b, b]
    out_ids: jax.Array,  # int32[out_cap] sorted distinct output ids
    nbr: int,  # A block-rows (static)
    nbrB: int,  # B block-rows (static)
    nbc: int,  # B block-cols (static)
    out_cap: int,
    b_row_max: int,
    c_row_max: int,
    precision: str = "highest",
    interpret: bool | None = None,
    a_norms2: jax.Array | None = None,  # f32[capA]: SpAMM filter
    b_norms2: jax.Array | None = None,  # f32[capB]
    tau2: jax.Array | None = None,  # f32[] squared threshold
    triu: bool = False,  # syrk mode: compute only outputs with col >= row
    wide: bool | None = None,  # panel-wide dots (needs no filter/triu)
    acc_data: jax.Array | None = None,  # f32[out_cap,b,b] ALIGNED accum
) -> jax.Array:
    """f32[out_cap, b, b]: block products accumulated into the slots given
    by `out_ids` (which must be exactly the distinct products' ids, row-
    major sorted).  Tail padding slots are zero-filled in-kernel, so no
    caller-side masking pass is needed (the all-zero-padding invariant
    holds as long as out_ids is a correct plan; with symbolic overflow
    the result is garbage but flagged by the caller)."""
    b = a_data.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision == "high" and jnp.dtype(a_data.dtype) != jnp.float32:
        # The hi/lo split only refines f32 operands; for bf16 storage a
        # single DEFAULT pass is already operand-exact.
        precision = "default"
    raw_b_row_max = max(b_row_max, 1)
    b_row_max = _bucket(max(b_row_max, 1))
    c_row_max = _bucket(max(c_row_max, 1))

    # Row/col decomposition; SENTINEL padding maps to a row past the end
    # so searchsorted assigns it to no real row.
    sent = jnp.int32(jnp.iinfo(jnp.int32).max)
    a_rowv = jnp.where(a_ids == sent, jnp.int32(nbr), a_ids // jnp.int32(nbrB))
    # NOTE: A's column count == B's row count (nbrB); A row = id // nbcA.
    # method="sort" everywhere: one fused sort beats log2(cap) slow TPU
    # gather passes (see ops.spgemm.spgemm_symbolic).
    a_row_start = jnp.searchsorted(
        a_rowv, jnp.arange(nbr + 1, dtype=jnp.int32), side="left",
        method="sort",
    ).astype(jnp.int32)
    a_col = jnp.where(a_ids == sent, 0, a_ids % jnp.int32(nbrB)).astype(
        jnp.int32
    )
    b_rowv = jnp.where(b_ids == sent, jnp.int32(nbrB), b_ids // jnp.int32(nbc))
    b_row_start = jnp.searchsorted(
        b_rowv, jnp.arange(nbrB + 1, dtype=jnp.int32), side="left",
        method="sort",
    ).astype(jnp.int32)
    b_col = jnp.where(b_ids == sent, 0, b_ids % jnp.int32(nbc)).astype(
        jnp.int32
    )
    c_rowv = jnp.where(out_ids == sent, jnp.int32(nbr), out_ids // jnp.int32(nbc))
    c_row_start = jnp.searchsorted(
        c_rowv, jnp.arange(nbr + 1, dtype=jnp.int32), side="left",
        method="sort",
    ).astype(jnp.int32)
    ccol = jnp.where(out_ids == sent, 0, out_ids % jnp.int32(nbc)).astype(
        jnp.int32
    )

    tier = _tier(b, a_data.dtype, b_row_max, c_row_max)
    if tier is None:
        raise ValueError(
            f"row caps ({b_row_max},{c_row_max}) exceed VMEM at b={b}; "
            "use the stream backend"
        )
    acc_p, panel_p = tier
    if triu:
        # The per-row (non-flow) pipeline only supports 1-2 parities.
        panel_p = min(panel_p, 2)
    filtered = a_norms2 is not None
    if wide is None:
        # Wide dots win when panels are wide enough to amortize the
        # B block-transpose pass and the chunked dot issue; narrow
        # banded panels (B1: ~3 blocks/row) measured faster per-pair.
        wide = raw_b_row_max >= 5
    if filtered:
        # Per-pair norm-filter decisions are incompatible with
        # panel-wide dots (triu is fine: panels are pre-narrowed).
        wide = False
    if wide:
        # Block-transpose B so a row panel stacks [B_kj^T; ...] — then
        # one dot(A, panel, contract lhs1/rhs1) = A @ [B_kj | ...].
        # One fused XLA pass over B, amortized over all pairs.
        b_data = jnp.swapaxes(b_data, -1, -2)
    # Panel-DMA granularity (see _make_kernel).  g8 > 1 trades overfetch
    # traffic for fewer descriptors; MEASURED on B2 (16384^2, 5%): the
    # regime is HBM-bandwidth-bound, g8=8's ~1.7-block/panel overfetch
    # plus the pad pass cost +15% — so exact fetching (g8=1) stays the
    # default and the machinery is kept for issue-bound future regimes.
    g8 = 1
    if g8 > 1:
        # Pad B by g8 blocks so g8-rounded panel fetches stay in bounds
        # (fuses with the wide-mode transpose pass).
        b_data = jnp.concatenate(
            [b_data, jnp.zeros((g8,) + b_data.shape[1:], b_data.dtype)]
        )
    with_acc = acc_data is not None
    if with_acc and acc_data.shape != (out_cap, b, b):
        raise ValueError(f"acc_data must be [{out_cap},{b},{b}]")
    kernel = _make_kernel(
        b, b_row_max, c_row_max, nbc, precision, nbr, out_cap, acc_p,
        panel_p, filtered, triu, wide, b_data.shape[0], g8,
        with_acc=with_acc,
    )
    vma = getattr(jax.typeof(a_data), "vma", frozenset())
    _rb_max = -(-min(b_row_max, b_data.shape[0]) // g8) * g8
    n_chunk_sizes = max(
        max(_rb_max.bit_length(), 1) - (g8.bit_length() - 1), 1
    )
    n_flush_sizes = max(min(c_row_max, out_cap).bit_length(), 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 + (3 if filtered else 0),
        grid=(nbr,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (
            3 if with_acc else 2
        ),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((panel_p, b, b), a_data.dtype),
            pltpu.VMEM((panel_p, b_row_max, b, b), b_data.dtype),
            pltpu.VMEM((acc_p, c_row_max, b, b), jnp.float32),
            pltpu.SMEM((nbc,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((panel_p,)),
            pltpu.SemaphoreType.DMA((panel_p, n_chunk_sizes)),
            pltpu.SemaphoreType.DMA((acc_p, n_flush_sizes)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    scalar_args = [a_row_start, a_col, b_row_start, b_col, c_row_start, ccol]
    if filtered:
        scalar_args += [
            a_norms2.astype(jnp.float32),
            b_norms2.astype(jnp.float32),
            jnp.asarray(tau2, jnp.float32).reshape(1),
        ]
    tensor_args = [a_data, b_data]
    if with_acc:
        tensor_args.append(acc_data.astype(jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_cap, b, b), jnp.float32, vma=vma),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*scalar_args, *tensor_args)
    return out
