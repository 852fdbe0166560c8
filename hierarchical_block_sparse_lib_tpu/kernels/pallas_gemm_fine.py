"""Fine-leaf (b < 128) row-panel SpGEMM kernel: the block-diagonal
("BD") MXU formulation.

Why this exists (VERDICT r4 item 1): the reference's configured leaf
sizes are 16 (B1) and 32 (B2), but Mosaic cannot DMA sub-128-lane
block slices ("Slice shape along dimension 2 must be aligned to tiling
(128)"), so every 128-tile Pallas kernel is unsupported at fine leaves
and auto-dispatch fell back to the XLA gather+dot_general path — whose
TRUE steady-state cost is ~110 ms planned on the configured B2
(scripts/profile_fine32b.py; the round-4 "13 ms" record was a K-span
artifact).  Worse, every `[*, b, b]` f32 tensor with b < 128 is
tile-PADDED 4x in HBM (measured: "Extra memory due to padding: 4.0x
expansion"), so that path also moves 4x phantom bytes.

The fix is a layout change plus an algebraic identity:

- **flat blocks**: a [32,32] block stored row-major as [8,128] is ONE
  native (8,128) f32 tile — zero padding, DMA-legal at per-block
  granularity.  Generally [b,b] -> [fr,128] with fr = b*b/128, for
  b in {16,32,64}.
- **the BD identity**: with f = 128/b and flat(X)[g, b*t+j] =
  X[f*g+t, j] (the row-major reshape),
      flat(C_ij^T) = flat(B_kj^T) @ BD(A_ik^T)
  where BD(X) is the [128,128] block-diagonal holding X (b x b) on the
  diagonal f times.  Proof:
      (flat(B^T) @ BD)[g, b*t+q]
        = sum_m flat(B^T)[g, b*t+m] * A^T[m, q]
        = sum_m B^T[f*g+t, m] A^T[m, q] = (B^T A^T)[f*g+t, q]
        = flat((A B)^T)[g, b*t+q].                               QED
  So ONE K=128 MXU dot of a flat B-row panel [fr*nb, 128] against
  BD(A_ik^T) produces the flat transposed products of A block (i,k)
  with its ENTIRE B row panel — full-width MXU contraction (K=128,
  M ~ fr*nb ~ 200), no sub-128-lane data movement anywhere.  The BD's
  off-diagonal zeros cost a (128/b)x hardware-FLOP inflation (4x at
  b=32) — measured 12.2 TF/s hw at precision=highest ~ 3 TF/s honest
  (scripts/micro_fine_kernel2.py E12) vs the XLA fallback's 0.2;
  the zero-inflation K=32 grid formulation runs at 1/4 array
  utilization in Mosaic anyway (E1a: 7.7 TF/s hw) and has no workable
  accumulate path (XLA-side extract/scatter of [32,32] sub-blocks
  measured seconds).

Structure (grid = one step per C block-row, like `pallas_gemm_rows`):

- A operand `a_wide` [capA_pad, b, 128]: payload-TRANSPOSED blocks in
  lanes 0:b (an XLA prep pass, measured ~free: E11).  Consumed as a
  GLOBAL 3-parity stream of fixed 32-block chunks — the A-block index
  e increases contiguously across the whole grid, so chunk fetches are
  one DMA per 32 blocks (descriptor-cost control; round-5 first cut
  paid ~50k descriptors and ran 24 ms).
- B operand `btf` [capB_pad * fr, 128]: flat transposed payloads.
  Row-k panels are contiguous; fetches are rounded UP to 8-block
  granularity (1-2 descriptors per panel; overfetch <= 7 blocks of
  4 KB rides a zero pad — at fine leaves the descriptor saving beats
  the overfetch bytes, the REVERSE of the b=128 g8 measurement).
- Output: flat transposed payloads [out_cap * fr, 128]; the XLA
  post-pass `out.reshape(out_cap, b, b).transpose(0,2,1)` recovers
  canonical payloads (also ~free).

Accumulation: products for A block (i,k) land at the C row's column
positions via dynamic fr-aligned-sublane `acc[pl.ds(pos*fr, fr)] +=`
adds (measured to hide behind the dots: E12 adds=True vs False within
noise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hierarchical_block_sparse_lib_tpu.kernels.mxu import make_mxu_dot

_VMEM_BUDGET = int(13 * 1024 * 1024)
_ACHUNK = 32  # A-stream chunk, blocks
_G8 = 8  # B-panel fetch granularity, blocks


def _bucket(n: int) -> int:
    return max(-(-n // 8) * 8, 8)


_PANEL_P = 4  # B-panel pipeline depth: lookahead 3 hides the ~1.5 us
# DMA latency behind ~0.56 us/A-block compute (the 2-deep pipeline
# measured latency-bound: 23 ms vs the 7.3 ms E12 composite floor).


def _vmem_bytes(b: int, b_row_max: int, c_row_max: int) -> int:
    fr = (b * b) // 128
    bb = _bucket(max(b_row_max, 1))
    cb = _bucket(max(c_row_max, 1))
    return (
        _PANEL_P * bb * fr * 128 * 4  # B panel buffers
        + 3 * _ACHUNK * b * 128 * 4  # A chunk stream (3 parities)
        + 2 * cb * fr * 128 * 4    # accumulator (2 parities)
        + 2 * bb * fr * 128 * 4    # prod scratch (2 parities)
        + 2 * 128 * 128 * 4        # BD scratch (2 parities)
    )


def supported(b: int, dtype, b_row_max: int, c_row_max: int, nbc: int) -> bool:
    """Fine-leaf kernel applicability: b in {16,32,64} (flat rows
    b^2/128 >= 2 and 128 % b == 0), f32 data, structure fits VMEM/SMEM."""
    return (
        b in (16, 32, 64)
        and jnp.dtype(dtype) == jnp.float32
        and nbc <= 4096
        and _vmem_bytes(b, b_row_max, c_row_max) <= _VMEM_BUDGET
    )


def _make_kernel(
    b, fr, f, b_row_max, c_row_max, nbc, precision, nbr, out_cap,
    cap_b_pad, n_achunks, ablate="",
):
    # B panel chunk sizes: pow2 multiples of _G8 covering the rounded
    # panel length (rcnt = ceil(bcnt/8)*8 <= bucket(b_row_max)).
    rb_max = -(-b_row_max // _G8) * _G8
    chunk_sizes = [
        1 << k
        for k in range(_G8.bit_length() - 1, max(rb_max.bit_length(), 4))
    ]
    chunk_sizes.reverse()  # e.g. [32, 16, 8]
    flush_sizes = [
        1 << k for k in range(max(min(c_row_max, out_cap).bit_length(), 1))
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
        a_hbm,  # ANY [capA_pad, b, 128] (A^T blocks in lanes 0:b)
        b_hbm,  # ANY [capB_pad * fr, 128] (flat B^T blocks)
        o_hbm,  # ANY [out_cap * fr, 128] f32 (flat C^T blocks)
        a_chunks,  # VMEM [3, _ACHUNK, b, 128]
        b_panel,  # VMEM [_PANEL_P, b_row_max * fr, 128]
        acc,  # VMEM [2, c_row_max * fr, 128] f32
        bd,  # VMEM [2, 128, 128]
        prod,  # VMEM [2, b_row_max * fr, 128] f32
        postable,  # SMEM int32[nbc]
        state,  # SMEM int32[4]
        a_sems,  # DMA [3]
        p_sems,  # DMA [_PANEL_P, len(chunk_sizes)]
        f_sems,  # DMA [2, len(flush_sizes)]
        z_sem,  # DMA []
    ):
        i = pl.program_id(0)
        a_total = a_row_start_ref[nbr]

        def fetch_achunk(c):
            pltpu.make_async_copy(
                a_hbm.at[pl.ds(c * _ACHUNK, _ACHUNK)],
                a_chunks.at[jax.lax.rem(c, 3)],
                a_sems.at[jax.lax.rem(c, 3)],
            ).start()

        def wait_achunk(c):
            pltpu.make_async_copy(
                a_hbm.at[pl.ds(0, _ACHUNK)],
                a_chunks.at[jax.lax.rem(c, 3)],
                a_sems.at[jax.lax.rem(c, 3)],
            ).wait()

        a_lo = a_row_start_ref[i]
        a_cnt = a_row_start_ref[i + 1] - a_lo
        c_lo = c_row_start_ref[i]
        c_cnt = jnp.minimum(c_row_start_ref[i + 1] - c_lo, c_row_max)

        def _panel_range(e):
            k = a_col_ref[e]
            blo = b_row_start_ref[k]
            bcnt = jnp.minimum(b_row_start_ref[k + 1] - blo, b_row_max)
            return blo, bcnt

        def panel_op(par, blo, bcnt, do_start):
            rcnt = ((bcnt + _G8 - 1) // _G8) * _G8
            for ci, s in enumerate(chunk_sizes):
                @pl.when((rcnt & s) != 0)
                def _(ci=ci, s=s):
                    off = rcnt & ~(2 * s - 1)
                    dma = pltpu.make_async_copy(
                        b_hbm.at[pl.ds((blo + off) * fr, s * fr)],
                        b_panel.at[par, pl.ds(off * fr, s * fr)],
                        p_sems.at[par, ci],
                    )
                    if do_start:
                        dma.start()
                    else:
                        dma.wait()

        def fetch_e(par, e):
            blo, bcnt = _panel_range(e)
            panel_op(par, blo, bcnt, True)

        def wait_e(par, e):
            blo, bcnt = _panel_range(e)
            panel_op(par, blo, bcnt, False)

        @pl.when(i == 0)
        def _():
            state[0] = 0
            state[1] = 0
            state[2] = 0
            # BD off-diagonal stays zero for the whole kernel; only the
            # f diagonal b x b slots are overwritten per A block.
            bd[:] = jnp.zeros((2, 128, 128), bd.dtype)
            fetch_achunk(0)
            if n_achunks > 1:
                fetch_achunk(1)
            # Prologue of the global B-panel fetch chain (flow): blocks
            # 0.._PANEL_P-2 into their parities — block e+_PANEL_P-1 is
            # then fetched at block e's iteration, ACROSS row
            # boundaries, keeping the lookahead depth constant.
            if "nofetch" not in ablate:
                for j in range(_PANEL_P - 1):
                    @pl.when(j < a_total)
                    def _(j=j):
                        fetch_e(j, j)

        def flush_op(par, dst_lo, cnt, do_start):
            for ci, fs in enumerate(flush_sizes):
                @pl.when((cnt & fs) != 0)
                def _(ci=ci, fs=fs):
                    off = cnt & ~(2 * fs - 1)
                    dma = pltpu.make_async_copy(
                        acc.at[par, pl.ds(off * fr, fs * fr)],
                        o_hbm.at[pl.ds((dst_lo + off) * fr, fs * fr)],
                        f_sems.at[par, ci],
                    )
                    if do_start:
                        dma.start()
                    else:
                        dma.wait()

        has_work = c_cnt > 0
        fpar = jax.lax.rem(state[0], 2)

        def prep_acc():
            @pl.when(state[1 + fpar] > 0)
            def _():
                flush_op(fpar, 0, state[1 + fpar], False)
                state[1 + fpar] = 0

            def init_slot(s, _):
                postable[ccol_ref[c_lo + s]] = s
                return 0

            if "noinit" not in ablate:
                jax.lax.fori_loop(0, c_cnt, init_slot, 0)
                # Bulk acc zeroing in pow2 chunks (a per-slot [fr,128]
                # zero inside the loop above measured ~1.9 ms at B2).
                for fs in flush_sizes:
                    @pl.when((c_cnt & fs) != 0)
                    def _(fs=fs):
                        off = c_cnt & ~(2 * fs - 1)
                        acc[fpar, pl.ds(off * fr, fs * fr)] = jnp.zeros(
                            (fs * fr, 128), jnp.float32
                        )

        def compute_e(par, e):
            blo, bcnt = _panel_range(e)
            # BD(A_ik^T): f diagonal copies of the b x b transposed
            # block (static slices; off-diagonal pre-zeroed once).
            # BD double-buffers on e's parity so block e+1's BD build
            # need not wait for block e's dots.
            bpar = jax.lax.rem(e, 2)
            if "nobd" not in ablate:
                lg = a_chunks[
                    jax.lax.rem(e // _ACHUNK, 3), jax.lax.rem(e, _ACHUNK)
                ][:, 0:b]
                for t in range(f):
                    bd[bpar, b * t:b * (t + 1), b * t:b * (t + 1)] = lg

            def chunk(off, csize):
                # The dot covers the g8-ROUNDED chunk (fragmenting the
                # panel into exact-bcnt pow2 pieces measured ~2x
                # slower: small-M dots pay BD weight loads); junk rows
                # past bcnt are computed but never accumulated.
                # prod double-buffers on e's parity: the VPU adds of
                # block e can overlap the MXU dot of block e+1.
                if "nodots" not in ablate:
                    prod[bpar, pl.ds(0, csize * fr), :] = mxu_dot(
                        b_panel[par, pl.ds(off * fr, csize * fr)],
                        bd[bpar],
                        (((1,), (0,)), ((), ())),
                    )

                def add1(t, _):
                    pos = jnp.clip(
                        postable[b_col_ref[blo + off + t]],
                        0, c_row_max - 1,
                    )
                    acc[fpar, pl.ds(pos * fr, fr)] += prod[
                        bpar, pl.ds(t * fr, fr)
                    ]
                    return 0

                if "noadds" not in ablate:
                    jax.lax.fori_loop(
                        0, jnp.minimum(csize, bcnt - off), add1, 0
                    )

            # ONE whole-panel dot per A block (a branch per 8-multiple
            # size) instead of a pow2 chunk pair: fewer BD weight
            # loads, larger M per dot.
            rcnt = ((bcnt + _G8 - 1) // _G8) * _G8
            for s in range(_G8, rb_max + 1, _G8):
                @pl.when(rcnt == s)
                def _(s=s):
                    chunk(0, s)

        @pl.when(has_work)
        def _():
            prep_acc()

        @pl.when(a_cnt > 0)
        def _():
            def eloop(t, _):
                e = a_lo + t
                par = jax.lax.rem(e, _PANEL_P)

                # Global A-chunk stream: entering chunk c, retire it
                # and prefetch c+2 (3 parities; c+1 already in flight).
                @pl.when(jax.lax.rem(e, _ACHUNK) == 0)
                def _():
                    c = e // _ACHUNK
                    wait_achunk(c)

                    @pl.when(c + 2 < n_achunks)
                    def _():
                        fetch_achunk(c + 2)

                # Flow chain: keep the B-panel lookahead at depth
                # _PANEL_P-1 across row boundaries.
                if "nofetch" not in ablate:
                    nxt = e + _PANEL_P - 1

                    @pl.when(nxt < a_total)
                    def _():
                        fetch_e(jax.lax.rem(nxt, _PANEL_P), nxt)

                    wait_e(par, e)

                @pl.when(has_work)
                def _():
                    compute_e(par, e)

                return 0

            jax.lax.fori_loop(0, a_cnt, eloop, 0)

        @pl.when(has_work)
        def _():
            flush_op(fpar, c_lo, c_cnt, True)
            state[1 + fpar] = c_cnt
            state[0] = state[0] + 1

        @pl.when(i == nbr - 1)
        def _():
            for par in range(2):
                @pl.when(state[1 + par] > 0)
                def _(par=par):
                    flush_op(par, 0, state[1 + par], False)
                    state[1 + par] = 0
            # Zero-fill unused tail slots [used, out_cap) in chunks of
            # whole accumulator panels.
            used = c_row_start_ref[nbr]
            zc = min(c_row_max, out_cap)
            acc[0] = jnp.zeros((c_row_max * fr, 128), jnp.float32)
            nfull = jnp.maximum((out_cap - used) // zc, 0)

            def zchunk(t, _):
                dma = pltpu.make_async_copy(
                    acc.at[0, pl.ds(0, zc * fr)],
                    o_hbm.at[pl.ds((used + t * zc) * fr, zc * fr)],
                    z_sem,
                )
                dma.start()
                dma.wait()
                return 0

            jax.lax.fori_loop(0, nfull, zchunk, 0)

            def zfill(s, _):
                dma = pltpu.make_async_copy(
                    acc.at[0, pl.ds(0, fr)],
                    o_hbm.at[pl.ds(s * fr, fr)],
                    z_sem,
                )
                dma.start()
                dma.wait()
                return 0

            jax.lax.fori_loop(used + nfull * zc, out_cap, zfill, 0)

        return

    return kernel


@functools.partial(jax.jit, static_argnames=("nbr", "nbrB", "nbc"))
def build_tables(a_ids, b_ids, out_ids, nbr: int, nbrB: int, nbc: int):
    """The kernel's scalar-prefetch row tables — pure functions of the
    id STRUCTURE.  In the fixed-structure regime precompute these once
    (ops.fine.make_fine_plan): each is a `searchsorted(method="sort")`
    whose sort scales with CAPACITY (out_cap ~ 189k at the configured
    B2 — several ms per call if rebuilt every iteration)."""
    sent = jnp.int32(jnp.iinfo(jnp.int32).max)
    a_rowv = jnp.where(a_ids == sent, jnp.int32(nbr), a_ids // jnp.int32(nbrB))
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
    return (a_row_start, a_col, b_row_start, b_col, c_row_start, ccol)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbr", "nbrB", "nbc", "out_cap", "b_row_max", "c_row_max",
        "precision", "interpret", "block_size", "out_layout", "ablate",
    ),
)
def fine_spgemm(
    a_ids: jax.Array,  # int32[capA] sorted (SENTINEL padded)
    a_data: jax.Array,  # [capA, b, b] canonical OR [capA, b^2/128, 128] flat
    b_ids: jax.Array,  # int32[capB] sorted
    b_data: jax.Array,  # [capB, b, b] or flat
    out_ids: jax.Array,  # int32[out_cap] sorted distinct output ids
    nbr: int,
    nbrB: int,
    nbc: int,
    out_cap: int,
    b_row_max: int,
    c_row_max: int,
    precision: str = "highest",
    interpret: bool | None = None,
    block_size: int | None = None,
    out_layout: str = "canonical",
    alpha: float | jax.Array = 1.0,
    tables: tuple | None = None,
    ablate: str = "",
) -> jax.Array:
    """Products accumulated into `out_ids` slots, `alpha`-scaled
    (folded into the A-operand prep — one cheap pass over A instead of
    a full pass over C).  Canonical payload shapes in/out by default;
    pass flat `[cap, b^2/128, 128]` payloads (with `block_size=b`) and
    `out_layout="flat"` for the flat-resident chain regime (ops.fine)
    — skipping the 4x-padded canonical C tensor saves ~4 ms at B2
    scale.  Tail slots are zero-filled in-kernel."""
    if block_size is None:
        b = a_data.shape[-1]
    else:
        b = block_size
    if b not in (16, 32, 64):
        raise ValueError(f"fine kernel needs b in (16,32,64), got {b}")
    fr = (b * b) // 128
    # Input layouts: canonical [cap,b,b] payloads, or the FineFlat
    # convention — flat TRANSPOSED payloads [cap,fr,128] storing
    # flat(X^T) per block (ops.fine).  The transposed-flat convention
    # is what makes the whole multiply relayout-free: B is consumed
    # as-is (the kernel needs flat(B^T)), A needs only a reshape+pad,
    # and the kernel's raw output (flat(C^T)) IS the convention.
    flat_in = a_data.shape[1:] == (fr, 128) and fr != b
    if flat_in:
        if b_data.shape[1:] != (fr, 128):
            raise ValueError("mixed A/B payload layouts")
    elif a_data.shape[1:] != (b, b) or b_data.shape[1:] != (b, b):
        raise ValueError(
            f"bad payload shapes {a_data.shape} {b_data.shape}"
        )
    f = 128 // b
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision == "high" and jnp.dtype(a_data.dtype) != jnp.float32:
        precision = "default"
    b_row_max = _bucket(max(b_row_max, 1))
    c_row_max = _bucket(max(c_row_max, 1))

    if tables is None:
        tables = build_tables(a_ids, b_ids, out_ids, nbr, nbrB, nbc)
    (a_row_start, a_col, b_row_start, b_col, c_row_start, ccol) = tables

    # Operand prep (XLA relayouts, measured ~free — module docstring):
    # A^T blocks widened to [b, 128] tiles (padded to whole A chunks);
    # B^T blocks flattened (padded so g8-rounded overfetch is in
    # bounds).  At precision="default" the operands are stored bf16 so
    # every dot is a single MXU pass (converting f32 operands per dot
    # on the VPU measured SLOWER than precision=highest: 20 vs 17 ms
    # at B2) and panel fetch bytes halve.
    f32 = jnp.float32
    st_dtype = (
        jnp.bfloat16
        if precision == "default" and jnp.dtype(a_data.dtype) == f32
        else f32
    )
    cap_a = a_data.shape[0]
    cap_a_pad = -(-cap_a // _ACHUNK) * _ACHUNK
    if flat_in:
        at_log = a_data.astype(f32).reshape(cap_a, b, b)  # A^T logical
        btf_core = b_data.astype(f32).reshape(b_data.shape[0] * fr, 128)
    else:
        at_log = jnp.swapaxes(a_data.astype(f32), -1, -2)
        btf_core = jnp.swapaxes(b_data.astype(f32), -1, -2).reshape(
            b_data.shape[0] * fr, 128
        )
    a_wide = jnp.zeros((cap_a_pad, b, 128), st_dtype)
    a_wide = a_wide.at[:cap_a, :, :b].set(
        (at_log * jnp.asarray(alpha, f32)).astype(st_dtype)
    )
    cap_b_pad = b_data.shape[0] + _G8
    btf = jnp.concatenate(
        [btf_core.astype(st_dtype), jnp.zeros((_G8 * fr, 128), st_dtype)]
    )

    n_achunks = cap_a_pad // _ACHUNK
    kernel = _make_kernel(
        b, fr, f, b_row_max, c_row_max, nbc, precision, nbr, out_cap,
        cap_b_pad, n_achunks, ablate=ablate,
    )
    vma = getattr(jax.typeof(a_data), "vma", frozenset())
    rb_max = -(-b_row_max // _G8) * _G8
    n_chunk_sizes = max(rb_max.bit_length(), 4) - (_G8.bit_length() - 1)
    n_flush_sizes = max(min(c_row_max, out_cap).bit_length(), 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((3, _ACHUNK, b, 128), st_dtype),
            pltpu.VMEM((_PANEL_P, b_row_max * fr, 128), st_dtype),
            pltpu.VMEM((2, c_row_max * fr, 128), f32),
            pltpu.VMEM((2, 128, 128), st_dtype),
            pltpu.VMEM((2, b_row_max * fr, 128), f32),
            pltpu.SMEM((nbc,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((_PANEL_P, n_chunk_sizes)),
            pltpu.SemaphoreType.DMA((2, n_flush_sizes)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_cap * fr, 128), f32, vma=vma),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        a_row_start, a_col, b_row_start, b_col, c_row_start, ccol,
        a_wide, btf,
    )
    if out_layout == "flat":
        # The raw kernel output IS the transposed-flat convention —
        # zero post-pass (the flat->canonical->flat round trip measured
        # 6.2 ms at B2 scale: XLA materializes the padded
        # intermediate).
        return out.reshape(out_cap, fr, 128)
    # Flat C^T payloads -> canonical C payloads (one padded-write pass,
    # ~6 ms at B2 scale — the canonical-storage tax).
    return jnp.swapaxes(out.reshape(out_cap, b, b), -1, -2)
