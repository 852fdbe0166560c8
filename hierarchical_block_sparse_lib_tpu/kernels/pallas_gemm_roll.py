"""Rolling-window SpGEMM kernel: sliding B-slab reuse ACROSS row groups.

Fifth-generation numeric phase, for monotone-band structures (banded /
overlap Hamiltonians — B1/B3/B5's banded mixes at large bandwidths).
The row-group kernel (`pallas_gemm_groups.py`) fetches each group's
whole B slab [kmin_g, kmax_g] from HBM: consecutive groups of a banded
matrix overlap in all but G block-rows, so v4 re-fetches the overlap
every group (traffic ~ ngrp * window) and, when the slab is too big to
double-buffer in VMEM, exposes the whole fetch (the measured ~18%
single-buffer bubble on big-band shapes).

This kernel keeps ONE persistent VMEM buffer of B panels across grid
steps, exploiting that the sorted row-major layout makes each group's
needed panels a contiguous, monotonically-advancing HBM range
[b_row_start[kmin_g], b_row_start[kmax_g+1]):

  - slot of B block j is j - vbase (vbase = HBM index at buffer slot 0,
    tracked in SMEM) — the live window is always contiguous in the
    buffer, so the panel-wide MXU dots never wrap;
  - per group, only the NEW TAIL [hi_prev, hi_g) is fetched (G rows of
    panels instead of the whole window) — and that tail is PREFETCHED
    during the previous group's compute, restoring overlap without 2x
    window VMEM;
  - when appending would overflow the buffer, the window is RE-BASED by
    one synchronous window-sized fetch (reset).  With buf ~= 1.5x the
    max window, resets amortize to ~2 extra tails per group; total HBM
    B traffic ~= nnz(B) * (1 + window/(buf - window)) versus v4's
    sum_g window_g — a (G+w)/G-style reduction on a band of w block
    columns.

`plan_roll` verifies the window ranges are monotone (else the sliding
window is invalid and callers keep the groups kernel), sizes the buffer
to VMEM, and simulates the exact reset schedule for the traffic
accounting.  Same output contract as `rows_spgemm`/`groups_spgemm`:
exact slots per `out_ids`, zero-filled tail, undersized caps flagged by
the spgemm caller's overflow check.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hierarchical_block_sparse_lib_tpu.kernels.mxu import make_mxu_dot

_VMEM_BUDGET = int(13.5 * 1024 * 1024)


def _bucket(n: int) -> int:
    return max(-(-n // 8) * 8, 8)


def _tier(b: int, dtype, a_grp_max: int, buf: int, c_grp_max: int):
    """acc parity count (2 preferred) if the layout fits VMEM, else None.
    The B buffer is single by design (the rolling window IS the reuse
    mechanism); A panels are always double-buffered (they are small)."""
    itemsize = jnp.dtype(dtype).itemsize
    am = _bucket(a_grp_max)
    bf = _bucket(buf)
    cm = _bucket(c_grp_max)
    for acc_p in (2, 1):
        vmem = (2 * am + bf) * b * b * itemsize + acc_p * cm * b * b * 4
        if vmem <= _VMEM_BUDGET:
            return acc_p
    return None


def supported(
    b: int, dtype, a_grp_max: int, buf: int, c_grp_max: int, nbc: int
) -> bool:
    return (
        b % 128 == 0
        and nbc <= 4096
        and jnp.dtype(dtype) != jnp.float64
        and _tier(b, dtype, a_grp_max, buf, c_grp_max) is not None
    )


@dataclass(frozen=True)
class RollPlan:
    """Host-planned static capacities for `roll_spgemm` (exact maxima;
    reusable while both operands keep their ids)."""

    g: int  # rows per group
    a_grp_max: int  # max A blocks in any group
    buf: int  # B window buffer capacity (blocks)
    c_grp_max: int  # max C slots in any group
    window_max: int  # max live window (blocks); <= buf by construction
    traffic: int  # total B blocks fetched (tails + resets) — evidence
    pairs: int  # block pairs (= per-row kernel's B traffic in blocks)

    @property
    def caps(self):
        return (self.g, self.a_grp_max, self.buf, self.c_grp_max)

    @property
    def reuse(self) -> float:
        """B-traffic reduction vs the per-row panel kernel."""
        return self.pairs / max(self.traffic, 1)


def plan_roll(
    a, b, prefer=(16, 8, 4, 2, 1), slack: float = 1.5
) -> RollPlan | None:
    """Pick the largest group size G whose rolling window fits VMEM with
    `slack` headroom for tail appends, or None when the structure is not
    a monotone band (window ranges must advance monotonically) or no G
    fits.  Host-side numpy on the id structure only."""
    a_ids = np.asarray(jax.device_get(a.ids), np.int64)
    b_ids = np.asarray(jax.device_get(b.ids), np.int64)
    sent = np.iinfo(np.int32).max
    a_ids = a_ids[a_ids != sent]
    b_ids = b_ids[b_ids != sent]
    nbr, a_nbc = a.nb_rows, a.nb_cols
    nbrB, nbc = b.nb_rows, b.nb_cols
    if b.block_size % 128 != 0 or nbc > 4096 or a_ids.size == 0:
        return None
    a_row, a_col = a_ids // a_nbc, a_ids % a_nbc
    b_row = b_ids // nbc
    b_row_start = np.searchsorted(b_row, np.arange(nbrB + 1))
    panel_cnt = b_row_start[a_col + 1] - b_row_start[a_col]
    pairs = int(panel_cnt.sum())
    # Exact product support per C row (chunked; same as plan_groups).
    c_row_cnt = np.zeros(nbr, np.int64)
    offs = np.concatenate([[0], np.cumsum(panel_cnt)])
    CHUNK = 1 << 22
    b_col = b_ids % nbc
    lo_p = b_row_start[a_col]
    if pairs <= CHUNK:
        p = np.arange(pairs)
        e = np.searchsorted(offs, p, side="right") - 1
        cid = a_row[e] * nbc + b_col[lo_p[e] + (p - offs[e])]
        u = np.unique(cid)
        np.add.at(c_row_cnt, u // nbc, 1)
    else:
        allc = []
        for s in range(0, pairs, CHUNK):
            p = np.arange(s, min(s + CHUNK, pairs))
            e = np.searchsorted(offs, p, side="right") - 1
            allc.append(a_row[e] * nbc + b_col[lo_p[e] + (p - offs[e])])
        u = np.unique(np.concatenate(allc))
        c_row_cnt = np.bincount(u // nbc, minlength=nbr)
    for g in prefer:
        ngrp = -(-nbr // g)
        gid = a_row // g
        a_grp = np.bincount(gid, minlength=ngrp)
        kmin = np.full(ngrp, nbrB, np.int64)
        kmax = np.full(ngrp, -1, np.int64)
        np.minimum.at(kmin, gid, a_col)
        np.maximum.at(kmax, gid, a_col)
        nonempty = kmax >= 0
        lo = np.where(nonempty, b_row_start[np.minimum(kmin, nbrB)], 0)
        hi = np.where(
            nonempty, b_row_start[np.minimum(kmax + 1, nbrB)], 0
        )
        # Empty groups inherit the running extents (device mirror uses
        # a cummax) — then the band must advance monotonically.
        lo = np.maximum.accumulate(lo)
        hi = np.maximum.accumulate(hi)
        if np.any(np.diff(lo) < 0) or np.any(np.diff(hi) < 0):
            continue  # unreachable after cummax; kept for clarity
        window = hi - lo
        window_max = int(window.max())
        if window_max == 0:
            return None
        c_grp = np.add.reduceat(
            np.concatenate([c_row_cnt, np.zeros(ngrp * g - nbr, np.int64)]),
            np.arange(0, ngrp * g, g),
        )
        caps_a = int(a_grp.max())
        caps_c = int(c_grp.max())
        buf = _bucket(int(np.ceil(window_max * slack)))
        # Shrink toward window_max until it fits (keep >= window_max).
        while buf > _bucket(window_max) and not supported(
            b.block_size, a.dtype, caps_a, buf, caps_c, nbc
        ):
            buf = _bucket(max(buf - 8, window_max))
        if not supported(b.block_size, a.dtype, caps_a, buf, caps_c, nbc):
            continue
        # Simulate the exact reset schedule for the traffic number.
        vb = hi_cur = int(lo[0])
        traffic = 0
        for gi2 in range(ngrp):
            if hi[gi2] - vb > buf:
                vb = int(lo[gi2])
                traffic += int(hi[gi2] - lo[gi2])
            else:
                traffic += int(hi[gi2] - hi_cur)
            hi_cur = int(hi[gi2])
        return RollPlan(
            g, caps_a, buf, caps_c, window_max, traffic, pairs
        )
    return None


def _make_kernel(
    b, g_rows, a_grp_max, buf, c_grp_max, nbc, precision,
    ngrp, nbr, out_cap, acc_p, cap_a, cap_b,
):
    a_chunk_sizes = [
        1 << k for k in range(max(min(a_grp_max, cap_a).bit_length(), 1))
    ][::-1]
    b_chunk_sizes = [
        1 << k for k in range(max(min(buf, cap_b).bit_length(), 1))
    ][::-1]
    flush_sizes = [
        1 << k for k in range(max(min(c_grp_max, out_cap).bit_length(), 1))
    ][::-1]
    mxu_dot = make_mxu_dot(precision)

    # SMEM state slots.
    S_ACC = 0  # acc parity counter
    S_FL0, S_FL1 = 1, 2  # pending flush counts per parity
    S_VB = 3  # HBM b-block index stored at buffer slot 0
    S_HI = 4  # exclusive HBM b-block index currently valid in buffer
    S_PF = 5  # 1 iff the tail for the CURRENT group was prefetched

    def kernel(
        a_row_start_ref,  # SMEM int32[nbr+1]
        a_col_ref,  # SMEM int32[capA]
        b_row_start_ref,  # SMEM int32[nbrB+1]
        b_col_ref,  # SMEM int32[capB]
        c_row_start_ref,  # SMEM int32[nbr+1]
        ccol_ref,  # SMEM int32[out_cap]
        grp_a_start_ref,  # SMEM int32[ngrp+1]
        grp_c_start_ref,  # SMEM int32[ngrp+1]
        grp_lo_ref,  # SMEM int32[ngrp] window start (HBM b-index)
        grp_hi_ref,  # SMEM int32[ngrp] window end (exclusive)
        a_hbm,  # ANY [capA, b, b]
        b_hbm,  # ANY [capB, b, b]
        o_hbm,  # ANY [out_cap, b, b] f32
        a_buf,  # VMEM [2, a_grp_max, b, b]
        b_buf,  # VMEM [buf, b, b]  (persistent rolling window)
        acc,  # VMEM [acc_p, c_grp_max, b, b] f32
        postable,  # SMEM int32[nbc]
        state,  # SMEM int32[8]
        a_sems,  # DMA [2, len(a_chunk_sizes)]
        b_sems,  # DMA [len(b_chunk_sizes)]
        f_sems,  # DMA [acc_p, len(flush_sizes)]
        z_sem,  # DMA []
    ):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            state[S_ACC] = 0
            state[S_FL0] = 0
            state[S_FL1] = 0
            state[S_VB] = grp_lo_ref[0]
            state[S_HI] = grp_lo_ref[0]
            state[S_PF] = 0

        # ---- A panels: double-buffered exactly like the groups kernel.
        def a_op(fpar, gg, do_start):
            a_lo = grp_a_start_ref[gg]
            a_cnt = jnp.minimum(grp_a_start_ref[gg + 1] - a_lo, a_grp_max)
            for ci, s in enumerate(a_chunk_sizes):
                @pl.when((a_cnt & s) != 0)
                def _(ci=ci, s=s):
                    off = a_cnt & ~(2 * s - 1)
                    dma = pltpu.make_async_copy(
                        a_hbm.at[pl.ds(a_lo + off, s)],
                        a_buf.at[fpar, pl.ds(off, s)],
                        a_sems.at[fpar, ci],
                    )
                    if do_start:
                        dma.start()
                    else:
                        dma.wait()

        par = jax.lax.rem(gi, 2)

        @pl.when(gi == 0)
        def _():
            a_op(0, 0, True)

        @pl.when(gi + 1 < ngrp)
        def _():
            a_op(1 - par, gi + 1, True)

        a_op(par, gi, False)

        # ---- B window: tail append (prefetched when possible) / reset.
        def b_chain(src_lo, dst_lo, cnt, do_start):
            # Pow2 decomposition of a contiguous cnt-block transfer with
            # INDEPENDENT src/dst offsets (the window slot differs from
            # the HBM index by vbase).
            for ci, s in enumerate(b_chunk_sizes):
                @pl.when((cnt & s) != 0)
                def _(ci=ci, s=s):
                    off = cnt & ~(2 * s - 1)
                    dma = pltpu.make_async_copy(
                        b_hbm.at[pl.ds(src_lo + off, s)],
                        b_buf.at[pl.ds(dst_lo + off, s)],
                        b_sems.at[ci],
                    )
                    if do_start:
                        dma.start()
                    else:
                        dma.wait()

        hi_need = grp_hi_ref[gi]
        cur_hi = state[S_HI]
        cnt_need = hi_need - cur_hi

        @pl.when(state[S_PF] == 1)
        def _():
            # The previous step started this exact chain (same SMEM
            # state then and now: nothing mutated S_HI/S_VB since).
            b_chain(cur_hi, cur_hi - state[S_VB], cnt_need, False)
            state[S_HI] = hi_need
            state[S_PF] = 0

        @pl.when((state[S_PF] == 0) & (cnt_need > 0))
        def _():
            reset = (hi_need - state[S_VB]) > buf

            @pl.when(reset)
            def _():
                lo = grp_lo_ref[gi]
                state[S_VB] = lo
                b_chain(lo, 0, hi_need - lo, True)
                b_chain(lo, 0, hi_need - lo, False)

            @pl.when(~reset)
            def _():
                dst = cur_hi - state[S_VB]
                b_chain(cur_hi, dst, cnt_need, True)
                b_chain(cur_hi, dst, cnt_need, False)

            state[S_HI] = hi_need

        # Prefetch the NEXT group's tail while this group computes (the
        # append region is disjoint from the live window, so single
        # buffering suffices for overlap).  Skipped when the next group
        # needs a reset — that reset runs synchronously next step.
        @pl.when(gi + 1 < ngrp)
        def _():
            nxt_hi = grp_hi_ref[jnp.minimum(gi + 1, ngrp - 1)]
            cnt_nxt = nxt_hi - state[S_HI]
            fits = (nxt_hi - state[S_VB]) <= buf

            @pl.when(fits & (cnt_nxt > 0))
            def _():
                src = state[S_HI]
                b_chain(src, src - state[S_VB], cnt_nxt, True)
                state[S_PF] = 1

        # ---- Compute + flush: same structure as the groups kernel.
        def flush(fp, dst_lo, cnt, do_start):
            for ci, fs in enumerate(flush_sizes):
                @pl.when((cnt & fs) != 0)
                def _(ci=ci, fs=fs):
                    off = cnt & ~(2 * fs - 1)
                    dma = pltpu.make_async_copy(
                        acc.at[fp, pl.ds(off, fs)],
                        o_hbm.at[pl.ds(dst_lo + off, fs)],
                        f_sems.at[fp, ci],
                    )
                    if do_start:
                        dma.start()
                    else:
                        dma.wait()

        c_grp_lo = grp_c_start_ref[gi]
        c_cnt = jnp.minimum(grp_c_start_ref[gi + 1] - c_grp_lo, c_grp_max)
        a_grp_lo = grp_a_start_ref[gi]
        vbase = state[S_VB]

        @pl.when(c_cnt > 0)
        def _():
            fpar = jax.lax.rem(state[S_ACC], acc_p)

            @pl.when(state[S_FL0 + fpar] > 0)
            def _():
                flush(fpar, 0, state[S_FL0 + fpar], False)
                state[S_FL0 + fpar] = 0

            def zero_slot(s, _):
                acc[fpar, s] = jnp.zeros((b, b), jnp.float32)
                return 0

            jax.lax.fori_loop(0, c_cnt, zero_slot, 0)

            def rowloop(r, _):
                i = gi * g_rows + r

                @pl.when(i < nbr)
                def _():
                    c_lo_i = c_row_start_ref[i]
                    c_cnt_i = c_row_start_ref[i + 1] - c_lo_i
                    sb = c_lo_i - c_grp_lo

                    def initpos(s, _):
                        postable[ccol_ref[c_lo_i + s]] = sb + s
                        return 0

                    jax.lax.fori_loop(0, c_cnt_i, initpos, 0)

                    a_lo_i = a_row_start_ref[i]
                    a_cnt_i = a_row_start_ref[i + 1] - a_lo_i

                    def aloop(t, _):
                        e = a_lo_i + t
                        la = jnp.clip(e - a_grp_lo, 0, a_grp_max - 1)
                        k = a_col_ref[e]
                        blo = b_row_start_ref[k]
                        poff = jnp.clip(blo - vbase, 0, buf - 1)
                        bcnt = jnp.minimum(
                            b_row_start_ref[k + 1] - blo, buf - poff
                        )

                        # Panel-wide MXU dots over the block-transposed
                        # window (same scheme as the groups kernel).
                        def chunk(off, csize):
                            flat = b_buf[
                                pl.ds(poff + off, csize)
                            ].reshape(csize * b, b)
                            prod = mxu_dot(
                                a_buf[par, la], flat,
                                (((1,), (1,)), ((), ())),
                            )
                            for idx in range(csize):
                                pos = jnp.clip(
                                    postable[
                                        b_col_ref[blo + off + idx]
                                    ],
                                    0, c_grp_max - 1,
                                )
                                acc[fpar, pos] += prod[
                                    :, idx * b:(idx + 1) * b
                                ]

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
                        return 0

                    jax.lax.fori_loop(0, a_cnt_i, aloop, 0)

                return 0

            jax.lax.fori_loop(0, g_rows, rowloop, 0)

            flush(fpar, c_grp_lo, c_cnt, True)
            state[S_FL0 + fpar] = c_cnt
            state[S_ACC] = state[S_ACC] + 1

        @pl.when(gi == ngrp - 1)
        def _():
            for fp in range(acc_p):
                @pl.when(state[S_FL0 + fp] > 0)
                def _(fp=fp):
                    flush(fp, 0, state[S_FL0 + fp], False)
                    state[S_FL0 + fp] = 0
            # Zero-fill the padding tail [used, out_cap) so the all-zero
            # padding invariant holds without a caller-side mask pass.
            used = c_row_start_ref[nbr]
            zc = min(c_grp_max, out_cap)
            acc[0] = jnp.zeros((c_grp_max, b, b), jnp.float32)
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
                dma = pltpu.make_async_copy(acc.at[0, 0], o_hbm.at[s], z_sem)
                dma.start()
                dma.wait()
                return 0

            jax.lax.fori_loop(used + nfull * zc, out_cap, zfill, 0)

        return

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "nbr", "nbrB", "nbc", "out_cap", "g_rows", "a_grp_max",
        "buf", "c_grp_max", "precision", "interpret",
    ),
)
def roll_spgemm(
    a_ids: jax.Array,  # int32[capA] sorted (SENTINEL padded)
    a_data: jax.Array,  # [capA, b, b]
    b_ids: jax.Array,  # int32[capB] sorted
    b_data: jax.Array,  # [capB, b, b]
    out_ids: jax.Array,  # int32[out_cap] sorted distinct output ids
    nbr: int,
    nbrB: int,
    nbc: int,
    out_cap: int,
    g_rows: int,
    a_grp_max: int,
    buf: int,
    c_grp_max: int,
    precision: str = "highest",
    interpret: bool | None = None,
) -> jax.Array:
    """f32[out_cap, b, b]: same contract as `groups_spgemm` (exact slots
    per `out_ids`, zero-filled tail; garbage-but-in-bounds on undersized
    caps, flagged by the spgemm caller's roll_overflow check)."""
    b = a_data.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision == "high" and jnp.dtype(a_data.dtype) != jnp.float32:
        precision = "default"
    a_grp_max = _bucket(a_grp_max)
    buf = _bucket(buf)
    c_grp_max = _bucket(c_grp_max)
    ngrp = -(-nbr // g_rows)

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
    c_rowv = jnp.where(
        out_ids == sent, jnp.int32(nbr), out_ids // jnp.int32(nbc)
    )
    c_row_start = jnp.searchsorted(
        c_rowv, jnp.arange(nbr + 1, dtype=jnp.int32), side="left",
        method="sort",
    ).astype(jnp.int32)
    ccol = jnp.where(out_ids == sent, 0, out_ids % jnp.int32(nbc)).astype(
        jnp.int32
    )

    grp_rows = jnp.minimum(
        jnp.arange(ngrp + 1, dtype=jnp.int32) * g_rows, nbr
    )
    grp_a_start = a_row_start[grp_rows]
    grp_c_start = c_row_start[grp_rows]
    gid = jnp.clip(a_rowv // g_rows, 0, ngrp - 1)
    col_min = jnp.where(a_ids == sent, jnp.int32(nbrB), a_col)
    col_max = jnp.where(a_ids == sent, jnp.int32(-1), a_col)
    kmin = jnp.full((ngrp,), nbrB, jnp.int32).at[gid].min(col_min)
    kmax = jnp.full((ngrp,), -1, jnp.int32).at[gid].max(col_max)
    nonempty = kmax >= 0
    lo_raw = jnp.where(
        nonempty, b_row_start[jnp.clip(kmin, 0, nbrB)], 0
    ).astype(jnp.int32)
    hi_raw = jnp.where(
        nonempty, b_row_start[jnp.clip(kmax + 1, 0, nbrB)], 0
    ).astype(jnp.int32)
    # Empty groups inherit the running extents; the planner verified the
    # band advances monotonically, so the cummax is the identity on the
    # nonempty entries.
    grp_lo = jax.lax.cummax(lo_raw)
    grp_hi = jax.lax.cummax(hi_raw)

    acc_p = _tier(b, a_data.dtype, a_grp_max, buf, c_grp_max)
    if acc_p is None:
        raise ValueError(
            f"roll caps ({a_grp_max},{buf},{c_grp_max}) exceed VMEM "
            f"at b={b}; use the groups/rows backend"
        )
    b_data = jnp.swapaxes(b_data, -1, -2)  # block-transposed (wide dots)
    kernel = _make_kernel(
        b, g_rows, a_grp_max, buf, c_grp_max, nbc, precision,
        ngrp, nbr, out_cap, acc_p, a_data.shape[0], b_data.shape[0],
    )
    vma = getattr(jax.typeof(a_data), "vma", frozenset())
    n_a_sizes = max(min(a_grp_max, a_data.shape[0]).bit_length(), 1)
    n_b_sizes = max(min(buf, b_data.shape[0]).bit_length(), 1)
    n_f_sizes = max(min(c_grp_max, out_cap).bit_length(), 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(ngrp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, a_grp_max, b, b), a_data.dtype),
            pltpu.VMEM((buf, b, b), b_data.dtype),
            pltpu.VMEM((acc_p, c_grp_max, b, b), jnp.float32),
            pltpu.SMEM((nbc,), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, n_a_sizes)),
            pltpu.SemaphoreType.DMA((n_b_sizes,)),
            pltpu.SemaphoreType.DMA((acc_p, n_f_sizes)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_cap, b, b), jnp.float32, vma=vma),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        a_row_start, a_col, b_row_start, b_col, c_row_start, ccol,
        grp_a_start, grp_c_start, grp_lo, grp_hi,
        a_data, b_data,
    )
    return out
