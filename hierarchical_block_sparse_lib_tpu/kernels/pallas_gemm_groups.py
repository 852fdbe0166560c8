"""Row-group SpGEMM kernel: B-slab reuse across consecutive A rows.

Fourth-generation numeric phase, specialized for LOCAL structures
(banded matrices, overlap/Hamiltonian patterns — B1/B3/B5's banded
mixes; SURVEY.md section 7, CLAUDE.md "known headroom: B-panel reuse
across A rows").  The row-panel kernel (`pallas_gemm_rows.py`) fetches
B row-k's panel once per stored A(i,k): consecutive A rows of a banded
matrix re-fetch almost the same panels (bandwidth-1 of bandwidth
overlap) and pay one grid step + one flush per row.

This kernel exploits one more contiguity level of the row-major sorted
layout: the B row panels needed by G CONSECUTIVE A rows span the
contiguous HBM range  [b_row_start[kmin], b_row_start[kmax+1])  where
[kmin, kmax] is the union column range of the group's A blocks.  For a
banded matrix that slab holds (G + bandwidth) panels instead of the
G * bandwidth the per-row kernel streams, and A blocks / C slots of the
group are contiguous as well:

Algorithm (grid = one step per group of G block-rows, double-buffered):

  fetch (pow2 DMA decomposition, one logical transfer each):
      A blocks   a_data[grp_a_start[g] : grp_a_start[g+1]]
      B slab     b_data[slab_lo[g] : slab_lo[g] + slab_cnt[g]]
  for each row i in the group:
      build the column->slot table for C row i (slots offset into the
          group's contiguous accumulator range)
      for each stored A block (i,k):
          panel = slab[b_row_start[k] - slab_lo[g] : +bcnt]
          acc[postable[j]] += A(i,k) @ B(k,j)     # wide MXU dots
  flush acc -> C slots [grp_c_start[g], grp_c_start[g+1])  (one pow2
      DMA chain per group instead of per row)

HBM B traffic drops from pairs*block to sum_g slab_cnt[g]*block
(~ G*bw/(G+bw) smaller on a band of bw blocks), and per-row fixed costs
(grid step, flush chain, accumulator turnaround) amortize over G rows.
The host planner (`plan_groups`) picks the largest G whose slab/group
capacities fit VMEM; for non-local structures (B2 random) the slab
approaches all of B and planning fails -> callers keep the row-panel
kernel.  Same output contract as `rows_spgemm`: exact slots, zero-filled
tail, caller flags capacity overflow (spgemm's group_overflow check).
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


def _tier(b: int, dtype, a_grp_max: int, slab_max: int, c_grp_max: int):
    """(acc_parities, panel_parities) of the largest pipeline tier that
    fits VMEM, or None.  panel parity double-buffers the whole group
    fetch (A blocks + B slab) across grid steps."""
    itemsize = jnp.dtype(dtype).itemsize
    am = _bucket(a_grp_max)
    sm = _bucket(slab_max)
    cm = _bucket(c_grp_max)
    for acc_p, panel_p in ((2, 2), (1, 2), (1, 1)):
        vmem = (
            panel_p * (am + sm) * b * b * itemsize
            + acc_p * cm * b * b * 4
        )
        if vmem <= _VMEM_BUDGET:
            return acc_p, panel_p
    return None


def supported(
    b: int, dtype, a_grp_max: int, slab_max: int, c_grp_max: int, nbc: int
) -> bool:
    return (
        b % 128 == 0
        and nbc <= 4096
        and jnp.dtype(dtype) != jnp.float64
        and _tier(b, dtype, a_grp_max, slab_max, c_grp_max) is not None
    )


@dataclass(frozen=True)
class GroupPlan:
    """Host-planned static capacities for `groups_spgemm` (exact maxima
    over row groups; reusable while both operands keep their ids)."""

    g: int  # rows per group
    a_grp_max: int  # max A blocks in any group
    slab_max: int  # max B slab blocks fetched for any group
    c_grp_max: int  # max C slots in any group
    slab_blocks: int  # total B blocks fetched (sum of slabs) — traffic
    pairs: int  # block pairs (= per-row kernel's B traffic in blocks)

    @property
    def caps(self):
        return (self.g, self.a_grp_max, self.slab_max, self.c_grp_max)

    @property
    def reuse(self) -> float:
        """B-traffic reduction vs the per-row panel kernel."""
        return self.pairs / max(self.slab_blocks, 1)


def plan_groups(a, b, prefer=(16, 8, 4, 2, 1)) -> GroupPlan | None:
    """Pick the largest group size G whose capacities fit VMEM, with the
    exact per-group maxima, or None when no G >= 1 fits (non-local
    structure: the slab approaches nnz(B)).  Host-side numpy on the id
    structure only (SURVEY.md section 8.1: structure is host-planned,
    data never leaves the device)."""
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
    # Exact product support per C row (pairs from panel widths).
    panel_cnt = b_row_start[a_col + 1] - b_row_start[a_col]
    pairs = int(panel_cnt.sum())
    c_row_cnt = np.zeros(nbr, np.int64)
    offs = np.concatenate([[0], np.cumsum(panel_cnt)])
    CHUNK = 1 << 22
    b_col = b_ids % nbc
    lo = b_row_start[a_col]
    for s in range(0, pairs, CHUNK):
        p = np.arange(s, min(s + CHUNK, pairs))
        e = np.searchsorted(offs, p, side="right") - 1
        cid = a_row[e] * nbc + b_col[lo[e] + (p - offs[e])]
        u = np.unique(cid)
        np.add.at(c_row_cnt, u // nbc, 1)
    # np.unique per chunk can double-count ids split across chunks; redo
    # exactly when chunked (rare — only at B4+ scales).
    if pairs > CHUNK:
        allc = []
        for s in range(0, pairs, CHUNK):
            p = np.arange(s, min(s + CHUNK, pairs))
            e = np.searchsorted(offs, p, side="right") - 1
            allc.append(a_row[e] * nbc + b_col[lo[e] + (p - offs[e])])
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
        slab = np.where(
            nonempty,
            b_row_start[np.minimum(kmax + 1, nbrB)]
            - b_row_start[np.minimum(kmin, nbrB)],
            0,
        )
        c_grp = np.add.reduceat(
            np.concatenate([c_row_cnt, np.zeros(ngrp * g - nbr, np.int64)]),
            np.arange(0, ngrp * g, g),
        )
        caps = (int(a_grp.max()), int(slab.max()), int(c_grp.max()))
        if supported(b.block_size, a.dtype, *caps, nbc):
            return GroupPlan(
                g, *caps, slab_blocks=int(slab.sum()), pairs=pairs
            )
    return None


def _make_kernel(
    b, g_rows, a_grp_max, slab_max, c_grp_max, nbc, precision,
    ngrp, nbr, out_cap, acc_p, panel_p, wide, cap_a, cap_b,
):
    a_chunk_sizes = [
        1 << k for k in range(max(min(a_grp_max, cap_a).bit_length(), 1))
    ][::-1]
    s_chunk_sizes = [
        1 << k for k in range(max(min(slab_max, cap_b).bit_length(), 1))
    ][::-1]
    flush_sizes = [
        1 << k for k in range(max(min(c_grp_max, out_cap).bit_length(), 1))
    ][::-1]
    mxu_dot = make_mxu_dot(precision)

    def kernel(
        a_row_start_ref,  # SMEM int32[nbr+1]
        a_col_ref,  # SMEM int32[capA]
        b_row_start_ref,  # SMEM int32[nbrB+1]
        b_col_ref,  # SMEM int32[capB]
        c_row_start_ref,  # SMEM int32[nbr+1]
        ccol_ref,  # SMEM int32[out_cap]
        grp_a_start_ref,  # SMEM int32[ngrp+1]
        grp_c_start_ref,  # SMEM int32[ngrp+1]
        slab_lo_ref,  # SMEM int32[ngrp]
        slab_cnt_ref,  # SMEM int32[ngrp]
        a_hbm,  # ANY [capA, b, b]
        b_hbm,  # ANY [capB, b, b]
        o_hbm,  # ANY [out_cap, b, b] f32
        a_buf,  # VMEM [panel_p, a_grp_max, b, b]
        b_slab,  # VMEM [panel_p, slab_max, b, b]
        acc,  # VMEM [acc_p, c_grp_max, b, b] f32
        postable,  # SMEM int32[nbc]
        state,  # SMEM int32[4]
        a_sems,  # DMA [panel_p, len(a_chunk_sizes)]
        s_sems,  # DMA [panel_p, len(s_chunk_sizes)]
        f_sems,  # DMA [acc_p, len(flush_sizes)]
        z_sem,  # DMA []
    ):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            state[0] = 0
            state[1] = 0
            state[2] = 0

        def fetch_chain(sizes, src_hbm, dst_vmem, sems, fpar, lo, cnt,
                        do_start):
            # Pow2 decomposition of a contiguous cnt-block transfer; the
            # chunk of size s starts at offset (cnt & ~(2s-1)).
            for ci, s in enumerate(sizes):
                @pl.when((cnt & s) != 0)
                def _(ci=ci, s=s):
                    off = cnt & ~(2 * s - 1)
                    dma = pltpu.make_async_copy(
                        src_hbm.at[pl.ds(lo + off, s)],
                        dst_vmem.at[fpar, pl.ds(off, s)],
                        sems.at[fpar, ci],
                    )
                    if do_start:
                        dma.start()
                    else:
                        dma.wait()

        def group_op(fpar, gg, do_start):
            a_lo = grp_a_start_ref[gg]
            a_cnt = jnp.minimum(
                grp_a_start_ref[gg + 1] - a_lo, a_grp_max
            )
            fetch_chain(
                a_chunk_sizes, a_hbm, a_buf, a_sems, fpar, a_lo, a_cnt,
                do_start,
            )
            s_cnt = jnp.minimum(slab_cnt_ref[gg], slab_max)
            fetch_chain(
                s_chunk_sizes, b_hbm, b_slab, s_sems, fpar,
                slab_lo_ref[gg], s_cnt, do_start,
            )

        par = jax.lax.rem(gi, panel_p)
        if panel_p == 2:
            @pl.when(gi == 0)
            def _():
                group_op(0, 0, True)

            @pl.when(gi + 1 < ngrp)
            def _():
                group_op(1 - par, gi + 1, True)
        else:
            group_op(0, gi, True)
        group_op(par, gi, False)

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
        slab_lo_g = slab_lo_ref[gi]
        a_grp_lo = grp_a_start_ref[gi]

        @pl.when(c_cnt > 0)
        def _():
            fpar = jax.lax.rem(state[0], acc_p)

            @pl.when(state[1 + fpar] > 0)
            def _():
                flush(fpar, 0, state[1 + fpar], False)
                state[1 + fpar] = 0

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
                        poff = jnp.clip(blo - slab_lo_g, 0, slab_max - 1)
                        bcnt = jnp.minimum(
                            b_row_start_ref[k + 1] - blo, slab_max - poff
                        )

                        if wide:
                            # Panel-wide MXU dots over block-transposed
                            # slab data (see pallas_gemm_rows.py): fixed
                            # 8-panels + pow2 tail, static unroll of the
                            # product's lane slices.
                            def chunk(off, csize):
                                flat = b_slab[
                                    par, pl.ds(poff + off, csize)
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

                        def dotloop(t2, _):
                            prod = mxu_dot(
                                a_buf[par, la],
                                b_slab[par, poff + t2],
                                (((1,), (0,)), ((), ())),
                            )
                            pos = jnp.clip(
                                postable[b_col_ref[blo + t2]],
                                0, c_grp_max - 1,
                            )
                            acc[fpar, pos] += prod
                            return 0

                        jax.lax.fori_loop(0, bcnt, dotloop, 0)
                        return 0

                    jax.lax.fori_loop(0, a_cnt_i, aloop, 0)

                return 0

            jax.lax.fori_loop(0, g_rows, rowloop, 0)

            flush(fpar, c_grp_lo, c_cnt, True)
            state[1 + fpar] = c_cnt
            state[0] = state[0] + 1

        @pl.when(gi == ngrp - 1)
        def _():
            for fp in range(acc_p):
                @pl.when(state[1 + fp] > 0)
                def _(fp=fp):
                    flush(fp, 0, state[1 + fp], False)
                    state[1 + fp] = 0
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
        "slab_max", "c_grp_max", "precision", "interpret", "wide",
    ),
)
def groups_spgemm(
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
    slab_max: int,
    c_grp_max: int,
    precision: str = "highest",
    interpret: bool | None = None,
    wide: bool | None = None,
) -> jax.Array:
    """f32[out_cap, b, b]: same contract as `rows_spgemm` (exact slots
    per `out_ids`, zero-filled tail; garbage-but-in-bounds on undersized
    caps, flagged by the spgemm caller's group_overflow check)."""
    b = a_data.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision == "high" and jnp.dtype(a_data.dtype) != jnp.float32:
        precision = "default"
    a_grp_max = _bucket(a_grp_max)
    slab_max = _bucket(slab_max)
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

    # Group boundaries + per-group B slab extents (device-side mirror of
    # plan_groups; padding blocks carry neutral values for min/max).
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
    slab_lo = jnp.where(
        nonempty, b_row_start[jnp.clip(kmin, 0, nbrB)], 0
    ).astype(jnp.int32)
    slab_cnt = jnp.where(
        nonempty,
        b_row_start[jnp.clip(kmax + 1, 0, nbrB)] - slab_lo,
        0,
    ).astype(jnp.int32)

    tier = _tier(b, a_data.dtype, a_grp_max, slab_max, c_grp_max)
    if tier is None:
        raise ValueError(
            f"group caps ({a_grp_max},{slab_max},{c_grp_max}) exceed VMEM "
            f"at b={b}; use the rows/stream backend"
        )
    acc_p, panel_p = tier
    if wide is None:
        wide = True  # slabs exist to be swept by panel-wide dots
    if wide:
        b_data = jnp.swapaxes(b_data, -1, -2)
    kernel = _make_kernel(
        b, g_rows, a_grp_max, slab_max, c_grp_max, nbc, precision,
        ngrp, nbr, out_cap, acc_p, panel_p, wide,
        a_data.shape[0], b_data.shape[0],
    )
    vma = getattr(jax.typeof(a_data), "vma", frozenset())
    n_a_sizes = max(min(a_grp_max, a_data.shape[0]).bit_length(), 1)
    n_s_sizes = max(min(slab_max, b_data.shape[0]).bit_length(), 1)
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
            pltpu.VMEM((panel_p, a_grp_max, b, b), a_data.dtype),
            pltpu.VMEM((panel_p, slab_max, b, b), b_data.dtype),
            pltpu.VMEM((acc_p, c_grp_max, b, b), jnp.float32),
            pltpu.SMEM((nbc,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((panel_p, n_a_sizes)),
            pltpu.SemaphoreType.DMA((panel_p, n_s_sizes)),
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
        grp_a_start, grp_c_start, slab_lo, slab_cnt,
        a_data, b_data,
    )
    return out
