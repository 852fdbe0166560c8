"""Two-level (host x chip) sparsity-aware block routing.

SURVEY.md section 6.8 mandates the ICI/DCN hierarchy: "ICI within a
host/slice, DCN across hosts" (BASELINE.json:5's multi-host target;
VERDICT r2 item 3).  The flat router (`parallel.route`) treats the mesh
as one axis, so a B panel needed by k chips of a remote host crosses
the slow DCN k times.  This module factors the mesh as
``Mesh(devices.reshape(H, C), ("host", "chip"))`` and routes in two
levels:

- **DCN level**: for host-stage ht, each source chip s packs ONE share
  per destination host — the subset of its B blocks needed by ANY chip
  of host (host(s) - ht) mod H — and a single `ppermute` over the
  "host" axis ships it.  Every block crosses DCN at most once per
  destination host (union semantics), instead of once per requesting
  chip.
- **ICI level**: an `all_gather` over the "chip" axis replicates the
  H-local shares intra-host, where links are ~10x faster.

The local compute structure is IDENTICAL to the flat router's (one
exact-capacity SpGEMM per (host-stage, source chip) against that chip's
share, fused into the union accumulator), so all the per-stage
exactness — pair/out/row caps from the host planner, row-panel kernel
dispatch, software-pipelined exchange one host-stage ahead of the MXU
batches — carries over unchanged.  Shares arrive SORTED with SENTINEL
padding last because chips own ascending block-row ranges and each
share preserves its source's id order.

Traffic accounting (block copies): `dcn_blocks` (two-level) vs
`dcn_blocks_flat` (what the flat plan ships across host boundaries) vs
`blocks_ring` (the dense ring).  dcn_blocks <= dcn_blocks_flat always —
equality only when no remote panel is shared between sibling chips.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from hierarchical_block_sparse_lib_tpu.core.block_matrix import (
    SENTINEL,
    BlockMatrix,
)
from hierarchical_block_sparse_lib_tpu.core import assembly
from hierarchical_block_sparse_lib_tpu.ops import basic
from hierarchical_block_sparse_lib_tpu.ops.spgemm import spgemm
from hierarchical_block_sparse_lib_tpu.runtime import native


@dataclass(frozen=True)
class Route2Plan:
    """Host-side exact two-level routing plan (reusable while both
    operands keep their id structure, like `route.RoutePlan`)."""

    n_hosts: int
    n_chips: int
    # Host-ring offsets actually carrying traffic, ascending (0 = the
    # intra-host stage: no DCN, ICI all_gather only).
    stages: tuple
    # Per kept stage: int32[P, share_cap_t] local B indices each source
    # chip sends toward host (host(src) - ht) mod H; -1 padding last.
    send_idx: tuple
    # Per kept stage, per source-chip slot cc in [0, C): exact
    # max-over-destinations (pair, out) caps and (max_b_row, max_c_row)
    # for the local multiply against that share — (ht, cc) multiplies
    # with zero pairs everywhere are dropped (None entry).
    stage_caps: tuple  # tuple[tuple[None | (pc, oc, mbr, mcr), ...], ...]
    out_cap: int
    # Max blocks in any row of the final per-device union (c-side row
    # cap for the fused per-share accumulate; see route.RoutePlan).
    union_c_row_max: int
    total_pairs: int
    per_device_pairs: tuple
    # Traffic evidence (block copies of b*b elements).
    dcn_blocks: int  # two-level: every share crosses DCN once
    dcn_blocks_flat: int  # the flat plan's inter-host block copies
    ici_blocks: int  # copies received over intra-host all_gathers
    blocks_ring: int  # dense ring baseline: (P-1) * nnz(B)
    per_stage_blocks: tuple

    def summary(self) -> str:
        return (
            f"route2 plan: {self.n_hosts}x{self.n_chips} stages="
            f"{list(self.stages)}, DCN {self.dcn_blocks} blocks vs flat "
            f"{self.dcn_blocks_flat} "
            f"({self.dcn_blocks / max(1, self.dcn_blocks_flat):.1%}), "
            f"ICI {self.ici_blocks}, ring {self.blocks_ring}"
        )


def plan_route_2level(
    a: BlockMatrix, b: BlockMatrix, n_hosts: int, n_chips: int
) -> Route2Plan:
    """Build the exact two-level plan from DISTRIBUTED ids
    ([P, cap_local] with P = n_hosts * n_chips, host-major device
    order — the layout of `dist.distribute` over the flattened mesh)."""
    H, C = n_hosts, n_chips
    P_ = H * C
    a_ids = np.asarray(a.ids)
    b_ids = np.asarray(b.ids)
    assert a_ids.ndim == 2 and a_ids.shape[0] == P_, a_ids.shape
    a_nbc = a.nb_cols
    b_nbc = b.nb_cols
    sent = int(SENTINEL)

    # Membership bitmaps (see route.plan_route: O(nnz) lookups instead
    # of per-pair np.isin; the P^2 C++ planner calls dominate).
    need_mask = np.zeros((P_, b.nb_rows), bool)
    for d in range(P_):
        ids = a_ids[d][a_ids[d] != sent]
        need_mask[d, np.unique(ids % a_nbc)] = True
    need_mask_host = np.stack(
        [need_mask[h * C:(h + 1) * C].any(axis=0) for h in range(H)]
    )
    b_rows_local = [
        (b_ids[s][b_ids[s] != sent] // b_nbc) for s in range(P_)
    ]

    # Flat-plan DCN baseline: block copies crossing a host boundary in
    # the flat router (each dst chip gets its own copy).
    dcn_flat = 0
    for t in range(P_):
        for s in range(P_):
            d = (s - t) % P_
            if d // C != s // C:
                dcn_flat += int(need_mask[d, b_rows_local[s]].sum())

    # Two-level shares: raw[ht][s] = local indices s sends toward host
    # (host(s) - ht) mod H.
    raw = [[None] * P_ for _ in range(H)]
    stage_sizes = np.zeros(H, np.int64)
    for ht in range(H):
        for s in range(P_):
            hd = (s // C - ht) % H
            sel = need_mask_host[hd, b_rows_local[s]]
            idx = np.nonzero(sel)[0].astype(np.int32)
            raw[ht][s] = idx
            stage_sizes[ht] += idx.size

    stages = [ht for ht in range(H) if stage_sizes[ht] > 0]

    send_idx = []
    stage_caps = []
    per_stage_blocks = []
    per_dev_pairs = np.zeros(P_, np.int64)
    dcn_blocks = 0
    ici_blocks = 0
    for ht in stages:
        cap_t = max(max(raw[ht][s].size for s in range(P_)), 1)
        sidx = np.full((P_, cap_t), -1, np.int32)
        for s in range(P_):
            idx = raw[ht][s]
            sidx[s, : idx.size] = idx
            if ht != 0:
                dcn_blocks += int(idx.size)
            # all_gather hands each of the other C-1 siblings a copy.
            ici_blocks += (C - 1) * int(idx.size)
        send_idx.append(sidx)
        per_stage_blocks.append(int(stage_sizes[ht]))
        # Exact caps per (ht, source-chip slot): dst chip d multiplies
        # against the share packed by chip cc of host (host(d)+ht)%H.
        caps_t = []
        for cc in range(C):
            pc_t = oc_t = br_t = cr_t = 0
            any_pairs = False
            for d in range(P_):
                hs = (d // C + ht) % H
                s = hs * C + cc
                idx = raw[ht][s]
                sub_ids = (
                    b_ids[s][idx] if idx.size else np.empty(0, np.int32)
                )
                np_pairs, np_out, mbr, mcr = native.plan_spgemm_ex(
                    a_ids[d], sub_ids, a_nbc, b.nb_rows, b_nbc
                )
                pc_t = max(pc_t, np_pairs)
                oc_t = max(oc_t, np_out)
                br_t = max(br_t, mbr)
                cr_t = max(cr_t, mcr)
                per_dev_pairs[d] += np_pairs
                any_pairs = any_pairs or np_pairs > 0
            caps_t.append(
                (max(pc_t, 1), max(oc_t, 1), max(br_t, 1), max(cr_t, 1))
                if any_pairs
                else None
            )
        stage_caps.append(tuple(caps_t))

    # Exact output capacity: union of everything each device receives.
    out_cap = 1
    union_cr = 1
    for d in range(P_):
        recv_ids = []
        for ht in stages:
            hs = (d // C + ht) % H
            for cc in range(C):
                s = hs * C + cc
                idx = raw[ht][s]
                if idx.size:
                    recv_ids.append(b_ids[s][idx])
        allb = (
            np.sort(np.concatenate(recv_ids))
            if recv_ids
            else np.empty(0, np.int32)
        )
        _, n_out, _, u_cr = native.plan_spgemm_ex(
            a_ids[d], allb, a_nbc, b.nb_rows, b_nbc
        )
        out_cap = max(out_cap, n_out)
        union_cr = max(union_cr, u_cr)

    nnz_b = int((b_ids != sent).sum())
    return Route2Plan(
        n_hosts=H,
        n_chips=C,
        stages=tuple(stages),
        send_idx=tuple(send_idx),
        stage_caps=tuple(stage_caps),
        out_cap=int(out_cap),
        union_c_row_max=int(union_cr),
        total_pairs=int(per_dev_pairs.sum()),
        per_device_pairs=tuple(int(x) for x in per_dev_pairs),
        dcn_blocks=int(dcn_blocks),
        dcn_blocks_flat=int(dcn_flat),
        ici_blocks=int(ici_blocks),
        blocks_ring=int((P_ - 1) * nnz_b),
        per_stage_blocks=tuple(per_stage_blocks),
    )


def make_mesh_2level(n_hosts: int, n_chips: int) -> Mesh:
    """("host", "chip") mesh over the first n_hosts*n_chips devices,
    host-major (chip = fastest-varying = the ICI-adjacent axis on real
    slices)."""
    devs = np.asarray(jax.devices()[: n_hosts * n_chips]).reshape(
        n_hosts, n_chips
    )
    return Mesh(devs, ("host", "chip"))


def dist_spgemm_2level(
    a: BlockMatrix,
    b: BlockMatrix,
    mesh: Mesh,
    plan: Route2Plan,
    alpha=1.0,
    host_axis: str = "host",
    chip_axis: str = "chip",
    backend: str = "auto",
    precision: str = "highest",
    out_cap: int | None = None,
):
    """Distributed C = alpha * A @ B over the two-level exchange.

    Inputs distributed as [P, cap_local] over the FLATTENED
    (host, chip) mesh (host-major, matching `dist.distribute` on the
    flat device list).  Returns (C distributed, stats dict) with the
    per-level traffic evidence.
    """
    H, C_ = plan.n_hosts, plan.n_chips
    assert mesh.shape[host_axis] == H and mesh.shape[chip_axis] == C_
    out_cap = plan.out_cap if out_cap is None else out_cap
    stages = list(plan.stages)
    n_stages = len(stages)
    both = (host_axis, chip_axis)
    send_dev = [
        jax.device_put(
            np.asarray(s).reshape(H, C_, -1),
            jax.sharding.NamedSharding(mesh, P(host_axis, chip_axis)),
        )
        for s in plan.send_idx
    ]

    def body(a_l, b_l, *send_l):
        a_loc = dataclasses.replace(
            a_l, ids=a_l.ids[0, 0], data=a_l.data[0, 0], nnz=a_l.nnz[0, 0]
        )
        b_loc = dataclasses.replace(
            b_l, ids=b_l.ids[0, 0], data=b_l.data[0, 0], nnz=b_l.nnz[0, 0]
        )

        def exchange(si, k):
            """Pack my share for host-stage k; DCN ppermute over the
            host axis (ht > 0), then ICI all_gather over the chip axis.
            Returns ([C, cap] ids, [C, cap, b, b] data): every sibling
            share of the source host, sorted within each share."""
            idx = si[0, 0]
            valid = idx >= 0
            safe = jnp.maximum(idx, 0)
            ids_s = jnp.where(valid, b_loc.ids[safe], SENTINEL).astype(
                jnp.int32
            )
            data_s = jnp.where(valid[:, None, None], b_loc.data[safe], 0)
            ht = stages[k]
            if ht != 0:
                perm = [(hs, (hs - ht) % H) for hs in range(H)]
                ids_s = jax.lax.ppermute(ids_s, host_axis, perm)
                data_s = jax.lax.ppermute(data_s, host_axis, perm)
            return (
                jax.lax.all_gather(ids_s, chip_axis),
                jax.lax.all_gather(data_s, chip_axis),
            )

        c = assembly.empty(
            a_loc.n_rows, b_loc.n_cols, a_loc.block_size, out_cap,
            dtype=a_loc.dtype,
        )
        _vary = lambda v: jax.lax.pcast(v, both, to="varying")  # noqa: E731
        c = jax.tree.map(_vary, c)
        pairs = _vary(jnp.zeros((), jnp.int32))
        ovf = _vary(jnp.zeros((), bool))

        # Software pipeline: issue exchange k+1 (DCN + ICI) before the
        # C_ local multiplies of stage k, so the slow hop hides behind
        # a whole host-stage of MXU batches.
        recv = exchange(send_l[0], 0)
        for k in range(n_stages):
            nxt = (
                exchange(send_l[k + 1], k + 1)
                if k + 1 < n_stages
                else None
            )
            ids_g, data_g = recv
            for cc in range(C_):
                caps = plan.stage_caps[k][cc]
                if caps is None:
                    continue  # zero pairs for every destination
                pc, oc, mbr, mcr = caps
                share = BlockMatrix(
                    ids=ids_g[cc],
                    data=data_g[cc],
                    nnz=jnp.sum(ids_g[cc] != SENTINEL).astype(jnp.int32),
                    n_rows=b_loc.n_rows,
                    n_cols=b_loc.n_cols,
                    block_size=b_loc.block_size,
                )
                # Fused accumulate at the union capacity (round 3;
                # see route._routed_stages): one pass per share instead
                # of multiply + sort-based union add.
                c, info = spgemm(
                    a_loc,
                    share,
                    pair_cap=pc,
                    out_cap=out_cap,
                    row_caps=(mbr, plan.union_c_row_max),
                    backend=backend,
                    precision=precision,
                    accum=c,
                    beta=1.0,
                )
                pairs = pairs + info.n_block_pairs
                ovf = (
                    ovf | info.pair_overflow | info.out_overflow
                    | info.row_overflow
                )
            recv = nxt
        c = basic.scale(c, jnp.asarray(alpha, c.dtype))
        total = jax.lax.psum(jax.lax.psum(pairs, host_axis), chip_axis)
        any_ovf = (
            jax.lax.pmax(
                jax.lax.pmax(ovf.astype(jnp.int32), host_axis), chip_axis
            )
            > 0
        )
        expand = lambda x: x[None, None]  # noqa: E731
        return (
            jax.tree.map(expand, c),
            expand(pairs),
            expand(total),
            expand(any_ovf),
        )

    def mk_spec(m):
        sp = P(host_axis, chip_axis)
        return BlockMatrix(
            ids=sp, data=sp, nnz=sp,
            n_rows=m.n_rows, n_cols=m.n_cols, block_size=m.block_size,
        )

    # Reshape the flat [P, ...] distribution to [H, C, ...].
    def to2(m):
        return dataclasses.replace(
            m,
            ids=m.ids.reshape(H, C_, *m.ids.shape[1:]),
            data=m.data.reshape(H, C_, *m.data.shape[1:]),
            nnz=m.nnz.reshape(H, C_),
        )

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(mk_spec(a), mk_spec(b))
        + (P(host_axis, chip_axis),) * n_stages,
        out_specs=(
            dataclasses.replace(
                mk_spec(a), n_rows=a.n_rows, n_cols=b.n_cols
            ),
            P(host_axis, chip_axis),
            P(host_axis, chip_axis),
            P(host_axis, chip_axis),
        ),
        check_vma=False,
    )
    c2, dev_pairs, total, ovf = f(to2(a), to2(b), *send_dev)
    c = dataclasses.replace(
        c2,
        ids=c2.ids.reshape(H * C_, *c2.ids.shape[2:]),
        data=c2.data.reshape(H * C_, *c2.data.shape[2:]),
        nnz=c2.nnz.reshape(H * C_),
    )
    stats = dict(
        n_block_pairs=total.ravel()[0],
        per_device_pairs=dev_pairs.ravel(),
        overflow=ovf.any(),
        dcn_blocks=plan.dcn_blocks,
        dcn_blocks_flat=plan.dcn_blocks_flat,
        ici_blocks=plan.ici_blocks,
        blocks_ring=plan.blocks_ring,
        n_stages=n_stages,
    )
    return c, stats
