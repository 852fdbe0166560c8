"""Component-cost attribution for the configured-B2 fine-leaf (b=32)
numeric phase (VERDICT r4 item 1: the headline runs on the XLA
gather+dot_general+segment-sum fallback at 33-39 ns/pair planned vs a
~6.4 ns/pair MXU floor — where does the time actually go, and what
rate does the candidate per-k outer-product formulation achieve?).

Stages measured (chained-differential, one process):

  full     the current planned spgemm(backend='xla') — reference point
  gather   pa = a.data[a_idx] (one operand side)
  dot      batched [P,32,32]@[P,32,32] dot_general (the tiny-GEMM rate)
  scatter  zeros[out_cap].at[seg].add(prod) (the segment accumulate)
  griddot  per-k all-pairs outer product: for every contraction column
           k, dot(A(:,k)^T panel, B(k,:) panel) contracting the 32
           k-rows -> [32*na, 32*nb] grid whose every 32x32 sub-block is
           a REAL fine pair product (zero FLOP inflation up to panel
           padding).  Batched over k with bucketed static caps — the
           MXU rate available at K=32.
  extract  gather [pairs,32,32] sub-blocks out of the k-grids (the
           phase-2 repack the grid formulation needs before a segment
           accumulate).

Also prints the structure stats that size any fine-leaf kernel:
per-k panel widths (na, nb), per-fine-row occupancy, contribution
depth histogram of the output support.

Run on the real TPU:  python scripts/profile_fine32.py [--n 16384]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.core.block_matrix import SENTINEL
from hierarchical_block_sparse_lib_tpu.ops.spgemm import (
    plan_spgemm_ex,
    spgemm_symbolic,
)

log = bench.log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--density", type=float, default=0.05)
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()
    bf = 32
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[args.precision]

    log(f"backend: {jax.default_backend()}")
    A = bench.random_block_matrix(args.n, bf, args.density, seed=2)
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    hon = 2 * bf**3 * pc

    def gf(dt):
        return f"t={dt*1e3:8.2f} ms  honest={hon/dt/1e9:7.1f} GFLOP/s ({1e9*dt/pc:5.1f} ns/pair)"

    # ---- structure stats (host) -----------------------------------------
    ids = np.asarray(A.ids, np.int64)
    nb = A.nb_cols
    row, col = ids // nb, ids % nb
    na_k = np.bincount(col, minlength=nb)  # A blocks per contraction col
    nb_k = np.bincount(row, minlength=nb)  # B blocks per row (B = A here)
    pairs_k = na_k * nb_k
    assert pairs_k.sum() == pc, (pairs_k.sum(), pc)
    log(
        f"structure: nnz={ids.size} nb={nb} pairs={pc} out={oc} "
        f"(C density {oc/nb/nb:.1%})"
    )
    log(
        f"per-k panels: na mean={na_k.mean():.1f} max={na_k.max()} "
        f"nb mean={nb_k.mean():.1f} max={nb_k.max()}"
    )
    # Contribution depth histogram of the output support.
    a_idx, b_idx, c_id, total, _ = jax.block_until_ready(
        spgemm_symbolic(A, A, pc)
    )
    cid = np.asarray(c_id)
    cid = cid[cid != int(SENTINEL)]
    _, counts = np.unique(cid, return_counts=True)
    hist = np.bincount(counts)
    log(
        f"output contribution depth: mean={counts.mean():.2f} "
        f"max={counts.max()} hist[1..8]={hist[1:9].tolist()}"
    )

    # ---- full current path ----------------------------------------------
    import dataclasses

    plan = jax.block_until_ready(hbsm.make_plan(A, A, pc))

    def build_full(d):
        m = dataclasses.replace(A, data=d)
        C, _ = hbsm.spgemm(
            m, m, pair_cap=pc, out_cap=oc, precision=args.precision,
            plan=plan, backend="xla",
        )
        return C.data

    # K-span sensitivity: round-4 recorded 11-15 ms planned from (1,3)
    # spans while a (1,4) span measured ~44 ms — pin which is real.
    for ks in ((1, 3), (1, 4), (2, 8)):
        dt = bench.bench_chained(build_full, A.data, Ks=ks, reps=2)
        log(f"full planned xla K={ks}: {gf(dt)}")

    # ---- components ------------------------------------------------------
    # NOTE (first run's lesson): [*, 32, 32] f32 arrays live TILE-PADDED
    # on TPU — the (8,128) tiled layout pads the 32-lane dim to 128, a
    # 4.0x memory AND bandwidth expansion (measured: OOM with "Extra
    # memory due to padding: (4.0x expansion)").  Components therefore
    # run on pair SUBSETS; rates scale linearly in the pair count.
    SUB = 1 << 16
    ai = jnp.asarray(np.asarray(a_idx)[:SUB])
    bi = jnp.asarray(np.asarray(b_idx)[:SUB])
    # seg as spgemm builds it.
    cids = np.asarray(c_id)
    first = np.concatenate([[True], cids[1:] != cids[:-1]])
    seg_np = np.cumsum(first) - 1
    seg_np = np.where(cids != int(SENTINEL), seg_np, oc)
    seg = jnp.asarray(seg_np[:SUB].astype(np.int32))
    scale = pc / SUB

    def gfs(dt):
        dt = dt * scale  # extrapolate subset -> full pair count
        return (
            f"t={dt*1e3:8.2f} ms* honest={hon/dt/1e9:7.1f} GFLOP/s "
            f"({1e9*dt/pc:5.1f} ns/pair)"
        )

    def build_gather(d):
        return d[ai]

    dtg = bench.bench_chained(build_gather, A.data, Ks=(2, 16), reps=2)
    log(
        f"gather (one side)    : {gfs(dtg)}  "
        f"[{SUB*bf*bf*4/dtg/1e9:.0f} GB/s unpadded]"
    )

    pa = jax.block_until_ready(A.data[ai])
    pb = jax.block_until_ready(A.data[bi])
    pair_ops = jnp.stack([pa, pb])

    def build_dot(x):
        return jax.lax.dot_general(
            x[0], x[1],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    dtd = bench.bench_chained(build_dot, pair_ops, Ks=(2, 16), reps=2)
    log(f"batched tiny dot     : {gfs(dtd)}")

    prod = jax.block_until_ready(build_dot(pair_ops))

    def build_scatter(pr):
        return (
            jnp.zeros((oc, bf, bf), jnp.float32)
            .at[seg]
            .add(pr, mode="drop")
        )

    dts = bench.bench_chained(build_scatter, prod, Ks=(2, 16), reps=2)
    log(f"scatter seg-add      : {gfs(dts)}")

    # Gather-extract from per-k grids (phase 2 of the grid formulation):
    # synthetic grid of the right volume; indices = real (k, r, c).
    NAC = int(4 * np.ceil(max(na_k.max(), nb_k.max()) / 4))
    NBC = NAC  # equal caps so the two panel stacks can be jnp.stack'd
    log(f"grid caps: NA={NAC} NB={NBC} (pad inflation "
        f"{nb*NAC*NBC/pairs_k.sum():.2f}x)")
    # Per-pair grid coordinates from the REAL pair lists.
    a_off = np.zeros(ids.size, np.int64)
    b_off = np.zeros(ids.size, np.int64)
    # rank of each block within its column (A side) / row (B side).
    order_a = np.argsort(col, kind="stable")
    ranks = np.empty(ids.size, np.int64)
    start = np.concatenate([[0], np.cumsum(na_k)[:-1]])
    ranks[order_a] = np.arange(ids.size) - start[col[order_a]]
    a_off = ranks
    order_b = np.argsort(row, kind="stable")
    ranksb = np.empty(ids.size, np.int64)
    startb = np.concatenate([[0], np.cumsum(nb_k)[:-1]])
    ranksb[order_b] = np.arange(ids.size) - startb[row[order_b]]
    b_off = ranksb
    ai_np = np.asarray(a_idx)
    bi_np = np.asarray(b_idx)
    kk = np.where(cids != int(SENTINEL), col[ai_np], 0).astype(np.int32)
    rr = (a_off[ai_np] * bf).astype(np.int32)
    cc = (b_off[bi_np] * bf).astype(np.int32)
    kk_j = jnp.asarray(kk[:SUB])
    rr_j = jnp.asarray(rr[:SUB])
    cc_j = jnp.asarray(cc[:SUB])
    grid = jax.block_until_ready(
        jax.random.normal(jax.random.key(0), (nb, NAC * bf, NBC * bf))
        * 1e-3
    )
    log(f"grid volume: {grid.size*4/1e9:.2f} GB")
    r32 = jnp.arange(bf, dtype=jnp.int32)

    def build_extract(g):
        # [pairs, 32, 32] advanced-indexing gather out of the grids.
        return g[
            kk_j[:, None, None],
            (rr_j[:, None] + r32[None, :])[:, :, None],
            (cc_j[:, None] + r32[None, :])[:, None, :],
        ]

    dte = bench.bench_chained(build_extract, grid, Ks=(1, 4), reps=2)
    log(
        f"extract pairs/grid   : {gfs(dte)}  "
        f"[{SUB*bf*bf*4/dte/1e9:.0f} GB/s unpadded]"
    )

    # The K=32 grid dot rate: batched over k, bucketed caps.  Panels are
    # dense-packed per k (aT: [32, NAC*32]; b: [32, NBC*32]).
    aT = np.zeros((nb, bf, NAC * bf), np.float32)
    bP = np.zeros((nb, bf, NBC * bf), np.float32)
    Ad = np.asarray(A.data)
    for e in range(ids.size):
        k = col[e]
        aT[k, :, a_off[e] * bf:(a_off[e] + 1) * bf] = Ad[e].T
        k2 = row[e]
        bP[k2, :, b_off[e] * bf:(b_off[e] + 1) * bf] = Ad[e]
    panels = jnp.stack([jnp.asarray(aT), jnp.asarray(bP)])
    hw_flops = 2 * nb * (NAC * bf) * bf * (NBC * bf)

    def build_grid(x):
        return jax.lax.dot_general(
            x[0], x[1],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    dtgd = bench.bench_chained(build_grid, panels, Ks=(1, 4), reps=2)
    log(
        f"grid dot (K=32, pad) : {gf(dtgd)}  "
        f"[hw {hw_flops/dtgd/1e12:.1f} TF/s at K=32]"
    )

    log("---- roofline notes (subset-scaled) ----")
    log(
        f"sum(gather*2+dot+scatter) = "
        f"{(2*dtg+dtd+dts)*scale*1e3:.2f} ms vs full {dt*1e3:.2f} ms"
    )
    log(
        f"griddot+extract+scatter = "
        f"{(dtgd + (dte+dts)*scale)*1e3:.2f} ms "
        f"(if the grid path were assembled from these XLA pieces)"
    )


if __name__ == "__main__":
    main()
