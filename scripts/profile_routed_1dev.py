"""Decompose the routed 1-device-mesh overhead (VERDICT r3 item 2:
frozen-routed should be <= 1.2x planned local; BENCH_r04 measured
1.81x).  Components, timed in ONE process on B2's structure:

  local        — planned local spgemm (the 1.21 ms baseline)
  local+accum  — the same multiply through the fused-accumulate path
                 with an EMPTY accumulator (what stage 0 of the routed
                 chain runs, minus shard_map): isolates the union
                 gather-add pass
  pack         — the stage panel gather alone (where+take of the send
                 panel): isolates the exchange-side copy
  routed       — the full frozen routed stage (shard_map, stats psums)

Run on the real TPU:  python scripts/profile_routed_1dev.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.core.block_matrix import SENTINEL
from hierarchical_block_sparse_lib_tpu.ops.spgemm import (
    make_plan,
    plan_spgemm_ex,
    spgemm,
)
from hierarchical_block_sparse_lib_tpu.parallel import dist, route

PRECISION = "highest"

if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    A = bench.random_block_matrix(16384, 128, 0.05, seed=2)
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    print(f"B2: blocks={int(A.nnz)} pairs={pc} out={oc}")

    res = {}

    # --- local: the bench's planned-local baseline.
    plan_l = jax.block_until_ready(make_plan(A, A, pc))

    def b_local(d):
        m = dataclasses.replace(A, data=d)
        C, _ = spgemm(m, m, pair_cap=pc, out_cap=oc,
                      row_caps=(mbr, mcr), precision=PRECISION,
                      plan=plan_l)
        return C.data

    res["local"] = bench.bench_chained(b_local, A.data, Ks=(5, 45))

    # --- local+accum: fused accumulate with an EMPTY accumulator at
    # the same union capacity (stage 0 of the routed chain).
    acc_ids = jnp.full((oc,), SENTINEL, jnp.int32)
    plan_a = jax.block_until_ready(
        make_plan(A, A, pc, accum_ids=acc_ids, out_cap=oc)
    )

    from hierarchical_block_sparse_lib_tpu.core import assembly

    acc0 = assembly.empty(A.n_rows, A.n_cols, A.block_size, oc,
                          dtype=A.dtype)

    def b_accum(d):
        m = dataclasses.replace(A, data=d)
        C, _ = spgemm(m, m, pair_cap=pc, out_cap=oc,
                      row_caps=(mbr, mcr), precision=PRECISION,
                      plan=plan_a, accum=acc0, beta=1.0)
        return C.data

    res["local+accum"] = bench.bench_chained(b_accum, A.data, Ks=(5, 45))

    # --- pack: the stage panel gather alone.
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("p",))
    Ad = dist.distribute(A, mesh1)
    rplan = route.plan_route(Ad, Ad, 1)
    frozen = route.freeze_route_plan(Ad, Ad, rplan)
    sidx = jnp.asarray(np.asarray(rplan.send_idx[0][0]))
    bl_ids = Ad.ids[0]
    print(f"send panel: {int((np.asarray(sidx) >= 0).sum())} of "
          f"{int(A.nnz)} blocks "
          f"(passthrough={bool((np.asarray(sidx) == np.arange(len(np.asarray(sidx)))).all())})")

    def b_pack(d):
        valid = sidx >= 0
        safe = jnp.maximum(sidx, 0)
        ids_s = jnp.where(valid, bl_ids[safe], SENTINEL)
        data_s = jnp.where(valid[:, None, None], d[0][safe], 0)
        return data_s + ids_s[:, None, None].astype(d.dtype) * 0

    res["pack"] = bench.bench_chained(b_pack, Ad.data, Ks=(5, 45))

    # --- routed: the full frozen routed stage.
    def b_routed(d):
        m = dataclasses.replace(Ad, data=d)
        C, _ = route.dist_spgemm_routed(m, m, mesh1, frozen,
                                        precision=PRECISION)
        return C.data

    res["routed"] = bench.bench_chained(b_routed, Ad.data, Ks=(5, 45))

    # --- later-stage accumulate A/B (VERDICT r4 item 4): the generic
    # union gather-add vs the round-5 in-kernel ALIGNED accumulate.  A
    # 1-device mesh keeps only one stage, so the >= 2-kept-stage
    # regime is reproduced here as its local equivalent: a planned
    # multiply accumulating into a NON-EMPTY union-structured C (what
    # every later routed stage runs).
    C0, _ = spgemm(A, A, pair_cap=pc, out_cap=oc, row_caps=(mbr, mcr),
                   precision=PRECISION, plan=plan_l)
    rngd = np.random.default_rng(7)
    D = dataclasses.replace(
        C0,
        data=jnp.where(
            C0.valid_mask()[:, None, None],
            jnp.asarray(
                rngd.standard_normal(
                    (oc, A.block_size, A.block_size)
                ).astype(np.float32)
            ),
            0.0,
        ),
    )
    plan_u = jax.block_until_ready(
        make_plan(A, A, pc, accum_ids=D.ids, out_cap=oc)
    )

    # Chain over the ACCUMULATOR data; A's payload is sliced from the
    # same chained buffer (same shapes/FLOPs — a big closure constant
    # either exceeds the remote-compile body limit or crashes the TPU
    # compiler's constant-folding scatter emitter).
    capA = A.cap

    # NOTE: a chained NON-EMPTY generic gather-add arm reproducibly
    # crashes the XLA:TPU compiler here ("scatter_emitter.cc:2824
    # Check failed: operand_indices.size() == 1 (2 vs. 1)" — a fused
    # variadic scatter the emitter can't handle), with or without
    # closure constants.  The gather-add's COST is value-independent,
    # so the already-measured local+accum row (empty accumulator, same
    # union capacity, same gather+add program) stands in for the
    # later-stage gather-add term.
    def b_acc_aligned(dacc):
        m = dataclasses.replace(A, data=dacc[:capA])
        Dm = dataclasses.replace(D, data=dacc)
        # plan_u carries acc_ids: the aligned membership check is two
        # id compares (the planless path pays a per-call searchsorted).
        C, _ = spgemm(m, m, pair_cap=pc, out_cap=oc,
                      row_caps=(mbr, mcr), precision=PRECISION,
                      plan=plan_u, accum=Dm, accum_aligned=True)
        return C.data

    res["stage+aligned"] = bench.bench_chained(
        b_acc_aligned, D.data, Ks=(5, 45)
    )

    # Control: the PLAIN local multiply under the same chain structure
    # (carry = union-sized buffer, A sliced from it) — isolates the
    # chain-plumbing overhead from the aligned kernel's own cost.
    def b_local_chainD(dacc):
        m = dataclasses.replace(A, data=dacc[:capA])
        C, _ = spgemm(m, m, pair_cap=pc, out_cap=oc,
                      row_caps=(mbr, mcr), precision=PRECISION,
                      plan=plan_l)
        return C.data

    res["local(chainD)"] = bench.bench_chained(
        b_local_chainD, D.data, Ks=(5, 45)
    )

    base = res["local"]
    for k, v in res.items():
        print(f"{k:12s}: {v*1e3:7.3f} ms  ({v/base:.2f}x local)")
    print(
        f"LATER-STAGE accumulate: gather-add adds "
        f"{1e3*(res['local+accum']-base):.3f} ms over local "
        f"(empty-acc stand-in, value-independent); in-kernel aligned "
        f"adds {1e3*(res['stage+aligned']-res['local(chainD)']):.3f} ms "
        f"over ITS chain baseline (local(chainD) corrects for the "
        f"union-sized carry + slice plumbing of this measurement "
        f"harness, which alone adds "
        f"{1e3*(res['local(chainD)']-base):.3f} ms)"
    )
    # Since the round-4 fix, stage 0 of the routed chain skips the
    # accumulate (accum=None on the first kept stage), so on a 1-device
    # mesh "routed" should sit near local+pack+shard_map — the
    # local+accum row shows what every LATER stage still pays.
    print(
        f"decomposition: accum-pass(later stages)="
        f"{1e3*(res['local+accum']-base):.3f} ms"
        f"  pack={1e3*res['pack']:.3f} ms"
        f"  routed-overhead(1dev)={1e3*(res['routed']-base):.3f} ms"
    )
