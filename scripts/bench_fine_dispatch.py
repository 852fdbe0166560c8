"""Fine-leaf multiply dispatch A/B: what should `matmul` do when the
operands' block size is a reference-style fine leaf (16/32) rather
than an MXU tile?

Paths, timed in ONE process on the configured B2 structure (16384^2,
5% density at leaf 32; BASELINE.json:8):

  direct   — spgemm at the matrix's own b=32 granularity (what
             matmul/api.multiply run today): ~336k fine pairs, MXU
             output tiles 1/16 used, per-pair descriptor costs
  coarsen  — coarsen(f=4) to 128 tiles + spgemm at 128 (the r1-r3
             answer): ~648k tile pairs, 123x tile-pair inflation
  kpack    — plan_kpack + kpack_spgemm (packed contraction; the
             round-4 occupancy path): measured 3.8x over coarsen

The winner's gate goes into ops/matmul.py.

HISTORICAL CAVEAT (round 5): this script's round-4 numbers (44/64/252
ms) were measured with K=(1,3)/(1,4) spans, which the K=1
dispatch-constant anomaly makes 3-8x optimistic in absolute terms
(scripts/profile_fine32b.py); the ORDERING it established
(direct > kpack > coarsen) was confirmed under the corrected
protocol, and the direct path is now the fine BD kernel
(scripts/bench_b32_backend.py is the current A/B of record).

Run on the real TPU:  python scripts/bench_fine_dispatch.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np

import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.ops.kpack import (
    kpack_spgemm,
    plan_kpack,
)
from hierarchical_block_sparse_lib_tpu.ops.repack import plan_coarsen
from hierarchical_block_sparse_lib_tpu.ops.spgemm import (
    plan_spgemm_ex,
    spgemm,
)

PRECISION = "highest"

if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    n, bf = 16384, 32
    A = bench.random_block_matrix(n, bf, 0.05, seed=2)
    res = {}

    # --- direct at b=32.
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    print(f"direct b=32: pairs={pc} out={oc} row_caps=({mbr},{mcr})")

    def b_direct(d):
        m = dataclasses.replace(A, data=d)
        C, _ = spgemm(m, m, pair_cap=pc, out_cap=oc,
                      row_caps=(mbr, mcr), precision=PRECISION)
        return C.data

    res["direct"] = bench.bench_chained(b_direct, A.data, Ks=(1, 3), reps=2)

    # --- coarsen to 128 + spgemm.
    Ac = hbsm.coarsen(A, 4, cap=plan_coarsen(A, 4))
    pcc, occ_, mbrc, mcrc = plan_spgemm_ex(Ac, Ac)
    print(f"coarsen 128: pairs={pcc} out={occ_}")

    def b_coarse(d):
        m = dataclasses.replace(A, data=d)
        mc = hbsm.coarsen(m, 4, cap=Ac.cap)
        C, _ = spgemm(mc, mc, pair_cap=pcc, out_cap=occ_,
                      row_caps=(mbrc, mcrc), precision=PRECISION)
        return C.data

    res["coarsen"] = bench.bench_chained(b_coarse, A.data, Ks=(1, 3),
                                         reps=2)

    # --- kpack.
    kplan = plan_kpack(A, A, tile=128, n_groups=32)
    print(f"kpack: tiles={kplan.n_tiles} inflation={kplan.inflation:.2f}x")

    def b_kpack(d):
        m = dataclasses.replace(A, data=d)
        C, _ = kpack_spgemm(m, m, kplan, precision=PRECISION)
        return C.data

    res["kpack"] = bench.bench_chained(b_kpack, A.data, Ks=(1, 4), reps=2)

    hon = 2 * bf**3 * kplan.n_leaf_pairs
    for k, v in res.items():
        print(f"{k:8s}: t={v*1e3:8.2f} ms  honest={hon/v/1e9:7.1f} GFLOP/s"
              f"  ({res['kpack']/v:.2f}x kpack... inverse: "
              f"kpack is {v/res['kpack']:.2f}x faster)")
