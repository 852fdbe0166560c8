"""Standing A/B: multi-row batched rows kernel (v6 experimental) vs the
row-panel kernel (v3) — VERDICT r3 item 5's "one more swing" at the
~0.53 ms additive per-row overhead the round-3 B2 ablation measured
(DESIGN.md section 8).

Raw-kernel timing on identical inputs (ids, out_ids, caps precomputed),
chained-differential protocol (bench.bench_chained).  Run on the real
TPU:  python scripts/bench_rows_mr.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_rows import (
    rows_spgemm,
)
from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_rows_mr import (
    rows_mr_spgemm, supported, tier_mr,
)
from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm_ex, spgemm


def batch_caps(out_ids, nbc, R):
    """Exact max total output slots over any R-row batch."""
    ids = np.asarray(out_ids, np.int64)
    ids = ids[ids != np.iinfo(np.int32).max]
    rows = ids // nbc
    cnt = np.bincount(rows // R)
    return int(cnt.max()) if cnt.size else 1


def run_case(name, A, Ks=(5, 45), precision="highest", rs=(2, 4, 8)):
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    C, _ = hbsm.spgemm(
        A, A, pair_cap=pc, out_cap=oc, row_caps=(mbr, mcr), backend="xla"
    )
    out_ids = jax.block_until_ready(C.ids)
    nbr = nbrB = nbc = A.nb_rows
    print(
        f"{name}: blocks={int(A.nnz)} pairs={pc} out={oc} "
        f"mbr={mbr} mcr={mcr}"
    )

    def build_rows(d):
        return rows_spgemm(
            A.ids, d, A.ids, d, out_ids, nbr, nbrB, nbc, oc, mbr, mcr,
            precision=precision,
        )

    dt0 = bench.bench_chained(build_rows, A.data, Ks)
    print(f"  rows (v3):        t={dt0*1e3:.3f} ms ({dt0/pc*1e9:.0f} ns/pair)")
    ref = np.asarray(build_rows(A.data))

    for R in rs:
        cb = batch_caps(out_ids, nbc, R)
        if not supported(A.block_size, A.dtype, mbr, cb, nbc, R):
            print(f"  rows_mr R={R}: unsupported (cb={cb}, "
                  f"tier={tier_mr(A.block_size, A.dtype, mbr, cb)})")
            continue

        def build_mr(d, R=R, cb=cb):
            return rows_mr_spgemm(
                A.ids, d, A.ids, d, out_ids, nbr, nbrB, nbc, oc, mbr,
                cb, rows_per_step=R, precision=precision,
            )

        got = np.asarray(build_mr(A.data))
        err = np.abs(got - ref).max() / max(1e-9, np.abs(ref).max())
        assert err < 1e-6, (R, err)
        dt = bench.bench_chained(build_mr, A.data, Ks)
        print(
            f"  rows_mr (v6) R={R}: t={dt*1e3:.3f} ms "
            f"({dt/pc*1e9:.0f} ns/pair)  vs rows {dt0/dt:.2f}x  cb={cb}"
        )


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    # B2-tile128: the overhead-exposed shape (headline's tile stage).
    A2 = bench.random_block_matrix(16384, 128, 0.05, seed=2)
    run_case("B2-tile128 random(16384, 5%@128)", A2)
    # Denser mid-size: more pairs/row, overheads proportionally smaller.
    A4 = bench.random_block_matrix(8192, 128, 0.5, seed=4)
    run_case("B4 near-dense(8192, 50%)", A4, Ks=(2, 10), rs=(2, 4))
