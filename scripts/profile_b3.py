"""B3 SP2-step ablation profile on the real TPU chip.

B3 (5 SP2 steps @ 4096, b=128) is bookkeeping-bound: ~750 pair GEMMs
per step is ~0.2 ms of MXU work yet the step costs ~2.1 ms.  This
script decomposes the step cost by timing each primitive in isolation
with the same chained-differential protocol as bench.py (the only
timing that is valid on the axon backend — see bench.py docstring):

  - full sp2_step               (the whole thing)
  - spgemm with beta-accumulate (symbolic + numeric + union compaction)
  - spgemm with a frozen plan   (numeric + compaction only)
  - truncate                    (norms + keep-mask + one compaction)
  - trace                       (cheap; sanity floor)

The difference (accum-spgemm − plan-spgemm) is the symbolic phase;
(full − spgemm − truncate − trace) is repack + scan plumbing.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench as B  # reuse bench_chained / matrix builders / logging


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    import hierarchical_block_sparse_lib_tpu as hbsm
    from hierarchical_block_sparse_lib_tpu.models.purification import (
        profile_purify,
        purify_scan,
        sp2_step,
    )
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import make_plan, spgemm
    from hierarchical_block_sparse_lib_tpu.ops.truncate import truncate
    from hierarchical_block_sparse_lib_tpu.ops.norms import trace

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    B.log(f"backend: {jax.default_backend()}")

    n, b = 4096, 128
    A = B.banded_block_matrix(n, 256, b)
    A = hbsm.add(A, hbsm.transpose(A), alpha=0.5, beta=0.5)
    A = hbsm.scale(A, 1.0 / float(np.sqrt(float(hbsm.frob_squared(A)))))
    A = hbsm.add(A, hbsm.eye(n, b), beta=0.5, cap=A.cap + n // b)
    prof = profile_purify(A, 5, tau=1e-6, target_trace=n / 2)
    B.log(
        f"caps: pair={prof.pair_cap} out={prof.out_cap} cap={prof.cap} "
        f"rows={prof.row_caps} per-step pairs={prof.per_step_pairs}"
    )
    kw = prof.kwargs()

    # A representative mid-run iterate (after 2 steps) at capacity `cap`:
    # the densest structure the per-step primitives actually see.
    X2, _ = purify_scan(A, 2, tau=1e-6, target_trace=n / 2, **kw)
    X2 = jax.block_until_ready(X2)
    B.log(f"iterate nnz={int(X2.nnz)} cap={X2.cap}")

    Ks = (4, 40)
    res = {}

    def timeit(name, build, d0):
        t = B.bench_chained(build, d0, Ks)
        res[name] = t
        B.log(f"  {name:24s} {t*1e6:9.1f} us")

    # 1. full 5-step scan (per step = /5).
    def full(d):
        x = dataclasses.replace(A, data=d)
        xf, _ = purify_scan(x, 5, tau=1e-6, target_trace=n / 2, **kw)
        return xf.data

    t5 = B.bench_chained(full, A.data, Ks)
    res["sp2_step (scan/5)"] = t5 / 5
    B.log(f"  {'sp2_step (scan/5)':24s} {t5/5*1e6:9.1f} us")

    # 2. one eager sp2_step on the mid-run iterate.
    def one_step(d):
        x = dataclasses.replace(X2, data=d)
        y, _ = sp2_step(
            x, 1e-6, pair_cap=prof.pair_cap, out_cap=prof.out_cap,
            target_trace=n / 2, cap=prof.cap, row_caps=prof.row_caps,
        )
        return y.data

    timeit("sp2_step (eager)", one_step, X2.data)

    # 3. spgemm with beta-accumulate (what the step's multiply does).
    def sg_accum(d):
        x = dataclasses.replace(X2, data=d)
        y, _ = spgemm(
            x, x, pair_cap=prof.pair_cap, out_cap=prof.out_cap,
            row_caps=prof.row_caps, accum=x, alpha=1.0, beta=-0.5,
        )
        return y.data

    timeit("spgemm+accum", sg_accum, X2.data)

    # 4. plain spgemm (no accumulate) — union-merge cost by difference.
    def sg_plain(d):
        x = dataclasses.replace(X2, data=d)
        y, _ = spgemm(
            x, x, pair_cap=prof.pair_cap, out_cap=prof.out_cap,
            row_caps=prof.row_caps,
        )
        return y.data

    timeit("spgemm plain", sg_plain, X2.data)

    # 5. numeric-only spgemm (frozen symbolic plan).
    plan = make_plan(X2, X2, prof.pair_cap)
    plan = jax.block_until_ready(plan)

    def sg_plan(d):
        x = dataclasses.replace(X2, data=d)
        y, _ = spgemm(
            x, x, pair_cap=prof.pair_cap, out_cap=prof.out_cap,
            row_caps=prof.row_caps, plan=plan,
        )
        return y.data

    timeit("spgemm plan=", sg_plan, X2.data)

    # 6. truncate (tau tiny: keeps everything, same op sequence).
    def tr(d):
        x = dataclasses.replace(X2, data=d)
        return truncate(x, 1e-30).data

    timeit("truncate", tr, X2.data)

    # 7. trace.
    def trc(d):
        x = dataclasses.replace(X2, data=d)
        return trace(x)[None].astype(jnp.float32) + d[0, :1, :1] * 0

    timeit("trace", trc, X2.data)

    B.log("")
    sym = res["spgemm+accum"] - res["spgemm plan="]
    B.log(f"symbolic+union phase   ~ {sym*1e6:9.1f} us")
    B.log(f"union-merge (accum-plain) ~ "
          f"{(res['spgemm+accum']-res['spgemm plain'])*1e6:9.1f} us")
    other = (res["sp2_step (eager)"] - res["spgemm+accum"]
             - res["truncate"] - res["trace"])
    B.log(f"repack+blend residue   ~ {other*1e6:9.1f} us")
    print({k: round(v * 1e6, 1) for k, v in res.items()})


if __name__ == "__main__":
    main()
