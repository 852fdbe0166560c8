"""Focused follow-up to profile_fine32.py (round 5).

Lessons from the first pass, baked in here:
- Pure-XLA builds MUST be consumed via .sum(): the single-element tick
  lets XLA slice-push through dots/gathers and DCE the work (the
  B1-band trap, bench.py build_band) — the first grid-dot "1.1 ms" was
  an artifact.
- The planned-xla fine chain shows SUPER-LINEAR t(K): slope 13 ms at
  Ks=(1,3) but 111 ms at (2,8).  This script records the RAW t(K)
  curve to pin the mechanism and the honest steady-state cost.

Run on the real TPU:  python scripts/profile_fine32b.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm_ex

log = bench.log


def raw_curve(name, prog_builder, data0, Ks, reps=2):
    """Raw total times t(K) — no differential: see the curve itself."""
    ts = {}
    for K in Ks:
        g = jax.jit(prog_builder(K))
        float(g(data0))  # compile + cold
        best = None
        for r in range(reps):
            fresh = data0 * (1.0 + (r + 1) * 1e-5)
            float(fresh.ravel()[0])
            t0 = time.perf_counter()
            float(g(fresh))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ts[K] = best
        log(f"  {name} t({K:3d}) = {best*1e3:9.2f} ms "
            f"({best/K*1e3:7.2f} ms/iter avg)")
    ks = sorted(ts)
    for a, b in zip(ks, ks[1:]):
        sl = (ts[b] - ts[a]) / (b - a)
        log(f"  {name} slope ({a:3d}->{b:3d}) = {sl*1e3:8.2f} ms/iter")
    return ts


def main():
    log(f"backend: {jax.default_backend()}")
    n, bf = 16384, 32
    A = bench.random_block_matrix(n, bf, 0.05, seed=2)
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    hon = 2 * bf**3 * pc
    plan = jax.block_until_ready(hbsm.make_plan(A, A, pc))
    import dataclasses

    # Session sanity anchor: dense 8192^2 at highest ~= 7.1 ms.
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8192, 8192), np.float64)
        .astype(np.float32)
    ) * 1e-2
    dta = bench.bench_chained(
        lambda d: jnp.matmul(
            d, d, precision=jax.lax.Precision.HIGHEST
        ) * 1e-2,
        x, Ks=(2, 6),
    )
    log(f"dense 8192 anchor: {dta*1e3:.2f} ms (expect ~7.1)")

    # ---- raw t(K) curve of the planned xla fine chain ----------------
    def mk_prog(K):
        def prog(d):
            def body(i, carry):
                d, acc = carry
                m = dataclasses.replace(A, data=d)
                C, _ = hbsm.spgemm(
                    m, m, pair_cap=pc, out_cap=oc, precision="highest",
                    plan=plan, backend="xla",
                )
                o = C.data
                tick = o.ravel()[0].astype(jnp.float32) * 1e-38
                d = d.at[0, 0, 0].add(tick.astype(d.dtype))
                return d, acc + tick
            return jax.lax.fori_loop(0, K, body, (d, jnp.float32(0)))[1]
        return prog

    log("planned xla chain (tick consumer):")
    raw_curve("xla-planned", mk_prog, A.data, (1, 2, 4, 8, 16))

    # Realistic SCF-style chain: feed a slice of C back into A's data.
    def mk_prog_fb(K):
        def prog(d):
            def body(i, carry):
                d, acc = carry
                m = dataclasses.replace(A, data=d)
                C, _ = hbsm.spgemm(
                    m, m, pair_cap=pc, out_cap=oc, precision="highest",
                    plan=plan, backend="xla",
                )
                o = C.data
                tick = o.ravel()[0].astype(jnp.float32) * 1e-38
                d = d + o[: d.shape[0]] * 1e-30
                return d, acc + tick
            return jax.lax.fori_loop(0, K, body, (d, jnp.float32(0)))[1]
        return prog

    log("planned xla chain (C fed back into A):")
    raw_curve("xla-fb", mk_prog_fb, A.data, (1, 2, 4, 8))

    # ---- the K=32 grid dot, DCE-proofed with a .sum() consumer -------
    ids = np.asarray(A.ids, np.int64)
    nb = A.nb_cols
    row, col = ids // nb, ids % nb
    na_k = np.bincount(col, minlength=nb)
    nb_k = np.bincount(row, minlength=nb)
    NAC = int(4 * np.ceil(max(na_k.max(), nb_k.max()) / 4))
    order_a = np.argsort(col, kind="stable")
    ranks = np.empty(ids.size, np.int64)
    start = np.concatenate([[0], np.cumsum(na_k)[:-1]])
    ranks[order_a] = np.arange(ids.size) - start[col[order_a]]
    order_b = np.argsort(row, kind="stable")
    ranksb = np.empty(ids.size, np.int64)
    startb = np.concatenate([[0], np.cumsum(nb_k)[:-1]])
    ranksb[order_b] = np.arange(ids.size) - startb[row[order_b]]
    Ad = np.asarray(A.data)
    aT = np.zeros((nb, bf, NAC * bf), np.float32)
    bP = np.zeros((nb, bf, NAC * bf), np.float32)
    for e in range(ids.size):
        aT[col[e], :, ranks[e] * bf:(ranks[e] + 1) * bf] = Ad[e].T
        bP[row[e], :, ranksb[e] * bf:(ranksb[e] + 1) * bf] = Ad[e]
    panels = jnp.stack([jnp.asarray(aT), jnp.asarray(bP)]) * 1e-2
    hw_flops = 2 * nb * (NAC * bf) * bf * (NAC * bf)
    log(
        f"grid caps NA=NB={NAC}; hw FLOPs {hw_flops/1e9:.1f} GFLOP "
        f"(pad inflation {nb*NAC*NAC/(na_k*nb_k).sum():.2f}x); "
        f"grid volume {nb*(NAC*bf)**2*4/1e9:.2f} GB"
    )

    for prec_name, prec in (
        ("highest", jax.lax.Precision.HIGHEST),
        ("default", jax.lax.Precision.DEFAULT),
    ):
        def build_grid(x, prec=prec):
            g = jax.lax.dot_general(
                x[0], x[1],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            # Full-dependency consumer (DCE guard).
            return g.sum().reshape(1)

        dtg = bench.bench_chained(build_grid, panels, Ks=(2, 8), reps=2)
        log(
            f"grid dot+sum ({prec_name:7s}): t={dtg*1e3:8.2f} ms  "
            f"hw {hw_flops/dtg/1e12:5.1f} TF/s  "
            f"honest {hon/dtg/1e9:7.1f} GFLOP/s"
        )

    # The .sum() pass alone, to subtract (one read of the grid volume).
    gvol = jax.block_until_ready(
        jnp.zeros((nb, NAC * bf, NAC * bf), jnp.float32)
    )

    def build_sum(g):
        return g.sum().reshape(1)

    dts = bench.bench_chained(build_sum, gvol, Ks=(2, 8), reps=2)
    log(f"sum-pass alone: t={dts*1e3:.2f} ms "
        f"({gvol.size*4/dts/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
