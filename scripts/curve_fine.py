"""Raw t(K) curve for the fine-kernel planned chain (resolve the
11 vs 23 ms/iter discrepancy between K spans).  Run on the real TPU."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm_ex

log = bench.log


def curve(name, build, data0, Ks, reps=3):
    ts = {}
    for K in Ks:
        def prog(d, K=K):
            def body(i, carry):
                d, acc = carry
                o = build(d)
                tick = o.ravel()[0].astype(jnp.float32) * 1e-38
                d = d.at[(0,) * d.ndim].add(tick.astype(d.dtype))
                return d, acc + tick
            return jax.lax.fori_loop(0, K, body, (d, jnp.float32(0)))[1]

        g = jax.jit(prog)
        float(g(data0))
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
        log(f"  {name} slope ({a:3d}->{b:3d}) = "
            f"{(ts[b]-ts[a])/(b-a)*1e3:8.2f} ms/iter")


def main():
    log(f"backend: {jax.default_backend()}")
    n, bf = 16384, 32
    A = bench.random_block_matrix(n, bf, 0.05, seed=2)
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    plan = jax.block_until_ready(hbsm.make_plan(A, A, pc))

    def build(d):
        m = dataclasses.replace(A, data=d)
        C, _ = hbsm.spgemm(
            m, m, pair_cap=pc, out_cap=oc, precision="highest",
            plan=plan, backend="fine", row_caps=(mbr, mcr),
        )
        return C.data

    curve("fine-planned", build, A.data, (2, 4, 8, 16, 32))

    Af = hbsm.fine_pack(A)
    fplan = jax.block_until_ready(
        hbsm.make_fine_plan(A, A, pc, oc, (mbr, mcr))
    )

    def build_flat(d):
        m = dataclasses.replace(Af, data=d)
        C, _ = hbsm.fine_matmul(
            m, m, pair_cap=pc, out_cap=oc, row_caps=(mbr, mcr),
            precision="highest", plan=fplan,
        )
        return C.data

    curve("fine-flat-planned", build_flat, Af.data, (2, 4, 8, 16, 32))


if __name__ == "__main__":
    main()
