"""Attribute the fine kernel's 23 ms/iter: XLA prep/post passes vs the
pallas_call itself.  All builds use .sum() consumers (DCE guard).

Run on the real TPU:  python scripts/profile_fine_pieces.py
"""

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
from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm_ex

log = bench.log


def main():
    log(f"backend: {jax.default_backend()}")
    n, bf = 16384, 32
    fr = 8
    A = bench.random_block_matrix(n, bf, 0.05, seed=2)
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    cap = A.cap
    cap_pad = -(-cap // 32) * 32

    # P1: a_wide build (pad-set + payload transpose).
    def p1(d):
        w = jnp.zeros((cap_pad, bf, 128), jnp.float32)
        w = w.at[:cap, :, :bf].set(jnp.swapaxes(d, -1, -2))
        return w.sum().reshape(1)

    dt = bench.bench_chained(p1, A.data, Ks=(2, 8), reps=2)
    log(f"P1 a_wide build : {dt*1e3:7.2f} ms")

    # P1b: alternative via concat-pad (maybe fuses better).
    def p1b(d):
        t = jnp.swapaxes(d, -1, -2)
        w = jnp.concatenate(
            [t, jnp.zeros((cap, bf, 128 - bf), jnp.float32)], axis=2
        )
        w = jnp.concatenate(
            [w, jnp.zeros((cap_pad - cap, bf, 128), jnp.float32)], axis=0
        )
        return w.sum().reshape(1)

    dt = bench.bench_chained(p1b, A.data, Ks=(2, 8), reps=2)
    log(f"P1b a_wide concat: {dt*1e3:7.2f} ms")

    # P2: btf build.
    def p2(d):
        t = jnp.swapaxes(d, -1, -2).reshape(cap * fr, 128)
        t = jnp.concatenate([t, jnp.zeros((8 * fr, 128), jnp.float32)])
        return t.sum().reshape(1)

    dt = bench.bench_chained(p2, A.data, Ks=(2, 8), reps=2)
    log(f"P2 btf build    : {dt*1e3:7.2f} ms")

    # P3: out post-pass, canonical.
    flat = jax.block_until_ready(
        jnp.asarray(
            np.random.default_rng(0)
            .standard_normal((oc * fr, 128))
            .astype(np.float32)
        )
        * 1e-3
    )

    def p3(g):
        return jnp.swapaxes(g.reshape(oc, bf, bf), -1, -2).sum().reshape(1)

    dt = bench.bench_chained(p3, flat, Ks=(2, 8), reps=2)
    log(f"P3 post canonical(sum-consumed): {dt*1e3:7.2f} ms")

    # P3b: post with MATERIALIZED canonical output (what the chain
    # actually pays — the padded [oc,32,32] write).
    def p3b(g):
        return jnp.swapaxes(g.reshape(oc, bf, bf), -1, -2)

    dt = bench.bench_chained(p3b, flat, Ks=(2, 8), reps=2)
    log(f"P3b post canonical (materialized): {dt*1e3:7.2f} ms")

    # P3c: post to flat layout, materialized.
    def p3c(g):
        return (
            jnp.swapaxes(g.reshape(oc, bf, bf), -1, -2)
            .reshape(oc, fr, 128)
        )

    dt = bench.bench_chained(p3c, flat, Ks=(2, 8), reps=2)
    log(f"P3c post flat (materialized): {dt*1e3:7.2f} ms")

    # P4: the pallas_call alone — call fine_spgemm with PRE-BUILT
    # operands by entering through the internal entry with tables; we
    # emulate by timing fine_spgemm minus (P1+P2+P3) instead, since
    # the prep is inside the jit.  Here: whole fine_spgemm, flat out.
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_fine import (
        build_tables,
        fine_spgemm,
    )
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import spgemm

    Cx, _ = spgemm(A, A, pair_cap=pc, out_cap=oc, backend="xla")
    out_ids = Cx.ids
    tables = jax.block_until_ready(
        build_tables(A.ids, A.ids, out_ids, A.nb_rows, A.nb_rows,
                     A.nb_cols)
    )

    for ablate in ("", "noadds", "nodots", "noadds,nodots", "noinit",
                   "nobd,nodots,noadds", "nofetch,nodots,noadds"):
        def p4(d, ablate=ablate):
            return fine_spgemm(
                A.ids, d, A.ids, d, out_ids,
                A.nb_rows, A.nb_rows, A.nb_cols, oc, mbr, mcr,
                precision="highest", tables=tables, out_layout="flat",
                ablate=ablate,
            )

        dt = bench.bench_chained(p4, A.data, Ks=(2, 8), reps=2)
        log(f"P4 fine_spgemm flat [{ablate or 'full'}]: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
