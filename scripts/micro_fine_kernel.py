"""Micro-experiments sizing the round-5 fine-leaf (b=32) grid engine.

Questions (see scripts/profile_fine32b.py for the macro measurements):

  E1a  Does Mosaic compile dot_general contracting dim0 x dim0
       ([32,LA] x [32,LB] -> [LA,LB], the per-k outer-product grid) and
       at what rate vs the XLA grid dot (~30 TF/s hw at highest)?
  E1b  Same per quad-pair: [32,128] x [32,128] -> [128,128].
  E2   In-kernel [32,32] -> [8,128] row-major value reshape (the
       flat-block emit) throughput.
  E5   XLA gather rate on flat [P,8,128] rows (4 KB granules) — the
       phase-3 permute/gather-add building block.
  E8   XLA boundary relayout: canonical [cap,32,32] blocks ->
       lane-packed quad tiles [Q,32,128] (with and without payload
       transpose) — the per-iteration packing cost.
  E9   Fused depth-bucketed gather-add: C_flat[s] = sum_d P[src[s,d]]
       with Dmax masked gathers in one jitted expression.

Run on the real TPU:  python scripts/micro_fine_kernel.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench

log = bench.log
R = 256  # in-kernel repetitions per call


def _dot00(a, b, precision):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision[precision.upper()],
    )


@functools.partial(jax.jit, static_argnames=("mode", "precision"))
def micro(at, bp, mode, precision="highest"):
    LA = at.shape[1]
    LB = bp.shape[1]

    def kernel(at_ref, bp_ref, out_ref, acc):
        def body(i, _):
            s = 1.0 + i.astype(jnp.float32) * 1e-9  # defeat hoisting
            if mode == "wide":
                acc[:] += _dot00(at_ref[:] * s, bp_ref[:], precision)
            elif mode == "quad":
                for qa in range(LA // 128):
                    for qb in range(LB // 128):
                        acc[
                            qa * 128:(qa + 1) * 128,
                            qb * 128:(qb + 1) * 128,
                        ] += _dot00(
                            at_ref[:, qa * 128:(qa + 1) * 128] * s,
                            bp_ref[:, qb * 128:(qb + 1) * 128],
                            precision,
                        )
            else:  # flatten: emit flat [8,128] blocks from a [128,128] tile
                tile = acc[0:128, 0:128] + s
                for t in range(4):
                    for c in range(4):
                        fb = tile[
                            32 * t:32 * (t + 1), 32 * c:32 * (c + 1)
                        ].reshape(8, 128)
                        acc[128 + 8 * (4 * t + c):128 + 8 * (4 * t + c + 1),
                            0:128] += fb
            return 0

        jax.lax.fori_loop(0, R, body, 0)
        out_ref[:] = acc[0:8, 0:128]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((max(LA, 256), max(LB, 128)), jnp.float32)],
    )(at, bp)


def run_micro(name, at, bp, mode, precision, flops_per_rep):
    try:
        out = jax.block_until_ready(micro(at, bp, mode, precision))
    except Exception as e:  # noqa: BLE001
        log(f"E[{name}]: FAILED {str(e)[:300]}")
        return None
    dt = bench.bench_chained(
        lambda a: micro(a, bp, mode, precision), at, Ks=(2, 8), reps=2
    )
    log(
        f"E[{name}]: {dt*1e3:8.3f} ms/call "
        f"({R * flops_per_rep / dt / 1e12:6.2f} TF/s)"
    )
    return dt


def main():
    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    LA = LB = 832  # 26 blocks of 32 — the B2 mean panel
    at = jnp.asarray(rng.standard_normal((32, LA)).astype(np.float32)) * 0.1
    bp = jnp.asarray(rng.standard_normal((32, LB)).astype(np.float32)) * 0.1

    # Numerics check of the wide dot00 inside Pallas vs XLA (one rep
    # effect dominates: compare against R * small perturbation? -> use
    # direct single-shot kernel equivalence instead: R reps of s~1, so
    # acc ~= sum_i dot(at*s_i, bp); compare against that).
    # (Rate is the question here; correctness of dot00 is checked in
    # the engine's unit tests on CPU interpret mode.)

    LAq = LBq = 896  # 7 quads
    atq = jnp.asarray(rng.standard_normal((32, LAq)).astype(np.float32)) * 0.1
    bpq = jnp.asarray(rng.standard_normal((32, LBq)).astype(np.float32)) * 0.1

    for prec in ("highest", "default"):
        run_micro(f"E1a wide {prec}", at, bp, "wide", prec,
                  2 * LA * 32 * LB)
        run_micro(f"E1b quad {prec}", atq, bpq, "quad", prec,
                  2 * LAq * 32 * LBq)
    run_micro("E2 flatten", atq, bpq, "flatten", "default",
              16 * 8 * 128 * 2)  # "flops" = elements moved, reported as TF/s of touches

    # ---- E5: XLA gather of flat [P,8,128] rows ----------------------
    P = 1 << 17
    src = jnp.asarray(
        rng.standard_normal((P, 8, 128)).astype(np.float32)
    )
    perm = jnp.asarray(rng.permutation(P).astype(np.int32))

    def build_g(d):
        return d[perm]

    dtg = bench.bench_chained(build_g, src, Ks=(2, 8), reps=2)
    log(f"E5 flat gather: {dtg*1e3:.2f} ms for {P*4096/1e9:.2f} GB "
        f"-> {P*4096/dtg/1e9:.0f} GB/s")

    # ---- E8: canonical -> quad-tile relayout ------------------------
    cap = 13108
    blocks = jnp.asarray(
        rng.standard_normal((cap, 32, 32)).astype(np.float32)
    )
    permb = jnp.asarray(rng.permutation(cap).astype(np.int32))

    def build_pack(d):
        # gather (col-sort) + lane-pack 4 blocks/quad: [cap,32,32] ->
        # [cap/4, 32, 128]
        g = d[permb]  # [cap,32,32]
        q = g.reshape(cap // 4, 4, 32, 32).transpose(0, 2, 1, 3)
        return q.reshape(cap // 4, 32, 128)

    dtp = bench.bench_chained(build_pack, blocks, Ks=(2, 8), reps=2)
    log(f"E8 pack (no transpose): {dtp*1e3:.2f} ms for "
        f"{cap*4096/1e9:.3f} GB unpadded")

    def build_packT(d):
        g = d[permb].transpose(0, 2, 1)  # payload transpose (AT side)
        q = g.reshape(cap // 4, 4, 32, 32).transpose(0, 2, 1, 3)
        return q.reshape(cap // 4, 32, 128)

    dtpt = bench.bench_chained(build_packT, blocks, Ks=(2, 8), reps=2)
    log(f"E8 pack (with transpose): {dtpt*1e3:.2f} ms")

    # canonical [cap,32,32] -> flat [cap,8,128] relayout alone
    def build_flat(d):
        return d.reshape(cap, 8, 128)

    dtf = bench.bench_chained(build_flat, blocks, Ks=(2, 8), reps=2)
    log(f"E8 flat reshape: {dtf*1e3:.2f} ms")

    # ---- E9: fused depth-bucketed gather-add ------------------------
    OC = 189364 // 2  # half-scale C to bound memory; rate scales
    DMAX = 8
    Pp = P  # product pool
    prods = src  # reuse [P,8,128]
    srcs = rng.integers(0, Pp, (OC, DMAX)).astype(np.int32)
    depth = rng.choice(
        np.arange(1, 9), OC, p=np.array([93165, 59692, 25763, 8177,
                                         2053, 422, 80, 12]) / 189364
    )
    valid = (np.arange(DMAX)[None, :] < depth[:, None])
    srcs = np.where(valid, srcs, Pp)  # pad row -> zero block
    srcs_j = jnp.asarray(srcs)

    def build_acc(d):
        dz = jnp.concatenate(
            [d, jnp.zeros((1, 8, 128), jnp.float32)], axis=0
        )
        out = dz[srcs_j[:, 0]]
        for k in range(1, DMAX):
            out = out + dz[srcs_j[:, k]]
        return out

    dta = bench.bench_chained(build_acc, prods, Ks=(2, 8), reps=2)
    tot = float(valid.sum()) * 4096
    log(
        f"E9 gather-add (Dmax={DMAX}, {OC} slots, "
        f"{tot/1e9:.2f} GB useful): {dta*1e3:.2f} ms "
        f"-> {tot/dta/1e9:.0f} GB/s useful"
    )


if __name__ == "__main__":
    main()
