"""Second micro round for the fine-leaf BD-rows kernel design.

Design under test (see DESIGN.md round-5 notes): per C row i, per A
block (i,k):
    prod_stack [8*nb_k, 128] = BTflat(row-k panel) @ BD(A_ik^T)
with BD = [128,128] block-diagonal holding A_ik^T four times, flat
[8,128] in/out layouts everywhere (no 4x tile padding, K=128 full-MXU
dots), and per-product dynamic-sublane accumulate into a C-row
accumulator.

Micros:
  E2x  [32,32] <-> [8,128] value reshapes in Mosaic — which recipe
       compiles (plain reshape / stack+reshape / 4-slice concat)?
  E3   dynamic-sublane-offset [8,128] += add rate (the accumulate).
  E12  the composite inner loop: unflatten + BD build + dot + adds,
       at B2-like sizes — the whole kernel's per-A-block cost.
  E11  XLA prep pass: payload-transpose + flat reshape of [cap,32,32].

Run:  python scripts/micro_fine_kernel2.py
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


# ---- E2 variants: one tiny kernel per recipe ---------------------------
@functools.partial(jax.jit, static_argnames=("variant",))
def e2(x, variant):
    def kernel(x_ref, o_ref):
        v = x_ref[:]  # [32, 32]
        if variant == "reshape":
            f = v.reshape(8, 128)
        elif variant == "stack":
            f = jnp.stack(
                [v[0:32:4], v[1:32:4], v[2:32:4], v[3:32:4]], axis=0
            )  # [4, 8, 32] rows r,4g? -> then rearrange
            f = f.transpose(1, 0, 2).reshape(8, 128)
        else:  # concat of row-groups: flat[g, 32r+j] = v[4g+r, j]
            parts = [v[r:32:4] for r in range(4)]  # each [8,32]
            f = jnp.concatenate(parts, axis=1)  # [8,128]
        o_ref[:] = f

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# ---- E3: dynamic-sublane add loop --------------------------------------
R3 = 4096


@jax.jit
def e3(idx, v):
    def kernel(idx_ref, v_ref, o_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        def body(i, _):
            p = idx_ref[i]
            acc[pl.ds(p * 8, 8), :] += v_ref[:]
            return 0

        jax.lax.fori_loop(0, R3, body, 0)
        o_ref[:] = acc[0:8, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4096, 128), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(idx, v)


# ---- E12: composite BD inner loop --------------------------------------
NBROW = 26  # B row panel blocks (B2 mean)
RA = 256  # A blocks per call


@functools.partial(jax.jit, static_argnames=("precision", "do_adds"))
def e12(a_wide, panel, idx, precision="highest", do_adds=True):
    """Per 'A block' e in [0,RA): BD build from the wide [32,128] A^T
    tile (logical block in lanes 0:32 — no reshape needed), dot the
    fixed [8*NBROW,128] flat panel against it, accumulate rows at
    planned sublane offsets via a prod scratch ref."""

    def kernel(idx_ref, a_ref, p_ref, o_ref, bd, prod, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            bd[:] = jnp.zeros_like(bd)
            acc[:] = jnp.zeros_like(acc)

        def body(e, _):
            lg = a_ref[e][:, 0:32]  # [32,32] logical A^T block
            for t in range(4):
                bd[32 * t:32 * (t + 1), 32 * t:32 * (t + 1)] = lg
            prod[:] = jax.lax.dot_general(
                p_ref[:], bd[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision[precision.upper()],
            )  # [8*NBROW, 128]
            if do_adds:
                def add1(t, _):
                    pos = idx_ref[e * NBROW + t]
                    acc[pl.ds(pos * 8, 8), :] += prod[pl.ds(t * 8, 8), :]
                    return 0

                jax.lax.fori_loop(0, NBROW, add1, 0)
            else:
                acc[0:8 * NBROW, :] += prod[:]
            return 0

        jax.lax.fori_loop(0, RA, body, 0)
        o_ref[:] = acc[0:8, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.VMEM((8 * NBROW, 128), jnp.float32),
            pltpu.VMEM((4096, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(idx, a_wide, panel)


def main():
    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32))

    ref = np.asarray(x).reshape(8, 128)
    for variant in ("reshape", "stack", "concat"):
        try:
            out = np.asarray(jax.block_until_ready(e2(x, variant)))
            ok = np.array_equal(out, ref)
            log(f"E2[{variant}]: compiles, correct={ok}")
        except Exception as err:  # noqa: BLE001
            msg = str(err)
            key = msg
            for marker in ("Mosaic failed", "Unsupported", "error:"):
                i = msg.find(marker)
                if i >= 0:
                    key = msg[i:i + 240]
                    break
            log(f"E2[{variant}]: FAILED {key!r}")

    # E3
    idx = jnp.asarray(rng.integers(0, 500, R3).astype(np.int32))
    v = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    try:
        jax.block_until_ready(e3(idx, v))
        dt = bench.bench_chained(lambda vv: e3(idx, vv), v, Ks=(2, 8),
                                 reps=2)
        log(
            f"E3 dyn-sublane add: {dt/R3*1e9:.0f} ns/add "
            f"({R3/dt/1e6:.1f} M adds/s; 336k adds -> "
            f"{336e3*dt/R3*1e3:.2f} ms)"
        )
    except Exception as err:  # noqa: BLE001
        log(f"E3: FAILED {str(err)[:240]}")

    # E12
    at_flat = jnp.asarray(
        rng.standard_normal((RA, 32, 128)).astype(np.float32)
    ) * 0.1
    panel = jnp.asarray(
        rng.standard_normal((8 * NBROW, 128)).astype(np.float32)
    ) * 0.1
    idx12 = jnp.asarray(
        rng.integers(0, 500, RA * NBROW).astype(np.int32)
    )
    flops = 2 * RA * (8 * NBROW) * 128 * 128  # hw flops (4x honest)
    for prec in ("highest", "default"):
        for do_adds in (True, False):
            try:
                jax.block_until_ready(
                    e12(at_flat, panel, idx12, prec, do_adds)
                )
                dt = bench.bench_chained(
                    lambda a, prec=prec, da=do_adds: e12(
                        a, panel, idx12, prec, da
                    ),
                    at_flat, Ks=(2, 8), reps=2,
                )
                per_blk = dt / RA
                log(
                    f"E12[{prec}, adds={do_adds}]: {dt*1e3:.3f} ms "
                    f"({per_blk*1e9:.0f} ns/A-block; hw "
                    f"{flops/dt/1e12:.1f} TF/s; 13107 blocks -> "
                    f"{13107*per_blk*1e3:.2f} ms)"
                )
            except Exception as err:  # noqa: BLE001
                log(f"E12[{prec}, adds={do_adds}]: FAILED "
                    f"{str(err)[:240]}")

    # E11: XLA payload-transpose + flat prep
    cap = 13108
    blocks = jnp.asarray(
        rng.standard_normal((cap, 32, 32)).astype(np.float32)
    )

    def build_tflat(d):
        return d.transpose(0, 2, 1).reshape(cap, 8, 128)

    dt = bench.bench_chained(build_tflat, blocks, Ks=(2, 8), reps=2)
    log(f"E11 payloadT+flat: {dt*1e3:.2f} ms for {cap} blocks")

    def build_flat_only(d):
        return d.reshape(cap, 8, 128)

    dt2 = bench.bench_chained(build_flat_only, blocks, Ks=(2, 8), reps=2)
    log(f"E11 flat only: {dt2*1e3:.2f} ms")


if __name__ == "__main__":
    main()
