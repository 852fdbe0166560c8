"""Backend A/B at the CONFIGURED B2 granularity: spgemm at the NATIVE
b=32 (16384^2, 5% block density, 336k fine pairs).

History: round 4 found "direct b=32" fastest and recorded 11-15 ms
planned — but those figures came from K-span (1,3) differentials, and
round 5's raw-curve measurement (scripts/profile_fine32b.py) showed
t(K) of the xla chain has a ~200 ms K=1 constant anomaly and a TRUE
steady-state slope of ~110 ms/iter.  All spans here start at K >= 2.

Backends:
  rows/stream — 128-tile Pallas kernels: FAIL Mosaic compile at b=32
       ("Slice shape along dimension 2 must be aligned to tiling
       (128)") — kept to document the failure mode.
  xla  — gather + batched dot_general + segment sum: the pre-round-5
       fallback (true steady state ~110 ms/iter planned).
  fine — the round-5 flat-layout block-diagonal row kernel
       (kernels/pallas_gemm_fine.py): [8,128] flat blocks, K=128 BD
       dots, in-kernel row accumulate.

Run on the real TPU:  python scripts/bench_b32_backend.py
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
from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm_ex

PRECISION = "highest"

if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    n, bf = 16384, 32
    A = bench.random_block_matrix(n, bf, 0.05, seed=2)
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    print(f"b=32: pairs={pc} out={oc} row_caps=({mbr},{mcr})")
    plan = jax.block_until_ready(hbsm.make_plan(A, A, pc))
    hon = 2 * bf**3 * pc

    # Numerics: fine vs xla on-chip (untimed).
    Cf, inf_f = hbsm.spgemm(
        A, A, pair_cap=pc, out_cap=oc, row_caps=(mbr, mcr),
        precision=PRECISION, backend="fine",
    )
    Cx, _ = hbsm.spgemm(
        A, A, pair_cap=pc, out_cap=oc, precision=PRECISION,
        backend="xla",
    )
    import jax.numpy as jnp

    err = float(
        jnp.max(jnp.abs(Cf.data - Cx.data))
        / jnp.maximum(1e-9, jnp.max(jnp.abs(Cx.data)))
    )
    same_ids = bool(jnp.all(Cf.ids == Cx.ids))
    print(f"fine vs xla: ids equal={same_ids} max rel={err:.2e} "
          f"row_overflow={bool(inf_f.row_overflow)}")
    assert same_ids and err < 1e-5, (same_ids, err)

    cases = [
        ("rows", dict(backend="rows", row_caps=(mbr, mcr))),
        ("stream", dict(backend="pallas")),
        ("fine", dict(backend="fine", row_caps=(mbr, mcr))),
        ("xla", dict(backend="xla")),
    ]
    for name, kw in cases:
        for planned in (False, True):
            kw2 = dict(kw)
            if planned:
                kw2["plan"] = plan

            def build(d, kw2=kw2):
                m = dataclasses.replace(A, data=d)
                C, _ = hbsm.spgemm(
                    m, m, pair_cap=pc, out_cap=oc,
                    precision=PRECISION, **kw2,
                )
                return C.data

            try:
                dt = bench.bench_chained(build, A.data, Ks=(2, 8), reps=2)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:7s} planned={planned}: FAILED "
                      f"{str(e)[:160]!r}")
                continue
            print(
                f"  {name:7s} planned={planned}: t={dt*1e3:8.2f} ms  "
                f"honest={hon/dt/1e9:7.1f} GFLOP/s "
                f"({1e9*dt/pc:.0f} ns/pair)"
            )

    # Flat-resident regime (ops.fine): payloads stay in the unpadded
    # [8,128]-tile layout across the chain — skips the 4x-padded
    # canonical C tensor (~4 ms at this scale).
    Af = hbsm.fine_pack(A)
    fplan = jax.block_until_ready(
        hbsm.make_fine_plan(A, A, pc, oc, (mbr, mcr))
    )

    def build_flat(d):
        m = dataclasses.replace(Af, data=d)
        C, _ = hbsm.fine_matmul(
            m, m, pair_cap=pc, out_cap=oc, row_caps=(mbr, mcr),
            precision=PRECISION, plan=fplan,
        )
        return C.data

    # Numerics: flat path vs xla (untimed).
    Cff, _ = hbsm.fine_matmul(
        Af, Af, pair_cap=pc, out_cap=oc, row_caps=(mbr, mcr),
        precision=PRECISION,
    )
    errf = float(
        jnp.max(jnp.abs(hbsm.fine_unpack(Cff).data - Cx.data))
        / jnp.maximum(1e-9, jnp.max(jnp.abs(Cx.data)))
    )
    print(f"fine-flat vs xla: max rel={errf:.2e}")
    assert errf < 1e-5, errf
    dtf = bench.bench_chained(build_flat, Af.data, Ks=(2, 8), reps=2)
    print(
        f"  fine-flat planned (flat-resident): t={dtf*1e3:8.2f} ms  "
        f"honest={hon/dtf/1e9:7.1f} GFLOP/s ({1e9*dtf/pc:.0f} ns/pair)"
    )

    def build_def(d):
        m = dataclasses.replace(A, data=d)
        C, _ = hbsm.spgemm(
            m, m, pair_cap=pc, out_cap=oc, row_caps=(mbr, mcr),
            precision="default", plan=plan, backend="fine",
        )
        return C.data

    dt = bench.bench_chained(build_def, A.data, Ks=(2, 8), reps=2)
    print(
        f"  fine planned, precision=default: t={dt*1e3:8.2f} ms  "
        f"honest={hon/dt/1e9:7.1f} GFLOP/s ({1e9*dt/pc:.0f} ns/pair)"
    )
