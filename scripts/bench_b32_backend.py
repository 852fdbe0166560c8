"""Backend A/B for the new honest-B2 winner: spgemm at the NATIVE
b=32 granularity (scripts/bench_fine_dispatch.py found direct-fine
beats kpack/coarsen; this pins WHICH kernel and whether more is on the
table).  One process, chained-differential.

Backends at B2 leaf-32 (336k fine pairs), unplanned and planned:
  rows    — row-panel kernel: FAILS Mosaic compile at b=32 ("Slice
            shape along dimension 2 must be aligned to tiling (128)")
            — sub-128 blocks cannot be sliced from HBM by Mosaic, so
            the auto dispatch's Pallas gates exclude them
  stream  — per-pair streaming kernel: same Mosaic alignment failure
  xla     — gather + batched dot_general + segment sum: the path auto
            actually dispatches at fine granularity, and the winner
            (round 4: 43.5 ms unplanned / 11.0 ms planned = 33 ns per
            fine pair, ~2.0 TF/s honest leaf-32)
Plus the planned auto run at precision=default (error-tolerant rate).

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

    cases = [
        ("rows", dict(backend="rows", row_caps=(mbr, mcr))),
        ("stream", dict(backend="pallas")),
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
                dt = bench.bench_chained(build, A.data, Ks=(1, 3), reps=2)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:7s} planned={planned}: FAILED {e!r}")
                continue
            print(
                f"  {name:7s} planned={planned}: t={dt*1e3:8.2f} ms  "
                f"honest={hon/dt/1e9:7.1f} GFLOP/s "
                f"({1e9*dt/pc:.0f} ns/pair)"
            )

    def build_def(d):
        m = dataclasses.replace(A, data=d)
        C, _ = hbsm.spgemm(
            m, m, pair_cap=pc, out_cap=oc,
            precision="default", plan=plan, backend="xla",
        )
        return C.data

    # Wider K span: at ~10 ms/iter the (1,3) differential is inside
    # this backend's noise floor (a negative slope was observed once).
    dt = bench.bench_chained(build_def, A.data, Ks=(2, 10), reps=3)
    print(
        f"  xla planned, precision=default: t={dt*1e3:8.2f} ms  "
        f"honest={hon/dt/1e9:7.1f} GFLOP/s ({1e9*dt/pc:.0f} ns/pair)"
    )
