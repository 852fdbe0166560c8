"""B1 unplanned-regression investigation (VERDICT r3 weak 3).

BENCH_r02 ran B1's full (unplanned) path at 0.11 ms; BENCH_r03 at
0.15 ms while the planned path improved — same process, consecutive
stages, so cross-process drift can't explain it.  The round-3 change in
that path was the slab-kernel dispatch rework (groups gating + the
bench passing group_caps unconditionally).  This script A/Bs every
dispatch choice for B1's exact shape IN ONE PROCESS (the only
trustworthy comparison on this chip, CLAUDE.md):

  groups   — group kernel (what r03's bench dispatched)
  rows     — row-panel kernel (pair_cap < 1024 would auto-reject it)
  stream   — per-pair stream kernel (what r02's auto picked at 278 pairs)
  auto     — current auto dispatch with both caps supplied
  each also as planned (frozen symbolic), matching the bench's stages.

Run on the real TPU:  python scripts/bench_b1_gate.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm_ex

PRECISION = "highest"

if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    A = bench.banded_block_matrix(4096, 64, 128)
    pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
    gplan = hbsm.plan_groups(A, A)
    print(
        f"B1 banded(4096, bw64 @128): blocks={int(A.nnz)} pairs={pc} "
        f"out={oc} row_caps=({mbr},{mcr}) groups={gplan and gplan.caps}"
    )
    plan = jax.block_until_ready(hbsm.make_plan(A, A, pc))

    cases = [
        ("groups", dict(group_caps=gplan.caps) if gplan else None),
        ("rows", dict(backend="rows", row_caps=(mbr, mcr))),
        ("stream", dict(backend="pallas")),
        ("auto-both", dict(row_caps=(mbr, mcr), group_caps=gplan.caps)
         if gplan else None),
        ("auto-rowsonly", dict(row_caps=(mbr, mcr))),
    ]
    res = {}
    for name, kw in cases:
        if kw is None:
            continue
        for planned in (False, True):
            kw2 = dict(kw)
            if planned:
                kw2["plan"] = plan

            def build(d, kw2=kw2):
                m = dataclasses.replace(A, data=d)
                C, _ = hbsm.spgemm(
                    m, m, pair_cap=pc, out_cap=oc, precision=PRECISION,
                    **kw2,
                )
                return C.data

            dt = bench.bench_chained(build, A.data, Ks=(5, 55))
            tag = f"{name}{'/planned' if planned else ''}"
            res[tag] = dt
            print(f"  {tag:22s}: t={dt*1e6:7.1f} us ({dt/pc*1e9:5.0f} ns/pair)")

    best = min(res, key=res.get)
    print(f"best: {best} at {res[best]*1e6:.1f} us")
