"""kpack panel-assembly layout A/B (DESIGN.md section 8, round-4
headroom item 3: the path is gather-bandwidth-bound at ~2x the panel
bytes actually multiplied).

The "plain" formulation transposes the GATHERED A panels
([Tg, Lk, tile, bf] -> [Tg, tile, Lk*bf]) before each group dot.  At
B2's density every fine A column is re-gathered for ~24 tiles, so that
transpose runs over ~24x the unique A bytes per call.  Candidates:

  plain — gather, transpose, reshape (round-4 initial form)
  t     — store packed A columns pre-transposed; the per-panel
          transpose happens once on the NA-slot store and the dot
          consumes a transposed LHS (contraction dim first)
  mc    — no reshapes: multi-dimensional contraction directly on the
          gathered 4-D panels, XLA picks layouts

All three are the same math; bit-consistency is asserted against
"plain" before timing.  One process, chained-differential (CLAUDE.md:
cross-process timings drift up to 30%).

Run on the real TPU:  python scripts/bench_kpack_layout.py
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
from hierarchical_block_sparse_lib_tpu.ops.kpack import (
    kpack_spgemm,
    plan_kpack,
)

PRECISION = "highest"

if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    n, bf = 16384, 32
    A = bench.random_block_matrix(n, bf, 0.05, seed=2)
    plan = plan_kpack(A, A, tile=128, n_groups=32)
    print(
        f"B2 leaf-32: tiles={plan.n_tiles} fine_pairs={plan.n_leaf_pairs} "
        f"panel_inflation={plan.inflation:.2f}x"
    )

    ref = None
    res = {}
    for layout in ("plain", "t", "mc"):
        C, info = kpack_spgemm(A, A, plan, precision=PRECISION,
                               layout=layout)
        C = jax.block_until_ready(C)
        assert not bool(info.plan_mismatch)
        got = np.asarray(C.data)
        if ref is None:
            ref = got
        else:
            err = np.abs(got - ref).max() / max(1e-9, np.abs(ref).max())
            print(f"  {layout} vs plain rel err: {err:.1e}")
            assert err < 1e-6, (layout, err)

        def build(d, layout=layout):
            m = dataclasses.replace(A, data=d)
            C, _ = kpack_spgemm(m, m, plan, precision=PRECISION,
                                layout=layout)
            return C.data

        dt = bench.bench_chained(build, A.data, Ks=(1, 4), reps=3)
        eff = 2 * bf**3 * plan.n_leaf_pairs / dt / 1e9
        res[layout] = dt
        print(f"  {layout:5s}: t={dt*1e3:.2f} ms  honest leaf-32 "
              f"eff={eff:.1f} GFLOP/s")

    base = res["plain"]
    for layout, dt in res.items():
        print(f"{layout:5s}: {base/dt:.2f}x vs plain")
