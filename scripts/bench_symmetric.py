"""Planned-symmetric SP2 A/B on the real chip (VERDICT r2 item 6).

Measured 2026-08-19 (v5e, f32-highest):
- raw planned spgemm, 6144^2 55% symmetric (110592 pairs, syrk 56k):
  generic 13.65 ms vs syrk+mirror 10.47 ms = 1.30x.
- purify_scan per-iter at the same config: generic 19.1 ms/step vs
  symmetric 17.7 = 1.08x (the scan's fixed step costs — truncate,
  trace, blend, scan machinery ~4.7 ms/step — dilute the multiply win
  and affect both paths equally).
- B3 scale (4096^2 banded, ~750-8.7k pairs/step): symmetric 0.85x
  (1.18x slower) — within the <=1.2x-slower envelope; the generic path
  stays the default there (matmul-level guidance in sp2_step docstring).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, dataclasses
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
import jax.numpy as jnp
import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.models.purification import (
    plan_purify, profile_purify, purify_scan,
)

def run_ab(X, name, n_steps=5, tau=1e-7, nocc=None):
    nocc = nocc or X.n_rows // 4
    prof = profile_purify(X, n_steps, tau=tau, target_trace=nocc)
    kw = dict(target_trace=nocc, **prof.kwargs())
    pg = plan_purify(X, n_steps, tau, prof, target_trace=nocc)
    ps = plan_purify(X, n_steps, tau, prof, target_trace=nocc, symmetric=True)
    res = {}
    for label, plans, sym in (("generic", pg, False), ("symmetric", ps, True)):
        def build(d, plans=plans, sym=sym):
            m = dataclasses.replace(X, data=d)
            y, st = purify_scan(m, n_steps, tau=tau, plans=plans,
                                symmetric=sym, **kw)
            return y.data
        dt = bench.bench_chained(build, X.data, Ks=(2, 8))
        res[label] = dt
        print(f"{name} {label:9s}: {dt*1e3:.2f} ms/iter "
              f"(pairs/step={prof.per_step_pairs})")
    print(f"{name}: symmetric vs generic = {res['generic']/res['symmetric']:.2f}x")
    return res

# B3 scale: banded 4096^2 symmetric.
A = bench.banded_block_matrix(4096, 256, 128)
d = np.asarray(hbsm.to_dense(A))
ds = ((d + d.T) / 2).astype(np.float32)
ds = ds / max(1.0, 1.05 * np.abs(ds).sum(1).max())
x0 = 0.55 * np.eye(4096, dtype=np.float32) - ds
X1 = hbsm.from_dense(x0, block_size=128)
run_ab(X1, "B3-scale(4096, bw256)")

# >=50k-pair config: near-dense symmetric 6144^2 ~55% blocks.
n = 6144
rng = np.random.default_rng(7)
nb = n // 128
m = rng.standard_normal((n, n)).astype(np.float32) * 0.02
mask = rng.random((nb, nb)) < 0.55
mask = mask | mask.T
m = m * np.kron(mask, np.ones((128, 128), np.float32))
ms = (m + m.T) / 2
ms = ms / max(1.0, 1.05 * np.abs(ms).sum(1).max())
x0 = 0.52 * np.eye(n, dtype=np.float32) - ms
X2 = hbsm.from_dense(x0, block_size=128)
run_ab(X2, f"big-sym({n}, 55%)", n_steps=3)
