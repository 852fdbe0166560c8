"""Mosaic compile + correctness probe for the fine kernel at b=16 and
b=64 on the REAL TPU (b=16 has fr=2: dynamic sublane slices at 2-row
granularity — unproven against Mosaic's 8-alignment rule; interpret
mode on CPU cannot catch it).

Run:  python scripts/probe_fine_sizes.py
"""

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
from hierarchical_block_sparse_lib_tpu.ops.spgemm import (
    plan_spgemm_ex,
    spgemm,
)

log = bench.log

if __name__ == "__main__":
    log(f"backend: {jax.default_backend()}")
    for bf, n, dens in ((16, 2048, 0.1), (64, 8192, 0.08), (32, 4096, 0.1)):
        A = bench.random_block_matrix(n, bf, dens, seed=3)
        pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
        try:
            Cf, info = spgemm(
                A, A, pair_cap=pc, out_cap=oc, row_caps=(mbr, mcr),
                backend="fine",
            )
            Cx, _ = spgemm(A, A, pair_cap=pc, out_cap=oc, backend="xla")
            import jax.numpy as jnp

            err = float(
                jnp.max(jnp.abs(Cf.data - Cx.data))
                / jnp.maximum(1e-9, jnp.max(jnp.abs(Cx.data)))
            )
            ok = bool(jnp.all(Cf.ids == Cx.ids))
            log(f"b={bf} (n={n}): ids={ok} max rel={err:.2e} "
                f"pairs={pc}")
            assert ok and err < 1e-5
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            i = msg.find("Mosaic")
            log(f"b={bf}: FAILED {(msg[i:i+200] if i >= 0 else msg[:200])!r}")
