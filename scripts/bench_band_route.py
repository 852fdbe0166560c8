"""Cost of routing a banded BlockMatrix through the band tier
end-to-end (VERDICT r4 item 7: should `matmul` auto-route?):
band_from_blocks (host-planned scatter) + band_mm + band_to_blocks vs
the block path, eager walls AND chained band_mm, at B1's shape.

Run on the real TPU:  python scripts/bench_band_route.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np

import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.ops import band as bd
from hierarchical_block_sparse_lib_tpu.utils import generators as gen

log = bench.log


def wall(f, reps=5):
    f()  # warm (compile)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    log(f"backend: {jax.default_backend()}")
    n, bw = 4096, 64
    r, c, v = gen.banded_coo(n, bw, seed=0)
    A16 = hbsm.from_coo(r, c, v, n, block_size=16)

    t_pack = wall(lambda: bd.band_from_blocks(A16, bw))
    Ab = bd.band_from_blocks(A16, bw)
    t_mm = wall(lambda: bd.band_mm(Ab, Ab))
    Cb = bd.band_mm(Ab, Ab)
    t_unpack = wall(lambda: bd.band_to_blocks(Cb, block_size=16))
    log(
        f"band route (eager walls): pack={t_pack*1e3:.1f} ms  "
        f"mm={t_mm*1e3:.2f} ms  unpack={t_unpack*1e3:.1f} ms  "
        f"total={(2*t_pack+t_mm+t_unpack)*1e3:.1f} ms"
    )

    t_block = wall(lambda: hbsm.matmul(A16, A16)[0].data)
    log(f"block path matmul (eager wall, incl host plan): "
        f"{t_block*1e3:.1f} ms")

    # The amortized (fixed-structure) regime: band_mm chained.
    import dataclasses

    def build(p):
        m = dataclasses.replace(Ab, panels=p)
        return bd.band_mm(m, m).panels.sum().reshape(1)

    dtc = bench.bench_chained(build, Ab.panels, Ks=(10, 510))
    log(f"band_mm chained: {dtc*1e6:.1f} us/iter")


if __name__ == "__main__":
    main()
