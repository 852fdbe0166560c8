"""Micro-A/B for the LATER-stage routed accumulate (DESIGN.md §8,
round-4: stage 0's empty-accum gather-add is now skipped, but every
later stage still pays ~0.9 ms at B2's union size — the fused
gather-add reads+writes the FULL union capacity even though a stage
touches only its stage_out blocks).

Candidate: frozen stages emit a COMPACT product [stage_out, b, b] and
scatter-add it into the union accumulator via a freeze-time slot map:
    c = c.at[slot_map].add(prod)
This only pays off if XLA performs the scatter-add IN PLACE (donating
c through the chain); if it copies the 290 MB buffer per stage it ties
the gather-add.  This script measures exactly that on the real chip:

  gather-add  — the current formulation: rebuild out = scatter(prod)
                + gather(acc) over the full union capacity
  scatter-add — c.at[idx].add(prod) with c threaded through the
                chained loop (XLA sees a dead c operand -> in-place?)

Shapes from B2's routed stage: union 4415 blocks, stage_out 1231.

Run on the real TPU:  python scripts/bench_scatter_accum.py
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

UNION, STAGE, B = 4415, 1231, 128

if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    c0 = jnp.asarray(rng.standard_normal((UNION, B, B)), jnp.float32)
    prod = jnp.asarray(rng.standard_normal((STAGE, B, B)), jnp.float32)
    idx = jnp.asarray(
        np.sort(rng.choice(UNION, STAGE, replace=False)).astype(np.int32)
    )
    # Inverse map for the gather-add formulation (union slot -> stage
    # slot or STAGE = zero-fill), as the frozen plans precompute it.
    inv = np.full((UNION,), STAGE, np.int32)
    inv[np.asarray(idx)] = np.arange(STAGE, dtype=np.int32)
    inv = jnp.asarray(inv)

    def b_gather(c):
        contrib = jnp.take(prod, inv, axis=0, mode="fill", fill_value=0)
        return c + contrib

    def b_scatter(c):
        return c.at[idx].add(prod)

    res = {}
    for name, fn in (("gather-add", b_gather), ("scatter-add", b_scatter)):
        res[name] = bench.bench_chained(fn, c0, Ks=(5, 45))
        gb = UNION * B * B * 4 / 1e9
        print(
            f"  {name:11s}: t={res[name]*1e3:.3f} ms "
            f"(union buffer {gb:.2f} GB r/w floor "
            f"{2*gb/0.82*1e3:.2f} ms; touched-only floor "
            f"{2*STAGE*B*B*4/1e9/0.82*1e3:.2f} ms)"
        )
    print(f"scatter/gather: {res['scatter-add']/res['gather-add']:.2f}x")
