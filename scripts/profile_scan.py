"""Ablate purify_scan's per-step fixed costs (the ~3 ms/step gap flagged
in CLAUDE.md round 3: planned scan per-iter 19.1 ms at big-sym scale vs
13.65 ms raw planned spgemm — where do the other ~5.5 ms go?).

Five variants of the SAME planned SP2 trajectory (6144^2, 55% blocks,
110592 pairs/step), each timed with bench.bench_chained (chained
differential timing — the only trustworthy protocol on this chip):

  bare    = scan of [spgemm(accum, plan)] only; carry = head-slice to cap
  notrace = bare + truncate(tau, cap=)      (adds norms+cumsum+scatter)
  notrunc = bare + trace->blend             (adds trace + dynamic alpha/beta)
  full    = trace->blend + spgemm + truncate  == sp2_step planned, in scan
  eager   = ONE jitted sp2_step chained (no lax.scan around it)

full - notrace   = cost of the trace/blend
full - notrunc   = cost of truncate(cap=)
bare - raw-spgemm-in-chain = scan machinery + head-slice copy
eager vs full    = lax.scan wrapper cost per step

Timing-only ablations: variants with constant alpha/beta or no
truncation leave the planned trajectory numerically (plan_mismatch is
expected and ignored) — shapes and structural work are identical, which
is what's being measured.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

import bench
import hierarchical_block_sparse_lib_tpu as hbsm
from hierarchical_block_sparse_lib_tpu.models.purification import (
    plan_purify, profile_purify, purify_scan,
)
from hierarchical_block_sparse_lib_tpu.ops.norms import trace
from hierarchical_block_sparse_lib_tpu.ops.repack import repack
from hierarchical_block_sparse_lib_tpu.ops.spgemm import spgemm
from hierarchical_block_sparse_lib_tpu.ops.truncate import truncate

N_STEPS = 3
TAU = 1e-7


def build_input(n=6144, density=0.55, seed=7):
    rng = np.random.default_rng(seed)
    nb = n // 128
    m = rng.standard_normal((n, n)).astype(np.float32) * 0.02
    mask = rng.random((nb, nb)) < density
    mask = mask | mask.T
    m = m * np.kron(mask, np.ones((128, 128), np.float32))
    ms = (m + m.T) / 2
    ms = ms / max(1.0, 1.05 * np.abs(ms).sum(1).max())
    x0 = 0.52 * np.eye(n, dtype=np.float32) - ms
    return hbsm.from_dense(x0, block_size=128)


def make_variant(variant, prof, plans, nocc, x_cap):
    pc, oc, cap, rc = prof.pair_cap, prof.out_cap, prof.cap, prof.row_caps

    def step(x, pl):
        if variant in ("full", "full_unroll", "notrunc"):
            t = trace(x)
            s = (t > nocc).astype(x.dtype)
            alpha, beta = 2.0 * s - 1.0, 2.0 - 2.0 * s
        else:
            alpha, beta = -1.0, 2.0
        y, info = spgemm(
            x, x, pair_cap=pc, out_cap=oc, row_caps=rc,
            accum=x, alpha=alpha, beta=beta, plan=pl,
        )
        if variant in ("full", "full_unroll", "notrace"):
            y, _kept = truncate(y, TAU, cap=cap)
        else:
            y = dataclasses.replace(
                x, ids=y.ids[:cap], data=y.data[:cap],
                nnz=jnp.minimum(y.nnz, cap),
            )
        return y, info.n_block_pairs

    unroll = N_STEPS if variant.endswith("_unroll") else 1

    @jax.jit
    def run(data):
        x = dataclasses.replace(x_cap, data=data)
        xf, _ = jax.lax.scan(
            step, x, plans.plans, length=N_STEPS, unroll=unroll
        )
        return xf.data

    return run


if __name__ == "__main__":
    X = build_input()
    nocc = X.n_rows // 4
    prof = profile_purify(X, N_STEPS, tau=TAU, target_trace=nocc)
    plans = plan_purify(X, N_STEPS, TAU, prof, target_trace=nocc)
    X_CAP = repack(X, prof.cap)
    print(
        f"config: {X.n_rows}^2, cap={prof.cap} out_cap={prof.out_cap} "
        f"pair_cap={prof.pair_cap} pairs/step={prof.per_step_pairs}"
    )

    res = {}
    for variant in ("bare", "notrace", "notrunc", "full", "full_unroll"):
        run = make_variant(variant, prof, plans, nocc, X_CAP)
        try:
            dt = bench.bench_chained(run, X_CAP.data, Ks=(2, 4)) / N_STEPS
        except Exception as e:  # noqa: BLE001
            # The K=2 executable of the UNROLLED scan variant
            # reproducibly crashes the XLA:TPU compiler
            # (scatter_emitter.cc:2824 variadic-scatter check, round 5)
            # — the same latent bug profile_routed_1dev.py documents.
            # Non-essential: unroll measured neutral in round 3, and
            # the bare/notrace/notrunc/full decomposition is the
            # evidence this script exists for.
            print(f"{variant:8s}: FAILED {str(e)[:120]!r}")
            continue
        res[variant] = dt
        print(f"{variant:8s}: {dt * 1e3:8.2f} ms/step")

    # Cross-check: the real purify_scan (same planned program).
    kw = dict(target_trace=nocc, **prof.kwargs())

    def run_ps(d):
        m = dataclasses.replace(X, data=d)
        y, _ = purify_scan(m, N_STEPS, tau=TAU, plans=plans, **kw)
        return y.data

    dt = bench.bench_chained(run_ps, X.data, Ks=(1, 4)) / N_STEPS
    res["purify_scan"] = dt
    print(f"{'purify_scan':8s}: {dt * 1e3:8.2f} ms/step")

    # Eager (no lax.scan): one planned sp2_step, chained.
    from hierarchical_block_sparse_lib_tpu.models.purification import sp2_step

    pl0 = jax.tree.map(lambda v: v[0], plans.plans)

    def run_eager(d):
        m = dataclasses.replace(X_CAP, data=d)
        y, _ = sp2_step(
            m, TAU, pair_cap=prof.pair_cap, out_cap=prof.out_cap,
            target_trace=nocc, cap=prof.cap, row_caps=prof.row_caps,
            plan=pl0,
        )
        return y.data

    dt = bench.bench_chained(run_eager, X_CAP.data, Ks=(1, 4))
    res["eager"] = dt
    print(f"{'eager':8s}: {dt * 1e3:8.2f} ms/step")

    print("\n--- attribution (ms/step) ---")
    print(f"trace/blend : {(res['full'] - res['notrace']) * 1e3:7.2f}")
    print(f"truncate    : {(res['full'] - res['notrunc']) * 1e3:7.2f}")
    print(f"scan-vs-eager: {(res['full'] - res['eager']) * 1e3:7.2f}")
    print(f"bare scan   : {res['bare'] * 1e3:7.2f}")

    # --- Micro-bench: scatter- vs gather-based block compaction.
    # truncate() compacts with `zeros.at[slot].set(data)` (block-tensor
    # scatter).  Hypothesis: XLA serializes the block scatter on TPU,
    # while a tiny int32 scatter to invert the slot map + ONE block
    # gather (`data[src]`) vectorizes — same pass count over HBM.
    oc, cap = prof.out_cap, prof.cap
    d0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((oc, 128, 128)),
        jnp.float32,
    )
    keep0 = jnp.asarray(np.random.default_rng(1).random(oc) < 0.7)

    def compact_scatter(d):
        keep = keep0 & (d[:, 0, 0] > -1e30)
        slot = jnp.where(keep, jnp.cumsum(keep) - 1, cap).astype(jnp.int32)
        return jnp.zeros((cap, 128, 128), d.dtype).at[slot].set(
            d, mode="drop"
        )

    def compact_gather(d):
        keep = keep0 & (d[:, 0, 0] > -1e30)
        slot = jnp.where(keep, jnp.cumsum(keep) - 1, cap).astype(jnp.int32)
        src = (
            jnp.full((cap,), oc, jnp.int32)
            .at[slot]
            .set(jnp.arange(oc, dtype=jnp.int32), mode="drop")
        )
        return jnp.take(d, src, axis=0, mode="fill", fill_value=0)

    for name, fn in (("scatter", compact_scatter), ("gather", compact_gather)):
        dt = bench.bench_chained(jax.jit(fn), d0, Ks=(2, 16))
        print(f"compact/{name:7s}: {dt * 1e3:8.3f} ms  "
              f"({2 * oc * 128 * 128 * 4 / dt / 1e9:.0f} GB/s eff)")
