"""Benchmark suite (BASELINE.md B1-B4) on the real TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Detail for every config goes to stderr.

Headline metric: effective GFLOP/s on the B2 hierarchical SpGEMM
(random block-sparse 16384^2, 5% block density).  "Effective" counts
2*b^3 FLOPs per enumerated nnz-block pair (the reference's
no_of_block_multiplies counter; BASELINE.json:2).

`vs_baseline`: the reference publishes no numbers (BASELINE.json:13
"published": {}), so vs_baseline reports the speedup over computing the
same product DENSELY on the same chip at the same precision — the
honest stand-in for "is the hierarchical format winning".

Block-size mapping: the reference's CPU leaves are 16/32; on TPU the
same logical leaves are aggregated into MXU-sized 128 tiles
(SURVEY.md section 8.5), so configs are generated at 128-block
granularity with the stated block density.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, n_iter=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n_iter


def random_block_matrix(n, b, density, seed=0, dtype=np.float32):
    import jax.numpy as jnp
    import hierarchical_block_sparse_lib_tpu as hbsm

    rng = np.random.default_rng(seed)
    nb = n // b
    n_blocks = max(1, int(round(density * nb * nb)))
    chosen = np.sort(
        rng.choice(nb * nb, n_blocks, replace=False)
    ).astype(np.int32)
    data = rng.standard_normal((n_blocks, b, b)).astype(dtype)
    return hbsm.BlockMatrix(
        ids=jnp.asarray(chosen),
        data=jnp.asarray(data),
        nnz=jnp.asarray(n_blocks, jnp.int32),
        n_rows=n,
        n_cols=n,
        block_size=b,
    )


def banded_block_matrix(n, bw, b, seed=0):
    import hierarchical_block_sparse_lib_tpu as hbsm
    from hierarchical_block_sparse_lib_tpu.utils import generators as gen

    r, c, v = gen.banded_coo(n, bw, seed=seed)
    base = 16 if b % 16 == 0 and b > 16 else b
    m = hbsm.from_coo(r, c, v, n, block_size=base)
    if base != b:
        m = hbsm.coarsen(m, b // base)
    return m


def bench_spgemm(A, name, n_iter=10, backend="pallas", precision="highest"):
    import jax
    import hierarchical_block_sparse_lib_tpu as hbsm
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm

    n_pairs, n_out = plan_spgemm(A, A)
    b = A.block_size

    def run():
        C, info = hbsm.spgemm(
            A, A, pair_cap=n_pairs, out_cap=n_out,
            backend=backend, precision=precision,
        )
        return C.data

    dt = timeit(run, n_iter=n_iter)
    eff_gflops = 2 * b**3 * n_pairs / dt / 1e9
    pairs_per_s = n_pairs / dt
    log(
        f"{name}: blocks={int(A.nnz)} pairs={n_pairs} out={n_out} "
        f"t={dt*1e3:.2f} ms eff={eff_gflops:.1f} GFLOP/s "
        f"nnz-block-GEMMs/s={pairs_per_s:,.0f}"
    )
    return dict(
        name=name, pairs=int(n_pairs), out=int(n_out), time_s=dt,
        eff_gflops=eff_gflops, pairs_per_s=pairs_per_s,
    )


def bench_dense_equiv(n, n_iter=5, precision="highest"):
    """Dense matmul of the same order, same precision: the vs_baseline."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    )
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    f = jax.jit(lambda a: a @ a if prec is None else jnp.matmul(a, a, precision=prec))
    dt = timeit(lambda: f(x), n_iter=n_iter)
    gflops = 2 * n**3 / dt / 1e9
    log(f"dense {n}x{n} ({precision}): t={dt*1e3:.2f} ms -> {gflops:.0f} GFLOP/s")
    return dt, gflops


def bench_truncation_pipeline(n_iter=3):
    """B3: repeated C = A*A with norm-based dropping (BASELINE.json:9)."""
    import jax
    import hierarchical_block_sparse_lib_tpu as hbsm
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import plan_spgemm
    from hierarchical_block_sparse_lib_tpu.models.purification import sp2_step

    n, b = 4096, 128
    A = banded_block_matrix(n, 256, b)
    A = hbsm.scale(A, 1.0 / float(np.sqrt(float(hbsm.frob_squared(A)))))
    A = hbsm.add(A, hbsm.eye(n, b), beta=0.5, cap=A.cap + n // b)
    pc, oc = plan_spgemm(A, A)
    pair_cap, out_cap = 4 * pc, 4 * oc

    def run():
        x = A
        for _ in range(5):
            x, stats = sp2_step(
                x, tau=1e-6, pair_cap=pair_cap, out_cap=out_cap,
                target_trace=n / 2,
            )
        return x.data

    dt = timeit(run, n_iter=n_iter, warmup=1)
    log(f"B3 truncation pipeline (5 sp2 steps @ {n}, b={b}): {dt*1e3:.1f} ms/iter")
    return dict(name="B3", time_s=dt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()

    import jax

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    results = {}

    if args.quick:
        A2 = random_block_matrix(4096, 128, 0.05, seed=2)
        results["B2"] = bench_spgemm(A2, "B2-quick(4096, 5%)",
                                     backend=args.backend,
                                     precision=args.precision)
        dense_t, dense_rate = bench_dense_equiv(4096, precision=args.precision)
        dense_equiv_t = dense_t
    else:
        # B1: banded 4096^2, bandwidth 64 (logical leaf 16 -> 128 tiles)
        A1 = banded_block_matrix(4096, 64, 128)
        results["B1"] = bench_spgemm(A1, "B1 banded(4096, bw64)",
                                     backend=args.backend,
                                     precision=args.precision)
        # B2: random block-sparse 16384^2, 5% block density
        A2 = random_block_matrix(16384, 128, 0.05, seed=2)
        results["B2"] = bench_spgemm(A2, "B2 random(16384, 5%)",
                                     backend=args.backend,
                                     precision=args.precision)
        # B3: truncation pipeline
        results["B3"] = bench_truncation_pipeline()
        # B4: near-dense 16384^2 at 50% — batched-leaf vs pure dense GEMM
        A4 = random_block_matrix(16384, 128, 0.5, seed=4)
        results["B4"] = bench_spgemm(A4, "B4 near-dense(16384, 50%)",
                                     n_iter=3,
                                     backend=args.backend,
                                     precision=args.precision)
        dense_t, dense_rate = bench_dense_equiv(16384, precision=args.precision)
        dense_equiv_t = dense_t

    b2 = results["B2"]
    # vs_baseline: sparse wall time vs dense wall time for the same
    # logical product (dense does 2n^3 flops; sparse does only the
    # stored-block pairs).  >1 means the hierarchical format wins.
    vs = dense_equiv_t / b2["time_s"]
    print(
        json.dumps(
            {
                "metric": "B2_hierarchical_spgemm_effective_gflops",
                "value": round(b2["eff_gflops"], 1),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
