"""Hardware A/B of the v5 rolling-window kernel vs v4 row-groups vs v3
row-panels on big-band SpGEMM (the shapes v5 was built for: windows too
large for v4's double buffering, so v4 single-buffers and exposes the
whole slab fetch).

Run standalone on the real chip:  python -u scripts/bench_roll.py
Uses bench.py's chained-differential timing protocol (the only valid
one under the axon relay's result caching — see bench.py docstring).

For each shape prints: planner-predicted B traffic per backend, the
measured per-iteration time, ns/pair, and a roll-vs-rows numeric
equivalence check (first hardware validation of v5 — the test suite
runs Pallas in interpret mode only).
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import banded_block_matrix, bench_chained, log  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import hierarchical_block_sparse_lib_tpu as hbsm  # noqa: F401
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_groups import (
        plan_groups,
    )
    from hierarchical_block_sparse_lib_tpu.kernels.pallas_gemm_roll import (
        plan_roll,
    )
    from hierarchical_block_sparse_lib_tpu.ops.spgemm import (
        plan_spgemm_ex,
        spgemm,
    )

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    # (n, half-bandwidth in elements).  b=128 throughout; block band
    # width = 2*hw/b + 1.  hw=512 -> 9-wide band (v4 slab ~9 MB at
    # G=8, single-buffer regime); hw=1024 -> 17-wide (v4 must shrink G
    # or fall off); hw=256 -> 5-wide control where v4 double-buffers
    # comfortably.
    shapes = [(16384, 256), (16384, 512), (16384, 1024), (32768, 512)]
    b = 128

    for n, hw in shapes:
        A = banded_block_matrix(n, hw, b)
        pc, oc, mbr, mcr = plan_spgemm_ex(A, A)
        gplan = plan_groups(A, A)
        rplan = plan_roll(A, A)
        log(
            f"\n== band n={n} hw={hw} (b={b}): nnz={int(A.nnz)} blocks, "
            f"pairs={pc}, out={oc}"
        )
        log(
            "   planner B-traffic (blocks): rows=%d  groups=%s  roll=%s"
            % (
                pc,
                f"{gplan.slab_blocks} (G={gplan.g}, reuse {gplan.reuse:.2f}x)"
                if gplan
                else "n/a",
                f"{rplan.traffic} (G={rplan.g}, buf={rplan.buf}, "
                f"reuse {rplan.reuse:.2f}x)"
                if rplan
                else "n/a (not monotone / no fit)",
            )
        )

        outs = {}
        for backend in ("rows", "groups", "roll"):
            kw = dict(
                pair_cap=max(pc, 1),
                out_cap=max(oc, 1),
                precision="highest",
                backend=backend,
                row_caps=(mbr, mcr),
            )
            if backend == "groups":
                if gplan is None:
                    log(f"   {backend:6s}: no plan, skipped")
                    continue
                kw["group_caps"] = gplan.caps
            if backend == "roll":
                if rplan is None:
                    log(f"   {backend:6s}: no plan, skipped")
                    continue
                kw["roll_caps"] = rplan.caps

            def build(d, kw=kw):
                x = dataclasses.replace(A, data=d)
                out, info = spgemm(x, x, **kw)
                return out.data

            try:
                dt = bench_chained(build, A.data, Ks=(2, 10))
            except Exception as e:  # noqa: BLE001
                log(f"   {backend:6s}: FAILED {e!r}")
                continue
            out, info = spgemm(A, A, **kw)
            assert not bool(np.asarray(info.pair_overflow)), backend
            assert not bool(np.asarray(info.out_overflow)), backend
            # row_overflow covers undersized static caps for the rows/
            # groups/roll kernels (an undersized cap clamps in-kernel and
            # yields silently wrong panels) — never silent (ADVICE.md r2).
            assert not bool(np.asarray(info.row_overflow)), backend
            outs[backend] = np.asarray(jax.device_get(out.data))
            log(
                f"   {backend:6s}: {dt*1e3:8.3f} ms/iter  "
                f"{dt/pc*1e9:7.1f} ns/pair  {pc/dt/1e6:6.2f} Mpairs/s"
            )

        if "rows" in outs:
            for k in ("groups", "roll"):
                if k in outs:
                    ref, got = outs["rows"], outs[k]
                    denom = max(float(np.abs(ref).max()), 1e-30)
                    err = float(np.abs(got - ref).max()) / denom
                    log(f"   {k} vs rows: max rel err {err:.2e}")
                    assert err < 1e-5, (k, err)


if __name__ == "__main__":
    main()
