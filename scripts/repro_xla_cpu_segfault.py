"""Minimal reproducer for the XLA:CPU segfault that forced the
per-module cache-drop workaround in tests/conftest.py (round 3; VERDICT
r3 item 7 asks for the root cause to be pinned or the workaround to be
justified).

Observed in round 3: the full pytest suite deterministically segfaulted
inside XLA:CPU once ~160 compiled executables had accumulated across
modules — same test index on repeated runs, any subset of modules
passed, and dropping JAX's executable caches between modules
(jax.clear_caches) made the full suite stable.

This script isolates the variable: it compiles N DISTINCT tiny programs
(unique shapes force fresh executables — exactly what the suite's many
capacity buckets do), keeping every executable alive in JAX's C++
compilation cache, optionally clearing caches every K programs.

Usage:
  python scripts/repro_xla_cpu_segfault.py [N] [clear_every]
      N            programs to compile+run (default 400)
      clear_every  jax.clear_caches() period, 0 = never (default 0)

Exit by segfault (no traceback) reproduces the round-3 crash; clean
exit means this JAX/XLA build holds N live executables fine.  Run both:
  python scripts/repro_xla_cpu_segfault.py 400 0     # crash candidate
  python scripts/repro_xla_cpu_segfault.py 400 20    # conftest regime
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main(n_programs: int, clear_every: int):
    print(
        f"jax {jax.__version__}, devices={len(jax.devices())}, "
        f"n={n_programs}, clear_every={clear_every}",
        flush=True,
    )
    for i in range(n_programs):
        # Unique shape per iteration -> a fresh executable, mixing the
        # op kinds the suite uses (sort, scatter, matmul, reduction).
        m = 8 + i  # rows
        x = jnp.asarray(
            np.random.default_rng(i).standard_normal((m, 16)),
            jnp.float32,
        )

        @jax.jit
        def prog(x):
            s = jnp.sort(x, axis=0)
            y = jnp.zeros((m + 1, 16), x.dtype).at[jnp.arange(m)].add(s)
            return (y[:-1] @ x.T).sum()

        float(prog(x))
        if clear_every and (i + 1) % clear_every == 0:
            jax.clear_caches()
        if (i + 1) % 25 == 0:
            print(f"  {i + 1} programs OK", flush=True)
    print("clean exit — no segfault at this count", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    main(n, k)
