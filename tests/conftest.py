"""Test config: CPU backend with 8 virtual devices (SURVEY.md section 5 —
the TPU world's multi-node-without-a-cluster answer).  Env must be set
before jax initializes a backend."""

import os

# Force CPU even when the session env pins a real accelerator
# (e.g. JAX_PLATFORMS=axon): tests must be fast and hermetic.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session's sitecustomize force-registers an accelerator backend
# (axon) regardless of JAX_PLATFORMS; override at the config level too.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compile cache (VERDICT r3 item 7 — suite runtime):
# the suite's cost is dominated by compiles of hundreds of distinct
# shard_map / Pallas-interpret programs, not by execution.  With the
# cache, reruns load AOT results from disk instead of recompiling; the
# per-module executable-cache drop below still bounds LIVE programs
# (dropped executables reload from here cheaply).  Separate dir from
# the TPU cache; set HBSM_TEST_CACHE="" to disable.
_cache_dir = os.environ.get("HBSM_TEST_CACHE", "/root/.jax_cache_cpu")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# The full suite deterministically segfaulted inside XLA:CPU once ~160
# compiled programs accumulated across modules (round 3: crash at the
# same test index on two runs; any subset of modules passes).  Dropping
# the executable caches between modules keeps the live-program count
# bounded; cross-module compile reuse is minimal anyway (each module
# compiles its own shapes).
#
# Root-cause status (round 4, 2026-08-20): the crash is DETERMINISTIC
# at the same test index (~76% of the suite) in BOTH compile paths —
# with the persistent cache it faults inside
# compilation_cache.get_executable_and_time (AOT deserialization),
# without it inside compiler.backend_compile_and_load (plain compile)
# — so the trigger is REGISTERING the ~Nth executable while ~150
# heavyweight (Pallas-interpret / shard_map) executables are live, not
# any particular program or load path.  400 plain jit executables held
# live do NOT crash (scripts/repro_xla_cpu_segfault.py), so the
# per-executable footprint of the heavy programs matters.  Set
# HBSM_NO_CACHE_DROP=1 to re-test on JAX upgrades (full-suite runs
# under that flag segfaulted on 2026-08-20 with and without
# HBSM_TEST_CACHE; stacks in CLAUDE.md).  Dropping caches is SAFE (not
# just convenient): it only discards compiled executables between
# modules, forcing recompiles — never results; each module compiles
# its own capacity-bucket shapes, so cross-module reuse (and thus the
# cost of dropping) is minimal, and with the persistent cache above
# the recompiles are disk loads.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    if not os.environ.get("HBSM_NO_CACHE_DROP"):
        jax.clear_caches()
