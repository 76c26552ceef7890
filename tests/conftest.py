"""Test config: force an 8-virtual-device CPU platform for sharding tests.

Must run before jax initializes its backends, hence the env mutation at
import time (pytest imports conftest before test modules import jax).
"""

import os

# The environment pins JAX_PLATFORMS=axon (tunneled TPU); tests must run on
# a local 8-virtual-device CPU platform: override hard, not setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is compile-bound on XLA:CPU and tests assert numerics, not
# speed: backend optimization level 0 cuts per-program compile ~30%
# (measured 88 -> 63 ms on tiny programs) with identical test results.
if "xla_backend_optimization_level" not in flags:
    flags = flags + " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: the suite is compile-dominated (~150 jitted
# programs); repeat runs skip most of it. The dir is keyed by the host's CPU
# feature set: XLA:CPU stores AOT code, and entries compiled on a different
# machine fail to load (with an error per lookup) — a stale shared dir makes
# the cache silently useless when the build box changes.
def _cpu_cache_dir() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    key = hashlib.sha1(flags.encode()).hexdigest()[:8]
    return os.path.expanduser(f"~/.cache/sonar_tpu_xla_tests-{key}")


jax.config.update(
    "jax_compilation_cache_dir",
    # Override for reproducible COLD runs (point at an empty dir) without
    # clobbering the developer's warm cache.
    os.environ.get("SONAR_TPU_TEST_CACHE_DIR") or _cpu_cache_dir(),
)
# Persist EVERY program (threshold 0): the suite compiles ~190 sub-0.5s
# programs in test_self_goldens alone (~70 ms each); with the default 0.5s
# floor those recompile on every run, warm or cold.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The suite's wall time inflates ~2x as it proceeds: every jitted program
# stays alive in jax's caches, so CPython's generational GC rescans an
# ever-growing object graph on each collection. Nothing in the suite relies
# on cycle collection (refcounting still frees), and the box has RAM to
# spare, so GC is disabled by default; SONAR_TPU_TEST_GC=1 restores it.
if os.environ.get("SONAR_TPU_TEST_GC", "0") != "1":
    import gc

    gc.disable()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# --- compile spy (SONAR_TPU_COMPILE_SPY=1) ----------------------------------
# Per-test XLA program count + compile wall time, written as JSON lines to
# SONAR_TPU_COMPILE_SPY_OUT (default /tmp/compile_spy.jsonl). The suite is
# compile-bound; program COUNT per test file is the cold-start metric (see
# CLAUDE.md "Suite compile economics").
if os.environ.get("SONAR_TPU_COMPILE_SPY", "0") == "1":
    import json
    import time

    import jax._src.compiler as _spy_compiler

    _SPY = {"n": 0, "t": 0.0}
    _spy_real = _spy_compiler.compile_or_get_cached

    def _spy_wrap(*a, **k):
        t0 = time.perf_counter()
        out = _spy_real(*a, **k)
        _SPY["n"] += 1
        _SPY["t"] += time.perf_counter() - t0
        return out

    _spy_compiler.compile_or_get_cached = _spy_wrap
    _SPY_OUT = os.environ.get(
        "SONAR_TPU_COMPILE_SPY_OUT", "/tmp/compile_spy.jsonl"
    )

    @pytest.fixture(autouse=True)
    def _compile_spy(request):
        n0, t0, w0 = _SPY["n"], _SPY["t"], time.perf_counter()
        yield
        rec = {
            "test": request.node.nodeid,
            "programs": _SPY["n"] - n0,
            "compile_s": round(_SPY["t"] - t0, 3),
            "wall_s": round(time.perf_counter() - w0, 3),
        }
        with open(_SPY_OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


# Original shipping bucket set, captured before the autouse coarsening so
# test_batcher.py can still validate the production tuple's invariants.
_REAL_STATIC_LEN_BUCKETS = {}


@pytest.fixture
def real_static_len_buckets():
    return _REAL_STATIC_LEN_BUCKETS["v"]


@pytest.fixture(autouse=True)
def _coarse_static_buckets(monkeypatch):
    """Coarsen the serving static-batching bucket set for the whole suite.

    The shipping fine-grained set (single-token granularity around the
    length mode) is a padding-waste tuning, chip-A/B'd in bench.py — not a
    semantic contract. Each populated bucket costs one toy-encoder XLA
    compile (plus a stacked variant) wherever the static path runs; the
    coarse set keeps every code path (non-pow2 boundaries, tail coarsening,
    max-len cap) while cutting those compiles ~3x. Tests that pass explicit
    ``len_buckets`` are unaffected; batcher boundary logic is covered
    host-only in test_batcher.py against arbitrary bucket sets."""
    import sonar_tpu.inference_pipelines.text as text_mod

    _REAL_STATIC_LEN_BUCKETS.setdefault("v", text_mod.STATIC_LEN_BUCKETS)
    monkeypatch.setattr(
        text_mod, "STATIC_LEN_BUCKETS", (8, 12, 16, 24, 32, 48, 64, 128, 256, 512)
    )
