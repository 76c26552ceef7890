"""utils/profiling.py — the tracing/profiling subsystem (SURVEY §5 row 1;
the reference has none, so these are capability tests, not parity tests)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from sonar_tpu.utils.profiling import Timer, annotate, trace


def test_timer_measures_and_aggregates() -> None:
    t = Timer()
    x = jnp.arange(8, dtype=jnp.float32)
    p50 = t.measure(lambda v: v + 1.0, x, iters=5)
    assert len(t.samples) == 5
    assert p50 > 0.0 and np.isfinite(p50)
    assert t.best <= t.p50
    assert t.p50 == sorted(t.samples)[2]


def test_timer_empty_is_nan() -> None:
    t = Timer()
    assert np.isnan(t.p50) and np.isnan(t.best)


def test_annotate_is_usable_as_context() -> None:
    x = jnp.ones((4,), dtype=jnp.float32)
    with annotate("unit-test-region"):
        y = x * 2.0
    assert float(y.sum()) == 8.0


def test_trace_writes_profile(tmp_path: Path) -> None:
    with trace(str(tmp_path)):
        _ = np.asarray(jnp.arange(4, dtype=jnp.float32) + 1.0)
    # jax writes plugins/profile/<ts>/*.xplane.pb under the log dir
    written = list(tmp_path.rglob("*"))
    assert any(p.is_file() for p in written), written
