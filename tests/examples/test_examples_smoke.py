"""Smoke-test every examples/*.py in offline toy mode (VERDICT r4 #5).

The 9 public examples are entry points a signature drift would rot
silently (the reference's notebooks have the same weakness — untested).
One subprocess runs them all (example_runner.py: shared JAX import and jit
caches — the toy archs overlap across examples, ~57 s cold vs ~85 s as
separate processes; warm runs hit the suite's persistent compile cache),
then one test per example asserts its status, so a failure names the
broken example directly.
"""

import json
import os
from pathlib import Path
import subprocess
import sys

import pytest

REPO = Path(__file__).resolve().parent.parent.parent
EXAMPLE_NAMES = sorted(
    f.stem for f in (REPO / "examples").glob("*.py") if not f.stem.startswith("_")
)


@pytest.fixture(scope="module")
def example_results():
    sys.path.insert(0, str(REPO / "tests"))
    from conftest import _cpu_cache_dir

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tests" / "examples" / "example_runner.py"),
         _cpu_cache_dir()],
        capture_output=True, text=True, timeout=600, env=env,
    )
    results = {}
    for line in proc.stdout.splitlines():
        try:
            d = json.loads(line)
            results[d["name"]] = d
        except (json.JSONDecodeError, KeyError):
            continue
    if not results:
        pytest.fail(
            f"example runner produced no results (rc={proc.returncode}):\n"
            f"{proc.stdout[-1000:]}\n{proc.stderr[-2000:]}"
        )
    return results


@pytest.mark.parametrize("name", EXAMPLE_NAMES)
def test_example_runs(example_results, name):
    assert name in example_results, (
        f"runner crashed before reaching {name}; got "
        f"{sorted(example_results)}"
    )
    res = example_results[name]
    assert res["ok"], f"examples/{name}.py failed:\n{res['error']}"
