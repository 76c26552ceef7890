#!/usr/bin/env bash
# One-command CI gate: lint + bytecode-compile + (mypy if present) + unit
# suite. Mirrors the reference's lint_and_test workflow
# (/root/reference/.github/workflows/lint_and_test.yml): flake8
# E9,F63,F7,F82 -> scripts/lint.py (stdlib AST implementation of the same
# error classes; this environment has no flake8/mypy and no network), mypy
# -> run when available, pytest -> the CPU unit suite.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== lint (E9/F63/F7/F82 classes, stdlib) =="
python scripts/lint.py

echo "== bytecode compile (all sources) =="
python -m compileall -q sonar_tpu tests scripts benchmarks examples \
    bench.py __graft_entry__.py

if python -c "import mypy" 2>/dev/null; then
    echo "== mypy (sonar_tpu) =="
    python -m mypy sonar_tpu
else
    echo "== mypy: not installed in this environment; skipped =="
fi

echo "== unit tests (CPU) =="
python -m pytest tests/unit -q -x "$@"
