"""The stdlib lint gate (scripts/lint.py) — positive and negative cases.

Guards the checker itself: the repo-wide run reporting 0 findings is only
meaningful if each error class demonstrably fires, and the scoping rules
(class bodies, comprehensions, walrus, global) demonstrably don't
false-positive on legal Python.
"""

import ast
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "scripts"))
import lint  # noqa: E402


def findings(src: str):
    tree = ast.parse(src)
    c = lint.Checker("<test>")
    c.check_module(tree)
    return [(code, line) for line, code, _ in c.findings]


def codes(src: str):
    return {code for code, _ in findings(src)}


# -- each class fires ------------------------------------------------------

def test_f821_undefined_name():
    assert codes("x = undefined_thing + 1") == {"F821"}


def test_f821_in_function():
    assert codes("def f():\n    return missing\n") == {"F821"}


def test_f632_is_literal():
    assert codes("x = 1\ny = x is 'a'") == {"F632"}
    assert codes("x = 1\ny = x is not 3") == {"F632"}


def test_f631_assert_tuple():
    assert codes("assert (1, 'msg')") == {"F631"}


def test_e999_syntax_error(tmp_path):
    p = tmp_path / "bad.py"
    p.write_text("def f(:\n")
    out = lint.check_file(p)
    assert len(out) == 1 and "E999" in out[0]


def test_f401_unused_import():
    assert codes("import os\nimport sys\nprint(sys.path)\n") == {"F401"}
    assert codes("from collections import deque\n") == {"F401"}


def test_f401_exemptions(tmp_path):
    # used, __all__, re-export alias, __future__, string annotation
    assert codes(
        "from __future__ import annotations\n"
        "import os\n"
        "from typing import Optional as Optional\n"
        "from collections import deque\n"
        "import numpy\n"
        "__all__ = ['numpy']\n"
        "def f(q: 'deque[int]') -> None:\n"
        "    print(os.sep)\n"
    ) == set()
    # noqa suppression and __init__.py exemption go through check_file
    p = tmp_path / "mod.py"
    p.write_text("import os  # noqa\nimport sys\n")
    out = lint.check_file(p)
    assert len(out) == 1 and "'sys'" in out[0]
    ini = tmp_path / "__init__.py"
    ini.write_text("import os\nimport sys\n")
    assert lint.check_file(ini) == []


# -- legal Python does not false-positive ----------------------------------

def test_no_fp_basics():
    assert codes(
        "import os\n"
        "from sys import path as p\n"
        "x = os.sep + p[0]\n"
        "def f(a, b=x, *args, **kw):\n"
        "    c = a + b\n"
        "    return c, args, kw\n"
        "class K:\n"
        "    attr = x\n"
        "    def m(self):\n"
        "        return self.attr\n"
    ) == set()


def test_no_fp_comprehension_and_walrus():
    assert codes(
        "data = [1, 2]\n"
        "sq = [v * v for v in data if v]\n"
        "d = {k_: v_ for k_, v_ in zip(data, data)}\n"
        "if (n := len(data)) > 1:\n"
        "    print(n)\n"
        "g = (w for w in data)\n"
        "total = sum(x2 for x2 in g)\n"
    ) == set()


def test_no_fp_global_nonlocal_try_with_match():
    assert codes(
        "COUNT = 0\n"
        "def bump():\n"
        "    global COUNT\n"
        "    COUNT += 1\n"
        "def outer():\n"
        "    v = 0\n"
        "    def inner():\n"
        "        nonlocal v\n"
        "        v += 1\n"
        "    inner()\n"
        "    return v\n"
        "try:\n"
        "    import json\n"
        "except ImportError as e:\n"
        "    print(e)\n"
        "print(json.dumps({}))\n"
        "with open('/dev/null') as fh:\n"
        "    fh.read()\n"
        "match [1, 2]:\n"
        "    case [a, *rest]:\n"
        "        print(a, rest)\n"
        "for i in range(3):\n"
        "    pass\n"
        "print(i)\n"
    ) == set()


def test_class_scope_invisible_to_methods():
    # legal: method reads module global; illegal: method reads class attr
    # by bare name (NameError at runtime) — flagged.
    assert codes(
        "class K:\n"
        "    attr = 1\n"
        "    def m(self):\n"
        "        return attr\n"
    ) == {"F821"}


def test_star_import_disables_f821():
    assert codes("from os.path import *\nx = join('a', 'b')\n") == set()


def test_lambda_and_decorator_scopes():
    assert codes(
        "import functools\n"
        "f = lambda q, r=2: q + r\n"
        "@functools.lru_cache(maxsize=None)\n"
        "def g(z):\n"
        "    return f(z)\n"
    ) == set()


# -- annotation coverage (the py.typed promise, ANN001/ANN201) --------------

def ann_codes(src: str):
    return {code for _, code, _ in lint.check_annotations(ast.parse(src))}


def test_ann_public_function_gaps():
    assert ann_codes("def f(x):\n    return x\n") == {"ANN001", "ANN201"}
    assert ann_codes("def f(x: int) -> int:\n    return x\n") == set()


def test_ann_scope_rules():
    # private functions, nested defs, and private classes are exempt;
    # __init__ needs params but no return; self/cls never need annotations
    src = (
        "def _private(x):\n    return x\n"
        "def outer() -> None:\n"
        "    def inner(y):\n        return y\n"
        "class _Private:\n"
        "    def method(self, z):\n        return z\n"
        "class Public:\n"
        "    def __init__(self, a: int):\n        self.a = a\n"
        "    def ok(self) -> int:\n        return self.a\n"
        "    @classmethod\n"
        "    def make(cls, b: int) -> 'Public':\n        return cls(b)\n"
    )
    assert ann_codes(src) == set()


def test_ann_kwargs_and_vararg_need_annotations():
    assert ann_codes("def f(*args, **kw) -> None:\n    pass\n") == {"ANN001"}
    assert ann_codes(
        "def f(*args: int, **kw: str) -> None:\n    pass\n"
    ) == set()


def test_ann_only_applies_under_sonar_tpu(tmp_path):
    # scripts/tests are out of scope for the coverage gate
    p = tmp_path / "free.py"
    p.write_text("def f(x):\n    return x\n")
    assert lint.check_file(p) == []


# -- import-order gate (I001, the isort --check class) ----------------------

def i001(tmp_path, src: str, name: str = "mod.py"):
    p = tmp_path / name
    p.write_text(src)
    return [f for f in lint.check_file(p) if "I001" in f], p


def test_i001_fires_on_unsorted_and_ungrouped(tmp_path):
    # within-group order violation
    out, _ = i001(tmp_path, "import sys\nimport os\nprint(os, sys)\n")
    assert len(out) == 1
    # group order violation: third-party before stdlib
    out, _ = i001(tmp_path, "import numpy\nimport os\nprint(numpy, os)\n")
    assert len(out) == 1
    # missing blank line between groups
    out, _ = i001(tmp_path, "import os\nimport numpy\nprint(numpy, os)\n")
    assert len(out) == 1


def test_i001_clean_block_passes(tmp_path):
    src = (
        '"""doc."""\n'
        "from __future__ import annotations\n\n"
        "import os\n"
        "from pathlib import Path\n"
        "import sys\n\n"
        "import numpy\n\n"
        "import sonar_tpu\n\n"
        "print(os, Path, sys, numpy, sonar_tpu)\n"
    )
    out, _ = i001(tmp_path, src)
    assert out == []


def test_i001_fix_is_canonical_and_idempotent(tmp_path):
    src = (
        '"""doc."""\n'
        "# leading comment attached to numpy\n"
        "import numpy\n"
        "import sys\n"
        "import os  # trailing comment kept\n"
        "from collections import (\n"
        "    OrderedDict,\n"
        "    deque,\n"
        ")\n"
        "print(numpy, sys, os, OrderedDict, deque)\n"
    )
    p = tmp_path / "mod.py"
    p.write_text(src)
    assert lint.check_file(p, fix=True) == []
    fixed = p.read_text()
    # groups ordered, blank line between, comments preserved
    assert fixed.index("collections") < fixed.index("import os")
    assert fixed.index("import os") < fixed.index("import sys")
    assert fixed.index("import sys") < fixed.index("import numpy")
    assert "# leading comment attached to numpy\nimport numpy" in fixed
    assert "import os  # trailing comment kept" in fixed
    # section break goes before the attached comment
    assert "\n\n# leading comment attached to numpy\nimport numpy" in fixed
    # idempotent: a second canonicalization is a no-op
    assert lint.canonical_import_block(fixed, p) is None
    # and the fixed module still parses
    ast.parse(fixed)


def test_i001_exemptions(tmp_path):
    # __init__.py: deliberate ordering is allowed
    out, _ = i001(tmp_path, "import sys\nimport os\nprint(os, sys)\n",
                  name="__init__.py")
    assert out == []
    # explicit keep-order marker
    out, _ = i001(
        tmp_path,
        "import sys  # lint: keep-order\nimport os\nprint(os, sys)\n",
    )
    assert out == []
    # single import: nothing to order
    out, _ = i001(tmp_path, "import os\nprint(os)\n")
    assert out == []


def test_i001_future_import_stays_first(tmp_path):
    # (a future import after another import is a SyntaxError, so only the
    # "already first" case is reachable — the fixer must keep it there,
    # in its own section, even though e.g. "argparse" sorts before it)
    src = (
        "from __future__ import annotations\n"
        "import sys\n"
        "import argparse\n"
        "print(argparse, sys)\n"
    )
    p = tmp_path / "mod.py"
    p.write_text(src)
    lint.check_file(p, fix=True)
    fixed = p.read_text()
    assert fixed.startswith("from __future__ import annotations\n\nimport argparse\n")
    ast.parse(fixed)


def test_i001_file_header_comment_not_absorbed(tmp_path):
    src = (
        "#!/usr/bin/env python\n"
        "import sys\n"
        "import os\n"
        "print(os, sys)\n"
    )
    p = tmp_path / "mod.py"
    p.write_text(src)
    lint.check_file(p, fix=True)
    fixed = p.read_text()
    assert fixed.startswith("#!/usr/bin/env python\nimport os\nimport sys\n")


def test_i001_relative_imports_are_first_party(tmp_path):
    pkg = tmp_path / "pkg"
    pkg.mkdir()
    src = (
        "from .sibling import thing\n"
        "import os\n"
        "print(os, thing)\n"
    )
    p = pkg / "mod.py"
    p.write_text(src)
    fixed = lint.canonical_import_block(src, p)
    assert fixed is not None
    assert fixed.index("import os") < fixed.index(".sibling")


def test_i001_fix_fuzz_preserves_imports(tmp_path):
    """Property test of the fixer: for random import blocks, the fixed
    source parses, contains exactly the same import statements (as a
    multiset), keeps every comment line, and is idempotent."""
    import random

    rng = random.Random(20260819)
    modules = [
        ("os", 0), ("sys", 0), ("re", 0), ("pathlib", 0), ("json", 0),
        ("numpy", 1), ("jax", 1), ("jax.numpy", 1), ("torch", 1),
        ("sonar_tpu", 2), ("sonar_tpu.nn", 2),
    ]
    p = tmp_path / "mod.py"
    for trial in range(40):
        n = rng.randint(2, 8)
        lines = []
        if rng.random() < 0.3:
            lines.append('"""doc."""')
        for k in range(n):
            mod, _ = rng.choice(modules)
            if rng.random() < 0.25:
                lines.append(f"# comment {trial}.{k}")
            style = rng.random()
            if style < 0.4:
                lines.append(f"import {mod}")
            elif style < 0.7:
                alias = f"a{k}"
                lines.append(f"import {mod} as {alias}")
            elif style < 0.85:
                lines.append(f"from {mod} import path as p{k}")
            else:
                lines.append(
                    f"from {mod} import (\n    path as q{k},\n    sep as s{k},\n)"
                )
            if rng.random() < 0.2:
                lines.append("")
        lines.append("x = 1")
        src = "\n".join(lines) + "\n"
        fixed = lint.canonical_import_block(src, p)
        if fixed is None:
            continue  # already canonical
        tree_before, tree_after = ast.parse(src), ast.parse(fixed)

        def import_dumps(tree):
            return sorted(
                ast.dump(st)
                for st in ast.walk(tree)
                if isinstance(st, (ast.Import, ast.ImportFrom))
            )

        assert import_dumps(tree_before) == import_dumps(tree_after), src
        for ln in src.splitlines():
            if ln.lstrip().startswith("#"):
                assert ln in fixed, (src, fixed)
        assert lint.canonical_import_block(fixed, p) is None, (src, fixed)


# -- the repo itself is clean (the actual gate) -----------------------------

def test_repo_is_clean():
    root = Path(__file__).resolve().parents[2]
    bad = []
    for rel in ("sonar_tpu", "scripts", "bench.py", "__graft_entry__.py"):
        p = root / rel
        files = sorted(p.rglob("*.py")) if p.is_dir() else [p]
        for f in files:
            bad.extend(lint.check_file(f))
    assert not bad, "\n".join(bad)
