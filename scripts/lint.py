#!/usr/bin/env python
"""Stdlib-only lint gate matching the reference CI's error classes.

The reference gates merges on ``flake8 --select=E9,F63,F7,F82`` plus mypy
(/root/reference/.github/workflows/lint_and_test.yml:13-44). This
environment ships neither flake8 nor mypy and installs are unavailable, so
this module implements the same error classes with ``ast`` + ``compile``:

- E9 / F7 (syntax errors, ``break`` outside loop, ...): ``compile()`` per
  file — CPython raises on exactly this class.
- F63 (invalid comparisons): ``is``/``is not`` against str/bytes/int/float
  literals (F632), assert on a non-empty tuple literal (F631), comparison
  chains whose both sides are constants (F634-ish guard skipped — too many
  legitimate uses in tests).
- F401 (unused imports): an imported name with no Load anywhere in the
  module is flagged. Convention-aware: ``__init__.py`` files are exempt
  (re-export surface), as are ``import x as x`` explicit re-exports, names
  listed in ``__all__``, and identifiers inside string annotations (lazy
  ``from __future__ import annotations`` code quotes types manually too).
- I001 (un-sorted import block — the isort --check class of the reference
  CI, lint_and_test.yml:25-33): the leading module-level import block must
  be grouped stdlib < third-party < first-party (one blank line between
  groups) and sorted within each group by module name, ``import x`` before
  ``from x import y`` for the same module — isort's default profile.
  ``__init__.py`` files are exempt (import order there legitimately
  resolves circular imports), as is any file whose block carries an
  ``isort:`` or ``lint: keep-order`` marker. ``--fix`` rewrites the block
  canonically in place, preserving every comment line (comments attach to
  the import that follows them). Scope limits vs real isort: only the
  leading block is normalized (imports after the first non-import
  statement often have deliberate ordering, e.g. config-before-import),
  multi-name ``import a, b`` statements are not split, and names inside a
  ``from x import (...)`` list are left as written.
- F82 (undefined names, F821): flow-insensitive two-pass scope analysis —
  collect every binding per scope (imports, assignments, walrus, function/
  class defs, arguments, for/with/except/match targets, comprehension
  targets), then resolve every Load against the lexical scope chain with
  Python's actual rules (class scopes are skipped when resolving from
  nested functions; comprehensions are their own scope; ``global``/
  ``nonlocal`` redirect). A module containing ``import *`` opts out of
  F821 (unknowable), as in pyflakes.

Zero third-party dependencies so it runs in any environment. Exit code 0
iff no findings. Usage: ``python scripts/lint.py [--fix] [paths...]``
(defaults to the whole repo; ``--fix`` rewrites I001 import blocks).
"""

from __future__ import annotations

import ast
import builtins
from pathlib import Path
import re
import sys

BUILTINS = set(dir(builtins)) | {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__path__", "__all__",
    "__version__", "__annotations__", "__dict__", "__class__",
    # pytest injects these into rewritten test modules
    "__tracebackhide__",
}


class Scope:
    __slots__ = ("node", "bindings", "parent", "globals", "nonlocals")

    def __init__(self, node: ast.AST, parent: "Scope | None"):
        self.node = node
        self.bindings: set[str] = set()
        self.parent = parent
        self.globals: set[str] = set()
        self.nonlocals: set[str] = set()

    @property
    def is_class(self) -> bool:
        return isinstance(self.node, ast.ClassDef)

    @property
    def is_comprehension(self) -> bool:
        return isinstance(
            self.node, (ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp)
        )


def _bind_target(scope: Scope, target: ast.AST) -> None:
    """Bind every plain name in an assignment-like target."""
    for node in ast.walk(target):
        if isinstance(node, ast.Name) and isinstance(
            node.ctx, (ast.Store, ast.Del)
        ):
            scope.bindings.add(node.id)
        elif isinstance(node, ast.MatchAs) and node.name:
            scope.bindings.add(node.name)
        elif isinstance(node, ast.MatchStar) and node.name:
            scope.bindings.add(node.name)
        elif isinstance(node, ast.MatchMapping) and node.rest:
            scope.bindings.add(node.rest)


class Checker(ast.NodeVisitor):
    """Two passes per scope: bind first, then resolve loads."""

    def __init__(self, path: str, check_unused_imports: bool = True):
        self.path = path
        self.findings: list[tuple[int, str, str]] = []
        self.scope: Scope | None = None
        self.has_star_import = False
        self.check_unused_imports = check_unused_imports
        # name -> (lineno, display) for every import binding; names with a
        # Load anywhere (or in __all__ / string annotations) are removed.
        self.imports: dict[str, tuple[int, str]] = {}
        self.used_names: set[str] = set()

    # -- plumbing ---------------------------------------------------------

    def err(self, node: ast.AST, code: str, msg: str) -> None:
        self.findings.append((getattr(node, "lineno", 0), code, msg))

    def _walrus_scope(self) -> Scope:
        """``:=`` binds in the nearest enclosing non-comprehension scope."""
        s = self.scope
        assert s is not None
        while s.is_comprehension and s.parent is not None:
            s = s.parent
        return s

    def _collect_bindings(self, scope_node: ast.AST, body: list[ast.stmt]) -> None:
        """Pass 1: every statement-level binding in this scope (not nested
        function/class bodies, which are their own scopes)."""
        scope = self.scope
        assert scope is not None

        def visit_stmts(stmts):
            for st in stmts:
                collect(st)

        def collect(st: ast.stmt) -> None:
            if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                scope.bindings.add(st.name)
                return  # nested scope handles its own body
            if isinstance(st, ast.Global):
                scope.globals.update(st.names)
                scope.bindings.update(st.names)
                return
            if isinstance(st, ast.Nonlocal):
                scope.nonlocals.update(st.names)
                scope.bindings.update(st.names)
                return
            if isinstance(st, (ast.Import, ast.ImportFrom)):
                is_future = (
                    isinstance(st, ast.ImportFrom) and st.module == "__future__"
                )
                for alias in st.names:
                    if alias.name == "*":
                        self.has_star_import = True
                        continue
                    name = alias.asname or alias.name.split(".")[0]
                    scope.bindings.add(name)
                    # `import x as x` / `from m import x as x` is flake8's
                    # explicit re-export convention — never unused.
                    reexport = alias.asname is not None and (
                        alias.asname == alias.name
                    )
                    if not is_future and not reexport:
                        self.imports.setdefault(
                            name, (st.lineno, alias.name)
                        )
                return
            if isinstance(st, ast.Assign):
                for t in st.targets:
                    _bind_target(scope, t)
            elif isinstance(st, (ast.AugAssign, ast.AnnAssign)):
                _bind_target(scope, st.target)
            elif isinstance(st, (ast.For, ast.AsyncFor)):
                _bind_target(scope, st.target)
            elif isinstance(st, (ast.With, ast.AsyncWith)):
                for item in st.items:
                    if item.optional_vars is not None:
                        _bind_target(scope, item.optional_vars)
            elif isinstance(st, ast.Try):
                for h in st.handlers:
                    if h.name:
                        scope.bindings.add(h.name)
            elif isinstance(st, ast.Match):
                for case in st.cases:
                    _bind_target(scope, case.pattern)
            elif isinstance(st, ast.Delete):
                for t in st.targets:
                    _bind_target(scope, t)
            # named expressions / comp targets anywhere inside expressions
            for sub in ast.walk(st):
                if isinstance(sub, ast.NamedExpr):
                    _bind_target(scope, sub.target)
                elif isinstance(
                    sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef,
                          ast.Lambda, ast.ListComp, ast.SetComp, ast.DictComp,
                          ast.GeneratorExp)
                ) and sub is not st:
                    pass  # ast.walk is flat; nested scopes rebound below
            # recurse into compound statement bodies (same scope)
            for field in ("body", "orelse", "finalbody"):
                sub = getattr(st, field, None)
                if isinstance(sub, list) and sub and isinstance(sub[0], ast.stmt):
                    visit_stmts(sub)
            if isinstance(st, ast.Try):
                for h in st.handlers:
                    visit_stmts(h.body)
            if isinstance(st, ast.Match):
                for case in st.cases:
                    visit_stmts(case.body)

        visit_stmts(body)

    def _resolve(self, name: str, from_scope: Scope) -> bool:
        s: Scope | None = from_scope
        first = True
        while s is not None:
            if name in s.globals:
                # jump to module scope
                while s.parent is not None:
                    s = s.parent
                return name in s.bindings or name in BUILTINS
            if s.is_class and not first:
                s = s.parent  # class scopes invisible to nested scopes
                continue
            if name in s.bindings:
                return True
            first = False
            s = s.parent
        return name in BUILTINS

    # -- scope entries ----------------------------------------------------

    def _enter(self, node: ast.AST) -> Scope:
        self.scope = Scope(node, self.scope)
        return self.scope

    def _exit(self) -> None:
        assert self.scope is not None
        self.scope = self.scope.parent

    def check_module(self, tree: ast.Module) -> None:
        self._enter(tree)
        self._collect_bindings(tree, tree.body)
        for st in tree.body:
            self.visit(st)
        self._exit()
        if self.check_unused_imports:
            self._report_unused_imports(tree)

    def _report_unused_imports(self, tree: ast.Module) -> None:
        exempt = set(self.used_names)
        # __all__ entries are the public re-export surface.
        for st in tree.body:
            targets = []
            if isinstance(st, ast.Assign):
                targets = st.targets
            elif isinstance(st, ast.AugAssign):
                targets = [st.target]
            if any(
                isinstance(t, ast.Name) and t.id == "__all__" for t in targets
            ):
                for sub in ast.walk(st.value):
                    if isinstance(sub, ast.Constant) and isinstance(
                        sub.value, str
                    ):
                        exempt.add(sub.value)
        # Identifiers inside string annotations ("Foo", Optional["Bar"]):
        # with lazy annotations, typing-only imports are referenced only
        # there. Harvest every str constant in an annotation expression.
        ann_roots: list[ast.AST] = []
        for node in ast.walk(tree):
            if isinstance(node, ast.AnnAssign) and node.annotation:
                ann_roots.append(node.annotation)
            elif isinstance(node, ast.arg) and node.annotation:
                ann_roots.append(node.annotation)
            elif isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef)
            ) and node.returns:
                ann_roots.append(node.returns)
        for root in ann_roots:
            for sub in ast.walk(root):
                if isinstance(sub, ast.Constant) and isinstance(sub.value, str):
                    exempt.update(_IDENT_RE.findall(sub.value))
        for name, (lineno, display) in sorted(self.imports.items()):
            if name not in exempt:
                self.findings.append(
                    (lineno, "F401", f"'{display}' imported but unused")
                )

    def _visit_function(self, node) -> None:
        # decorators, defaults, annotations evaluate in the ENCLOSING scope
        is_lambda = isinstance(node, ast.Lambda)
        if not is_lambda:
            for dec in node.decorator_list:
                self.visit(dec)
        args = node.args
        for d in list(args.defaults) + [d for d in args.kw_defaults if d]:
            self.visit(d)
        for a in (
            args.posonlyargs + args.args + args.kwonlyargs
            + ([args.vararg] if args.vararg else [])
            + ([args.kwarg] if args.kwarg else [])
        ):
            if a.annotation:
                self.visit(a.annotation)
        if not is_lambda and node.returns:
            self.visit(node.returns)

        scope = self._enter(node)
        for a in (
            args.posonlyargs + args.args + args.kwonlyargs
            + ([args.vararg] if args.vararg else [])
            + ([args.kwarg] if args.kwarg else [])
        ):
            scope.bindings.add(a.arg)
        if isinstance(node, ast.Lambda):
            self.visit(node.body)
        else:
            self._collect_bindings(node, node.body)
            for st in node.body:
                self.visit(st)
        self._exit()

    visit_FunctionDef = _visit_function
    visit_AsyncFunctionDef = _visit_function
    visit_Lambda = _visit_function

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        for dec in node.decorator_list:
            self.visit(dec)
        for base in node.bases:
            self.visit(base)
        for kw in node.keywords:
            self.visit(kw.value)
        self._enter(node)
        self._collect_bindings(node, node.body)
        for st in node.body:
            self.visit(st)
        self._exit()

    def _visit_comprehension(self, node) -> None:
        # first iterable evaluates in the enclosing scope
        self.visit(node.generators[0].iter)
        scope = self._enter(node)
        for gen in node.generators:
            _bind_target(scope, gen.target)
        for i, gen in enumerate(node.generators):
            if i > 0:
                self.visit(gen.iter)
            for cond in gen.ifs:
                self.visit(cond)
        if isinstance(node, ast.DictComp):
            self.visit(node.key)
            self.visit(node.value)
        else:
            self.visit(node.elt)
        self._exit()

    visit_ListComp = _visit_comprehension
    visit_SetComp = _visit_comprehension
    visit_DictComp = _visit_comprehension
    visit_GeneratorExp = _visit_comprehension

    # -- checks -----------------------------------------------------------

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used_names.add(node.id)
            if not self.has_star_import:
                assert self.scope is not None
                if not self._resolve(node.id, self.scope):
                    self.err(node, "F821", f"undefined name '{node.id}'")

    def visit_Compare(self, node: ast.Compare) -> None:
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Is, ast.IsNot)):
                for side in (node.left, comp):
                    if isinstance(side, ast.Constant) and isinstance(
                        side.value, (str, bytes, int, float)
                    ) and not isinstance(side.value, bool):
                        self.err(
                            node, "F632",
                            "use ==/!= to compare str, bytes, and int literals",
                        )
                        break
        self.generic_visit(node)

    def visit_Assert(self, node: ast.Assert) -> None:
        if isinstance(node.test, ast.Tuple) and node.test.elts:
            self.err(
                node, "F631",
                "assertion on a non-empty tuple is always true",
            )
        self.generic_visit(node)


_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

_STDLIB = set(sys.stdlib_module_names)
# First-party top-level names that are not importable-by-path siblings of
# the file under check (the repo package plus repo-root script modules).
_FIRST_PARTY = {"sonar_tpu", "conftest", "_toy", "multihost_worker"}


def _import_sort_key(path: Path, st: ast.stmt) -> tuple[int, str, int]:
    """(section, module, straight-before-from) — isort's default profile.

    Sections: 0 stdlib, 1 third-party, 2 first-party/local. A module is
    first-party when it is the repo package, a relative import, or resolves
    to a sibling file/package of the file under check (tests importing
    test helpers, examples importing ``_toy``).
    """
    if isinstance(st, ast.Import):
        module, is_from = st.names[0].name, 0
    else:
        assert isinstance(st, ast.ImportFrom)
        if st.level > 0:
            return (2, "." * st.level + (st.module or "").lower(), 1)
        if st.module == "__future__":
            return (-1, "__future__", 1)  # must precede all other imports
        module, is_from = st.module or "", 1
    top = module.split(".")[0]
    if top in _FIRST_PARTY:
        section = 2
    elif top in _STDLIB:
        section = 0
    elif (path.parent / f"{top}.py").exists() or (path.parent / top).is_dir():
        section = 2
    else:
        section = 1
    return (section, module.lower(), is_from)


def canonical_import_block(src: str, path: Path) -> str | None:
    """Return ``src`` with the leading import block normalized, or None if
    it is already canonical (or the file opts out / has no block)."""
    if path.name == "__init__.py":
        return None
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    body = tree.body
    i = 0
    if (
        body
        and isinstance(body[0], ast.Expr)
        and isinstance(body[0].value, ast.Constant)
        and isinstance(body[0].value.value, str)
    ):
        i = 1
    imports: list[ast.stmt] = []
    while i < len(body) and isinstance(body[i], (ast.Import, ast.ImportFrom)):
        imports.append(body[i])
        i += 1
    if len(imports) < 2:
        return None
    lines = src.splitlines(keepends=True)
    first, last = imports[0].lineno, imports[-1].end_lineno or imports[-1].lineno
    # Comments directly above the first import travel with it (isort's
    # attachment rule) — but never absorb the file header: a comment block
    # touching line 1 (shebang/license) stays put in full.
    block_start = first
    while block_start > 1 and lines[block_start - 2].lstrip().startswith("#"):
        block_start -= 1
    if block_start > 1 and not any(
        "isort:" in ln for ln in lines[block_start - 1 : first - 1]
    ):
        first = block_start
    region = lines[first - 1 : last]
    if any("isort:" in ln or "lint: keep-order" in ln for ln in region):
        return None

    # Each item = (sort_key, text) where text is the statement's line span
    # plus every comment line between the previous statement and this one.
    items: list[tuple[tuple[int, str, int], int, str]] = []
    prev_end = first - 1  # 0-based line index just past the previous stmt
    for order, st in enumerate(imports):
        chunk = lines[prev_end : (st.end_lineno or st.lineno)]
        text = "".join(ln for ln in chunk if ln.strip())  # drop blank lines
        items.append((_import_sort_key(path, st), order, text))
        prev_end = st.end_lineno or st.lineno
    items.sort(key=lambda t: (t[0], t[1]))

    out: list[str] = []
    prev_section: int | None = None
    for key, _order, text in items:
        if prev_section is not None and key[0] != prev_section:
            out.append("\n")
        out.append(text)
        prev_section = key[0]
    new_region = "".join(out)
    if new_region == "".join(region):
        return None
    return "".join(lines[: first - 1]) + new_region + "".join(lines[last:])


def check_annotations(tree: ast.Module) -> list[tuple[int, str, str]]:
    """Public-surface annotation coverage (the ``py.typed`` promise).

    mypy is unavailable in this environment (the reference CI type-checks
    ``sonar/``, lint_and_test.yml:44; scripts/check.sh auto-runs mypy if it
    ever appears), so this enforces the verifiable subset with ``ast``:
    every public function — module-level ``def`` or method of a public
    module-level class, name not ``_``-prefixed (plus ``__init__``) — must
    annotate all parameters except self/cls (ANN001) and its return unless
    it is ``__init__`` (ANN201). Applied to ``sonar_tpu/`` only.
    """
    findings: list[tuple[int, str, str]] = []

    def check_fn(fn, qualname: str) -> None:
        a = fn.args
        params = (
            a.posonlyargs + a.args + a.kwonlyargs
            + ([a.vararg] if a.vararg else [])
            + ([a.kwarg] if a.kwarg else [])
        )
        for p in params:
            if p.arg in ("self", "cls"):
                continue
            if p.annotation is None:
                findings.append((
                    fn.lineno, "ANN001",
                    f"public function '{qualname}' parameter '{p.arg}' "
                    f"missing type annotation",
                ))
        if fn.returns is None and fn.name != "__init__":
            findings.append((
                fn.lineno, "ANN201",
                f"public function '{qualname}' missing return annotation",
            ))

    for st in tree.body:
        if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if not st.name.startswith("_"):
                check_fn(st, st.name)
        elif isinstance(st, ast.ClassDef) and not st.name.startswith("_"):
            for sub in st.body:
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if not sub.name.startswith("_") or sub.name == "__init__":
                        check_fn(sub, f"{st.name}.{sub.name}")
    return findings


def check_file(path: Path, fix: bool = False) -> list[str]:
    src = path.read_text(encoding="utf-8")
    try:
        compile(src, str(path), "exec")  # E9xx / F7xx
        tree = ast.parse(src, str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 {e.msg}"]
    import_order_findings: list[tuple[int, str, str]] = []
    fixed = canonical_import_block(src, path)
    if fixed is not None:
        if fix:
            path.write_text(fixed, encoding="utf-8")
            src = fixed
            tree = ast.parse(src, str(path))
        else:
            import_order_findings.append(
                (1, "I001", "import block is un-sorted or un-grouped")
            )
    # __init__.py modules are re-export surfaces: every import is public API.
    checker = Checker(str(path), check_unused_imports=path.name != "__init__.py")
    checker.check_module(tree)
    if "sonar_tpu" in path.parts:
        checker.findings.extend(check_annotations(tree))
    checker.findings.extend(import_order_findings)
    lines = src.splitlines()
    return [
        f"{path}:{line}: {code} {msg}"
        for line, code, msg in sorted(checker.findings)
        # flake8's suppression comment: skip findings on `# noqa` lines
        # (side-effect imports, deliberate shadowing).
        if not (0 < line <= len(lines) and "# noqa" in lines[line - 1])
    ]


def main(argv: list[str]) -> int:
    fix = "--fix" in argv
    argv = [a for a in argv if a != "--fix"]
    roots = [Path(a) for a in argv] or [
        Path("sonar_tpu"), Path("tests"), Path("scripts"),
        Path("benchmarks"), Path("examples"),
        Path("bench.py"), Path("__graft_entry__.py"),
    ]
    files: list[Path] = []
    for r in roots:
        if r.is_dir():
            files.extend(sorted(r.rglob("*.py")))
        elif r.suffix == ".py":
            files.append(r)
    findings: list[str] = []
    for f in files:
        findings.extend(check_file(f, fix=fix))
    for line in findings:
        print(line)
    print(f"lint: {len(files)} files, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
