#!/usr/bin/env python
"""First-party lint gate (the image has no ruff/flake8 and installs are
pinned; the reference's equivalent gate is rustfmt + clippy -D warnings,
reference: .github/workflows/ci.yml:36-51).

Checks, all hard failures:
  - syntax: every .py file must compile (py_compile)
  - unused imports (module scope and function scope)
  - bare `except:` clauses
  - tabs in indentation
  - trailing whitespace
  - f-strings with no placeholders
  - mutable default arguments (list/dict/set literals)

Usage: python scripts/lint.py [paths...]   (default: package + tests + scripts)
"""

from __future__ import annotations

import ast
import pathlib
import py_compile
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
DEFAULT_PATHS = ["circom_compat_tpu", "tests", "scripts", "bench.py", "__graft_entry__.py"]


def iter_py(paths):
    for p in paths:
        p = (REPO / p) if not pathlib.Path(p).is_absolute() else pathlib.Path(p)
        if p.is_dir():
            yield from sorted(p.rglob("*.py"))
        elif p.suffix == ".py":
            yield p


class ImportTracker(ast.NodeVisitor):
    """Unused-import detection per scope (module / function / class)."""

    def __init__(self):
        self.problems = []
        self._scopes = []  # list of (scope_name, {alias: lineno})

    # -- scope handling
    def _enter(self, name):
        self._scopes.append((name, {}))

    def _exit(self):
        _, imports = self._scopes.pop()
        for alias, lineno in imports.items():
            self.problems.append((lineno, f"unused import '{alias}'"))

    def visit_Module(self, node):
        self._enter("module")
        self.generic_visit(node)
        self._exit()

    def _visit_func(self, node):
        self._mark_used_in(node.decorator_list)
        self._mark_used_in(node.args.defaults)
        self._mark_used_in(node.args.kw_defaults)
        args = (
            node.args.posonlyargs + node.args.args + node.args.kwonlyargs
            + [node.args.vararg, node.args.kwarg]
        )
        self._mark_used_in([a.annotation for a in args if a is not None])
        self._mark_used_in([node.returns])
        self._enter(node.name)
        for stmt in node.body:
            self.visit(stmt)
        self._exit()

    visit_FunctionDef = _visit_func
    visit_AsyncFunctionDef = _visit_func

    def _mark_used_in(self, nodes):
        for n in nodes:
            if n is not None:
                self.visit(n)

    # -- imports
    def _add(self, alias: ast.alias, lineno: int):
        name = alias.asname or alias.name.split(".")[0]
        if name == "_" or alias.name == "__future__":
            return
        self._scopes[-1][1][name] = lineno

    def visit_Import(self, node):
        for a in node.names:
            self._add(a, node.lineno)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self._add(a, node.lineno)

    # -- uses
    def _use(self, name: str):
        for _, imports in reversed(self._scopes):
            if name in imports:
                del imports[name]
                return

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self._use(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


class Checker(ast.NodeVisitor):
    def __init__(self):
        self.problems = []

    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.problems.append((node.lineno, "bare 'except:'"))
        self.generic_visit(node)

    def visit_JoinedStr(self, node):
        # note: do NOT recurse — format specs are themselves JoinedStr
        # nodes with no FormattedValue children (false positives)
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.problems.append((node.lineno, "f-string without placeholders"))

    def _check_defaults(self, node):
        for d in list(node.args.defaults) + [
            d for d in node.args.kw_defaults if d is not None
        ]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.problems.append(
                    (d.lineno, "mutable default argument")
                )
        self.generic_visit(node)

    visit_FunctionDef = _check_defaults
    visit_AsyncFunctionDef = _check_defaults


def lint_file(path: pathlib.Path):
    problems = []
    try:
        py_compile.compile(str(path), doraise=True)
    except py_compile.PyCompileError as e:
        return [(0, f"syntax error: {e.msg}")]
    src = path.read_text()
    for i, line in enumerate(src.splitlines(), 1):
        if line != line.rstrip():
            problems.append((i, "trailing whitespace"))
        stripped_len = len(line) - len(line.lstrip(" \t"))
        if "\t" in line[:stripped_len]:
            problems.append((i, "tab in indentation"))
    tree = ast.parse(src)
    visitors = [Checker()]
    if path.name != "__init__.py":  # __init__ files re-export by design
        visitors.append(ImportTracker())
    import re

    for visitor in visitors:
        visitor.visit(tree)
        for lineno, msg in visitor.problems:
            m = re.match(r"unused import '(.+)'", msg)
            if m:
                # fall back to a text check: string annotations, doctest
                # snippets and __all__ lists are uses the AST walk misses
                name = m.group(1)
                line = src.splitlines()[lineno - 1]
                rest = src.replace(line, "", 1)
                if re.search(r"\b" + re.escape(name) + r"\b", rest):
                    continue
            problems.append((lineno, msg))
    return sorted(problems)


def main(argv):
    paths = argv or DEFAULT_PATHS
    n_bad = 0
    for f in iter_py(paths):
        for lineno, msg in lint_file(f):
            print(f"{f.relative_to(REPO)}:{lineno}: {msg}")
            n_bad += 1
    if n_bad:
        print(f"lint: {n_bad} problem(s)")
        return 1
    print("lint: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
