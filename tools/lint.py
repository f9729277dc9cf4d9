#!/usr/bin/env python
"""In-repo lint gate (the `.clang-tidy` + CI static-analysis analog;
reference: /root/reference/.clang-tidy, Makefile:74-77,
.github/workflows/static-analysis.yml).

No third-party linters exist in this environment, so this implements
the checks on the stdlib:

Python (ast-based, over ceracoder_tpu/ tools/ tests/ bench.py):
  - syntax errors (compile)
  - unused imports (module scope and function scope)
  - duplicate imports
  - mutable default arguments
  - bare `except:`
  - comparison with None/True/False via == / !=
  - f-strings without placeholders
  - lines > 100 chars, trailing whitespace, tabs in indentation

C++ (native/src, tools/*.c): g++ -fsyntax-only -Wall -Wextra -Werror.

Exit status 0 = clean. Run standalone or via run_tests.sh.
"""

from __future__ import annotations

import ast
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
MAX_LINE = 100

PY_ROOTS = ["ceracoder_tpu", "tools", "tests", "bench.py",
            "__graft_entry__.py"]

# names that look unused but are intentional re-exports / hooks
ALLOW_UNUSED = {"annotations"}


class Check(ast.NodeVisitor):
    def __init__(self, path: Path, src: str):
        self.path = path
        self.src = src
        self.problems: list[tuple[int, str]] = []
        # import name -> (lineno, asname) for top-level scope only
        self.scopes: list[dict[str, int]] = [{}]
        self.used: list[set[str]] = [set()]

    def err(self, node, msg):
        self.problems.append((node.lineno, msg))

    # -- scope handling ------------------------------------------------
    def _push(self):
        self.scopes.append({})
        self.used.append(set())

    def _pop(self):
        imports = self.scopes.pop()
        used = self.used.pop()
        # names used anywhere deeper count as used in the parent too
        if self.used:
            self.used[-1] |= used
        for name, lineno in imports.items():
            if name in ALLOW_UNUSED or name.startswith("_"):
                continue
            if name not in used:
                self.problems.append((lineno, f"unused import: {name}"))

    def visit_FunctionDef(self, node):
        self._check_defaults(node)
        self._push()
        self.generic_visit(node)
        self._pop()

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_Lambda(self, node):
        self.generic_visit(node)

    def _check_defaults(self, node):
        for d in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.err(d, "mutable default argument")

    # -- imports -------------------------------------------------------
    def _add_import(self, node, name):
        scope = self.scopes[-1]
        if name in scope:
            self.err(node, f"duplicate import: {name}")
        scope[name] = node.lineno

    def visit_Import(self, node):
        for a in node.names:
            if a.asname is None and "." in a.name:
                # `import a.b` binds `a` but is a distinct statement
                # from `import a` (no duplicate), and its usefulness
                # is the submodule side effect — don't track it
                continue
            self._add_import(node, a.asname or a.name)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self._add_import(node, a.asname or a.name)

    def visit_Name(self, node):
        if isinstance(node.ctx, ast.Load):
            self.used[-1].add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    # -- misc checks ---------------------------------------------------
    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.err(node, "bare except:")
        self.generic_visit(node)

    def visit_Compare(self, node):
        for op, cmp_ in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)):
                if (isinstance(cmp_, ast.Constant)
                        and cmp_.value in (None, True, False)
                        and not isinstance(cmp_.value, (int, float))
                        or (isinstance(cmp_, ast.Constant)
                            and cmp_.value is None)):
                    self.err(node, "use `is` for None comparison")
        self.generic_visit(node)

    def visit_JoinedStr(self, node):
        if not any(isinstance(v, ast.FormattedValue)
                   for v in node.values):
            self.err(node, "f-string without placeholders")
        self.generic_visit(node)

    def visit_FormattedValue(self, node):
        # do not descend into format_spec: it is itself a JoinedStr
        # and would false-positive the placeholder check
        self.visit(node.value)

    def finish(self):
        self._pop()
        return self.problems


def lint_py(path: Path) -> list[str]:
    src = path.read_text()
    out = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    lines = src.splitlines()
    c = Check(path, src)
    c.visit(tree)
    rel = path.relative_to(REPO)
    # __init__.py imports are the package's public re-export surface
    is_init = path.name == "__init__.py"
    for lineno, msg in sorted(c.finish()):
        if is_init and msg.startswith("unused import"):
            continue
        if 0 < lineno <= len(lines) and "# noqa" in lines[lineno - 1]:
            continue
        out.append(f"{rel}:{lineno}: {msg}")
    for i, line in enumerate(lines, 1):
        if "# noqa" in line:
            continue
        if len(line) > MAX_LINE:
            out.append(f"{rel}:{i}: line too long ({len(line)})")
        if line != line.rstrip():
            out.append(f"{rel}:{i}: trailing whitespace")
        stripped = line.lstrip(" ")
        if stripped.startswith("\t"):
            out.append(f"{rel}:{i}: tab indentation")
    return out


def lint_native() -> list[str]:
    out = []
    srcs = sorted((REPO / "native" / "src").glob("*.cc"))
    for src in srcs:
        cmd = ["g++", "-fsyntax-only", "-Wall", "-Wextra", "-Werror",
               "-std=c++17", str(src)]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            tail = "\n".join(r.stderr.splitlines()[:12])
            out.append(f"{src.relative_to(REPO)}: g++ -Werror "
                       f"failed:\n{tail}")
    for src in sorted((REPO / "tools").glob("*.c")):
        cmd = ["gcc", "-fsyntax-only", "-Wall", "-Wextra", str(src)]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            tail = "\n".join(r.stderr.splitlines()[:12])
            out.append(f"{src.relative_to(REPO)}: gcc failed:\n{tail}")
    return out


def main() -> int:
    problems = []
    for root in PY_ROOTS:
        p = REPO / root
        if p.is_file():
            problems += lint_py(p)
        else:
            for f in sorted(p.rglob("*.py")):
                problems += lint_py(f)
    problems += lint_native()
    for p in problems:
        print(p)
    n = len(problems)
    print(f"lint: {n} problem(s)" if n else "lint: clean")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
