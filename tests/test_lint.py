"""Lint gate: no test or package module may reference an undefined
module-level name (the failure mode behind the round-3 never-run TLS test:
a NameError before the first assert makes a test permanently red without
testing anything).  AST-based so it needs no external linter."""

import ast
import builtins
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__",
                                 "__package__", "__spec__", "__loader__"}


def _defined_names(tree):
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                names.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                names.add(a.asname or a.name)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.Name) and isinstance(node.ctx, ast.Store):
            names.add(node.id)
        elif isinstance(node, ast.arg):
            names.add(node.arg)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            names.add(node.name)
        elif isinstance(node, ast.Global):
            names.update(node.names)
    return names


def _undefined(path):
    with open(path) as f:
        tree = ast.parse(f.read(), path)
    defined = _defined_names(tree) | BUILTINS
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            if node.id not in defined:
                out.append(f"{path}:{node.lineno}: undefined '{node.id}'")
    return out


def test_no_undefined_names():
    problems = []
    for root in ("tests", "wide_deep_tpu", "tools"):
        for dirpath, _, filenames in os.walk(os.path.join(REPO, root)):
            for fn in filenames:
                if fn.endswith(".py"):
                    problems += _undefined(os.path.join(dirpath, fn))
    assert not problems, "\n".join(problems)
