"""Guard against silent test shadowing.

Python binds a module attribute to the LAST definition, so two
module-level ``def test_x`` in one file mean pytest collects only the
later one — the earlier family silently stops running while the suite
stays green (this happened to the round-8 decimal fuzz family when
round 9 reused its names).  This guard AST-parses every test module
and fails on ANY duplicated module-level function or class name:
test functions because they vanish from collection, helpers because a
later redefinition retroactively rewires earlier runtime callers.

Spark-free; runs in milliseconds.
"""
import ast
import pathlib

TESTS_DIR = pathlib.Path(__file__).resolve().parent


def _module_level_defs(tree: ast.Module):
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            yield node.name, node.lineno


def test_no_duplicate_module_level_names():
    offenders = []
    for path in sorted(TESTS_DIR.glob("test_*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        seen = {}
        for name, lineno in _module_level_defs(tree):
            if name in seen:
                offenders.append(
                    f"{path.name}: '{name}' defined at line "
                    f"{seen[name]} AND line {lineno}")
            else:
                seen[name] = lineno
    assert not offenders, (
        "duplicate module-level definitions shadow earlier ones "
        "(pytest collects only the last):\n" + "\n".join(offenders))
