"""AST-enforced typing contract for the strict packages.

mypy.ini sets ``disallow_untyped_defs`` for ``spicey_tpu.parsing``,
``spicey_tpu.formatting`` and ``spicey_tpu.ops`` (the ratcheted analog of
the reference's strict tsconfig, /root/reference/tsconfig.json:25). mypy is
not installable in every build environment (the CI typecheck job runs it),
so this test enforces the same signature contract structurally: every
function in those packages must annotate every parameter and its return
type. It fails with the exact file:line list of offenders.
"""

from __future__ import annotations

import ast
import pathlib

import spicey_tpu

STRICT_PACKAGES = ("parsing", "formatting", "ops")


def _unannotated_defs(path: pathlib.Path) -> list[str]:
    tree = ast.parse(path.read_text())
    bad: list[str] = []
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        args = node.args
        params = args.posonlyargs + args.args + args.kwonlyargs
        missing = [a.arg for a in params
                   if a.annotation is None and a.arg not in ("self", "cls")]
        if args.vararg is not None and args.vararg.annotation is None:
            missing.append("*" + args.vararg.arg)
        if args.kwarg is not None and args.kwarg.annotation is None:
            missing.append("**" + args.kwarg.arg)
        if node.returns is None or missing:
            why = (["return"] if node.returns is None else []) + missing
            bad.append(f"{path}:{node.lineno}: {node.name}: "
                       f"missing {', '.join(why)}")
    return bad


def test_strict_packages_fully_annotated():
    root = pathlib.Path(spicey_tpu.__file__).parent
    offenders: list[str] = []
    for pkg in STRICT_PACKAGES:
        for path in sorted((root / pkg).rglob("*.py")):
            offenders.extend(_unannotated_defs(path))
    assert not offenders, "\n".join(offenders)
