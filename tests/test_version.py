"""Pin spicey_tpu.__version__ to the pyproject.toml [project] version.

The analog of the reference's single version field (package.json:3). Round 3
shipped with a stale duplicate assignment at the end of __init__.py that made
the import-time version lie (0.1.0 vs pyproject 0.3.0); this test makes that
class of drift impossible to reintroduce.
"""

from __future__ import annotations

import pathlib
import re

import spicey_tpu

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def _pyproject_version() -> str:
    text = (_REPO_ROOT / "pyproject.toml").read_text()
    try:
        import tomllib

        return str(tomllib.loads(text)["project"]["version"])
    except ModuleNotFoundError:  # python < 3.11
        m = re.search(r'^version\s*=\s*"([^"]+)"', text, re.MULTILINE)
        assert m is not None, "no version field in pyproject.toml"
        return m.group(1)


def test_version_matches_pyproject() -> None:
    assert spicey_tpu.__version__ == _pyproject_version()


def test_version_assigned_exactly_once() -> None:
    # Guard the specific round-3 failure mode: a second `__version__ = ...`
    # later in the module silently winning over the documented one.
    src = (_REPO_ROOT / "spicey_tpu" / "__init__.py").read_text()
    assignments = re.findall(r"^__version__\s*=", src, re.MULTILINE)
    assert len(assignments) == 1
