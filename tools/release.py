#!/usr/bin/env python3
"""Atomic version-bump + tag for spicey_tpu.

Rounds 3 and 4 each shipped a version/tag mismatch (a stale __version__,
then a bump commit with no tag). This script makes the two inseparable:

    python tools/release.py 0.7.0

edits pyproject.toml and spicey_tpu/__init__.py, verifies the CHANGELOG
mentions the version, runs the version test, commits, and creates the
`vX.Y.Z` tag on that same commit — or aborts leaving the tree untouched.
The release.yml workflow independently re-checks tag == package version.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def sh(*args: str) -> str:
    return subprocess.run(args, cwd=ROOT, check=True, text=True,
                          capture_output=True).stdout


def main() -> int:
    if len(sys.argv) != 2 or not re.fullmatch(r"\d+\.\d+\.\d+", sys.argv[1]):
        print("usage: python tools/release.py X.Y.Z", file=sys.stderr)
        return 2
    ver = sys.argv[1]
    if sh("git", "status", "--porcelain").strip():
        print("working tree not clean; commit or stash first",
              file=sys.stderr)
        return 1
    if f"v{ver}" in sh("git", "tag").split():
        print(f"tag v{ver} already exists", file=sys.stderr)
        return 1
    if f"v{ver}" not in (ROOT / "CHANGELOG.md").read_text():
        print(f"CHANGELOG.md has no v{ver} entry; write one first",
              file=sys.stderr)
        return 1

    pyproject = ROOT / "pyproject.toml"
    init = ROOT / "spicey_tpu" / "__init__.py"
    pyproject.write_text(re.sub(r'(?m)^version = "[^"]+"',
                                f'version = "{ver}"',
                                pyproject.read_text(), count=1))
    init.write_text(re.sub(r'(?m)^__version__ = "[^"]+"',
                           f'__version__ = "{ver}"',
                           init.read_text(), count=1))
    try:
        subprocess.run([sys.executable, "-m", "pytest",
                        "tests/test_version.py", "-q"], cwd=ROOT, check=True)
        sh("git", "add", "pyproject.toml", "spicey_tpu/__init__.py")
        sh("git", "commit", "-m", f"Release v{ver}")
        sh("git", "tag", f"v{ver}")
    except subprocess.CalledProcessError as err:
        sh("git", "checkout", "--", "pyproject.toml",
           "spicey_tpu/__init__.py")
        print(f"release aborted, tree restored: {err}", file=sys.stderr)
        return 1
    print(f"released v{ver}: bump commit + tag created together")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
