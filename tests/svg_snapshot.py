"""SVG snapshot matcher, analog of the reference's bun-match-svg preload
(tests/fixtures/preload.ts:1). First run writes the snapshot under
tests/__snapshots__/; later runs assert exact equality. Regenerate by
deleting the snapshot file."""

from __future__ import annotations

import os

SNAPSHOT_DIR = os.path.join(os.path.dirname(__file__), "__snapshots__")


def match_svg_snapshot(svg: str, name: str) -> None:
    os.makedirs(SNAPSHOT_DIR, exist_ok=True)
    path = os.path.join(SNAPSHOT_DIR, f"{name}.snap.svg")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(svg)
        return
    with open(path) as f:
        expected = f.read()
    assert svg == expected, (
        f"SVG snapshot mismatch for {name!r}; delete {path} to regenerate"
    )
