"""CLI (`python -m spicey_tpu`) — batch-mode driver.

The reference is library-only; the CLI is the rebuild's ngspice-like
front end (README "CLI"). Tested in-process through main() so the
conftest's CPU/8-virtual-device backend applies."""

import numpy as np

from spicey_tpu.__main__ import main
from spicey_tpu.formatting.rawfile import read_rawfile

CONTROL_DECK = """* cli control deck
v1 1 0 dc 6
r1 1 2 1k
r2 2 0 2k
.control
op
echo from-control
print v(2)
.endc
.end
"""


def test_cli_runs_deck_and_prints_control_output(tmp_path, capsys):
    deck = tmp_path / "d.cir"
    deck.write_text(CONTROL_DECK)
    assert main([str(deck), "--cpu"]) == 0
    out = capsys.readouterr().out
    assert "node, V" in out  # the .op table
    assert "from-control" in out
    assert "v(2) = 4.000000e+00" in out  # 6 * 2k/3k


def test_cli_writes_rawfile(tmp_path, capsys):
    deck = tmp_path / "d.cir"
    deck.write_text("* raw deck\nv1 1 0 dc 0 ac 1\nr1 1 2 30\n"
                    "c1 2 0 100u\n.ac dec 2 1 100\n.end\n")
    raw = tmp_path / "out.raw"
    assert main([str(deck), "--cpu", "--quiet", "--raw", str(raw)]) == 0
    plots = read_rawfile(raw.read_bytes())
    assert plots and "AC" in plots[0][0]
    assert len(plots[0][1]["frequency"]) == 5


def test_cli_reference_dialect_stdin(tmp_path, capsys, monkeypatch):
    import io
    import sys

    deck = ("Demo of a simple AC circuit\nv1 1 0 dc 0 ac 1\nr1 1 2 30\n"
            "c1 2 0 100u\n.ac dec 2 1 100\n.end\n")
    monkeypatch.setattr(sys, "stdin", io.StringIO(deck))
    assert main(["-", "--cpu", "--dialect", "spicey"]) == 0
    out = capsys.readouterr().out
    # reference parity: the D-leading first line is a skipped element,
    # NOT a title (parseNetlist.ts:444-446), so only the AC table prints
    assert "f(Hz)" in out and "0.468650,-62.0533" in out


def test_cli_control_files_resolve_against_deck_dir(tmp_path, capsys):
    deck = tmp_path / "nested.cir"
    deck.write_text("* wrdata deck\nv1 1 0 dc 5\nr1 1 2 1k\nr2 2 0 1k\n"
                    ".control\nop\nwrdata o.dat v(2)\n.endc\n.end\n")
    assert main([str(deck), "--cpu", "--quiet"]) == 0
    data = np.loadtxt(tmp_path / "o.dat")
    assert data.shape == (2,) and abs(data[1] - 2.5) < 1e-9
