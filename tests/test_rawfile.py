"""ngspice rawfile export + the `python -m spicey_tpu` CLI.

Interop beyond the reference (which exports text tables and circuit-json
only, /root/reference/lib/formatting/*). Round-trip checks: writer output
parses back bit-exact in both ASCII and binary forms, and the header
follows the ngspice rawfile layout.
"""

import subprocess
import sys

import numpy as np

from spicey_tpu import format_rawfile, read_rawfile, simulate

DECK = """Demo of a simple AC circuit
v1 1 0 dc 0 ac 1 PULSE(0 5 1u 1n 1n 5u 20u)
r1 1 2 30
c1 2 0 100u
.ac dec 10 1 100
.tran 1u 20u
.end
"""


def test_rawfile_header_layout():
    res = simulate(DECK)
    data = format_rawfile(res, date="today")
    text = data.decode()
    # "Demo ..." begins with a 'd', so the reference's title rule parses it
    # as a (skipped) diode line and the deck has NO title -> fallback
    assert text.startswith("Title: spicey_tpu\n")
    assert "Plotname: AC Analysis\n" in text
    assert "Plotname: Transient Analysis\n" in text
    assert "Flags: complex\n" in text and "Flags: real\n" in text
    assert "\t0\tfrequency\tfrequency\tgrid=3\n" in text
    assert "\t1\tv(1)\tvoltage\n" in text
    assert "\tv1#branch\tcurrent\n" in text
    assert "Values:\n" in text


def _roundtrip(ascii_values):
    res = simulate(DECK)
    data = format_rawfile(res, ascii_values=ascii_values, date="today")
    plots = read_rawfile(data)
    assert [p[0] for p in plots] == ["AC Analysis", "Transient Analysis"]
    ac_vars = plots[0][1]
    np.testing.assert_allclose(ac_vars["frequency"].real, res.ac.freqs,
                               rtol=1e-14)
    np.testing.assert_allclose(ac_vars["v(2)"], res.ac.node_voltages["2"],
                               rtol=1e-14)
    np.testing.assert_allclose(ac_vars["v1#branch"],
                               res.ac.element_currents["v1"], rtol=1e-14)
    tr_vars = plots[1][1]
    np.testing.assert_allclose(tr_vars["time"], res.tran.times, rtol=1e-14)
    np.testing.assert_allclose(tr_vars["v(2)"],
                               res.tran.node_voltages["2"], rtol=1e-14)


def test_rawfile_roundtrip_ascii():
    _roundtrip(True)


def test_rawfile_roundtrip_binary():
    """Binary blocks are float64 LE — the round-trip is bit-exact."""
    _roundtrip(False)


def test_cli_runs_deck_and_writes_rawfile(tmp_path):
    deck = tmp_path / "deck.cir"
    deck.write_text(DECK)
    raw = tmp_path / "out.raw"
    proc = subprocess.run(
        [sys.executable, "-m", "spicey_tpu", str(deck), "--cpu",
         "--raw", str(raw), "--binary"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "f(Hz)" in proc.stdout       # AC table printed
    assert "t(s)" in proc.stdout        # TRAN table printed
    plots = read_rawfile(raw.read_bytes())
    assert [p[0] for p in plots] == ["AC Analysis", "Transient Analysis"]


def test_cli_stdin_and_quiet(tmp_path):
    raw = tmp_path / "o.raw"
    proc = subprocess.run(
        [sys.executable, "-m", "spicey_tpu", "-", "--cpu", "--quiet",
         "--raw", str(raw)],
        input="t\nv1 a 0 dc 0 ac 1\nr1 a 0 1k\n.ac lin 3 1 10\n",
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout == ""
    (name, series), = read_rawfile(raw.read_bytes())
    assert name == "AC Analysis"
    np.testing.assert_allclose(series["v(a)"], 1.0, rtol=1e-12)


def test_rawfile_op_and_dc_plots():
    """Extended-dialect op/dc results export as ngspice plots too."""
    res = simulate("""the divider
v1 in 0 dc 10
r1 in out 6k
r2 out 0 4k
.op
.dc v1 0 10 2
""", dialect="extended")
    plots = read_rawfile(format_rawfile(res, date="today",
                                        ascii_values=False))
    assert [p[0] for p in plots] == ["Operating Point",
                                     "DC transfer characteristic"]
    op_vars = plots[0][1]
    np.testing.assert_allclose(op_vars["v(out)"], [4.0], rtol=1e-12)
    np.testing.assert_allclose(op_vars["v1#branch"], [-10 / 10e3],
                               rtol=1e-12)
    dc_vars = plots[1][1]
    np.testing.assert_allclose(dc_vars["v(v-sweep)"], np.arange(0, 12, 2))
    np.testing.assert_allclose(dc_vars["v(out)"],
                               np.arange(0, 12, 2) * 0.4, atol=1e-12)
