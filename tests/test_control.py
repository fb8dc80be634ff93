"""Extended-dialect `.control` script support (ngspice batch-mode subset).

The reference has no scripting surface (lib/index.ts:1-12); `.control`
exists for ngspice deck compatibility. Analysis commands must share the
dot-directive grammar (parsing/netlist.py:_absorb_control routes them
through _parse_directive), and the post-processing tail executes against
the finished result (analysis/control.py)."""

import os

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate
from spicey_tpu.formatting.rawfile import read_rawfile

RC_BODY = """v1 1 0 dc 5 ac 1 pulse(0 5 0 1u 1u 1m 2m)
r1 1 2 1k
c1 2 0 1u
"""


def _deck(control: str, body: str = RC_BODY, cards: str = "") -> str:
    return (f"* control test deck\n{body}{cards}"
            f".control\n{control}\n.endc\n.end\n")


def test_control_analysis_commands_share_directive_grammar():
    r = simulate(_deck("run\nac dec 2 1 100\ntran 0.1m 1m"),
                 dialect="extended")
    assert r.ac is not None and len(r.ac.freqs) == 5  # dec 2 + endpoint
    assert r.tran is not None and len(r.tran.times) == 11


def test_control_command_wins_over_deck_card():
    r = simulate(_deck("ac lin 5 10 1000", cards=".ac dec 2 1 100\n"),
                 dialect="extended")
    np.testing.assert_allclose(r.ac.freqs, np.linspace(10, 1000, 5))


def test_control_echo_print_and_quit():
    r = simulate(_deck("op\necho hello world\nprint v(2)\nquit\necho nope"),
                 dialect="extended")
    out = r.control_output
    assert out.startswith("hello world")
    assert "v(2) = 5.000000e+00" in out
    assert "nope" not in out


def test_control_print_tran_table_and_ac_accessor():
    r = simulate(_deck("ac dec 2 1 100\ntran 0.1m 1m\n"
                       "print v(2) vm(2) i(v1)"), dialect="extended")
    out = r.control_output
    # tran is the current plot: indexed table with a time axis
    assert "Index" in out and "time" in out and "i(v1)" in out
    # the AC-only accessor groups under the AC plot's frequency axis
    assert "frequency" in out and "vm(2)" in out


def test_control_print_all_and_missing_vector():
    r = simulate(_deck("op\nprint all\nprint v(nosuch)"),
                 dialect="extended")
    assert "v(1) = 5.000000e+00" in r.control_output
    assert "no such vector v(nosuch)" in r.control_output


def test_control_write_rawfile_binary_default_and_ascii(tmp_path):
    simulate(_deck("ac dec 2 1 100\nwrite out.raw"), dialect="extended",
             base_dir=str(tmp_path))
    raw = (tmp_path / "out.raw").read_bytes()
    assert b"Binary:" in raw  # ngspice default filetype
    simulate(_deck("ac dec 2 1 100\nset filetype=ascii\nwrite a.raw"),
             dialect="extended", base_dir=str(tmp_path))
    txt = (tmp_path / "a.raw").read_bytes()
    assert b"Values:" in txt
    plots = read_rawfile(txt)
    assert plots and "AC" in plots[0][0]
    assert len(plots[0][1]["frequency"]) == 5


def test_control_wrdata_columns(tmp_path):
    simulate(_deck("tran 0.1m 1m\nwrdata out.dat v(2)"),
             dialect="extended", base_dir=str(tmp_path))
    data = np.loadtxt(tmp_path / "out.dat")
    assert data.shape == (11, 2)
    np.testing.assert_allclose(data[:, 0], np.arange(11) * 1e-4,
                               atol=1e-12)


def test_control_wrdata_complex_pairs(tmp_path):
    simulate(_deck("ac dec 2 1 100\nwrdata ac.dat v(2)"),
             dialect="extended", base_dir=str(tmp_path))
    data = np.loadtxt(tmp_path / "ac.dat")
    assert data.shape == (5, 3)  # freq, re, im


def test_control_meas_command():
    r = simulate(_deck("tran 0.1m 1m\nmeas tran vmax max v(2)"),
                 dialect="extended")
    assert r.meas and "vmax" in r.meas
    assert r.meas["vmax"] > 0


def test_control_unknown_command_lands_in_skipped():
    ckt = parse_netlist(_deck("op\nfourier 1k v(2)\nplot v(2)"),
                        dialect="extended")
    assert "fourier 1k v(2)" in ckt.skipped
    assert "plot v(2)" in ckt.skipped
    assert ckt.op


def test_control_noops_and_comments():
    ckt = parse_netlist(
        _deck("* a comment\nlisting\nrun\nversion\nprint v(2) $ trailing"),
        dialect="extended")
    assert ckt.control == ["print v(2)"]
    assert not ckt.skipped


def test_control_missing_endc_raises():
    with pytest.raises(ValueError, match="missing .endc"):
        parse_netlist("* t\nr1 1 0 1k\n.control\nrun\n.end\n",
                      dialect="extended")


def test_reference_dialect_sees_control_lines_as_raw_input():
    # the reference parser has no .control: the directives land in
    # `skipped` and the body lines parse as whatever they look like —
    # `run` is a malformed resistor and THROWS, exactly like the
    # reference (parseNetlist.ts:295-305 "Resistor missing node")
    with pytest.raises(ValueError, match="Resistor missing node"):
        parse_netlist("* t\nv1 1 0 dc 1\nr1 1 0 1k\n"
                      ".control\nrun\n.endc\n.ac dec 2 1 100\n.end\n",
                      dialect="spicey")
    # without element-letter collisions the block is inert line-per-line
    ckt = parse_netlist("* t\nv1 1 0 dc 1\nr1 1 0 1k\n"
                        ".control\n.endc\n.ac dec 2 1 100\n.end\n",
                        dialect="spicey")
    assert ".control" in ckt.skipped and ".endc" in ckt.skipped
    assert not ckt.control
    assert ckt.ac is not None


def test_control_relative_paths_resolve_against_base_dir(tmp_path):
    sub = tmp_path / "nested"
    sub.mkdir()
    cwd = os.getcwd()
    simulate(_deck("op\nwrite op.raw"), dialect="extended",
             base_dir=str(sub))
    assert (sub / "op.raw").exists()
    assert os.getcwd() == cwd


def test_control_let_vector_expressions():
    r = simulate(_deck("ac dec 2 1 100\n"
                       "let gain = v(2)/v(1)\n"
                       "let gdb = db(gain)\n"
                       "let flat = 2k*1m\n"
                       "print gdb flat"), dialect="extended")
    out = r.control_output
    assert "flat = 2.000000e+00" in out
    # gdb rides the AC frequency axis
    assert "frequency" in out and "gdb" in out
    # at 1 Hz the RC divider is ~0 dB
    first_row = [ln for ln in out.splitlines() if ln.startswith("0 ")][0]
    assert abs(float(first_row.split()[2])) < 0.1


def test_control_let_reductions_and_compose():
    r = simulate(_deck("tran 0.1m 1m\n"
                       "let vr = rms(v(2))\n"
                       "let vm2 = vecmax(v(2)) - vecmin(v(2))\n"
                       "print vr vm2"), dialect="extended")
    out = r.control_output
    vr = float(out.split("vr = ")[1].split()[0])
    vm2 = float(out.split("vm2 = ")[1].split()[0])
    assert 0 < vr < 5 and 0 < vm2 <= 5


def test_control_let_errors_are_reported_not_raised():
    r = simulate(_deck("op\nlet bad = v(nosuch)+1\nlet 1x = 2\n"
                       "let ok = 3*2\nprint ok"),
                 dialect="extended")
    out = r.control_output
    assert "no such vector v(nosuch)" in out
    assert "expected `let name = expr`" in out
    assert "ok = 6.000000e+00" in out


def test_control_let_in_wrdata(tmp_path):
    simulate(_deck("tran 0.1m 1m\nlet p = v(2)*i(v1)\n"
                   "wrdata p.dat p"), dialect="extended",
             base_dir=str(tmp_path))
    data = np.loadtxt(tmp_path / "p.dat")
    assert data.shape == (11, 2)


def test_control_alter_applies_before_the_run():
    r = simulate(_deck("alter r1 2k\nalter v1 = 10\nop\nprint v(2)"),
                 dialect="extended")
    # divider becomes 10 V source into 2k/open cap: v(2) settles to 10 V
    # at DC (cap open) — check via the altered source value
    assert "v(2) = 1.000000e+01" in r.control_output


def test_control_alter_divider_value():
    deck = ("* alter divider\nv1 1 0 dc 6\nr1 1 2 1k\nr2 2 0 1k\n"
            ".control\nalter r2 3k\nop\nprint v(2)\n.endc\n.end\n")
    r = simulate(deck, dialect="extended")
    assert "v(2) = 4.500000e+00" in r.control_output  # 6*3k/4k


def test_control_alter_unknown_forms_land_in_skipped():
    ckt = parse_netlist(
        _deck("alter rX 2k\nalter @r1[resistance]=2k\nalter r1\nop"),
        dialect="extended")
    assert len(ckt.skipped) == 3
    assert ckt.op


def test_control_let_scalar_arithmetic_errors_reported():
    r = simulate(_deck("op\nlet a = 1/0\nlet b = 9e99**9e99\nprint v(2)"),
                 dialect="extended")
    assert "v(2) = 5.000000e+00" in r.control_output


def test_control_fuzz_parse_never_crashes_unexpectedly():
    import random

    rng = random.Random(7)
    words = ["run", "print", "v(2)", "let", "=", "alter", "r1", "2k",
             "echo", "$x", "set", "write", "f.raw", "quit", "foo",
             "1e99", "(", ")", "db(v(2))", "all", "i(v1)", "*", ";",
             "vm(2)", "wrdata", "meas", "tran", "op", "ac", "dec"]
    for _ in range(200):
        block = "\n".join(
            " ".join(rng.choices(words, k=rng.randint(1, 5)))
            for _ in range(rng.randint(1, 6)))
        deck = (f"* fuzz\nv1 1 0 dc 1\nr1 1 2 1k\nr2 2 0 1k\n"
                f".control\n{block}\n.endc\n.op\n.end\n")
        try:
            parse_netlist(deck, dialect="extended")
        except ValueError:
            pass  # malformed analysis commands may legitimately raise


def test_control_fuzz_execution_never_crashes(tmp_path):
    import random

    rng = random.Random(11)
    words = ["print", "v(2)", "let", "x", "=", "echo", "hi", "set",
             "filetype=ascii", "write", "o.raw", "wrdata", "o.dat",
             "all", "i(v1)", "db(v(2))", "x+1", "rms(v(2))", "1/0"]
    for _ in range(25):
        block = "\n".join(
            " ".join(rng.choices(words, k=rng.randint(1, 4)))
            for _ in range(rng.randint(1, 5)))
        deck = (f"* fuzz exec\nv1 1 0 dc 1\nr1 1 2 1k\nr2 2 0 1k\n"
                f".control\nop\n{block}\n.endc\n.end\n")
        try:
            r = simulate(deck, dialect="extended",
                         base_dir=str(tmp_path))
            if r.circuit.control:  # post-processing tail ran
                assert r.control_output is not None
        except ValueError:
            pass


def test_control_write_bad_path_reports_and_continues(tmp_path):
    """An unwritable output path must not discard finished analyses
    (ngspice reports the error and continues; ADVICE r4)."""
    r = simulate(_deck("op\nwrite /nonexistent_dir_xyz/out.raw\n"
                       "echo still here"),
                 dialect="extended", base_dir=str(tmp_path))
    assert r.op is not None  # analyses survived
    assert "write:" in r.control_output
    assert "still here" in r.control_output


def test_control_wrdata_bad_path_reports_and_continues(tmp_path):
    r = simulate(_deck("op\nwrdata /nonexistent_dir_xyz/o.dat v(2)\n"
                       "echo after"),
                 dialect="extended", base_dir=str(tmp_path))
    assert r.op is not None
    assert "wrdata:" in r.control_output
    assert "after" in r.control_output


def test_control_print_scalar_let_before_vector_keeps_table():
    """`print s v(2)` with s a scalar reduction must print the scalar AND
    the full vector table — round 4 decided scalar-vs-table mode from the
    first column and silently dropped the vector (ADVICE r4)."""
    r = simulate(_deck("ac dec 2 1 100\nlet s = mean(vm(2))\n"
                       "print s vm(2)"), dialect="extended")
    out = r.control_output
    assert "s = " in out
    # all 5 AC rows tabulated, not just the first element
    assert "Index" in out
    table_rows = [ln for ln in out.splitlines()
                  if ln and ln[0].isdigit()]
    assert len(table_rows) == 5


def test_control_wrdata_mixed_lengths_pads_and_warns(tmp_path):
    """Mixing vectors of different plots (11-pt tran, 5-pt AC) pads the
    shorter columns instead of silently truncating (ADVICE r4)."""
    r = simulate(_deck("ac dec 2 1 100\ntran 0.1m 1m\n"
                       "wrdata mix.dat v(2) vm(2)"),
                 dialect="extended", base_dir=str(tmp_path))
    data = np.loadtxt(tmp_path / "mix.dat")
    assert data.shape[0] == 11  # longest vector wins
    assert "differing lengths" in r.control_output
    # the padded column repeats its last value
    assert data[-1, -1] == data[4, -1]


def test_control_comment_marker_needs_whitespace():
    """Mid-word `;`/`$` stays literal; whitespace-prefixed `$` starts an
    end-of-line comment (ngspice rules; ADVICE r4)."""
    r = simulate(_deck("op\necho ab;cd $ tail comment"),
                 dialect="extended")
    assert "ab;cd" in r.control_output
    assert "tail" not in r.control_output
