"""Extended-dialect .include / .inc / .lib file splicing.

The reference is a single-string parser with no file system interaction
(.include lines land in `skipped`); real SPICE decks split models and
subcircuits across library files, so the extended dialect preprocesses
them before parsing.
"""

import pytest

from spicey_tpu import parse_netlist, simulate


def test_include_spliced(tmp_path):
    (tmp_path / "models.inc").write_text(
        ".model dm d(is=1e-15)\n.model sm sw(ron=2)\n")
    ckt = parse_netlist(
        'x\n.include "models.inc"\nv1 a 0 5\nr1 a b 1k\nd1 b 0 dm\n',
        dialect="extended", base_dir=str(tmp_path))
    assert ckt.diode_models["dm"].Is == 1e-15
    assert ckt.vswitch_models["sm"].Ron == 2.0


def test_include_relative_nesting(tmp_path):
    sub = tmp_path / "lib"
    sub.mkdir()
    (sub / "inner.inc").write_text(".model dm d(n=1.5)\n")
    # the outer include references inner RELATIVE TO ITS OWN directory
    (sub / "outer.inc").write_text('.inc "inner.inc"\n')
    ckt = parse_netlist(
        'x\n.include "lib/outer.inc"\nv1 a 0 5\nd1 a 0 dm\n',
        dialect="extended", base_dir=str(tmp_path))
    assert ckt.diode_models["dm"].N == 1.5


def test_include_missing_raises(tmp_path):
    with pytest.raises(ValueError, match="not found"):
        parse_netlist('x\n.include "nope.inc"\nr1 a 0 1\n',
                      dialect="extended", base_dir=str(tmp_path))


def test_include_recursion_capped(tmp_path):
    (tmp_path / "loop.inc").write_text('.include "loop.inc"\n')
    with pytest.raises(ValueError, match="nesting deeper"):
        parse_netlist('x\n.include "loop.inc"\n',
                      dialect="extended", base_dir=str(tmp_path))


def test_lib_section_form(tmp_path):
    (tmp_path / "corners.lib").write_text(
        "* device corners\n"
        ".lib fast\n.model dm d(is=1e-13)\n.endl\n"
        ".lib slow\n.model dm d(is=1e-16)\n.endl\n")
    ckt = parse_netlist(
        'x\n.lib "corners.lib" slow\nv1 a 0 5\nd1 a 0 dm\n',
        dialect="extended", base_dir=str(tmp_path))
    assert ckt.diode_models["dm"].Is == 1e-16
    with pytest.raises(ValueError, match='section "best" not found'):
        parse_netlist('x\n.lib "corners.lib" best\n',
                      dialect="extended", base_dir=str(tmp_path))


def test_include_skipped_in_spicey_dialect():
    ckt = parse_netlist('x\n.include "whatever.inc"\nr1 a 0 1k\nv1 a 0 1\n')
    assert any(".include" in s for s in ckt.skipped)


def test_include_with_subckt_and_simulate(tmp_path):
    (tmp_path / "divider.sub").write_text(
        ".subckt div in out\nr1 in out 6k\nr2 out 0 4k\n.ends\n")
    res = simulate(
        'x\n.include "divider.sub"\nv1 in 0 dc 10\nx1 in out div\n.op\n',
        dialect="extended", base_dir=str(tmp_path))
    assert res.op.node_voltages["out"] == pytest.approx(4.0, abs=1e-9)
