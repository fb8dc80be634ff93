"""Extended-dialect `.subckt`/`.ends`/X hierarchical netlists.

The reference has no subcircuit support — X lines fall into `skipped`
(parseNetlist.ts:444-446). The extended dialect flattens the hierarchy
before parsing: ports bind to outer nodes, internal nodes become
`<node>.<instance-path>`, element names are suffixed `.<instance-path>`,
ground "0" stays global, `.model` cards inside a body are hoisted.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate, simulate_ac, simulate_tran

DIVIDER = """a divider subckt demo
.subckt div in out
r1 in out 1k
r2 out 0 3k
.ends
v1 a 0 dc 4
x1 a mid div
.tran 1u 10u
.end
"""


def test_spicey_dialect_skips_x_lines():
    """Reference behavior: `.subckt`/`.ends`/X lines land in `skipped` while
    the body's element lines parse as ordinary top-level elements
    (parseNetlist.ts:285-287,444-446)."""
    ckt = parse_netlist(DIVIDER)
    assert any(s.lower().startswith("x1") for s in ckt.skipped)
    assert any(s.lower().startswith(".subckt") for s in ckt.skipped)
    assert any(s.lower().startswith(".ends") for s in ckt.skipped)
    assert [r.name for r in ckt.R] == ["r1", "r2"]


def test_flatten_divider():
    ckt = parse_netlist(DIVIDER, dialect="extended")
    assert [r.name for r in ckt.R] == ["r1.x1", "r2.x1"]
    # port "in" bound to outer node a; port "out" bound to mid; no leaked nodes
    names = {n for n in ckt.nodes.rev}
    assert names == {"0", "a", "mid"}
    tran = simulate_tran(ckt)
    np.testing.assert_allclose(tran.node_voltages["mid"], 3.0, rtol=1e-12)
    np.testing.assert_allclose(tran.element_currents["r1.x1"], 1e-3, rtol=1e-12)


def test_internal_nodes_scoped_per_instance():
    text = """two instances
.subckt lp in out
rs in n 1k
cs n 0 1u
rl n out 1k
.ends
v1 a 0 dc 1
x1 a b lp
x2 b 0 lp
.tran 1u 10u
"""
    ckt = parse_netlist(text, dialect="extended")
    names = {n for n in ckt.nodes.rev}
    assert "n.x1" in names and "n.x2" in names
    assert len(ckt.R) == 4 and len(ckt.C) == 2


def test_flattened_matches_manual_ac():
    hier = """the rc lowpass as subckt
.subckt rc in out
r1 in out 30
c1 out 0 100u
.ends
v1 1 0 dc 0 ac 1
xrc 1 2 rc
.ac dec 100 1 100
"""
    manual = """the rc lowpass manual
v1 1 0 dc 0 ac 1
r1 1 2 30
c1 2 0 100u
.ac dec 100 1 100
"""
    ac_h = simulate_ac(parse_netlist(hier, dialect="extended"))
    ac_m = simulate_ac(parse_netlist(manual))
    np.testing.assert_allclose(np.asarray(ac_h.node_voltages["2"]),
                               np.asarray(ac_m.node_voltages["2"]), rtol=1e-12)


def test_nested_instantiation():
    text = """nested
.subckt half in out
r1 in out 500
.ends
.subckt full in out
xa in m half
xb m out half
.ends
v1 top 0 dc 2
xo top mid full
rload mid 0 1k
.tran 1u 5u
"""
    ckt = parse_netlist(text, dialect="extended")
    assert {r.name for r in ckt.R} == {"r1.xa.xo", "r1.xb.xo", "rload"}
    tran = simulate_tran(ckt)
    np.testing.assert_allclose(tran.node_voltages["mid"], 1.0, rtol=1e-12)


def test_model_inside_subckt_hoisted():
    text = """the diode sub
.subckt rect in out
.model dd d(is=1e-14)
d1 in out dd
.ends
v1 a 0 dc 5
xr a b rect
r1 b 0 1k
.tran 1u 10u
"""
    ckt = parse_netlist(text, dialect="extended")
    assert "dd" in ckt.diode_models
    assert ckt.D[0].name == "d1.xr"
    tran = simulate_tran(ckt)
    vb = tran.node_voltages["b"][-1]
    assert 4.0 < vb < 5.0  # one diode drop below the 5 V source


def test_ctrl_source_renamed_inside_subckt():
    text = """the cccs in sub
.subckt mirror in out
vsense in 0 dc 0
f1 0 out vsense 2
.ends
i1 0 a 1m
xm a b mirror
rl b 0 1k
.tran 1u 5u
"""
    ckt = parse_netlist(text, dialect="extended")
    assert ckt.F[0].name == "f1.xm"
    assert ckt.F[0].ctrl_name == "vsense.xm"
    tran = simulate_tran(ckt)
    np.testing.assert_allclose(tran.node_voltages["b"], 2.0, rtol=1e-12)


def test_subckt_through_simulate_with_probe():
    text = """probe internal node
.subckt lp in out
r1 in n 1k
c1 n 0 1n
r2 n out 1k
.ends
v1 a 0 dc 1
x1 a b lp
rl b 0 1k
.print tran v(n.x1)
.tran 1u 10u
"""
    r = simulate(text, dialect="extended")
    assert list(r.tran.node_voltages) == ["n.x1"]


def test_port_count_mismatch_raises():
    bad = ".subckt s a b\nr1 a b 1\n.ends\nv1 1 0 dc 1\nx1 1 s\n"
    with pytest.raises(ValueError, match="declares 2 ports"):
        parse_netlist("t\n" + bad, dialect="extended")


def test_unknown_subckt_raises():
    with pytest.raises(ValueError, match="Unknown .subckt"):
        parse_netlist("t\nv1 1 0 dc 1\nx1 1 0 nosuch\n", dialect="extended")


def test_missing_ends_raises():
    with pytest.raises(ValueError, match="missing its .ends"):
        parse_netlist("t\n.subckt s a b\nr1 a b 1\n", dialect="extended")


def test_recursive_subckt_raises():
    text = "t\n.subckt s a b\nx1 a b s\n.ends\nx0 1 0 s\n"
    with pytest.raises(ValueError, match="nesting deeper"):
        parse_netlist(text, dialect="extended")


def test_directive_inside_subckt_raises():
    text = "t\n.subckt s a b\nr1 a b 1\n.tran 1u 1m\n.ends\nx0 1 0 s\n"
    with pytest.raises(ValueError, match="not allowed inside"):
        parse_netlist(text, dialect="extended")


def test_nested_definition_raises():
    text = "t\n.subckt outer a b\n.subckt inner c d\n.ends\n.ends\n"
    with pytest.raises(ValueError, match="nested .subckt"):
        parse_netlist(text, dialect="extended")


def test_ends_without_subckt_raises():
    with pytest.raises(ValueError, match="without matching"):
        parse_netlist("t\nr1 1 0 1k\n.ends\n", dialect="extended")


def test_ground_stays_global():
    text = """the ground test
.subckt g in
r1 in 0 1k
.ends
v1 a 0 dc 1
x1 a g
.tran 1u 5u
"""
    ckt = parse_netlist(text, dialect="extended")
    assert ckt.R[0].n2 == 0


def test_untitled_netlist_starting_with_instance():
    """Flattened element names contain dots and must not be eaten as the
    title (review regression)."""
    text = """.subckt div in out
r1 in out 1k
r2 out 0 3k
.ends
x1 a mid div
v1 a 0 dc 4
.tran 1u 5u
"""
    ckt = parse_netlist(text, dialect="extended")
    assert [r.name for r in ckt.R] == ["r1.x1", "r2.x1"]
    tran = simulate_tran(ckt)
    np.testing.assert_allclose(tran.node_voltages["mid"], 3.0, rtol=1e-12)


def test_x_word_title_still_parses():
    """A title whose first word starts with 'x' must not be treated as a
    subcircuit instance (review regression)."""
    ckt = parse_netlist(
        "xor gate test bench\nv1 1 0 dc 1\nr1 1 0 1k\n.tran 1u 5u\n",
        dialect="extended",
    )
    assert ckt.title == "xor gate test bench"
    assert [r.name for r in ckt.R] == ["r1"]


def test_subckt_header_inline_comment():
    """Inline ;-comments on the .subckt header must not become ports
    (review regression)."""
    text = """the commented header
.subckt div in out ; a divider
r1 in out 1k
r2 out 0 1k // half
.ends
v1 a 0 dc 2
x1 a mid div
.tran 1u 5u
"""
    ckt = parse_netlist(text, dialect="extended")
    tran = simulate_tran(ckt)
    np.testing.assert_allclose(tran.node_voltages["mid"], 1.0, rtol=1e-12)
