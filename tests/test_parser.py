"""Parser IR tests (contract: /root/reference/lib/parsing/parseNetlist.ts),
mirroring the reference's behavioral assertions in
tests/transient/{diode-switch,case-insensitive-nodes,switch-vt-vh}.test.ts
plus dialect edge cases."""

import pytest

from spicey_tpu import parse_netlist
from tests.fixtures import netlists


def test_basics01_ir():
    ckt = parse_netlist(netlists.BASICS01_AC)
    # quirk: "Demo ..." starts with 'd' which matches the element-name regex
    # (parseNetlist.ts:158), so it is NOT a title — it falls through to the
    # diode dispatch and lands in `skipped` (:441-443)
    assert ckt.title is None
    assert ckt.skipped == ["Demo of a simple AC circuit"]
    assert [r.name for r in ckt.R] == ["r1"]
    assert ckt.R[0].R == 30.0
    assert ckt.C[0].C == pytest.approx(1e-4)
    assert len(ckt.V) == 1
    v = ckt.V[0]
    assert (v.dc, v.ac_mag, v.ac_phase_deg) == (0.0, 1.0, 0.0)
    assert ckt.ac.mode == "dec" and ckt.ac.N == 100
    assert (ckt.ac.f1, ckt.ac.f2) == (1.0, 100.0)
    assert ckt.tran is None
    # MNA ordering: nodes 1..N-1 then branch currents
    assert ckt.n_node_vars == 2
    assert v.index == 2


def test_case_insensitive_nodes():
    # case-insensitive-nodes.test.ts:20-35
    ckt = parse_netlist(netlists.CASE_INSENSITIVE)
    assert ckt.nodes.count() == 3
    assert ckt.nodes.rev == ["0", "nOdE1", "nOde2"]
    assert sorted(ckt.tran_probes) == sorted(["node1", "NODE2"])


def test_diode_switch_models():
    # diode-switch.test.ts:21-40
    ckt = parse_netlist(netlists.DIODE_SWITCH)
    assert len(ckt.D) == 1 and len(ckt.S) == 1
    assert "d" in ckt.diode_models
    assert "swmod" in ckt.vswitch_models
    assert ckt.diode_models["d"].Is == 1e-14
    assert ckt.diode_models["d"].N == 1.0
    m = ckt.vswitch_models["swmod"]
    assert (m.Ron, m.Roff, m.Von, m.Voff) == (1.0, 1e12, 0.0, 0.0)
    # models resolved onto elements
    assert ckt.D[0].model is ckt.diode_models["d"]
    assert ckt.S[0].model is ckt.vswitch_models["swmod"]


def test_switch_vt_vh_translation():
    # switch-vt-vh.test.ts:33-36: Von = vt + vh/2, Voff = vt - vh/2
    ckt = parse_netlist(netlists.SWITCH_VT_VH)
    m = ckt.S[0].model
    assert m.Von == pytest.approx(2.55)
    assert m.Voff == pytest.approx(2.45)
    assert m.Ron == pytest.approx(0.1)
    assert m.Roff == pytest.approx(1e9)
    assert ckt.tran_probes == ["n2", "nctrl_sw1"]


def test_vswitch_pwl_model():
    # vswitch-pwl.test.ts:31-38
    ckt = parse_netlist(netlists.VSWITCH_PWL)
    m = ckt.S[0].model
    assert (m.Ron, m.Roff, m.Von, m.Voff) == (1.0, 1e9, 2.0, 1.0)
    assert ckt.V[1].waveform is not None
    assert ckt.V[1].waveform(0.5e-3) == pytest.approx(2.5)


def test_tran_extra_tokens_ignored():
    # boost fixture carries ngspice's `uic` (parseNetlist.ts:180-187)
    ckt = parse_netlist(netlists.BOOST_CONVERTER)
    assert ckt.tran.dt == 0.001 and ckt.tran.tstop == 0.1
    assert ckt.tran_probes == ["n1", "n3"]


def test_title_and_comments():
    # 'The' starts with 't', outside [rclvgsmiqd] -> real title line
    ckt = parse_netlist(
        "The title line\n* a comment\nr1 a b 1k ; trailing\nr2 a 0 2k // note\n.end\nr3 x y 1\n"
    )
    assert ckt.title == "The title line"
    assert len(ckt.R) == 2
    assert ckt.R[0].R == 1000.0  # inline comments stripped


def test_elementlike_first_line_is_not_title():
    # 'my' matches ^[rclvgsmiqd]\w*$ ('m'), so it's dispatched as a MOSFET-ish
    # element and skipped, NOT consumed as title (parseNetlist.ts:158,444-446)
    ckt = parse_netlist("my title line\nr1 1 0 1k\n")
    assert ckt.title is None
    assert ckt.skipped == ["my title line"]


def test_element_line_can_be_first_without_title():
    ckt = parse_netlist("r1 1 0 1k\nv1 1 0 5\n")
    assert ckt.title is None
    assert len(ckt.R) == 1 and len(ckt.V) == 1


def test_unknown_elements_skipped():
    # I/G/E/... are unsupported -> skipped bucket (parseNetlist.ts:444-446)
    ckt = parse_netlist("t\nI1 1 0 5\nE1 2 0 1 0 10\nX1 a b sub\nr1 1 0 1k\n")
    assert len(ckt.skipped) == 3
    assert len(ckt.R) == 1


def test_diode_requires_exactly_4_tokens():
    ckt = parse_netlist("t\n.model dm d\nD1 1 0 dm extra\n")
    assert len(ckt.D) == 0
    assert any("D1" in s for s in ckt.skipped)


def test_unknown_model_raises():
    with pytest.raises(ValueError, match="Unknown .model"):
        parse_netlist("t\nS1 1 0 2 0 nomodel\n")
    with pytest.raises(ValueError, match="Unknown .model"):
        parse_netlist("t\nD1 1 0 nomodel\n")


def test_v_source_forms():
    ckt = parse_netlist(
        "t\n"
        "v1 1 0 5\n"
        "v2 2 0 dc 3 ac 2 45\n"
        "v3 3 0 ac 1\n"
        "v4 4 0 PULSE(0 1 0 1n 1n 1u 2u)\n"
        "v5 5 0 pwl (0 0 1m 1)\n"
    )
    v1, v2, v3, v4, v5 = ckt.V
    assert v1.dc == 5.0
    assert (v2.dc, v2.ac_mag, v2.ac_phase_deg) == (3.0, 2.0, 45.0)
    assert (v3.ac_mag, v3.ac_phase_deg) == (1.0, 0.0)
    assert v4.waveform is not None and v4.waveform(5e-7) == 1.0
    assert v5.waveform is not None and v5.waveform(5e-4) == pytest.approx(0.5)
    # branch indices follow node unknowns
    assert [v.index for v in ckt.V] == [5, 6, 7, 8, 9]


def test_dot_end_stops_parsing():
    ckt = parse_netlist("t\nr1 1 0 1\n.END\nr2 2 0 1\n")
    assert len(ckt.R) == 1
    # .ends does NOT stop (\b boundary in the reference regex)
    ckt2 = parse_netlist("t\n.ends\nr1 1 0 1\n")
    assert len(ckt2.R) == 1


def test_ac_validation():
    with pytest.raises(ValueError, match="dec"):
        parse_netlist("t\n.ac oct 10 1 100\n")


def test_parse_error_includes_line():
    with pytest.raises(ValueError, match='Parse error on line: "r1 1 0"'):
        parse_netlist("t\nr1 1 0\n")


def test_model_spread_params():
    # non-parenthesized params use the spread path (parseNetlist.ts:222-224)
    ckt = parse_netlist("t\n.model m1 sw ron=2 roff=1e6\nS1 1 0 2 0 m1\n")
    m = ckt.vswitch_models["m1"]
    assert m.Ron == 2.0 and m.Roff == 1e6
    # glued form
    ckt2 = parse_netlist("t\n.model m2 d(is=1e-12 n=1.5)\nD1 1 0 m2\n")
    d = ckt2.diode_models["m2"]
    assert d.Is == 1e-12 and d.N == 1.5


def test_model_space_before_paren_is_skipped_quirk():
    # 'sw (params)' tokenizes as ONE token via \w+\s*\(...\), leaving the
    # model type as "sw " (trailing space) which matches no known type ->
    # the whole .model line is skipped and the switch resolution throws
    # (parseNetlist.ts:216-221,231,282-284,463-467)
    with pytest.raises(ValueError, match="Unknown .model"):
        parse_netlist("t\n.model m1 sw (ron=2)\nS1 1 0 2 0 m1\n")


def test_model_name_case():
    ckt = parse_netlist("t\n.model MyModel SW\nS1 1 0 2 0 mymodel\n")
    assert "mymodel" in ckt.vswitch_models
    assert ckt.vswitch_models["mymodel"].name == "MyModel"


def test_probe_dedupe_preserves_first_casing():
    ckt = parse_netlist("t\n.print tran v(Out) v(OUT) v(out2)\n.tran 1u 1m\n")
    assert ckt.tran_probes == ["Out", "out2"]


def test_nonprint_tran_skipped():
    ckt = parse_netlist("t\n.print ac v(1)\n")
    assert len(ckt.skipped) == 1


def test_options_directive():
    """.options (extended): key=value pairs; temp aliases .temp; reltol
    switches the transient Newton to iterate-to-convergence."""
    from spicey_tpu import parse_netlist

    ckt = parse_netlist(
        "t\nv1 a 0 1\nr1 a 0 1k\n"
        ".options temp=126.85 reltol=1e-6 itl4=30 keepopinfo\n.end\n",
        dialect="extended")
    assert ckt.options["reltol"] == 1e-6
    assert ckt.options["itl4"] == 30
    assert ckt.options["keepopinfo"] == 1.0
    assert abs(ckt.temp_kelvin - 400.0) < 1e-9
    # .temp wins over .options temp
    ckt2 = parse_netlist(
        "t\nv1 a 0 1\nr1 a 0 1k\n.temp 26.85\n.options temp=100\n.end\n",
        dialect="extended")
    assert abs(ckt2.temp_kelvin - 300.0) < 1e-9
    # reference dialect: .options lands in skipped
    ckt3 = parse_netlist("t\nv1 a 0 1\nr1 a 0 1k\n.options reltol=1e-6\n.end\n")
    assert any(line.startswith(".options") for line in ckt3.skipped)


def test_options_reltol_drives_tran_convergence():
    import numpy as np

    from spicey_tpu import simulate

    net = """* diode clip
.model d1 d
v1 in 0 SIN(0 2 1k)
d1x in out d1
rl out 0 1k
.tran 20u 1m
{O}.end
"""
    loose = simulate(net.format(O=""), dialect="extended")
    tight = simulate(net.format(O=".options reltol=1e-12\n"),
                     dialect="extended")
    # iterate-to-convergence refines the single-Newton-step diode solution
    a = np.asarray(loose.tran.node_voltages["out"])
    b = np.asarray(tight.tran.node_voltages["out"])
    assert np.abs(a - b).max() > 0  # semantics differ...
    assert np.abs(a - b).max() < 0.3  # ...but stay close (knee region)


def test_print_ac_and_current_probes_extended():
    """Extended: .print ac v(...) filters AC node output; .print tran
    i(...) filters element currents. The reference dialect skips .print ac
    and ignores i() tokens entirely."""
    from spicey_tpu import simulate

    net = """x
v1 in 0 dc 0 ac 1 PULSE(0 1 0 1n 1n 5u 20u)
r1 in out 1k
c1 out 0 1n
.ac lin 3 100 1k
.tran 1u 10u
.print ac v(out)
.print tran v(out) i(r1)
"""
    r = simulate(net, dialect="extended")
    assert list(r.ac.node_voltages) == ["out"]
    assert list(r.tran.node_voltages) == ["out"]
    assert list(r.tran.element_currents) == ["r1"]
    # reference dialect: .print ac -> skipped, i() token ignored
    r0 = simulate(net)
    assert set(r0.ac.node_voltages) == {"in", "out"}
    assert set(r0.tran.element_currents) == {"r1", "c1", "v1"}
    ckt0 = r0.circuit
    assert any(".print ac" in s for s in ckt0.skipped)


def test_save_selects_vectors_extended():
    """.save v()/i() (extended): selects node output in tran AND ac and
    filters recorded element currents; the reference dialect skips it."""
    from spicey_tpu import simulate

    net = """x
v1 in 0 dc 0 ac 1 PULSE(0 1 0 1n 1n 5u 20u)
r1 in out 1k
c1 out 0 1n
.ac lin 3 100 1k
.tran 1u 10u
.save v(out) i(c1)
"""
    r = simulate(net, dialect="extended")
    assert list(r.ac.node_voltages) == ["out"]
    assert list(r.tran.node_voltages) == ["out"]
    assert list(r.tran.element_currents) == ["c1"]
    ckt0 = simulate(net).circuit
    assert any(".save" in s for s in ckt0.skipped)


def test_plot_and_probe_directives_extended():
    from spicey_tpu import parse_netlist

    deck = ("* plot/probe\nv1 1 0 dc 0 ac 1 pulse(0 1 0 1u 1u 1m 2m)\n"
            "r1 1 2 1k\nc1 2 0 1u\n"
            ".plot tran v(2)\n.probe v(1) i(v1)\n"
            ".tran 0.1m 1m\n.end\n")
    ckt = parse_netlist(deck, dialect="extended")
    assert [p.upper() for p in ckt.tran_probes] == ["2", "1"]
    assert [p.upper() for p in ckt.tran_iprobes] == ["V1"]
    assert [p.upper() for p in ckt.ac_probes] == ["1"]
    assert not ckt.skipped
    # reference dialect: both are unknown directives, dropped per line
    ckt_ref = parse_netlist(deck, dialect="spicey")
    assert ".plot tran v(2)" in ckt_ref.skipped
    assert ".probe v(1) i(v1)" in ckt_ref.skipped
    assert not ckt_ref.tran_probes


def test_plot_missing_type_error_names_plot():
    """The extended .plot directive's error must not mislabel itself as
    .print (ADVICE r4)."""
    import pytest

    from spicey_tpu import parse_netlist

    with pytest.raises(ValueError, match=r"\.plot missing analysis type"):
        parse_netlist("* t\nv1 1 0 dc 1\nr1 1 0 1k\n.plot\n.end\n",
                      dialect="extended")
