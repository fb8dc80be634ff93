"""SVG rendering + snapshot tests, mirroring the reference's visual test
mode (SVG snapshots of simulation graphs,
tests/transient/transient01.test.ts:33-62)."""

from spicey_tpu import simulate, spicey_tran_to_vgraphs
from spicey_tpu.formatting.svg import convert_simulation_graphs_to_svg
from tests.fixtures import netlists
from tests.svg_snapshot import match_svg_snapshot


def _experiment(exp_id, name):
    return {
        "type": "simulation_experiment",
        "simulation_experiment_id": exp_id,
        "name": name,
        "experiment_type": "transient_simulation",
    }


def test_rc_pulse_svg_snapshot():
    r = simulate(netlists.RC_PULSE)
    exp_id = "rc_pulse_experiment"
    graphs = spicey_tran_to_vgraphs(r.tran, r.circuit, exp_id)
    svg = convert_simulation_graphs_to_svg(
        [_experiment(exp_id, "RC Circuit Pulse Response"), *graphs], exp_id
    )
    assert svg.startswith("<svg")
    assert svg.count("<polyline") == 2
    assert "V(1)" in svg and "V(2)" in svg
    match_svg_snapshot(svg, "transient01-rc-pulse")


def test_vswitch_pwl_svg_snapshot():
    r = simulate(netlists.VSWITCH_PWL)
    exp_id = "vswitch_pwl_spst"
    graphs = spicey_tran_to_vgraphs(r.tran, r.circuit, exp_id)
    svg = convert_simulation_graphs_to_svg(
        [_experiment(exp_id, "SPST switch under PWL control"), *graphs],
        exp_id,
    )
    assert svg.count("<polyline") == len(graphs)
    match_svg_snapshot(svg, "vswitch-pwl-control")


def test_svg_is_deterministic():
    r = simulate(netlists.TWO_PROBES)
    exp_id = "two_probes"
    graphs = spicey_tran_to_vgraphs(r.tran, r.circuit, exp_id)
    cj = [_experiment(exp_id, "Two Probes"), *graphs]
    assert (convert_simulation_graphs_to_svg(cj, exp_id)
            == convert_simulation_graphs_to_svg(cj, exp_id))


def test_svg_filters_by_experiment_id():
    r = simulate(netlists.TWO_PROBES)
    graphs = spicey_tran_to_vgraphs(r.tran, r.circuit, "exp_a")
    other = spicey_tran_to_vgraphs(r.tran, r.circuit, "exp_b")
    cj = [_experiment("exp_a", "A"), *graphs, *other]
    svg = convert_simulation_graphs_to_svg(cj, "exp_a")
    assert svg.count("<polyline") == 2  # only exp_a's graphs


def test_svg_empty_graphs():
    svg = convert_simulation_graphs_to_svg(
        [_experiment("empty", "Empty")], "empty"
    )
    assert svg.startswith("<svg") and svg.endswith("</svg>")


def test_switch_vt_vh_svg_snapshot():
    """Reference scenario 3/5: switch-vt-vh graph
    (tests/transient/switch-vt-vh.test.ts)."""
    r = simulate(netlists.SWITCH_VT_VH)
    exp_id = "switch_vt_vh"
    graphs = spicey_tran_to_vgraphs(r.tran, r.circuit, exp_id)
    svg = convert_simulation_graphs_to_svg(
        [_experiment(exp_id, "Switch with Vt and Vh"), *graphs], exp_id
    )
    assert svg.count("<polyline") == 2  # probed: n2, nctrl_sw1
    match_svg_snapshot(svg, "switch-vt-vh-graph")


def test_two_probes_svg_snapshot():
    """Reference scenario 4/5: two-probes graph
    (tests/transient/two-probes.test.ts)."""
    r = simulate(netlists.TWO_PROBES)
    exp_id = "two_probes"
    graphs = spicey_tran_to_vgraphs(r.tran, r.circuit, exp_id)
    svg = convert_simulation_graphs_to_svg(
        [_experiment(exp_id, "Two Probes"), *graphs], exp_id
    )
    assert svg.count("<polyline") == 2
    match_svg_snapshot(svg, "two-probes-graph")


def _ngspice_graphs_from_reference(snap_name, names, exp_id, ckt):
    """Rebuild ngspice vgraphs from the curves recorded in the reference
    snapshot SVGs (tests/ngspice_svg.py) — the comparison-render analog of
    eecEngineTranToVGraphs without a JS runtime."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from ngspice_svg import decode_series

    from spicey_tpu import eec_engine_tran_to_vgraphs

    series = decode_series(
        f"/root/reference/tests/transient/__snapshots__/{snap_name}"
    )
    t = None
    voltages = {}
    for name in names:
        t, v = series[f"V({name}) (ngspice)"]
        voltages[name] = list(v)
    return eec_engine_tran_to_vgraphs(
        {"time_s": list(t), "voltages": voltages}, ckt, exp_id
    )


def test_rc_pulse_comparison_svg_snapshot():
    """Reference scenario 5/5: the two-series COMPARISON render — engine
    curves + ngspice curves in one SVG (transient01.test.ts:33-62)."""
    r = simulate(netlists.RC_PULSE)
    exp_id = "rc_pulse_experiment"
    graphs = spicey_tran_to_vgraphs(r.tran, r.circuit, exp_id)
    ng = _ngspice_graphs_from_reference(
        "transient01-rc-pulse-comparison.snap.svg", ["1", "2"], exp_id,
        r.circuit)
    svg = convert_simulation_graphs_to_svg(
        [_experiment(exp_id, "RC Circuit Pulse Response"), *graphs, *ng],
        exp_id,
    )
    assert svg.count("<polyline") == 4
    assert "V(1) (ngspice)" in svg and "V(2) (ngspice)" in svg
    match_svg_snapshot(svg, "transient01-rc-pulse-comparison")


def test_boost_converter_comparison_svg_snapshot():
    """Boost-converter comparison render (boost-converter-probe.test.ts):
    engine + recorded-ngspice series, probed nodes only."""
    r = simulate(netlists.BOOST_CONVERTER)
    exp_id = "boost_converter_probe"
    graphs = spicey_tran_to_vgraphs(r.tran, r.circuit, exp_id)
    ng = _ngspice_graphs_from_reference(
        "boost-converter-probe-boost-converter-probe.snap.svg",
        ["n1", "n3"], exp_id, r.circuit)
    svg = convert_simulation_graphs_to_svg(
        [_experiment(exp_id, "Boost Converter with Probe"), *graphs, *ng],
        exp_id,
    )
    assert svg.count("<polyline") == 4
    match_svg_snapshot(svg, "boost-converter-probe")
