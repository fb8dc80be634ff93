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
