"""circuit-json vgraph interop + comparison-metric tests (contract:
/root/reference/lib/formatting/formatToVGraph.ts and
tests/fixtures/compare-voltage-levels.ts)."""

import pytest

from spicey_tpu import simulate, spicey_tran_to_vgraphs, eec_engine_tran_to_vgraphs
from spicey_tpu.formatting.compare import compare_voltage_levels
from tests.fixtures import netlists


def test_vgraph_shapes():
    r = simulate(netlists.TWO_PROBES)
    graphs = spicey_tran_to_vgraphs(r.tran, r.circuit, "two_probes_rc_pulse")
    assert len(graphs) == 2
    g = graphs[0]
    assert g["type"] == "simulation_transient_voltage_graph"
    assert g["simulation_transient_voltage_graph_id"] == "stvg_two_probes_rc_pulse_1"
    assert g["simulation_experiment_id"] == "two_probes_rc_pulse"
    assert g["name"] == "V(1)"
    # seconds -> ms
    assert g["timestamps_ms"][1] == pytest.approx(r.tran.times[1] * 1000)
    assert g["time_per_step"] == pytest.approx(r.circuit.tran.dt * 1000)
    assert g["start_time_ms"] == 0
    assert g["end_time_ms"] == pytest.approx(r.circuit.tran.tstop * 1000)
    assert len(g["voltage_levels"]) == len(r.tran.times)


def test_vgraph_none_inputs():
    r = simulate(netlists.BASICS01_AC)  # no .tran
    assert spicey_tran_to_vgraphs(r.tran, r.circuit, "x") == []


def test_eec_vgraphs():
    r = simulate(netlists.RC_PULSE)
    eec = {"time_s": [0.0, 1e-6], "voltages": {"1": [0.0, 5.0]}}
    graphs = eec_engine_tran_to_vgraphs(eec, r.circuit, "exp")
    assert len(graphs) == 1
    assert graphs[0]["name"] == "V(1) (ngspice)"
    assert graphs[0]["simulation_transient_voltage_graph_id"] == "stvg_exp_1_eec"


def _graph(name, levels):
    return {
        "simulation_transient_voltage_graph_id": f"id_{name}",
        "name": name,
        "voltage_levels": levels,
    }


def test_compare_identical_is_zero():
    a = [_graph("V(N1)", [1.0, 2.0, 3.0])]
    b = [_graph("V(N1) (ngspice)", [1.0, 2.0, 3.0])]
    result = compare_voltage_levels(a, b)
    node = result["nodes"]["V(N1)"]
    assert node["mean_absolute_difference"] == 0
    assert node["max_absolute_difference"] == 0
    assert node["percentage_difference"] == 0
    assert result["overall_average_percentage_difference"] == 0
    assert result["unmatched_spicey_nodes"] == []
    assert result["unmatched_ngspice_nodes"] == []


def test_compare_stats():
    a = [_graph("V(out)", [0.0, 1.0, 2.0, 4.0])]
    b = [_graph("V(OUT) (ngspice)", [0.0, 2.0, 2.0, 2.0])]
    result = compare_voltage_levels(a, b)
    node = result["nodes"]["V(OUT)"]
    assert node["compared_samples"] == 4
    assert node["max_absolute_difference"] == 2.0
    assert node["mean_absolute_difference"] == 0.75
    assert node["reference_max_magnitude"] == 2.0
    assert node["percentage_difference"] == 37.5


def test_compare_unmatched():
    a = [_graph("V(a)", [1.0]), _graph("V(b)", [1.0])]
    b = [_graph("V(b) (ngspice)", [1.0]), _graph("V(c) (ngspice)", [1.0])]
    result = compare_voltage_levels(a, b)
    assert result["unmatched_spicey_nodes"] == ["V(a)"]
    assert result["unmatched_ngspice_nodes"] == ["V(C)"]


def test_compare_zero_reference():
    a = [_graph("V(n)", [0.1, 0.1])]
    b = [_graph("V(n) (ngspice)", [0.0, 0.0])]
    result = compare_voltage_levels(a, b)
    assert result["nodes"]["V(N)"]["percentage_difference"] == 100


def test_compare_length_mismatch_truncates():
    a = [_graph("V(n)", [1.0, 2.0, 3.0])]
    b = [_graph("V(n) (ngspice)", [1.0, 2.0])]
    result = compare_voltage_levels(a, b)
    assert result["nodes"]["V(N)"]["compared_samples"] == 2
