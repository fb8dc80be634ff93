"""Cross-engine validation against *real ngspice* data.

The reference's accuracy contract is validated against ngspice run via
eecircuit-engine (tests/fixtures/ngspice-transient.ts:12-110); its accepted
deviations are pinned in an inline snapshot
(tests/transient/boost-converter-probe.test.ts:76-98). The ngspice curves
are recorded with ~1e-6-pixel precision in the reference snapshot SVGs —
tests/ngspice_svg.py decodes them, giving an independent oracle that is NOT
a re-derivation of the reference algorithm (unlike tests/oracle.py).

Two kinds of assertion:
  - bit-level parity of our engine's curves with the reference engine's own
    recorded curves (the plain legend series), and
  - deviation-vs-ngspice statistics equal to the numbers the reference
    accepts (exact dict equality for the boost converter, the same
    index-wise compare-voltage-levels contract).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from ngspice_svg import decode_series  # noqa: E402

from spicey_tpu import simulate  # noqa: E402
from spicey_tpu.formatting.compare import compare_voltage_levels  # noqa: E402
from spicey_tpu.formatting.vgraph import spicey_tran_to_vgraphs  # noqa: E402

SNAPDIR = Path("/root/reference/tests/transient/__snapshots__")

RC_PULSE_NETLIST = """* RC circuit with a pulse source

V1 1 0 PULSE(0 5 0 1n 1n 5u 10u)
R1 1 2 1k
C1 2 0 1u

.tran 0.1u 20u

.end
"""

BOOST_NETLIST = """* Circuit JSON to SPICE Netlist
.MODEL D D
.MODEL SWMOD SW
LL1 N1 N2 1
DD1 N2 N3 D
CC1 N3 0 10U
RR1 N3 0 1K
SM1 N2 0 N4 0 SWMOD
Vsimulation_voltage_source_0 N1 0 DC 5
Vsimulation_voltage_source_1 N4 0 PULSE(0 10 0 1n 1n 0.00068 0.001)
.PRINT TRAN V(n1) V(n3)
.tran 0.001 0.1 uic
.END
"""


def test_rc_pulse_curve_parity_with_reference_engine():
    """Our 201-step curves equal the reference engine's recorded curves."""
    rc = decode_series(str(SNAPDIR / "transient01-rc-pulse-comparison.snap.svg"))
    r = simulate(RC_PULSE_NETLIST)
    ours_v1 = np.asarray(r.tran.node_voltages["1"])
    ours_v2 = np.asarray(r.tran.node_voltages["2"])
    assert np.abs(ours_v1 - rc["V(1)"][1]).max() < 1e-12
    assert np.abs(ours_v2 - rc["V(2)"][1]).max() < 1e-7


def test_rc_pulse_matches_ngspice():
    """Independent cross-engine check: deviation vs real ngspice curves.

    ngspice integrates this RC with adaptive trapezoidal steps (262 points);
    interpolating onto our uniform 0.1us grid, backward-Euler at this step
    agrees to ~1e-5 V absolute on the 50 mV V(2) swing."""
    rc = decode_series(str(SNAPDIR / "transient01-rc-pulse-comparison.snap.svg"))
    r = simulate(RC_PULSE_NETLIST)
    ours_t = np.asarray(r.tran.times)
    for node, mean_tol, max_tol in (("1", 1e-9, 1e-9), ("2", 1e-5, 5e-5)):
        tn, vn = rc[f"V({node}) (ngspice)"]
        ours = np.asarray(r.tran.node_voltages[node])
        d = np.abs(ours - np.interp(ours_t, tn, vn))
        assert d.mean() < mean_tol, (node, d.mean())
        assert d.max() < max_tol, (node, d.max())


def test_boost_converter_curve_parity_with_reference_engine():
    bs = decode_series(
        str(SNAPDIR / "boost-converter-probe-boost-converter-probe.snap.svg")
    )
    r = simulate(BOOST_NETLIST)
    sg = spicey_tran_to_vgraphs(r.tran, r.circuit, "boost_converter_probe")
    by_name = {g["name"].upper(): np.asarray(g["voltage_levels"]) for g in sg}
    assert np.abs(by_name["V(N1)"] - bs["V(N1)"][1]).max() < 1e-12
    assert np.abs(by_name["V(N3)"] - bs["V(N3)"][1]).max() < 1e-6


def test_boost_converter_ngspice_stats_match_reference_snapshot():
    """Reproduce the reference's accepted ngspice deviation stats EXACTLY.

    Contract: boost-converter-probe.test.ts:76-98 — index-wise
    compare-voltage-levels of the 101-step spicey curves against ngspice's
    906 raw timesteps (compared_samples = min = 101), V(N1) exact and
    V(N3) at 44.254385% mean/ref-max deviation (the diode+switch
    discretization difference the reference accepts)."""
    bs = decode_series(
        str(SNAPDIR / "boost-converter-probe-boost-converter-probe.snap.svg")
    )
    r = simulate(BOOST_NETLIST)
    sg = spicey_tran_to_vgraphs(r.tran, r.circuit, "boost_converter_probe")
    ng = [
        {"name": name, "simulation_transient_voltage_graph_id": name,
         "voltage_levels": list(bs[name][1])}
        for name in ("V(n1) (ngspice)", "V(n3) (ngspice)")
    ]
    stats = compare_voltage_levels(sg, ng)
    assert stats == {
        "overall_average_percentage_difference": 22.127192,
        "nodes": {
            "V(N1)": {
                "compared_samples": 101,
                "mean_absolute_difference": 0.0,
                "max_absolute_difference": 0.0,
                "reference_max_magnitude": 5.0,
                "percentage_difference": 0.0,
            },
            "V(N3)": {
                "compared_samples": 101,
                "mean_absolute_difference": 2.406636,
                "max_absolute_difference": 5.868021,
                "reference_max_magnitude": 5.438187,
                "percentage_difference": 44.254385,
            },
        },
        "unmatched_spicey_nodes": [],
        "unmatched_ngspice_nodes": [],
    }
