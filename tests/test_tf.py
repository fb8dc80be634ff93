"""Extended-dialect .tf DC transfer-function analysis.

The reference has no DC analyses at all (SURVEY §2.9); `.tf` mirrors
ngspice's `.tf v(out[,ref]) <src>` built on the .op linearization.
"""

import numpy as np
import pytest

from spicey_tpu import format_tf_result, parse_netlist, simulate, simulate_tf


def test_divider_tf():
    """Resistor divider: gain = R2/(R1+R2), Rin = R1+R2, Rout = R1 || R2."""
    r = simulate(
        """the divider
v1 in 0 dc 10
r1 in out 1k
r2 out 0 3k
.tf v(out) v1
""",
        dialect="extended",
    )
    tf = r.tf
    assert tf.transfer_function == pytest.approx(0.75, rel=1e-12)
    assert tf.input_impedance == pytest.approx(4000.0, rel=1e-12)
    assert tf.output_impedance == pytest.approx(750.0, rel=1e-12)


def test_tf_differential_output():
    r = simulate(
        """the diff output
v1 in 0 dc 1
r1 in a 1k
r2 a b 1k
r3 b 0 1k
.tf v(a,b) v1
""",
        dialect="extended",
    )
    assert r.tf.transfer_function == pytest.approx(1.0 / 3.0, rel=1e-12)
    assert r.tf.out_spec == "v(a,b)"


def test_tf_current_source_input():
    """I input: gain is a transresistance (V/A); Rin = voltage across the
    source per amp."""
    ckt = parse_netlist(
        """the norton
i1 0 in 1m
r1 in 0 2k
r2 in out 1k
r3 out 0 1k
.tf v(out) i1
""",
        dialect="extended",
    )
    tf = simulate_tf(ckt)
    # node in sees 2k || (1k+1k) = 1k; out = in/2 -> 500 V/A
    assert tf.transfer_function == pytest.approx(500.0, rel=1e-12)
    assert tf.input_impedance == pytest.approx(1000.0, rel=1e-12)
    # looking into out: 1k || (1k + 2k) = 750
    assert tf.output_impedance == pytest.approx(750.0, rel=1e-12)


def test_tf_inductor_is_dc_short():
    r = simulate(
        """the l short
v1 in 0 dc 1
l1 in mid 10m
r1 mid out 1k
r2 out 0 1k
.tf v(out) v1
""",
        dialect="extended",
    )
    assert r.tf.transfer_function == pytest.approx(0.5, rel=1e-12)
    assert r.tf.input_impedance == pytest.approx(2000.0, rel=1e-12)


def test_tf_capacitor_is_dc_open():
    r = simulate(
        """the c open
v1 in 0 dc 1
r1 in out 1k
c1 in out 1u
r2 out 0 1k
.tf v(out) v1
""",
        dialect="extended",
    )
    assert r.tf.transfer_function == pytest.approx(0.5, rel=1e-12)


def test_tf_vcvs_amplifier():
    """Ideal VCVS amplifier: gain = 10 * divider; Rout = 0 at the VCVS."""
    r = simulate(
        """the amp
v1 in 0 dc 0.1
r1 in g 1k
r2 g 0 1k
e1 out 0 g 0 10
.tf v(out) v1
""",
        dialect="extended",
    )
    assert r.tf.transfer_function == pytest.approx(5.0, rel=1e-12)
    assert r.tf.output_impedance == pytest.approx(0.0, abs=1e-12)
    assert r.tf.input_impedance == pytest.approx(2000.0, rel=1e-12)


def test_tf_linearizes_diode_at_op():
    """Diode small-signal resistance rd = n*VT/Id at the bias point."""
    from spicey_tpu.constants import VT_300K

    r = simulate(
        """the diode bias
v1 in 0 dc 5
r1 in out 1k
d1 out 0 dm
.model dm d(is=1e-14)
.tf v(out) v1
""",
        dialect="extended",
    )
    # recompute the expected small-signal divide from the bias point
    from spicey_tpu import simulate_op

    op = simulate_op(r.circuit)
    vd = op.node_voltages["out"]
    gd = 1e-14 / VT_300K * np.exp(vd / VT_300K)
    rd = 1.0 / gd
    expected = rd / (1000.0 + rd)
    assert r.tf.transfer_function == pytest.approx(expected, rel=1e-6)
    assert r.tf.output_impedance == pytest.approx(
        rd * 1000.0 / (rd + 1000.0), rel=1e-6)


def test_tf_mosfet_common_source():
    """Common-source amp: gain = -gm*RD (lambda=0), Rout = RD, Rin = inf."""
    r = simulate(
        """the cs amp
vdd vdd 0 dc 5
vin g 0 dc 1.5
rd vdd out 10k
m1 out g 0 mn
.model mn nmos(vto=1 kp=2e-4)
.tf v(out) vin
""",
        dialect="extended",
    )
    # beta = kp*W/L = 2e-4 (W=L default); saturation: gm = beta*(vgs-vto)
    gm = 2e-4 * (1.5 - 1.0)
    # gds floors at GMIN=1e-12, shifting the gain by ~gmin*RD = 1e-8
    assert r.tf.transfer_function == pytest.approx(-gm * 10e3, rel=1e-7)
    assert r.tf.output_impedance == pytest.approx(10e3, rel=1e-7)
    assert r.tf.input_impedance == float("inf")


def test_tf_unknown_source_raises():
    with pytest.raises(ValueError, match="Unknown source"):
        simulate("t\nv1 1 0 dc 1\nr1 1 0 1k\n.tf v(1) vx\n",
                 dialect="extended")


def test_tf_unknown_node_raises():
    with pytest.raises(ValueError, match="Unknown node"):
        simulate("t\nv1 1 0 dc 1\nr1 1 0 1k\n.tf v(zz) v1\n",
                 dialect="extended")


def test_tf_malformed_spec_raises():
    with pytest.raises(ValueError, match="output must be"):
        parse_netlist("t\n.tf i(v1) v1\n", dialect="extended")


def test_tf_skipped_in_spicey_dialect():
    ckt = parse_netlist("t\nv1 1 0 dc 1\nr1 1 0 1k\n.tf v(1) v1\n")
    assert ckt.tf is None
    assert any(".tf" in s for s in ckt.skipped)


def test_format_tf_result():
    r = simulate(
        "the fmt\nv1 in 0 dc 1\nr1 in out 1k\nr2 out 0 1k\n.tf v(out) v1\n",
        dialect="extended",
    )
    out = format_tf_result(r.tf)
    assert "transfer_function(v(out)/v1) = 0.500000" in out
    assert "input_impedance(v1) = 2000.00" in out
    assert "output_impedance(v(out)) = 500.000" in out
    assert format_tf_result(None) == "No TF analysis.\n"
