"""Extended-dialect .step parameter sweeps.

LTspice-style stepping realized the TPU way: every step value is one lane
of the batched engines — ONE compiled call per analysis, not a rerun per
step. Single-circuit results keep the base element values; the sweep
lands in ``SimulationResult.step``.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate

DECK = """x
v1 in 0 dc 1 ac 1 PULSE(0 1 0 1n 1n 5u 20u)
r1 in out 1k
c1 out 0 1n
.tran 0.2u 8u
.ac lin 3 1k 100k
.meas tran vmax max v(out)
"""


def test_step_parse_forms():
    ckt = parse_netlist(DECK + ".step param r1 500 2000 500\n",
                        dialect="extended")
    assert ckt.step.param == "r1"
    np.testing.assert_allclose(ckt.step.values, [500, 1000, 1500, 2000])
    ckt2 = parse_netlist(DECK + ".step r1 list 100 1k 10k\n",
                         dialect="extended")
    np.testing.assert_allclose(ckt2.step.values, [100, 1e3, 1e4])
    with pytest.raises(ValueError, match="does not reach"):
        parse_netlist(DECK + ".step param r1 500 2000 -500\n",
                      dialect="extended")
    # reference dialect: skipped
    ckt0 = parse_netlist(DECK + ".step param r1 500 2000 500\n")
    assert ckt0.step is None
    assert any(".step" in s for s in ckt0.skipped)


def test_step_sweeps_all_analyses():
    r = simulate(DECK + ".step param r1 500 2000 500\n",
                 dialect="extended")
    s = r.step
    assert s.tran.xs.shape[0] == 4 and s.ac.x.shape[0] == 4
    # AC at 100 kHz: |v(out)| falls as R rises (lower corner)
    h_hi = np.abs(s.ac.x[:, -1, 1])
    assert np.all(np.diff(h_hi) < 0)
    # per-step measurement distribution
    assert s.meas["vmax"].shape == (4,)
    assert np.all(np.diff(s.meas["vmax"]) < 0)
    # base single-circuit results still present at the base value
    assert r.tran is not None and r.ac is not None


def test_step_op_lanes():
    r = simulate("""x
v1 in 0 dc 10
r1 in out 6k
r2 out 0 4k
.op
.step param r2 2k 8k 2k
""", dialect="extended")
    s = r.step
    expect = 10.0 * s.values / (6e3 + s.values)
    np.testing.assert_allclose(s.op.node_voltage("out"), expect, rtol=1e-9)


def test_step_unknown_param_raises():
    with pytest.raises(ValueError, match="unknown|consumed|override"):
        simulate(DECK + ".step param nope 1 3 1\n", dialect="extended")


def test_step_sweeps_ua741_gain():
    """Stepping the feedback resistor of the unmodified uA741 macromodel:
    one batched call yields the whole closed-loop gain family."""
    from tests.fixtures.ua741 import UA741

    r = simulate(UA741 + """
vcc vcc 0 dc 15
vee vee 0 dc -15
vin in 0 dc 0.05
rin in minus 1k
rfb minus out 10k
xamp 0 minus vcc vee out ua741
.op
.step param rfb list 5k 10k 20k
""", dialect="extended")
    s = r.step
    # inverting gain -rfb/rin: -5, -10, -20 (times 0.05 V)
    np.testing.assert_allclose(s.op.node_voltage("out"),
                               [-0.25, -0.5, -1.0], rtol=5e-3)
