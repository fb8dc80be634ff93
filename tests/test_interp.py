"""NumPy interp tier (analysis/interp.py): the interactive-latency path.

The suite runs with SPICEY_TPU_INTERP=0 (conftest.py) so every other test
exercises the compiled engine; here we re-enable the tier per-test and
check (a) it is actually selected for tiny circuits, (b) its results
agree with the compiled engine on every reference fixture AND on
extended-dialect decks (I/G/E/F/H, K coupling, W switches, .temp, .ic,
T-line AC) to rounding level, (c) the basics01 golden stays char-exact
through it, and (d) what the tier cannot interpret (Newton-to-convergence
devices in tran, T-line history, junction charge, non-default modes)
falls back to the compiled engine.
"""

import numpy as np
import pytest

import spicey_tpu.analysis.interp as interp_mod
from spicey_tpu import format_ac_result, parse_netlist, simulate
from spicey_tpu.analysis.tran import simulate_tran
from tests.fixtures import netlists


@pytest.fixture
def interp_on(monkeypatch):
    monkeypatch.setenv("SPICEY_TPU_INTERP", "1")


@pytest.fixture
def interp_counter(monkeypatch):
    """Count interp-core invocations without changing behavior."""
    calls = {"ac": 0, "tran": 0}
    real_ac = interp_mod.interp_ac
    real_tran = interp_mod.interp_tran

    def count_ac(*a, **k):
        calls["ac"] += 1
        return real_ac(*a, **k)

    def count_tran(*a, **k):
        calls["tran"] += 1
        return real_tran(*a, **k)

    monkeypatch.setattr(interp_mod, "interp_ac", count_ac)
    monkeypatch.setattr(interp_mod, "interp_tran", count_tran)
    return calls


def _series_close(a: dict, b: dict, rtol=1e-9, atol=None):
    assert set(a) == set(b)
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        fx, fy = np.isfinite(x), np.isfinite(y)
        # unclamped Shockley recording can overflow to inf in BOTH paths
        # (reference behavior, simulateTRAN.ts:207-219) — positions must
        # agree, finite parts must agree
        assert np.array_equal(fx, fy), k
        scale = max(np.max(np.abs(y[fy]), initial=0.0), 1e-30)
        np.testing.assert_allclose(x[fx], y[fy], rtol=rtol,
                                   atol=atol if atol is not None
                                   else rtol * scale, err_msg=k)


def _run_both(netlist: str, monkeypatch):
    monkeypatch.setenv("SPICEY_TPU_INTERP", "1")
    r_interp = simulate(netlist)
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    r_engine = simulate(netlist)
    return r_interp, r_engine


def test_basics01_golden_exact_through_interp(
        fixtures_dir, interp_on, interp_counter):
    import os

    golden = open(os.path.join(fixtures_dir, "basics01_golden.txt")).read()
    result = simulate(netlists.BASICS01_AC)
    assert interp_counter["ac"] == 1  # the tier actually ran
    assert format_ac_result(result.ac) == golden


def test_ac_matches_engine_rlc(monkeypatch):
    net = """AC series RLC
V1 in 0 ac 2 45
R1 in mid 50
L1 mid out 1m
C1 out 0 100n
R2 out 0 1k
.ac lin 40 100 1e6
.end
"""
    ri, re_ = _run_both(net, monkeypatch)
    _series_close(ri.ac.node_voltages, re_.ac.node_voltages, rtol=1e-12)
    _series_close(ri.ac.element_currents, re_.ac.element_currents,
                  rtol=1e-12)
    np.testing.assert_array_equal(ri.ac.freqs, re_.ac.freqs)


@pytest.mark.parametrize("name", [
    "RC_PULSE", "TWO_PROBES", "BOOST_CONVERTER", "DIODE_SWITCH",
    "SWITCH_VT_VH", "VSWITCH_PWL", "CASE_INSENSITIVE", "SERIES_RLC",
])
def test_tran_matches_engine_on_reference_fixtures(name, monkeypatch):
    ri, re_ = _run_both(getattr(netlists, name), monkeypatch)
    assert (ri.tran is None) == (re_.tran is None)
    if ri.tran is None:
        return
    np.testing.assert_allclose(ri.tran.times, re_.tran.times, rtol=0,
                               atol=0)
    _series_close(ri.tran.node_voltages, re_.tran.node_voltages)
    _series_close(ri.tran.element_currents, re_.tran.element_currents)


def test_extended_linear_devices_ride_interp(interp_on, interp_counter,
                                             monkeypatch):
    """Round-4 widening: linear extended elements (I sources here) run on
    the interp tier for BOTH analyses and agree with the compiled engine
    (before the widening this deck paid the compiled cold path)."""
    net = """an extended-dialect deck
I1 0 out 1m ac 1
R1 out 0 1k
C1 out 0 1u
.ac dec 10 1 1e5
.tran 10u 1m
.end
"""
    r = simulate(net, dialect="extended")
    assert interp_counter["ac"] == 1
    assert interp_counter["tran"] == 1
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    re_ = simulate(net, dialect="extended")
    _series_close(r.ac.node_voltages, re_.ac.node_voltages, rtol=1e-12)
    _series_close(r.ac.element_currents, re_.ac.element_currents,
                  rtol=1e-12)
    _series_close(r.tran.node_voltages, re_.tran.node_voltages)
    _series_close(r.tran.element_currents, re_.tran.element_currents)


def _run_both_ext(netlist: str, monkeypatch):
    monkeypatch.setenv("SPICEY_TPU_INTERP", "1")
    r_interp = simulate(netlist, dialect="extended")
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    r_engine = simulate(netlist, dialect="extended")
    return r_interp, r_engine


def test_controlled_sources_match_engine(monkeypatch):
    """G/E/F/H quartet through both tiers, AC + tran."""
    net = """controlled-source quartet
V1 in 0 dc 1 ac 1 PULSE(0 1 0 1u 1u 40u 100u)
R1 in a 1k
G1 0 b a 0 2m
R2 b 0 1k
E1 c 0 a 0 10
R3 c d 2k
F1 0 e V1 5
R4 e 0 100
H1 f 0 V1 50
R5 f 0 1k
R6 d 0 1k
.ac dec 10 10 1e5
.tran 2u 200u
.end
"""
    ri, re_ = _run_both_ext(net, monkeypatch)
    # atol: branch rows cancel exactly in one tier and to ~eps in the
    # other (different summation order) — zero-signal nodes are noise
    _series_close(ri.ac.node_voltages, re_.ac.node_voltages, rtol=1e-12,
                  atol=1e-12)
    _series_close(ri.ac.element_currents, re_.ac.element_currents,
                  rtol=1e-12, atol=1e-12)
    _series_close(ri.tran.node_voltages, re_.tran.node_voltages,
                  atol=1e-15)
    _series_close(ri.tran.element_currents, re_.tran.element_currents,
                  atol=1e-15)


def test_k_coupling_matches_engine(monkeypatch):
    """K-coupled transformer: matrix companion dt*M^{-1} in tran, the
    -j M^{-1}/w admittance in AC."""
    net = """transformer deck
V1 in 0 ac 1 SIN(0 1 10k)
R1 in p 10
L1 p 0 1m
L2 s 0 4m
K1 L1 L2 0.8
R2 s 0 1k
.ac dec 15 10 1e6
.tran 2u 300u
.end
"""
    ri, re_ = _run_both_ext(net, monkeypatch)
    _series_close(ri.ac.node_voltages, re_.ac.node_voltages, rtol=1e-12)
    _series_close(ri.ac.element_currents, re_.ac.element_currents,
                  rtol=1e-12)
    _series_close(ri.tran.node_voltages, re_.tran.node_voltages)
    _series_close(ri.tran.element_currents, re_.tran.element_currents)
    # secondary actually couples
    vs = np.asarray(ri.tran.node_voltages["s"])
    assert np.abs(vs).max() > 0.1


def test_w_switch_and_temp_match_engine(monkeypatch):
    """W current-controlled switch + .temp (temperature folds into the
    tensors, so the interp tier gets R(T)/Is(T)/N(T) for free)."""
    net = """current-controlled switch deck
V1 in 0 PULSE(0 5 0 1u 1u 50u 200u)
R1 in sense 100
Vsense sense out 0
R2 out 0 1k
W1 ld 0 Vsense WM
.model WM csw(it=2m ih=0.5m ron=1 roff=1e6)
V2 ld2 0 dc 5
R3 ld2 ld 10k
D1 ld 0 DD
.model DD d(is=1e-14)
.temp 50
.tran 2u 400u
.end
"""
    ri, re_ = _run_both_ext(net, monkeypatch)
    _series_close(ri.tran.node_voltages, re_.tran.node_voltages)
    _series_close(ri.tran.element_currents, re_.tran.element_currents)


def test_ic_rides_interp_and_matches_engine(interp_on, interp_counter,
                                            monkeypatch):
    net = """* pre-charged tank
C1 a 0 1u ic=5
R1 a b 1k
L1 b 0 10m ic=0.002
.ic v(b)=0
.tran 10u 2m
.end
"""
    ri = simulate(net, dialect="extended")
    assert interp_counter["tran"] == 1
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    re_ = simulate(net, dialect="extended")
    _series_close(ri.tran.node_voltages, re_.tran.node_voltages)
    _series_close(ri.tran.element_currents, re_.tran.element_currents)
    assert np.asarray(ri.tran.node_voltages["a"])[0] > 4.0  # ic honored


def test_op_dc_tf_interp_match_engine(monkeypatch):
    """Round-4 late widening: .op/.dc/.tf run on the host NumPy Newton
    (interp_op/interp_op_core + the .tf GE branch) for the interp-eligible
    device set and agree with the compiled engine."""
    net = """op bias deck
V1 in 0 dc 5
V2 ctl 0 dc 3
R1 in out 1k
D1 out 0 DD
.model DD d(is=1e-14)
S1 out ld ctl 0 SM
.model SM sw(ron=10 roff=1e9 von=2 voff=1)
R2 ld 0 2k
G1 0 g2 out 0 1m
R3 g2 0 1k
.op
.dc V1 0 5 0.5
.tf v(out) V1
.end
"""
    ri, re_ = _run_both_ext(net, monkeypatch)
    for k, v in ri.op.node_voltages.items():
        assert v == pytest.approx(re_.op.node_voltages[k], rel=1e-9,
                                  abs=1e-12), k
    for k, v in ri.op.element_currents.items():
        assert v == pytest.approx(re_.op.element_currents[k], rel=1e-9,
                                  abs=1e-15), k
    assert ri.op.switch_states == re_.op.switch_states
    _series_close(ri.dc.node_voltages, re_.dc.node_voltages, atol=1e-12)
    _series_close(ri.dc.element_currents, re_.dc.element_currents,
                  atol=1e-15)
    np.testing.assert_array_equal(ri.dc.valid, re_.dc.valid)
    assert ri.tf.transfer_function == pytest.approx(
        re_.tf.transfer_function, rel=1e-9)
    assert ri.tf.input_impedance == pytest.approx(
        re_.tf.input_impedance, rel=1e-9)
    assert ri.tf.output_impedance == pytest.approx(
        re_.tf.output_impedance, rel=1e-9)


def test_op_interp_is_jax_free(interp_on):
    """A tiny .op/.dc/.tf deck must not initialize any jax backend
    (fresh subprocess — this suite's fixtures already initialized them)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snippet = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "from spicey_tpu import simulate\n"
        "net = ('op deck\\nV1 in 0 dc 5\\nR1 in out 1k\\nD1 out 0 DD\\n'\n"
        "       '.model DD d(is=1e-14)\\n.op\\n.dc V1 0 5 1\\n"
        ".tf v(out) V1\\n.end')\n"
        "r = simulate(net, dialect='extended')\n"
        "assert abs(r.op.node_voltages['out'] - 0.69249037522) < 1e-9\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb.backends_are_initialized(), 'backend touched'\n"
        "print('OP_JAX_FREE_OK')\n"
    )
    env = dict(os.environ, SPICEY_TPU_INTERP="1")
    env.pop("SPICEY_TPU_CPU_THRESHOLD", None)
    out = subprocess.run([sys.executable, "-c", snippet], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "OP_JAX_FREE_OK" in out.stdout, out.stderr[-2000:]


def test_op_linearized_ac_interp_matches_engine(monkeypatch):
    """linearize="op" AC on the interp tier: small-signal VCCS rows and
    diode junction capacitances ride extra_g/c-array overrides; gain and
    phase must match the compiled op-linearized sweep."""
    from spicey_tpu.analysis.ac import simulate_ac
    from spicey_tpu.parsing.netlist import parse_netlist

    net = """an nmos cs amp
V1 vdd 0 dc 5
V2 g 0 dc 2 ac 1
R1 vdd d 10k
M1 d g 0 NM w=20u l=2u
D1 d clamp DD
R2 clamp 0 100k
.model NM nmos(vto=1 kp=100u)
.model DD d(is=1e-14 cjo=2p)
.ac dec 10 1k 1e8
.end
"""
    ckt = parse_netlist(net, dialect="extended")
    monkeypatch.setenv("SPICEY_TPU_INTERP", "1")
    ri = simulate_ac(ckt, linearize="op")
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    re_ = simulate_ac(ckt, linearize="op")
    _series_close(ri.node_voltages, re_.node_voltages, rtol=1e-9,
                  atol=1e-12)
    _series_close(ri.element_currents, re_.element_currents, rtol=1e-9,
                  atol=1e-12)
    # the transistor's gm actually shapes the response (without the ss
    # rows the drain would sit at the resistive divider's flat value)
    assert np.abs(ri.node_voltages["d"][0]) > 1.0


def test_noise_interp_matches_engine(monkeypatch):
    """.noise through the interp tier (forward + adjoint host GE) against
    the compiled jitted core: spectra, gain, and per-device contributions
    must agree at rounding level."""
    from spicey_tpu.analysis.noise import simulate_noise
    from spicey_tpu.parsing.netlist import parse_netlist

    net = """a noisy divider
V1 in 0 dc 5 ac 1
R1 in a 1k
D1 a 0 DD
C1 a 0 1n
R2 a 0 10k
.model DD d(is=1e-14 kf=1e-16)
.noise v(a) V1 dec 6 10 1e6
.end
"""
    ckt = parse_netlist(net, dialect="extended")
    monkeypatch.setenv("SPICEY_TPU_INTERP", "1")
    ri = simulate_noise(ckt)
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    re_ = simulate_noise(ckt)
    np.testing.assert_allclose(ri.output_psd, re_.output_psd, rtol=1e-9)
    np.testing.assert_allclose(ri.input_psd, re_.input_psd, rtol=1e-9)
    np.testing.assert_allclose(np.abs(ri.gain), np.abs(re_.gain),
                               rtol=1e-9)
    assert ri.total_output_rms == pytest.approx(re_.total_output_rms,
                                                rel=1e-9)
    _series_close(ri.contributions, re_.contributions, rtol=1e-9)


def test_op_mosfet_falls_back_to_compiled(interp_on, monkeypatch):
    """M/Q/B decks keep the compiled Newton (pnjlim + homotopy ladder
    machinery there is the source of truth for them)."""
    net = """an nmos op deck
V1 d 0 dc 5
R1 d dd 1k
M1 dd g 0 NM w=20u l=2u
V2 g 0 dc 3
.model NM nmos(vto=1 kp=50u)
.op
.end
"""
    ri, re_ = _run_both_ext(net, monkeypatch)
    for k, v in ri.op.node_voltages.items():
        assert v == pytest.approx(re_.op.node_voltages[k], rel=1e-9), k


def test_tline_ac_and_tran_ride_interp(interp_on, interp_counter,
                                       monkeypatch):
    """T lines: the exact phasor model is linear (interp AC stamps it);
    since round 5 the transient delay-line history interprets too
    (_interp_tran_nl's circular w-buffer, VERDICT r4 #4)."""
    net = """tline deck
V1 in 0 ac 1 PULSE(0 1 0 1n 1n 50n 200n)
R1 in a 50
T1 a 0 b 0 Z0=50 TD=10n
R2 b 0 50
.ac lin 30 1e6 1e8
.tran 1n 200n
.end
"""
    ri = simulate(net, dialect="extended")
    assert interp_counter["ac"] == 1
    assert interp_counter["tran"] == 1
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    re_ = simulate(net, dialect="extended")
    _series_close(ri.ac.node_voltages, re_.ac.node_voltages, rtol=1e-12)
    _series_close(ri.ac.element_currents, re_.ac.element_currents,
                  rtol=1e-12)
    _series_close(ri.tran.node_voltages, re_.tran.node_voltages, rtol=1e-9)


def test_nonlinear_extended_tran_and_ac_ride_interp(interp_on,
                                                    interp_counter,
                                                    monkeypatch):
    """MOSFET decks: default-mode AC ignores nonlinear devices (the
    interp tier always took it); since round 5 the Newton-to-convergence
    transient interprets too (VERDICT r4 #4)."""
    net = """an nmos deck
V1 d 0 dc 5 ac 1
R1 d dd 1k
M1 dd g 0 NM w=20u l=2u
V2 g 0 dc 3 PULSE(0 3 0 1u 1u 40u 100u)
.model NM nmos(vto=1 kp=50u)
.ac dec 10 10 1e5
.tran 2u 200u
.end
"""
    ri = simulate(net, dialect="extended")
    assert interp_counter["ac"] == 1
    assert interp_counter["tran"] == 1
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    re_ = simulate(net, dialect="extended")
    _series_close(ri.ac.node_voltages, re_.ac.node_voltages, rtol=1e-12)
    _series_close(ri.tran.node_voltages, re_.tran.node_voltages, rtol=1e-9)


def test_non_default_tran_modes_fall_back(interp_on, interp_counter):
    ckt = parse_netlist(netlists.RC_PULSE)
    simulate_tran(ckt, integration="trap")
    simulate_tran(ckt, return_state=True)
    simulate_tran(ckt, method="lax")  # explicit solver-tier request
    assert interp_counter["tran"] == 0
    # converged-mode Newton interprets since round 5 (_interp_tran_nl)
    simulate_tran(ckt, nr="converged")
    assert interp_counter["tran"] == 1
    simulate_tran(ckt)
    assert interp_counter["tran"] == 2


def test_diode_charge_model_rides_interp(interp_on, interp_counter,
                                         monkeypatch):
    """Extended model params on reference element TYPES: diode TT/CJO
    adds a charge companion — round 4 had to disqualify these decks
    (0.53 V silent divergence without the gate); round 5 interprets the
    charge companion itself and must match the compiled engine."""
    net = """charge-storage diode deck
V1 a 0 PULSE(0 5 0 1u 1u 40u 100u)
R1 a b 1k
D1 b 0 DX
.model DX d(is=1e-14 tt=100n cjo=10p)
.tran 1u 100u
.end
"""
    ri = simulate(net, dialect="extended")
    assert interp_counter["tran"] == 1
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    re_ = simulate(net, dialect="extended")
    _series_close(ri.tran.node_voltages, re_.tran.node_voltages, rtol=1e-9)


def test_large_work_falls_back(interp_on, interp_counter, monkeypatch):
    monkeypatch.setenv("SPICEY_TPU_CPU_THRESHOLD", "0")
    simulate(netlists.BASICS01_AC)
    assert interp_counter["ac"] == 0


def test_singular_raises_like_engine(interp_on):
    # two voltage sources forcing the same node pair disagree => the
    # branch rows are linearly dependent => reference-singular
    net = """degenerate deck
V1 a 0 1
V2 a 0 2
R1 a 0 1k
.ac dec 10 1 1e3
.end
"""
    with pytest.raises(ValueError, match="Singular"):
        simulate(net)


def test_interp_probe_filter_and_casing(monkeypatch):
    ri, re_ = _run_both(netlists.CASE_INSENSITIVE, monkeypatch)
    assert list(ri.tran.node_voltages) == list(re_.tran.node_voltages)


def test_interp_route_never_initializes_jax_backends():
    """The whole point of the tier: an interactive reference-dialect call
    must not trigger jax backend initialization (on remote-relay setups
    the client-creation handshake costs 0.1 s-minutes). Checked in a
    fresh subprocess because this suite's fixtures initialize backends."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snippet = (
        f"import sys; sys.path.insert(0, {repo!r});"
        f"sys.path.insert(1, {os.path.join(repo, 'tests')!r})\n"
        "from spicey_tpu import simulate, format_ac_result\n"
        "from fixtures import netlists\n"
        "simulate(netlists.BASICS01_AC)\n"
        "simulate(netlists.RC_PULSE)\n"
        "simulate(netlists.BOOST_CONVERTER)\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb.backends_are_initialized(), 'backend touched'\n"
        "print('JAX_FREE_OK')\n"
    )
    env = dict(os.environ, SPICEY_TPU_INTERP="1")
    out = subprocess.run([sys.executable, "-c", snippet], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "JAX_FREE_OK" in out.stdout, out.stderr[-2000:]


# ---------------------------------------------------------------------------
# Round 5: the whole nonlinear extended dialect interprets (VERDICT r4 #4)
# ---------------------------------------------------------------------------

_NL_DECKS = {
    "mosfet_ring": """t
.model mn nmos(vto=1 kp=2m)
.model mp pmos(vto=-1 kp=2m)
vdd vdd 0 5
mn1 n1 n3 0 mn
mp1 n1 n3 vdd mp
c1 n1 0 1n
mn2 n2 n1 0 mn
mp2 n2 n1 vdd mp
c2 n2 0 1n
mn3 n3 n2 0 mn
mp3 n3 n2 vdd mp
c3 n3 0 1n
ikick 0 n1 PULSE(0 2m 0 1n 1n 3u 1)
.tran 0.2u 30u
""",
    "bjt_amp": """t
.model qn npn(is=1e-16 bf=100)
vcc vcc 0 5
vin bs 0 SIN(0.7 0.005 100k)
rc vcc c 1k
q1 c bs 0 qn
.tran 0.2u 20u
""",
    "bsource_tanh": """t
vin in 0 PULSE(0 2 0 1u 1u 40u 100u)
r1 in 0 1k
bq out 0 I=1m*tanh(3*v(in))
rload out 0 2k
cload out 0 1n
.tran 1u 100u
""",
    "bsource_vkind_time": """t
vin in 0 SIN(0 1 20k)
r1 in 0 1k
bv out 0 V=0.5*v(in)**2 + 0.1*sin(6.28e4*time)
rload out 0 1k
.tran 1u 100u
""",
    "diode_charge": """t
.model dj d(is=1e-14 tt=5n cjo=2p vj=0.7 m=0.5)
vin in 0 SIN(0 2 50k)
rs in a 100
d1 a 0 dj
.tran 0.2u 40u
""",
    "bjt_charge": """t
.model qc npn(is=1e-15 bf=80 tf=1n cje=2p cjc=1p)
vcc vcc 0 5
vb bs 0 PULSE(0 0.8 1u 0.1u 0.1u 10u 40u)
rb bs b 1k
rc vcc c 2k
q1 c b 0 qc
.tran 0.2u 30u
""",
    "tline_pulse": """t
vin in 0 PULSE(0 1 0 1n 1n 100n 1u)
rs in a 50
t1 a 0 b 0 z0=50 td=20n
rl b 0 100
.tran 1n 500n
""",
    "mixed_switch_diode_mos": """t
.model sw vswitch(ron=1 roff=1e9 von=0.5 voff=0.2)
.model dd d(is=1e-14)
.model mn nmos(vto=1 kp=2m)
vdd vdd 0 5
vctl ct 0 PULSE(0 1 2u 0.1u 0.1u 10u 20u)
s1 vdd a ct 0 sw
d1 a b dd
rb b 0 500
m1 o ct 0 mn
ro vdd o 2k
co o 0 1n
.tran 0.5u 40u
""",
}


@pytest.mark.parametrize("name", sorted(_NL_DECKS))
def test_nonlinear_tran_interp_matches_engine(name, interp_on,
                                              interp_counter, monkeypatch):
    """Interp-vs-compiled equivalence at 1e-9 across the nonlinear
    extended dialect (MOSFET/BJT Newton-to-convergence, behavioral
    sources with dual-number partials, diode/BJT junction charge,
    T-line history) — VERDICT r4 #4's Done bar."""
    import jax

    net = _NL_DECKS[name]
    r_i = simulate_tran(parse_netlist(net, dialect="extended"))
    assert interp_counter["tran"] == 1, "interp tier was not selected"
    monkeypatch.setenv("SPICEY_TPU_INTERP", "0")
    with jax.default_device(jax.devices("cpu")[0]):
        r_c = simulate_tran(parse_netlist(net, dialect="extended"))
    _series_close(r_i.node_voltages, r_c.node_voltages, rtol=1e-9)
    _series_close(r_i.element_currents, r_c.element_currents, rtol=1e-9)


def test_nonlinear_tran_interp_is_jax_free(interp_on):
    """A MOSFET ring deck through simulate() must not initialize any jax
    backend (the whole point of interpreting the nonlinear dialect:
    interactive answers without the accelerator handshake)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deck = _NL_DECKS["mosfet_ring"].replace("\n", "\\n")
    snippet = (
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "from spicey_tpu import simulate\n"
        f"net = '{deck}'\n"
        "r = simulate(net, dialect='extended')\n"
        "assert r.tran is not None and len(r.tran.times) == 151\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb.backends_are_initialized(), 'backend touched'\n"
        "print('NL_JAX_FREE_OK')\n"
    )
    env = dict(os.environ, SPICEY_TPU_INTERP="1")
    env.pop("SPICEY_TPU_CPU_THRESHOLD", None)
    out = subprocess.run([sys.executable, "-c", snippet], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "NL_JAX_FREE_OK" in out.stdout, out.stderr[-2000:]


def test_dual_numbers_match_finite_differences():
    """The _Dual forward-mode partials agree with central differences on
    a gnarly composite expression (exactness backstop for the
    behavioral-source Newton)."""
    from spicey_tpu.analysis.interp import _Dual, _DualVals
    from spicey_tpu.parsing.bexpr import compile_bexpr

    expr = ("2*tanh(3*v(a)) + exp(0.5*v(b)) / (1 + v(a)**2)"
            " + max(v(a), v(b)) + sqrt(abs(v(b)) + 2)")
    refs, fn = compile_bexpr(expr, backend="np")
    assert len(refs) == 2
    vals = np.array([0.37, -1.21])
    eye = np.eye(2)
    res = fn(_DualVals([_Dual(vals[j], eye[j]) for j in range(2)]), 0.0)
    h = 1e-6
    for j in range(2):
        vp, vm = vals.copy(), vals.copy()
        vp[j] += h
        vm[j] -= h
        fd = (fn(vp, 0.0) - fn(vm, 0.0)) / (2 * h)
        assert res.d[j] == pytest.approx(fd, rel=1e-8, abs=1e-10)


@pytest.fixture
def native_reset():
    """Reset the native loader's memoized state around env flips."""
    import spicey_tpu.native as nat

    yield nat
    nat._lib_tried = False
    nat._lib = None


def test_native_loop_matches_numpy_loop(interp_on, monkeypatch,
                                        native_reset):
    """The C transient loop (spicey_tpu/native/interp_core.c) must match
    the NumPy loop it accelerates at 1e-9 on every nonlinear device
    class (the NumPy loop is the semantic reference)."""
    nat = native_reset
    if not nat.native_available():
        pytest.skip("no C compiler in this environment")
    for name in ("mosfet_ring", "bjt_charge", "diode_charge",
                 "tline_pulse", "mixed_switch_diode_mos"):
        net = _NL_DECKS[name]
        nat._lib_tried = False
        nat._lib = None
        monkeypatch.setenv("SPICEY_TPU_NATIVE", "1")
        r_c = simulate_tran(parse_netlist(net, dialect="extended"))
        monkeypatch.setenv("SPICEY_TPU_NATIVE", "0")
        nat._lib_tried = False
        nat._lib = None
        r_p = simulate_tran(parse_netlist(net, dialect="extended"))
        _series_close(r_c.node_voltages, r_p.node_voltages, rtol=1e-9)
        _series_close(r_c.element_currents, r_p.element_currents,
                      rtol=1e-9)


def test_native_disabled_falls_back_cleanly(interp_on, monkeypatch,
                                            native_reset):
    """SPICEY_TPU_NATIVE=0 must keep everything working on the NumPy
    loop (environments without a C compiler see exactly this path)."""
    nat = native_reset
    monkeypatch.setenv("SPICEY_TPU_NATIVE", "0")
    nat._lib_tried = False
    nat._lib = None
    r = simulate_tran(parse_netlist(_NL_DECKS["bjt_amp"],
                                    dialect="extended"))
    assert r is not None and np.isfinite(r.node_voltages["c"]).all()
