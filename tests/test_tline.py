"""Extended-dialect T (lossless transmission line) elements.

The reference has no transmission lines (`T` lines land in `skipped`).
Implementation is Branin's method of characteristics: two MNA branch
unknowns per line (the port currents), a circular history buffer carried
through the transient ``lax.scan``, the exact ``-e^{-j w Td}`` phasor
coupling in AC, and the theta->0 differential short at DC. Expectations
are textbook: matched-line delay, open/short reflections, quarter-wave
impedance transformation.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate

MATCHED = """the matched line
v1 in 0 PULSE(0 1 0 1n 1n 50n 200n)
rs in a 50
t1 a 0 b 0 z0=50 td=5n
rl b 0 50
.tran 0.5n 40n
"""


def _at(res, node, t_probe):
    t = np.asarray(res.tran.times)
    return np.asarray(res.tran.node_voltages[node])[np.argmin(np.abs(t - t_probe))]


# --- parsing ---

def test_parse_tline_forms():
    ckt = parse_netlist(
        "x\nt1 a 0 b 0 z0=75 td=10n\nt2 a 0 b 0 z0=50 f=100meg\n"
        "t3 a 0 b 0 z0=50 f=100meg nl=0.5\nrl b 0 50\nv1 a 0 1\n",
        dialect="extended")
    assert len(ckt.T) == 3
    assert ckt.T[0].z0 == 75.0 and ckt.T[0].td == 10e-9
    assert ckt.T[1].td == pytest.approx(0.25 / 100e6)   # NL defaults 0.25
    assert ckt.T[2].td == pytest.approx(0.5 / 100e6)
    # two branch unknowns per line after the V branches
    assert ckt.n_vars == 2 + 1 + 6


def test_parse_tline_errors():
    with pytest.raises(ValueError, match="Z0"):
        parse_netlist("x\nt1 a 0 b 0 td=1n\n", dialect="extended")
    with pytest.raises(ValueError, match="TD= or F="):
        parse_netlist("x\nt1 a 0 b 0 z0=50\n", dialect="extended")


def test_tline_skipped_in_spicey_dialect():
    ckt = parse_netlist("x\nt1 a 0 b 0 z0=50 td=1n\nr1 a 0 50\n")
    assert not ckt.T
    assert any(s.startswith("t1") for s in ckt.skipped)


# --- transient: delay and reflections ---

def test_matched_line_pure_delay():
    """Matched source and load: v(a) = vin/2 immediately, v(b) the same
    delayed by Td, and NO reflections ever."""
    res = simulate(MATCHED, dialect="extended")
    assert _at(res, "a", 3e-9) == pytest.approx(0.5, abs=1e-9)
    assert _at(res, "b", 3e-9) == pytest.approx(0.0, abs=1e-12)
    assert _at(res, "b", 8e-9) == pytest.approx(0.5, abs=1e-9)
    # no reflection returns to the source side at 2*Td
    assert _at(res, "a", 15e-9) == pytest.approx(0.5, abs=1e-9)
    assert _at(res, "a", 35e-9) == pytest.approx(0.5, abs=1e-9)


def test_matched_line_port_currents():
    res = simulate(MATCHED, dialect="extended")
    t = np.asarray(res.tran.times)
    i1 = np.asarray(res.tran.element_currents["t1"])
    i2 = np.asarray(res.tran.element_currents["t1#p2"])
    k = np.argmin(np.abs(t - 15e-9))
    assert i1[k] == pytest.approx(0.01, rel=1e-9)    # 0.5 V / 50 ohm in
    assert i2[k] == pytest.approx(-0.01, rel=1e-9)   # out of port 2


def test_open_line_doubling_reflection():
    """Open far end: voltage doubles at the load after Td; the reflection
    is absorbed at the matched source at 2*Td (v(a): 0.5 -> 1.0)."""
    res = simulate(MATCHED.replace("rl b 0 50", "rl b 0 50meg"),
                   dialect="extended")
    assert _at(res, "b", 3e-9) == pytest.approx(0.0, abs=1e-12)
    assert _at(res, "b", 7e-9) == pytest.approx(1.0, rel=1e-6)
    assert _at(res, "a", 8e-9) == pytest.approx(0.5, abs=1e-6)
    assert _at(res, "a", 15e-9) == pytest.approx(1.0, rel=1e-6)


def test_shorted_line_inverting_reflection():
    """Shorted far end (tiny RL): the -1 reflection cancels the incident
    wave at the source at 2*Td (v(a): 0.5 -> 0)."""
    res = simulate(MATCHED.replace("rl b 0 50", "rl b 0 1u"),
                   dialect="extended")
    assert _at(res, "a", 8e-9) == pytest.approx(0.5, abs=1e-6)
    assert _at(res, "a", 15e-9) == pytest.approx(0.0, abs=1e-6)


def test_mismatched_load_partial_reflection():
    """RL = 150 with Z0 = 50: reflection coefficient 0.5 -> v(b) steps to
    0.75 at Td, v(a) to 0.75 at 2*Td (matched source absorbs)."""
    res = simulate(MATCHED.replace("rl b 0 50", "rl b 0 150"),
                   dialect="extended")
    assert _at(res, "b", 8e-9) == pytest.approx(0.75, rel=1e-6)
    assert _at(res, "a", 15e-9) == pytest.approx(0.75, rel=1e-6)


# --- AC: exact phasor model ---

def test_quarter_wave_transformer():
    """Quarter-wave line (f0 = 1/(4 Td)): Zin = Z0^2/RL transforms 50 ohm
    to 200 ohm — matched to the 200 ohm source, so |v(a)| = 0.5 and the
    load gets all the power: |v(b)| = sqrt(50 * |va|^2/200) = 0.25."""
    res = simulate("""the quarter wave
v1 in 0 dc 0 ac 1
rs in a 200
t1 a 0 b 0 z0=100 td=2.5n
rl b 0 50
.ac lin 2 100meg 100meg
""", dialect="extended")
    np.testing.assert_allclose(np.abs(res.ac.node_voltages["a"]), 0.5,
                               rtol=1e-9)
    np.testing.assert_allclose(np.abs(res.ac.node_voltages["b"]), 0.25,
                               rtol=1e-9)


def test_half_wave_line_transparent():
    """Half-wave line (f = 1/(2 Td)): Zin = ZL regardless of Z0 — the
    divider sees the bare 50 ohm load: v(a) = 50/250."""
    res = simulate("""the half wave
v1 in 0 dc 0 ac 1
rs in a 200
t1 a 0 b 0 z0=100 td=5n
rl b 0 50
.ac lin 2 100meg 100meg
""", dialect="extended")
    np.testing.assert_allclose(np.abs(res.ac.node_voltages["a"]), 0.2,
                               rtol=1e-9)
    # half wavelength = 180 degrees: v(b) = -v(a)
    np.testing.assert_allclose(res.ac.node_voltages["b"],
                               -res.ac.node_voltages["a"], rtol=1e-9)


def test_matched_line_ac_delay_phase():
    """Matched line: |v(b)/v(a)| = 1 at every frequency, phase = -w*Td."""
    res = simulate("""the matched ac
v1 in 0 dc 0 ac 1
rs in a 50
t1 a 0 b 0 z0=50 td=5n
rl b 0 50
.ac lin 5 10meg 90meg
""", dialect="extended")
    h = res.ac.node_voltages["b"] / res.ac.node_voltages["a"]
    np.testing.assert_allclose(np.abs(h), 1.0, rtol=1e-9)
    expect_phase = -2 * np.pi * res.ac.freqs * 5e-9
    np.testing.assert_allclose(np.angle(h),
                               np.angle(np.exp(1j * expect_phase)),
                               atol=1e-9)


# --- DC / sens / pz interactions ---

def test_dc_op_differential_short():
    res = simulate("""the dc line
v1 in 0 dc 5
rs in a 200
t1 a 0 b 0 z0=100 td=2.5n
rl b 0 50
.op
""", dialect="extended")
    assert res.op.node_voltages["a"] == pytest.approx(1.0, abs=1e-9)
    assert res.op.node_voltages["b"] == pytest.approx(1.0, abs=1e-9)
    assert res.op.element_currents["t1"] == pytest.approx(0.02, rel=1e-9)
    assert res.op.element_currents["t1#p2"] == pytest.approx(-0.02,
                                                             rel=1e-9)


def test_sens_through_dc_line():
    """The .sens adjoint sees the line's DC short: the divider
    sensitivities are those of rs in series with rl."""
    res = simulate("""the line sens
v1 in 0 dc 5
rs in a 200
t1 a 0 b 0 z0=100 td=2.5n
rl b 0 50
.sens v(b)
""", dialect="extended")
    # v(b) = V*rl/(rs+rl) -> dv/dV = 0.2
    assert res.sens.values["v1"] == pytest.approx(50.0 / 250.0, rel=1e-9)


def test_pz_rejects_tlines():
    with pytest.raises(ValueError, match="transmission lines"):
        simulate("""the line pz
v1 in 0 dc 0 ac 1
t1 in 0 b 0 z0=50 td=1n
rl b 0 50
.pz in 0 b 0 vol pol
""", dialect="extended")


def test_adaptive_supports_tlines():
    """Round 3: adaptive tran grew a time-stamped delay-line history
    (adaptive.py tl_read/tl_write) — full trajectory parity is covered in
    tests/test_feature_interactions.py; here just the smoke contract."""
    from spicey_tpu import simulate_tran_adaptive

    ckt = parse_netlist(MATCHED, dialect="extended")
    res = simulate_tran_adaptive(ckt)
    assert res is not None and not res.exhausted


# --- batch ---

def test_tline_batch_load_sweep():
    """Sweep the load across variants: steady-state v(b) follows the
    divider rl/(rs+rl) per lane (DC short at late time)."""
    from spicey_tpu import simulate_tran_batch

    B = 4
    rl = np.asarray([25.0, 50.0, 100.0, 150.0])
    ckt = parse_netlist(MATCHED, dialect="extended")
    res = simulate_tran_batch(ckt, {"rl": rl})
    vb_late = res.node_voltage("b")[:, -1]
    np.testing.assert_allclose(vb_late, rl / (50.0 + rl), rtol=1e-6)
    assert res.valid.all()


def test_tline_in_subcircuit():
    res = simulate("""the sub line
.subckt piece p1 p2
t1 p1 0 p2 0 z0=50 td=5n
.ends
v1 in 0 PULSE(0 1 0 1n 1n 50n 200n)
rs in a 50
x1 a b piece
rl b 0 50
.tran 0.5n 20n
""", dialect="extended")
    t = np.asarray(res.tran.times)
    vb = np.asarray(res.tran.node_voltages["b"])
    assert vb[np.argmin(np.abs(t - 3e-9))] == pytest.approx(0.0, abs=1e-12)
    assert vb[np.argmin(np.abs(t - 8e-9))] == pytest.approx(0.5, abs=1e-9)


# --- URC distributed RC lines (lowered to R/C ladders) ---

def test_urc_expands_to_ladder():
    ckt = parse_netlist("""x
.model um urc(k=1.5 rperl=10k cperl=1n)
v1 in 0 dc 1
u1 in out 0 um l=1 n=5
rl out 0 1meg
""", dialect="extended")
    rs = [r for r in ckt.R if r.name.startswith("u1#r")]
    cs = [c for c in ckt.C if c.name.startswith("u1#c")]
    assert len(rs) == 5 and len(cs) == 6
    assert sum(r.R for r in rs) == pytest.approx(10e3, rel=1e-12)
    assert sum(c.C for c in cs) == pytest.approx(1e-9, rel=1e-12)
    # geometric toward the middle: middle lump longest
    vals = [r.R for r in rs]
    assert vals[2] > vals[0] and vals[2] > vals[4]
    assert vals[0] == pytest.approx(vals[4], rel=1e-12)


def test_urc_step_response_elmore():
    """Distributed RC step response: t50 ~ 0.38*R*C (Elmore/diffusion),
    settling to the full input level."""
    r = simulate("""x
.model um urc(k=1.5 rperl=10k cperl=1n)
v1 in 0 PULSE(0 1 0 1n 1n 1m 2m)
u1 in out 0 um l=1 n=20
.tran 0.2u 60u
""", dialect="extended")
    t = np.asarray(r.tran.times)
    vo = np.asarray(r.tran.node_voltages["out"])
    t50 = t[np.argmax(vo > 0.5)]
    assert t50 == pytest.approx(0.38 * 10e3 * 1e-9, rel=0.15)
    assert vo[-1] == pytest.approx(1.0, abs=1e-4)


def test_urc_errors():
    with pytest.raises(ValueError, match="isperl"):
        parse_netlist("x\n.model um urc(isperl=1e-12)\n",
                      dialect="extended")
    with pytest.raises(ValueError, match="Unknown .model"):
        parse_netlist("x\nv1 a 0 1\nu1 a b 0 nope l=1\nrl b 0 1k\n",
                      dialect="extended")


def test_urc_auto_lump_count_from_fmax():
    ckt = parse_netlist("""x
.model um urc(k=2 rperl=1k cperl=1p fmax=1g)
v1 a 0 1
u1 a b 0 um l=0.01
rl b 0 1k
""", dialect="extended")
    n = sum(1 for r in ckt.R if r.name.startswith("u1#r"))
    assert n >= 3
