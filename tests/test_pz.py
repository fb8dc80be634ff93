"""Extended-dialect .pz pole-zero analysis.

The reference has no pole-zero analysis (`.pz` lines land in `skipped`,
/root/reference/lib/parsing/parseNetlist.ts:444-446). Expectations are
closed-form transfer functions of textbook RC/RLC/amplifier networks.
"""

import numpy as np
import pytest

from spicey_tpu import format_pz_result, parse_netlist, simulate


def test_pz_skipped_in_spicey_dialect():
    ckt = parse_netlist("t\nv1 in 0 ac 1\nr1 in 0 1k\n"
                        ".pz in 0 in 0 vol pz\n")
    assert ckt.pz is None
    assert any(".pz" in s for s in ckt.skipped)


def test_pz_malformed_raises():
    with pytest.raises(ValueError, match="cur.*vol"):
        parse_netlist("t\n.pz a 0 b 0 amp pol\n", dialect="extended")
    with pytest.raises(ValueError, match="pol.*zer"):
        parse_netlist("t\n.pz a 0 b 0 vol all\n", dialect="extended")
    with pytest.raises(ValueError, match=".pz needs"):
        parse_netlist("t\n.pz a 0 b 0\n", dialect="extended")


def test_rc_lowpass_pole():
    """H(s) = 1/(1+sRC): one pole at -1/(RC), no finite zeros."""
    r = simulate("""the rc lowpass
v1 in 0 dc 0 ac 1
r1 in out 10k
c1 out 0 10n
.pz in 0 out 0 vol pz
""", dialect="extended")
    np.testing.assert_allclose(r.pz.poles, [-1e4], rtol=1e-9)
    assert r.pz.zeros.size == 0
    assert "poles (1):" in format_pz_result(r.pz)


def test_rc_highpass_zero_at_origin():
    """H(s) = sRC/(1+sRC): zero at s=0, pole at -1/(RC)."""
    r = simulate("""the rc highpass
v1 in 0 dc 0 ac 1
c1 in out 10n
r1 out 0 10k
.pz in 0 out 0 vol pz
""", dialect="extended")
    np.testing.assert_allclose(r.pz.poles, [-1e4], rtol=1e-9)
    np.testing.assert_allclose(r.pz.zeros, [0.0], atol=1e-3)


def test_series_rlc_overdamped_real_poles():
    R, L, C = 100.0, 1e-3, 1e-6
    r = simulate(f"""the rlc overdamped
v1 in 0 dc 0 ac 1
r1 in a {R}
l1 a out {L}
c1 out 0 {C}
.pz in 0 out 0 vol pol
""", dialect="extended")
    a = R / (2 * L)
    d = np.sqrt(a * a - 1.0 / (L * C))
    np.testing.assert_allclose(sorted(r.pz.poles.real),
                               sorted([-a + d, -a - d]), rtol=1e-9)
    np.testing.assert_allclose(r.pz.poles.imag, 0.0, atol=1e-6)


def test_series_rlc_underdamped_conjugate_pair():
    R, L, C = 10.0, 1e-3, 1e-6
    r = simulate(f"""the rlc underdamped
v1 in 0 dc 0 ac 1
r1 in a {R}
l1 a out {L}
c1 out 0 {C}
.pz in 0 out 0 vol pol
""", dialect="extended")
    a = R / (2 * L)
    w = np.sqrt(1.0 / (L * C) - a * a)
    p = sorted(r.pz.poles, key=lambda s: s.imag)
    np.testing.assert_allclose(p, [-a - 1j * w, -a + 1j * w], rtol=1e-9)
    # Hz view
    np.testing.assert_allclose(np.abs(r.pz.poles_hz),
                               np.abs(r.pz.poles) / (2 * np.pi), rtol=1e-12)


def test_cur_transimpedance_pole():
    """Parallel RC driven by a current: Z(s) = R/(1+sRC)."""
    r = simulate("""the parallel rc
i1 0 out dc 0
r1 out 0 10k
c1 out 0 10n
.pz out 0 out 0 cur pol
""", dialect="extended")
    np.testing.assert_allclose(r.pz.poles, [-1e4], rtol=1e-9)


def test_two_stage_rc_two_poles():
    """Two isolated RC stages (unity-gain E buffer between): poles at
    -1/(R1C1) and -1/(R2C2) exactly."""
    r = simulate("""the two stage
v1 in 0 dc 0 ac 1
r1 in a 10k
c1 a 0 10n
e1 b 0 a 0 1
r2 b out 1k
c2 out 0 1u
.pz in 0 out 0 vol pol
""", dialect="extended")
    np.testing.assert_allclose(sorted(r.pz.poles.real),
                               sorted([-1e4, -1e3]), rtol=1e-9)


def test_coupled_inductor_pencil():
    """Series-aiding coupled inductors: L_eff = L1 + L2 + 2M; the RL
    divider's pole sits at -R/L_eff (K rows land in the C pencil)."""
    L1, L2, k, R = 1e-3, 4e-3, 0.5, 100.0
    m = k * np.sqrt(L1 * L2)
    r = simulate(f"""the coupled rl
v1 in 0 dc 0 ac 1
r1 in a {R}
l1 a b {L1}
l2 b 0 {L2}
k1 l1 l2 {k}
.pz in 0 a 0 vol pol
""", dialect="extended")
    np.testing.assert_allclose(r.pz.poles, [-R / (L1 + L2 + 2 * m)],
                               rtol=1e-9)


def test_mosfet_cs_amplifier_pole():
    """Common-source stage with output cap: pole at -1/(Rd*CL) (lambda=0
    makes ro infinite); the MOS linearization feeds the pencil."""
    r = simulate("""the cs amp
.model mn nmos(vto=1 kp=2m)
vdd vdd 0 5
vg g 0 dc 2 ac 1
rd vdd d 1k
m1 d g 0 mn
cl d 0 1n
.pz g 0 d 0 vol pol
""", dialect="extended")
    np.testing.assert_allclose(r.pz.poles, [-1.0 / (1e3 * 1e-9)], rtol=1e-6)


def test_miller_zero_right_half_plane():
    """CS stage with ONLY a gate-drain cap: the classic RHP zero at
    +gm/Cgd and pole at -1/(Rd*Cgd*(1+gm*Rin/ ...)) — with an ideal gate
    drive the pole is -1/(Rd*Cgd) ... the zero location is exact:
    z = +gm/Cgd where gm = kp*(vgs-vto)."""
    gm = 2e-3 * 1.0
    cgd = 1e-12
    r = simulate("""the miller stage
.model mn nmos(vto=1 kp=2m)
vdd vdd 0 5
vg g 0 dc 2 ac 1
rd vdd d 1k
m1 d g 0 mn
cgd g d 1p
.pz g 0 d 0 vol pz
""", dialect="extended")
    np.testing.assert_allclose(r.pz.zeros, [gm / cgd], rtol=1e-6)
    assert r.pz.poles.size == 1 and r.pz.poles[0].real < 0


def test_pz_which_modes():
    net = """the rc lowpass
v1 in 0 dc 0 ac 1
r1 in out 10k
c1 out 0 10n
.pz in 0 out 0 vol {mode}
"""
    rp = simulate(net.format(mode="pol"), dialect="extended")
    assert rp.pz.poles.size == 1 and rp.pz.zeros.size == 0
    rz = simulate(net.format(mode="zer"), dialect="extended")
    assert rz.pz.poles.size == 0
    txt = format_pz_result(rz.pz)
    assert "zeros" in txt and "poles" not in txt
