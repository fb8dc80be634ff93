"""Fused assemble+solve MC AC kernel (ops/pallas_mc_ac.py).

The fused tier builds the MNA planes in VMEM inside the Pallas kernel
from the static stamp pattern + per-variant values; these tests pin it
against the f64 plane-GJ engine and the batch-last scatter tier
(interpret mode — the Mosaic path is exercised on hardware by bench.py).
"""

import numpy as np
import pytest

import spicey_tpu.ops.pallas_mc_ac as fused_mod
from spicey_tpu import parse_netlist
from spicey_tpu.analysis.mc import mc_ac_sampled, mc_ac_stats
from tests.fixtures import netlists

RC_NET = ("fused tier rc\nv1 1 0 dc 0 ac 1\nr1 1 2 30\nc1 2 0 100u\n"
          ".ac dec 6 1 100\n.end\n")

EXT_NET = """an extended fused-tier deck
I1 0 a 1m ac 2 30
R1 a 0 1k
G1 0 b a 0 2m
R2 b 0 500
E1 c 0 b 0 3
R3 c d 100
C1 d 0 1u
V1 e 0 ac 1
R4 e d 200
F1 0 b V1 0.5
H1 f 0 V1 50
R5 f d 300
L1 d 0 10m
.ac dec 4 10 1e5
.end
"""


def _overrides(B, rng):
    return {"r1": 30.0 * (1 + 0.2 * rng.random(B)),
            "c1": 100e-6 * (1 + 0.2 * rng.random(B))}


def _stats_close(a, b, rtol):
    for f in ("mean", "std", "min", "max"):
        x, y = getattr(a, f), getattr(b, f)
        np.testing.assert_allclose(x, y, rtol=rtol,
                                   atol=rtol * float(np.max(np.abs(y))),
                                   err_msg=f)
    assert a.n_valid == b.n_valid


def test_fused_matches_f64_reference_deck():
    rng = np.random.default_rng(0)
    ckt = parse_netlist(RC_NET)
    ov = _overrides(48, rng)
    ref = mc_ac_stats(ckt, ov, node="2", method="gj", precision="f64")
    fus = mc_ac_stats(ckt, ov, node="2", method="pallas",
                      precision="f32", interpret=True)
    _stats_close(fus, ref, rtol=2e-5)


def test_fused_matches_batchlast_tier(monkeypatch):
    rng = np.random.default_rng(1)
    ckt = parse_netlist(RC_NET)
    ov = _overrides(32, rng)
    fus = mc_ac_stats(ckt, ov, node="2", method="pallas",
                      precision="f32", interpret=True)
    # _FUSED_MAX_N = 0 makes every circuit ineligible -> batch-last tier
    monkeypatch.setattr(fused_mod, "_FUSED_MAX_N", 0)
    bl = mc_ac_stats(ckt, ov, node="2", method="pallas",
                     precision="f32", interpret=True)
    # same f32 elimination, different assembly summation order
    _stats_close(fus, bl, rtol=1e-5)


@pytest.mark.slow
def test_fused_extended_sources():
    rng = np.random.default_rng(2)
    B = 24
    ckt = parse_netlist(EXT_NET, dialect="extended")
    ov = {"R1": 1e3 * (1 + 0.1 * rng.random(B)),
          "G1": 2e-3 * (1 + 0.1 * rng.random(B)),
          "E1": 3.0 * (1 + 0.05 * rng.random(B)),
          "L1": 10e-3 * (1 + 0.1 * rng.random(B))}
    ref = mc_ac_stats(ckt, ov, node="d", method="gj", precision="f64",
                      dialect="extended")
    fus = mc_ac_stats(ckt, ov, node="d", method="pallas",
                      precision="f32", interpret=True,
                      dialect="extended")
    _stats_close(fus, ref, rtol=2e-5)


def test_fused_chunked_matches_unchunked():
    rng = np.random.default_rng(3)
    ckt = parse_netlist(RC_NET)
    ov = _overrides(48, rng)
    a = mc_ac_stats(ckt, ov, node="2", method="pallas",
                    precision="f32", interpret=True)
    b = mc_ac_stats(ckt, ov, node="2", method="pallas",
                    precision="f32", interpret=True, chunk=16)
    _stats_close(b, a, rtol=1e-6)


def test_fused_singular_lane_flagged():
    # node 3 hangs off c2 alone: a zero-valued c2 lane zeroes its whole
    # MNA row/column -> reference-singular (|pivot| < EPS)
    net = ("fused singular deck\nv1 1 0 dc 0 ac 1\nr1 1 2 30\n"
           "c1 2 0 100u\nc2 3 0 1u\n.ac dec 4 1 100\n.end\n")
    rng = np.random.default_rng(4)
    B = 8
    ov = {"c2": 1e-6 * (1 + 0.1 * rng.random(B))}
    ov["c2"][3] = 0.0
    ckt = parse_netlist(net)
    fus = mc_ac_stats(ckt, ov, node="2", method="pallas",
                      precision="f32", interpret=True)
    assert fus.n_valid == B - 1


def test_fused_sampled_padding_path():
    # B deliberately NOT a multiple of the kernel's lane tile
    ckt = parse_netlist(RC_NET)
    fus = mc_ac_sampled(ckt, {"r1": 0.1, "c1": 0.1}, B=37, node="2",
                        method="pallas", precision="f32", key=7,
                        interpret=True)
    ref = mc_ac_sampled(ckt, {"r1": 0.1, "c1": 0.1}, B=37, node="2",
                        method="gj", precision="f64", key=7)
    assert fus.n_valid == ref.n_valid == 37
    np.testing.assert_allclose(fus.mean, ref.mean, rtol=5e-4)


def test_ac_fused_sharded_over_cpu_mesh(monkeypatch):
    """A 1D batch mesh runs the fused assemble+solve AC kernel under
    shard_map; stats must match the single-device fused run."""
    import jax

    from spicey_tpu.parallel.mesh import make_mesh, sharder

    calls = {"n": 0}
    real = fused_mod.mc_ac_fused_f32

    def count(*a, **k):
        calls["n"] += 1  # trace-time count: proves tier selection
        return real(*a, **k)

    monkeypatch.setattr(fused_mod, "mc_ac_fused_f32", count)
    mesh = make_mesh({"batch": 8}, devices=jax.devices("cpu"))
    rng = np.random.default_rng(12)
    ckt = parse_netlist(RC_NET)
    # B=40 is unique in the suite: an earlier test with identical shapes
    # and statics would make the unsharded run a jit-cache HIT, so the
    # trace-time counter would never fire for it (order-dependent flake)
    ov = _overrides(40, rng)
    kw = dict(node="2", method="pallas", precision="f32", interpret=True)
    a = mc_ac_stats(ckt, ov, **kw)
    n_after_a = calls["n"]
    assert n_after_a >= 1  # the plain run took the fused tier
    b = mc_ac_stats(ckt, ov, device_put=sharder(mesh), **kw)
    assert calls["n"] > n_after_a  # the SHARDED run re-traced it too
    _stats_close(b, a, rtol=1e-6)


def test_pattern_is_hashable_and_stable():
    ckt = parse_netlist(RC_NET)
    from spicey_tpu.ir.circuit import build_tensors, ext_arrays

    t = build_tensors(ckt)
    ext_idx = {k: np.asarray(v) for k, v in ext_arrays(t).items()
               if k.endswith("idx")}
    p1 = fused_mod.build_stamp_pattern(
        t.nvar, t.r_idx, t.c_idx, t.l_idx, t.v_idx, ext_idx)
    p2 = fused_mod.build_stamp_pattern(
        t.nvar, t.r_idx, t.c_idx, t.l_idx, t.v_idx, ext_idx)
    assert hash(p1) == hash(p2) and p1 == p2


# ---------- fused whole-transient kernel (ops/pallas_mc_tran.py) ----------

import spicey_tpu.analysis.mc as mc_mod
import spicey_tpu.ops.pallas_mc_tran as ftran_mod
from spicey_tpu.analysis.mc import mc_tran_sampled, mc_tran_stats

TRAN_NET = """fused tran rlc
V1 1 0 PULSE(0 5 0 1n 1n 5u 10u)
R1 1 2 1k
C1 2 0 1u
L1 2 3 1m
R2 3 0 50
.tran 0.2u 20u
.end
"""


@pytest.fixture
def tran_fused_counter(monkeypatch):
    calls = {"n": 0}
    real = mc_mod._mc_tran_fused_core

    def count(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(mc_mod, "_mc_tran_fused_core", count)
    return calls


def _tran_overrides(B, rng):
    return {"R1": 1e3 * (1 + 0.2 * rng.random(B)),
            "C1": 1e-6 * (1 + 0.2 * rng.random(B)),
            "L1": 1e-3 * (1 + 0.2 * rng.random(B))}


def test_tran_fused_matches_f64(tran_fused_counter):
    rng = np.random.default_rng(0)
    ov = _tran_overrides(32, rng)
    ckt = parse_netlist(TRAN_NET)
    ref = mc_tran_stats(ckt, ov, node="2", method="gj", precision="f64")
    fus = mc_tran_stats(ckt, ov, node="2", method="pallas",
                        precision="f32", interpret=True)
    assert tran_fused_counter["n"] == 1
    _stats_close(fus, ref, rtol=1e-4)


def test_tran_fused_matches_scan_tier(monkeypatch):
    rng = np.random.default_rng(1)
    ov = _tran_overrides(24, rng)
    ckt = parse_netlist(TRAN_NET)
    fus = mc_tran_stats(ckt, ov, node="2", method="pallas",
                        precision="f32", interpret=True)
    monkeypatch.setattr(ftran_mod, "_FUSED_MAX_N", 0)
    scan = mc_tran_stats(ckt, ov, node="2", method="pallas",
                         precision="f32", interpret=True,
                         time_parallel="never")
    _stats_close(fus, scan, rtol=5e-5)


def test_tran_fused_ineligible_cases(tran_fused_counter):
    rng = np.random.default_rng(2)
    ckt = parse_netlist(TRAN_NET)
    ov = _tran_overrides(8, rng)
    # non-BE integration keeps the scan semantics
    mc_tran_stats(ckt, ov, node="2", method="pallas", precision="f32",
                  interpret=True, integration="trap")
    # per-variant V overrides batch the source grid (DC source — the
    # engine refuses waveform-driven overrides outright)
    dc_net = ("fused tran dc deck\nV1 1 0 dc 5\nR1 1 2 1k\nC1 2 0 1u\n"
              ".tran 0.2u 20u\n.end\n")
    dc_ckt = parse_netlist(dc_net)
    mc_tran_stats(dc_ckt, {"R1": 1e3 * (1 + 0.1 * rng.random(8)),
                           "V1": 5.0 * (1 + 0.1 * rng.random(8))},
                  node="2", method="pallas", precision="f32",
                  interpret=True)
    # K-coupled inductors: the matrix companion Gamma = dt*M^{-1} is a
    # dense cross-inductor block the fused stamp pattern does not model
    k_net = ("a coupled deck\nV1 1 0 PULSE(0 5 0 1n 1n 5u 10u)\n"
             "R1 1 2 100\nL1 2 0 1m\nL2 3 0 1m\nK1 L1 L2 0.5\n"
             "R2 3 0 1k\n.tran 0.2u 20u\n.end\n")
    kc = parse_netlist(k_net, dialect="extended")
    from spicey_tpu.ir.circuit import build_tensors
    assert build_tensors(kc).n_k
    mc_tran_stats(kc, {"R1": 100.0 * (1 + 0.1 * rng.random(8))},
                  node="3", method="pallas", precision="f32",
                  interpret=True, time_parallel="never")
    assert tran_fused_counter["n"] == 0


def test_tran_fused_temp_override_matches_scan(monkeypatch,
                                               tran_fused_counter):
    """.temp rides the fused path: tensorization folds T into d_n/d_is/
    r_vals and the kernel takes the clamp-window scale statically."""
    rng = np.random.default_rng(9)
    hot = parse_netlist(netlists.DIODE_SWITCH.replace(
        ".tran 0.00001 0.01", ".temp 85\n.tran 0.00001 0.01"),
        dialect="extended")
    ov = {"RR1": 1e3 * (1 + 0.1 * rng.random(8))}
    fus = mc_tran_stats(hot, ov, node="N3", method="pallas",
                        precision="f32", interpret=True)
    assert tran_fused_counter["n"] == 1
    with monkeypatch.context() as m:
        m.setattr(ftran_mod, "_FUSED_MAX_N", 0)
        scan = mc_tran_stats(hot, ov, node="N3", method="pallas",
                             precision="f32", interpret=True,
                             time_parallel="never")
    _stats_close(fus, scan, rtol=5e-3)
    # the clamp bound rounds differently (python-f64 vs f32 product),
    # and the one-Newton-pass-per-iteration semantics integrate the
    # ulp-level difference over the 1001-step transient
    np.testing.assert_allclose(fus.mean, scan.mean, rtol=5e-4, atol=1e-5)
    # and the hot run actually differs from the 300 K one
    cold = parse_netlist(netlists.DIODE_SWITCH)
    ref = mc_tran_stats(cold, ov, node="N3", method="pallas",
                        precision="f32", interpret=True)
    assert float(np.max(np.abs(fus.mean - ref.mean))) > 1e-4


def test_tran_fused_switch_diode_matches_scan_tier(monkeypatch,
                                                   tran_fused_counter):
    """The in-kernel Newton/switch loop (switch + diode circuits) must be
    semantically identical to the f32 scan tier — same zero-seeded inner
    loop, same hysteresis update, same clamps."""
    rng = np.random.default_rng(7)
    for net, node, ov_name in [(netlists.VSWITCH_PWL, "OUT", "R1"),
                               (netlists.DIODE_SWITCH, "N3", "RR1"),
                               (netlists.SWITCH_VT_VH, "N2", "RR1")]:
        ckt = parse_netlist(net)
        ov = {ov_name: 1e3 * (1 + 0.1 * rng.random(8))}
        before = tran_fused_counter["n"]
        fus = mc_tran_stats(ckt, ov, node=node, method="pallas",
                            precision="f32", interpret=True)
        assert tran_fused_counter["n"] == before + 1
        with monkeypatch.context() as m:
            m.setattr(ftran_mod, "_FUSED_MAX_N", 0)
            scan = mc_tran_stats(ckt, ov, node=node, method="pallas",
                                 precision="f32", interpret=True,
                                 time_parallel="never")
        # trajectories agree to f32 ulp (diode companions evaluate in a
        # different arithmetic order); std of near-identical variants
        # additionally suffers f32 cancellation under the two tiers'
        # different reduction orders — hence the looser stats tolerance
        _stats_close(fus, scan, rtol=5e-3)
        np.testing.assert_allclose(fus.mean, scan.mean, rtol=1e-5,
                                   atol=1e-6)


def test_tran_fused_diode_matches_f64():
    """Against the f64 engine the diode fixtures agree to f32 accuracy.

    (VSWITCH_PWL is excluded by design: its PWL control ramp crosses Von
    exactly at a grid point, so f32 rounding toggles the switch one step
    away from the f64 engine — the f32 SCAN tier shows the identical
    offset, pinned by test_tran_fused_switch_diode_matches_scan_tier.)"""
    rng = np.random.default_rng(8)
    for net, node in [(netlists.DIODE_SWITCH, "N3"),
                      (netlists.SWITCH_VT_VH, "N2")]:
        ckt = parse_netlist(net)
        ov = {"RR1": 1e3 * (1 + 0.1 * rng.random(8))}
        fus = mc_tran_stats(ckt, ov, node=node, method="pallas",
                            precision="f32", interpret=True)
        ref = mc_tran_stats(ckt, ov, node=node, method="gj",
                            precision="f64")
        for f in ("mean", "min", "max"):
            x, y = getattr(fus, f), getattr(ref, f)
            np.testing.assert_allclose(
                x, y, rtol=2e-4, atol=2e-4 * float(np.max(np.abs(y))),
                err_msg=f)
        # std of near-identical variants is cancellation-limited in f32
        np.testing.assert_allclose(
            fus.std, ref.std, rtol=2e-2,
            atol=2e-2 * float(np.max(np.abs(ref.std))), err_msg="std")
        assert fus.n_valid == ref.n_valid


RING_NET = (
    "a ring-oscillator deck\n"
    ".model mn nmos(vto=1 kp=2m)\n"
    ".model mp pmos(vto=-1 kp=2m)\n"
    "vdd vdd 0 5\n"
    "mn1 n1 n3 0 mn\nmp1 n1 n3 vdd mp\nc1 n1 0 1n\n"
    "mn2 n2 n1 0 mn\nmp2 n2 n1 vdd mp\nc2 n2 0 1n\n"
    "mn3 n3 n2 0 mn\nmp3 n3 n2 vdd mp\nc3 n3 0 1n\n"
    "ikick 0 n1 PULSE(0 2m 0 1n 1n 3u 1)\n"
    ".tran 0.1u 10u\n"
)

BJT_NET = ("a bjt ce amp\n.model qn npn(is=1e-15 bf=100)\n"
           "VCC vcc 0 5\nVIN in 0 PULSE(0.6 0.7 0 1u 1u 10u 20u)\n"
           "RB in b1 10k\nRC vcc c1 1k\nQ1 c1 b1 0 qn\nCL c1 0 1n\n"
           ".tran 0.2u 40u\n.end\n")


def test_tran_fused_mosfet_matches_f64(tran_fused_counter):
    """MOSFET (Newton-to-convergence) decks ride the fused kernel: the
    in-kernel loop runs the scan core's settling rule (max|dx| <=
    tol*(1+max|x|), f32-floored) with per-lane done masking."""
    rng = np.random.default_rng(12)
    B = 8
    ckt = parse_netlist(RING_NET, dialect="extended")
    ov = {"c1": 1e-9 * (1 + 0.1 * rng.random(B)),
          "c2": 1e-9 * (1 + 0.1 * rng.random(B))}
    fus = mc_tran_stats(ckt, ov, node="n1", method="pallas",
                        precision="f32", interpret=True)
    assert tran_fused_counter["n"] == 1
    ref = mc_tran_stats(ckt, ov, node="n1", method="gj",
                        precision="f64")
    scale = float(np.max(np.abs(ref.mean))) + 1e-30
    assert float(np.max(np.abs(fus.mean - ref.mean))) < 5e-4 * scale
    assert fus.n_valid == ref.n_valid == B


def test_tran_fused_mosfet_matches_f32_scan_tier(monkeypatch,
                                                 tran_fused_counter):
    """Same convergence rule as the f32 scan tier (incl. the 16-ulp
    tolerance floor) — trajectories agree to f32 rounding."""
    rng = np.random.default_rng(13)
    B = 8
    ckt = parse_netlist(RING_NET, dialect="extended")
    ov = {"c1": 1e-9 * (1 + 0.1 * rng.random(B))}
    fus = mc_tran_stats(ckt, ov, node="n2", method="pallas",
                        precision="f32", interpret=True)
    assert tran_fused_counter["n"] == 1
    with monkeypatch.context() as m:
        m.setattr(ftran_mod, "_FUSED_MAX_N", 0)
        scan = mc_tran_stats(ckt, ov, node="n2", method="pallas",
                             precision="f32", interpret=True,
                             time_parallel="never")
    scale = float(np.max(np.abs(scan.mean))) + 1e-30
    np.testing.assert_allclose(fus.mean, scan.mean, rtol=2e-4,
                               atol=2e-4 * scale)


def test_tran_fused_bjt_matches_f64(tran_fused_counter):
    """BJT (Ebers-Moll) decks ride the fused kernel."""
    rng = np.random.default_rng(14)
    B = 8
    ckt = parse_netlist(BJT_NET, dialect="extended")
    ov = {"RC": 1e3 * (1 + 0.1 * rng.random(B))}
    fus = mc_tran_stats(ckt, ov, node="c1", method="pallas",
                        precision="f32", interpret=True)
    assert tran_fused_counter["n"] == 1
    ref = mc_tran_stats(ckt, ov, node="c1", method="gj",
                        precision="f64")
    scale = float(np.max(np.abs(ref.mean))) + 1e-30
    assert float(np.max(np.abs(fus.mean - ref.mean))) < 5e-4 * scale
    assert fus.n_valid == ref.n_valid == B


def test_tran_fused_jfet_matches_f64(tran_fused_counter):
    """JFETs lower to level-1 M devices at tensorization, so J decks
    ride the fused kernel with no extra kernel code."""
    rng = np.random.default_rng(17)
    B = 8
    net = ("a jfet cs amp\n.model jm njf(vto=-2 beta=1e-4 lambda=0)\n"
           "VDD vdd 0 10\nVG g 0 PULSE(-2 0 0 1u 1u 10u 20u)\n"
           "RD vdd d1 10k\nJ1 d1 g 0 jm\nCL d1 0 1n\n"
           ".tran 1u 20u\n.end\n")
    ckt = parse_netlist(net, dialect="extended")
    ov = {"RD": 1e4 * (1 + 0.1 * rng.random(B))}
    fus = mc_tran_stats(ckt, ov, node="d1", method="pallas",
                        precision="f32", interpret=True)
    assert tran_fused_counter["n"] == 1
    ref = mc_tran_stats(ckt, ov, node="d1", method="gj",
                        precision="f64")
    scale = float(np.max(np.abs(ref.mean))) + 1e-30
    assert float(np.max(np.abs(fus.mean - ref.mean))) < 5e-4 * scale
    assert fus.n_valid == ref.n_valid == B


def test_tran_fused_bjt_charge_matches_f64(tran_fused_counter):
    """BJT junction charge (TF/CJE/CJC) runs in-kernel: per-junction
    companions with the split anchor, committed charges carried across
    steps — scan-tier semantics (tran.py _bjt_junction_charge)."""
    rng = np.random.default_rng(16)
    B = 8
    qc_net = ("a bjt charge amp\n"
              ".model qn npn(is=1e-15 bf=100 tf=1n cje=2p cjc=1p)\n"
              "VCC vcc 0 5\nVIN in 0 PULSE(0.6 0.7 0 1u 1u 10u 20u)\n"
              "RB in b1 10k\nRC vcc c1 1k\nQ1 c1 b1 0 qn\n"
              ".tran 0.2u 40u\n.end\n")
    ckt = parse_netlist(qc_net, dialect="extended")
    from spicey_tpu.ir.circuit import build_tensors
    assert build_tensors(ckt).has_q_charge
    ov = {"RC": 1e3 * (1 + 0.1 * rng.random(B))}
    fus = mc_tran_stats(ckt, ov, node="c1", method="pallas",
                        precision="f32", interpret=True)
    assert tran_fused_counter["n"] == 1
    ref = mc_tran_stats(ckt, ov, node="c1", method="gj",
                        precision="f64")
    scale = float(np.max(np.abs(ref.mean))) + 1e-30
    assert float(np.max(np.abs(fus.mean - ref.mean))) < 5e-4 * scale
    assert fus.n_valid == ref.n_valid == B


def test_tran_fused_charge_diode_matches_f64(tran_fused_counter):
    """TT/CJO charge storage runs in-kernel: the BE junction-charge
    companion with the split Newton anchor (diffusion at the clamped
    voltage, depletion at the true one) and the committed-charge state
    carried across steps — reverse recovery and varactor decks."""
    rng = np.random.default_rng(15)
    B = 8
    tt_net = ("tt diode deck\n.model dchg d(is=1e-14 tt=10n)\n"
              "V1 1 0 PULSE(5 -5 0 1n 1n 50n 200n)\nR1 1 2 100\n"
              "D1 2 0 dchg\n.tran 4n 400n\n.end\n")
    cj_net = ("a cjo varactor deck\n"
              ".model dv d(is=1e-14 cjo=10p vj=0.7 m=0.5)\n"
              "V1 1 0 SIN(0 2 1e6)\nR1 1 2 1k\nD1 2 0 dv\n"
              ".tran 10n 3u\n.end\n")
    for k, (net, rnom) in enumerate([(tt_net, 100.0), (cj_net, 1e3)]):
        ckt = parse_netlist(net, dialect="extended")
        from spicey_tpu.ir.circuit import build_tensors
        assert build_tensors(ckt).has_d_charge
        ov = {"R1": rnom * (1 + 0.1 * rng.random(B))}
        fus = mc_tran_stats(ckt, ov, node="2", method="pallas",
                            precision="f32", interpret=True)
        assert tran_fused_counter["n"] == k + 1
        ref = mc_tran_stats(ckt, ov, node="2", method="gj",
                            precision="f64")
        scale = float(np.max(np.abs(ref.mean))) + 1e-30
        assert float(np.max(np.abs(fus.mean - ref.mean))) < 5e-4 * scale
        assert fus.n_valid == ref.n_valid == B


def test_tran_fused_sharded_over_cpu_mesh(tran_fused_counter):
    """A 1D batch mesh runs the fused transient kernel under shard_map
    (a pallas_call is not GSPMD-auto-partitionable); results must match
    the single-device fused run. Covers both the linear factor-once
    kernel and the switch/diode Newton variant."""
    import jax

    from spicey_tpu.parallel.mesh import make_mesh, sharder

    mesh = make_mesh({"batch": 8}, devices=jax.devices("cpu"))
    rng = np.random.default_rng(11)
    B = 32
    for net, node, ov in [
            (TRAN_NET, "2", _tran_overrides(B, rng)),
            (netlists.DIODE_SWITCH, "N3",
             {"RR1": 1e3 * (1 + 0.1 * rng.random(B))})]:
        ckt = parse_netlist(net)
        kw = dict(node=node, method="pallas", precision="f32",
                  interpret=True)
        a = mc_tran_stats(ckt, ov, **kw)
        n0 = tran_fused_counter["n"]
        b = mc_tran_stats(ckt, ov, device_put=sharder(mesh), **kw)
        assert tran_fused_counter["n"] == n0 + 1  # fused, not scan
        np.testing.assert_allclose(b.mean, a.mean, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(b.std, a.std, rtol=1e-4, atol=1e-8)
        assert b.n_valid == a.n_valid == B
    # a 2D mesh (freq axis in play) falls back to the GSPMD scan tier
    # rather than failing — the fused kernel has no frequency axis
    mesh2 = make_mesh({"batch": 4, "freq": 2}, devices=jax.devices("cpu"))
    ckt = parse_netlist(TRAN_NET)
    ov2 = _tran_overrides(B, rng)
    n0 = tran_fused_counter["n"]
    c = mc_tran_stats(ckt, ov2, node="2", method="pallas",
                      precision="f32", interpret=True,
                      device_put=sharder(mesh2))
    assert tran_fused_counter["n"] == n0  # not fused
    assert c.n_valid == B


def test_tran_fused_sampled_padding(tran_fused_counter):
    ckt = parse_netlist(TRAN_NET)
    fus = mc_tran_sampled(ckt, {"R1": 0.1, "C1": 0.1}, B=37, node="2",
                          method="pallas", precision="f32", key=5,
                          interpret=True)
    ref = mc_tran_sampled(ckt, {"R1": 0.1, "C1": 0.1}, B=37, node="2",
                          method="gj", precision="f64", key=5)
    assert tran_fused_counter["n"] == 1
    assert fus.n_valid == ref.n_valid == 37
    np.testing.assert_allclose(fus.mean, ref.mean, rtol=1e-3,
                               atol=1e-3 * float(np.max(np.abs(ref.mean))))


def test_fused_f64_matches_gj_reference_deck():
    """The refined fused f64 tier (fused f32 kernel + pattern-residual
    refinement, ops/pallas_mc_ac.mc_ac_fused_f64) must agree with the
    plane-GJ f64 engine at fidelity tolerance, not yield tolerance."""
    rng = np.random.default_rng(3)
    ckt = parse_netlist(RC_NET)
    ov = _overrides(48, rng)
    ref = mc_ac_stats(ckt, ov, node="2", method="gj", precision="f64")
    fus = mc_ac_stats(ckt, ov, node="2", method="pallas",
                      precision="f64", interpret=True)
    _stats_close(fus, ref, rtol=1e-9)


def test_fused_f64_matches_gj_extended_deck():
    rng = np.random.default_rng(4)
    ckt = parse_netlist(EXT_NET, dialect="extended")
    ov = {"r1": 1e3 * (1 + 0.1 * rng.random(32)),
          "c1": 1e-6 * (1 + 0.1 * rng.random(32))}
    ref = mc_ac_stats(ckt, ov, node="d", method="gj", precision="f64")
    fus = mc_ac_stats(ckt, ov, node="d", method="pallas",
                      precision="f64", interpret=True)
    _stats_close(fus, ref, rtol=1e-9)


def test_fused_f64_guard_catches_extreme_condition():
    """A conductance spread past f32 refinement's reach (cond >~ 1e7)
    must trigger the residual guard: with fallback=False the diverged
    systems are flagged invalid (proving the guard fires); with the
    default fallback the dense-f64 re-solve restores gj-grade results.
    Nothing silently wrong is marked valid."""
    import jax.numpy as jnp

    from spicey_tpu.ir.circuit import build_tensors
    from spicey_tpu.ops.pallas_mc_ac import (build_stamp_pattern,
                                             combine_values,
                                             mc_ac_fused_f64)
    from spicey_tpu.analysis.ac import build_frequency_array

    # the near-short bridge makes rows 2 and 3 of the MNA nearly linearly
    # dependent (g=1e8 dominates both, the 1e-3 terms carry the answer):
    # cond ~ 1e11 — far past f32 refinement's ~1e7 reach
    net = ("near-short bridge\nv1 1 0 dc 0 ac 1\nr1 1 2 1k\n"
           "rbig 2 3 1e-8\nr2 3 0 1k\nc1 3 0 1u\n.ac dec 2 1 100\n.end\n")
    rng = np.random.default_rng(5)
    ckt = parse_netlist(net)
    tens = build_tensors(ckt)
    B = 16
    r_vals = np.broadcast_to(tens.r_vals, (B, 3)).copy()
    r_vals[:, 0] = 1e3 * (1 + 0.1 * rng.random(B))
    vals = combine_values(
        jnp.asarray(r_vals), jnp.broadcast_to(tens.c_vals, (B, 1)),
        jnp.zeros((B, 0)), jnp.ones((B, 1)), jnp.zeros((B, 1)),
        dtype=jnp.float64)
    pattern = build_stamp_pattern(tens.nvar, tens.r_idx, tens.c_idx,
                                  tens.l_idx, tens.v_idx)
    freqs = jnp.asarray(
        build_frequency_array(ckt.ac.mode, ckt.ac.N, ckt.ac.f1, ckt.ac.f2))
    node_idx = [n.upper() for n in tens.node_names].index("3")
    _, valid_ng = mc_ac_fused_f64(freqs, vals, tens.nvar, node_idx,
                                  pattern, fallback=False, interpret=True)
    assert not bool(np.asarray(valid_ng).any()), \
        "guard never fired on a cond~1e11 system"
    mag, valid = mc_ac_fused_f64(freqs, vals, tens.nvar, node_idx,
                                 pattern, fallback=True, interpret=True)
    assert bool(np.asarray(valid).all())
    # at cond ~ 1e11 ANY exact f64 algorithm carries cond*eps64 ~ 1e-5
    # forward error, so the fallback is compared at a condition-limited
    # tolerance (the well-conditioned decks above pin 1e-9)
    ov = {"r1": r_vals[:, 0]}
    ref = mc_ac_stats(ckt, ov, node="3", method="gj", precision="f64")
    m = np.asarray(mag)
    np.testing.assert_allclose(m.mean(axis=0), ref.mean, rtol=1e-3)
    np.testing.assert_allclose(m.min(axis=0), ref.min, rtol=1e-3)
    np.testing.assert_allclose(m.max(axis=0), ref.max, rtol=1e-3)


def test_fused_f64_dd_matches_hbm_reference_impl():
    """The in-kernel df32 refinement (mc_ac_fused_f64) and the
    HBM-round-trip reference implementation (mc_ac_fused_f64_hbm) are
    two independent realizations of the same refinement scheme; they
    must agree at df32-floor tolerance. This pins the double-float
    arithmetic against the plain-f64 XLA residual path."""
    import jax.numpy as jnp

    from spicey_tpu.analysis.ac import build_frequency_array
    from spicey_tpu.ir.circuit import build_tensors
    from spicey_tpu.ops.pallas_mc_ac import (build_stamp_pattern,
                                             combine_values,
                                             mc_ac_fused_f64,
                                             mc_ac_fused_f64_hbm)

    rng = np.random.default_rng(9)
    ckt = parse_netlist(RC_NET)
    tens = build_tensors(ckt)
    B = 32
    r = 30.0 * (1 + 0.2 * rng.random(B))
    c = 100e-6 * (1 + 0.2 * rng.random(B))
    vals = combine_values(
        jnp.asarray(r[:, None]), jnp.asarray(c[:, None]),
        jnp.zeros((B, 0)), jnp.ones((B, 1)), jnp.zeros((B, 1)),
        dtype=jnp.float64)
    pattern = build_stamp_pattern(tens.nvar, tens.r_idx, tens.c_idx,
                                  tens.l_idx, tens.v_idx)
    freqs = jnp.asarray(
        build_frequency_array(ckt.ac.mode, ckt.ac.N, ckt.ac.f1, ckt.ac.f2))
    node_idx = [n.upper() for n in tens.node_names].index("2")
    mag_dd, v_dd = mc_ac_fused_f64(freqs, vals, tens.nvar, node_idx,
                                   pattern, interpret=True)
    mag_h, v_h = mc_ac_fused_f64_hbm(freqs, vals, tens.nvar, node_idx,
                                     pattern, interpret=True)
    np.testing.assert_allclose(np.asarray(mag_dd), np.asarray(mag_h),
                               rtol=1e-12)
    assert np.asarray(v_dd).all() and np.asarray(v_h).all()
