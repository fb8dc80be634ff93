"""TPU-vs-CPU hardware equivalence battery (manual / bench-side tool).

The CI suite runs on XLA:CPU (tests/conftest.py); the production target
is the TPU, whose emulated float64 has measured quirks the CPU never
shows (utils/fpaccuracy.py: the size-1 exp lowering read 3.8e-8 relative
error and broke default-tolerance .op on one-diode decks — found by
hand, not by CI). This battery runs every analysis on a spread of small
decks on BOTH backends and reports the worst relative deviation, so a
new hardware quirk shows up as a number instead of a user bug report.

Not collected by pytest (no test_ prefix). Run manually on a TPU host:

    python tests/tpu_equivalence.py          # full battery, prints a table

Exit code 1 if any deviation exceeds TOL (1e-9 relative — generous
against emulated-f64 transcendental noise of ~1e-14/op, tight against
real lowering bugs which sit at 1e-8+).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPICEY_TPU_INTERP", "0")       # compiled engines
os.environ.setdefault("SPICEY_TPU_CPU_THRESHOLD", "0")  # no tiny-path hop

import numpy as np  # noqa: E402

TOL = 1e-9

DECKS = {
    "rc_ac_tran": """a rc deck
V1 in 0 dc 1 ac 1 PULSE(0 5 1u 1u 1u 8u 20u)
R1 in out 1k
C1 out 0 1n
.ac dec 20 10 1e6
.tran 0.2u 20u
.op
.end""",
    "diode": """a vrd deck
V1 in 0 dc 5 ac 1 SIN(0 5 50k)
R1 in a 1k
D1 a 0 DD
.model DD d(is=1e-14)
.ac dec 10 10 1e5
.tran 1u 60u
.op
.end""",
    "bjt_amp": """npn bias deck
V1 vcc 0 dc 12
R1 vcc b 470k
R2 vcc c 4.7k
Q1 c b 0 QN
.model QN npn(is=1e-15 bf=120)
.op
.tran 1u 50u
.end""",
    "mosfet": """nmos bias deck
V1 d 0 dc 5
R1 d dd 1k
M1 dd g 0 NM w=20u l=2u
V2 g 0 dc 3 PULSE(0 3 0 1u 1u 20u 50u)
.model NM nmos(vto=1 kp=50u)
.op
.tran 1u 50u
.end""",
    "switch_diode": """a boostish deck
V1 in 0 dc 5
V2 ctl 0 PULSE(0 5 0 1u 1u 10u 25u)
L1 in sw 100u
S1 sw 0 ctl 0 SM
.model SM sw(ron=0.1 roff=1e6 von=2.5 voff=2)
D1 sw out DD
.model DD d(is=1e-14)
C1 out 0 10u
R1 out 0 100
.tran 0.5u 100u
.end""",
}


def run_all(dev):
    import jax

    from spicey_tpu import simulate
    from spicey_tpu.analysis.noise import simulate_noise
    from spicey_tpu.analysis.op import simulate_dc
    from spicey_tpu.analysis.pz import simulate_pz
    from spicey_tpu.analysis.tf import simulate_tf
    from spicey_tpu.parsing.netlist import parse_netlist

    out = {}
    with jax.default_device(dev):
        for name, deck in DECKS.items():
            r = simulate(deck, dialect="extended")
            rec = {}
            if r.op is not None:
                rec["op"] = np.asarray(
                    [r.op.node_voltages[k] for k in sorted(
                        r.op.node_voltages)])
            if r.ac is not None:
                rec["ac"] = np.concatenate(
                    [np.abs(v) for _, v in sorted(
                        r.ac.node_voltages.items())])
            if r.tran is not None:
                rec["tran"] = np.concatenate(
                    [np.asarray(v) for _, v in sorted(
                        r.tran.node_voltages.items())])
            out[name] = rec
        # .dc transfer curve on the diode deck
        ckt = parse_netlist(
            "a dc sweep deck\nV1 in 0 dc 0\nR1 in a 1k\nD1 a 0 DD\n"
            ".model DD d(is=1e-14)\n.dc V1 0 5 0.25\n.end",
            dialect="extended")
        dc = simulate_dc(ckt)
        out["dc_sweep"] = {"dc": np.asarray(dc.node_voltages["a"])}
        # .tf / .noise / .pz on a diode-loaded divider
        ckt2 = parse_netlist(
            "a smallsignal deck\nV1 in 0 dc 5 ac 1\nR1 in a 1k\n"
            "D1 a 0 DD\nC1 a 0 1n\n.model DD d(is=1e-14)\n"
            ".tf v(a) V1\n.noise v(a) V1 dec 5 10 1e6\n"
            ".pz in 0 a 0 vol pz\n.end", dialect="extended")
        tf = simulate_tf(ckt2)
        nz = simulate_noise(ckt2)
        pz = simulate_pz(ckt2)
        out["smallsignal"] = {
            "tf": np.asarray([tf.transfer_function, tf.input_impedance,
                              tf.output_impedance]),
            "noise": np.asarray(nz.output_psd),
            "pz": np.sort_complex(np.asarray(pz.poles)),
        }
    return out


def main() -> int:
    import jax

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    if tpu.platform == "cpu":
        print("no accelerator present — nothing to compare")
        return 0
    print(f"comparing {tpu.platform} vs cpu ...")
    a = run_all(tpu)
    b = run_all(cpu)
    worst = 0.0
    bad = []
    for deck in a:
        for analysis in a[deck]:
            x, y = a[deck][analysis], b[deck][analysis]
            scale = max(float(np.max(np.abs(y))), 1e-12)
            dev = float(np.max(np.abs(x - y))) / scale
            worst = max(worst, dev)
            flag = " <-- EXCEEDS TOL" if dev > TOL else ""
            print(f"  {deck:14s} {analysis:5s} max rel dev {dev:.3e}{flag}")
            if dev > TOL:
                bad.append((deck, analysis, dev))
    print(f"worst deviation: {worst:.3e} (tol {TOL:.0e})")
    if bad:
        print("FAIL:", bad)
        return 1
    print("TPU/CPU equivalence OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
