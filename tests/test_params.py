"""`.param` + `{expression}` substitution tests (extended dialect).

No reference analog (ngspice semantics); parsing/params.py runs before
subcircuit flattening so braces inside .subckt bodies see the global scope.
"""

import numpy as np
import pytest

from spicey_tpu import parse_netlist, simulate
from spicey_tpu.parsing.params import apply_params, eval_expr


def test_eval_expr_basics():
    p = {"a": 2.0, "b": 3.0}
    assert eval_expr("a*b + 1", p) == 7.0
    assert eval_expr("-a**b", p) == -8.0
    assert eval_expr("sqrt(a*a)", p) == 2.0
    assert eval_expr("max(a, b)", p) == 3.0
    assert eval_expr("10k", {}) == 10e3
    assert eval_expr("2.2u * 1meg", {}) == pytest.approx(2.2)
    with pytest.raises(ValueError, match="unknown parameter"):
        eval_expr("missing", {})
    with pytest.raises(ValueError, match="malformed|unsupported"):
        eval_expr("__import__('os')", {})
    with pytest.raises(ValueError, match="unsupported"):
        eval_expr("a.real", p)


def test_param_ordering_and_redefinition():
    out, params = apply_params(".param a=1 b={a+1}\n.param a=10 c={a+b}\n"
                               "r1 x 0 {c}\n.end\n")
    assert "r1 x 0 12.0" in out
    assert params == {"a": 10.0, "b": 2.0, "c": 12.0}


def test_params_in_elements_models_directives():
    net = """* params everywhere
.param vdd=5 ron=0.5 vt=2.5
.model sw1 sw(ron={ron} vt={vt} vh={vt/5})
v1 a 0 {vdd}
vc c 0 {vdd/2}
s1 a b c 0 sw1
rb b 0 1k
.tran {10u} {1m}
.end
"""
    ckt = parse_netlist(net, dialect="extended")
    assert ckt.V[0].dc == 5.0
    m = ckt.vswitch_models["sw1"]
    assert m.Ron == 0.5
    assert m.Von == pytest.approx(2.5 + 0.25)
    assert ckt.tran.dt == pytest.approx(10e-6)


def test_params_inside_subckt_bodies():
    net = """* param sub
.param rsub=42
.subckt blk a
rx a 0 {rsub}
.ends
v1 n 0 1
x1 n blk
.op
.end
"""
    r = simulate(net, dialect="extended")
    assert abs(r.op.element_currents["rx.x1"] - 1 / 42.0) < 1e-12


def test_param_rc_filter_end_to_end():
    net = """* param rc
.param rload=2k fc=1591.549431 cval={1/(2*3.141592653589793*fc*rload)}
v1 1 0 dc 0 ac 1
r1 1 2 {rload}
c1 2 0 {cval}
.ac lin 2 {fc} {2*fc}
.end
"""
    r = simulate(net, dialect="extended")
    assert abs(abs(r.ac.node_voltages["2"][0]) - 1 / np.sqrt(2)) < 1e-9


def test_param_errors():
    with pytest.raises(ValueError, match="malformed .param"):
        parse_netlist(".param oops\nv1 a 0 1\nr1 a 0 1\n.end\n",
                      dialect="extended")
    with pytest.raises(ValueError, match="unknown parameter"):
        parse_netlist("t\nv1 a 0 1\nr1 a 0 {nope}\n.end\n",
                      dialect="extended")


def test_reference_dialect_leaves_braces_alone():
    """In the spicey dialect .param is skipped and braces are untouched
    (they fail number parsing like the reference would)."""
    ckt = parse_netlist("t\n.param a=1\nv1 x 0 1\nr1 x 0 1k\n.end\n")
    assert any(line.startswith(".param") for line in ckt.skipped)


def test_parameterized_subckt_defaults_and_overrides():
    """ngspice-style .subckt parameters: defaults on the definition line,
    name=value overrides on the X line (evaluated in the outer scope)."""
    net = """* param cells
.param base=1k
.subckt divider in out rtop=1k rbot={base}
r1 in out {rtop}
r2 out 0 {rbot}
.ends
v1 a 0 6
x1 a mid1 divider
x2 a mid2 divider rtop={2*base} rbot=1k
.op
.end
"""
    r = simulate(net, dialect="extended")
    # x1: 1k/1k -> 3 V; x2: 2k over 1k -> 2 V
    assert abs(r.op.node_voltages["mid1"] - 3.0) < 1e-9
    assert abs(r.op.node_voltages["mid2"] - 2.0) < 1e-9


def test_parameterized_subckt_nested_scopes():
    """Nested instances: each level's overrides evaluate in ITS outer
    scope and shadow the parent's parameters."""
    net = """* nested
.subckt leaf a r=100
rl a 0 {r}
.ends
.subckt mid a r=200
x1 a leaf r={r*2}
.ends
v1 n 0 1
x0 n mid r=300
.op
.end
"""
    r = simulate(net, dialect="extended")
    # leaf resistor = 300*2 = 600
    assert abs(r.op.element_currents["rl.x1.x0"] - 1 / 600.0) < 1e-12


def test_subckt_param_errors():
    with pytest.raises(ValueError, match="unknown parameter"):
        simulate("t\n.subckt s a r=1\nrx a 0 {r}\n.ends\nv1 n 0 1\n"
                 "x1 n s nope=2\n.op\n.end\n", dialect="extended")
    # unresolved brace surfaces the parameter name
    with pytest.raises(ValueError, match="unknown parameter"):
        simulate("t\nv1 a 0 1\nr1 a 0 {ghost}\n.end\n", dialect="extended")


def test_behavioral_inside_parameterized_subckt():
    """B expressions inside .subckt get scope-rewritten references AND
    local parameter substitution."""
    net = """* b cell
.subckt clip in out lim=1
bamp out 0 V={lim}*tanh(v(in))
rl out 0 1k
.ends
v1 sig 0 2
x1 sig y1 clip
x2 sig y2 clip lim=3
.op
.end
"""
    import numpy as np

    r = simulate(net, dialect="extended")
    assert r.op.node_voltages["y1"] == pytest.approx(np.tanh(2.0), rel=1e-9)
    assert r.op.node_voltages["y2"] == pytest.approx(3 * np.tanh(2.0),
                                                     rel=1e-9)


# --- .func user functions + .tran tstart (extended) ---

def test_func_definition_and_call():
    from spicey_tpu import parse_netlist

    ckt = parse_netlist("""x
.param w=2u
.func res(l, sheet) {sheet*l/w}
r1 a 0 {res(10u, 50)}
v1 a 0 dc 1
""", dialect="extended")
    assert ckt.R[0].R == pytest.approx(50 * 10e-6 / 2e-6)


def test_func_composes_and_recursion_capped():
    from spicey_tpu import parse_netlist

    ckt = parse_netlist("""x
.func sq(x) x*x
.func quad(x) = sq(sq(x))
r1 a 0 {quad(3)}
v1 a 0 dc 1
""", dialect="extended")
    assert ckt.R[0].R == 81.0
    with pytest.raises(ValueError, match="recursion"):
        parse_netlist("x\n.func f(x) f(x)\nr1 a 0 {f(1)}\nv1 a 0 1\n",
                      dialect="extended")


def test_tran_tstart_window():
    """.tran dt tstop tstart (extended): integrate from 0, record only
    t >= tstart; the reference dialect ignores the extra token."""
    import numpy as np

    from spicey_tpu import parse_netlist, simulate, simulate_tran_batch

    net = "x\nv1 a 0 PULSE(0 1 0 1n 1n 5u 20u)\nr1 a b 1k\nc1 b 0 1n\n" \
          ".tran 0.1u 10u 4u\n"
    res = simulate(net, dialect="extended")
    t = np.asarray(res.tran.times)
    assert t[0] == pytest.approx(4e-6)
    assert t[-1] == pytest.approx(10e-6)
    # the waveform carries the pre-window history: the 1 us RC has been
    # charging since t=0, so at t=4u it sits near 1 - e^-4 ~ 0.98
    assert np.asarray(res.tran.node_voltages["b"])[0] > 0.95
    # reference dialect: extra token ignored, full grid kept
    res0 = simulate(net)
    assert np.asarray(res0.tran.times)[0] == 0.0
    # batch path trims identically
    ckt = parse_netlist(net, dialect="extended")
    rb = simulate_tran_batch(ckt, {"r1": np.asarray([1e3, 2e3])})
    assert rb.times[0] == pytest.approx(4e-6)
    assert rb.xs.shape[1] == rb.times.shape[0]


def test_tran_tstart_validation():
    from spicey_tpu import parse_netlist

    with pytest.raises(ValueError, match="tstart"):
        parse_netlist("x\nv1 a 0 1\nr1 a 0 1\n.tran 1u 10u 20u\n",
                      dialect="extended")
