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
    out = apply_params(".param a=1 b={a+1}\n.param a=10 c={a+b}\n"
                       "r1 x 0 {c}\n.end\n")
    assert "r1 x 0 12.0" in out


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
