"""Tests for the JS Number.prototype.toPrecision-faithful formatter.

Expected strings below are the outputs of the corresponding JS expressions
(ECMA-262 Number.prototype.toPrecision), which the reference relies on for
its golden snapshots."""

import pytest

from spicey_tpu.formatting.jsnum import to_fixed, to_precision


@pytest.mark.parametrize(
    "x,p,expected",
    [
        (1.0, 6, "1.00000"),
        (100.0, 6, "100.000"),
        (0.999822, 6, "0.999822"),
        (-1.07987, 6, "-1.07987"),
        (0.0, 6, "0.00000"),
        (-0.0, 6, "0.00000"),
        (123456789.0, 6, "1.23457e+8"),
        (1234567.0, 6, "1.23457e+6"),
        (999999.4, 6, "999999"),
        (999999.5, 6, "1.00000e+6"),
        (0.000012345649, 6, "0.0000123456"),  # rounds half-even? no: see below
        (1e-7, 6, "1.00000e-7"),
        (2e-5, 6, "0.0000200000"),
        (1e21, 6, "1.00000e+21"),
        (-62.0533, 6, "-62.0533"),
        (5.0, 6, "5.00000"),
        (0.00005, 6, "0.0000500000"),
        (9.999999e5, 6, "1.00000e+6"),
        (1.5, 1, "2"),
        (0.25, 1, "0.3"),  # JS: (0.25).toPrecision(1) === "0.3" (exact half, up)
        (-0.25, 1, "-0.3"),
        (150.0, 2, "1.5e+2"),
        (0.1, 17, "0.10000000000000001"),  # exact binary expansion visible
        (float("nan"), 6, "NaN"),
        (float("inf"), 6, "Infinity"),
        (float("-inf"), 6, "-Infinity"),
    ],
)
def test_to_precision(x, p, expected):
    assert to_precision(x, p) == expected


def test_to_precision_tie_rounds_half_up():
    # 0.000012345649999... — the stored double of 1.234565e-5 decides; use an
    # exactly-representable tie: 0.5 at precision 1 (JS gives "0.5"), and
    # 1.25 at precision 2: exact decimal 1.25 -> half-up -> "1.3"
    assert to_precision(1.25, 2) == "1.3"
    assert to_precision(1.35, 2) == "1.4"  # 1.35 stores as 1.350000000000000088..., rounds up anyway


def test_to_fixed():
    assert to_fixed(2.406636123, 6) == "2.406636"
    assert to_fixed(0.0, 6) == "0.000000"
    assert to_fixed(-1.5e-7, 6) == "-0.000000"
    assert to_fixed(44.2543849999, 6) == "44.254385"


def test_format_dc_and_op_results():
    from spicey_tpu import (
        format_dc_result,
        format_op_result,
        simulate,
    )

    r = simulate(
        "t\nv1 1 0 dc 1\nr1 1 2 1k\nr2 2 0 1k\n.dc v1 0 2 0.5\n.op\n",
        dialect="extended",
    )
    txt = format_dc_result(r.dc)
    assert txt.splitlines()[0] == "sweep, 1:V, 2:V"
    assert txt.splitlines()[2] == "0.500000, 0.500000, 0.250000"
    op_txt = format_op_result(r.op)
    assert "node, V" in op_txt and "element, I" in op_txt
    assert format_dc_result(None) == "No DC analysis.\n"


def test_profiling_spans_and_counters():
    from spicey_tpu import count, profiled, report, simulate, span

    with profiled():
        simulate("t\nv1 1 0 dc 1\nr1 1 0 1k\n.tran 1u 5u\n")
        with span("custom"):
            count("things", 3)
    txt = report()
    assert "parse, 1" in txt
    assert "tran, 1" in txt
    assert "custom, 1" in txt
    assert "things, 3" in txt
    # disabled outside profiled(): spans are no-ops
    with span("ignored"):
        pass
    assert "ignored" not in report()
