"""Unit tests for SPICE number parsing (contract:
/root/reference/lib/parsing/parseNumberWithUnits.ts)."""

import math

import pytest

from spicey_tpu.parsing.numbers import js_parse_float, parse_number_with_units


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("5", 5.0),
        ("-3.5", -3.5),
        ("1e3", 1000.0),
        ("2.5E-6", 2.5e-6),
        (".5", 0.5),
        ("100u", 1e-4),
        ("1n", 1e-9),
        ("10p", 1e-11),
        ("5k", 5000.0),
        ("3meg", 3e6),
        ("3MEG", 3e6),
        ("2g", 2e9),
        ("1t", 1e12),
        ("4m", 4e-3),
        # unit-word stripping: one trailing ohm|v|a|s|h|f is removed
        ("2kohm", 2000.0),
        ("5v", 5.0),
        ("10uF", 1e-5),
        ("1pf", 1e-12),
        ("100mh", 0.1),
        ("2ks", 2000.0),
        # quirk: bare 'f' is consumed as the Farad unit word, not femto
        ("10f", 10.0),
        ("10ff", 1e-14),
        ("1mohm", 1e-3),
    ],
)
def test_units(raw, expected):
    assert parse_number_with_units(raw) == pytest.approx(expected, rel=1e-12)


def test_nan_cases():
    assert math.isnan(parse_number_with_units(None))
    assert math.isnan(parse_number_with_units(""))
    assert math.isnan(parse_number_with_units("   "))
    assert math.isnan(parse_number_with_units("abc"))


def test_unknown_suffix_is_bare_value():
    # suffix not in the table -> bare value (parseNumberWithUnits.ts:29)
    assert parse_number_with_units("5x") == 5.0
    assert parse_number_with_units("5q") == 5.0


def test_js_parse_float_fallback():
    # '3.3k9' fails the <number><alpha> regex; JS parseFloat prefix wins
    assert parse_number_with_units("3.3k9") == 3.3
    assert js_parse_float("3.5abc") == 3.5
    assert js_parse_float("-.5e2x") == -50.0
    assert math.isnan(js_parse_float("x3"))
    assert js_parse_float("Infinity") == math.inf


def test_whitespace_trimmed():
    assert parse_number_with_units("  5k ") == 5000.0
