"""Transient measurements (.meas tran) — an extension.

The reference has no measurement directives (SURVEY §5: no post-processing).
This implements the core of ngspice's ``.meas tran`` grammar:

  .meas tran <name> max|min|pp|avg|rms|integ v(node) [from=t1] [to=t2]
  .meas tran <name> when v(node)=<val> [rise=k|fall=k|cross=k]
  .meas tran <name> find v(node) at=<t>
  .meas tran <name> trig v(n1)=<v1> [rise|fall|cross=k]
                    targ v(n2)=<v2> [rise|fall|cross=k]     (delay)

Both ``v(n)=val`` and ngspice's ``v(n) val=<val>`` spellings are accepted.
All evaluation is host-side numpy over the recorded waveforms (linear
interpolation between timesteps, trapezoidal integrals); measurements that
cannot be satisfied (missing crossing, empty window) evaluate to NaN rather
than raising, so one bad measure never kills a batch report.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from .results import TranResult

_STAT_KINDS = ("max", "min", "pp", "avg", "rms", "integ")

_MEAS_HEAD_RE = re.compile(
    r"^\.meas(?:ure)?\s+tran\s+(\S+)\s+(.*)$", re.IGNORECASE)
_STAT_RE = re.compile(
    r"^(max|min|pp|avg|rms|integ)\s+v\(([^)]+)\)\s*(.*)$", re.IGNORECASE)
_WHEN_RE = re.compile(
    r"^when\s+v\(([^)]+)\)\s*(?:=\s*(\S+)|val\s*=\s*(\S+))\s*(.*)$",
    re.IGNORECASE)
_FIND_RE = re.compile(
    r"^find\s+v\(([^)]+)\)\s+at\s*=\s*(\S+)\s*$", re.IGNORECASE)
_TRIG_TARG_RE = re.compile(
    r"^trig\s+v\(([^)]+)\)\s*(?:=\s*(\S+)|val\s*=\s*(\S+))\s*(.*?)"
    r"\btarg\s+v\(([^)]+)\)\s*(?:=\s*(\S+)|val\s*=\s*(\S+))\s*(.*)$",
    re.IGNORECASE)
_KV_RE = re.compile(r"(\w+)\s*=\s*(\S+)")


@dataclass
class MeasSpec:
    name: str
    kind: str                 # one of _STAT_KINDS | "when" | "find" | "delay"
    node: str
    node2: str | None = None
    val: float | None = None
    val2: float | None = None
    edge: str = "cross"
    edge2: str = "cross"
    k: int = 1
    k2: int = 1
    t_from: float | None = None
    t_to: float | None = None
    at: float | None = None


def _num(tok: str) -> float:
    from ..parsing.numbers import parse_number_with_units

    return parse_number_with_units(tok)


def _edge_and_count(opts: str) -> tuple[str, int]:
    """Parse trailing ``rise=K`` / ``fall=K`` / ``cross=K`` options."""
    edge, k = "cross", 1
    for key, val in _KV_RE.findall(opts):
        key = key.lower()
        if key in ("rise", "fall", "cross"):
            edge, k = key, int(float(val))
    return edge, k


def parse_meas_line(line: str) -> MeasSpec:
    """Parse one ``.meas tran ...`` line into a MeasSpec (raises on errors)."""
    head = _MEAS_HEAD_RE.match(line.strip())
    if not head:
        raise ValueError(f"malformed .meas directive (only 'tran' measures "
                         f"are supported): {line!r}")
    name, rest = head.group(1), head.group(2).strip()

    m = _STAT_RE.match(rest)
    if m:
        kind, node, opts = m.group(1).lower(), m.group(2), m.group(3)
        spec = MeasSpec(name=name, kind=kind, node=node)
        for key, val in _KV_RE.findall(opts):
            if key.lower() == "from":
                spec.t_from = _num(val)
            elif key.lower() == "to":
                spec.t_to = _num(val)
        return spec

    m = _TRIG_TARG_RE.match(rest)
    if m:
        spec = MeasSpec(
            name=name, kind="delay",
            node=m.group(1), val=_num(m.group(2) or m.group(3)),
            node2=m.group(5), val2=_num(m.group(6) or m.group(7)))
        spec.edge, spec.k = _edge_and_count(m.group(4))
        spec.edge2, spec.k2 = _edge_and_count(m.group(8))
        return spec

    m = _WHEN_RE.match(rest)
    if m:
        spec = MeasSpec(name=name, kind="when", node=m.group(1),
                        val=_num(m.group(2) or m.group(3)))
        spec.edge, spec.k = _edge_and_count(m.group(4))
        return spec

    m = _FIND_RE.match(rest)
    if m:
        return MeasSpec(name=name, kind="find", node=m.group(1),
                        at=_num(m.group(2)))

    raise ValueError(f"malformed .meas directive: {line!r}")


def _crossing_times(t: np.ndarray, v: np.ndarray, level: float,
                    edge: str) -> np.ndarray:
    """All interpolated times where v crosses `level` with the given edge."""
    s = v - level
    sl, sr = s[:-1], s[1:]
    rise = (sl < 0) & (sr >= 0) & (sr != sl)
    fall = (sl > 0) & (sr <= 0) & (sr != sl)
    hit = rise if edge == "rise" else fall if edge == "fall" else rise | fall
    i = np.nonzero(hit)[0]
    if i.size == 0:
        return np.zeros(0)
    frac = -s[i] / (s[i + 1] - s[i])
    return t[i] + frac * (t[i + 1] - t[i])


def _waveform(tran: TranResult, node: str) -> tuple[np.ndarray, np.ndarray]:
    by_upper = {n.upper(): n for n in tran.node_voltages}
    canonical = by_upper.get(node.upper())
    if canonical is None:
        raise ValueError(
            f"Unknown node {node} in .meas (is it filtered out by "
            f".print tran?)")
    return (np.asarray(tran.times, dtype=np.float64),
            np.asarray(tran.node_voltages[canonical], dtype=np.float64))


def evaluate_meas(spec: MeasSpec, tran: TranResult) -> float:
    t, v = _waveform(tran, spec.node)

    if spec.kind in _STAT_KINDS:
        t0 = spec.t_from if spec.t_from is not None else t[0]
        t1 = spec.t_to if spec.t_to is not None else t[-1]
        m = (t >= t0) & (t <= t1)
        if not np.any(m):
            return float("nan")
        tw, vw = t[m], v[m]
        if spec.kind == "max":
            return float(vw.max())
        if spec.kind == "min":
            return float(vw.min())
        if spec.kind == "pp":
            return float(vw.max() - vw.min())
        span = tw[-1] - tw[0]
        if spec.kind == "integ":
            return float(np.trapezoid(vw, tw))
        if span <= 0.0:
            return float(vw[0]) if spec.kind == "avg" else float(abs(vw[0]))
        if spec.kind == "avg":
            return float(np.trapezoid(vw, tw) / span)
        return float(np.sqrt(np.trapezoid(vw ** 2, tw) / span))  # rms

    if spec.kind == "when":
        times = _crossing_times(t, v, spec.val, spec.edge)
        return float(times[spec.k - 1]) if times.size >= spec.k else float("nan")

    if spec.kind == "find":
        if spec.at < t[0] or spec.at > t[-1]:
            return float("nan")
        return float(np.interp(spec.at, t, v))

    # delay: k-th trig crossing to k2-th targ crossing
    trig = _crossing_times(t, v, spec.val, spec.edge)
    t2, v2 = _waveform(tran, spec.node2)
    targ = _crossing_times(t2, v2, spec.val2, spec.edge2)
    if trig.size < spec.k or targ.size < spec.k2:
        return float("nan")
    return float(targ[spec.k2 - 1] - trig[spec.k - 1])


def simulate_meas(ckt, tran: TranResult | None) -> dict[str, float] | None:
    """Evaluate every `.meas tran` line against a finished transient."""
    if not ckt.meas:
        return None
    if tran is None:
        raise ValueError(".meas tran requires a .tran analysis in the netlist")
    return {spec.name: evaluate_meas(spec, tran) for spec in ckt.meas}


# --- batched evaluation over Monte-Carlo variants ---------------------------

def _crossing_time_batch(t: np.ndarray, V: np.ndarray, level: float,
                         edge: str, k: int) -> np.ndarray:
    """k-th crossing time per variant. V: (B, S) -> (B,), NaN if absent."""
    s = V - level
    sl, sr = s[:, :-1], s[:, 1:]
    rise = (sl < 0) & (sr >= 0) & (sr != sl)
    fall = (sl > 0) & (sr <= 0) & (sr != sl)
    hit = rise if edge == "rise" else fall if edge == "fall" else rise | fall
    # first column where the running hit-count reaches k
    kth = (np.cumsum(hit, axis=1) == k) & hit
    found = kth.any(axis=1)
    i = kth.argmax(axis=1)
    b = np.arange(V.shape[0])
    denom = s[b, i + 1] - s[b, i]
    denom = np.where(denom == 0.0, 1.0, denom)
    frac = -s[b, i] / denom
    out = t[i] + frac * (t[i + 1] - t[i])
    return np.where(found, out, np.nan)


def _batch_waveform(batch, node: str) -> np.ndarray:
    names_upper = [n.upper() for n in batch.node_names]
    if node.upper() not in names_upper:
        raise ValueError(f"Unknown node {node} in .meas")
    return np.asarray(batch.node_voltage(node), dtype=np.float64)


def evaluate_meas_batch(spec: MeasSpec, batch) -> np.ndarray:
    """Evaluate one MeasSpec across every variant of a BatchTranResult.

    Returns a (B,) array — the measurement's Monte-Carlo distribution.
    Everything is vectorized numpy over the batch axis; no per-variant
    Python loop, so 10k-variant yield metrics stay O(ms).
    """
    t = np.asarray(batch.times, dtype=np.float64)
    V = _batch_waveform(batch, spec.node)

    if spec.kind in _STAT_KINDS:
        t0 = spec.t_from if spec.t_from is not None else t[0]
        t1 = spec.t_to if spec.t_to is not None else t[-1]
        m = (t >= t0) & (t <= t1)
        if not np.any(m):
            return np.full(V.shape[0], np.nan)
        tw, Vw = t[m], V[:, m]
        if spec.kind == "max":
            return Vw.max(axis=1)
        if spec.kind == "min":
            return Vw.min(axis=1)
        if spec.kind == "pp":
            return Vw.max(axis=1) - Vw.min(axis=1)
        span = tw[-1] - tw[0]
        if spec.kind == "integ":
            return np.trapezoid(Vw, tw, axis=1)
        if span <= 0.0:
            return Vw[:, 0] if spec.kind == "avg" else np.abs(Vw[:, 0])
        if spec.kind == "avg":
            return np.trapezoid(Vw, tw, axis=1) / span
        return np.sqrt(np.trapezoid(Vw ** 2, tw, axis=1) / span)  # rms

    if spec.kind == "when":
        return _crossing_time_batch(t, V, spec.val, spec.edge, spec.k)

    if spec.kind == "find":
        if spec.at < t[0] or spec.at > t[-1]:
            return np.full(V.shape[0], np.nan)
        j = int(np.searchsorted(t, spec.at))
        if j == 0 or t[j] == spec.at:
            return V[:, j]
        frac = (spec.at - t[j - 1]) / (t[j] - t[j - 1])
        return V[:, j - 1] + frac * (V[:, j] - V[:, j - 1])

    trig = _crossing_time_batch(t, V, spec.val, spec.edge, spec.k)
    targ = _crossing_time_batch(t, _batch_waveform(batch, spec.node2),
                                spec.val2, spec.edge2, spec.k2)
    return targ - trig


def meas_batch(ckt, batch) -> dict[str, np.ndarray]:
    """Every `.meas tran` line evaluated across a BatchTranResult's variants:
    the Monte-Carlo distribution of each measurement, ``{name: (B,)}``."""
    if not ckt.meas:
        raise ValueError("netlist has no .meas tran lines")
    return {spec.name: evaluate_meas_batch(spec, batch) for spec in ckt.meas}
