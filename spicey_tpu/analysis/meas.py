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
            if k < 1:
                raise ValueError(
                    f".meas crossing count must be >= 1, got {key}={val}")
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


def _waveform(tran: TranResult, node: str) -> tuple[np.ndarray, np.ndarray]:
    by_upper = {n.upper(): n for n in tran.node_voltages}
    canonical = by_upper.get(node.upper())
    if canonical is None:
        raise ValueError(
            f"Unknown node {node} in .meas (is it filtered out by "
            f".print tran?)")
    return (np.asarray(tran.times, dtype=np.float64),
            np.asarray(tran.node_voltages[canonical], dtype=np.float64))


def _interp_at(x: float, t: np.ndarray, V: np.ndarray) -> np.ndarray:
    """Linear interpolation of (B, S) waveforms at time x (in [t0, tN])."""
    j = int(np.searchsorted(t, x))
    if j >= t.shape[0]:
        return V[:, -1]
    if j == 0 or t[j] == x:
        return V[:, j]
    frac = (x - t[j - 1]) / (t[j] - t[j - 1])
    return V[:, j - 1] + frac * (V[:, j] - V[:, j - 1])


def _window(t: np.ndarray, V: np.ndarray, t_from: float | None,
            t_to: float | None):
    """Clip (B, S) waveforms to [from, to] with interpolated boundary
    samples, so integrals/averages cover the exact requested window even on
    coarse timesteps. Returns (tw, Vw) or (None, None) for an empty window."""
    t0 = t[0] if t_from is None else max(t_from, float(t[0]))
    t1 = t[-1] if t_to is None else min(t_to, float(t[-1]))
    if t1 < t0:
        return None, None
    inside = (t > t0) & (t < t1)
    tw = np.concatenate([[t0], t[inside], [t1]])
    Vw = np.concatenate(
        [_interp_at(t0, t, V)[:, None], V[:, inside],
         _interp_at(t1, t, V)[:, None]], axis=1)
    return tw, Vw


def _crossing_time_batch(t: np.ndarray, V: np.ndarray, level: float,
                         edge: str, k: int,
                         t_min: np.ndarray | None = None) -> np.ndarray:
    """k-th crossing time per variant (counting only crossings strictly
    after each variant's ``t_min``, when given). V: (B, S) -> (B,), NaN if
    the k-th crossing does not exist."""
    s = V - level
    sl, sr = s[:, :-1], s[:, 1:]
    rise = (sl < 0) & (sr >= 0) & (sr != sl)
    fall = (sl > 0) & (sr <= 0) & (sr != sl)
    hit = rise if edge == "rise" else fall if edge == "fall" else rise | fall
    denom = sr - sl
    denom = np.where(denom == 0.0, 1.0, denom)
    tc = t[:-1] + (-sl / denom) * (t[1:] - t[:-1])  # (B, S-1) crossing times
    if t_min is not None:
        # drop crossings strictly before t_min (a targ event simultaneous
        # with its trig counts — zero delay is a valid measurement; the
        # tolerance absorbs interpolation round-off between two
        # mathematically coincident crossings). NaN t_min filters nothing,
        # but the caller's targ-trig arithmetic propagates the NaN anyway
        tol = (t[-1] - t[0]) * 1e-9
        hit = hit & ~(tc < t_min[:, None] - tol)
    # first column where the running hit-count reaches k
    kth = (np.cumsum(hit, axis=1) == k) & hit
    found = kth.any(axis=1)
    i = kth.argmax(axis=1)
    b = np.arange(V.shape[0])
    return np.where(found, tc[b, i], np.nan)


def _batch_waveform(batch, node: str) -> np.ndarray:
    names_upper = [n.upper() for n in batch.node_names]
    if node.upper() not in names_upper:
        raise ValueError(f"Unknown node {node} in .meas")
    return np.asarray(batch.node_voltage(node), dtype=np.float64)


def _evaluate_rows(spec: MeasSpec, t: np.ndarray, V: np.ndarray,
                   V2: np.ndarray | None) -> np.ndarray:
    """The one evaluation kernel: (B, S) waveforms -> (B,) measurements.
    The scalar path runs it with B=1, so single and batched measurements
    can never disagree."""
    if spec.kind in _STAT_KINDS:
        tw, Vw = _window(t, V, spec.t_from, spec.t_to)
        if tw is None:
            return np.full(V.shape[0], np.nan)
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
        return _interp_at(spec.at, t, V)

    # delay: k-th trig crossing, then the k2-th targ crossing AFTER it
    trig = _crossing_time_batch(t, V, spec.val, spec.edge, spec.k)
    targ = _crossing_time_batch(t, V2, spec.val2, spec.edge2, spec.k2,
                                t_min=trig)
    return targ - trig


def evaluate_meas(spec: MeasSpec, tran: TranResult) -> float:
    t, v = _waveform(tran, spec.node)
    v2 = (_waveform(tran, spec.node2)[1][None, :]
          if spec.kind == "delay" else None)
    return float(_evaluate_rows(spec, t, v[None, :], v2)[0])


def simulate_meas(ckt, tran: TranResult | None) -> dict[str, float] | None:
    """Evaluate every `.meas tran` line against a finished transient."""
    if not ckt.meas:
        return None
    if tran is None:
        raise ValueError(".meas tran requires a .tran analysis in the netlist")
    return {spec.name: evaluate_meas(spec, tran) for spec in ckt.meas}


# --- batched evaluation over Monte-Carlo variants ---------------------------

def evaluate_meas_batch(spec: MeasSpec, batch) -> np.ndarray:
    """Evaluate one MeasSpec across every variant of a BatchTranResult.

    Returns a (B,) array — the measurement's Monte-Carlo distribution.
    Everything is vectorized numpy over the batch axis; no per-variant
    Python loop, so 10k-variant yield metrics stay O(ms).
    """
    t = np.asarray(batch.times, dtype=np.float64)
    V = _batch_waveform(batch, spec.node)
    V2 = _batch_waveform(batch, spec.node2) if spec.kind == "delay" else None
    return _evaluate_rows(spec, t, V, V2)


def meas_batch(ckt, batch) -> dict[str, np.ndarray]:
    """Every `.meas tran` line evaluated across a BatchTranResult's variants:
    the Monte-Carlo distribution of each measurement, ``{name: (B,)}``."""
    if not ckt.meas:
        raise ValueError("netlist has no .meas tran lines")
    return {spec.name: evaluate_meas_batch(spec, batch) for spec in ckt.meas}
