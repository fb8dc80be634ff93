"""Decode voltage series from the reference's snapshot SVGs.

The reference validates transient accuracy against *real ngspice* run via
eecircuit-engine (/root/reference/tests/fixtures/ngspice-transient.ts:12-110)
and records the resulting curves in its SVG snapshots
(/root/reference/tests/transient/__snapshots__/*.snap.svg) as
``simulation-line`` polylines with ~1e-6-pixel coordinate precision. That
makes the snapshots an exact cross-engine oracle available without a JS
runtime: decoding the " (ngspice)" legend series recovers the ngspice
waveforms, and decoding the plain series recovers the reference engine's own
curves (a bit-level parity check on ours).

Pixel -> data mapping comes from the axis tick labels (text elements with
class ``axis-label-x`` / ``axis-label-y``), fitted linearly. The x axis is
in milliseconds (formatToVGraph.ts ms scaling); times are returned in
seconds.
"""

from __future__ import annotations

import re

import numpy as np

_LEGEND = re.compile(r'class="legend-label"[^>]*>([^<]*)<')
_TICK_X = re.compile(
    r'<text class="axis-label axis-label-x" x="([^"]+)"[^>]*>([^<]*)</text>'
)
_TICK_Y = re.compile(
    r'<text class="axis-label axis-label-y" [^>]*y="([^"]+)"[^>]*>([^<]*)</text>'
)
_PATH = re.compile(r'<path[^>]*class="simulation-line"[^>]*>')
_D = re.compile(r'd="([^"]*)"')


def _linear_map(ticks: list[tuple[float, float]]):
    """(pixel, value) pairs -> pixel->value affine map (least squares)."""
    px = np.asarray([p for p, _ in ticks])
    val = np.asarray([v for _, v in ticks])
    A = np.stack([px, np.ones_like(px)], axis=1)
    coef, *_ = np.linalg.lstsq(A, val, rcond=None)
    return lambda p: coef[0] * p + coef[1]


def decode_series(svg_path: str) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Return {legend label: (time_seconds, volts)} for every data series."""
    svg = open(svg_path).read()
    labels = _LEGEND.findall(svg)
    xt = [(float(m.group(1)), float(m.group(2)))
          for m in _TICK_X.finditer(svg)]
    yt = [(float(m.group(1)), float(m.group(2)))
          for m in _TICK_Y.finditer(svg)]
    if not xt or not yt:
        raise ValueError(f"no axis ticks found in {svg_path}")
    x_map = _linear_map(xt)  # pixel -> milliseconds
    y_map = _linear_map(yt)  # pixel -> volts

    series: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    paths = _PATH.findall(svg)
    if len(paths) != len(labels):
        raise ValueError(
            f"{svg_path}: {len(paths)} series paths vs {len(labels)} "
            "legend labels"
        )
    for label, tag in zip(labels, paths):
        d = _D.search(tag).group(1)
        nums = np.asarray(
            [float(tok) for tok in re.findall(r"[-+0-9.eE]+", d)]
        )
        px, py = nums[0::2], nums[1::2]
        series[label] = (x_map(px) * 1e-3, y_map(py))
    return series
