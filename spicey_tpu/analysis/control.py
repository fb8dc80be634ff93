"""ngspice-style ``.control`` script execution (batch mode).

The parser folds analysis commands into the circuit's analysis fields
(``parsing/netlist.py:_absorb_control``); what remains in
``circuit.control`` is the post-processing tail — ``print`` / ``echo`` /
``write`` / ``wrdata`` / ``set`` — which this module executes against the
finished :class:`SimulationResult`. It is deliberately host-side
string/file work: by the time control runs, every vector is a small NumPy
array the engines already pulled back from the device, so there is
nothing here for XLA to accelerate.

The reference has no scripting surface at all (its public API is
``simulate() -> records``, /root/reference/lib/index.ts:1-12); this
exists for ngspice deck compatibility, the same motive as the extended
dialect. Semantics are the useful batch subset, not the full interactive
interpreter:

- ``echo [text]``       — append a line to the control output (quotes
  stripped, ngspice-style).
- ``set key[=value]``   — script settings. Consumed: ``filetype=ascii``
  (``write`` emits ASCII ``Values:`` blocks instead of the binary
  default). Everything else is carried but inert.
- ``print vec ...``     — tabulate vectors from the "current plot": the
  deck's last-run analysis (tran, else ac, else dc, else op —
  ngspice's plot stack ends on the last analysis executed). ``print
  all`` prints every node voltage. Vector specs: ``v(node)``,
  AC accessors ``vm/vdb/vp/vr/vi(node)``, ``i(elem)``, and ngspice's
  ``name#branch`` spelling for source branch currents.
- ``write file [vecs]`` — serialize to an ngspice rawfile via
  ``formatting/rawfile.py`` (all plots; a vector subset is accepted but
  the whole plot is written — rawfile viewers select client-side).
- ``wrdata file vecs``  — whitespace-separated ASCII columns, x-axis
  first, complex vectors as re/im pairs (ngspice wrdata layout).

Relative output paths resolve against ``base_dir`` (the deck's directory
when the CLI drives this) so decks behave the same from any cwd.
"""

from __future__ import annotations

import os
import re

import numpy as np

from .meas import _apply_acc

_VEC_RE = re.compile(r"^(v|vm|vdb|vp|vr|vi|i)\(([^)]+)\)$", re.IGNORECASE)


def _current_plots(result) -> list[tuple[str, object]]:
    """Plots in lookup order: ngspice's current plot is the last analysis
    run, and the deck engines run tran last (analysis/simulate.py)."""
    plots = []
    for kind in ("tran", "ac", "dc", "op"):
        r = getattr(result, kind, None)
        if r is not None:
            plots.append((kind, r))
    return plots


def _axis(kind: str, plot) -> tuple[str, np.ndarray]:
    if kind == "tran":
        return "time", np.asarray(plot.times, np.float64)
    if kind == "ac":
        return "frequency", np.asarray(plot.freqs, np.float64)
    if kind == "dc":
        return "v-sweep", np.asarray(plot.sweep, np.float64)
    return "", np.zeros((1,), np.float64)  # op: single point


def _ci_get(d: dict, name: str):
    by_upper = {k.upper(): k for k in d}
    key = by_upper.get(name.upper())
    return None if key is None else d[key]


def _resolve(result, spec: str):
    """Vector spec -> (label, kind, values) or None. Searches the current
    plot first, then the other plots (lenient — a deck that ran .ac and
    .tran can print both without setplot)."""
    m = _VEC_RE.match(spec)
    branch = None
    if m is None and spec.lower().endswith("#branch"):
        branch = spec[:-len("#branch")]
    for kind, plot in _current_plots(result):
        if m is not None:
            acc, name = m.group(1).lower(), m.group(2)
            if acc == "i" or branch is not None:
                pass
            elif acc != "v" and kind != "ac":
                continue  # vm/vdb/vp/vr/vi are AC accessors
            vals = (_ci_get(plot.element_currents, name) if acc == "i"
                    else _ci_get(plot.node_voltages, name))
            if vals is None:
                continue
            arr = np.asarray(vals)
            if kind == "ac" and acc != "v" and acc != "i":
                arr = _apply_acc(arr, acc)
            return spec, kind, np.atleast_1d(arr)
        name = branch if branch is not None else spec
        vals = _ci_get(plot.element_currents, name)
        if vals is None and branch is None:
            vals = _ci_get(plot.node_voltages, name)
        if vals is not None:
            return spec, kind, np.atleast_1d(np.asarray(vals))
    return None


def _fmt(x) -> str:
    if np.iscomplexobj(x):
        return f"{x.real:.6e},{x.imag:.6e}"
    return f"{float(x):.6e}"


def _print_cmd(result, rest: str) -> list[str]:
    specs = rest.split()
    plots = _current_plots(result)
    if not plots:
        return ["print: no analysis results"]
    cur_kind, cur = plots[0]
    if specs and specs[0].lower() == "all":
        specs = [f"v({n})" for n in cur.node_voltages]
    cols, labels, kinds = [], [], []
    out: list[str] = []
    for spec in specs:
        got = _resolve(result, spec)
        if got is None:
            out.append(f"print: no such vector {spec}")
            continue
        label, kind, vals = got
        labels.append(label)
        kinds.append(kind)
        cols.append(vals)
    if not cols:
        return out
    # group columns by the plot they came from so axes line up
    for kind in dict.fromkeys(kinds):
        sel = [i for i, k in enumerate(kinds) if k == kind]
        plot = dict(plots)[kind]
        x_name, x = _axis(kind, plot)
        if kind == "op" or len(cols[sel[0]]) == 1:
            out.extend(f"{labels[i]} = {_fmt(cols[i][0])}" for i in sel)
            continue
        hdr = ["Index", x_name] + [labels[i] for i in sel]
        out.append("  ".join(f"{h:<15}" for h in hdr).rstrip())
        for j in range(len(x)):
            row = [f"{j:<15d}", f"{x[j]:<15.6e}"]
            row += [f"{_fmt(cols[i][j]):<15}" for i in sel]
            out.append("  ".join(row).rstrip())
    return out


def _wrdata_cmd(result, rest: str, base_dir: str | None) -> str | None:
    toks = rest.split()
    if len(toks) < 2:
        return "wrdata: need a file and at least one vector"
    path = _respath(toks[0], base_dir)
    cols: list[np.ndarray] = []
    missing = []
    for spec in toks[1:]:
        got = _resolve(result, spec)
        if got is None:
            missing.append(spec)
            continue
        _, kind, vals = got
        plot = dict(_current_plots(result))[kind]
        _, x = _axis(kind, plot)
        if len(x) != len(vals):
            x = np.arange(len(vals), dtype=np.float64)
        cols.append(x)
        if np.iscomplexobj(vals):
            cols.append(vals.real.astype(np.float64))
            cols.append(vals.imag.astype(np.float64))
        else:
            cols.append(np.asarray(vals, np.float64))
    if not cols:
        return f"wrdata: no such vector {' '.join(missing)}"
    n = min(len(c) for c in cols)
    with open(path, "w") as fh:
        for j in range(n):
            fh.write(" ".join(f"{c[j]: .12e}" for c in cols) + "\n")
    return (f"wrdata: no such vector {' '.join(missing)}"
            if missing else None)


def _respath(path: str, base_dir: str | None) -> str:
    path = path.strip("\"'")
    if os.path.isabs(path):
        return path
    return os.path.join(base_dir or os.getcwd(), path)


def run_control(result, base_dir: str | None = None) -> str:
    """Execute the post-processing tail of a ``.control`` script against a
    finished SimulationResult; returns the accumulated output text
    (also surfaced as ``SimulationResult.control_output`` and printed by
    the CLI)."""
    circuit = result.circuit
    settings: dict[str, str] = {}
    out: list[str] = []
    for line in circuit.control:
        head, _, rest = line.partition(" ")
        head = head.lower()
        rest = rest.strip()
        if head == "echo":
            out.append(rest.strip("\"'"))
        elif head == "set":
            for tok in rest.split():
                k, _, v = tok.partition("=")
                settings[k.lower()] = v.strip("\"'").lower()
        elif head == "print":
            out.extend(_print_cmd(result, rest))
        elif head == "write":
            toks = rest.split()
            if not toks:
                out.append("write: need a file name")
                continue
            from ..formatting.rawfile import write_rawfile

            write_rawfile(result, _respath(toks[0], base_dir),
                          ascii_values=settings.get("filetype") == "ascii")
        elif head == "wrdata":
            err = _wrdata_cmd(result, rest, base_dir)
            if err:
                out.append(err)
    return "\n".join(out)
