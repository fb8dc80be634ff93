"""DC small-signal transfer function (.tf) — an extension.

The reference has no `.tf` (nor any DC analysis; SURVEY §2.9). This mirrors
ngspice's `.tf v(out[,ref]) <src>`: solve the DC operating point, linearize
every nonlinear device there, and report

  - ``transfer_function``  dV(out)/d(input)  (V/V for a V-source input,
    V/A for an I-source input),
  - ``input_impedance``    resistance seen by the input source,
  - ``output_impedance``   resistance seen looking into the output port.

The linearized system reuses the `.op` unknown ordering (nodes, V/E/H
branches, then 0 V inductor-short branches — op.py) and the same stamp
kernels; both right-hand sides (unit input excitation, unit output current
probe) solve against one factorization-sized batched call, so the whole
analysis is two tiny solves on top of the operating point.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPS
from ..ir.circuit import CircuitTensors, build_tensors
from ..ops.linsolve import solve

from ..parsing.netlist import ParsedCircuit
from .ac import find_input_source, format_out_spec, small_signal_rows
from .op import _op_indices, simulate_op

# jitted solve: called EAGERLY its internal elimination loop would
# re-trace on every .tf call (~0.3 s warm measured) — the interactive
# path's cost must be the arithmetic, not the tracer
_solve_jit = jax.jit(solve, static_argnames=("method",))


@dataclass
class TFResult:
    transfer_function: float
    input_impedance: float
    output_impedance: float
    out_spec: str
    src_name: str


def _node_matrix_index(ckt: ParsedCircuit, name: str, dump: int) -> int:
    node_id = ckt.nodes.get(name)
    if node_id is None:
        raise ValueError(f"Unknown node {name} in .tf output spec")
    return dump if node_id == 0 else node_id - 1


def simulate_tf(
    ckt: ParsedCircuit,
    tensors: CircuitTensors | None = None,
    method: str = "gj",
    op=None,
) -> TFResult | None:
    """Run the `.tf` analysis (None if the netlist has no .tf line).
    ``op`` optionally reuses an already-solved operating point."""
    if ckt.tf is None:
        return None
    if tensors is None:
        tensors = build_tensors(ckt)

    spec = ckt.tf
    if op is None:
        op = simulate_op(ckt, tensors=tensors, method=method)
    nvar_op, remap, l_bidx, v_idx_op = _op_indices(tensors)
    dump = nvar_op

    out_p = _node_matrix_index(ckt, spec.out_pos, dump)
    out_n = (_node_matrix_index(ckt, spec.out_neg, dump)
             if spec.out_neg is not None else dump)

    # locate the input source: a V source (branch excitation) or an
    # extended-dialect I source (nodal injection)
    v_pos, i_pos = find_input_source(tensors, spec.src, ".tf")

    # linearized DC conductance matrix at the operating point —
    # assembled HOST-SIDE in NumPy: the operands are all host data and
    # eager jnp scatter-adds cost ~1.4 ms EACH in dispatch overhead
    # (measured 68 ms/call for this one matrix); only the solve runs
    # as a compiled program
    A = np.zeros((nvar_op + 1, nvar_op + 1))

    def adm(idx, y):
        np.add.at(A, (idx[:, 0], idx[:, 0]), y)
        np.add.at(A, (idx[:, 1], idx[:, 1]), y)
        np.add.at(A, (idx[:, 0], idx[:, 1]), -y)
        np.add.at(A, (idx[:, 1], idx[:, 0]), -y)

    def vrows(idx):
        # voltage-source ±1 node/branch couplings (0 V small-signal)
        one = np.ones(idx.shape[0])
        np.add.at(A, (idx[:, 0], idx[:, 2]), one)
        np.add.at(A, (idx[:, 2], idx[:, 0]), one)
        np.add.at(A, (idx[:, 1], idx[:, 2]), -one)
        np.add.at(A, (idx[:, 2], idx[:, 1]), -one)

    def vccs(idx, gm):
        np.add.at(A, (idx[:, 0], idx[:, 2]), gm)
        np.add.at(A, (idx[:, 0], idx[:, 3]), -gm)
        np.add.at(A, (idx[:, 1], idx[:, 2]), -gm)
        np.add.at(A, (idx[:, 1], idx[:, 3]), gm)

    adm(remap(tensors.r_idx), 1.0 / tensors.r_vals)
    # V sources and L shorts contribute their branch rows with 0 V —
    # all independent sources are zeroed for small-signal solves
    vrows(l_bidx)
    vrows(v_idx_op)
    # linear extended controlled sources (G/E/F/H)
    if tensors.n_g:
        vccs(np.where(tensors.g_idx == tensors.nvar, dump,
                      tensors.g_idx), tensors.g_gm)
    if tensors.n_e:
        ei = np.where(tensors.e_idx == tensors.nvar, dump,
                      tensors.e_idx)
        vrows(ei[:, :3])
        np.add.at(A, (ei[:, 2], ei[:, 3]), -tensors.e_gain)
        np.add.at(A, (ei[:, 2], ei[:, 4]), tensors.e_gain)
    if tensors.n_f:
        fi = np.where(tensors.f_idx == tensors.nvar, dump,
                      tensors.f_idx)
        np.add.at(A, (fi[:, 0], fi[:, 2]), tensors.f_gain)
        np.add.at(A, (fi[:, 1], fi[:, 2]), -tensors.f_gain)
    if tensors.n_h:
        hi = np.where(tensors.h_idx == tensors.nvar, dump,
                      tensors.h_idx)
        vrows(hi[:, :3])
        np.add.at(A, (hi[:, 2], hi[:, 3]), -tensors.h_r)
    # nonlinear devices (diode/switch/MOSFET/BJT) as small-signal VCCS
    ss_idx, ss_g = small_signal_rows(tensors, op)
    vccs(remap(ss_idx), ss_g)
    if ckt.B:
        # behavioral sources linearize at the op point: I-kind as VCCS
        # rows (dI/dvref), V-kind as their branch row with gradient
        # couplings (dV/dvref) — same decomposition the Newton loop uses.
        # The eager jvp dispatches pin to the host CPU (tiny work)
        from ..utils.placement import exec_device as _exec_device

        from ..ir.circuit import bsrc_static

        x_pad_np = np.zeros(nvar_op + 1)
        for i, name in enumerate(tensors.node_names):
            x_pad_np[i] = op.node_voltages[name]
        with _exec_device(1.0):
            for kind, fn, i1, i2, br, refs in bsrc_static(ckt, nvar_op):
                v0 = jnp.asarray([x_pad_np[a] - x_pad_np[b]
                                  for a, b in refs])
                gs = []
                for j in range(len(refs)):
                    e = jnp.zeros_like(v0).at[j].set(1.0)
                    _, gj = jax.jvp(lambda vv: fn(vv, 0.0), (v0,), (e,))
                    gs.append(float(gj))
                if kind == "i":
                    for (a, b2), g in zip(refs, gs):
                        vccs(np.asarray([[i1, i2, a, b2]]), np.asarray([g]))
                else:
                    A[i1, br] += 1.0
                    A[i2, br] -= 1.0
                    A[br, i1] += 1.0
                    A[br, i2] -= 1.0
                    for (a, b2), g in zip(refs, gs):
                        A[br, a] -= g
                        A[br, b2] += g
    A = A[:nvar_op, :nvar_op]  # host np; converted only on the jit path

    # RHS 1: unit input excitation (all other sources stay zeroed)
    b_in = np.zeros(nvar_op + 1)
    if v_pos is not None:
        in_branch = int(tensors.v_idx[v_pos, 2])
        b_in[in_branch] = 1.0
    else:
        i1, i2 = (int(x) for x in remap(tensors.i_idx)[i_pos])
        b_in[i1] -= 1.0
        b_in[i2] += 1.0
    # RHS 2: unit current probe into the output port
    b_out = np.zeros(nvar_op + 1)
    b_out[out_p] += 1.0
    b_out[out_n] -= 1.0

    rhs_np = np.stack([b_in[:nvar_op], b_out[:nvar_op]])
    from ..utils.placement import exec_device, is_tiny_work
    from .interp import _ge_solve, interp_enabled

    _work = 2400.0 * nvar_op ** 3
    if method == "gj" and is_tiny_work(_work) and interp_enabled():
        # tiny .tf: host NumPy GE — with the op point also interp-eligible
        # the whole analysis never touches jax
        aug = np.concatenate(
            [np.broadcast_to(A, (2,) + A.shape).copy(),
             rhs_np[:, :, None]], axis=2)
        xs, ok_all = _ge_solve(aug)
        if not ok_all:
            raise ValueError("Singular matrix in .tf small-signal solve")
        x_pad = np.concatenate([xs, np.zeros((2, 1))], axis=1)
    else:
        # structured BBD tier (ops/schur.py): the op-linearized system
        # lives in op space (nodes + branches + L shorts), so the op plan
        # applies; dense retry on block-pivot failure
        plan = None
        if method == "schur" or (method == "gj" and nvar_op > 128):
            from ..ops.schur import plan_partition_op

            _plan_obj = plan_partition_op(ckt, tensors)
            if _plan_obj is not None:
                plan = _plan_obj.arrays()
            elif method == "schur":
                raise ValueError(
                    "method='schur' requires block structure "
                    "(subcircuit instances) the circuit does not have")

        def _tf_solve(plan_arrays):
            with exec_device(_work):
                x, ok = _solve_jit(
                    jnp.broadcast_to(jnp.asarray(A), (2,) + A.shape),
                    jnp.asarray(rhs_np),
                    method="gj" if method == "schur" else method,
                    plan=plan_arrays)
                return np.asarray(jnp.concatenate(
                    [x, ok[:, None].astype(x.dtype)], axis=1))

        packed = _tf_solve(plan)
        if plan is not None and not bool(np.all(packed[:, -1] > 0.5)):
            packed = _tf_solve(None)
        if not bool(np.all(packed[:, -1] > 0.5)):
            raise ValueError("Singular matrix in .tf small-signal solve")
        x_pad = np.concatenate([packed[:, :nvar_op],
                                np.zeros((2, 1))], axis=1)  # dump slot = 0

    gain = float(x_pad[0, out_p] - x_pad[0, out_n])
    if v_pos is not None:
        # recorded branch current flows INTO the + terminal; the circuit
        # draws -i_branch from a 1 V excitation
        i_branch = x_pad[0, in_branch]
        r_in = float("inf") if abs(i_branch) < EPS else float(-1.0 / i_branch)
    else:
        i1, i2 = (int(v) for v in remap(tensors.i_idx)[i_pos])
        r_in = float(x_pad[0, i2] - x_pad[0, i1])
    r_out = float(x_pad[1, out_p] - x_pad[1, out_n])

    out_spec = format_out_spec(spec.out_pos, spec.out_neg)
    return TFResult(transfer_function=gain, input_impedance=r_in,
                    output_impedance=r_out, out_spec=out_spec,
                    src_name=spec.src)
