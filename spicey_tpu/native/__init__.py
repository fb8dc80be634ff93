"""Native (C) fast paths for the host interp tier.

The interp tier's job is interactive latency: answer one small netlist
NOW, with zero accelerator involvement. Python/NumPy per-iteration
overhead (~150 us per Newton pass) is the binding constraint there, so
the stepped Newton transient loop has a C implementation
(``interp_core.c``) that runs the whole transient in one call.

Build model: compiled ON DEMAND with the system C compiler into a
user-cache directory keyed by the source hash (so editing the .c file
invalidates cleanly), loaded via ctypes. No pybind11, no build-time
requirement — environments without a C compiler (or with
``SPICEY_TPU_NATIVE=0``) silently use the NumPy loop, which remains the
semantic reference (tests pin C-vs-NumPy equivalence at 1e-9).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "interp_core.c")
_lib = None
_lib_tried = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "spicey_tpu")


def _build() -> str | None:
    cc = (os.environ.get("CC") or shutil.which("cc")
          or shutil.which("gcc") or shutil.which("clang"))
    if cc is None:
        return None
    try:
        with open(_SRC, "rb") as fh:
            src = fh.read()
    except OSError:
        return None
    key = hashlib.sha256(src).hexdigest()[:16]
    out_dir = _cache_dir()
    so_path = os.path.join(out_dir, f"interp_core_{key}.so")
    if os.path.exists(so_path):
        return so_path
    try:
        os.makedirs(out_dir, exist_ok=True)
        # build to a temp name then rename: concurrent processes racing
        # the same cache entry each land a complete file
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=out_dir)
        os.close(fd)
        res = subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC, "-lm"],
            capture_output=True, timeout=120)
        if res.returncode != 0:
            os.unlink(tmp)
            return None
        os.replace(tmp, so_path)
        return so_path
    except (OSError, subprocess.SubprocessError):
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("SPICEY_TPU_NATIVE", "1") == "0":
        return None
    so_path = _build()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
        fn = lib.spicey_interp_tran_nl
        fn.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _dp(a: np.ndarray) -> object:
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a: np.ndarray) -> object:
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _bp(a: np.ndarray) -> object:
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def interp_tran_nl_native(args: dict) -> tuple | None:
    """Run the C transient loop; None if the library is unavailable.

    ``args`` carries the already-marshaled arrays (see the caller in
    analysis/interp.py for the contract). Returns (xs, sw_states, ok).
    """
    lib = _load()
    if lib is None:
        return None

    n = args["n"]
    steps_p1 = args["steps_p1"]
    n_s = args["s_idx"].shape[0]
    xs = np.zeros((steps_p1, n))
    sw = np.zeros((steps_p1, max(n_s, 1)), np.uint8)

    c64 = lambda a: np.ascontiguousarray(a, np.float64)
    c32 = lambda a: np.ascontiguousarray(a, np.int32)

    A_base = c64(args["A_base"])
    v_branch = c32(args["v_branch"])
    i_idx = c32(args["i_idx"])
    vs_grid = c64(args["vs_grid"])
    c_idx = c32(args["c_idx"])
    gc = c64(args["gc"])
    l_idx = c32(args["l_idx"])
    gl = c64(args["gl"])
    gamma = c64(args["gamma"]) if args["gamma"] is not None \
        else np.zeros(0)
    s_idx = c32(args["s_idx"])
    s_g_on = c64(args["s_g_on"])
    s_g_off = c64(args["s_g_off"])
    s_von = c64(args["s_von"])
    s_voff = c64(args["s_voff"])
    d_idx = c32(args["d_idx"])
    d_is = c64(args["d_is"])
    d_vth = c64(args["d_vth"])
    dchg = args["dchg"]
    d_tt = c64(dchg["tt"]) if dchg else np.zeros(0)
    d_cjo = c64(dchg["cjo"]) if dchg else np.zeros(0)
    d_vj = c64(dchg["vj"]) if dchg else np.zeros(0)
    d_m = c64(dchg["m"]) if dchg else np.zeros(0)
    d_fc = c64(dchg["fc"]) if dchg else np.zeros(0)
    m_idx = c32(args["m_idx"])
    m_beta = c64(args["m_beta"])
    m_vto = c64(args["m_vto"])
    m_lam = c64(args["m_lam"])
    m_pol = c64(args["m_pol"])
    q_idx = c32(args["q_idx"])
    q_is = c64(args["q_is"])
    q_bf = c64(args["q_bf"])
    q_br = c64(args["q_br"])
    q_pol = c64(args["q_pol"])
    qchg = args["qchg"]
    qchg_arr = c64(qchg) if qchg is not None else np.zeros(0)
    t_idx = c32(args["t_idx"])
    t_z0 = c64(args["t_z0"])
    td_steps = c64(args["td_steps"])
    v_prev0 = c64(args["v_prev0"])
    i_prev0 = c64(args["i_prev0"])

    ok = lib.spicey_interp_tran_nl(
        ctypes.c_int(n), ctypes.c_int(steps_p1),
        ctypes.c_double(args["dt_c"]), ctypes.c_int(args["max_nr"]),
        ctypes.c_int(1 if args["converged"] else 0),
        ctypes.c_double(args["tol_eff"]),
        _dp(A_base),
        ctypes.c_int(v_branch.shape[0]), _ip(v_branch),
        ctypes.c_int(i_idx.shape[0]), _ip(i_idx),
        _dp(vs_grid),
        ctypes.c_int(c_idx.shape[0]), _ip(c_idx), _dp(gc),
        ctypes.c_int(l_idx.shape[0]), _ip(l_idx), _dp(gl),
        ctypes.c_int(1 if args["gamma"] is not None else 0), _dp(gamma),
        ctypes.c_int(n_s), _ip(s_idx), _dp(s_g_on), _dp(s_g_off),
        _dp(s_von), _dp(s_voff),
        ctypes.c_int(d_idx.shape[0]), _ip(d_idx), _dp(d_is), _dp(d_vth),
        ctypes.c_double(args["d_vmin"]), ctypes.c_double(args["d_vmax"]),
        ctypes.c_int(1 if dchg else 0), _dp(d_tt), _dp(d_cjo),
        _dp(d_vj), _dp(d_m), _dp(d_fc),
        ctypes.c_int(m_idx.shape[0]), _ip(m_idx), _dp(m_beta),
        _dp(m_vto), _dp(m_lam), _dp(m_pol),
        ctypes.c_int(q_idx.shape[0]), _ip(q_idx), _dp(q_is), _dp(q_bf),
        _dp(q_br), _dp(q_pol), ctypes.c_double(args["q_vt"]),
        ctypes.c_int(1 if qchg is not None else 0), _dp(qchg_arr),
        ctypes.c_int(t_idx.shape[0]), _ip(t_idx), _dp(t_z0),
        _dp(td_steps), ctypes.c_int(args["hist_len"]),
        _dp(v_prev0), _dp(i_prev0),
        _dp(xs), _bp(sw),
    )
    return xs, sw[:, :n_s].astype(bool), bool(ok)
