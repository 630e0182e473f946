"""Native (C++) runtime components, loaded via ctypes.

The profile discretizer (``profil.cc``) is the framework's native
data-preparation path — the CKD term loop builds one adaptive profile per
exponential tuple (``src/SOS_PROC.F:3459-3518``), which is sequential
bisection work unsuited to XLA; at large term counts the Python twin in
``profile.py`` dominates setup time.

The shared library is built on demand with ``g++ -O3`` into
``$RTSOS_NATIVE_DIR`` (default: alongside this file, falling back to a
temp dir when the package is read-only).  The artifact name embeds a
content hash of ``profil.cc`` so an edited source can never silently pair
with a stale binary, and a binary from a different source revision is
simply rebuilt.  Absence of a toolchain — or a binary that fails to load
on this platform — degrades gracefully to the Python implementation;
:func:`available` gates every use.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

from .. import constants as cte

_SRC = os.path.join(os.path.dirname(__file__), "profil.cc")
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _Consts(ctypes.Structure):
    _fields_ = [
        ("toa_alt", ctypes.c_double),
        ("delta_z", ctypes.c_double),
        ("t_first", ctypes.c_double),
        ("tcouche", ctypes.c_double),
        ("nt_min", ctypes.c_int),
        ("nt_max", ctypes.c_int),
        ("threshold_tauabs", ctypes.c_double),
        ("threshold_dz", ctypes.c_double),
    ]


def _consts() -> _Consts:
    return _Consts(toa_alt=cte.TOA_ALT, delta_z=cte.DELTA_Z,
                   t_first=cte.TOA_FIRST_LAYER_OPT_THICKNESS,
                   tcouche=cte.TCOUCHE, nt_min=cte.OS_NT_MIN,
                   nt_max=cte.OS_NT,
                   threshold_tauabs=cte.THRESHOLD_TAUABS,
                   threshold_dz=cte.THRESHOLD_DZ)


def _so_path() -> str:
    d = os.environ.get("RTSOS_NATIVE_DIR", os.path.dirname(__file__))
    if not os.access(d, os.W_OK):
        d = os.path.join(tempfile.gettempdir(), "rtsos_native")
        os.makedirs(d, exist_ok=True)
    # Content-hashed artifact name: an edit to profil.cc changes the path,
    # so a stale binary can never be picked up by accident.
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(d, f"libprofil-{tag}.so")


def _build() -> Optional[str]:
    so = _so_path()
    if os.path.exists(so):
        return so
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-pthread",
                        _SRC, "-o", so + ".tmp"],
                       check=True, capture_output=True)
        os.replace(so + ".tmp", so)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("RTSOS_DISABLE_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        # unloadable on this platform (wrong arch/glibc) — Python fallback
        return None
    dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
    lib.rtsos_exp_profile.restype = ctypes.c_int
    lib.rtsos_exp_profile.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(_Consts), dp, dp, dp, dp]
    lib.rtsos_exp_profiles_batch.restype = None
    lib.rtsos_exp_profiles_batch.argtypes = [
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, dp, dp, ctypes.c_int, ctypes.POINTER(_Consts),
        dp, dp, dp, dp, ip]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def exp_profile(tr: float, hr: float, ta: float, ha: float,
                altabs: Optional[np.ndarray] = None,
                tabs: Optional[np.ndarray] = None):
    """Native twin of ``profile.exp_profile_no_gas`` / ``_with_gas``."""
    from ..profile import Profile
    lib = _load()
    if lib is None:
        raise RuntimeError("native profil library unavailable")
    size = cte.OS_NT + 2
    z = np.zeros(size)
    h = np.zeros(size)
    pca = np.zeros(size)
    pcm = np.zeros(size)
    if tabs is None:
        a_ptr = t_ptr = None
        n_abs = 0
    else:
        altabs = np.ascontiguousarray(altabs, dtype=np.float64)
        tabs = np.ascontiguousarray(tabs, dtype=np.float64)
        a_ptr = altabs.ctypes.data_as(ctypes.c_void_p)
        t_ptr = tabs.ctypes.data_as(ctypes.c_void_p)
        n_abs = tabs.shape[0]
    c = _consts()
    nt = lib.rtsos_exp_profile(tr, hr, ta, ha, a_ptr, t_ptr, n_abs,
                               ctypes.byref(c), z, h, pca, pcm)
    if nt < 0:
        raise RuntimeError("native tau->z bisection did not converge")
    return Profile(zprof=z[: nt + 1], h=h[: nt + 1], pcaer=pca[: nt + 1],
                   pcmol=pcm[: nt + 1])


def exp_profiles_batch(tr: float, hr: float, ta: float, ha: float,
                       altabs: np.ndarray, tabs_batch: np.ndarray):
    """One native call building every CKD term's profile."""
    from ..profile import Profile
    z, h, pca, pcm, nts = exp_profiles_batch_arrays(
        tr, hr, ta, ha, altabs, tabs_batch)
    return [Profile(zprof=z[t, : nts[t] + 1], h=h[t, : nts[t] + 1],
                    pcaer=pca[t, : nts[t] + 1], pcmol=pcm[t, : nts[t] + 1])
            for t in range(tabs_batch.shape[0])]


def exp_profiles_batch_arrays(tr: float, hr: float, ta: float, ha: float,
                              altabs: np.ndarray, tabs_batch: np.ndarray):
    """Raw-array variant of :func:`exp_profiles_batch`.

    Returns ``(z, h, pcaer, pcmol, nts)`` with shapes (T, OS_NT+2) and
    (T,) — the hot production path consumes these directly (building
    2000 ``Profile`` objects with per-term slices cost ~0.5 s of a
    spectral sweep's host setup, r5 profile)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native profil library unavailable")
    tabs_batch = np.ascontiguousarray(tabs_batch, dtype=np.float64)
    altabs = np.ascontiguousarray(altabs, dtype=np.float64)
    if not (np.isfinite([tr, hr, ta, ha]).all()
            and np.isfinite(tabs_batch).all() and np.isfinite(altabs).all()):
        # a NaN total thickness reaches C++ (int)(NaN) undefined behavior
        # in the layer counts — fail loudly at the boundary instead
        raise ValueError(
            f"non-finite profile inputs: tr={tr} ta={ta} "
            f"tabs_finite={np.isfinite(tabs_batch).all()}")
    n_terms, n_abs = tabs_batch.shape
    stride = cte.OS_NT + 2
    z = np.zeros((n_terms, stride))
    h = np.zeros((n_terms, stride))
    pca = np.zeros((n_terms, stride))
    pcm = np.zeros((n_terms, stride))
    nts = np.zeros(n_terms, dtype=np.int32)
    c = _consts()
    lib.rtsos_exp_profiles_batch(n_terms, tr, hr, ta, ha, altabs,
                                 tabs_batch, n_abs, ctypes.byref(c),
                                 z.reshape(-1), h.reshape(-1),
                                 pca.reshape(-1), pcm.reshape(-1), nts)
    if np.any(nts < 0):
        raise RuntimeError("native tau->z bisection did not converge")
    return z, h, pca, pcm, nts
