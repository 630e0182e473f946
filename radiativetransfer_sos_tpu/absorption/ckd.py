"""Correlated-k distribution (CKD) table loader.

Re-design of ``READ_CKD_COEFF`` (``src/SOS_SUB_TRS.F:481``): parses the
``fic/COEFF_CKD/<step>cmm1/coef_<GAS>_<numax>_<numin>_<step>cmm1`` ASCII
tables (format documented in each file's header) into dense numpy arrays.
One loaded ``CkdTables`` covers the 50-wavenumber window containing the
simulation wavenumber; the band index ``lamb`` mirrors the reference's
LAMB1 = 1 + int((numax-nu)/step) (``src/SOS_PREPA_ABSPROFILE.F:578``),
expressed 0-based here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from .. import constants as cte
from .atmospheres import data_root

GAS_FILE_PREFIX = ("H2O", "CO2", "O3", "N2O", "CO", "CH4", "O2", "NO2")


@dataclass
class CkdTables:
    """CKD expansion data for one spectral window and all 8 gases.

    Shapes: ``nexp`` (8, nwvl); ``ai`` (nai, 8, nwvl);
    ``ki`` (nt, np_, nai, 8, nwvl) for gases != H2O;
    ``ki_h2o`` (nt, np_, nc, nai, nwvl).
    Missing species (not simulated or no table) behave like the
    reference's JABS=0 branch: one exponential, ai=1, ki=0
    (``src/SOS_SUB_TRS.F:586-614``).
    """
    numax: float
    numin: float
    step: float
    temps: np.ndarray
    pres: np.ndarray
    conc_h2o: np.ndarray
    nexp: np.ndarray
    ai: np.ndarray
    ki: np.ndarray
    ki_h2o: np.ndarray
    missing: list = field(default_factory=list)

    def band_index(self, nu: float) -> int:
        """0-based band index of wavenumber ``nu`` (reference LAMB1 - 1).

        Clamped to the last band: a wavenumber exactly on the file's
        lower bound belongs to the final block (its min wavenumber,
        e.g. block "13051 13050" of ``coef_O2_13100_13050``)."""
        nwvl = int((self.numax - self.numin) / self.step)
        return min(int((self.numax - nu) / self.step), nwvl - 1)


def ckd_file_bounds(nu: float, step: int):
    """Wavenumber bounds of the file covering ``nu``
    (``src/SOS_SUB_TRS.F:655-660``)."""
    span = cte.CKD_NB_NU_PER_FILE * step
    numin_file = cte.CKD_NUMAX - span
    while numin_file > nu:
        numin_file -= span
    return numin_file + span, numin_file


def _parse_gas_file(path: str, is_h2o: bool):
    with open(path) as f:
        lines = f.read().split("\n")
    li = 21 if is_h2o else 18        # header lines (src/SOS_SUB_TRS.F:698-704)

    def take():
        nonlocal li
        row = lines[li].split()
        li += 1
        return row

    numax, numin, res = (float(v) for v in take())
    nt = int(take()[0])
    temps = np.array([float(v) for v in take()], dtype=np.float64)
    assert temps.shape == (nt,)
    npres = int(take()[0])
    pres = np.array([float(v) for v in take()], dtype=np.float64)
    assert pres.shape == (npres,)
    conc = np.zeros(0)
    nc = 1
    if is_h2o:
        nc = int(take()[0])
        conc = np.array([float(v) for v in take()], dtype=np.float64)
        assert conc.shape == (nc,)

    nwvl = int((numax - numin) / res)
    nai_max = cte.CKD_NAI_MAX
    nexp = np.ones(nwvl, dtype=np.int64)
    ai = np.zeros((nai_max, nwvl))
    ai[0] = 1.0
    ki = np.zeros((nt, npres, nc, nai_max, nwvl))
    for iwa in range(nwvl):
        head = take()
        nmaxai = int(head[5])
        if nmaxai == 0:
            continue                 # transparent band: ai=1, ki=0
        nexp[iwa] = nmaxai
        ai[:nmaxai, iwa] = [float(v) for v in take()[:nmaxai]]
        for nai in range(nmaxai):
            for ic in range(nc):
                for ip in range(npres):
                    row = take()
                    off = 3 if is_h2o else 2
                    ki[:, ip, ic, nai, iwa] = [float(v)
                                               for v in row[off:off + nt]]
    return dict(numax=numax, numin=numin, res=res, temps=temps, pres=pres,
                conc=conc, nexp=nexp, ai=ai, ki=ki)


def load_ckd(nu: float, step: int, gases_on: np.ndarray | None = None,
             root: str | None = None,
             allow_missing: bool = False) -> CkdTables:
    """Load the CKD tables of all 8 gases for the window containing ``nu``.

    ``gases_on``: 8 booleans mirroring the CTE_ABS_* compile flags (all on
    by default, matching ``inc/SOS.h:245-268``).  A species selected for
    simulation whose data file is absent from the data root is a HARD ERROR
    by default, matching the reference abort on a failed table open
    (``src/SOS_SUB_TRS.F:706-707``, ``ERR=910``; only not-simulated species
    fall back to the transparent JABS=0 branch, ``:586-614``).  This data
    snapshot lacks some large H2O files (``.MISSING_LARGE_BLOBS``);
    ``allow_missing=True`` is the explicit escape hatch that records the
    species in ``missing`` and treats it as transparent instead.
    """
    if step not in (1, 5, 10):
        raise ValueError("CKD step must be 1, 5 or 10 cm-1")
    if not (cte.CKD_NUMIN <= nu <= cte.CKD_NUMAX):
        raise ValueError(f"wavenumber {nu} outside CKD domain")
    if gases_on is None:
        gases_on = np.ones(8, dtype=bool)
    root = root or data_root()

    numax_f, numin_f = ckd_file_bounds(nu, step)
    nwvl = cte.CKD_NB_NU_PER_FILE
    nai_max = cte.CKD_NAI_MAX

    nexp = np.ones((8, nwvl), dtype=np.int64)
    ai = np.zeros((nai_max, 8, nwvl))
    ai[0] = 1.0
    ki = np.zeros((cte.CKD_NT_MAX, cte.CKD_NP_MAX, nai_max, 8, nwvl))
    ki_h2o = np.zeros((cte.CKD_NT_MAX, cte.CKD_NP_MAX, cte.CKD_NC_MAX,
                       nai_max, nwvl))
    temps = pres = conc = None
    missing = []

    for g in range(8):
        if not gases_on[g]:
            continue
        name = (f"coef_{GAS_FILE_PREFIX[g]}_{numax_f}_{numin_f}_"
                f"{step}cmm1")
        path = os.path.join(root, "COEFF_CKD", f"{step}cmm1", name)
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            if not allow_missing:
                raise FileNotFoundError(
                    f"CKD table for simulated gas {GAS_FILE_PREFIX[g]} "
                    f"absent or empty: {path} (the reference aborts on a "
                    "missing table, src/SOS_SUB_TRS.F:706-707; pass "
                    "allow_missing=True to treat the gas as transparent)")
            missing.append(GAS_FILE_PREFIX[g])
            continue
        d = _parse_gas_file(path, is_h2o=(g == 0))
        nt, npres = d["temps"].shape[0], d["pres"].shape[0]
        temps, pres = d["temps"], d["pres"]
        nexp[g] = d["nexp"]
        ai[:, g, :] = d["ai"]
        if g == 0:
            nc = d["conc"].shape[0]
            conc = d["conc"]
            ki_h2o[:nt, :npres, :nc] = d["ki"].transpose(0, 1, 2, 3, 4)[
                :, :, :, :, :]
        else:
            ki[:nt, :npres, :, g, :] = d["ki"][:, :, 0, :, :]

    if temps is None:
        raise FileNotFoundError(
            f"no CKD data found under {root} for window "
            f"[{numin_f},{numax_f}] at {step} cm-1")
    if conc is None:
        conc = np.array([0.0, 1.0])
    return CkdTables(numax=float(numax_f), numin=float(numin_f),
                     step=float(step), temps=temps, pres=pres,
                     conc_h2o=conc, nexp=nexp, ai=ai, ki=ki,
                     ki_h2o=ki_h2o, missing=missing)
