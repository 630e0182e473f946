"""Gas profiles: built-in McClatchey atmospheres and user profiles,
converted to absorber columns (particles/cm^2 per layer).

Re-design of ``DATATM`` + ``TROPICA``..``USTAD62``
(``src/SOS_SUB_TRS.F:908-1827``) and the profile section of
``SOS_PREPA_ABSPROFILE`` (``src/SOS_PREPA_ABSPROFILE.F:430-560``).
The six built-in McClatchey/AFGL standard atmospheres (50 levels x
{alt, P, T, 7 gas ppmv, air density}) are shipped as packaged data
(``data/mcclatchey.npz``); the NO2 profile comes from the ``fic/SO2-NO2``
data file of the reference data root.

Gas index order (everywhere in this package):
H2O, CO2, O3, N2O, CO, CH4, O2, NO2 (``inc/SOS.h`` CTE_NBABS order).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from importlib import resources

import numpy as np

from .. import constants as cte

ATMOSPHERE_NAMES = {1: "TROPICA", 2: "MIDLASU", 3: "MIDLAWI",
                    4: "SUBSUMM", 5: "SUBWINT", 6: "USTAD62"}

# (10 * Avogadro) / (molar mass of air * g): converts dP (mbar) * mass
# mixing ratio into particles/cm^2 (``src/SOS_PREPA_ABSPROFILE.F:363-366``)
ATMOCM = np.array([3.410e22, 1.395e22, 1.279e22, 1.395e22,
                   2.192e22, 3.837e22, 1.918e22, 1.3340e22])
PDSMOL = np.array([18.0, 44.0, 48.0, 44.0, 28.0, 16.0, 32.0, 46.0])

_G_PER_CM2_TO_CM_ATM_O3 = 466.23    # src/SOS_PREPA_ABSPROFILE.F:643
_AVOGADRO = 6.022e23


def data_root() -> str:
    """Reference-compatible data root: $SOS_ABS_ROOT/fic."""
    root = os.environ.get("SOS_ABS_ROOT", "/root/reference")
    return os.path.join(root, "fic")


def _load_builtin(iatm: int):
    # per-process memo (values copied out): every case of a spectral LUT
    # sweep rebuilds its gas columns, and the npz decompression costs
    # ~5 ms per call on the 2-core host
    cols = _load_builtin_cached(iatm)
    return {k: v.copy() for k, v in cols.items()}


@functools.lru_cache(maxsize=8)
def _load_builtin_cached(iatm: int):
    name = ATMOSPHERE_NAMES[iatm]
    path = resources.files("radiativetransfer_sos_tpu") / "data/mcclatchey.npz"
    with resources.as_file(path) as p:
        d = np.load(p)
        cols = {k.split("_", 1)[1]: d[k] for k in d.files
                if k.startswith(name + "_")}
    return cols


@dataclass
class GasColumns:
    """Absorber columns and level data of the absorption profile.

    Levels are ground -> TOA in index order (like the reference's ALTC);
    ``alt_desc`` is the reversed (TOA -> ground) altitude grid consumed by
    the optical-depth profile builder (ALTABS).
    """
    alt: np.ndarray          # (50,) km, ascending
    p: np.ndarray            # (50,) mbar
    t: np.ndarray            # (50,) K
    ro: np.ndarray           # (8, 49) particles/cm^2 per layer (ground-based)
    h2o_ppmv: np.ndarray     # (50,) per-level H2O concentration (ppmv)

    @property
    def alt_desc(self):
        return self.alt[::-1].copy()


def gas_columns(absprofil: int,
                user_profile: np.ndarray | None = None,
                psurf: float = cte.NOT_DEFINED_DBLE,
                h2o: float = cte.NOT_DEFINED_DBLE,
                o3: float = cte.NOT_DEFINED_DBLE,
                co2: float = cte.NOT_DEFINED_DBLE,
                ch4: float = cte.NOT_DEFINED_DBLE,
                no2_profile: np.ndarray | None = None) -> GasColumns:
    """Build absorber columns for one atmosphere.

    ``absprofil``: 0 = user profile (50 x 13 array: level alt P T + gas
    ppmv columns as documented at ``src/SOS_PREPA_ABSPROFILE.F:140-165``),
    1..6 = built-in atmospheres.  User H2O (g/cm^2), O3 (cm.atm; the
    keyword value in Dobson is /1000 upstream), CO2/CH4 surface ppmv
    rescale the default profiles (``src/SOS_PREPA_ABSPROFILE.F:490-560``).
    """
    nlev = cte.ABS_NBLEV
    prof = np.zeros((nlev, 13))

    if absprofil == 0:
        if user_profile is None:
            raise ValueError("absprofil=0 requires user_profile")
        prof[:, :] = np.asarray(user_profile, dtype=np.float64)[:, :13]
    else:
        cols = _load_builtin(absprofil)
        prof[:, 0] = cols["ALT"]
        prof[:, 1] = cols["P"]
        prof[:, 2] = cols["T"]
        prof[:, 3] = cols["ROH2O"]
        prof[:, 4] = cols["ROCO2"]
        prof[:, 5] = cols["ROO3"]
        prof[:, 6] = cols["RON2O"]
        prof[:, 7] = cols["ROCO"]
        prof[:, 8] = cols["ROCH4"]
        prof[:, 9] = cols["ROO2"]
        prof[:, 10] = cols["DENS"]
        if no2_profile is None:
            # fic/SO2-NO2: SO2 column then NO2 column, ground -> TOA
            so2no2 = np.loadtxt(os.path.join(data_root(), "SO2-NO2"))
            prof[:, 12] = so2no2[:, 0]
            prof[:, 11] = so2no2[:, 1]
        else:
            prof[:, 11] = no2_profile

    # surface-pressure rescale (``DATATM``, src/SOS_SUB_TRS.F:929-931,961)
    if psurf > 0.0:
        prof[:, 1] *= psurf / prof[0, 1]

    p = prof[:, 1].copy()
    t = prof[:, 2].copy()
    alt = prof[:, 0].copy()

    # ppmv -> mass mixing ratios (``DATATM``, src/SOS_SUB_TRS.F:983-995)
    ro_lvl = np.zeros((8, nlev))
    roh2o_m = prof[:, 3] * 1.0e-6 * 18.0 / 28.97
    ro_lvl[0] = roh2o_m / (1.0 + roh2o_m)
    ro_lvl[1] = prof[:, 4] * 1.0e-6 * 44.0 / 28.97
    ro_lvl[2] = prof[:, 5] * 1.0e-6 * 48.0 / 28.97
    ro_lvl[3] = prof[:, 6] * 1.0e-6 * 44.0 / 28.97
    ro_lvl[4] = prof[:, 7] * 1.0e-6 * 28.0 / 28.97
    ro_lvl[5] = prof[:, 8] * 1.0e-6 * 16.0 / 28.97
    ro_lvl[6] = prof[:, 9] * 1.0e-6 * 32.0 / 28.97
    # NO2 from column 12 with air molar mass 28.9 like the reference
    # (src/SOS_PREPA_ABSPROFILE.F:469-471)
    ro_lvl[7] = prof[:, 11] * 1.0e-6 * 46.0 / 28.9

    co2_default = ro_lvl[1, 0] * 28.97 / 44.0e-6    # back to ppmv
    ch4_default = ro_lvl[5, 0] * 28.97 / 16.0e-6

    # level mixing ratios -> particles/cm^2 per layer
    # (src/SOS_PREPA_ABSPROFILE.F:480-486)
    dp = p[:-1] - p[1:]
    ro = dp * 0.5 * (ro_lvl[:, :-1] + ro_lvl[:, 1:]) * ATMOCM[:, None]

    h2o_ppmv = prof[:, 3].copy()

    if h2o >= 0.0:
        qh2o = ro[0].sum() / _AVOGADRO * PDSMOL[0]      # g/cm^2
        ro[0] *= h2o / qh2o
        h2o_ppmv *= h2o / qh2o
    if o3 >= 0.0:
        qo3 = ro[2].sum() / _AVOGADRO * PDSMOL[2] * _G_PER_CM2_TO_CM_ATM_O3
        ro[2] *= o3 / qo3
    if co2 >= 0.0:
        ro[1] *= co2 / co2_default
    if ch4 >= 0.0:
        ro[5] *= ch4 / ch4_default

    return GasColumns(alt=alt, p=p, t=t, ro=ro, h2o_ppmv=h2o_ppmv)
