"""Typed run configuration mirroring the reference keyword surface.

The reference drives everything through ~90 ``-Section.Name value`` CLI
keywords (catalogue ``src/SOS_ABS_MAIN.F:236-911``) passed positionally
into ``SOS_PROC`` (``src/SOS_PROC.F:415-481``).  Here the same parameter
set is a group of dataclasses; the keyword-string migration shim
(``api.sos_proc``) maps the original names onto these fields so reference
configurations port one-to-one.

Sentinel ``-999``/``-999.0`` keeps the reference's "unset" convention
(``inc/SOS.h:76-78``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import constants as cte

UNSET = cte.NOT_DEFINED_DBLE
UNSET_I = cte.NOT_DEFINED_INT


@dataclass
class AngleConfig:
    """-ANG.* keywords (``src/SOS_ABS_MAIN.F:318-356``)."""
    nbmu_lum: int = cte.DEFAULT_NBMU_LUM     # -ANG.Rad.NbGauss
    nbmu_mie: int = cte.DEFAULT_NBMU_MIE     # -ANG.Aer.NbGauss
    user_rad_deg: np.ndarray | None = None   # -ANG.Rad.UserAngFile content
    user_mie_deg: np.ndarray | None = None   # -ANG.Aer.UserAngFile content
    thetas_deg: float = 0.0                  # -ANG.Thetas


@dataclass
class MonoModalAerosol:
    """IMOD=0: mono-modal size distribution (-AER.MMD.*)."""
    sdtype: int = 1                  # 1 = log-normal, 2 = Junge
    lnd_radius: float = UNSET        # -AER.MMD.LNDradius (microns)
    lnd_var: float = UNSET           # -AER.MMD.LNDvar (ln sigma)
    junge_slope: float = UNSET       # -AER.MMD.JD.slope
    junge_rmin: float = 1.0e-3       # covered by the alpha sweep lower bound
    junge_rmax: float = cte.DEFAULT_AER_JUNGE_RMAX
    mr_wa: float = UNSET             # -AER.MMD.MRwa  (real index at wa)
    mi_wa: float = UNSET             # -AER.MMD.MIwa
    mr_waref: float = UNSET          # index at the AOT reference wavelength
    mi_waref: float = UNSET


@dataclass
class BiModalAerosol:
    """IMOD=3: bimodal log-normal (-AER.BMD.*)."""
    mode_param: int = 1              # 1 = user cv fractions, 2 = tauRatio
    cv_fine: float = UNSET
    cv_coarse: float = UNSET
    rtau_fine_waref: float = UNSET   # ratio AOTfine/AOTtotal at waref
    fm_rmodal: float = UNSET
    fm_var: float = UNSET
    fm_mr_wa: float = UNSET
    fm_mi_wa: float = UNSET
    fm_mr_waref: float = UNSET
    fm_mi_waref: float = UNSET
    cm_rmodal: float = UNSET
    cm_var: float = UNSET
    cm_mr_wa: float = UNSET
    cm_mi_wa: float = UNSET
    cm_mr_waref: float = UNSET
    cm_mi_waref: float = UNSET


@dataclass
class AerosolConfig:
    """-AER.* keywords (``src/SOS_ABS_MAIN.F:420-640``)."""
    aot_ref: float = 0.0             # -AER.AOTref at waref
    waref: float = UNSET             # -AER.Waref (microns)
    model: int = UNSET_I             # -AER.Model (IMOD 0..5)
    tronca: bool = True              # -AER.Tronca
    mm: MonoModalAerosol = field(default_factory=MonoModalAerosol)
    bmd: BiModalAerosol = field(default_factory=BiModalAerosol)
    wmo_model: int = UNSET_I         # -AER.WMO.Model (1 C, 2 M, 3 U, 4 user)
    wmo_dl: float = UNSET            # user WMO volume fractions
    wmo_ws: float = UNSET
    wmo_oc: float = UNSET
    wmo_so: float = UNSET
    sf_model: int = UNSET_I          # -AER.SF.Model (1..4)
    sf_rh: float = UNSET             # -AER.SF.RH (%)
    external_file: str | None = None  # -AER.ExtData
    mixture_file: str | None = None   # IMOD=5 user mixture
    alpha_cap: float | None = None    # testing override: bound Mie sweeps


@dataclass
class SurfaceConfig:
    """-SURF.* keywords (``src/SOS_ABS_MAIN.F:660-760``)."""
    type: int = 0                    # -SURF.Type (ISURF 0..7)
    alb: float = 0.0                 # -SURF.Alb (Lambertian rho)
    ind: float = UNSET               # -SURF.Ind (refractive index)
    wind: float = UNSET              # -SURF.Glitter.Wind (m/s)
    k0: float = UNSET                # -SURF.Roujean.K0
    k1: float = UNSET
    k2: float = UNSET
    alpha_nadal: float = UNSET
    beta_nadal: float = UNSET
    coef_c_maignan: float = UNSET    # C*exp(-nu) site coefficient


@dataclass
class ProfileConfig:
    """-AP.* keywords (``src/SOS_ABS_MAIN.F:360-418``)."""
    mot: float = UNSET               # -AP.MOT (Rayleigh OT; UNSET -> Perbos)
    hr: float = 8.0                  # -AP.HR molecular scale height (km)
    type: int = 1                    # -AP.Type (1 exp aerosols, 2 slab)
    ha: float = UNSET                # -AP.AerHS.HA (km)
    zmin: float = UNSET              # -AP.AerLayer.Zmin
    zmax: float = UNSET              # -AP.AerLayer.Zmax
    psurf: float = cte.HT_STD_PSURF  # -AP.Psurf (mbar)


@dataclass
class AbsConfig:
    """-AbsAtmo.* keywords (``src/SOS_ABS_MAIN.F:770-840``)."""
    absprofil: int = 7               # 0 user file, 1..6 built-in, 7 = none
    user_profile: np.ndarray | None = None   # (50, 13) when absprofil = 0
    mode_ckd: int = 1                # -AbsAtmo.AbsModeCKD (1 fine, 2 fast)
    resolution: int = 10             # -AbsAtmo.Resolution (1/5/10 cm-1)
    h2o: float = UNSET               # -AbsAtmo.H2O (g/cm2)
    o3: float = UNSET                # -AbsAtmo.O3 (Dobson)
    co2: float = UNSET               # -AbsAtmo.CO2 (ppmv at surface)
    ch4: float = UNSET               # -AbsAtmo.CH4 (ppmv at surface)


@dataclass
class ViewConfig:
    """-SOS.View / -SOS.Output keywords (``src/SOS_ABS_MAIN.F:844-911``)."""
    itrphi: int = 1                  # 1 principal plane, 2 polar diagram
    phi_deg: float = 0.0             # -SOS.View.Phi (ITRPHI=1)
    dphi_deg: int = 30               # -SOS.View.Dphi (ITRPHI=2)
    zout_km: float = UNSET           # -SOS.OutputLevel altitude (UNSET = TOA/0)


@dataclass
class SosConfig:
    """Complete run configuration (the SOS_PROC argument list)."""
    wavelength: float = 0.550        # -SOS.Wa (microns)
    angles: AngleConfig = field(default_factory=AngleConfig)
    aerosols: AerosolConfig = field(default_factory=AerosolConfig)
    surface: SurfaceConfig = field(default_factory=SurfaceConfig)
    profile: ProfileConfig = field(default_factory=ProfileConfig)
    absorption: AbsConfig = field(default_factory=AbsConfig)
    view: ViewConfig = field(default_factory=ViewConfig)
    igmax: int = cte.DEFAULT_IGMAX   # -SOS.IGmax
    ipolar: bool = True              # -SOS.Ipolar
    mdf: float = cte.MDF             # -SOS.MDF molecular depolarization
    compute_transmissions: bool = False   # -SOS.Trans

    def validate(self):
        """Parameter cross-checks (subset of ``src/SOS_PROC.F:1534-2225``)."""
        if not (cte.WAMIN <= self.wavelength <= cte.WAMAX):
            raise ValueError(
                f"wavelength {self.wavelength} outside "
                f"[{cte.WAMIN}, {cte.WAMAX}] microns")
        if not (0.0 <= self.angles.thetas_deg < 90.0):
            raise ValueError("solar zenith angle must be in [0, 90)")
        if self.surface.type not in range(8):
            raise ValueError(f"unknown surface type {self.surface.type}")
        if self.surface.type >= 1 and self.surface.type != 2 \
                and self.surface.ind == UNSET:
            raise ValueError("surface refractive index required")
        if self.surface.type == 1 and self.surface.wind == UNSET:
            raise ValueError("glitter surface requires wind speed")
        if self.surface.type >= 3 and (self.surface.k0 == UNSET
                                       or self.surface.k1 == UNSET
                                       or self.surface.k2 == UNSET):
            raise ValueError("Roujean K0/K1/K2 required for ISURF >= 3")
        if self.aerosols.aot_ref > 0.0 and self.aerosols.model == UNSET_I:
            raise ValueError("aerosol model required when AOT > 0")
        if self.absorption.mode_ckd not in (1, 2):
            raise ValueError("mode_ckd must be 1 or 2")
        if self.absorption.resolution not in (1, 5, 10):
            raise ValueError("CKD resolution must be 1, 5 or 10 cm-1")
        if self.profile.type == 2 and (self.profile.zmin == UNSET
                                       or self.profile.zmax == UNSET):
            raise ValueError("slab profile requires zmin/zmax")
        if (self.profile.type == 1 and self.aerosols.aot_ref > 0.0
                and self.profile.ha == UNSET):
            raise ValueError("exponential aerosol profile requires "
                             "-AP.AerHS.HA (scale height)")
        return self
