"""Parameter-validation parity vs the reference error exits.

Each case maps to a numbered ``GOTO 2xxx`` error exit of ``SOS_PROC``
(``src/SOS_PROC.F:1534-2300``); the Nadal refusal mirrors
``src/SOS_PROC.F:2211-2225``, the Roujean warning the clamping in
``src/SOS_ROUJEAN.F:953-960``.
"""

import numpy as np
import pytest

from radiativetransfer_sos_tpu.config import UNSET, UNSET_I, SosConfig


def base_cfg() -> SosConfig:
    cfg = SosConfig()
    cfg.angles.thetas_deg = 30.0
    return cfg


def test_base_config_valid():
    base_cfg().validate()


@pytest.mark.parametrize("mutate,match", [
    (lambda c: setattr(c, "wavelength", 0.1), "2101"),            # < WAMIN
    (lambda c: setattr(c.angles, "thetas_deg", 95.0), "2201"),
    (lambda c: setattr(c.angles, "thetas_deg", -1.0), "2201"),
    (lambda c: setattr(c.angles, "nbmu_lum", 200), "OS_NBMU_MAX"),
    (lambda c: setattr(c.angles, "nbmu_mie", 200), "MIE_NBMU_MAX"),
    (lambda c: setattr(c.angles, "user_rad_deg",
                       np.linspace(1.0, 80.0, 25)), "user"),
    (lambda c: setattr(c.surface, "alb", -0.2), "2402"),
    (lambda c: setattr(c.surface, "type", 9), "2404"),
    (lambda c: setattr(c.igmax, "__dummy__", 0)
     if False else setattr(c, "igmax", 0), "2604"),
    (lambda c: setattr(c.view, "itrphi", 3), "2606"),
    (lambda c: (setattr(c.view, "itrphi", 2),
                setattr(c.view, "dphi_deg", 0)), "2609"),
    (lambda c: setattr(c.view, "zout_km", -3.0), "2611"),
    (lambda c: setattr(c.profile, "hr", -1.0), "2504"),
    (lambda c: setattr(c.profile, "mot", -0.1), "2502"),
    (lambda c: setattr(c.profile, "type", 3), "2506"),
])
def test_simple_error_exits(mutate, match):
    cfg = base_cfg()
    mutate(cfg)
    with pytest.raises(ValueError, match=match):
        cfg.validate()


def test_aerosol_model_required():
    cfg = base_cfg()
    cfg.aerosols.aot_ref = 0.3
    with pytest.raises(ValueError, match="2304"):
        cfg.validate()


def test_monomodal_requirements():
    cfg = base_cfg()
    cfg.aerosols.aot_ref = 0.3
    cfg.aerosols.model = 0
    cfg.profile.ha = 2.0
    with pytest.raises(ValueError, match="2309"):
        cfg.validate()
    cfg.aerosols.mm.mr_wa = 1.44
    cfg.aerosols.mm.mi_wa = 0.005          # positive: wrong convention
    with pytest.raises(ValueError, match="2310"):
        cfg.validate()
    cfg.aerosols.mm.mi_wa = -0.005
    with pytest.raises(ValueError, match="2313"):
        cfg.validate()                     # LND params missing
    cfg.aerosols.mm.lnd_radius = 0.1
    cfg.aerosols.mm.lnd_var = 0.4
    cfg.validate()
    # Junge model: slope AND rmin are mandatory like the reference
    # (src/SOS_PROC.F:1692-1697, error exit 23132)
    cfg.aerosols.mm.sdtype = 2
    with pytest.raises(ValueError, match="2314"):
        cfg.validate()
    cfg.aerosols.mm.junge_slope = 3.0
    with pytest.raises(ValueError, match="2314"):
        cfg.validate()                     # rmin still missing
    cfg.aerosols.mm.junge_rmin = 0.1
    cfg.validate()
    cfg.aerosols.mm.sdtype = 1
    # waref != wa needs the waref indices
    cfg.aerosols.waref = 0.550
    cfg.wavelength = 0.675
    with pytest.raises(ValueError, match="2317"):
        cfg.validate()


def test_wmo_and_sf_requirements():
    cfg = base_cfg()
    cfg.aerosols.aot_ref = 0.3
    cfg.aerosols.model = 1
    cfg.profile.ha = 2.0
    with pytest.raises(ValueError, match="2315"):
        cfg.validate()
    cfg.aerosols.wmo_model = 4
    with pytest.raises(ValueError, match="2317"):
        cfg.validate()                     # user fractions missing
    cfg.aerosols.model = 2
    with pytest.raises(ValueError, match="2318"):
        cfg.validate()
    cfg.aerosols.sf_model = 1
    with pytest.raises(ValueError, match="2319"):
        cfg.validate()
    cfg.aerosols.sf_rh = 120.0
    with pytest.raises(ValueError, match="2321"):
        cfg.validate()


def test_bimodal_requirements():
    cfg = base_cfg()
    cfg.aerosols.aot_ref = 0.3
    cfg.aerosols.model = 3
    cfg.profile.ha = 2.0
    cfg.aerosols.bmd.mode_param = 1
    with pytest.raises(ValueError, match="2325"):
        cfg.validate()
    cfg.aerosols.bmd.cv_coarse = 1e-3
    cfg.aerosols.bmd.cv_fine = 1e-4
    with pytest.raises(ValueError, match="2327"):
        cfg.validate()


def test_external_requires_same_wavelength():
    cfg = base_cfg()
    cfg.aerosols.aot_ref = 0.3
    cfg.aerosols.model = 4
    cfg.profile.ha = 2.0
    with pytest.raises(ValueError, match="2330"):
        cfg.validate()
    cfg.aerosols.external_file = "/tmp/nope.txt"
    cfg.aerosols.waref = 0.5
    cfg.wavelength = 0.675
    with pytest.raises(ValueError, match="2331"):
        cfg.validate()


def test_surface_requirements():
    cfg = base_cfg()
    cfg.surface.type = 1
    with pytest.raises(ValueError, match="2405"):
        cfg.validate()                     # ind required
    cfg.surface.ind = 1.34
    with pytest.raises(ValueError, match="2406"):
        cfg.validate()                     # wind required
    cfg.surface.wind = -2.0
    with pytest.raises(ValueError, match="24061"):
        cfg.validate()
    cfg.surface.wind = 2.0
    cfg.validate()
    cfg.surface.type = 3
    with pytest.raises(ValueError, match="2407"):
        cfg.validate()                     # K0/K1/K2 required
    cfg.surface.type = 7
    cfg.surface.k0, cfg.surface.k1, cfg.surface.k2 = 0.5, 0.1, 0.05
    with pytest.raises(ValueError, match="2411"):
        cfg.validate()                     # Maignan C required


def test_nadal_refused():
    cfg = base_cfg()
    cfg.surface.type = 6
    cfg.surface.ind = 1.34
    cfg.surface.k0, cfg.surface.k1, cfg.surface.k2 = 0.5, 0.1, 0.05
    cfg.surface.alpha_nadal, cfg.surface.beta_nadal = 1.0, 10.0
    with pytest.raises(ValueError, match="Nadal"):
        cfg.validate()


def test_roujean_60deg_warning():
    cfg = base_cfg()
    cfg.angles.thetas_deg = 70.0
    cfg.surface.type = 3
    cfg.surface.k0, cfg.surface.k1, cfg.surface.k2 = 0.5, 0.1, 0.05
    with pytest.warns(UserWarning, match="Roujean"):
        cfg.validate()


def test_slab_absorption_incompatible():
    cfg = base_cfg()
    cfg.profile.type = 2
    cfg.profile.zmin, cfg.profile.zmax = 1.0, 3.0
    cfg.absorption.absprofil = 1
    with pytest.raises(ValueError, match="2513"):
        cfg.validate()
    cfg.absorption.absprofil = 7
    cfg.validate()
    cfg.profile.zmin, cfg.profile.zmax = 3.0, 1.0
    with pytest.raises(ValueError, match="2509"):
        cfg.validate()


def test_user_abs_profile_required():
    cfg = base_cfg()
    cfg.absorption.absprofil = 0
    with pytest.raises(ValueError, match="2512"):
        cfg.validate()
