"""WMO / Shettle & Fenn / external aerosol models (IMOD 1, 2, 4).

Loader values are oracle-checked directly against the reference data files
(``fic/Data_WMO_cor_2015_12_16`` etc. — exact grid points, so linear
interpolation must reproduce the rows verbatim); mixtures are checked for
the physical invariants the reference enforces downstream (normalization,
ssa bounds, mixing-weight algebra).
"""

import numpy as np
import pytest

from radiativetransfer_sos_tpu import angles
from radiativetransfer_sos_tpu.aerosol_models import (load_sf_params,
                                                      load_wmo_params,
                                                      sf_phase_matrix,
                                                      wmo_phase_matrix)
from radiativetransfer_sos_tpu.external_aerosols import (
    external_phase_matrix, parse_external_file, spline_resample)

ROOT = "/root/reference/fic"


def test_wmo_params_at_grid_point():
    """wa = 0.550 is a table row (fic/Data_WMO_cor_2015_12_16:8) —
    interpolation must return it exactly, rounded per the F5.3/F8.5 formats
    (src/SOS_AEROSOLS.F:3436-3439)."""
    p = load_wmo_params(0.550, root=ROOT)
    np.testing.assert_allclose(p.rm, [0.5, 0.005, 0.3, 0.0118])
    np.testing.assert_allclose(
        p.var, np.array([0.47567, 0.47567, 0.39967, 0.30103]) * np.log(10.0))
    np.testing.assert_allclose(
        p.vol, [113.98352, 113.98352e-6, 5.14441, 59.77755e-6])
    np.testing.assert_allclose(p.mr, [1.530, 1.530, 1.381, 1.750])
    np.testing.assert_allclose(p.mi, [-0.008, -0.006, -0.0, -0.44])


def test_sf_params_rh_interpolation():
    """RH=50 is a table row of Data_SF; RH=60 must lie between rows."""
    p50 = load_sf_params(0.550, 50.0, root=ROOT)
    np.testing.assert_allclose(
        p50.rm, [0.02748, 0.43770, 0.02563, 0.41130, 0.17110])
    p60 = load_sf_params(0.550, 60.0, root=ROOT)
    p70 = load_sf_params(0.550, 70.0, root=ROOT)
    assert np.all(p60.rm > p50.rm) and np.all(p60.rm < p70.rm)
    # swelling with RH drives the index toward water (lower mr)
    assert np.all(p70.mr <= p50.mr + 1e-12)


@pytest.fixture(scope="module")
def mie_grid():
    return angles.make_mie_grid(10)


def _check_phase_matrix(pm, grid):
    mu_s = np.concatenate([-grid.mu[::-1], [0.0], grid.mu])
    w_s = np.concatenate([grid.w[::-1], [0.0], grid.w])
    norm = 0.5 * np.sum(w_s * pm.p11)
    assert norm == pytest.approx(1.0, rel=5e-2)   # quadrature-limited
    assert 0.0 < pm.single_scattering_albedo <= 1.0
    assert pm.sigma_ext >= pm.sigma_sca > 0.0
    assert np.all(np.abs(pm.p12) <= pm.p11 + 1e-12)


def test_wmo_maritime_mixture(mie_grid):
    pm = wmo_phase_matrix(
        np.concatenate([-mie_grid.mu[::-1], [0.0], mie_grid.mu]),
        0.550, 2, root=ROOT, alpha_cap=25.0)
    _check_phase_matrix(pm, mie_grid)


def test_wmo_user_matches_continental(mie_grid):
    """Model 4 with the continental volume fractions == model 1."""
    mu_s = np.concatenate([-mie_grid.mu[::-1], [0.0], mie_grid.mu])
    pm1 = wmo_phase_matrix(mu_s, 0.550, 1, root=ROOT, alpha_cap=15.0)
    pm4 = wmo_phase_matrix(mu_s, 0.550, 4,
                           user_volumes=np.array([0.70, 0.29, 0.0, 0.01]),
                           root=ROOT, alpha_cap=15.0)
    np.testing.assert_allclose(pm4.p11, pm1.p11, rtol=1e-12)
    np.testing.assert_allclose(pm4.sigma_ext, pm1.sigma_ext, rtol=1e-12)


def test_sf_tropospheric_mixture(mie_grid):
    mu_s = np.concatenate([-mie_grid.mu[::-1], [0.0], mie_grid.mu])
    pm = sf_phase_matrix(mu_s, 0.550, 1, rh=70.0, root=ROOT, alpha_cap=25.0)
    _check_phase_matrix(pm, mie_grid)


def test_sf_rh_swelling_increases_extinction(mie_grid):
    """Hygroscopic growth: sigma_ext grows with RH for the same model."""
    mu_s = np.concatenate([-mie_grid.mu[::-1], [0.0], mie_grid.mu])
    lo = sf_phase_matrix(mu_s, 0.550, 1, rh=50.0, root=ROOT, alpha_cap=25.0)
    hi = sf_phase_matrix(mu_s, 0.550, 1, rh=98.0, root=ROOT, alpha_cap=25.0)
    assert hi.sigma_ext > lo.sigma_ext


def test_external_phase_file_roundtrip(tmp_path, mie_grid):
    """Rayleigh-shaped external file resamples exactly (cubic in mu)."""
    ang = np.linspace(0.0, 180.0, 73)
    mu = np.cos(np.radians(ang))
    f11 = 0.75 * (1.0 + mu ** 2)
    f12_ratio = -(-0.75 * (1.0 - mu ** 2)) / f11      # -F12/F11
    path = tmp_path / "ext.txt"
    with open(path, "w") as f:
        f.write("Extinction coefficient (km-1) : 0.123\n")
        f.write("Scattering coefficient (km-1) : 0.100\n")
        f.write("Nb angles : 73\n")
        f.write("ANGLE F11 -F12/F11 F22/F11 F33/F11\n")
        for j in range(73):
            f33 = 1.5 * mu[j]
            f.write(f"{ang[j]:8.3f} {f11[j]:.8e} {f12_ratio[j]:.8e} "
                    f"1.0 {f33 / f11[j]:.8e}\n")

    kmat1, kmat2, a, p11, p12, p22, p33 = parse_external_file(path)
    assert kmat1 == 0.123 and kmat2 == 0.100
    np.testing.assert_allclose(p12, -0.75 * (1.0 - mu ** 2), atol=1e-12)

    pm = external_phase_matrix(str(path), mie_grid)
    mu_s = np.concatenate([-mie_grid.mu[::-1], [0.0], mie_grid.mu])
    np.testing.assert_allclose(pm.p11, 0.75 * (1.0 + mu_s ** 2), atol=2e-4)
    np.testing.assert_allclose(pm.p33, 1.5 * mu_s, atol=2e-4)
    assert pm.single_scattering_albedo == pytest.approx(0.100 / 0.123)


def test_spline_resample_linear_exact():
    x = np.linspace(-1, 1, 21)
    y = 2.0 * x + 1.0
    xv = np.linspace(-0.95, 0.95, 50)
    np.testing.assert_allclose(spline_resample(x, y, xv), 2.0 * xv + 1.0,
                               atol=1e-10)


def _write_mixture(path, ratio1=0.4, ratio2=0.6):
    with open(path, "w") as f:
        f.write("Number of modes : 2\n")
        f.write("Type : LND\n")
        f.write("Modal radius (microns) : 0.10\n")
        f.write("Standard deviation : 0.4\n")
        f.write("MR at simu wavelength : 1.44\n")
        f.write("MI at simu wavelength : -0.003\n")
        f.write("MR at ref wavelength : 1.45\n")
        f.write("MI at ref wavelength : -0.0035\n")
        f.write(f"AOT ratio at waref : {ratio1}\n")
        f.write("Type : JUNGE\n")
        f.write("Slope : 4.0\n")
        f.write("Min radius (microns) : 0.01\n")
        f.write("Max radius (microns) : 2.0\n")
        f.write("MR at simu wavelength : 1.50\n")
        f.write("MI at simu wavelength : -0.008\n")
        f.write("MR at ref wavelength : 1.51\n")
        f.write("MI at ref wavelength : -0.009\n")
        f.write(f"AOT ratio at waref : {ratio2}\n")


def test_mixture_file_parse_and_mix(tmp_path, mie_grid):
    """IMOD=5 user mixture (src/SOS_AEROSOLS.F:2296-2660)."""
    from radiativetransfer_sos_tpu.external_aerosols import (
        mixture_phase_matrices, parse_mixture_file)
    path = tmp_path / "mix.txt"
    _write_mixture(path)
    modes = parse_mixture_file(path)
    assert [m.sdtype for m in modes] == [1, 2]
    assert modes[1].p1 == 0.01 and modes[1].p2 == 4.0 and modes[1].p3 == 2.0
    assert modes[0].aot_ratio + modes[1].aot_ratio == pytest.approx(1.0)

    mu_s = np.concatenate([-mie_grid.mu[::-1], [0.0], mie_grid.mu])
    pm_sim, pm_ref = mixture_phase_matrices(mu_s, 0.65, 0.55, 0.2, modes,
                                            alpha_cap=25.0)
    _check_phase_matrix(pm_sim, mie_grid)
    _check_phase_matrix(pm_ref, mie_grid)


def test_mixture_ratio_sum_enforced(tmp_path):
    from radiativetransfer_sos_tpu.external_aerosols import parse_mixture_file
    path = tmp_path / "bad.txt"
    _write_mixture(path, ratio1=0.4, ratio2=0.5)
    with pytest.raises(ValueError, match="sum"):
        parse_mixture_file(path)
