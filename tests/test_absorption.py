"""CKD absorption stack: loader, gas columns, interpolation vs oracle."""

import os

import numpy as np
import pytest

from radiativetransfer_sos_tpu import constants as cte
from radiativetransfer_sos_tpu.absorption import (aik_weights, gas_columns,
                                                  ki_per_layer, load_ckd,
                                                  tau_abs_all_terms,
                                                  tau_abs_mode2)
from tests.oracle import ckd_ref

HAVE_DATA = os.path.isdir("/root/reference/fic/COEFF_CKD")
needs_data = pytest.mark.skipif(not HAVE_DATA, reason="no CKD data root")


@needs_data
@pytest.mark.parametrize("resolution,mode", [(1, 1), (5, 1), (1, 2)])
def test_resolutions_end_to_end(resolution, mode, monkeypatch):
    """Every shipped CKD resolution (1/5/10 cm^-1 table sets,
    fic/COEFF_CKD/{1,5,10}cmm1) must run through the whole pipeline at
    the O2 A-band; mode 2 (transmission-weighted single solve) must land
    within a few percent of mode 1 at the same resolution."""
    monkeypatch.setenv("SOS_ABS_ROOT", "/root/reference")
    from radiativetransfer_sos_tpu.config import SosConfig
    from radiativetransfer_sos_tpu.proc import sos_run

    def run(res_cm, m):
        cfg = SosConfig(wavelength=0.765)
        cfg.angles.thetas_deg = 32.0
        cfg.angles.nbmu_lum = 10
        cfg.surface.alb = 0.1
        cfg.profile.ha = 2.0
        cfg.absorption.absprofil = 2
        cfg.absorption.resolution = res_cm
        cfg.absorption.mode_ckd = m
        cfg.view.itrphi = 1
        cfg.view.phi_deg = 0.0
        cfg.igmax = 20
        return sos_run(cfg)

    r = run(resolution, mode)
    assert r.n_ckd_terms >= 1
    i0 = float(np.asarray(r.up["i"])[1][0])
    assert 0.01 < i0 < 0.5 and np.isfinite(r.emoins)
    if mode == 2:
        r1 = run(resolution, 1)
        i1 = float(np.asarray(r1.up["i"])[1][0])
        assert abs(i0 - i1) / i1 < 0.02

# 675 nm: O2 B-band region with H2O data present in this snapshot
NU_TEST = 1.0e4 / 0.675


def test_gas_columns_tropical():
    cols = gas_columns(1)
    assert cols.alt[0] == 0.0 and cols.alt[-1] == 120.0
    assert np.isclose(cols.p[0], 1013.0)
    # integrated H2O of the tropical profile ~ 4.1 g/cm2
    qh2o = cols.ro[0].sum() / 6.022e23 * 18.0
    assert 3.5 < qh2o < 4.5, qh2o
    # O3 column ~ 0.25-0.30 cm.atm
    qo3 = cols.ro[2].sum() / 6.022e23 * 48.0 * 466.23
    assert 0.2 < qo3 < 0.35, qo3


def test_gas_columns_user_rescale():
    cols = gas_columns(2, h2o=2.0, o3=0.35, co2=420.0, ch4=1.9)
    qh2o = cols.ro[0].sum() / 6.022e23 * 18.0
    np.testing.assert_allclose(qh2o, 2.0, rtol=1e-12)
    qo3 = cols.ro[2].sum() / 6.022e23 * 48.0 * 466.23
    np.testing.assert_allclose(qo3, 0.35, rtol=1e-12)


def test_gas_columns_psurf():
    c0 = gas_columns(1)
    c1 = gas_columns(1, psurf=980.0)
    np.testing.assert_allclose(c1.p, c0.p * 980.0 / 1013.0, rtol=1e-14)


@needs_data
def test_load_ckd_window():
    t = load_ckd(NU_TEST, 10)
    assert t.numax == 15000 and t.numin == 14500
    lamb = t.band_index(NU_TEST)
    assert 0 <= lamb < 50
    assert t.temps.shape == (9,) and t.pres.shape == (31,)
    assert t.conc_h2o.shape[0] >= 2
    # every gas has >= 1 exponential and ai sums ~ 1 per gas
    nexp = t.nexp[:, lamb]
    assert np.all(nexp >= 1)
    for g in range(8):
        s = t.ai[:nexp[g], g, lamb].sum()
        np.testing.assert_allclose(s, 1.0, atol=1e-6)


@needs_data
def test_ki_per_layer_vs_oracle():
    t = load_ckd(NU_TEST, 10)
    lamb = t.band_index(NU_TEST)
    cols = gas_columns(1)
    xk = ki_per_layer(t, lamb, cols)
    nlev = cols.p.shape[0]
    for g in (0, 2, 6):            # H2O, O3, O2
        for ik in range(t.nexp[g, lamb]):
            for j in (1, 10, 25, 48):   # layer index TOA -> ground, 1-based j
                prs = (cols.p[nlev - j - 1] + cols.p[nlev - j]) / 2
                tmp = (cols.t[nlev - j - 1] + cols.t[nlev - j]) / 2
                conc = (cols.h2o_ppmv[nlev - j - 1]
                        + cols.h2o_ppmv[nlev - j]) / 2 * 1e-6
                ref = ckd_ref.coeff_abs_ckd(
                    g + 1, lamb, ik, prs, tmp, conc, t.pres, t.temps,
                    t.conc_h2o, t.ki, t.ki_h2o)
                np.testing.assert_allclose(
                    xk[g, ik, j - 1], ref, rtol=1e-12, atol=1e-30,
                    err_msg=f"gas {g} ik {ik} layer {j}")


@needs_data
def test_tau_abs_all_terms_vs_oracle():
    t = load_ckd(NU_TEST, 10)
    lamb = t.band_index(NU_TEST)
    cols = gas_columns(1)
    tau, aik = tau_abs_all_terms(t, lamb, cols)
    idx, aik2 = aik_weights(t, lamb)
    np.testing.assert_allclose(aik, aik2)
    np.testing.assert_allclose(aik.sum(), 1.0, rtol=1e-12)
    assert tau.shape == (idx.shape[0], 50)
    assert np.all(tau[:, 0] == 0.0)
    assert np.all(np.diff(tau, axis=1) >= -1e-15)
    # spot-check two tuples against the scalar oracle
    for k in (0, idx.shape[0] - 1):
        ref = ckd_ref.absprofile(lamb, idx[k], cols.p, cols.t,
                                 cols.h2o_ppmv, cols.ro, t.nexp,
                                 t.pres, t.temps, t.conc_h2o, t.ki,
                                 t.ki_h2o)
        np.testing.assert_allclose(tau[k], ref, rtol=1e-9, atol=1e-14,
                                   err_msg=f"tuple {idx[k]}")


@needs_data
def test_tau_abs_mode2_bounds():
    t = load_ckd(NU_TEST, 10)
    lamb = t.band_index(NU_TEST)
    cols = gas_columns(1)
    tau_all, aik = tau_abs_all_terms(t, lamb, cols)
    tau2 = tau_abs_mode2(t, lamb, cols)
    # transmission-space average lies within the envelope of the terms
    assert np.all(tau2 >= tau_all.min(axis=0) - 1e-12)
    assert np.all(tau2 <= tau_all.max(axis=0) + 1e-12)
    assert tau2[0] == 0.0


@needs_data
def test_load_ckd_missing_gas_raises():
    """The 910 nm demo window lacks its H2O table in this data snapshot
    (.MISSING_LARGE_BLOBS); the loader must abort like the reference
    (src/SOS_SUB_TRS.F:706-707) unless explicitly downgraded."""
    nu_910 = 1.0e4 / 0.910                    # window [10500, 11000]
    with pytest.raises(FileNotFoundError, match="H2O"):
        load_ckd(nu_910, 10)
    t = load_ckd(nu_910, 10, allow_missing=True)
    assert "H2O" in t.missing
    lamb = t.band_index(nu_910)
    # the downgraded gas behaves like the JABS=0 branch: 1 exponential,
    # ai = 1, ki = 0 (src/SOS_SUB_TRS.F:586-614)
    assert t.nexp[0, lamb] == 1
    assert t.ai[0, 0, lamb] == 1.0
    assert np.all(t.ki_h2o == 0.0)
