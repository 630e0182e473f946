"""Arbitrary output altitude (-SOS.OutputAlt / ZOUT, src/SOS_OS.F:1511-1534).

Consistency oracle: the interpolated field at z = TOA must equal the TOA
upward field, and at z = 0 the ground downward field; intermediate levels
must be bracketed sensibly and tauout must grow from 0 to ttot.
"""

import numpy as np
import pytest

from radiativetransfer_sos_tpu.config import SosConfig
from radiativetransfer_sos_tpu.proc import run


def _cfg(zout=None):
    cfg = SosConfig(wavelength=0.50)
    cfg.angles.thetas_deg = 40.0
    cfg.angles.nbmu_lum = 10
    cfg.surface.alb = 0.15
    cfg.absorption.absprofil = 7
    cfg.igmax = 40
    if zout is not None:
        cfg.view.zout_km = zout
    return cfg


@pytest.fixture(scope="module")
def reference_run():
    return run(_cfg())


def test_zout_toa_matches_default_up(reference_run):
    res_z = run(_cfg(zout=119.99))
    n = reference_run.grid.n
    up_ref = reference_run.records_up[:, :, n + 1:]
    up_z = res_z.records_up[:, :, n + 1:]
    np.testing.assert_allclose(up_z, up_ref, rtol=1e-6, atol=1e-12)
    assert res_z.tauout == pytest.approx(0.0, abs=1e-6)


def test_zout_ground_matches_default_down(reference_run):
    res_z = run(_cfg(zout=0.0))
    n = reference_run.grid.n
    dn_ref = reference_run.records_up[:, :, :n]
    dn_z = res_z.records_up[:, :, :n]
    np.testing.assert_allclose(dn_z, dn_ref, rtol=1e-6, atol=1e-12)
    assert res_z.tauout == pytest.approx(res_z.ttot_tronc, rel=1e-6)


def test_zout_intermediate_monotonic(reference_run):
    """tauout grows as z decreases; upward I at mid-level sits between
    ground and TOA attenuation regimes (positive, finite)."""
    taus, imax = [], []
    for z in (30.0, 8.0, 2.0):
        r = run(_cfg(zout=z))
        taus.append(r.tauout)
        n = r.grid.n
        imax.append(np.abs(r.records_up[0, 0, n + 1:]).max())
    assert taus[0] < taus[1] < taus[2] < run(_cfg()).ttot_tronc
    assert all(v > 0 for v in imax)
