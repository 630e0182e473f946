"""Stage-product writers (-SOS.ResBin, user-angle files, angle/aerosol
products) and loud handling of unimplemented io keywords."""

import os

import numpy as np
import pytest

from radiativetransfer_sos_tpu import products
from radiativetransfer_sos_tpu.api import config_from_keywords
from radiativetransfer_sos_tpu.config import SosConfig
from radiativetransfer_sos_tpu.proc import sos_run
from radiativetransfer_sos_tpu.api import write_result_files


def test_fourier_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    recs = rng.standard_normal((7, 3, 11))
    recs[5:] = 0.0                       # converged: trailing zero orders
    p = str(tmp_path / "SOS_Result.bin")
    products.write_fourier_bin(p, recs)
    back = products.read_fourier_bin(p, 11)
    assert back.shape == (5, 3, 11)      # zero tail not written
    np.testing.assert_array_equal(back, recs[:5])
    # record framing is Fortran sequential: marker = 3*D*8 bytes
    raw = open(p, "rb").read()
    assert int.from_bytes(raw[:4], "little") == 3 * 11 * 8


def _run_cfg(tmp_path, extra_io):
    kw = {
        "-SOS_Main.ResRoot": str(tmp_path),
        "-SOS_Main.Wa": "0.50",
        "-ANG.Thetas": "30.0",
        "-ANG.Rad.NbGauss": "8",
        "-SURF.Type": "0", "-SURF.Alb": "0.1",
        "-AP.HR": "8.0", "-AP.AbsProfile.Type": "7",
        "-SOS.IGmax": "10",
    }
    kw.update(extra_io)
    cfg = config_from_keywords(kw)
    res = sos_run(cfg)
    write_result_files(cfg, res)
    return cfg, res


def test_resbin_and_userang_written(tmp_path, monkeypatch):
    ang = tmp_path / "user_ang.txt"
    ang.write_text("10.0\n40.0\n")
    cfg, res = _run_cfg(tmp_path, {
        "-SOS.ResBin": "SOS_Result.bin",
        "-SOS.ResFileUp.UserAng": "SOS_Up_UserAng.txt",
        "-SOS.ResFileDown.UserAng": "SOS_Down_UserAng.txt",
        "-ANG.Rad.UserAngFile": str(ang),
    })
    outdir = tmp_path / "SOS"
    binp = outdir / "SOS_Result.bin"
    assert binp.exists()
    d = 2 * res.grid.n + 1
    recs = products.read_fourier_bin(str(binp), d)
    # records match the aggregated Fourier records up to the zero tail
    np.testing.assert_allclose(recs, np.asarray(res.records_up)[:recs.shape[0]])

    up = (outdir / "SOS_Up_UserAng.txt").read_text().splitlines()
    data_rows = [l for l in up if not l.startswith("#")]
    # 2 user angles x 2 half-planes
    assert len(data_rows) == 4
    # full file has all angles
    full = (outdir / "SOS_Up.txt").read_text().splitlines()
    assert len([l for l in full if not l.startswith("#")]) \
        == 2 * res.grid.n


def test_angle_and_aerosol_products(tmp_path):
    cfg, res = _run_cfg(tmp_path, {
        "-ANG.Rad.ResFile": str(tmp_path / "SOS_UsedAngles.txt"),
        "-ANG.Aer.ResFile": str(tmp_path / "Aer_UsedAngles.txt"),
    })
    txt = (tmp_path / "SOS_UsedAngles.txt").read_text()
    assert "NB_GAUSS_ANGLES :   8" in txt
    assert "SOLAR ZENITH ANGLE : 30.000" in txt
    assert "INTERNAL_IMUS :" in txt
    assert "D+00" in txt or "D-0" in txt      # Fortran D exponents
    txt2 = (tmp_path / "Aer_UsedAngles.txt").read_text()
    assert "INTERNAL_OS_NB :" in txt2


def test_aerosols_product_file(tmp_path):
    from radiativetransfer_sos_tpu.aerosols import AerosolExpansion
    e = AerosolExpansion(alpha=np.zeros(4), beta=np.array([1.0, .5, .2, .1]),
                         gamma=np.zeros(4), zeta=np.zeros(4),
                         coef_tronca=0.1, piz=0.98, piz_tronc=0.97,
                         sigma_ext=1.2e-2, sigma_sca=1.1e-2)
    p = str(tmp_path / "Aerosols.txt")
    products.write_aerosols_file(p, e)
    txt = open(p).read()
    assert "TRUNCATION COEFFICIENT               :  0.10000" in txt
    assert "PHASE MATRIX COEFFICIENTS FOR K=0 TO   3" in txt
    assert txt.count("\n") == 9 + 4          # 9 header lines + 4 coef rows


def test_unproduced_keywords_warn(tmp_path):
    with pytest.warns(UserWarning, match="-SOS.Log"):
        config_from_keywords({"-SOS.Log": str(tmp_path / "x.log"),
                              "-ANG.Thetas": "30.0"})
