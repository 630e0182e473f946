"""API/CLI parity layer tests (C2 / C20, SURVEY.md §2).

Covers: the f2py-compatible ``sos_proc`` tuple, the keyword-dict config
decoding, the ASCII writers' record formats, and the CLI driver exit
contract.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from radiativetransfer_sos_tpu import constants as cte
from radiativetransfer_sos_tpu.api import (config_from_keywords,
                                           sos_proc, write_radiance_file)
from radiativetransfer_sos_tpu.config import UNSET


def test_config_from_keywords_demo_set():
    """The demo script keyword set decodes onto the typed config
    (exe/runSOS-ABS_demo.ksh:82-90)."""
    kw = {
        "-SOS_Main.Wa": "0.910", "-ANG.Thetas": "35.0",
        "-ANG.Rad.NbGauss": "40", "-ANG.Aer.NbGauss": "40",
        "-SURF.Type": "1", "-SURF.Alb": "0.0", "-SURF.Ind": "1.34",
        "-SURF.Glitter.Wind": "2.0",
        "-AER.Model": "1", "-AER.WMO.Model": "2",
        "-AER.AOTref": "0.3", "-AER.Waref": "0.550", "-AER.Tronca": "1",
        "-AP.HR": "8.0", "-AP.AerHS.HA": "2.0", "-AP.AerProfile.Type": "1",
        "-AP.AbsProfile.Type": "1", "-AP.SpectralResol": "10.",
        "-SOS.AbsModeCKD": "1",
        "-SOS.View": "1", "-SOS.View.Phi": "0.0", "-SOS.IGmax": "30",
    }
    cfg = config_from_keywords(kw)
    assert cfg.wavelength == 0.910
    assert cfg.angles.thetas_deg == 35.0
    assert cfg.surface.type == 1 and cfg.surface.wind == 2.0
    assert cfg.aerosols.model == 1 and cfg.aerosols.wmo_model == 2
    assert cfg.aerosols.aot_ref == 0.3 and cfg.aerosols.waref == 0.550
    assert cfg.absorption.absprofil == 1 and cfg.absorption.resolution == 10
    assert cfg.absorption.mode_ckd == 1
    assert cfg.igmax == 30 and cfg.view.itrphi == 1


def test_config_unknown_keyword_raises():
    with pytest.raises(ValueError, match="unknown keywords"):
        config_from_keywords({"-Bogus.Key": "1"})


@pytest.fixture(scope="module")
def rayleigh_tuple(tmp_path_factory):
    root = tmp_path_factory.mktemp("res")
    out = sos_proc(wa_simu=0.55, tetas=32.0, nbmu_gauss_lum=10,
                   isurf=0, rho=0.1, absprofil=7, itrphi=1, phios=0.0,
                   igmax=40, resroot=str(root), fictrans="SOS_Transm.txt",
                   ficflux="FicFlux.txt", ier=0, trace=False)
    return out, root


def test_sos_proc_tuple_shapes(rayleigh_tuple):
    """Return tuple matches the f2py binding's 23 slots and static dims
    (binding/run_sos.py:636-695, src/SOS_PROC.F:1177-1204)."""
    out, _ = rayleigh_tuple
    assert len(out) == 23
    (nblum, ind_angout, phi, vza, sca_up, i_up, q_up, u_up, pang_up,
     prate_up, lpol_up, sca_dn, i_dn, q_dn, u_dn, pang_dn, prate_dn,
     lpol_dn, f_dir_dn, f_diff_dn, f_tot_dn, f_diff_up, coef_tronca) = out
    assert i_up.shape == (361, cte.OS_NBMU_MAX + 1)
    assert ind_angout.shape == (cte.OS_NBMU_MAX + 1,)
    assert nblum == 11            # 10 Gauss + solar angle
    assert np.all(i_up[:2, :nblum] > 0.0)
    assert coef_tronca == 0.0     # no aerosols
    # flux identities (src/SOS_PROC.F:3828-3837): no truncation =>
    # f_tot = f_diff + f_dir
    assert f_tot_dn == pytest.approx(f_diff_dn + f_dir_dn, rel=1e-12)
    # conservative Rayleigh atmosphere over rho=0.1: near closure at BOA
    assert 0.9 < f_tot_dn <= 1.0


def test_sos_proc_writes_files(rayleigh_tuple):
    out, root = rayleigh_tuple
    nblum = out[0]
    outdir = os.path.join(root, "SOS")
    up = os.path.join(outdir, "SOS_Up.txt")
    assert os.path.exists(up)
    assert os.path.exists(os.path.join(outdir, "SOS_Down.txt"))
    assert os.path.exists(os.path.join(outdir, "SOS_Transm.txt"))
    assert os.path.exists(os.path.join(outdir, "FicFlux.txt"))

    rows = [l for l in open(up) if not l.startswith("#")]
    assert len(rows) == 2 * nblum          # both half-planes
    vals = rows[0].split()
    assert len(vals) == 8                  # VZA SCA I Q U POL_ANG RATE IPOL
    assert float(vals[0]) < 0.0            # phi+180 half-plane first
    # record format: fixed-width %13.6e Stokes columns
    assert "e-" in vals[2] or "e+" in vals[2]

    # transmission file: reciprocity rows for every grid angle
    trans = open(os.path.join(outdir, "SOS_Transm.txt")).read()
    assert trans.count("thetav =") == nblum
    assert "Direct transmission TOA -> surface" in trans


def test_sos_proc_polar_diagram(tmp_path):
    out = sos_proc(wa_simu=0.55, tetas=20.0, nbmu_gauss_lum=8, isurf=0,
                   rho=0.0, absprofil=7, itrphi=2, pas_phi=90,
                   igmax=30, resroot=str(tmp_path))
    nblum, phi = out[0], out[2]
    nphi = 5                               # 0, 90, 180, 270, 360
    assert np.allclose(phi[:nphi], [0.0, 90.0, 180.0, 270.0, 360.0])
    up = os.path.join(tmp_path, "SOS", "SOS_Up.txt")
    rows = [l for l in open(up) if not l.startswith("#")]
    assert len(rows) == nphi * nblum
    assert len(rows[0].split()) == 9       # PHI VZA SCA I Q U ANG RATE IPOL
    # azimuth symmetry: phi=90 and phi=270 give identical I
    i_up = out[5]
    assert np.allclose(i_up[1, :nblum], i_up[3, :nblum], rtol=1e-10)


def test_cli_end_to_end(tmp_path):
    """CLI driver: JOB_STATUS=OK + products on disk; status 1 on bad args."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # small shapes + a wide timeout: on a weak CI host the subprocess pays
    # a cold JAX import + XLA CPU compile (the physics is covered at real
    # shapes elsewhere; this test is about the CLI contract)
    r = subprocess.run(
        [sys.executable, "-m", "radiativetransfer_sos_tpu",
         "-SOS_Main.Wa", "0.55", "-ANG.Thetas", "30.",
         "-ANG.Rad.NbGauss", "6", "-ANG.Aer.NbGauss", "6",
         "-SURF.Type", "0", "-SURF.Alb", "0.2",
         "-AP.AbsProfile.Type", "7", "-SOS.View", "1",
         "-SOS.View.Phi", "0.", "-SOS.IGmax", "10",
         "-SOS_Main.ResRoot", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0, r.stderr
    assert "JOB_STATUS=OK" in r.stdout
    assert os.path.exists(tmp_path / "SOS" / "SOS_Up.txt")

    r2 = subprocess.run(
        [sys.executable, "-m", "radiativetransfer_sos_tpu",
         "-SOS_Main.Wa", "99.0"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r2.returncode == 1
    assert "ERROR" in r2.stderr


def test_solar_in_grid_extension_keyword():
    """-ANG.SolarInGrid (framework extension) reaches the config; default
    preserves reference parity (solar angle injected into the grid)."""
    cfg = config_from_keywords({"-SOS_Main.Wa": "0.55", "-ANG.Thetas": "30.",
                                "-SURF.Alb": "0.1"})
    assert cfg.angles.solar_in_grid is True
    cfg = config_from_keywords({"-SOS_Main.Wa": "0.55", "-ANG.Thetas": "30.",
                                "-SURF.Alb": "0.1",
                                "-ANG.SolarInGrid": "0"})
    assert cfg.angles.solar_in_grid is False


def test_cli_subprocess_end_to_end(tmp_path):
    """The REAL CLI entry in a fresh process (no conftest platform setup):
    r5 caught the accelerator-only platform list crashing the f64 Mie/CPU
    lookup — only a subprocess run exercises the CLI's own jax config."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    p = subprocess.run(
        [sys.executable, "-m", "radiativetransfer_sos_tpu.cli",
         "-SOS_Main.Wa", "0.550", "-SOS_Main.ResRoot", str(tmp_path),
         "-ANG.Rad.NbGauss", "8", "-ANG.Thetas", "35.",
         "-SOS.View", "1", "-SOS.View.Phi", "0.",
         "-AP.HR", "8.0", "-AP.AbsProfile.Type", "7",
         "-SURF.Type", "0", "-SURF.Alb", "0.1", "-SOS.IGmax", "20"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))
    assert p.returncode == 0, p.stderr[-2000:]
    assert "JOB_STATUS=OK" in p.stdout
    up = tmp_path / "SOS" / "SOS_Up.txt"
    assert up.exists()
    rows = [ln for ln in up.read_text().splitlines()
            if ln and not ln.startswith("#")]
    assert len(rows) == 18          # (8 Gauss + solar slot) x half-planes
