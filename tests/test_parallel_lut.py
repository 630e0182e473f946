"""Mesh-sharded pipeline and batched LUT production."""

import numpy as np
import jax
import pytest

from radiativetransfer_sos_tpu.config import (AbsConfig, AngleConfig,
                                              SosConfig, SurfaceConfig,
                                              ViewConfig)
from radiativetransfer_sos_tpu import lut
from radiativetransfer_sos_tpu.parallel import make_mesh, pad_terms
from radiativetransfer_sos_tpu.proc import run, sos_run


def _cfg(**kw):
    cfg = SosConfig(
        wavelength=kw.pop("wavelength", 0.5),
        angles=AngleConfig(thetas_deg=30.0, nbmu_lum=8, nbmu_mie=8),
        surface=SurfaceConfig(type=0, alb=kw.pop("alb", 0.1)),
        absorption=AbsConfig(absprofil=7),
        view=ViewConfig(itrphi=1, phi_deg=0.0),
        igmax=12)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_pad_terms():
    assert pad_terms(5, 4) == 8
    assert pad_terms(8, 4) == 8
    assert pad_terms(1, 8) == 8


def test_sharded_run_matches_unsharded():
    """The mesh-sharded CKD solve reproduces the single-device pipeline
    (the reference has no distributed mode; this is the framework's own
    consistency contract, SURVEY.md §4)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = make_mesh(len(jax.devices()), 1)
    cfg = _cfg()
    r0 = run(cfg)
    r1 = run(cfg, mesh=mesh)
    np.testing.assert_allclose(r1.records_up, r0.records_up,
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(r1.emoins, r0.emoins, rtol=1e-10)
    np.testing.assert_allclose(r1.eplus, r0.eplus, rtol=1e-10)


def test_sharded_run_2d_mesh_matches_unsharded():
    """(scene x fourier) production mesh through proc.run: the kernel
    Fourier axis shards across devices (orders are independent,
    src/SOS_OS.F:872) and the IS=0 fluxes are psum-recovered."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    mesh = make_mesh(4, 2)
    cfg = _cfg()
    r0 = run(cfg)
    r1 = run(cfg, mesh=mesh)
    np.testing.assert_allclose(r1.records_up, r0.records_up,
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(r1.emoins, r0.emoins, rtol=1e-10)
    np.testing.assert_allclose(r1.eplus, r0.eplus, rtol=1e-10)
    np.testing.assert_allclose(r1.ttot_vrai, r0.ttot_vrai, rtol=1e-12)


def test_sharded_run_2d_mesh_with_zout():
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = make_mesh(2, 2)
    cfg = _cfg()
    cfg.view.zout_km = 8.0
    r0 = run(cfg)
    r1 = run(cfg, mesh=mesh)
    np.testing.assert_allclose(r1.records_up, r0.records_up,
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(r1.tauout, r0.tauout, rtol=1e-10)


def test_sweep_configs_cartesian():
    base = _cfg()
    cases = lut.sweep_configs(base, {"wavelength": [0.44, 0.55],
                                     "surface.alb": [0.0, 0.1, 0.3]})
    assert len(cases) == 6
    assert {c.wavelength for c in cases} == {0.44, 0.55}
    assert {c.surface.alb for c in cases} == {0.0, 0.1, 0.3}
    # the base is untouched
    assert base.surface.alb == 0.1


def test_sos_run_many_checkpoint_resume(tmp_path):
    cases = lut.sweep_configs(_cfg(), {"surface.alb": [0.0, 0.2]})
    seen = []
    res1 = lut.sos_run_many(cases, checkpoint_dir=str(tmp_path),
                            on_result=lambda i, c, r: seen.append(i))
    assert seen == [0, 1]
    assert len(list(tmp_path.glob("*.pkl"))) == 2
    # higher albedo -> brighter upward field
    assert res1[1].up["i"].max() > res1[0].up["i"].max()

    # resume: results come from the checkpoint, bit-identical
    res2 = lut.sos_run_many(cases, checkpoint_dir=str(tmp_path))
    np.testing.assert_array_equal(res2[0].records_up, res1[0].records_up)
    np.testing.assert_array_equal(res2[1].records_up, res1[1].records_up)


def test_case_key_distinguishes_physics():
    a, b = lut.sweep_configs(_cfg(), {"surface.alb": [0.0, 0.2]})
    assert lut.case_key(a) != lut.case_key(b)
    assert lut.case_key(a) == lut.case_key(a)


def test_sharded_blocked_matches_unsharded_blocked():
    """Blocked Fourier dispatch composed with the scene mesh == the
    single-device blocked driver (VERDICT r2 #8)."""
    import jax.numpy as jnp
    from radiativetransfer_sos_tpu import precision, solver
    from radiativetransfer_sos_tpu.parallel import (
        solve_terms_sharded_blocked)
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = make_mesh(4, 1)
    prob = precision.demo_problem(jnp.float64, n_gauss=6, nt=30, os_nb=16,
                                  igmax=12, n_terms=4)
    ref = solver.solve_fourier_blocked(prob.inp, prob.opt, block=8)
    got = solve_terms_sharded_blocked(mesh, prob.inp, prob.opt, block=8)
    n_s = min(ref.i3bnd.shape[1], got.i3bnd.shape[1])
    np.testing.assert_allclose(np.asarray(got.i3bnd)[:, :n_s],
                               np.asarray(ref.i3bnd)[:, :n_s],
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(np.asarray(got.emoins),
                               np.asarray(ref.emoins), rtol=1e-13)
