"""Multiband (case-batched) solve == per-case solves.

The LUT workload: several (wavelength x geometry x aerosol) cases, each
with its own kernels/profiles/surface, solved in ONE device dispatch
(solver.solve_fourier_multiband).  Every result must match the
corresponding single-case solve exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_sos_tpu import precision, solver


def _cases(n_cases=3, n_terms=3, os_nb=24, **kw):
    base = precision.demo_problem(jnp.float64, n_gauss=8, nt=40,
                                  os_nb=os_nb, igmax=15, n_terms=n_terms,
                                  **kw)
    rng = np.random.default_rng(5)
    cases = []
    for c in range(n_cases):
        scale_k = float(rng.uniform(0.6, 1.0))
        scale_h = float(rng.uniform(0.7, 1.4))
        rho = float(rng.uniform(0.0, 0.4))
        inp = base.inp._replace(
            k_aer=base.inp.k_aer * scale_k,
            h=base.inp.h * scale_h,
            surface=solver.SurfaceInputs(rho=jnp.asarray(rho)))
        cases.append(inp)
    return cases, base.opt


def _stack(cases):
    c0 = cases[0]
    return c0._replace(
        h=jnp.stack([c.h for c in cases]),
        xdel=jnp.stack([c.xdel for c in cases]),
        ydel=jnp.stack([c.ydel for c in cases]),
        k_aer=jnp.stack([c.k_aer for c in cases]),
        k_mol=jnp.stack([c.k_mol for c in cases]),
        tab=jnp.stack([jnp.asarray(c.tab) for c in cases]),
        surface=solver.SurfaceInputs(
            rho=jnp.stack([c.surface.rho for c in cases])))


def test_multiband_matches_per_case():
    cases, opt = _cases()
    stacked = _stack(cases)
    mb = solver.solve_fourier_multiband_jit(stacked, opt)
    for c, inp in enumerate(cases):
        ref = solver.solve_fourier_batch_jit(inp, opt)
        np.testing.assert_array_equal(np.asarray(mb.i3bnd[c]),
                                      np.asarray(ref.i3bnd))
        np.testing.assert_array_equal(np.asarray(mb.emoins[c]),
                                      np.asarray(ref.emoins))


def test_multiband_blocked_matches_full():
    """Blocked multiband dispatch == all-orders multiband after the
    per-case stop mask; every case exits at its own order."""
    cases, opt = _cases(n_cases=2, n_terms=2)
    stacked = _stack(cases)
    full = solver.solve_fourier_multiband_jit(stacked, opt)
    blk = solver.solve_fourier_multiband_blocked(stacked, opt, block=8)

    def masked(res, c, t):
        m = np.asarray(solver.fourier_stop_mask(np.asarray(res.i3bnd)[c, t]))
        return m[:, None, None] * np.asarray(res.i3bnd)[c, t]

    for c in range(2):
        for t in range(2):
            np.testing.assert_allclose(masked(blk, c, t), masked(full, c, t),
                                       rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(np.asarray(blk.emoins),
                               np.asarray(full.emoins), rtol=1e-13)


def test_sos_run_many_batched_matches_sequential():
    """lut.sos_run_many(batch_cases=True) == the sequential path on a
    mixed sweep: cases differ in AOT and albedo (one multiband group) and
    in solar angle (forces a second group: different angle grid)."""
    from radiativetransfer_sos_tpu import lut
    from radiativetransfer_sos_tpu.config import SosConfig

    base = SosConfig(wavelength=0.55)
    base.angles.thetas_deg = 35.0
    base.angles.nbmu_lum = 10
    base.surface.alb = 0.1
    base.absorption.absprofil = 7
    base.view.itrphi = 1
    base.view.phi_deg = 0.0
    base.igmax = 12
    cases = lut.sweep_configs(base, {"surface.alb": [0.0, 0.25],
                                     "angles.thetas_deg": [35.0, 50.0]})
    assert len(cases) == 4
    seq = lut.sos_run_many(cases)
    bat = lut.sos_run_many(cases, batch_cases=True)
    for r_s, r_b in zip(seq, bat):
        np.testing.assert_allclose(r_b.up["i"], r_s.up["i"],
                                   rtol=1e-12, atol=0)
        np.testing.assert_allclose(r_b.up["q"], r_s.up["q"],
                                   rtol=1e-10, atol=1e-300)
        np.testing.assert_allclose(r_b.emoins, r_s.emoins, rtol=1e-12)
        np.testing.assert_allclose(r_b.eplus, r_s.eplus, rtol=1e-12)


def test_multiband_zout_matches_per_case():
    """Case axis composes with the arbitrary-output-altitude path: zprof
    and zout_km vmap per case."""
    cases, opt = _cases(n_cases=2, n_terms=2)
    nt1 = cases[0].h.shape[1]
    rng = np.random.default_rng(9)
    zs, zouts = [], []
    for c in range(2):
        zs.append(jnp.asarray(np.linspace(40.0 + c, 0.0, nt1))[None]
                  .repeat(2, axis=0))
        zouts.append(jnp.asarray(5.0 + 3.0 * c))
    cases = [inp._replace(zprof=z, zout_km=zo)
             for inp, z, zo in zip(cases, zs, zouts)]
    opt = opt._replace(use_zout=True)
    stacked = _stack(cases)._replace(zprof=jnp.stack(zs),
                                     zout_km=jnp.stack(zouts))
    mb = solver.solve_fourier_multiband_jit(stacked, opt)
    for c, inp in enumerate(cases):
        ref = solver.solve_fourier_batch_jit(inp, opt)
        np.testing.assert_array_equal(np.asarray(mb.i3z[c]),
                                      np.asarray(ref.i3z))
        np.testing.assert_array_equal(np.asarray(mb.tauout[c]),
                                      np.asarray(ref.tauout))


def test_multiband_sharded_matches_local():
    """Case axis sharded over the virtual 8-device scene mesh == the
    unsharded multiband solve (the pod-scale LUT layout: no collective
    at all, cases are embarrassingly parallel)."""
    from radiativetransfer_sos_tpu.parallel import (make_mesh,
                                                    solve_multiband_sharded)

    cases, opt = _cases(n_cases=8, n_terms=2)
    stacked = _stack(cases)
    local = solver.solve_fourier_multiband_jit(stacked, opt)
    mesh = make_mesh(n_scene=8, n_fourier=1)
    shard = solve_multiband_sharded(mesh, stacked, opt)
    np.testing.assert_allclose(np.asarray(shard.i3bnd),
                               np.asarray(local.i3bnd), rtol=1e-12,
                               atol=1e-300)
    np.testing.assert_allclose(np.asarray(shard.emoins),
                               np.asarray(local.emoins), rtol=1e-13)


def test_sos_run_many_batched_with_surface_matrices():
    """Batched path with per-case Fourier surface matrices (glitter):
    rmat stacks on the case axis and the blocked multiband driver slices
    its order axis at position 1."""
    from radiativetransfer_sos_tpu import lut
    from radiativetransfer_sos_tpu.config import SosConfig

    base = SosConfig(wavelength=0.55)
    base.angles.thetas_deg = 35.0
    base.angles.nbmu_lum = 8
    base.surface.type = 1
    base.surface.wind = 3.0
    base.surface.ind = 1.34
    base.surface.alb = 0.0
    base.absorption.absprofil = 7
    base.view.itrphi = 1
    base.view.phi_deg = 0.0
    base.igmax = 10
    cases = lut.sweep_configs(base, {"profile.mot": [0.05, 0.12]})
    seq = lut.sos_run_many(cases)
    bat = lut.sos_run_many(cases, batch_cases=True)
    for r_s, r_b in zip(seq, bat):
        np.testing.assert_allclose(r_b.up["i"], r_s.up["i"],
                                   rtol=1e-12, atol=0)
        np.testing.assert_allclose(r_b.emoins, r_s.emoins, rtol=1e-12)


def test_sos_run_many_batched_checkpoint_resume(tmp_path):
    """batch_cases composes with checkpoint/resume: first run writes one
    pickle per case, second run loads them all without solving."""
    from radiativetransfer_sos_tpu import lut
    from radiativetransfer_sos_tpu.config import SosConfig

    base = SosConfig(wavelength=0.55)
    base.angles.thetas_deg = 35.0
    base.angles.nbmu_lum = 8
    base.surface.alb = 0.1
    base.absorption.absprofil = 7
    base.view.itrphi = 1
    base.view.phi_deg = 0.0
    base.igmax = 8
    cases = lut.sweep_configs(base, {"surface.alb": [0.0, 0.2, 0.4]})
    r1 = lut.sos_run_many(cases, checkpoint_dir=str(tmp_path),
                          batch_cases=True)
    assert len(list(tmp_path.glob("*.pkl"))) == 3
    r2 = lut.sos_run_many(cases, checkpoint_dir=str(tmp_path),
                          batch_cases=True)
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(a.up["i"]),
                                      np.asarray(b.up["i"]))


def test_multiband_blocked_skips_tail():
    cases, opt = _cases(n_cases=2, n_terms=2, os_nb=64)
    stacked = _stack(cases)
    blk = solver.solve_fourier_multiband_blocked(stacked, opt, block=4)
    bnd = np.asarray(blk.i3bnd)
    zero_tail = np.all(bnd == 0.0, axis=(0, 1, 3, 4))
    assert zero_tail[-1], "no undispatched trailing orders"


def test_flattened_zout_sweep_matches_sequential():
    """The flatten fast path (cases sharing kernels) with an arbitrary
    output altitude: per-case tauout comes from the flat per-term vector."""
    from radiativetransfer_sos_tpu import lut
    from radiativetransfer_sos_tpu.config import SosConfig

    base = SosConfig(wavelength=0.55)
    base.angles.thetas_deg = 35.0
    base.angles.nbmu_lum = 8
    base.surface.alb = 0.1
    base.absorption.absprofil = 7
    base.view.zout_km = 5.0
    base.igmax = 10
    cases = lut.sweep_configs(base, {"surface.alb": [0.0, 0.2, 0.4]})
    seq = lut.sos_run_many(cases)
    bat = lut.sos_run_many(cases, batch_cases=True)
    for r_s, r_b in zip(seq, bat):
        np.testing.assert_array_equal(np.asarray(r_b.up["i"]),
                                      np.asarray(r_s.up["i"]))
        np.testing.assert_allclose(r_b.tauout, r_s.tauout, rtol=1e-12)
        assert r_b.tauout > 0.0
