"""Differential oracle coverage for the paths VERDICT round-1 flagged:

* ZOUT (arbitrary output altitude) with BRDF matrices / flat-sea Fresnel —
  the ``rii_full`` direct-reflection bookkeeping (``solver.py``,
  reference ``src/SOS_OS.F:1062-1079, 1431-1435``);
* scalar mode ``ipolar=0`` end to end (``src/SOS_OS.F:689-699``);
* one pinned larger-shape case (NT=100, IBORM=40).
"""

import jax.numpy as jnp
import numpy as np

from radiativetransfer_sos_tpu import angles, gsf, kernels, solver
from tests.oracle import fortran_ref as ref


def _signed(grid):
    n = grid.n
    rmu = np.zeros(2 * n + 1)
    rmu[n + 1:] = grid.mu
    rmu[:n] = -grid.mu[::-1]
    rmu[n] = grid.mus
    ga = np.zeros(2 * n + 1)
    ga[n + 1:] = grid.w
    ga[:n] = grid.w[::-1]
    return rmu, ga


def _profile(nt, tau_tot, frac_aer):
    h = tau_tot * (1.0 - np.exp(-np.linspace(0.0, 6.0, nt + 1))) \
        / (1.0 - np.exp(-6.0))
    h[0] = 0.0
    xdel = np.full(nt + 1, frac_aer)
    ydel = np.full(nt + 1, 1.0 - frac_aer)
    zprof = np.linspace(30.0, 0.0, nt + 1)
    return h, xdel, ydel, zprof


def _hg(os_nb, g=0.5, pol=0.2):
    l = np.arange(os_nb + 1)
    beta = (2 * l + 1.0) * g ** l
    gamma = np.zeros(os_nb + 1)
    alpha = np.zeros(os_nb + 1)
    zeta = np.zeros(os_nb + 1)
    gamma[2:] = -pol * beta[2:] * 0.5
    alpha[2:] = pol * beta[2:]
    zeta[2:] = 0.3 * pol * beta[2:]
    return alpha, beta, gamma, zeta


def _run_both(nt=16, n_gauss=6, os_nb=8, rho=0.1, use_rmat=False,
              use_fresnel=False, zout=None, ipolar=True, igmax=20,
              thetas=41.0, seed=0):
    grid = angles.make_radiance_grid(thetas, n_gauss=n_gauss)
    n = grid.n
    h, xdel, ydel, zprof = _profile(nt, 0.3, frac_aer=0.4)
    iborm = os_nb
    ron = 0.0279
    a, b, g, z = _hg(os_nb)
    ind_surf = 1.34

    rng = np.random.default_rng(seed)
    if use_rmat:
        rmat = 0.05 * rng.random((iborm + 1, 3, 3, n, n))
        rmat[:, 0, 0] += 0.1
        rmat = rmat.astype(np.float32).astype(np.float64)
    else:
        rmat = np.zeros((iborm + 1, 3, 3, n, n))

    psl, rsl, tsl = map(jnp.asarray, gsf.gsf_basis(grid.mu, grid.mus, os_nb,
                                                   iborm + 1))
    k_aer = kernels.aerosol_kernel(psl, rsl, tsl, a, b, g, z, ipolar)
    k_mol = kernels.molecular_kernel(psl, rsl, tsl, ron, ipolar)
    if use_fresnel:
        rmu_signed, _ = _signed(grid)
        f11, f12, f33 = ref.mat_fresnel_plan_refl(
            n, np.concatenate([rmu_signed[:n], [grid.mus],
                               rmu_signed[n + 1:]]),
            ind_surf, 1 if ipolar else 0)
    else:
        f11 = f12 = f33 = np.zeros(n + 1)

    surf = solver.SurfaceInputs(
        rho=jnp.asarray(rho),
        rmat=jnp.asarray(rmat) if use_rmat else None,
        f11=jnp.asarray(f11), f12=jnp.asarray(f12), f33=jnp.asarray(f33),
        ind_surf=jnp.asarray(ind_surf))
    inp = solver.SolveInputs(
        h=jnp.asarray(h), xdel=jnp.asarray(xdel), ydel=jnp.asarray(ydel),
        k_aer=k_aer, k_mol=k_mol, mu_pos=jnp.asarray(grid.mu),
        w_pos=jnp.asarray(grid.w), tab=jnp.asarray(grid.mus), n0=grid.imus,
        surface=surf,
        zprof=jnp.asarray(zprof) if zout is not None else None,
        zout_km=jnp.asarray(float(zout)) if zout is not None else None)
    opt = solver.SolveOptions(igmax=igmax, imat_surf=use_rmat,
                              ifresnel=use_fresnel, ipolar=ipolar,
                              use_zout=zout is not None)
    res = solver.solve_fourier_jit(inp, opt)

    rmu, ga = _signed(grid)
    records = None
    if use_rmat:
        records = []
        for s in range(iborm + 1):
            rec = np.zeros((9, n, n))
            for so in range(3):
                for si in range(3):
                    rec[so * 3 + si] = rmat[s, so, si]
            records.append(rec)
    orc = ref.sos_os(n, rmu, ga, os_nb, nt, grid.imus + 1,
                     grid.thetas_deg, rho, 1 if use_rmat else 0,
                     1 if use_fresnel else 0, ind_surf, h, xdel.copy(),
                     ydel.copy(), ron, a, b, g, z, igmax, iborm,
                     ipolar=1 if ipolar else 0, rmat_records=records,
                     zout=zout, zprof=zprof)
    return res, orc


def _compare(res, orc, rtol=1e-9, atol=1e-13):
    i3z = np.asarray(res.i3z)
    for s, (q3, u3, i3) in enumerate(orc["records"]):
        np.testing.assert_allclose(i3z[s, 0], i3, atol=atol, rtol=rtol,
                                   err_msg=f"I IS={s}")
        np.testing.assert_allclose(i3z[s, 1], q3, atol=atol, rtol=rtol,
                                   err_msg=f"Q IS={s}")
        np.testing.assert_allclose(i3z[s, 2], u3, atol=atol, rtol=rtol,
                                   err_msg=f"U IS={s}")
    mask = np.asarray(solver.fourier_stop_mask(res.i3bnd))
    assert mask.sum() == len(orc["records"])


def test_zout_lambertian_vs_oracle():
    res, orc = _run_both(zout=8.0)
    _compare(res, orc)


def test_zout_brdf_matrix_vs_oracle():
    """The per-level direct-reflection bookkeeping (rii_full) under ZOUT —
    SURVEY's 'easy to get subtly wrong' add-back path."""
    res, orc = _run_both(zout=8.0, use_rmat=True)
    _compare(res, orc)


def test_zout_glitter_full_vs_oracle():
    res, orc = _run_both(zout=5.0, use_rmat=True, use_fresnel=True,
                         rho=0.02, seed=3)
    _compare(res, orc)


def test_zout_fresnel_only_vs_oracle():
    res, orc = _run_both(zout=12.0, rho=0.0, use_fresnel=True)
    _compare(res, orc)


def test_ipolar0_scalar_mode_vs_oracle():
    """ipolar=0: polarized coefficients cut (src/SOS_OS.F:689-699); Q/U
    must vanish and I must match the oracle's scalar run."""
    res, orc = _run_both(ipolar=False, rho=0.1)
    _compare(res, orc)
    i3z = np.asarray(res.i3z)
    np.testing.assert_allclose(i3z[:, 1:], 0.0, atol=1e-15)


def test_ipolar0_fresnel_vs_oracle():
    res, orc = _run_both(ipolar=False, rho=0.0, use_fresnel=True)
    _compare(res, orc)


def test_pinned_larger_shape_vs_oracle():
    """One larger pinned case: NT=100, IBORM=40 (VERDICT round-1 weak #4).
    The oracle is loop-level Python, so this is the one big differential
    case — keep n_gauss modest."""
    res, orc = _run_both(nt=100, n_gauss=8, os_nb=40, rho=0.1, igmax=12,
                         seed=7)
    _compare(res, orc)
