"""Surface reflection matrices + solver surface paths vs oracle."""

import numpy as np
import jax.numpy as jnp

from radiativetransfer_sos_tpu import angles, gsf, kernels, solver
from radiativetransfer_sos_tpu.surface import (fresnel_expansion,
                                               glitter_matrices, gsf_fourier)
from radiativetransfer_sos_tpu.surface.fresnel import fresnel_elements
from tests.oracle import fortran_ref as ref
from tests.test_solver_vs_oracle import _exp_profile, _hg_coeffs, _signed


def test_gsf_fourier_recomposes_g():
    grid = angles.make_radiance_grid(35.0, n_gauss=10)
    sig = 0.003 + 0.00512 * 2.0
    os_nm = 128
    e, il = gsf_fourier(grid.mu, sig, os_nm)
    # recomposition at phi=0 must match GMAX within the reference's 1e-3
    # stop threshold (src/SOS_GLITTER.F:666-686)
    c1 = grid.mu[:, None]
    c2 = grid.mu[None, :]
    c12 = c1 * c2
    s12 = np.sqrt(1 - c1 ** 2) * np.sqrt(1 - c2 ** 2)
    cs12 = 0.5 * (c1 + c2) ** 2
    x = (1.0 - (-c12 + s12)) / cs12
    gmax = x * x * np.exp(-(x - 1.0) / sig)
    t1 = e[..., 0] + 2.0 * e[..., 1:].sum(axis=-1)
    rel = np.abs(t1 - gmax) / gmax
    # pairs that exhausted OS_NM without meeting the 1e-3 criterion exist in
    # the reference too (IL=OS_NM fallback, src/SOS_GLITTER.F:687); the
    # guarantee only holds for converged pairs
    converged = il < os_nm
    assert converged.mean() > 0.9
    assert np.max(np.where(converged, rel, 0.0)) < 2e-3, np.max(rel)


def test_fresnel_expansion_recomposes():
    grid = angles.make_radiance_grid(35.0, n_gauss=12)
    alpha, beta, gamma, zeta = fresnel_expansion(grid.mu, grid.w, 1.34,
                                                 os_ns=2 * grid.n_gauss)
    from radiativetransfer_sos_tpu.legendre import legendre_table
    mu_s = np.concatenate([-grid.mu, grid.mu])
    r11, _, _ = fresnel_elements(mu_s, 1.34)
    pl = legendre_table(mu_s, beta.shape[0] - 1)
    recomposed = beta @ pl
    np.testing.assert_allclose(recomposed, r11, atol=2e-3)


def test_glitter_matrices_basic():
    grid = angles.make_radiance_grid(35.0, n_gauss=8)
    os_nb, os_ns = 8, 16
    rmat = glitter_matrices(grid.mu, grid.w, wind=5.0, ind=1.34,
                            os_nb=os_nb, os_ns=os_ns, os_nm=os_nb + os_ns)
    assert rmat.shape == (os_nb + 1, 3, 3, grid.n, grid.n)
    # P11 reciprocity (symmetric pair grid + symmetric BP kernel)
    np.testing.assert_allclose(rmat[:, 0, 0], rmat[:, 0, 0].swapaxes(-1, -2),
                               rtol=1e-5, atol=1e-8)
    assert np.all(np.isfinite(rmat))
    # individual Fourier components may be negative; the azimuth-recomposed
    # intensity reflection (phi = 0, specular plane) must be positive
    coef = np.where(np.arange(os_nb + 1) == 0, 1.0, 2.0)
    recomposed = np.einsum("s,sab->ab", coef, rmat[:, 0, 0])
    assert np.all(recomposed > -1e-6), recomposed.min()


def _run_both_with_surface(rho, use_rmat, use_fresnel, seed=0):
    grid = angles.make_radiance_grid(41.0, n_gauss=6)
    n = grid.n
    h, xdel, ydel = _exp_profile(16, 0.3, frac_aer=0.4)
    os_nb = 8
    iborm = os_nb
    ron = 0.0279
    a, b, g, z = _hg_coeffs(os_nb, g=0.5)
    ind_surf = 1.34

    rng = np.random.default_rng(seed)
    if use_rmat:
        rmat = 0.05 * rng.random((iborm + 1, 3, 3, n, n))
        rmat[:, 0, 0] += 0.1
        rmat = rmat.astype(np.float32).astype(np.float64)
    else:
        rmat = np.zeros((iborm + 1, 3, 3, n, n))

    # JAX
    psl, rsl, tsl = map(jnp.asarray, gsf.gsf_basis(grid.mu, grid.mus, os_nb,
                                                   iborm + 1))
    k_aer = kernels.aerosol_kernel(psl, rsl, tsl, a, b, g, z)
    k_mol = kernels.molecular_kernel(psl, rsl, tsl, ron, True)
    if use_fresnel:
        rmu_signed, _ = _signed(grid)
        f11, f12, f33 = ref.mat_fresnel_plan_refl(
            n, np.concatenate([rmu_signed[:n], [grid.mus], rmu_signed[n + 1:]]),
            ind_surf, 1)
    else:
        f11 = f12 = f33 = np.zeros(n + 1)
    surf = solver.SurfaceInputs(
        rho=jnp.asarray(rho), rmat=jnp.asarray(rmat),
        f11=jnp.asarray(f11), f12=jnp.asarray(f12), f33=jnp.asarray(f33),
        ind_surf=jnp.asarray(ind_surf))
    inp = solver.SolveInputs(
        h=jnp.asarray(h), xdel=jnp.asarray(xdel), ydel=jnp.asarray(ydel),
        k_aer=k_aer, k_mol=k_mol, mu_pos=jnp.asarray(grid.mu),
        w_pos=jnp.asarray(grid.w), tab=jnp.asarray(grid.mus), n0=grid.imus,
        surface=surf)
    opt = solver.SolveOptions(igmax=20, imat_surf=use_rmat,
                              ifresnel=use_fresnel)
    res = solver.solve_fourier_jit(inp, opt)

    # oracle
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
    orc = ref.sos_os(n, rmu, ga, os_nb, len(h) - 1, grid.imus + 1,
                     grid.thetas_deg, rho, 1 if use_rmat else 0,
                     1 if use_fresnel else 0, ind_surf, h, xdel.copy(),
                     ydel.copy(), ron, a, b, g, z, 20, iborm,
                     rmat_records=records)
    return res, orc


def _compare(res, orc):
    i3z = np.asarray(res.i3z)
    for s, (q3, u3, i3) in enumerate(orc["records"]):
        np.testing.assert_allclose(i3z[s, 0], i3, atol=1e-13, rtol=1e-9,
                                   err_msg=f"I IS={s}")
        np.testing.assert_allclose(i3z[s, 1], q3, atol=1e-13, rtol=1e-9,
                                   err_msg=f"Q IS={s}")
        np.testing.assert_allclose(i3z[s, 2], u3, atol=1e-13, rtol=1e-9,
                                   err_msg=f"U IS={s}")
    mask = np.asarray(solver.fourier_stop_mask(res.i3bnd))
    assert mask.sum() == len(orc["records"])


def test_solver_brdf_matrix_vs_oracle():
    res, orc = _run_both_with_surface(rho=0.1, use_rmat=True,
                                      use_fresnel=False)
    _compare(res, orc)


def test_solver_fresnel_flat_sea_vs_oracle():
    res, orc = _run_both_with_surface(rho=0.0, use_rmat=False,
                                      use_fresnel=True)
    _compare(res, orc)


def test_solver_glitter_full_vs_oracle():
    res, orc = _run_both_with_surface(rho=0.02, use_rmat=True,
                                      use_fresnel=True, seed=3)
    _compare(res, orc)


# ---------------------------------------------------------------------------
# Roujean BRDF and BPDF models
# ---------------------------------------------------------------------------

from radiativetransfer_sos_tpu.surface import (bpdf_matrices,  # noqa: E402
                                               maignan_fourier,
                                               nadal_fourier,
                                               rondeaux_fourier,
                                               roujean_fourier,
                                               roujean_matrices)
from radiativetransfer_sos_tpu.surface import brdf as brdf_mod  # noqa: E402
from tests.oracle import surface_ref  # noqa: E402

K012 = (0.2, 0.05, 0.1)


def test_roujean_fourier_vs_oracle():
    grid = angles.make_radiance_grid(35.0, n_gauss=6)
    os_nb = 8
    e, il = roujean_fourier(grid.mu, *K012, os_nb)
    for a in (0, 2, 5):
        for b in (1, 4):
            c1, c2 = grid.mu[a], grid.mu[b]
            s1, s2 = np.sqrt(1 - c1 ** 2), np.sqrt(1 - c2 ** 2)
            e_ref, il_ref = surface_ref.fsf_pair(
                lambda p: surface_ref.roujean_f_scalar(
                    *K012, c1, s1, c2, s2, np.pi - p),
                os_nb, 0.001, roujean_writer=True)
            np.testing.assert_allclose(e[a, b], e_ref, rtol=1e-9, atol=1e-14,
                                       err_msg=f"pair {a},{b}")
            assert il[a, b] == il_ref


def test_nadal_fourier_vs_oracle():
    grid = angles.make_radiance_grid(35.0, n_gauss=6)
    os_nb = 8
    ind, alpha, beta = 1.5, 0.2249, 8.1
    e, il = nadal_fourier(grid.mu, ind, alpha, beta, os_nb)
    for a in (0, 3):
        for b in (2, 5):
            c1, c2 = grid.mu[a], grid.mu[b]
            s1, s2 = np.sqrt(1 - c1 ** 2), np.sqrt(1 - c2 ** 2)
            e_ref, il_ref = surface_ref.fsf_pair(
                lambda p: surface_ref.nadal_f_scalar(
                    ind, alpha, beta, c1, s1, c2, s2, p),
                os_nb, 0.001, roujean_writer=False)
            np.testing.assert_allclose(e[a, b], e_ref, rtol=1e-9, atol=1e-14,
                                       err_msg=f"pair {a},{b}")
            assert il[a, b] == il_ref


def test_roujean_matrices_layout():
    grid = angles.make_radiance_grid(35.0, n_gauss=6)
    rmat = roujean_matrices(grid.mu, *K012, os_nb=8)
    assert rmat.shape == (9, 3, 3, grid.n, grid.n)
    # only P11 nonzero (src/SOS_ROUJEAN.F:1160-1168)
    assert np.all(rmat[:, 0, 1:] == 0) and np.all(rmat[:, 1:] == 0)
    # order-0 term positive and reciprocal-symmetric for a symmetric kernel
    assert np.all(rmat[0, 0, 0] > 0)
    np.testing.assert_allclose(rmat[0, 0, 0], rmat[0, 0, 0].T, rtol=1e-6)


def test_maignan_fourier_reference_quirk():
    """Maignan's G peaks at phi=pi (backscatter hotspot), the opposite of
    the glitter G the dyadic scheme was written for.  In the reference
    (src/SOS_SURFACE_BPDF.F:1495-1523 == src/SOS_GLITTER.F:641-664) the
    odd-order initial trapezoid Z = (G(0)-G(pi))/2 is then NEGATIVE, the
    signed test XT=|Z-Y|/Z < 1e-4 passes immediately, and the unrefined Z
    is stored; the stop test never converges so IL=OS_NM.  Fidelity
    requires reproducing exactly that."""
    grid = angles.make_radiance_grid(35.0, n_gauss=8)
    coef_c = 4.3
    os_nm = 16
    e, il = maignan_fourier(grid.mu, coef_c, os_nm=os_nm)
    c1, c2 = grid.mu[:, None], grid.mu[None, :]
    s12 = np.sqrt(1 - c1 ** 2) * np.sqrt(1 - c2 ** 2)

    def g(phi):
        phi = np.asarray(phi)
        c12, s12_ = np.broadcast_arrays(c1 * c2, s12)
        den = 1.0 / c1 + 1.0 / c2
        if phi.ndim:
            c12, s12_, den = (x[..., None] for x in (c12, s12_, den))
        cos_2i = c12 - s12_ * np.cos(phi)
        tan2 = np.maximum((1 - cos_2i) / (1 + cos_2i), 0.0)
        return coef_c * np.exp(-np.sqrt(tan2)) / den

    # reference fallback: no pair converges
    assert np.all(il == os_nm)
    # odd orders: the unrefined trapezoid (G(0) - G(pi))/2, same for all s
    z_odd = 0.5 * (g(0.0) - g(np.pi))
    for s in (1, 3, 7):
        np.testing.assert_allclose(e[..., s], z_odd, rtol=1e-12)
    # even orders: genuine refined estimates close to the true coefficients
    phi = np.pi * np.arange(4097) / 4096
    gtab = g(phi)
    for s in (0, 2):
        direct = np.trapezoid(gtab * np.cos(s * phi), phi, axis=-1) / np.pi
        np.testing.assert_allclose(e[..., s], direct, rtol=2e-3, atol=1e-5)
    # symmetric weight -> symmetric coefficients
    np.testing.assert_allclose(e, e.swapaxes(0, 1), rtol=1e-10, atol=1e-15)


def test_rondeaux_weight():
    grid = angles.make_radiance_grid(35.0, n_gauss=6)
    e = rondeaux_fourier(grid.mu, os_nm=8)
    c1, c2 = grid.mu[:, None], grid.mu[None, :]
    np.testing.assert_allclose(e[..., 0], c1 * c2 / (c1 + c2))
    assert np.all(e[..., 1:] == 0)


def test_bpdf_matrices_all_models():
    grid = angles.make_radiance_grid(35.0, n_gauss=6)
    os_nb, os_ns, os_nm = 6, 12, 18
    kw = dict(k0=K012[0], k1=K012[1], k2=K012[2], alpha=0.2, beta=8.0,
              coef_c=4.3)
    rj = roujean_matrices(grid.mu, *K012, os_nb)
    for model in ("rondeaux", "breon", "nadal", "maignan"):
        rmat = bpdf_matrices(model, grid.mu, grid.w, 1.5, os_nb, os_ns,
                             os_nm, **kw)
        assert rmat.shape == (os_nb + 1, 3, 3, grid.n, grid.n)
        assert np.all(np.isfinite(rmat))
        # polarization blocks present (BPDF) on top of the Roujean P11
        assert np.any(rmat[:, 1, 1] != 0)
        diff = rmat - rj
        assert np.any(diff[:, 0, 0] != 0)  # Fresnel-composed part in P11 too
