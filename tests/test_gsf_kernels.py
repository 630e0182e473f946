"""GSF basis and Fourier kernels vs the loop-level oracle transcription."""

import numpy as np
import jax.numpy as jnp

from radiativetransfer_sos_tpu import angles, gsf, kernels
from tests.oracle import fortran_ref as ref


def _signed_rmu(grid):
    n = grid.n
    rmu = np.zeros(2 * n + 1)
    rmu[n + 1:] = grid.mu
    rmu[:n] = -grid.mu[::-1]
    rmu[n] = grid.mus
    return rmu


def test_gsf_matches_oracle():
    g = angles.make_radiance_grid(42.0, n_gauss=8)
    n, os_nb = g.n, 16
    rmu = _signed_rmu(g)
    zero = np.zeros(os_nb + 1)
    for is_order in (0, 1, 2, 3, 7, 16):
        psl, rsl, tsl = gsf.gsf_signed(is_order, g.mu, g.mus, os_nb)
        xpl, xrl, xtl, *_ = ref.sos_noyaux(is_order, n, rmu, os_nb,
                                           zero, zero, zero, zero)
        np.testing.assert_allclose(psl[2], xpl, atol=1e-13)
        np.testing.assert_allclose(rsl[2], xrl, atol=1e-13)
        np.testing.assert_allclose(tsl[2], xtl, atol=1e-13)


def test_kernels_match_oracle():
    rng = np.random.default_rng(0)
    g = angles.make_radiance_grid(42.0, n_gauss=6)
    n, os_nb = g.n, 10
    rmu = _signed_rmu(g)
    alpha = rng.normal(size=os_nb + 1)
    beta = rng.normal(size=os_nb + 1)
    gamma = rng.normal(size=os_nb + 1)
    zeta = rng.normal(size=os_nb + 1)

    n_fourier = 5
    psl, rsl, tsl = gsf.gsf_basis(g.mu, g.mus, os_nb, n_fourier)
    kblk = kernels.aerosol_kernel(jnp.asarray(psl), jnp.asarray(rsl),
                                  jnp.asarray(tsl), alpha, beta, gamma, zeta)
    kblk = np.asarray(kblk)

    for s in range(n_fourier):
        _, _, _, bp, gr, gt, arr, art, att = ref.sos_noyaux(
            s, n, rmu, os_nb, alpha, beta, gamma, zeta)
        # block layout: P[0,0]=BP(k,j) (symmetric), P[0,1](k,j)=GR(k,j),
        # P[0,2]=-GT(k,j), P[1,0](k,j)=GR(j,k), P[1,1]=ARR, P[1,2](k,j)=-ART(j,k)
        # P[2,0](k,j)=-GT(j,k), P[2,1]=-ART(k,j), P[2,2]=ATT
        np.testing.assert_allclose(kblk[s, 0, 0], bp, atol=1e-12)
        np.testing.assert_allclose(kblk[s, 0, 1], gr, atol=1e-12)
        np.testing.assert_allclose(kblk[s, 0, 2], -gt, atol=1e-12)
        np.testing.assert_allclose(kblk[s, 1, 0], gr.T, atol=1e-12)
        np.testing.assert_allclose(kblk[s, 1, 1], arr, atol=1e-12)
        np.testing.assert_allclose(kblk[s, 1, 2], -art.T, atol=1e-12)
        np.testing.assert_allclose(kblk[s, 2, 0], -gt.T, atol=1e-12)
        np.testing.assert_allclose(kblk[s, 2, 1], -art, atol=1e-12)
        np.testing.assert_allclose(kblk[s, 2, 2], att, atol=1e-12)


def test_molecular_kernel_matches_rayleigh_oracle():
    """The molecular kernel equals the oracle kernels built with the
    Rayleigh GSF coefficients beta=[1,0,b2], gamma=[0,0,g2], alpha=[0,0,a2]."""
    g = angles.make_radiance_grid(30.0, n_gauss=6)
    n = g.n
    rmu = _signed_rmu(g)
    ron = 0.0279
    b0, b2, g2, a2 = kernels.molecular_coeffs(ron)

    n_fourier = 4
    os_nb = 8
    psl, rsl, tsl = gsf.gsf_basis(g.mu, g.mus, os_nb, n_fourier)
    kmol = np.asarray(kernels.molecular_kernel(
        jnp.asarray(psl), jnp.asarray(rsl), jnp.asarray(tsl), ron))

    for s in range(n_fourier):
        beta = np.zeros(os_nb + 1)
        gamma = np.zeros(os_nb + 1)
        alpha = np.zeros(os_nb + 1)
        zeta = np.zeros(os_nb + 1)
        if s == 0:
            beta[0] = b0
        beta[2] = b2
        gamma[2] = g2
        alpha[2] = a2
        _, _, _, bp, gr, gt, arr, art, att = ref.sos_noyaux(
            s, n, rmu, os_nb, alpha, beta, gamma, zeta)
        if s > 2:
            bp = np.zeros_like(bp); gr = np.zeros_like(gr); gt = np.zeros_like(gt)
            arr = np.zeros_like(arr); art = np.zeros_like(art); att = np.zeros_like(att)
        np.testing.assert_allclose(kmol[s, 0, 0], bp, atol=1e-12)
        np.testing.assert_allclose(kmol[s, 0, 1], gr, atol=1e-12)
        np.testing.assert_allclose(kmol[s, 1, 1], arr, atol=1e-12)
        np.testing.assert_allclose(kmol[s, 2, 2], att, atol=1e-12)
        np.testing.assert_allclose(kmol[s, 2, 1], -art, atol=1e-12)
