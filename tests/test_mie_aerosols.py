"""Mie kernel and aerosol property tests."""

import numpy as np
import jax.numpy as jnp

from radiativetransfer_sos_tpu import aerosols, angles, mie
from tests.oracle import mie_ref


def _grid(n=10):
    return angles.make_mie_grid(n)


def _signed_mu(g):
    return np.concatenate([-g.mu[::-1], [0.0], g.mu])


def test_mie_vs_bohren_huffman():
    g = _grid(10)
    mu_s = _signed_mu(g)
    rn, im = 1.44, -0.0085
    alphas = jnp.asarray([0.5, 2.0, 7.5, 24.0, 60.0])
    n_max = mie.series_order(60.0)
    pi_t, tau_t = mie.pi_tau_tables(mu_s, n_max)
    res = mie.mie_batch(alphas, rn, im, jnp.asarray(pi_t), jnp.asarray(tau_t),
                        n_max)
    # tolerances bounded by the reference's own series cutoff N2 = 2*alpha+5
    # (src/SOS_MIE.F:423), slightly below the Bohren-Huffman order.
    for i, x in enumerate(np.asarray(alphas)):
        qe, qs, gg, iph, qph, uph = mie_ref.mie_quantities(
            float(x), complex(rn, im), mu_s)
        np.testing.assert_allclose(float(res.qext[i]), qe, rtol=1e-6)
        np.testing.assert_allclose(float(res.qsca[i]), qs, rtol=1e-6)
        np.testing.assert_allclose(float(res.g[i]), gg, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(res.imie[i]), iph, rtol=1e-5,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(res.qmie[i]), qph, rtol=1e-4,
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(res.umie[i]), uph, rtol=1e-4,
                                   atol=1e-8)


def test_mie_phase_normalization():
    """Int P11 dOmega / 4pi = 1 -> sum_j w_j P11(mu_j) = 2 on the signed grid."""
    g = _grid(20)
    mu_s = _signed_mu(g)
    w_s = np.concatenate([g.w[::-1], [0.0], g.w])
    alphas = jnp.asarray([3.0, 15.0])
    n_max = mie.series_order(15.0)
    pi_t, tau_t = mie.pi_tau_tables(mu_s, n_max)
    res = mie.mie_batch(alphas, 1.33, -0.0, jnp.asarray(pi_t),
                        jnp.asarray(tau_t), n_max)
    for i in range(2):
        total = np.sum(w_s * np.asarray(res.imie[i]))
        np.testing.assert_allclose(total, 2.0, rtol=2e-3)


def test_granulometry_lognormal_and_expansion():
    g = _grid(20)
    sweep = mie.run_mie_sweep(_signed_mu(g), 1.40, -0.002, 1e-4, 40.0)
    phase = aerosols.integrate_granulometry(sweep, 1, 0.2, 0.6, 0.0,
                                            wavelength=0.55)
    assert 0.0 < phase.single_scattering_albedo < 1.0
    # phase normalization survives the size integration
    w_s = np.concatenate([g.w[::-1], [0.0], g.w])
    np.testing.assert_allclose(np.sum(w_s * phase.p11), 2.0, rtol=5e-3)

    exp = aerosols.decompose_legendre(phase, g.mu, g.w, os_nb=2 * g.n,
                                      itronc=False)
    assert exp.coef_tronca == 0.0
    np.testing.assert_allclose(exp.beta[0], 1.0, rtol=1e-12)
    # asymmetry factor from beta(1): g = beta1/3
    g_mie = np.sum((sweep.qsca * sweep.g)[:, None] * 0)  # placeholder no-op
    assert -1.0 < exp.beta[1] / 3.0 < 1.0

    exp_t = aerosols.decompose_legendre(phase, g.mu, g.w, os_nb=2 * g.n,
                                        itronc=True)
    assert exp_t.coef_tronca >= 0.0
    if exp_t.coef_tronca > 0:
        assert exp_t.piz_tronc <= exp_t.piz + 1e-12
        # truncated forward peak -> smaller beta coefficients at high order
        assert abs(exp_t.beta[-1]) < abs(exp.beta[-1])


def test_mixture_weights():
    g = _grid(10)
    sweep = mie.run_mie_sweep(_signed_mu(g), 1.40, -0.002, 1e-4, 10.0)
    pa = aerosols.integrate_granulometry(sweep, 1, 0.1, 0.5, 0.0, 0.55)
    pb = aerosols.integrate_granulometry(sweep, 1, 0.8, 0.7, 0.0, 0.55)
    mix = aerosols.mix_phase_matrices([pa, pb], [0.7, 0.3])
    w_s = np.concatenate([g.w[::-1], [0.0], g.w])
    np.testing.assert_allclose(np.sum(w_s * mix.p11), 2.0, rtol=5e-3)
    assert min(pa.sigma_ext, pb.sigma_ext) <= mix.sigma_ext \
        <= max(pa.sigma_ext, pb.sigma_ext)
