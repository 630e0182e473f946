"""Multiple-scattering Stokes harmonics vs Chandrasekhar's EXACT solution.

For conservative Rayleigh scattering (no depolarization) the azimuth
harmonics m = 1, 2 of the polarized radiation field decouple into SCALAR
transfer problems with the characteristic functions (Chandrasekhar,
*Radiative Transfer*, 1950/1960 Dover, Ch. X — the closed forms the
Coulson-Dave-Sekera tables were computed from)::

    psi1(mu) = (3/8) (1 - mu^2)(1 + 2 mu^2)
    psi2(mu) = (3/16)(1 + mu^2)^2

and the reflected harmonic of a finite layer tau1 is governed by the
S-function

    (1/mu + 1/mu0) S(mu, mu0) = X(mu) X(mu0) - Y(mu) Y(mu0)

where X, Y solve Chandrasekhar's nonlinear integral equations

    X(mu) = 1            + mu I[ psi(u) (X(mu)X(u) - Y(mu)Y(u))/(mu+u) ]
    Y(mu) = exp(-tau1/mu) + mu I[ psi(u) (Y(mu)X(u) - X(mu)Y(u))/(mu-u) ]

(I[.] = integral over u in (0,1); the second integrand is regular at
u = mu because its numerator vanishes there).  Both psi have
psi0 = I[psi] = 7/20 < 1/2, so X, Y are unique and plain fixed-point
iteration converges; the solutions must satisfy the exact moment
identity (1 - x0)^2 - y0^2 = 1 - 2 psi0 with x0 = I[psi X],
y0 = I[psi Y].

Why this reduces our vector problem to that scalar one: the Rayleigh
phase-matrix Fourier kernel at m >= 1 is RANK-ONE,
K^m(mu, mu') = a(mu) a(mu')^T with
a = (sqrt(b2) P^m_2, (g2/sqrt(b2)) R^m_2, -(g2/sqrt(b2)) T^m_2) and
g2^2 = a2 b2 (kernels.molecular_coeffs with ron = 0: b2 = 1/2,
g2 = -sqrt(3/2), a2 = 3) — verified numerically below, together with
|a|^2 being proportional to the published psi^m.  Every Stokes row of
the m-harmonic field is therefore the SAME scalar field scaled by
a_row(mu), and the solver's m-harmonic Fourier records must equal

    rec[m, row](mu)  =  N_m * K^m[row, 0](mu, mu0) * S_xy(mu, mu0) / mu

with a single constant N_m per harmonic.  The test solves X/Y from the
published equations and asserts that ratio is constant to < 0.1% over
every Gauss direction and every Stokes row — and that replacing S_xy by
the single-scattering S would NOT pass, i.e. the multiple-scattering
content genuinely comes from the publication's solution.
"""

import numpy as np
import pytest

from radiativetransfer_sos_tpu import gsf, kernels, proc
from radiativetransfer_sos_tpu.config import (AbsConfig, AngleConfig,
                                              SosConfig, SurfaceConfig,
                                              ProfileConfig)

PSI = {
    1: lambda u: (3.0 / 8.0) * (1.0 - u * u) * (1.0 + 2.0 * u * u),
    2: lambda u: (3.0 / 16.0) * (1.0 + u * u) ** 2,
}


def solve_xy(psi, tau1, targets, n_quad=128, n_steps=4000):
    """Chandrasekhar X/Y functions at the ``targets`` directions.

    Integrates the invariant-imbedding ODE system (Bellman-Kalaba-
    Prestrud's scheme for computing Chandrasekhar's functions)::

        dX(tau;mu)/dtau = Y(tau;mu) * s(tau)
        dY(tau;mu)/dtau = -Y/mu + X(tau;mu) * s(tau)
        s(tau) = integral_0^1 psi(u) Y(tau;u) du / u,   X(0) = Y(0) = 1

    with RK4 from tau = 0 to tau1; target directions ride along with
    zero quadrature weight.  The result is VERIFIED against the
    publication's own definitions: the nonlinear X/Y integral equations
    hold to ~1e-6 and the exact moment identity
    (1-x0)^2 - y0^2 = 1 - 2 psi0 to ~1e-10 (asserted below), so the
    recalled ODE form cannot silently drift from Chandrasekhar's
    functions.
    """
    targets = np.atleast_1d(np.asarray(targets, dtype=np.float64))
    x_q, w_q = np.polynomial.legendre.leggauss(n_quad)
    u_q = 0.5 * (x_q + 1.0)
    w = 0.5 * w_q
    pw_q = psi(u_q) * w
    u = np.concatenate([u_q, targets])
    pw = np.concatenate([pw_q, np.zeros_like(targets)])
    x = np.ones_like(u)
    y = np.ones_like(u)
    h = tau1 / n_steps

    def rhs(x, y):
        s = np.sum(pw * y / u)
        return y * s, -y / u + x * s

    for _ in range(n_steps):
        k1x, k1y = rhs(x, y)
        k2x, k2y = rhs(x + 0.5 * h * k1x, y + 0.5 * h * k1y)
        k3x, k3y = rhs(x + 0.5 * h * k2x, y + 0.5 * h * k2y)
        k4x, k4y = rhs(x + h * k3x, y + h * k3y)
        x = x + h / 6 * (k1x + 2 * k2x + 2 * k3x + k4x)
        y = y + h / 6 * (k1y + 2 * k2y + 2 * k3y + k4y)

    # exact moment identity (Chandrasekhar): (1-x0)^2 - y0^2 = 1 - 2 psi0
    psi0 = np.sum(pw_q)
    x0 = np.sum(pw_q * x[:n_quad])
    y0 = np.sum(pw_q * y[:n_quad])
    assert abs((1.0 - x0) ** 2 - y0 ** 2 - (1.0 - 2.0 * psi0)) < 1e-9

    # residual of the published nonlinear integral equations themselves
    xq, yq = x[:n_quad], y[:n_quad]
    inv_p = 1.0 / (u_q[:, None] + u_q[None, :])
    rx = 1.0 + u_q * (((pw_q[None, :] * inv_p)
                       * (xq[:, None] * xq[None, :]
                          - yq[:, None] * yq[None, :])).sum(1)) - xq
    assert np.max(np.abs(rx)) < 3e-6, np.max(np.abs(rx))

    return x[n_quad:], y[n_quad:]


def _rayleigh_run(thetas=50.0):
    cfg = SosConfig(
        wavelength=0.44,
        angles=AngleConfig(nbmu_lum=12, thetas_deg=thetas),
        surface=SurfaceConfig(type=0, alb=0.0),
        profile=ProfileConfig(hr=8.0),
        absorption=AbsConfig(absprofil=7),
        igmax=80)
    cfg.mdf = 0.0                      # psi^m above assume pure Rayleigh
    return proc.run(cfg), cfg


def test_rank_one_kernel_and_psi_shapes():
    """The m>=1 Rayleigh kernels factor as a a^T and |a|^2 follows the
    published characteristic functions."""
    mu = np.linspace(0.02, 0.999, 40)
    b0, b2, g2, a2 = kernels.molecular_coeffs(0.0)
    assert abs(g2 * g2 - a2 * b2) < 1e-12          # rank-one condition
    for m in (1, 2):
        psl, rsl, tsl = gsf.gsf_positive(m, mu, 2)
        p2, r2, t2 = psl[2], rsl[2], tsl[2]
        q = b2 * p2 ** 2 + (g2 * g2 / b2) * (r2 ** 2 + t2 ** 2)
        ref = PSI[m](mu)
        ratio = q / ref
        assert np.std(ratio) / np.mean(ratio) < 1e-12, (m, ratio)


@pytest.mark.parametrize("m", [1, 2])
def test_solver_harmonics_match_xy_solution(m):
    res, cfg = _rayleigh_run()
    grid = res.grid
    mu = np.asarray(grid.mu)
    n = mu.shape[0]
    mu0 = -grid.mus
    tau1 = res.ttot_vrai

    # solver's m-harmonic Fourier records at TOA, upward directions
    rec = np.asarray(res.records_up[m])            # (3, D)
    up = rec[:, n + 1: 2 * n + 1]                  # Stokes x mu[p]

    # our kernel's solar column for the same harmonic (fixes every sign
    # and angular factor by the package's own conventions)
    psl, rsl, tsl = gsf.gsf_basis(mu, grid.mus, 2, 3)
    kmol = np.asarray(kernels.molecular_kernel(psl, rsl, tsl, 0.0))
    d = 2 * n + 1
    kcol = kmol[m, :, 0, :, n]                     # (3, D) at solar inc.
    kup = kcol[:, n + 1: 2 * n + 1]                # (3, n)

    xs, ys = solve_xy(PSI[m], tau1, np.concatenate([mu, [mu0]]))
    x_mu, y_mu = xs[:-1], ys[:-1]
    x_0, y_0 = xs[-1], ys[-1]
    s_xy = (mu * mu0 / (mu + mu0)) * (x_mu * x_0 - y_mu * y_0)
    s_ss = (mu * mu0 / (mu + mu0)) * (
        1.0 - np.exp(-tau1 * (1.0 / mu + 1.0 / mu0)))

    pred = kup * (s_xy / mu)[None, :]
    pred_ss = kup * (s_ss / mu)[None, :]

    # one constant per harmonic across every direction AND Stokes row
    mask = np.abs(pred) > 1e-3 * np.max(np.abs(pred))
    ratio = up[mask] / pred[mask]
    const = np.median(ratio)
    spread_xy = np.max(np.abs(ratio / const - 1.0))
    assert spread_xy < 1e-3, (m, ratio / const)

    # ...and the single-scattering S alone would NOT pass: its residual
    # mu-shape (the multiple-scattering enhancement, a few percent at
    # this tau) is Chandrasekhar's X/Y content, resolved ~10-100x above
    # the accuracy of the match
    ratio_ss = up[mask] / pred_ss[mask]
    spread_ss = np.max(np.abs(ratio_ss / np.median(ratio_ss) - 1.0))
    assert spread_ss > max(10.0 * spread_xy, 5e-3), (spread_ss, spread_xy)
