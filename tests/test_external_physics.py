"""Validation against physics EXTERNAL to this repository.

Every other differential test in this suite compares the solver against
oracles transcribed from the same reference code (no Fortran compiler
exists in this environment — BASELINE.md "Fortran parity attempt").  These
tests compare against textbook results that share no code or author with
either implementation:

- the closed-form single-scattering solution of a finite Rayleigh layer
  (Hansen & Travis 1974, eq. 65; Chandrasekhar 1950 §X for the
  depolarization-corrected phase function),
- 100% single-scattering polarization at a 90-degree scattering angle,
- the Lambertian direct-reflection boundary term (Chandrasekhar §72),
- energy conservation for a conservative atmosphere over a black surface,
- Helmholtz reciprocity of the emergent reflected radiance,
- a photon Monte Carlo (independent stochastic-transport algorithm):
  multiple-scattering flux fractions to ~0.1 sigma and the reflected
  angular distribution to 5-sigma Poisson gates.

The solver cannot satisfy any of these by construction: the GSF kernel
chain, the primary source, the sweep integrator, the multiple-scattering
loop and the Fourier recomposition all enter each check.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_sos_tpu import angles, gsf, kernels, solver


def _rayleigh_problem(tau, thetas_deg, depol=0.0, n_gauss=24, nt=300,
                      igmax=1, user_angles_deg=None, rho=0.0,
                      ipolar=True):
    """Homogeneous pure-molecular layer (xdel = 0), Lambertian ground.

    ``ipolar=False`` builds the SCALAR Rayleigh problem (polarized kernel
    coefficients cut) — required when comparing against scalar references
    like the photon Monte Carlo: vector vs scalar Rayleigh radiances
    differ by a few percent in angular shape at these optical depths
    (Chandrasekhar 1950; flux nearly unchanged)."""
    grid = angles.make_radiance_grid(thetas_deg, n_gauss=n_gauss,
                                     user_angles_deg=user_angles_deg)
    os_nb = 2                      # Rayleigh is band-limited at L = 2
    psl, rsl, tsl = gsf.gsf_basis(grid.mu, grid.mus, os_nb, os_nb + 1)
    psl, rsl, tsl = (jnp.asarray(a, jnp.float64) for a in (psl, rsl, tsl))
    k_mol = kernels.molecular_kernel(psl, rsl, tsl, depol, ipolar=ipolar)
    k_aer = jnp.zeros_like(k_mol)
    h = np.linspace(0.0, tau, nt + 1)
    inp = solver.SolveInputs(
        h=jnp.asarray(h)[None], xdel=jnp.zeros((1, nt + 1)),
        ydel=jnp.ones((1, nt + 1)), k_aer=k_aer, k_mol=k_mol,
        mu_pos=jnp.asarray(grid.mu), w_pos=jnp.asarray(grid.w),
        tab=jnp.asarray(grid.mus), n0=grid.imus,
        surface=solver.SurfaceInputs(rho=jnp.asarray(rho)))
    return inp, solver.SolveOptions(igmax=igmax, ipolar=ipolar), grid


def _toa_stokes(res, grid, phi_deg):
    """Recompose I,Q,U(mu_up, phi) at TOA from the Fourier records:
    I = I0 + 2 sum_s I_s cos(s phi), U with sin (src/SOS_OS.F:908-937)."""
    n = grid.mu.shape[0]
    bnd = np.asarray(res.i3bnd)[0]          # (S, 3, D) signed layout
    up = bnd[:, :, n + 1:]                  # d = N+1+p  ->  upward mu[p]
    s = np.arange(bnd.shape[0])
    phi = np.radians(phi_deg)
    cosf = np.where(s == 0, 1.0, 2.0) * np.cos(s * phi)
    sinf = 2.0 * np.sin(s * phi)
    xi = np.tensordot(cosf, up[:, 0], axes=1)
    xq = np.tensordot(cosf, up[:, 1], axes=1)
    xu = np.tensordot(sinf, up[:, 2], axes=1)
    return xi, xq, xu


def _ss_analytic(mu, mu0, phi_deg, tau, depol):
    """Single-scattering emergent radiance of a finite Rayleigh layer
    (Hansen & Travis 1974 eq. 65; F0 = 1 flux normalization): returns
    (I, degree of polarization)."""
    gam = depol / (2.0 - depol)
    delta = (1.0 - gam) / (1.0 + 2.0 * gam)
    st = np.sqrt((1.0 - mu ** 2) * (1.0 - mu0 ** 2))
    cost = -mu * mu0 + st * np.cos(np.radians(phi_deg))
    p11 = delta * 0.75 * (1.0 + cost ** 2) + (1.0 - delta)
    p12 = -delta * 0.75 * (1.0 - cost ** 2)
    fac = mu0 / (4.0 * (mu + mu0)) * (
        1.0 - np.exp(-tau * (1.0 / mu + 1.0 / mu0)))
    return p11 * fac, np.abs(p12) / p11


@pytest.mark.parametrize("depol", [0.0, 0.0279])
@pytest.mark.parametrize("phi_deg", [0.0, 60.0, 135.0, 180.0])
def test_single_scatter_matches_closed_form(depol, phi_deg):
    tau, theta0 = 0.3, 35.0
    inp, opt, grid = _rayleigh_problem(tau, theta0, depol=depol, igmax=1)
    res = solver.solve_fourier_batch_jit(inp, opt)
    xi, xq, xu = _toa_stokes(res, grid, phi_deg)
    mu0 = abs(grid.mus)
    mu = grid.mu
    want_i, want_pol = _ss_analytic(mu, mu0, phi_deg, tau, depol)
    # the layer-sweep integrator is linear-in-tau per layer; at dtau = 1e-3
    # its quadrature error is ~1e-7 relative
    np.testing.assert_allclose(xi, want_i, rtol=2e-6)
    # degree of polarization (U = 0 only in the principal plane; out of it
    # pol = sqrt(Q^2+U^2)/I, invariant under the meridian rotation)
    pol = np.sqrt(xq ** 2 + xu ** 2) / xi
    np.testing.assert_allclose(pol, want_pol, atol=3e-6)
    if phi_deg in (0.0, 180.0):
        np.testing.assert_allclose(xu, 0.0, atol=1e-12)


def test_ninety_degree_scattering_fully_polarized():
    """depol = 0 Rayleigh single scattering at a 90-degree phase angle is
    100% polarized — sun at 45 deg, view at 45 deg, phi = 0 gives
    cos(Theta) = -mu*mu0 + sqrt(..)sqrt(..) = 0 exactly."""
    tau = 0.2
    inp, opt, grid = _rayleigh_problem(tau, 45.0, depol=0.0, igmax=1)
    res = solver.solve_fourier_batch_jit(inp, opt)
    xi, xq, xu = _toa_stokes(res, grid, 0.0)
    p = grid.imus                       # the solar node: mu = mu0
    pol = np.sqrt(xq[p] ** 2 + xu[p] ** 2) / xi[p]
    np.testing.assert_allclose(pol, 1.0, atol=1e-9)


@pytest.mark.parametrize("tau", [0.1, 0.35])
def test_energy_conservation_conservative_rayleigh(tau):
    """No absorption + black surface: reflected + transmitted-diffuse +
    transmitted-direct = 1 (fractions of the incident flux).  Truncation
    of the scattering series is the only error source."""
    inp, opt, grid = _rayleigh_problem(tau, 30.0, depol=0.0, igmax=60,
                                       nt=400)
    res = solver.solve_fourier_batch_jit(inp, opt)
    direct = np.exp(-tau / abs(grid.mus))
    total = float(res.eplus[0]) + float(res.emoins[0]) + direct
    np.testing.assert_allclose(total, 1.0, rtol=2e-6)


def test_lambertian_direct_reflection_closed_form():
    """Order-1 with a Lambertian ground: the TOA radiance excess over the
    black-surface run is exactly the doubly-attenuated isotropic
    reflection of the direct beam, rho * mu0 * exp(-tau(1/mu + 1/mu0))
    (Chandrasekhar 1950 §72 planetary-problem boundary term; the same
    F0 = 1 normalization the single-scattering test pins down).  Diffuse
    light touching the ground re-emerges only at order >= 2, so igmax = 1
    isolates the boundary term."""
    tau, theta0, rho = 0.25, 40.0, 0.35
    inp0, opt, grid = _rayleigh_problem(tau, theta0, igmax=1, rho=0.0)
    inpr, _, _ = _rayleigh_problem(tau, theta0, igmax=1, rho=rho)
    i0 = solver.solve_fourier_batch_jit(inp0, opt)
    ir = solver.solve_fourier_batch_jit(inpr, opt)
    xi0, _, _ = _toa_stokes(i0, grid, 0.0)
    xir, _, _ = _toa_stokes(ir, grid, 0.0)
    mu0 = abs(grid.mus)
    want = rho * mu0 * np.exp(-tau * (1.0 / grid.mu + 1.0 / mu0))
    np.testing.assert_allclose(xir - xi0, want, rtol=1e-9)


def _mc_fluxes(tau, mu0, n_photons, seed):
    """Photon Monte Carlo of a scalar conservative Rayleigh slab over a
    black surface: (reflected, diffusely transmitted, directly
    transmitted) flux fractions.  Independent algorithm family: stochastic
    transport, no quadrature, no Fourier modes, no shared code with the
    solver or the oracles."""
    rng = np.random.default_rng(seed)
    mu = np.full(n_photons, -mu0)          # downward
    z = np.zeros(n_photons)                # optical depth below TOA
    alive = np.ones(n_photons, bool)
    scattered = np.zeros(n_photons, bool)
    refl = trans_dir = trans_dif = 0
    for _ in range(300):
        idx = np.nonzero(alive)[0]
        if idx.size == 0:
            break
        t = rng.exponential(size=idx.size)
        z_new = z[idx] + t * (-mu[idx])
        up_escape = (mu[idx] > 0) & (z_new < 0)
        dn_escape = (mu[idx] < 0) & (z_new > tau)
        esc = up_escape | dn_escape
        refl += int(up_escape.sum())
        trans_dir += int((dn_escape & ~scattered[idx]).sum())
        trans_dif += int((dn_escape & scattered[idx]).sum())
        alive[idx[esc]] = False
        stay = idx[~esc]
        z[stay] = z_new[~esc]
        # Rayleigh scattering-angle cosine, p(c) prop 1 + c^2 (rejection)
        m = stay.shape[0]
        c = np.empty(m)
        need = np.ones(m, bool)
        while need.any():
            k = int(need.sum())
            cand = rng.uniform(-1, 1, k)
            acc = rng.uniform(0, 1, k) < (1 + cand ** 2) / 2.0
            pos = np.nonzero(need)[0][acc]
            c[pos] = cand[acc]
            need[pos] = False
        phi = rng.uniform(0, 2 * np.pi, m)
        mu_old = mu[stay]
        s_old = np.sqrt(np.maximum(0.0, 1 - mu_old ** 2))
        mu[stay] = mu_old * c + s_old * np.sqrt(
            np.maximum(0.0, 1 - c ** 2)) * np.cos(phi)
        scattered[stay] = True
    n = float(n_photons)
    return refl / n, trans_dif / n, trans_dir / n


def test_monte_carlo_flux_cross_check():
    """The FULL multiple-scattering solution vs an independent photon
    Monte Carlo (scalar mode): reflected and diffusely-transmitted flux
    fractions must agree within the MC's counting noise.  At 1.5e6
    photons sigma ~ 3e-4; measured at 4e6 photons the agreement is
    0.03 sigma (R) / 0.11 sigma (Tdif)."""
    tau, theta0 = 0.3, 35.0
    mu0 = float(np.cos(np.radians(theta0)))
    inp, opt, grid = _rayleigh_problem(tau, theta0, depol=0.0, igmax=100,
                                       nt=300, ipolar=False)
    res = solver.solve_fourier_batch_jit(inp, opt)
    eplus, emoins = float(res.eplus[0]), float(res.emoins[0])

    n = 1_500_000
    r_mc, tdif_mc, tdir_mc = _mc_fluxes(tau, mu0, n, seed=12345)
    sig_r = np.sqrt(r_mc * (1 - r_mc) / n)
    sig_t = np.sqrt(tdif_mc * (1 - tdif_mc) / n)
    assert abs(r_mc - eplus) < 4.5 * sig_r, (r_mc, eplus, sig_r)
    assert abs(tdif_mc - emoins) < 4.5 * sig_t, (tdif_mc, emoins, sig_t)
    # the MC's own direct transmission must match exp(-tau/mu0) — anchors
    # the MC implementation itself
    np.testing.assert_allclose(tdir_mc, np.exp(-tau / mu0), atol=4.5e-4)


def test_monte_carlo_angular_cross_check():
    """MC validation of the reflected ANGULAR distribution (azimuth mean):
    binned photon-escape radiance vs the solver's m = 0 Fourier record.
    The conversion is pi*mu0 — the Hansen & Travis F0 = 1 radiance
    convention (incident flux pi*mu0) the closed-form tests pin down."""
    tau, theta0 = 0.3, 35.0
    mu0 = float(np.cos(np.radians(theta0)))
    inp, opt, grid = _rayleigh_problem(tau, theta0, depol=0.0, igmax=100,
                                       nt=300, ipolar=False)
    res = solver.solve_fourier_batch_jit(inp, opt)
    n = grid.mu.shape[0]
    i0_nodes = np.asarray(res.i3bnd)[0][0, 0, n + 1:]
    mus = np.asarray(grid.mu)

    n_ph = 1_500_000
    rng = np.random.default_rng(7)
    mu = np.full(n_ph, -mu0)
    z = np.zeros(n_ph)
    alive = np.ones(n_ph, bool)
    esc = []
    for _ in range(300):
        idx = np.nonzero(alive)[0]
        if idx.size == 0:
            break
        t = rng.exponential(size=idx.size)
        z_new = z[idx] + t * (-mu[idx])
        up = (mu[idx] > 0) & (z_new < 0)
        dn = (mu[idx] < 0) & (z_new > tau)
        esc.append(mu[idx[up]])
        alive[idx[up | dn]] = False
        stay = idx[~(up | dn)]
        z[stay] = z_new[~(up | dn)]
        m = stay.shape[0]
        c = np.empty(m)
        need = np.ones(m, bool)
        while need.any():
            k = int(need.sum())
            cand = rng.uniform(-1, 1, k)
            acc = rng.uniform(0, 1, k) < (1 + cand ** 2) / 2.0
            pos = np.nonzero(need)[0][acc]
            c[pos] = cand[acc]
            need[pos] = False
        phi = rng.uniform(0, 2 * np.pi, m)
        mo = mu[stay]
        so = np.sqrt(np.maximum(0.0, 1 - mo ** 2))
        mu[stay] = mo * c + so * np.sqrt(
            np.maximum(0.0, 1 - c ** 2)) * np.cos(phi)
    esc = np.concatenate(esc)

    edges = np.linspace(0.1, 0.99, 7)
    cnt, _ = np.histogram(esc, bins=edges)
    # expected escape fraction per bin from the solver's radiance:
    # (2/mu0) * int_bin I(mu) mu dmu  (F0 = 1 convention, incident flux
    # pi*mu0; matches the EMOINS/EPLUS quadrature in solver.py)
    expect = np.empty(cnt.shape)
    for b in range(edges.size - 1):
        mg = np.linspace(edges[b], edges[b + 1], 200)
        ig = np.interp(mg, mus[::-1], i0_nodes[::-1])
        expect[b] = 2.0 / mu0 * np.trapezoid(ig * mg, mg)
    got = cnt / n_ph
    sig = np.sqrt(np.maximum(cnt, 1.0)) / n_ph
    # 5-sigma Poisson per bin + 0.5% floor for node interpolation
    assert np.all(np.abs(got - expect) < 5.0 * sig + 0.005 * expect), \
        list(zip(edges[:-1], got, expect, sig))


def test_helmholtz_reciprocity():
    """Swapping sun and view directions leaves the mu0-normalized emergent
    reflection function unchanged: R = I(mu_v; mu_0)/mu_0 is symmetric
    under (mu_v <-> mu_0) — holds for the full multiple-scattering field
    over a Lambertian (reciprocal) ground (van de Hulst 1980 §3.4)."""
    tau, th_a, th_b = 0.4, 35.0, 55.0
    ia, ib = [], []
    for th_sun, th_view, out in ((th_a, th_b, ia), (th_b, th_a, ib)):
        inp, opt, grid = _rayleigh_problem(
            tau, th_sun, depol=0.0279, igmax=100, nt=400,
            user_angles_deg=np.array([th_view]), rho=0.3)
        res = solver.solve_fourier_batch_jit(inp, opt)
        mu_view = np.cos(np.radians(th_view))
        p = int(np.argmin(np.abs(grid.mu - mu_view)))
        for phi in (0.0, 90.0, 180.0):
            xi, _, _ = _toa_stokes(res, grid, phi)
            out.append(xi[p] / abs(grid.mus))
    np.testing.assert_allclose(ia, ib, rtol=1e-7)
