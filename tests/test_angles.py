import numpy as np

from radiativetransfer_sos_tpu import angles


def test_gauss_quadrature_exact():
    mu, w = angles.gauss_positive_nodes(12)
    # half-range quadrature of even polynomials: int_0^1 x^k dx
    for k in (0, 2, 4, 10, 20):
        got = np.sum(w * mu ** k)
        assert np.isclose(got, 1.0 / (k + 1), rtol=0, atol=1e-14)


def test_radiance_grid_descending_and_solar():
    g = angles.make_radiance_grid(35.0, n_gauss=24)
    assert np.all(np.diff(g.mu) < 0)
    assert g.n == 25                       # solar angle inserted
    assert g.w[g.imus] == 0.0
    assert np.isclose(g.mu[g.imus], np.cos(np.radians(35.0)))
    assert np.isclose(g.mus, -np.cos(np.radians(35.0)))


def test_radiance_grid_solar_match_not_duplicated():
    mu, _ = angles.gauss_positive_nodes(24)
    thetas = float(np.degrees(np.arccos(mu[5])))
    g2 = angles.make_radiance_grid(thetas, n_gauss=24)
    assert g2.n == 24
    assert np.isclose(g2.mu[g2.imus], mu[5])


def test_mie_grid_ascending_with_user():
    g = angles.make_mie_grid(10, user_angles_deg=[13.0, 47.0])
    assert g.n == 12
    assert np.all(np.diff(g.mu) > 0)
    assert np.sum(g.w == 0.0) == 2


def test_expansion_orders():
    assert angles.expansion_orders(None, None) == (80, 48, 128)
    assert angles.expansion_orders(40, 40) == (80, 80, 160)
