"""Native C++ profile discretizer vs the Python oracle.

Both implementations execute the identical floating-point operation
sequence (profil.cc mirrors profile.py line by line); the only permitted
divergence is the 1-ulp difference between numpy's and libstdc++'s exp,
so tolerances are at the 1e-14 level and the grids must agree level for
level (same nt, same bisection-quantized altitudes).
"""

import numpy as np
import pytest

from radiativetransfer_sos_tpu import native, profile
from radiativetransfer_sos_tpu.absorption import gas_columns

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def cols():
    return gas_columns(1)


def _assert_same(p_py, p_cc):
    assert p_py.nt == p_cc.nt
    np.testing.assert_array_equal(p_py.zprof, p_cc.zprof)
    np.testing.assert_allclose(p_py.h, p_cc.h, rtol=1e-14, atol=0)
    np.testing.assert_allclose(p_py.pcaer, p_cc.pcaer, rtol=0, atol=1e-12)
    np.testing.assert_allclose(p_py.pcmol, p_cc.pcmol, rtol=0, atol=1e-12)


@pytest.mark.parametrize("tr,ta", [(0.23, 0.0), (0.23, 0.3), (0.05, 0.8),
                                   (1.2, 0.4)])
def test_no_gas_exact(tr, ta):
    _assert_same(profile.exp_profile_no_gas(tr, 8.0, ta, 2.0),
                 native.exp_profile(tr, 8.0, ta, 2.0))


@pytest.mark.parametrize("scale", [0.01, 0.3, 3.0])
def test_with_gas_exact(cols, scale):
    """Weak, moderate and strong (> tau_abs threshold) absorption."""
    tabs = scale * np.linspace(0.0, 1.0, cols.alt_desc.shape[0]) ** 2
    _assert_same(
        profile.exp_profile_with_gas(0.1, 8.0, 0.3, 2.0, cols.alt_desc,
                                     tabs),
        native.exp_profile(0.1, 8.0, 0.3, 2.0, cols.alt_desc, tabs))


def test_batch_matches_single(cols):
    rng = np.random.default_rng(3)
    n_abs = cols.alt_desc.shape[0]
    tabs_b = np.cumsum(rng.random((6, n_abs)) * 0.01, axis=1)
    batch = native.exp_profiles_batch(0.1, 8.0, 0.3, 2.0, cols.alt_desc,
                                      tabs_b)
    for t in range(6):
        single = native.exp_profile(0.1, 8.0, 0.3, 2.0, cols.alt_desc,
                                    tabs_b[t])
        _assert_same(single, batch[t])


def test_native_speedup(cols):
    """The native batch path must beat the Python loop clearly."""
    import time
    n_abs = cols.alt_desc.shape[0]
    rng = np.random.default_rng(0)
    tabs_b = np.cumsum(rng.random((40, n_abs)) * 0.005, axis=1)
    t0 = time.perf_counter()
    native.exp_profiles_batch(0.1, 8.0, 0.3, 2.0, cols.alt_desc, tabs_b)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for t in range(40):
        profile.exp_profile_with_gas(0.1, 8.0, 0.3, 2.0, cols.alt_desc,
                                     tabs_b[t])
    t_py = time.perf_counter() - t0
    assert t_native < t_py / 5.0, (t_native, t_py)
