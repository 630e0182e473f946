"""Product cache (the reference's Mie/surface file memoization, SURVEY §5)."""

import numpy as np
import pytest

from radiativetransfer_sos_tpu import cache
from radiativetransfer_sos_tpu.mie import run_mie_sweep, run_mie_sweep_cached


@pytest.fixture
def cdir(tmp_path):
    cache.set_cache_dir(str(tmp_path))
    yield str(tmp_path)
    cache.set_cache_dir(None)


def test_memo_hit_and_miss(cdir):
    calls = []

    def compute():
        calls.append(1)
        return {"a": np.arange(5.0), "b": np.float64(3.5)}

    p = {"x": 1.25, "arr": np.ones(3)}
    out1 = cache.memo("t", p, compute)
    out2 = cache.memo("t", p, compute)
    assert len(calls) == 1                       # second call was a hit
    np.testing.assert_array_equal(out1["a"], out2["a"])
    assert float(out2["b"]) == 3.5

    # different params -> different key -> recompute
    cache.memo("t", {"x": 1.26, "arr": np.ones(3)}, compute)
    assert len(calls) == 2
    # same values in a different array object -> same key (content hash)
    cache.memo("t", {"x": 1.25, "arr": np.ones(3) + 0.0}, compute)
    assert len(calls) == 2


def test_mie_cached_roundtrip(cdir):
    mu = np.concatenate([-np.linspace(0.9, 0.1, 5), [0.0],
                         np.linspace(0.1, 0.9, 5)[::-1]])[::-1]
    direct = run_mie_sweep(mu, 1.44, -0.005, 1.0e-4, 3.0)
    c1 = run_mie_sweep_cached(mu, 1.44, -0.005, 1.0e-4, 3.0)
    c2 = run_mie_sweep_cached(mu, 1.44, -0.005, 1.0e-4, 3.0)
    for f in direct._fields:
        np.testing.assert_array_equal(np.asarray(getattr(direct, f)),
                                      np.asarray(getattr(c1, f)))
        np.testing.assert_array_equal(np.asarray(getattr(c1, f)),
                                      np.asarray(getattr(c2, f)))
    s = cache.cache_stats()
    assert s["hits"] >= 1


def test_disabled_without_dir(tmp_path):
    cache.set_cache_dir(None)
    calls = []

    def compute():
        calls.append(1)
        return {"a": np.zeros(2)}

    import os
    old = os.environ.pop("RTSOS_PRODUCT_CACHE", None)
    try:
        cache.memo("t", {"x": 1}, compute)
        cache.memo("t", {"x": 1}, compute)
        assert len(calls) == 2                   # no caching
    finally:
        if old:
            os.environ["RTSOS_PRODUCT_CACHE"] = old
