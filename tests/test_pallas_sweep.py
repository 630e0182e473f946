"""Pallas sweep kernels vs. the associative-scan reference.

Round-2's final commit shipped `pallas_ops.sweep_flat_batched` with kernel
signatures out of sync with their `pallas_call` operands — every TPU f32
solve crashed while the CPU suite stayed green, because nothing exercised
the kernels off-TPU.  These tests run the *real* kernels in interpret mode
on CPU (`pl.pallas_call(..., interpret=True)`) and assert allclose against
`solver._sweep_flat_scan`, so breaking the kernel contract now fails the
CPU suite.  Reference recurrence: ``SOS_INTEGR_EPOPT``,
``/root/reference/src/SOS_OS.F:2222-2354``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_sos_tpu import pallas_ops
from radiativetransfer_sos_tpu.solver import _sweep_flat_scan


def _case(nt, ts, hp, seed, zero_pad_layers=0):
    """Random sweep instance batch; optionally close with zero-thickness
    padding layers (dtau = 0) like the profile discretizer's static-NT pad."""
    rng = np.random.default_rng(seed)
    w = 2 * hp
    # increasing cumulative optical depths, shared shape per instance
    dh = rng.uniform(1e-4, 5e-2, size=(ts, nt)).astype(np.float32)
    if zero_pad_layers:
        dh[:, nt - zero_pad_layers:] = 0.0
    h = np.concatenate([np.zeros((ts, 1), np.float32), np.cumsum(dh, axis=1)],
                       axis=1)
    muh = np.concatenate([rng.uniform(0.05, 1.0, size=hp - 2),
                          np.ones(2)]).astype(np.float32)
    src = rng.standard_normal((ts, nt + 1, w)).astype(np.float32)
    bc = rng.standard_normal((ts, hp)).astype(np.float32)
    return jnp.asarray(h), jnp.asarray(muh), jnp.asarray(src), jnp.asarray(bc)


def _f64_reference(h, muh, src, bc):
    """f64 associative-scan sweep — the accumulation-order-independent
    truth both f32 paths are judged against."""
    out = jax.vmap(_sweep_flat_scan, in_axes=(0, None, 0, 0))(
        jnp.asarray(h, jnp.float64), jnp.asarray(muh, jnp.float64),
        jnp.asarray(src, jnp.float64), jnp.asarray(bc, jnp.float64))
    return np.asarray(out)


def _assert_as_accurate(got, h, muh, src, bc):
    """The kernel and the f32 scan round differently (sequential vs tree
    composition), so compare both to the f64 truth: the kernel's worst error
    must be within a small factor of the f32 scan's own worst error."""
    want = _f64_reference(h, muh, src, bc)
    scan32 = np.asarray(jax.vmap(_sweep_flat_scan, in_axes=(0, None, 0, 0))(
        h, muh, src, bc))
    err_got = np.max(np.abs(np.asarray(got) - want))
    err_scan = np.max(np.abs(scan32 - want))
    assert err_got <= 4.0 * err_scan + 1e-6, (err_got, err_scan)


@pytest.mark.parametrize("nt,ts", [(1, 1), (7, 3), (255, 8), (600, 9)])
def test_interpret_matches_scan(nt, ts):
    h, muh, src, bc = _case(nt, ts, hp=16, seed=nt * 31 + ts)
    got = pallas_ops.sweep_flat_batched(h, muh, src, bc, interpret=True)
    _assert_as_accurate(got, h, muh, src, bc)


def test_interpret_zero_thickness_pad_layers():
    # trailing dtau == 0 layers must be identity steps (profile pads)
    h, muh, src, bc = _case(120, 5, hp=16, seed=7, zero_pad_layers=30)
    got = pallas_ops.sweep_flat_batched(h, muh, src, bc, interpret=True)
    _assert_as_accurate(got, h, muh, src, bc)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-kernel check needs a TPU")
def test_tpu_kernel_matches_scan():
    h, muh, src, bc = _case(300, 12, hp=16, seed=3)
    got = pallas_ops.sweep_flat_batched(h, muh, src, bc)
    _assert_as_accurate(got, h, muh, src, bc)
