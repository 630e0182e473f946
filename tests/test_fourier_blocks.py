"""Blocked Fourier dispatch == all-orders solve + post-hoc stop mask.

The block driver reproduces ``SOS_ARRET_FOURIER`` (``src/SOS_OS.F:
1580-1589``) incrementally; masked records must be identical to the
all-orders batch (solver.solve_fourier_blocked docstring).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_sos_tpu import precision, solver


def _masked(res, n_terms):
    recs = []
    for k in range(n_terms):
        m = np.asarray(solver.fourier_stop_mask(np.asarray(res.i3bnd)[k]))
        recs.append(m[:, None, None] * np.asarray(res.i3bnd)[k])
    return np.stack(recs)


@pytest.mark.parametrize("block", [8, 16, 100])
def test_blocked_matches_full(block):
    prob = precision.demo_problem(jnp.float64, n_gauss=8, nt=40, os_nb=24,
                                  igmax=15, n_terms=3)
    full = solver.solve_fourier_batch_jit(prob.inp, prob.opt)
    blk = solver.solve_fourier_blocked(prob.inp, prob.opt, block=block)
    np.testing.assert_allclose(_masked(blk, 3), _masked(full, 3),
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(np.asarray(blk.emoins),
                               np.asarray(full.emoins), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(blk.eplus),
                               np.asarray(full.eplus), rtol=1e-13)


def test_blocked_skips_tail_orders():
    """With a fast-decaying expansion the driver must not dispatch every
    block: trailing records come back exactly zero."""
    prob = precision.demo_problem(jnp.float64, n_gauss=8, nt=40, os_nb=64,
                                  igmax=15, n_terms=2)
    blk = solver.solve_fourier_blocked(prob.inp, prob.opt, block=8)
    bnd = np.asarray(blk.i3bnd)
    # the demo expansion (0.7^L decay) stops around IS ~ 26: the driver
    # must leave whole trailing blocks undispatched (allowing for the
    # one-block speculation)
    zero_tail = np.all(bnd == 0.0, axis=(0, 2, 3))
    assert zero_tail[-1] and zero_tail[::-1].argmin() >= 16, \
        f"tail blocks were dispatched (zero tail = {zero_tail.sum()})"
    # and the masked result still matches the full solve
    full = solver.solve_fourier_batch_jit(prob.inp, prob.opt)
    np.testing.assert_allclose(_masked(blk, 2), _masked(full, 2),
                               rtol=1e-12, atol=1e-300)


def test_blocked_with_surface_matrices():
    prob = precision.demo_problem(jnp.float64, n_gauss=6, nt=30, os_nb=16,
                                  igmax=12, n_terms=2)
    n = prob.inp.mu_pos.shape[0]
    n_s = prob.inp.k_aer.shape[0]
    rng = np.random.default_rng(3)
    rmat = jnp.asarray(0.05 * rng.random((n_s, 3, 3, n, n))
                       * 0.5 ** np.arange(n_s)[:, None, None, None, None])
    inp = prob.inp._replace(surface=prob.inp.surface._replace(rmat=rmat))
    opt = prob.opt._replace(imat_surf=True)
    full = solver.solve_fourier_batch_jit(inp, opt)
    blk = solver.solve_fourier_blocked(inp, opt, block=8)
    np.testing.assert_allclose(_masked(blk, 2), _masked(full, 2),
                               rtol=1e-12, atol=1e-300)


def test_chunked_matches_full():
    """Term-chunked blocked dispatch == all-orders batch after the stop
    mask, across uneven chunk boundaries."""
    prob = precision.demo_problem(jnp.float64, n_gauss=8, nt=40, os_nb=24,
                                  igmax=15, n_terms=7)
    full = solver.solve_fourier_batch_jit(prob.inp, prob.opt)
    chk = solver.solve_fourier_blocked_chunked(prob.inp, prob.opt,
                                               block=8, term_chunk=3)
    np.testing.assert_allclose(_masked(chk, 7), _masked(full, 7),
                               rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(np.asarray(chk.emoins),
                               np.asarray(full.emoins), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(chk.eplus),
                               np.asarray(full.eplus), rtol=1e-13)
    # single-chunk passthrough
    one = solver.solve_fourier_blocked_chunked(prob.inp, prob.opt,
                                               block=8, term_chunk=64)
    np.testing.assert_allclose(_masked(one, 7), _masked(full, 7),
                               rtol=1e-12, atol=1e-300)
