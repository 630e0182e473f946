"""Device-mesh scale-out for the scene/CKD batch.

The reference is a single-threaded Fortran pipeline whose only cross-solve
communication is the CKD weighted aggregation (``SOS_AGGREGATE``,
``src/SOS_AGGREGATE.F:372-441``, file streaming).  The exploitable structure
(SURVEY §2) maps onto a 2-D mesh:

* ``scene`` axis (data parallel): CKD exponential tuples x sun geometries x
  aerosol models — embarrassingly parallel solves; the AIK-weighted CKD
  reduction becomes one ``psum``-shaped einsum over this axis.
* ``fourier`` axis (model parallel): the Fourier orders of one solve are
  independent (``src/SOS_OS.F:872``); the leading S axis of every kernel and
  per-order field shards across chips, with only the tiny (S,3,D) boundary
  records gathered for the sequential stop-mask.

Shardings are expressed with ``jax.sharding.NamedSharding`` on jit
boundaries; XLA inserts the collectives (all-gather of boundary records,
all-reduce of the weighted sum) over ICI.
"""

from __future__ import annotations

import functools as _functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import solver


def make_mesh(n_scene: int, n_fourier: int, devices=None) -> Mesh:
    """(scene, fourier) mesh over the first n_scene*n_fourier devices."""
    if devices is None:
        devices = jax.devices()
    devs = np.asarray(devices[: n_scene * n_fourier]).reshape(
        n_scene, n_fourier)
    return Mesh(devs, ("scene", "fourier"))


def shard_solve_inputs(mesh: Mesh, inp: solver.SolveInputs,
                       batched: bool) -> solver.SolveInputs:
    """Place a (possibly scene-batched) SolveInputs onto the mesh.

    Kernels shard their Fourier axis; profile vectors are replicated (they
    are small); with ``batched`` the leading axis of every profile array is
    the scene axis.
    """
    b = ("scene",) if batched else ()

    def put(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    surf = inp.surface._replace(
        rho=put(inp.surface.rho, b),
        rmat=put(inp.surface.rmat, b + ("fourier",)),
        f11=put(inp.surface.f11, b), f12=put(inp.surface.f12, b),
        f33=put(inp.surface.f33, b))
    return inp._replace(
        h=put(inp.h, b + (None,)),
        xdel=put(inp.xdel, b + (None,)),
        ydel=put(inp.ydel, b + (None,)),
        k_aer=put(inp.k_aer, b + ("fourier",)),
        k_mol=put(inp.k_mol, b + ("fourier",)),
        mu_pos=put(inp.mu_pos, (None,)),
        w_pos=put(inp.w_pos, (None,)),
        tab=put(inp.tab, b),
        surface=surf)


@partial(jax.jit, static_argnames=("opt",))
def _solve_batch(inp: solver.SolveInputs, opt: solver.SolveOptions):
    """vmap of the Fourier solver over a leading scene axis."""

    def one(h, xdel, ydel, k_aer, k_mol, tab, rho, rmat):
        s = solver.SurfaceInputs(rho=rho, rmat=rmat)
        i = solver.SolveInputs(h=h, xdel=xdel, ydel=ydel, k_aer=k_aer,
                               k_mol=k_mol, mu_pos=inp.mu_pos,
                               w_pos=inp.w_pos, tab=tab, n0=inp.n0,
                               surface=s)
        return solver.solve_fourier(i, opt)

    return jax.vmap(one)(inp.h, inp.xdel, inp.ydel, inp.k_aer, inp.k_mol,
                         inp.tab, inp.surface.rho, inp.surface.rmat)


def solve_scenes_sharded(mesh: Mesh, inp: solver.SolveInputs,
                         opt: solver.SolveOptions) -> solver.FourierResult:
    """Solve a scene batch on the mesh; results stay sharded over 'scene'."""
    with mesh:
        return _solve_batch(inp, opt)


@jax.jit
def ckd_reduce(weights, i3z_batch, emoins_batch, eplus_batch):
    """AIK-weighted reduction over the CKD/scene axis.

    Replaces the reference's file-streaming aggregation
    (``src/SOS_AGGREGATE.F:372-459``): one einsum -> all-reduce over the
    scene axis of the mesh.
    """
    i3z = jnp.einsum("b,bscd->scd", weights, i3z_batch)
    emoins = jnp.sum(weights * emoins_batch)
    eplus = jnp.sum(weights * eplus_batch)
    return i3z, emoins, eplus


def aggregate_tau(weights, tau_batch):
    """Optical-depth aggregation in transmission space:
    tau = -ln(sum_i w_i exp(-tau_i)) (``src/SOS_AGGREGATE.F:466-488``)."""
    return -jnp.log(jnp.sum(weights * jnp.exp(-tau_batch)))


# ---------------------------------------------------------------------------
# CKD-term sharding of the production pipeline (used by proc.run)
# ---------------------------------------------------------------------------

def pad_terms(n_terms: int, n_shards: int) -> int:
    """Terms padded so the CKD batch divides the scene axis."""
    return ((n_terms + n_shards - 1) // n_shards) * n_shards


def solve_terms_sharded(mesh: Mesh, inp: solver.SolveInputs,
                        opt: solver.SolveOptions):
    """``solver.solve_fourier_batch`` with the CKD-term axis sharded.

    Each device runs the flattened (local-terms x Fourier-order) solve on
    its slice of the term batch — the embarrassingly parallel axis of
    SURVEY §2; kernels and surface matrices are replicated (they are shared
    by every term).  The term count must divide the 'scene' axis (pad with
    AIK-weight-0 duplicates via :func:`pad_terms`).
    """
    n_scene = mesh.shape["scene"]
    if inp.h.shape[0] % n_scene:
        raise ValueError(
            f"term count {inp.h.shape[0]} must divide scene axis {n_scene}")
    n0 = inp.n0
    flags = (inp.surface.rmat is None, inp.surface.f11 is None,
             inp.surface.f12 is None, inp.surface.f33 is None,
             inp.surface.ind_surf is None, inp.zprof is None,
             inp.zout_km is None, jnp.ndim(inp.tab) == 1)
    fn = _sharded_solver(mesh, opt, n0, flags)
    return fn(inp._replace(n0=None))


@_functools.lru_cache(maxsize=None)
def _sharded_solver(mesh, opt, n0, flags):
    """Jitted shard_map solver, cached on (mesh, options, input structure)."""
    (no_rmat, no_f11, no_f12, no_f33, no_ind, no_zprof, no_zout,
     tab_batched) = flags
    from jax.sharding import PartitionSpec as P

    term = P("scene")
    term_l = P("scene", None)
    rep = P()

    surf_specs = solver.SurfaceInputs(
        rho=rep,
        rmat=None if no_rmat else rep,
        f11=None if no_f11 else rep,
        f12=None if no_f12 else rep,
        f33=None if no_f33 else rep,
        ind_surf=None if no_ind else rep)
    in_specs = solver.SolveInputs(
        h=term_l, xdel=term_l, ydel=term_l,
        k_aer=rep, k_mol=rep, mu_pos=rep, w_pos=rep,
        tab=term if tab_batched else rep,
        n0=None, surface=surf_specs,
        zprof=None if no_zprof else term_l,
        zout_km=None if no_zout else rep)
    out_specs = solver.FourierResult(
        i3z=term, i3bnd=term, emoins=term, eplus=term, tauout=term)

    def local(local_inp):
        return solver.solve_fourier_batch(local_inp._replace(n0=n0), opt)

    return jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(in_specs,),
                                 out_specs=out_specs, check_vma=False))
