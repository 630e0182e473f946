"""HBM-aware planning of the (Fourier block x CKD term chunk) dispatch.

The production CKD loop solves up to Pi NEXP <= 5^8 exponential-tuple terms
(``/root/reference/inc/SOS.h:278-292``, loop ``src/SOS_PROC.F:3459-3594``).
On TPU the terms and Fourier orders are batch axes of one compiled solve,
so the dispatch size is bounded by HBM, not by correctness: a (block x
term_chunk) tile that exceeds device memory dies at XLA buffer assignment
(exactly what shipped in round 3 — 32 orders x 256 terms at the demo shape
needs ~16 GB of while-loop field buffers and the v5e has 16 GB).

This module owns the arithmetic that prevents that: a byte estimate of the
solve's persistent live set and a picker that walks a measured preference
order and returns the fastest (block, term_chunk) that fits the device.
``proc.run`` and the chunked dispatch default to the picker, so no caller
can route into a shape that will not compile.
"""

from typing import Optional, Tuple

#: usable HBM per device kind (bytes).  ``Device.memory_stats()`` is the
#: preferred source but returns None through remote-TPU tunnels; this table
#: is the fallback, and 16 GB (the smallest current chip) the default.
HBM_BYTES = {
    "TPU v4": 32e9,
    "TPU v5 lite": 16e9,
    "TPU v5e": 16e9,
    "TPU v5": 95e9,
    "TPU v5p": 95e9,
    "TPU v6 lite": 32e9,
    "TPU v6e": 32e9,
}
DEFAULT_HBM = 16e9

#: fraction of HBM the solve may plan to; the rest covers XLA's reserved
#: arena, fusion temporaries and the host-transfer staging buffers
BUDGET_FRACTION = 0.70

#: (block, term_chunk) candidates in measured-throughput order on v5e
#: (512-term demo-shape sweep, .scratch/sweep_chunk.py, this round; the
#: first entry that fits the byte budget wins).  Larger chunks amortize
#: the per-block stop-test round trip; block 16 beat 32 once the chunk is
#: large because the Fourier early exit wastes less speculated work.
PREFERENCE: Tuple[Tuple[int, int], ...] = (
    (16, 256), (16, 128), (8, 256), (32, 128), (8, 512), (32, 64),
    (16, 64), (8, 128), (8, 64), (16, 32), (8, 32),
)


def _half_pad(n: int) -> int:
    # lane-aligned hemisphere width, 3*NBMU padded to 128 lanes (mirror of
    # solver._half_pad, kept local to avoid an import cycle)
    return ((3 * n + 127) // 128) * 128


def _pad_levels(nt: int) -> int:
    from . import pallas_ops
    return pallas_ops.pad_levels(nt)


def estimate_bytes(block: int, term_chunk: int, nt: int, n_mu: int,
                   use_zout: bool = False, imat_surf: bool = False,
                   itemsize: int = 4) -> int:
    """Estimate of the peak live set of one blocked-chunked solve dispatch.

    The dominant buffers are the field-sized (S, T, LP, HP) tensors that
    XLA must keep live across the scattering ``while_loop``
    (``solver._solve_st``): the (up, dn) field carry, the scatter source
    halves, and — calibrated on the v5e buffer-assignment dump from round
    3 — about two more field-sized temporaries of XLA double-buffering
    slack.  ``use_zout`` adds the level-resolved accumulator and its
    order-1 copy (two (up, dn) pairs); ``imat_surf`` + ``use_zout`` adds
    the direct-reflection field.  On top: the per-order phase operators
    k_aer/k_mol ((S, 3, 3, W, W) each) and their flattened matmul form.

    Calibration points (v5e 16 GB, demo shape NT=600 -> LP=640, NBMU=41 ->
    HP=128): 32x256 -> ~16.1 GB estimated, fails at compile (observed r3);
    16x256 -> ~8.2 GB, runs; 16x128 -> ~4.2 GB, runs.
    """
    lp = _pad_levels(nt)
    hp = _half_pad(n_mu)
    w = 2 * hp
    field = block * term_chunk * lp * hp * itemsize
    n_field = 6 + (4 if use_zout else 0) \
        + (1 if (imat_surf and use_zout) else 0)
    d = 2 * n_mu + 1
    operators = 2 * block * 9 * d * d * itemsize     # k_aer + k_mol
    operators += block * (2 * w) * w * itemsize      # flattened mboth
    return n_field * field + operators


def device_hbm(device=None) -> float:
    """Usable HBM of ``device`` (bytes): live ``memory_stats`` when the
    runtime exposes them, else the :data:`HBM_BYTES` table."""
    if device is None:
        import jax
        device = jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if stats:
        lim = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if lim:
            return float(lim)
    return HBM_BYTES.get(getattr(device, "device_kind", ""), DEFAULT_HBM)


def pick_dispatch(n_terms: int, n_orders: int, nt: int, n_mu: int,
                  use_zout: bool = False, imat_surf: bool = False,
                  hbm: Optional[float] = None,
                  device=None) -> Tuple[int, int]:
    """Fastest (block, term_chunk) that fits the device memory budget.

    Walks :data:`PREFERENCE` (measured order) over candidates no larger
    than the problem itself and returns the first whose
    :func:`estimate_bytes` fits ``BUDGET_FRACTION`` of the device HBM.
    Always returns something: the final fallback (8, 32) is ~100 MB at the
    demo shape and fits every supported chip.
    """
    if hbm is None:
        hbm = device_hbm(device)
    budget = hbm * BUDGET_FRACTION
    best = None
    for block, chunk in PREFERENCE:
        b = min(block, n_orders)
        c = min(chunk, n_terms)
        est = estimate_bytes(b, c, nt, n_mu, use_zout, imat_surf)
        if est <= budget:
            return b, c
        if best is None or est < best[0]:
            best = (est, (b, c))
    return best[1]
