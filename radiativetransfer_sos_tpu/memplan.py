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
    "TPU v4": 32 * 2 ** 30,
    "TPU v5 lite": 16 * 2 ** 30,
    "TPU v5e": 16 * 2 ** 30,
    "TPU v5": 95 * 2 ** 30,
    "TPU v5p": 95 * 2 ** 30,
    "TPU v6 lite": 32 * 2 ** 30,
    "TPU v6e": 32 * 2 ** 30,
}
DEFAULT_HBM = 16 * 2 ** 30

#: headroom kept free of the plan: XLA's reserved arena, host-transfer
#: staging buffers and allocator slack (the estimate itself tracks the
#: compiled executable's reported temp size to ~2%)
RESERVE_FRACTION = 0.05
RESERVE_BYTES = 0.3e9


def budget_bytes(hbm: float) -> float:
    return hbm * (1.0 - RESERVE_FRACTION) - RESERVE_BYTES

#: Fourier block size by dispatch term count, measured on v5e.  Small
#: blocks waste fewer orders past the SOS_ARRET_FOURIER stop; large term
#: batches amortize each dispatch.  Re-swept in round 5 after the async
#: device-resident stop test + kernel stream packing (~1.6-2x across the
#: board; the r4 optima stand).  Measured terms/s at the demo shape:
#:
#:   terms  block=4  block=8  block=16     (r4: 4 / 8 / 16)
#:    512     708      527      391        (434 / 388 / 285)
#:    128     448      454      345        (241 / 254 / 248)
#:     16      89      117      132        ( 48 /  73 / 112)
BLOCK_BY_TERMS: Tuple[Tuple[int, int], ...] = ((256, 4), (64, 8), (0, 16))

#: term-chunk candidates, largest first — bigger chunks amortize the
#: per-block dispatch overhead and won every memory-feasible comparison
CHUNK_CANDIDATES: Tuple[int, ...] = (1024, 512, 256, 128, 64, 32)


def block_for_terms(n_terms: int) -> int:
    """Measured-best Fourier block for a dispatch of ``n_terms`` terms."""
    for min_t, block in BLOCK_BY_TERMS:
        if n_terms >= min_t:
            return block
    return BLOCK_BY_TERMS[-1][1]


def _half_pad(n: int) -> int:
    # lane-aligned hemisphere width, 3*NBMU padded to 128 lanes (mirror of
    # solver._half_pad, kept local to avoid an import cycle)
    return ((3 * n + 127) // 128) * 128


def _pad_levels(nt: int) -> int:
    from . import pallas_ops
    return pallas_ops.pad_levels(nt)


#: measured XLA temp size per field-sized (S, T, LP, HP) buffer unit —
#: calibrated against ``compiled.memory_analysis()`` on the real v5e this
#: round across six (S, T) shapes (ratio 12.03 +- 0.01 for the base
#: config: the while-loop (up, dn) carry, the scatter source halves and
#: their double buffers).  ``use_zout`` adds the level-resolved
#: accumulator + order-1 copy (measured 18.05); zout + surface matrices
#: add the direct-reflection field (measured 19.04).  A ~2% margin is
#: kept on each.
FIELD_MULT_BASE = 12.25
FIELD_MULT_ZOUT = 6.2
FIELD_MULT_ZOUT_IMAT = 1.1


def estimate_bytes(block: int, term_chunk: int, nt: int, n_mu: int,
                   use_zout: bool = False, imat_surf: bool = False,
                   itemsize: int = 4) -> int:
    """Estimate of the peak live set of one blocked-chunked solve dispatch.

    The dominant buffers are the field-sized (S, T, LP, HP) tensors XLA
    keeps live across the scattering ``while_loop`` (``solver._solve_st``)
    plus their pipelining copies; the multiplier is measured, not derived
    (:data:`FIELD_MULT_BASE`).  On top: the per-order phase operators
    k_aer/k_mol and their flattened matmul form.

    Validated against the compiled executable's reported footprint in
    ``tests/test_tpu_production.py`` (estimate must stay an upper bound).
    Known r3 failure point: 32x256 at the demo shape -> 33 GB estimated,
    v5e has 17.2; the shipped default crashed at buffer assignment.
    """
    lp = _pad_levels(nt)
    hp = _half_pad(n_mu)
    w = 2 * hp
    field = block * term_chunk * lp * hp * itemsize
    mult = FIELD_MULT_BASE + (FIELD_MULT_ZOUT if use_zout else 0.0) \
        + (FIELD_MULT_ZOUT_IMAT if (imat_surf and use_zout) else 0.0)
    d = 2 * n_mu + 1
    operators = 2 * block * 9 * d * d * itemsize     # k_aer + k_mol
    operators += block * (2 * w) * w * itemsize      # flattened mboth
    return int(mult * field) + operators


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

    Walks :data:`CHUNK_CANDIDATES` largest-first (bigger chunks measured
    faster whenever they fit), pairs each with the measured-best block for
    that dispatch size (:func:`block_for_terms`), and returns the first
    combination whose :func:`estimate_bytes` fits :func:`budget_bytes` of
    the device HBM.  Always returns something: the final fallback
    (16, 32) is ~800 MB at the demo shape and fits every supported chip.
    """
    if hbm is None:
        hbm = device_hbm(device)
    budget = budget_bytes(hbm)
    best = None
    seen = set()
    for chunk in CHUNK_CANDIDATES:
        c = min(chunk, n_terms)
        if c in seen:
            continue
        seen.add(c)
        b = min(block_for_terms(c), n_orders)
        est = estimate_bytes(b, c, nt, n_mu, use_zout, imat_surf)
        if est <= budget:
            return b, c
        if best is None or est < best[0]:
            best = (est, (b, c))
    return best[1]
