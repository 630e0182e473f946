"""Batched production runs: the lookup-table workload.

The reference generates LUTs by shelling out one ``SOS_ABS_MAIN.exe``
process per (wavelength, geometry, aerosol, surface) case — every case
repeats the full property generation and pays a fresh process + file
pipeline (``exe/runSOS-ABS_demo.ksh``).  Here a sweep is a first-class
operation:

* one process, one jitted solver — the static shapes (angle count, layer
  grid, Fourier orders) are shared across the sweep, so the solver
  compiles once and every case reuses the executable;
* the per-case CKD-term batch can be sharded over a device mesh
  (``proc.run(..., mesh=...)``);
* Mie sweeps / surface matrices are memoized across cases through the
  product cache (``cache.memo``), the array equivalent of the reference's
  parameter-encoded product files;
* optional checkpointing: each finished case is written to a directory and
  skipped on resume — the coarse-grained recovery the reference gets from
  its cached product files and incremental aggregation file
  (``src/SOS_AGGREGATE.F:328-441``), SURVEY.md §5.
"""

from __future__ import annotations

import copy
import dataclasses
import hashlib
import json
import os
import pickle
from typing import Callable, Iterable, Optional

from .config import SosConfig
from .proc import SosResults, sos_run


def case_key(cfg: SosConfig) -> str:
    """Content hash of one case — every physics parameter participates,
    like the reference's parameter-encoded file names
    (``SOS_NOM_FIC_SURFACE.F``)."""
    blob = json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:24]


def sweep_configs(base: SosConfig, axes: dict) -> list[SosConfig]:
    """Cartesian sweep: ``axes`` maps dotted config paths to value lists,
    e.g. ``{"wavelength": [...], "angles.thetas_deg": [...],
    "aerosols.aot_ref": [...]}``."""
    cases = [copy.deepcopy(base)]
    for path, values in axes.items():
        nxt = []
        for c in cases:
            for v in values:
                cc = copy.deepcopy(c)
                obj = cc
                *heads, leaf = path.split(".")
                for head in heads:
                    obj = getattr(obj, head)
                setattr(obj, leaf, v)
                nxt.append(cc)
        cases = nxt
    return cases


def sos_run_many(cfgs: Iterable[SosConfig], mesh=None,
                 checkpoint_dir: Optional[str] = None,
                 on_result: Optional[Callable[[int, SosConfig, SosResults],
                                              None]] = None,
                 trace=None) -> list[SosResults]:
    """Run a batch of configurations, reusing the compiled solver.

    With ``checkpoint_dir``, each finished case is pickled under its
    content hash and skipped when re-running the same sweep (coarse
    resume).  ``on_result(i, cfg, res)`` streams results as they finish.
    """
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
    out: list[SosResults] = []
    for i, cfg in enumerate(cfgs):
        path = None
        if checkpoint_dir:
            path = os.path.join(checkpoint_dir, case_key(cfg) + ".pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    res = pickle.load(f)
                out.append(res)
                if on_result:
                    on_result(i, cfg, res)
                continue
        res = sos_run(cfg, trace=trace, mesh=mesh)
        if path:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(res, f)
            os.replace(tmp, path)          # atomic, like the mv of C18
        out.append(res)
        if on_result:
            on_result(i, cfg, res)
    return out
