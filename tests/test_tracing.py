"""Tracing/logging subsystem (SURVEY.md §5): stage timers + JOB_STATUS."""

import numpy as np

from radiativetransfer_sos_tpu.config import SosConfig
from radiativetransfer_sos_tpu.proc import sos_run
from radiativetransfer_sos_tpu.tracing import Trace


def test_trace_stages_and_job_status(tmp_path):
    log = tmp_path / "main.log"
    cfg = SosConfig(wavelength=0.55)
    cfg.angles.thetas_deg = 25.0
    cfg.angles.nbmu_lum = 8
    cfg.surface.alb = 0.1
    cfg.absorption.absprofil = 7
    cfg.igmax = 30
    tr = Trace(logfile=str(log))
    res = sos_run(cfg, trace=tr)
    tr.close(ok=True)

    assert res.timings is not None
    for stage in ("angles", "aerosols", "surface", "absorption", "solve"):
        assert stage in res.timings and res.timings[stage] >= 0.0
    txt = log.read_text()
    assert "JOB_STATUS=OK" in txt
    assert "--> solve" in txt and "<-- solve" in txt
    assert "ckd: n_terms=1" in txt
    assert np.all(res.up["i"][1] > 0)


def test_trace_error_status(tmp_path):
    tr = Trace(logfile=str(tmp_path / "err.log"))
    with tr.stage("doomed"):
        pass
    tr.close(ok=False)
    assert "JOB_STATUS=ERROR" in (tmp_path / "err.log").read_text()
