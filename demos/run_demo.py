"""Run one shipped demo case end to end and write its result files.

Usage::

    python demos/run_demo.py principal  /tmp/demo_out
    python demos/run_demo.py polar      /tmp/demo_out
    python demos/run_demo.py binding440 /tmp/demo_out

Runs on whatever JAX backend is active; pass ``--f64-cpu`` to force the
float64 CPU path (used to generate the committed goldens).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))


def run_case(name: str, out_root: str, mie_dir: str | None = None):
    from configs import CASES

    from radiativetransfer_sos_tpu.api import (config_from_keywords,
                                               write_result_files)
    from radiativetransfer_sos_tpu.proc import sos_run

    os.makedirs(out_root, exist_ok=True)
    mie_dir = mie_dir or os.path.join(out_root, "MIE")
    kw = CASES[name](out_root, mie_dir)
    cfg = config_from_keywords(kw)
    res = sos_run(cfg)
    write_result_files(cfg, res)
    return cfg, res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("case", choices=("principal", "polar", "binding440"))
    ap.add_argument("out_root")
    ap.add_argument("--mie-dir", default=None)
    ap.add_argument("--f64-cpu", action="store_true",
                    help="force the float64 CPU path")
    args = ap.parse_args(argv)

    if args.f64_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    cfg, res = run_case(args.case, args.out_root, args.mie_dir)
    print(f"{args.case}: {res.n_ckd_terms} CKD terms, "
          f"I_up max {res.up['i'].max():.6e}, "
          f"outputs under {args.out_root}/SOS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
