"""Scratch: blocked-dispatch tuning with the v2 kernels (not shipped)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from radiativetransfer_sos_tpu import precision, solver  # noqa: E402


def timeit(fn, n=2, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    prob16 = precision.demo_problem(jnp.float32, n_terms=16)

    for block in (16, 32):
        def run():
            res = solver.solve_fourier_blocked(prob16.inp, prob16.opt,
                                               block=block)
            np.asarray(res.emoins)
        dt = timeit(run)
        print(f"16 terms block={block}: {16/dt:.1f} terms/s", flush=True)

    prob512 = precision.demo_problem(jnp.float32, n_terms=512)
    for chunk in (256, 512):
        def run():
            res = solver.solve_fourier_blocked_chunked(
                prob512.inp, prob512.opt, term_chunk=chunk)
            np.asarray(res.emoins)
        try:
            dt = timeit(run, n=1)
            print(f"512 terms chunk={chunk}: {512/dt:.1f} terms/s",
                  flush=True)
        except Exception as e:
            print(f"512 terms chunk={chunk}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
