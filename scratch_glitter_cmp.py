"""Scratch: glitter+fresnel solver TPU-vs-CPU comparison (not shipped)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from radiativetransfer_sos_tpu import precision, solver  # noqa: E402


def with_surface(prob, seed=5):
    rng = np.random.default_rng(seed)
    n = prob.inp.mu_pos.shape[0]
    n_s = prob.inp.k_aer.shape[0]
    dtype = prob.inp.h.dtype
    rmat = rng.random((n_s, 3, 3, n, n)) * 0.05
    f11 = rng.random(n + 1) * 0.03
    f12 = rng.random(n + 1) * 0.01
    f33 = rng.random(n + 1) * 0.01
    surf = prob.inp.surface._replace(
        rmat=jnp.asarray(rmat, dtype),
        f11=jnp.asarray(f11, dtype), f12=jnp.asarray(f12, dtype),
        f33=jnp.asarray(f33, dtype))
    inp = prob.inp._replace(surface=surf)
    opt = prob.opt._replace(imat_surf=True, ifresnel=True)
    return inp, opt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    n_terms = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
    prob = precision.demo_problem(jnp.float32, n_terms=n_terms)
    inp, opt = with_surface(prob)
    res = solver.solve_fourier_batch_jit(inp, opt)
    out = np.asarray(res.i3bnd, dtype=np.float64)
    np.save(f"/tmp/glitter_{mode}_{os.environ.get('TAG','x')}_{n_terms}.npy",
            out)
    print(mode, n_terms, "sum", float(np.abs(out).sum()),
          "i3bnd[0,0,0,:3]", out[0, 0, 0, 41:44], flush=True)


if __name__ == "__main__":
    main()
