"""Worker process of the 2-process ``jax.distributed`` CPU smoke test.

Spawned by ``tests/test_distributed.py`` as ``python dist_worker.py
<process_id> <num_processes> <coordinator_port>``.  Each process owns 4
virtual CPU devices; the global (scene=8, fourier=1) mesh therefore spans
the process (DCN) boundary, which is exactly the layout
``parallel.mesh.init_distributed`` documents for multi-host runs: CKD
terms shard across hosts, the only cross-host traffic is the gathered
boundary records / weighted reduction (SURVEY §5).

Prints ``DIST_OK <pid> <checksum>`` on success; the parent asserts both
processes print the same checksum and that it matches a single-process
solve of the same problem.
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from radiativetransfer_sos_tpu.parallel import mesh as pmesh

    assert pmesh.init_distributed(), "coordinator env set but init refused"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import jax.numpy as jnp

    from radiativetransfer_sos_tpu import precision

    prob = precision.demo_problem(jnp.float64, n_gauss=6, nt=24, os_nb=12,
                                  igmax=8, n_terms=8)
    mesh = pmesh.make_mesh(n_scene=4 * nproc, n_fourier=1)
    res = pmesh.solve_terms_sharded(mesh, prob.inp, prob.opt)
    # a jnp reduction of the sharded global array yields a replicated
    # scalar every process can read
    checksum = float(jnp.sum(jnp.abs(res.i3bnd)))
    # res.emoins stays sharded over 'scene'; only reductions (replicated
    # scalars) are readable from every process without a gather
    emoins = float(jnp.sum(res.emoins))
    print(f"DIST_OK {pid} {checksum:.15e} {emoins:.15e}", flush=True)


if __name__ == "__main__":
    main()
