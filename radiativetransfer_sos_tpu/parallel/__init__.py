from .mesh import (  # noqa: F401
    make_mesh, shard_solve_inputs, solve_scenes_sharded, ckd_reduce,
    init_distributed, pad_orders, pad_terms, solve_terms_sharded,
    solve_terms_sharded_blocked, solve_multiband_sharded)
