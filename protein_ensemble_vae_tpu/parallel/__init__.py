from protein_ensemble_vae_tpu.parallel.mesh import (  # noqa: F401
    coordination_barrier,
    initialize_multihost,
    make_mesh,
    make_parallel_jit,
    shard_batch,
    tp_param_pspecs,
    validate_mesh_config,
)
