from protein_ensemble_vae_tpu.utils.compile_cache import (  # noqa: F401
    enable_compilation_cache,
)
from protein_ensemble_vae_tpu.utils.logging import MetricLogger  # noqa: F401
from protein_ensemble_vae_tpu.utils.seeding import set_seed  # noqa: F401
