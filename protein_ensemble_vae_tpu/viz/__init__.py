from protein_ensemble_vae_tpu.viz.training_curves import plot_training_curves  # noqa: F401
from protein_ensemble_vae_tpu.viz.parameters import (  # noqa: F401
    parameter_stats,
    write_parameter_summary,
)
