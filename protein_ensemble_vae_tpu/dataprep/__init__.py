from protein_ensemble_vae_tpu.dataprep.mmcif import parse_mmcif_backbone  # noqa: F401
from protein_ensemble_vae_tpu.dataprep.align import (  # noqa: F401
    core_fit_align,
    medoid_index,
    needleman_wunsch,
)
