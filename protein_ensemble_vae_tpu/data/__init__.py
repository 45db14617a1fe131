from protein_ensemble_vae_tpu.data.dataset import (  # noqa: F401
    Conformer,
    EnsembleDataset,
    SingleConformerView,
)
from protein_ensemble_vae_tpu.data.collate import (  # noqa: F401
    ConformerBatch,
    PairBatch,
    make_epoch_batches,
    make_prepadded_factory,
    make_sharded_epoch_batches,
    pad_conformers,
)
from protein_ensemble_vae_tpu.data.synthetic import (  # noqa: F401
    make_synthetic_dataset,
    write_synthetic_h5,
)
