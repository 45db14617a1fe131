from protein_ensemble_vae_tpu.utils.logging import MetricLogger  # noqa: F401
