from protein_ensemble_vae_tpu.ops.pallas.clash import clash_loss_pallas  # noqa: F401
