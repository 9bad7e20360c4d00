"""controlled_peptide_generation_tpu — TPU-native CLaSS peptide generation.

A from-scratch JAX / XLA / Pallas / pjit framework with the capabilities of
IBM/controlled-peptide-generation (CLaSS, Nature BME 2021):

* Phase 1: GRU-based VAE/WAE sequence autoencoder training, one jitted XLA
  program per train step (reference: train_vae.py, models/model.py).
* Phase 2: CLaSS controlled generation — latent GMM density models fit by
  batched on-device EM, latent logistic-regression attribute classifiers,
  vmapped rejection sampling, and fully batched on-device beam-search
  decoding (reference: density_modeling.py, sample_pipeline.py,
  models/Beam.py).

Import as ``import controlled_peptide_generation_tpu as cpg``.
"""

__version__ = "0.1.0"
