"""Clair3-RNA-TPU: a TPU-native long-read RNA-seq small-variant calling engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of Clair3-RNA
(reference: HKU-BAL/Clair3-RNA v0.2.2): pileup tensor construction over packed
read batches, batched Bi-LSTM genotype inference under jit, vectorized
candidate selection, and sharded streaming across a TPU device mesh instead of
multi-process shell orchestration.

Layering (bottom-up):
  config     -- all pipeline constants and platform presets
  task       -- GT21 / zygosity / variant-length label spaces
  io         -- FASTA/.fai, BGZF, BAM, VCF, BED readers & writers (self-contained)
  pileup     -- read event extraction + vectorized/Pallas channel-count builder
  models     -- Flax Bi-LSTM pileup network + TF-checkpoint conversion
  caller     -- device pre-screen + host genotype decode -> VCF records
  postprocess-- merge/sort/LowQual/REDIportal tagging
  parallel   -- device mesh, sharded batched inference, multi-host planning
  train      -- focal-loss training loop (optax), tensor binning
"""

__version__ = "0.1.0"
CALLER_NAME = "Clair3-RNA-TPU"
