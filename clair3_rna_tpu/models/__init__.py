"""Pileup genotyping networks (JAX/Flax) + TF checkpoint conversion."""

from clair3_rna_tpu.models.network import PileupNet, make_forward_fn
