"""Device-mesh parallelism: sharded inference/training across TPU chips.

The reference's only parallelism is OS-process data parallelism over genome
chunks via GNU parallel (run_clair3_rna:681-707, SURVEY 2.3). Here the same
data parallelism is expressed as a jax.sharding Mesh: candidate batches shard
over the 'dp' axis, weights are replicated (or tensor-sharded over 'tp' for
demonstration at scale), and genome chunks shard across hosts.
"""

from clair3_rna_tpu.parallel.mesh import (
    make_mesh, sharded_forward_fn, sharded_train_step_fn,
)
