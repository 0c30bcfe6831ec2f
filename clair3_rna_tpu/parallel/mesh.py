"""Mesh construction + pjit'd inference and training steps.

Sharding layout:
  - batch axis  -> 'dp' (candidate windows are embarrassingly parallel,
                   mirroring the reference's chunk-level fan-out)
  - model axis  -> 'tp' (LSTM gate blocks / dense columns; the pileup net is
                   small (~2M params) so tp=1 is the production default, but
                   the layout is wired so XLA inserts the collectives when
                   tp > 1)
Weights use NamedSharding specs; XLA inserts all-gathers/psums over ICI.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clair3_rna_tpu import config


def make_mesh(n_devices=None, tp=1, devices=None):
    """Build a ('dp', 'tp') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    dev_array = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(dev_array, ("dp", "tp"))


# the flatten->L4 dense is the one kernel whose INPUT dimension is large
# (33 positions x 2*160 lstm2 features); anything above this is row-sharded
_ROW_PARALLEL_MIN_FAN_IN = 1024


def _is_row_parallel(leaf):
    return leaf.ndim == 2 and leaf.shape[0] >= _ROW_PARALLEL_MIN_FAN_IN


def param_spec(path_names, leaf, tp=1) -> P:
    """Partition spec for one parameter leaf, decided STRUCTURALLY (by
    shape), never by module name -- renames cannot silently mis-shard.

    Dense/LSTM kernels shard their output (gate) dimension over 'tp' when it
    divides evenly; small heads and indivisible dims replicate. The unique
    large-fan-in kernel (flatten->L4, [33*320, 128]) shards its input
    dimension (row-parallel), and correspondingly its bias -- the output of
    a row-parallel matmul is a psum, already complete on every shard -- is
    replicated.
    """
    del path_names  # structural rules only
    if leaf.ndim == 2:
        if _is_row_parallel(leaf) and leaf.shape[0] % tp == 0:
            return P("tp", None)     # row-parallel: [33*320/tp, 128]
        if leaf.shape[1] % tp == 0 and leaf.shape[1] >= 64:
            return P(None, "tp")     # column-parallel gates/heads
        return P(None, None)
    if leaf.ndim == 1:
        # 1D leaves: biases of column-parallel kernels shard with their
        # outputs; the row-parallel (L4) bias must replicate. L4's bias is
        # 128-wide like the head denses', so distinguish it by its sibling
        # kernel -- handled in shard_params via the parent module's kernel.
        if leaf.shape[0] % tp == 0 and leaf.shape[0] >= 64:
            return P("tp")
        return P(None)
    return P()


def _spec_for_module(module_params, leaf_name, leaf, tp):
    """param_spec with the row-parallel bias exception resolved from the
    sibling kernel's shape instead of the module's name."""
    if leaf.ndim == 1:
        kernel = module_params.get("kernel")
        if kernel is not None and _is_row_parallel(kernel):
            return P(None)
    return param_spec((leaf_name,), leaf, tp=tp)


def shard_params(params, mesh):
    tp = mesh.shape["tp"]

    def place(path, leaf):
        # resolve the leaf's parent module dict so bias specs can consult
        # their sibling kernel's shape (structural row-parallel detection)
        module = params
        for p in path[:-1]:
            module = module[p.key]
        spec = _spec_for_module(module, path[-1].key, leaf, tp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def sharded_forward_fn(model, mesh):
    """jit forward with batch sharded over dp and params as laid out."""
    batch_sharding = NamedSharding(mesh, P(("dp",), None, None))
    out_sharding = NamedSharding(mesh, P(("dp",), None))

    @partial(jax.jit, out_shardings=out_sharding)
    def forward(params, x):
        x = jax.lax.with_sharding_constraint(x, batch_sharding)
        return model.apply({"params": params}, x)

    return forward


def focal_loss(probabilities, labels, gamma=2.0):
    """Focal loss on softmax outputs (the reference's default loss,
    shared/param_p.py:9 FocalLoss)."""
    p = jnp.clip(probabilities, 1e-9, 1.0)
    return -jnp.sum(labels * ((1.0 - p) ** gamma) * jnp.log(p), axis=-1)


def task_loss(probabilities, labels, add_indel_length=False):
    """Sum of per-head focal losses using the label layout
    (clair3_rna/task/main.py:10-48)."""
    cum = config.LABEL_SHAPE_CUM
    loss = focal_loss(probabilities[:, :cum[0]], labels[:, :cum[0]])
    loss += focal_loss(probabilities[:, cum[0]:cum[1]], labels[:, cum[0]:cum[1]])
    if add_indel_length:
        loss += focal_loss(probabilities[:, cum[1]:cum[2]], labels[:, cum[1]:cum[2]])
        loss += focal_loss(probabilities[:, cum[2]:cum[3]], labels[:, cum[2]:cum[3]])
    return jnp.mean(loss)


def l2_regularization(params, lam=config.L2_REGULARIZATION_LAMBDA):
    return lam * sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(params)
                     if l.ndim >= 2)


def sharded_train_step_fn(model, optimizer, mesh, add_indel_length=False):
    """pjit'd full training step: dp-sharded batch, tp-sharded weights,
    gradients psum'd by XLA from the sharding layout."""
    batch_sharding = NamedSharding(mesh, P(("dp",), None, None))
    label_sharding = NamedSharding(mesh, P(("dp",), None))

    def loss_fn(params, x, y, dropout_rng):
        probs = model.apply({"params": params}, x, train=True,
                            rngs={"dropout": dropout_rng})
        return task_loss(probs, y, add_indel_length) + l2_regularization(params)

    @jax.jit
    def train_step(params, opt_state, x, y, dropout_rng):
        x = jax.lax.with_sharding_constraint(x, batch_sharding)
        y = jax.lax.with_sharding_constraint(y, label_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, dropout_rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step
