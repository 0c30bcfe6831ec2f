"""Training loop: RAdam + focal loss over a device mesh.

Matches the reference's training recipe (shared/param_p.py:8-9,49-57: Radam
optimizer, FocalLoss, batch 2000, lr 1e-3, L2 1e-7, 90/10 split, 30 epochs)
but runs as a jit-compiled, dp-sharded JAX step instead of Keras fit().
"""

import logging
import os

import numpy as np

from clair3_rna_tpu import config

logger = logging.getLogger(__name__)


def train_model(bin_dir, output_path, *, add_indel_length=True, phased=False,
                batch_size=config.TRAIN_BATCH_SIZE,
                learning_rate=config.INITIAL_LEARNING_RATE,
                max_epochs=config.MAX_EPOCH, seed=0,
                validation_fraction=1 - config.TRAINING_DATASET_PERCENTAGE,
                patience=5, use_mesh=True):
    """Train PileupNet on binned tensors; saves best weights to .npz."""
    import jax
    import jax.numpy as jnp
    import optax

    from clair3_rna_tpu.models.network import PileupNet, init_params
    from clair3_rna_tpu.models.params_io import save_params
    from clair3_rna_tpu.parallel.mesh import (
        make_mesh, shard_params, sharded_train_step_fn, task_loss,
    )
    from clair3_rna_tpu.train.data import load_bins

    X, Y = load_bins(bin_dir)
    expected_channels = config.CHANNEL_SIZE + (
        config.PHASED_CHANNEL_SIZE if phased else 0)
    if X.shape[-1] != expected_channels:
        raise SystemExit(
            f"[ERROR] bins have {X.shape[-1]} channels but "
            f"{'--phased' if phased else 'unphased'} training expects "
            f"{expected_channels} (rebuild with tensor2bin "
            f"{'--phased' if phased else 'without --phased'})")
    n = len(X)
    rng = np.random.RandomState(seed)
    order = rng.permutation(n)
    X, Y = X[order], Y[order]
    n_val = max(1, int(n * validation_fraction))
    X_train, Y_train = X[n_val:], Y[n_val:]
    X_val, Y_val = X[:n_val], Y[:n_val]
    if not add_indel_length:
        Y_train = Y_train[:, :24]
        Y_val = Y_val[:, :24]
    logger.info("[INFO] training on %d samples, validating on %d",
                len(X_train), n_val)

    n_dev = len(jax.devices()) if use_mesh else 1
    # clamp to the training set so small datasets still take gradient steps
    # (the step loop drops partial batches to keep the jit shape fixed)
    batch_size = min(batch_size, len(X_train))
    batch_size = max(n_dev, batch_size - batch_size % n_dev)
    mesh = make_mesh(tp=1)
    model = PileupNet(add_indel_length=add_indel_length)
    params = init_params(seed, add_indel_length=add_indel_length, phased=phased)
    optimizer = optax.radam(learning_rate)
    with mesh:
        params = shard_params(params, mesh)
        opt_state = optimizer.init(params)
        train_step = sharded_train_step_fn(model, optimizer, mesh,
                                           add_indel_length=add_indel_length)

        @jax.jit
        def eval_loss(params, x, y):
            probs = model.apply({"params": params}, x)
            return task_loss(probs, y, add_indel_length)

        key = jax.random.PRNGKey(seed)
        best_val = float("inf")
        best_params = params
        bad_epochs = 0
        steps_per_epoch = max(1, len(X_train) // batch_size)
        if steps_per_epoch < 8:
            logger.warning(
                "[WARNING] only %d optimizer step(s) per epoch (batch %d vs "
                "%d samples): with few total steps the model will undertrain; "
                "lower --batch_size for small datasets",
                steps_per_epoch, batch_size, len(X_train))
        for epoch in range(max_epochs):
            perm = rng.permutation(len(X_train))
            epoch_loss = 0.0
            for step in range(steps_per_epoch):
                idx = perm[step * batch_size:(step + 1) * batch_size]
                if len(idx) < batch_size:
                    continue
                key, sub = jax.random.split(key)
                params, opt_state, loss = train_step(
                    params, opt_state, jnp.asarray(X_train[idx]),
                    jnp.asarray(Y_train[idx]), sub)
                epoch_loss += float(loss)
            val = _batched_eval(eval_loss, params, X_val, Y_val, batch_size)
            logger.info("[INFO] epoch %d: train loss %.4f, val loss %.4f",
                        epoch + 1, epoch_loss / steps_per_epoch, val)
            if val < best_val - 1e-5:
                best_val = val
                best_params = jax.tree_util.tree_map(lambda a: a, params)
                bad_epochs = 0
            else:
                bad_epochs += 1
                if bad_epochs >= patience:
                    logger.info("[INFO] early stop at epoch %d", epoch + 1)
                    break

    host_params = jax.tree_util.tree_map(np.asarray, best_params)
    path = save_params(output_path, host_params)
    logger.info("[INFO] saved weights -> %s (val loss %.4f)", path, best_val)
    return path, best_val


def _batched_eval(eval_loss, params, X, Y, batch_size):
    import jax.numpy as jnp

    total, count = 0.0, 0
    for lo in range(0, len(X), batch_size):
        x = X[lo:lo + batch_size]
        y = Y[lo:lo + batch_size]
        if len(x) == 0:
            continue
        total += float(eval_loss(params, jnp.asarray(x), jnp.asarray(y))) * len(x)
        count += len(x)
    return total / max(1, count)
