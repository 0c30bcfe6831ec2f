"""Model parameter serialization (.npz — no external deps, stable layout).

Replaces TF .index/.data checkpoint pairs (run_clair3_rna:488-495) as the
native weight format; models/convert.py turns reference checkpoints into this.
"""

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def _unflatten(flat):
    tree = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str, params) -> str:
    if not path.endswith(".npz"):
        path += ".npz"
    np.savez_compressed(path, **_flatten(params))
    return path


def load_params(path: str, as_jax=True):
    data = np.load(path)
    flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    if as_jax:
        import jax.numpy as jnp
        tree = _to_jnp(tree)
    return tree


def _to_jnp(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def resolve_params(path_or_prefix: str, add_indel_length=False):
    """Load weights from .npz, a TF checkpoint prefix, or a Keras .h5."""
    import os
    if path_or_prefix.endswith(".npz") and os.path.exists(path_or_prefix):
        return load_params(path_or_prefix)
    if os.path.exists(path_or_prefix + ".npz"):
        return load_params(path_or_prefix + ".npz")
    if os.path.exists(path_or_prefix + ".index"):
        from clair3_rna_tpu.models.convert import params_from_tf_checkpoint
        return params_from_tf_checkpoint(path_or_prefix,
                                         add_indel_length=add_indel_length)
    raise FileNotFoundError(f"no model weights at {path_or_prefix}")
