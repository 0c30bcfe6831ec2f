"""Model parity: Flax PileupNet vs the reference TF Clair3_P with converted
weights (random init -- the released checkpoints are not downloadable here,
but conversion + architecture equivalence is what we can and must prove)."""

import numpy as np
import pytest

from tests.conftest import requires_reference


def _tf_model(add_indel_length, channels=18, seed=0):
    tf = pytest.importorskip("tensorflow")
    import sys
    sys.path.insert(0, "/root/reference")
    from clair3_rna.model import Clair3_P

    tf.keras.utils.set_random_seed(seed)
    m = Clair3_P(add_indel_length=add_indel_length, predict=True)
    x = np.zeros((2, 33, channels), dtype=np.int32)
    m(x)  # build weights
    return m


@requires_reference
@pytest.mark.parametrize("add_indel_length", [False, True])
def test_forward_parity(reference_path, add_indel_length):
    from clair3_rna_tpu.models.convert import params_from_keras_model
    from clair3_rna_tpu.models.network import make_forward_fn

    m = _tf_model(add_indel_length)
    params = params_from_keras_model(m, add_indel_length=add_indel_length)
    _, forward = make_forward_fn(add_indel_length=add_indel_length)

    rng = np.random.RandomState(1)
    x = rng.randint(-30, 30, size=(8, 33, 18)).astype(np.int32)
    ref_out = np.asarray(m(x))
    our_out = np.asarray(forward(params, x))
    assert our_out.shape == ref_out.shape == (8, 24 + (66 if add_indel_length else 0))
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-4, atol=1e-6)
    # outputs are two (or four) concatenated softmaxes
    np.testing.assert_allclose(our_out[:, :21].sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(our_out[:, 21:24].sum(-1), 1.0, rtol=1e-5)


@requires_reference
def test_forward_parity_phased_channels(reference_path):
    from clair3_rna_tpu.models.convert import params_from_keras_model
    from clair3_rna_tpu.models.network import make_forward_fn

    m = _tf_model(False, channels=30)
    params = params_from_keras_model(m)
    _, forward = make_forward_fn()
    rng = np.random.RandomState(2)
    x = rng.randint(-20, 20, size=(4, 33, 30)).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(forward(params, x)), np.asarray(m(x)), rtol=2e-4, atol=1e-6)


def test_init_and_shapes():
    from clair3_rna_tpu.models.network import init_params, make_forward_fn
    import numpy as np

    params = init_params(0)
    _, forward = make_forward_fn()
    x = np.zeros((3, 33, 18), np.int32)
    out = np.asarray(forward(params, x))
    assert out.shape == (3, 24)
    np.testing.assert_allclose(out[:, :21].sum(-1), 1.0, rtol=1e-5)


def test_forward_parity_across_batch_shapes():
    """Per-row outputs must not depend on batch shape or padding.

    Regression guard for the direction-batched BiLSTM formulation this
    module used through round 2: stacking both directions into a [2,B,T,4U]
    operand and transposing it to scan order miscompiled on TPU v5e at
    B=2048 (the backward projection came out wrong by O(magnitude)), so the
    production 2048-candidate batches got a corrupted backward LSTM while
    1024-batches were fine. The rewrite scans a tuple of plain 3-D per-
    direction operands; this asserts row invariance across the production
    bucket shapes, and a numpy float64 LSTM oracle pins the semantics."""
    from clair3_rna_tpu.models.network import init_params, make_forward_fn

    params = init_params(7)
    _, forward = make_forward_fn()
    rng = np.random.RandomState(4)
    x = rng.randint(-40, 40, size=(96, 33, 18)).astype(np.int32)

    def run(bucket):
        pad = np.zeros((bucket - len(x), 33, 18), np.int32)
        return np.asarray(forward(params, np.concatenate([x, pad])))[:96]

    base = run(96)
    for bucket in (128, 512, 1024, 2048):
        np.testing.assert_allclose(run(bucket), base, rtol=5e-5, atol=5e-6)

    # float64 oracle for the first BiLSTM layer on one row
    from clair3_rna_tpu.models.network import BiLSTM
    import jax

    p1 = params["lstm1"]
    kf, rf, bf = (np.asarray(p1["forward"][n]) for n in
                  ("kernel", "recurrent_kernel", "bias"))
    kb, rb, bb = (np.asarray(p1["backward"][n]) for n in
                  ("kernel", "recurrent_kernel", "bias"))

    def np_lstm(xr, k, r, b, units=128):
        h = np.zeros(units, np.float64)
        c = np.zeros(units, np.float64)
        out = []
        for t in range(xr.shape[0]):
            z = xr[t].astype(np.float64) @ k + h @ r + b
            i = 1 / (1 + np.exp(-z[:units]))
            f = 1 / (1 + np.exp(-z[units:2 * units]))
            g = np.tanh(z[2 * units:3 * units])
            o = 1 / (1 + np.exp(-z[3 * units:]))
            c = f * c + i * g
            h = o * np.tanh(c)
            out.append(h.copy())
        return np.stack(out)

    x0 = x[0].astype(np.float32)
    oracle = np.concatenate(
        [np_lstm(x0, kf, rf, bf), np_lstm(x0[::-1], kb, rb, bb)[::-1]],
        axis=-1)
    lstm1 = BiLSTM(128, name="lstm1")
    ours = np.asarray(jax.jit(
        lambda p, xx: lstm1.apply({"params": p}, xx))(p1, x0[None]))[0]
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("add_indel_length", [False, True])
def test_params_from_tf_checkpoint_on_disk(reference_path, tmp_path,
                                           add_indel_length):
    """Round-trip through an ON-DISK TF checkpoint: build the reference
    Clair3_P, save_weights (.index/.data pair -- the format the released
    models ship in, run_clair3_rna:488-495), convert via resolve_params, and
    check forward parity. This is the path real users hit via --model_path."""
    import numpy as np

    import tensorflow as tf

    m = _tf_model(add_indel_length)
    x = np.random.RandomState(3).randint(
        -30, 30, (8, 33, 18)).astype(np.int32)
    ref_out = np.asarray(m(x))

    # TF-format object checkpoint: the same .index/.data pair layout the
    # released clair3_rna_models/<platform>/variables files use (Keras 3's
    # save_weights no longer writes it, so go through tf.train.Checkpoint --
    # the mechanism TF2 Keras save_weights used internally)
    prefix = str(tmp_path / "variables" / "variables")
    tf.train.Checkpoint(model=m).write(prefix)
    assert (tmp_path / "variables" / "variables.index").exists()

    from clair3_rna_tpu.models.network import make_forward_fn
    from clair3_rna_tpu.models.params_io import resolve_params
    params = resolve_params(prefix, add_indel_length=add_indel_length)
    _, forward = make_forward_fn(add_indel_length=add_indel_length)
    our_out = np.asarray(forward(params, x))
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-4, atol=1e-6)
