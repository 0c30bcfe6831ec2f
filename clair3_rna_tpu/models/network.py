"""Flax Bi-LSTM pileup genotyping network.

Architecturally identical to the reference Keras `Clair3_P`
(clair3_rna/model.py:88-216): BiLSTM(128) -> BiLSTM(160) -> flatten ->
Dense(128, selu) -> two heads (gt21 21-way, zygosity 3-way; optionally two
33-way variant-length heads), each Dense(selu) -> softmax — so TF checkpoints
convert 1:1. The execution strategy is TPU-first: input projections for all 33
timesteps are batched into single MXU matmuls before the recurrence, the
recurrent scan runs under jit/lax.scan, and inference batches are large and
optionally bfloat16.
"""

from functools import partial

import jax
import jax.numpy as jnp
import flax.linen as nn

from clair3_rna_tpu import config


class LSTMCellParams(nn.Module):
    """Parameter shell for one LSTM direction with Keras gate layout
    (i,f,g,o). Declared as a named child module so the param tree keeps the
    lstm{1,2}/{forward,backward}/{kernel,recurrent_kernel,bias} layout the TF
    checkpoint converter targets (models/convert.py)."""

    units: int

    @nn.compact
    def __call__(self, in_dim):
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (in_dim, 4 * self.units))
        recurrent = self.param("recurrent_kernel", nn.initializers.orthogonal(),
                               (self.units, 4 * self.units))
        bias = self.param("bias", _keras_lstm_bias_init, (4 * self.units,))
        return kernel, recurrent, bias


def _keras_lstm_bias_init(key, shape, dtype=jnp.float32):
    """Keras unit_forget_bias: zeros except forget-gate chunk = 1."""
    units = shape[0] // 4
    b = jnp.zeros(shape, dtype)
    return b.at[units:2 * units].set(1.0)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over [B, T, D], TPU-first execution:

    - input projections for every timestep and BOTH directions are computed
      as large MXU matmuls before the recurrence;
    - the two directions run in ONE lax.scan with a direction-batched
      dot_general ([2,B,U] x [2,U,4U]), halving the sequential-step count vs
      scanning each direction separately (the dominant cost: the recurrence
      is latency-bound, not FLOPs-bound, at this model size);
    - the scan is partially unrolled so XLA can pipeline consecutive steps.

    Numerics are bitwise identical to the per-direction formulation.
    """

    units: int
    compute_dtype: jnp.dtype = jnp.float32
    unroll: int = 8

    @nn.compact
    def __call__(self, x):
        batch, seq_len, in_dim = x.shape
        kf, rf, bf = LSTMCellParams(self.units, name="forward")(in_dim)
        kb, rb, bb = LSTMCellParams(self.units, name="backward")(in_dim)

        dtype = self.compute_dtype
        units = self.units
        x = x.astype(dtype)
        xp_f = x @ kf.astype(dtype) + bf.astype(dtype)            # [B, T, 4U]
        xp_b = jnp.flip(x @ kb.astype(dtype) + bb.astype(dtype), axis=1)
        xp = jnp.stack([xp_f, xp_b], axis=0)                       # [2, B, T, 4U]
        xp = jnp.transpose(xp, (2, 0, 1, 3))                       # [T, 2, B, 4U]
        rec = jnp.stack([rf, rb], axis=0).astype(dtype)            # [2, U, 4U]

        def step(carry, xt):
            h, c = carry                                           # [2, B, U]
            z = xt + jax.lax.dot_general(
                h, rec, (((2,), (1,)), ((0,), (0,))))
            i = jax.nn.sigmoid(z[..., :units])
            f = jax.nn.sigmoid(z[..., units:2 * units])
            g = jnp.tanh(z[..., 2 * units:3 * units])
            o = jax.nn.sigmoid(z[..., 3 * units:])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((2, batch, units), dtype),
                jnp.zeros((2, batch, units), dtype))
        _, hs = jax.lax.scan(step, init, xp, unroll=self.unroll)   # [T, 2, B, U]
        fwd = jnp.swapaxes(hs[:, 0], 0, 1)                         # [B, T, U]
        bwd = jnp.flip(jnp.swapaxes(hs[:, 1], 0, 1), axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1)


class PileupNet(nn.Module):
    """gt21 + zygosity (+ variant length) pileup classifier."""

    add_indel_length: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    lstm1_units: int = 128
    lstm2_units: int = 160
    dense_units: int = 128
    head_units: int = 128

    @nn.compact
    def __call__(self, x, *, train: bool = False, dropout_rng=None):
        x = x.astype(self.compute_dtype)
        x = BiLSTM(self.lstm1_units, self.compute_dtype, name="lstm1")(x)
        x = BiLSTM(self.lstm2_units, self.compute_dtype, name="lstm2")(x)
        x = nn.Dropout(0.2, deterministic=not train, name="l3_dropout")(x)
        x = x.reshape((x.shape[0], -1))
        x = jax.nn.selu(nn.Dense(self.dense_units, name="l4")(x))
        # NB: the reference's L4 dropout uses the LSTM2 dropout rate (0.5),
        # clair3_rna/model.py:144
        x = nn.Dropout(0.5, deterministic=not train, name="l4_dropout")(x)

        def head(name, width):
            h = jax.nn.selu(nn.Dense(self.head_units, name=f"{name}_dense")(x))
            h = nn.Dropout(0.2, deterministic=not train, name=f"{name}_dropout")(h)
            logits = jax.nn.selu(nn.Dense(width, name=f"{name}_logits")(h))
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        outputs = [head("gt21", 21), head("genotype", 3)]
        if self.add_indel_length:
            outputs.append(head("length1", config.NO_OF_POSITIONS))
            outputs.append(head("length2", config.NO_OF_POSITIONS))
        return jnp.concatenate(outputs, axis=-1)


def make_forward_fn(add_indel_length: bool = False,
                    compute_dtype=jnp.float32, phased: bool = False):
    """Returns (model, jitted forward fn params,x -> probabilities)."""
    model = PileupNet(add_indel_length=add_indel_length,
                      compute_dtype=compute_dtype)

    @jax.jit
    def forward(params, x):
        return model.apply({"params": params}, x)

    return model, forward


# GT21 indices of the homozygous-reference labels AA/CC/GG/TT (task.GT21)
_REF_GT21_BY_CODE = (0, 4, 7, 9)


def make_wire_forward_fn(add_indel_length: bool = False,
                         compute_dtype=jnp.float32):
    """Device-side wire decode + forward + homRef prescreen under ONE jit.

    The calling pipeline ships each candidate window as unsigned uint8
    channel magnitudes plus a per-row reference-base code [B, 33] int8 —
    half the link bytes of the signed int16 format, exact because every
    post-renormalization magnitude is bounded by 1.5x max_depth = 216 (when
    a window row's depth exceeds 255 the batch falls back to signed int16,
    handled here by dtype dispatch). On device the jit:

      1. reconstructs signs — after the reference-channel negation trick
         (src/create_tensor_pileup.py:296-297) the ref base's fwd/rev
         channels are the ONLY entries that can be negative, and they are
         never positive, so sign == -1 exactly on channels (code, code+9);
      2. runs the network;
      3. computes the homRef early-exit mask
         (clair3_rna/call_variants.py:540-542) so certain-reference sites
         skip host decode without any host-side string work.

    Returns (model, forward) with forward(params, wire, codes) -> a single
    [B, n_probs + 1] array: the probabilities with the needs_decode verdict
    appended as a trailing 0/1 column (one array -> one host fetch).
    forward.wire marks the capability for the pipeline's dispatch.
    """
    model = PileupNet(add_indel_length=add_indel_length,
                      compute_dtype=compute_dtype)
    ref_gt21 = jnp.asarray(_REF_GT21_BY_CODE, jnp.int32)

    def _finish(params, x, codes):
        probs = model.apply({"params": params}, x)
        ref_idx = ref_gt21[codes[:, config.FLANKING_BASE_NUM].astype(jnp.int32)]
        ref_prob = jnp.take_along_axis(probs[:, :21], ref_idx[:, None],
                                       axis=1)[:, 0]
        certain_ref = (probs[:, 21] >= 0.5) & (ref_prob >= 0.5)
        # pack the prescreen verdict as one extra output column: a single
        # device array means ONE host fetch per batch (each fetch pays the
        # full link round-trip latency, which dominates on a tunnelled chip)
        return jnp.concatenate(
            [probs, (~certain_ref).astype(jnp.float32)[:, None]], axis=-1)

    @jax.jit
    def forward_u8(params, mags, codes):
        c = jnp.arange(config.CHANNEL_SIZE, dtype=jnp.int32)[None, None, :]
        cc = codes[:, :, None].astype(jnp.int32)
        neg = (c == cc) | (c == cc + 9)
        x18 = jnp.where(neg, -mags[..., :config.CHANNEL_SIZE].astype(jnp.float32),
                        mags[..., :config.CHANNEL_SIZE].astype(jnp.float32))
        if mags.shape[-1] > config.CHANNEL_SIZE:
            x = jnp.concatenate(
                [x18, mags[..., config.CHANNEL_SIZE:].astype(jnp.float32)],
                axis=-1)
        else:
            x = x18
        return _finish(params, x, codes)

    @jax.jit
    def forward_i16(params, x, codes):
        return _finish(params, x.astype(jnp.float32), codes)

    def forward(params, wire, codes):
        if wire.dtype == jnp.uint8:
            return forward_u8(params, wire, codes)
        return forward_i16(params, wire, codes)

    forward.wire = True
    return model, forward


def init_params(rng, add_indel_length=False, phased=False,
                compute_dtype=jnp.float32):
    model = PileupNet(add_indel_length=add_indel_length,
                      compute_dtype=compute_dtype)
    channels = config.CHANNEL_SIZE + (config.PHASED_CHANNEL_SIZE if phased else 0)
    x = jnp.zeros((1, config.NO_OF_POSITIONS, channels), jnp.float32)
    return model.init(jax.random.PRNGKey(rng) if isinstance(rng, int) else rng,
                      x)["params"]
