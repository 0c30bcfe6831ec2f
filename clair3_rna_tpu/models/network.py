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
    - the two directions run in ONE lax.scan over a (forward, time-reversed
      backward) operand tuple, halving the sequential-step count vs scanning
      each direction separately (the dominant cost: the recurrence is
      latency-bound, not FLOPs-bound, at this model size); the two recurrent
      matmuls inside the step are independent, so XLA runs them in parallel;
    - the scan is partially unrolled so XLA can pipeline consecutive steps;
    - matmul precision is explicit (see `resolve_precision`): the recurrence
      amplifies the TPU's default reduced-precision f32 dots to ~1e-2
      probability shifts over 33 steps, so the default here is HIGHEST,
      keeping TPU probabilities within ~1e-4 of the f32 CPU/TF reference.

    Deliberately NOT a direction-batched formulation ([2,B,...] arrays with a
    batched dot_general): stacking the two directions and transposing the
    [2,B,T,4U] projection to scan order miscompiles on TPU v5e (jax 0.9) at
    B=2048 -- the backward half of the relayouted operand comes out wrong by
    O(magnitude), turning the backward LSTM into noise. Keeping each
    direction's operand a plain 3-D [T,B,4U] array avoids the faulty
    relayout entirely (regression guard: tests/test_model_parity.py::
    test_forward_parity_across_batch_shapes).
    """

    units: int
    compute_dtype: jnp.dtype = jnp.float32
    unroll: int = 8
    precision: jax.lax.Precision | None = None

    @nn.compact
    def __call__(self, x):
        batch, seq_len, in_dim = x.shape
        kf, rf, bf = LSTMCellParams(self.units, name="forward")(in_dim)
        kb, rb, bb = LSTMCellParams(self.units, name="backward")(in_dim)

        dtype = self.compute_dtype
        units = self.units
        prec = self.precision
        x = x.astype(dtype)

        def _proj(k, b):
            return jnp.matmul(x, k.astype(dtype), precision=prec) \
                + b.astype(dtype)                                  # [B, T, 4U]

        # scan order: forward direction at t, backward at T-1-t
        xp_f = jnp.transpose(_proj(kf, bf), (1, 0, 2))             # [T, B, 4U]
        xp_b = jnp.transpose(_proj(kb, bb), (1, 0, 2))[::-1]
        rf = rf.astype(dtype)
        rb = rb.astype(dtype)

        def _gates(z, c):
            i = jax.nn.sigmoid(z[..., :units])
            f = jax.nn.sigmoid(z[..., units:2 * units])
            g = jnp.tanh(z[..., 2 * units:3 * units])
            o = jax.nn.sigmoid(z[..., 3 * units:])
            c = f * c + i * g
            return o * jnp.tanh(c), c

        def step(carry, xt):
            hf, cf, hb, cb = carry                                 # [B, U] each
            xtf, xtb = xt
            hf, cf = _gates(
                xtf + jnp.matmul(hf, rf, precision=prec), cf)
            hb, cb = _gates(
                xtb + jnp.matmul(hb, rb, precision=prec), cb)
            return (hf, cf, hb, cb), (hf, hb)

        z0 = jnp.zeros((batch, units), dtype)
        init = (z0, z0, z0, z0)
        _, (hs_f, hs_b) = jax.lax.scan(step, init, (xp_f, xp_b),
                                       unroll=self.unroll)         # [T, B, U]
        fwd = jnp.swapaxes(hs_f, 0, 1)                             # [B, T, U]
        bwd = jnp.flip(jnp.swapaxes(hs_b, 0, 1), axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1)


def resolve_precision():
    """Matmul precision for inference (CLAIR3_RNA_TPU_MATMUL_PRECISION=
    highest|default). HIGHEST by default: on TPU the default f32 dot runs in
    reduced precision and the 33-step LSTM recurrence amplifies that to
    ~1e-2 probability shifts -- enough to flip rounded QUALs and make
    results depend on batch shape. HIGHEST keeps TPU probabilities within
    ~1e-4 of the f32 CPU/TF reference and batch-shape-invariant; the network
    is a small fraction of end-to-end wall, so the extra MXU passes are
    cheap. On CPU this is a no-op."""
    import os
    mode = os.environ.get("CLAIR3_RNA_TPU_MATMUL_PRECISION", "highest")
    return None if mode == "default" else jax.lax.Precision.HIGHEST


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
        prec = resolve_precision()
        x = x.astype(self.compute_dtype)
        x = BiLSTM(self.lstm1_units, self.compute_dtype, name="lstm1",
                   precision=prec)(x)
        x = BiLSTM(self.lstm2_units, self.compute_dtype, name="lstm2",
                   precision=prec)(x)
        x = nn.Dropout(0.2, deterministic=not train, name="l3_dropout")(x)
        x = x.reshape((x.shape[0], -1))
        x = jax.nn.selu(nn.Dense(self.dense_units, name="l4",
                                 precision=prec)(x))
        # NB: the reference's L4 dropout uses the LSTM2 dropout rate (0.5),
        # clair3_rna/model.py:144
        x = nn.Dropout(0.5, deterministic=not train, name="l4_dropout")(x)

        def head(name, width):
            h = jax.nn.selu(nn.Dense(self.head_units, name=f"{name}_dense",
                                     precision=prec)(x))
            h = nn.Dropout(0.2, deterministic=not train, name=f"{name}_dropout")(h)
            logits = jax.nn.selu(nn.Dense(width, name=f"{name}_logits",
                                          precision=prec)(h))
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
