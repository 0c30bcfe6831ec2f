"""Pallas TPU kernel: pileup channel-count accumulation as MXU matmuls.

The pileup count image is a scatter-add: counts[p, c] += 1 per (position,
channel) event -- scalar scatter is the reference's per-character Python loop
(src/create_tensor_pileup.py:113-176). On TPU we recast the scatter as
one-hot matmuls so the systolic array does the accumulation:

    counts[P, C] += A_r @ B_r      for each 128-event lane row r
      A_r[p, e] = (event_pos[e] == p)   built in-kernel, positions in lanes
      B_r[e, c] = (event_channel[e]==c) one-hot built on host (bf16)

Events are sorted by position, so each position tile touches a contiguous
event range; a scalar-prefetched per-tile offset table selects which aligned
1024-event blocks each grid step streams through VMEM
(pltpu.PrefetchScalarGridSpec index maps). The layout is chosen so no
transposes occur: A keeps events in lanes, the host-built B keeps events in
sublanes.

`pileup_counts` dispatches: Pallas on TPU, an XLA segment-sum elsewhere; both
are differentially tested against a numpy scatter oracle.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

EVENT_BLOCK = 1024          # events per grid step (8 lane rows of 128)
LANE = 128
SUB_ROWS = EVENT_BLOCK // LANE
POS_BLOCK = 512             # positions per output tile
CHANNEL_PAD = 32            # 18 or 30 channels padded to a lane-friendly 32


def _kernel(tiles_ref, blocks_ref, firsts_ref, offsets_ref, pos_ref,
            onehot_ref, out_ref):
    """Grid: (n_visits,) -- one step per existing (pos_tile, event_block)
    pair, in tile order. A sequential grid with scalar-prefetched index maps
    lets Pallas stream the next visit's event block into VMEM while the
    current one is on the MXU (automatic double buffering); no step is
    wasted on empty (tile, block) combinations, unlike a dense
    (tiles x max_blocks) grid whose step count is set by the densest tile.

    pos_ref: [1, SUB_ROWS, LANE] int32 event positions.
    onehot_ref: [1, EVENT_BLOCK, CHANNEL_PAD] bf16 channel one-hots (events in
    sublanes -- each 128-row slice is one lane row's B matrix).
    """
    from jax.experimental import pallas as pl

    v = pl.program_id(0)
    tile = tiles_ref[v]

    @pl.when(firsts_ref[v] == 1)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    abs_base = blocks_ref[v] * EVENT_BLOCK
    e_lo = offsets_ref[tile]
    e_hi = offsets_ref[tile + 1]

    @pl.when((abs_base < e_hi) & (abs_base + EVENT_BLOCK > e_lo))
    def _():
        tile_base = tile * POS_BLOCK
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (POS_BLOCK, LANE), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        acc = jnp.zeros((POS_BLOCK, CHANNEL_PAD), jnp.float32)
        for r in range(SUB_ROWS):
            row_pos = pos_ref[0, r, :].reshape(1, LANE)       # events in lanes
            abs_idx = abs_base + r * LANE + lane_iota
            valid = (abs_idx >= e_lo) & (abs_idx < e_hi)
            a = ((row_pos - tile_base == p_iota) & valid).astype(jnp.bfloat16)
            b = onehot_ref[0, r * LANE:(r + 1) * LANE, :]     # [LANE, C] bf16
            acc += jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[:, :] += acc


def _pallas_counts(event_pos, event_onehot, visit_tiles, visit_blocks,
                   visit_firsts, tile_offsets, length, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_visits = len(visit_tiles)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_visits,),
        in_specs=[
            pl.BlockSpec((1, SUB_ROWS, LANE),
                         lambda v, tiles, blocks, firsts, offs:
                         (blocks[v], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EVENT_BLOCK, CHANNEL_PAD),
                         lambda v, tiles, blocks, firsts, offs:
                         (blocks[v], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (POS_BLOCK, CHANNEL_PAD),
            lambda v, tiles, blocks, firsts, offs: (tiles[v], 0),
            memory_space=pltpu.VMEM),
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((length, CHANNEL_PAD), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(visit_tiles, visit_blocks, visit_firsts, tile_offsets,
      event_pos, event_onehot)
    return out.astype(jnp.int32)


@jax.jit
def _device_onehot(chan_blocks):
    """[n_blocks, EVENT_BLOCK] int8 ids -> bf16 one-hots on device."""
    return jax.nn.one_hot(chan_blocks.astype(jnp.int32), CHANNEL_PAD,
                          dtype=jnp.bfloat16)


def _prepare(event_pos, event_channel, length):
    """Sort events, build channel one-hots, flatten the (tile, block) visit
    list. Every tile gets at least one visit (to zero its output block);
    straddling event blocks are visited by both adjacent tiles, with the
    in-kernel [e_lo, e_hi) mask keeping each event in exactly one tile."""
    event_pos = np.asarray(event_pos, dtype=np.int32)
    event_channel = np.asarray(event_channel, dtype=np.int32)
    order = np.argsort(event_pos, kind="stable")
    event_pos = event_pos[order]
    event_channel = event_channel[order]

    padded_len = ((length + POS_BLOCK - 1) // POS_BLOCK) * POS_BLOCK
    n_tiles = padded_len // POS_BLOCK
    boundaries = np.arange(0, padded_len + 1, POS_BLOCK)
    offsets = np.searchsorted(event_pos, boundaries).astype(np.int32)

    visit_tiles, visit_blocks, visit_firsts = [], [], []
    for i in range(n_tiles):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        if hi > lo:
            blocks = range(lo // EVENT_BLOCK, (hi - 1) // EVENT_BLOCK + 1)
        else:
            blocks = (0,)  # zero-init visit for an empty tile
        for k, b in enumerate(blocks):
            visit_tiles.append(i)
            visit_blocks.append(b)
            visit_firsts.append(1 if k == 0 else 0)

    n_events = len(event_pos)
    n_blocks = max(1, -(-n_events // EVENT_BLOCK))
    pad = n_blocks * EVENT_BLOCK - n_events
    event_pos = np.concatenate([event_pos, np.full(pad, -1, np.int32)])
    event_channel = np.concatenate([event_channel, np.zeros(pad, np.int32)])
    # ship 1-byte channel ids; the one-hot expands on device (host-built
    # bf16 one-hots cost 64 B/event of host->device bandwidth vs 5 B/event
    # for ids+positions)
    onehot = _device_onehot(
        jnp.asarray(event_channel.astype(np.int8).reshape(n_blocks,
                                                          EVENT_BLOCK)))
    return (jnp.asarray(event_pos.reshape(n_blocks, SUB_ROWS, LANE)),
            onehot,
            jnp.asarray(np.asarray(visit_tiles, np.int32)),
            jnp.asarray(np.asarray(visit_blocks, np.int32)),
            jnp.asarray(np.asarray(visit_firsts, np.int32)),
            jnp.asarray(offsets), padded_len)


def pileup_counts_pallas(event_pos, event_channel, length, n_channels=18,
                         interpret=False):
    """counts[length, n_channels] from (pos, channel) events via the TPU
    kernel (or its interpreter for CPU tests)."""
    (pos_dev, onehot_dev, visit_tiles, visit_blocks, visit_firsts, offsets,
     padded_len) = _prepare(event_pos, event_channel, length)
    out = _pallas_counts(pos_dev, onehot_dev, visit_tiles, visit_blocks,
                         visit_firsts, offsets, padded_len,
                         interpret=interpret)
    return np.asarray(out)[:length, :n_channels]


@functools.partial(jax.jit, static_argnums=(2, 3))
def _segment_counts(event_idx, ones, size, n_channels):
    flat = jax.ops.segment_sum(ones, event_idx, num_segments=size * n_channels)
    return flat.reshape(size, n_channels)


def pileup_counts_jax(event_pos, event_channel, length, n_channels=18):
    """XLA fallback: segment-sum scatter (works on any backend)."""
    event_pos = jnp.asarray(event_pos, jnp.int32)
    event_channel = jnp.asarray(event_channel, jnp.int32)
    idx = event_pos * n_channels + event_channel
    ones = jnp.ones(len(event_pos), jnp.int32)
    return np.asarray(_segment_counts(idx, ones, int(length), int(n_channels)))


def pileup_counts(event_pos, event_channel, length, n_channels=18,
                  use_pallas=False):
    """Device scatter-count dispatch.

    Measured on a (tunnel-attached) v5e with 3M events over 32k positions,
    end to end including host->device transfer per call: segment-sum ~5.9M
    events/s, Pallas ~2.1M events/s. The flattened visit-list grid plus
    on-device one-hot expansion brought the Pallas path from 8.7s to 1.4s
    per call (6x), and at that point BOTH paths are transfer-bound on this
    link (24 MB of events per call), so segment-sum stays the default and
    the Pallas kernel remains opt-in for TPU-resident pipelines where the
    events already live in HBM. (The production pipeline builds counts in
    the native C++ extractor anyway; this device path exists for
    TPU-resident end-to-end experiments.)
    """
    if len(event_pos) == 0:
        return np.zeros((length, n_channels), np.int32)
    if use_pallas and jax.default_backend() == "tpu":
        return pileup_counts_pallas(event_pos, event_channel, length,
                                    n_channels)
    return pileup_counts_jax(event_pos, event_channel, length, n_channels)
