"""Pallas TPU kernel: pileup count scatter + first-occurrence rank minimum.

The two O(events) stages of the fused pileup jit (`ops/fused_pileup.py`) are
histogram reductions over (position, channel) and (position, group) keys --
the device-side replacement for the reference's per-character Python counting
loop (src/create_tensor_pileup.py:113-176 builds the same Counter per
column). XLA lowers them to `scatter`, which the TPU executes as a serialized
update stream: measured 1.62 s for 52.6 M events on a v5e (~32 M events/s),
6x slower than the host C++ tile builder.

This kernel recasts both reductions as dense per-tile work, the shape the
hardware wants:

  counts[p, c]  = sum_e  [pos_e == p][chan_e == c]      -> MXU one-hot matmul
  grank[p, g]   = min_e  rank_e where pos_e == p, group_e == g
                                                        -> VPU masked min

Events are bucketed by 512-position tile on the host during staging (a
stable integer sort -- numpy radix sort, O(E)), so each tile's events are a
contiguous range of aligned 2048-event blocks. A scalar-prefetched visit
list (tile, block) drives a sequential 1D grid: Pallas streams the next
visit's event block into VMEM while the current one is on the MXU, and the
output tile block stays resident in VMEM across its consecutive visits.
Neighbor-tile events inside a shared boundary block and tail padding need no
masking: their positions fall outside the tile, so the position one-hot
row is all-zero (padding positions are set beyond every tile).

Ranks are carried as exact float32 (they are event ordinals < 2^24; staging
falls back when a chunk exceeds that), with 2^30 as the in-kernel infinity.

Differentially tested against a numpy oracle and against the XLA segment
ops in interpret mode (tests/test_fused_scatter.py); the fused pipeline
selects it on TPU via `CLAIR3_RNA_TPU_FUSED_SCATTER=auto|pallas|xla`.
"""

import numpy as np

LANE = 128
POS_TILE = 512            # positions per output tile
TILE_SHIFT = 9
EVENT_BLOCK = 2048        # events per visit (16 sublane rows of 128)
SUB_ROWS = EVENT_BLOCK // LANE
C_PAD = 32                # 18 channels padded to a lane-friendly 32
G_PAD = 8                 # 6 rank groups (ACGT, ins, del) padded to 8
RANK_INF_F = float(2 ** 30)   # exact in f32; real ranks are < 2^24
MAX_RANK = 2 ** 24


def bucket_events(ev_pos, ev_chan, ev_group, ev_rank, width_pad,
                  pad_to_pow2=True):
    """Stable-bucket events by position tile and build the visit list.

    Returns a dict of numpy arrays ready for `fused_scatter` /
    `make_fused_fn`: reordered (pos, chan, rank, group) padded to whole
    2048-event blocks, plus (visit_tiles, visit_blocks, visit_firsts,
    visit_valid) padded to a power of two so chunk streams reuse a handful
    of compiled shapes.
    """
    n_tiles = width_pad // POS_TILE
    ev_pos = np.asarray(ev_pos, np.int32)
    order = np.argsort(ev_pos >> TILE_SHIFT, kind="stable")  # radix, O(E)
    pos = ev_pos[order]
    chan = np.asarray(ev_chan, np.int8)[order]
    group = np.asarray(ev_group, np.int8)[order]
    rank = np.asarray(ev_rank, np.int32)[order]

    e = len(pos)
    off = np.searchsorted(pos >> TILE_SHIFT, np.arange(n_tiles + 1))
    nb = max(1, -(-e // EVENT_BLOCK))

    # per-tile aligned block range; empty tiles get one (inert) visit so
    # their output block is zero-initialized exactly once
    b0 = np.minimum(off[:-1] // EVENT_BLOCK, nb - 1)
    b1 = (np.maximum(off[1:], off[:-1] + 1) - 1) // EVENT_BLOCK + 1
    b1 = np.clip(b1, b0 + 1, nb)
    nvis = (b1 - b0).astype(np.int64)
    total = int(nvis.sum())
    starts = np.concatenate([[0], np.cumsum(nvis)])
    visit_tiles = np.repeat(np.arange(n_tiles, dtype=np.int32), nvis)
    visit_blocks = (np.arange(total, dtype=np.int32)
                    - np.repeat(starts[:-1], nvis).astype(np.int32)
                    + np.repeat(b0, nvis).astype(np.int32))
    visit_firsts = np.zeros(total, np.int32)
    visit_firsts[starts[:-1]] = 1
    visit_lasts = np.zeros(total, np.int32)
    visit_lasts[starts[1:] - 1] = 1
    visit_valid = np.ones(total, np.int32)

    # pad events to whole blocks (positions beyond every tile -> inert),
    # then to a power of two of blocks for shape bucketing
    nb_pad = nb
    if pad_to_pow2:
        nb_pad = 1
        while nb_pad < nb:
            nb_pad *= 2
    e_pad = nb_pad * EVENT_BLOCK

    def _pad_ev(a, fill):
        return np.concatenate([a, np.full(e_pad - e, fill, a.dtype)])

    pos = _pad_ev(pos, np.int32(width_pad))
    chan = _pad_ev(chan, np.int8(0))
    group = _pad_ev(group, np.int8(7))
    rank = _pad_ev(rank, np.int32(MAX_RANK))

    # pad visits to a power of two with inert (valid=0) repeats of the last
    # tile, so the output index map stays monotone
    v_pad = 64
    while v_pad < total:
        v_pad *= 2
    if v_pad > total:
        visit_tiles = np.concatenate(
            [visit_tiles, np.full(v_pad - total, visit_tiles[-1], np.int32)])
        visit_blocks = np.concatenate(
            [visit_blocks, np.zeros(v_pad - total, np.int32)])
        visit_firsts = np.concatenate(
            [visit_firsts, np.zeros(v_pad - total, np.int32)])
        visit_lasts = np.concatenate(
            [visit_lasts, np.zeros(v_pad - total, np.int32)])
        visit_valid = np.concatenate(
            [visit_valid, np.zeros(v_pad - total, np.int32)])

    return {
        "ev_pos": pos, "ev_chan": chan, "ev_group": group, "ev_rank": rank,
        "visit_tiles": visit_tiles, "visit_blocks": visit_blocks,
        "visit_firsts": visit_firsts, "visit_lasts": visit_lasts,
        "visit_valid": visit_valid,
    }


def _kernel(tiles_ref, blocks_ref, firsts_ref, lasts_ref, valid_ref,
            pos_ref, chan_ref, group_ref, rank_ref,
            counts_hbm, ranks_hbm, counts_acc, ranks_acc, sems):
    """One grid step per (tile, event-block) visit, in tile order.

    pos/chan/group: [1, SUB_ROWS, LANE] int32; rank: same shape float32.
    The tile accumulators live in VMEM scratch (a data-dependent output
    index map would force Mosaic to keep the WHOLE [W, C] output resident
    in VMEM -- 20 MB at W=131072); each finished tile is DMA'd out to the
    HBM outputs on its last visit.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    v = pl.program_id(0)

    @pl.when(firsts_ref[v] == 1)
    def _():
        counts_acc[:, :] = jnp.zeros_like(counts_acc)
        ranks_acc[:, :] = jnp.full_like(ranks_acc, RANK_INF_F)

    @pl.when(valid_ref[v] == 1)
    def _():
        tile_base = tiles_ref[v] * POS_TILE
        p_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, POS_TILE), 1)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (C_PAD, LANE), 0)
        acc_c = jnp.zeros((C_PAD, POS_TILE), jnp.float32)
        acc_r = jnp.full((G_PAD, POS_TILE), RANK_INF_F, jnp.float32)
        for r in range(SUB_ROWS):
            col_pos = pos_ref[0, r, :].reshape(LANE, 1)
            pmatch = (col_pos - tile_base) == p_iota          # [LANE, P]
            a = pmatch.astype(jnp.bfloat16)
            b = (chan_ref[0, r, :].reshape(1, LANE) == c_iota).astype(
                jnp.bfloat16)                                  # [C, LANE]
            acc_c += jax.lax.dot_general(
                b, a, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [C, P]
            rk = jnp.where(pmatch, rank_ref[0, r, :].reshape(LANE, 1),
                           RANK_INF_F)                         # [LANE, P]
            grp = group_ref[0, r, :].reshape(LANE, 1)
            mins = [jnp.min(jnp.where(grp == g, rk, RANK_INF_F), axis=0,
                            keepdims=True) for g in range(6)]
            mins.append(jnp.full((G_PAD - 6, POS_TILE), RANK_INF_F,
                                 jnp.float32))
            acc_r = jnp.minimum(acc_r, jnp.concatenate(mins, axis=0))
        counts_acc[:, :] += acc_c
        ranks_acc[:, :] = jnp.minimum(ranks_acc[:, :], acc_r)

    @pl.when(lasts_ref[v] == 1)
    def _():
        base = tiles_ref[v] * POS_TILE
        c_dma = pltpu.make_async_copy(
            counts_acc, counts_hbm.at[:, pl.ds(base, POS_TILE)], sems.at[0])
        r_dma = pltpu.make_async_copy(
            ranks_acc, ranks_hbm.at[:, pl.ds(base, POS_TILE)], sems.at[1])
        c_dma.start()
        r_dma.start()
        c_dma.wait()
        r_dma.wait()


def fused_scatter(ev_pos, ev_chan, ev_group, ev_rank_f32,
                  visit_tiles, visit_blocks, visit_firsts, visit_lasts,
                  visit_valid, width_pad, interpret=False):
    """counts[C_PAD, W] f32 and grank[G_PAD, W] f32 from bucketed events.

    Outputs are position-minor (transposed) so each tile's DMA flush is a
    lane-aligned [C, 512] slice. Traceable (call inside jit): all shapes
    are static given the padded inputs from `bucket_events`. ev arrays are
    flat [nb*EVENT_BLOCK]; ev_rank_f32 must already be float32.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = ev_pos.shape[0] // EVENT_BLOCK
    n_visits = visit_tiles.shape[0]
    n_tiles = width_pad // POS_TILE

    def _ev_spec():
        return pl.BlockSpec(
            (1, SUB_ROWS, LANE),
            lambda v, tiles, blocks, firsts, lasts, valid: (blocks[v], 0, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_visits,),
        in_specs=[_ev_spec() for _ in range(4)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                   pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)),
        scratch_shapes=[
            pltpu.VMEM((C_PAD, POS_TILE), jnp.float32),
            pltpu.VMEM((G_PAD, POS_TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    counts, ranks = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((C_PAD, n_tiles * POS_TILE), jnp.float32),
            jax.ShapeDtypeStruct((G_PAD, n_tiles * POS_TILE), jnp.float32),
        ),
        interpret=interpret,
        **kwargs,
    )(visit_tiles, visit_blocks, visit_firsts, visit_lasts, visit_valid,
      ev_pos.reshape(nb, SUB_ROWS, LANE),
      ev_chan.astype(jnp.int32).reshape(nb, SUB_ROWS, LANE),
      ev_group.astype(jnp.int32).reshape(nb, SUB_ROWS, LANE),
      ev_rank_f32.reshape(nb, SUB_ROWS, LANE))
    return counts, ranks


def scatter_oracle(ev_pos, ev_chan, ev_group, ev_rank, width):
    """Numpy reference for the kernel: plain scatter loops (position-minor,
    matching `fused_scatter`'s transposed outputs)."""
    counts = np.zeros((C_PAD, width), np.int64)
    ranks = np.full((G_PAD, width), RANK_INF_F, np.float64)
    for p, c, g, r in zip(ev_pos, ev_chan, ev_group, ev_rank):
        if 0 <= p < width:
            counts[c, p] += 1
            if 0 <= g < 6:
                ranks[g, p] = min(ranks[g, p], float(r))
    return counts, ranks
