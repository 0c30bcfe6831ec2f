"""Pallas TPU kernel: device-side CIGAR expansion of packed read batches.

This is the BASELINE.json north-star wire: instead of shipping one 11-byte
event per aligned base to HBM (ops/fused_scatter's input), the host ships
"tilelet" rows -- for each (read, POS_TILE-position tile) pair, the read's aligned
base codes nibble-packed at their tile-relative offsets (~0.5-0.9 B/base,
produced at memcpy speed by native/pileup_native.cc:extract_packed_native or
pileup/packed.py). This kernel expands them into the 18-channel count image
plus the first-occurrence group ranks, replacing the per-read expansion loop
of the reference (src/create_tensor_pileup.py:485-611,113-176) with dense
VPU work:

  counts[c, p] = #rows r in tile(p) with code[r, p] == base(c), strand(c)
  grank[g, p]  = min rank over rows with code[r, p] == g        (g in 0..3)

Rows arrive tile-sorted; a scalar-prefetched visit list (tile, row-block)
drives a sequential 1D grid exactly like ops/fused_scatter: the output tile
accumulators stay in VMEM across a tile's consecutive visits and are DMA'd
to HBM on the last. Blocks may straddle tiles -- rows are masked by their
own tile id. Nibble-packed codes keep the HBM wire half-width; even/odd
position columns are accumulated separately and interleaved by XLA after the
kernel (a free relayout there, an awkward one inside it).

Ranks are exact float32 (event ordinals < 2^24; staging falls back beyond).

Differentially tested against a numpy oracle and the XLA expansion in
tests/test_tilelet.py; the fused pipeline (ops/fused_pileup) selects it on
TPU via CLAIR3_RNA_TPU_FUSED_SCATTER=auto|pallas|xla.
"""

import os

import numpy as np

LANE = 128
POS_TILE = 256            # positions per output tile (smaller tiles raise
#                           the row fill factor: fewer padded-slot bytes on
#                           the host->HBM wire per aligned base)
HALF = POS_TILE // 2      # nibble-packed bytes per row / even-odd lane count
TILE_SHIFT = 8
# tilelet rows per visit; env-tunable for on-chip sweeps. Measured on v5e:
# 32/128/256 are equivalent (best device_s 0.448-0.455 on the bench chunk
# set) -- the kernel is NOT grid-step-bound at 32, and the apparent
# per-visit overhead in earlier numbers was tunnel fetch latency, not the
# kernel (stream-ordered timing: 314 M events/s, PERF.md)
ROW_BLOCK = int(os.environ.get("CLAIR3_RNA_TPU_TILELET_ROW_BLOCK", "32"))
C_PAD = 32                # 18 channels padded to a lane-friendly 32
G_PAD = 8                 # 6 rank groups padded to 8
RANK_INF_F = float(2 ** 30)
MAX_RANK = 2 ** 24
EMPTY = 15                # nibble value for "no base here"

# --- v2 wire: 2-bit codes + validity bitmap (3 bits/slot) -------------------
# The nibble wire spends 4 bits/slot; the alphabet is ACGT + "no base here"
# (deletion holes, splice edges, bq-masked bases), and exact mpileup
# semantics need the hole distinguished BEFORE the rank-min (a miscoded
# hole could steal a group's first-occurrence rank), so a fixed-layout
# wire cannot go below 2 code bits + 1 validity bit per slot. v2 ships
# exactly that: [R, POS_TILE/4] 2-bit code bytes (little-endian crumbs)
# plus [R, POS_TILE/8] validity bytes (little-endian bits) = 96 B/row vs
# the nibble wire's 128. Selected by CLAIR3_RNA_TPU_TILELET_WIRE=v2;
# produced from the extractor's nibble arenas at staging time
# (nibble_to_v2 -- a few vectorized byte ops, so the C++ extractor is
# unchanged).
V2_HALF = POS_TILE // 4   # code bytes per row (4 crumbs each)
V2_VBYTES = POS_TILE // 8  # validity bytes per row


# byte LUTs for nibble_to_v2: for a nibble byte x = (hi n0, lo n1),
# _V2_PAIR[x] = the two crumbs (c0 | c1<<2, holes forced to 0) and
# _V2_VAL[x] = the two validity bits (v0 | v1<<1)
_x = np.arange(256, dtype=np.uint16)
_n0, _n1 = (_x >> 4) & 15, _x & 15
_v0, _v1 = (_n0 != EMPTY), (_n1 != EMPTY)
_V2_PAIR = (np.where(_v0, _n0 & 3, 0)
            | (np.where(_v1, _n1 & 3, 0) << 2)).astype(np.uint8)
_V2_VAL = (_v0 | (_v1 << 1)).astype(np.uint8)
del _x, _n0, _n1, _v0, _v1


def nibble_to_v2(tl_codes):
    """[R, POS_TILE/2] nibble arena -> (codes2 [R, POS_TILE/4] uint8,
    valid [R, POS_TILE/8] uint8). Hole slots carry crumb 0, masked by the
    validity bit; round-trips exactly via unpack_v2. Byte-LUT vectorized:
    ~6 table gathers over the arena, cheap enough to run per chunk at
    staging time (the e2e ablation measured the naive unpack+packbits
    costing more host time than the smaller wire saved)."""
    pair = _V2_PAIR[tl_codes]   # [R, POS_TILE/2] crumb pairs (4 bits used)
    val = _V2_VAL[tl_codes]     # [R, POS_TILE/2] validity pairs (2 bits)
    codes2 = (pair[:, 0::2] | (pair[:, 1::2] << 4)).astype(np.uint8)
    vbits = (val[:, 0::4] | (val[:, 1::4] << 2) | (val[:, 2::4] << 4)
             | (val[:, 3::4] << 6)).astype(np.uint8)
    return codes2, vbits


def unpack_v2(codes2, valid):
    """(codes2, valid) -> [R, POS_TILE] codes with EMPTY holes (tests)."""
    r = codes2.shape[0]
    out = np.empty((r, POS_TILE), np.uint8)
    for c in range(4):
        out[:, c::4] = (codes2 >> (2 * c)) & 3
    vb = np.unpackbits(valid, axis=1, bitorder="little")[:, :POS_TILE]
    out[vb == 0] = EMPTY
    return out


def quantize_rows(n):
    """Row-count padding bucket: whole ROW_BLOCKs, quantized to 1/8 octave
    (<=12.5% pad waste; at most 8 compiled shapes per power of two --
    power-of-two padding wasted up to 2x HBM wire bytes)."""
    n = max(n, ROW_BLOCK)
    octave = 1
    while octave * 2 <= n:
        octave *= 2
    step = max(octave // 8, ROW_BLOCK)
    return -(-n // step) * step


def bucket_rows(tl_tile, tl_codes, tl_rank, tl_strand, width_pad,
                tl_hp=None):
    """Visit list + padded arrays for tile-sorted tilelet rows.

    Mirrors fused_scatter.bucket_events' aligned-block visit construction,
    but rows are already tile-sorted (the native extractor emits per-tile
    arenas) so no sort happens here. Pad rows carry tile == n_tiles, which
    matches no visit's tile, so they are masked inside the kernel.
    """
    n_tiles = width_pad // POS_TILE
    tl_tile = np.asarray(tl_tile, np.int32)
    r = len(tl_tile)
    off = np.searchsorted(tl_tile, np.arange(n_tiles + 1))
    nb = max(1, -(-r // ROW_BLOCK))

    # per-tile aligned block range; empty tiles get one (inert) visit so
    # their output block is zero-initialized exactly once
    b0 = np.minimum(off[:-1] // ROW_BLOCK, nb - 1)
    b1 = (np.maximum(off[1:], off[:-1] + 1) - 1) // ROW_BLOCK + 1
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

    r_pad = quantize_rows(r)

    def _pad(a, fill):
        pad_shape = (r_pad - r,) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])

    tl_tile = _pad(tl_tile, np.int32(n_tiles))
    tl_codes = _pad(np.asarray(tl_codes, np.uint8), np.uint8(0xFF))
    tl_rank = _pad(np.asarray(tl_rank, np.int32), np.int32(MAX_RANK))
    tl_strand = _pad(np.asarray(tl_strand, np.int8), np.int8(0))
    tl_hp = _pad(np.asarray(tl_hp, np.int8), np.int8(0)) \
        if tl_hp is not None else np.zeros(r_pad, np.int8)

    # pad visits to a power of two with inert (valid=0) repeats
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
        "tl_codes": tl_codes, "tl_tile": tl_tile, "tl_rank": tl_rank,
        "tl_strand": tl_strand, "tl_hp": tl_hp,
        "visit_tiles": visit_tiles, "visit_blocks": visit_blocks,
        "visit_firsts": visit_firsts, "visit_lasts": visit_lasts,
        "visit_valid": visit_valid,
    }


def _make_kernel(phased):
    """Kernel factory: the phased variant also accumulates the 12
    haplotype channels (AP..TP at 18..21 hp=1, AM..TM at 24..27 hp=2;
    strands merged, src/create_tensor_pileup.py:181-217)."""

    def _kernel(tiles_ref, blocks_ref, firsts_ref, lasts_ref, valid_ref,
                codes_ref, rtile_ref, rrank_ref, rstrand_ref, rhp_ref,
                ce_hbm, co_hbm, re_hbm, ro_hbm,
                ce_acc, co_acc, re_acc, ro_acc, sems):
        """One grid step per (tile, row-block) visit, in tile order.

        codes: [1, ROW_BLOCK, HALF] int32 packed bytes (two nibbles each);
        rtile/rrank/rstrand/rhp: [1, 1, ROW_BLOCK]. The e/o accumulators
        hold the even/odd position columns of the tile and flush to HBM on
        the last visit.
        """
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        v = pl.program_id(0)

        @pl.when(firsts_ref[v] == 1)
        def _():
            ce_acc[:, :] = jnp.zeros_like(ce_acc)
            co_acc[:, :] = jnp.zeros_like(co_acc)
            re_acc[:, :] = jnp.full_like(re_acc, RANK_INF_F)
            ro_acc[:, :] = jnp.full_like(ro_acc, RANK_INF_F)

        @pl.when(valid_ref[v] == 1)
        def _():
            tile = tiles_ref[v]
            packed = codes_ref[0]                            # [K, HALF]
            rmask = rtile_ref[0, 0, :].reshape(ROW_BLOCK, 1) == tile
            strand = rstrand_ref[0, 0, :].reshape(ROW_BLOCK, 1)
            rank = rrank_ref[0, 0, :].reshape(ROW_BLOCK, 1)
            hp = rhp_ref[0, 0, :].reshape(ROW_BLOCK, 1)
            zero_row = jnp.zeros((1, HALF), jnp.float32)
            inf_row = jnp.full((1, HALF), RANK_INF_F, jnp.float32)
            for nib, cacc, racc in (((packed >> 4) & 15, ce_acc, re_acc),
                                    (packed & 15, co_acc, ro_acc)):
                base = jnp.where(rmask, nib, EMPTY)          # [K, HALF]
                fwd_rows, rev_rows, min_rows = [], [], []
                hp1_rows, hp2_rows = [], []
                for code in range(4):
                    m = base == code
                    fwd_rows.append(jnp.sum(
                        (m & (strand == 0)).astype(jnp.float32), axis=0,
                        keepdims=True))
                    rev_rows.append(jnp.sum(
                        (m & (strand == 1)).astype(jnp.float32), axis=0,
                        keepdims=True))
                    min_rows.append(jnp.min(
                        jnp.where(m, rank, RANK_INF_F), axis=0,
                        keepdims=True))
                    if phased:
                        hp1_rows.append(jnp.sum(
                            (m & (hp == 1)).astype(jnp.float32), axis=0,
                            keepdims=True))
                        hp2_rows.append(jnp.sum(
                            (m & (hp == 2)).astype(jnp.float32), axis=0,
                            keepdims=True))
                # layout: A C G T at 0..3, a c g t at 9..12; phased
                # AP..TP at 18..21, AM..TM at 24..27; rest inert
                if phased:
                    tail = (hp1_rows + [zero_row] * 2 + hp2_rows
                            + [zero_row] * (C_PAD - 28))
                else:
                    tail = [zero_row] * (C_PAD - 18)
                cacc[:, :] += jnp.concatenate(
                    fwd_rows + [zero_row] * 5 + rev_rows + [zero_row] * 5
                    + tail, axis=0)
                racc[:, :] = jnp.minimum(
                    racc[:, :],
                    jnp.concatenate(min_rows + [inf_row] * (G_PAD - 4),
                                    axis=0))

        @pl.when(lasts_ref[v] == 1)
        def _():
            base = tiles_ref[v] * HALF
            dmas = [pltpu.make_async_copy(acc, hbm.at[:, pl.ds(base, HALF)],
                                          sems.at[i])
                    for i, (acc, hbm) in enumerate(
                        ((ce_acc, ce_hbm), (co_acc, co_hbm),
                         (re_acc, re_hbm), (ro_acc, ro_hbm)))]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

    return _kernel


def _make_kernel_v2(phased):
    """v2-wire kernel: 2-bit code crumbs + validity bitmap. Four position
    planes (slot = 4*byte + crumb); planes are PAIRED along the lane axis
    into 128-wide accumulators ((c=0,1) and (c=2,3)) so both the VPU ops
    and the HBM DMA slices stay 128-lane aligned (Mosaic rejects 64-wide
    HBM slices), and unpaired+interleaved after the kernel."""

    def _kernel(tiles_ref, blocks_ref, firsts_ref, lasts_ref, valid_ref,
                codes_ref, vcodes_ref, rtile_ref, rrank_ref, rstrand_ref,
                rhp_ref, c01_hbm, c23_hbm, r01_hbm, r23_hbm,
                c01_acc, c23_acc, r01_acc, r23_acc, sems):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        v = pl.program_id(0)

        @pl.when(firsts_ref[v] == 1)
        def _():
            c01_acc[:, :] = jnp.zeros_like(c01_acc)
            c23_acc[:, :] = jnp.zeros_like(c23_acc)
            r01_acc[:, :] = jnp.full_like(r01_acc, RANK_INF_F)
            r23_acc[:, :] = jnp.full_like(r23_acc, RANK_INF_F)

        @pl.when(valid_ref[v] == 1)
        def _():
            tile = tiles_ref[v]
            packed = codes_ref[0]                            # [K, 64]
            vbytes = vcodes_ref[0]                           # [K, 32]
            rmask = rtile_ref[0, 0, :].reshape(ROW_BLOCK, 1) == tile
            strand = rstrand_ref[0, 0, :].reshape(ROW_BLOCK, 1)
            rank = rrank_ref[0, 0, :].reshape(ROW_BLOCK, 1)
            hp = rhp_ref[0, 0, :].reshape(ROW_BLOCK, 1)
            # validity byte of slot 4j+c is j>>1; its bit is 4*(j&1)+c.
            # The j>>1 expansion ([K,32] -> [K,64] with each byte doubled)
            # rides a tiny 0/1 matmul: Mosaic rejects the interleaving
            # shape cast a stack+reshape would need, while an MXU dot with
            # an iota-built expansion matrix lowers cleanly (exact: byte
            # values < 256 in f32).
            emat = (jax.lax.broadcasted_iota(
                        jnp.int32, (V2_VBYTES, V2_HALF), 0)
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (V2_VBYTES, V2_HALF), 1) // 2) \
                .astype(jnp.float32)
            vb2 = jnp.dot(vbytes.astype(jnp.float32), emat,
                          preferred_element_type=jnp.float32) \
                .astype(jnp.int32)
            parity = jax.lax.broadcasted_iota(
                jnp.int32, (1, V2_HALF), 1) & 1
            # [K, 128] paired bases: lanes 0..63 = plane c, 64.. = c+1
            bases = []
            for c in range(4):
                nib = (packed >> (2 * c)) & 3
                bit = (vb2 >> (4 * parity + c)) & 1
                bases.append(jnp.where((bit != 0) & rmask, nib, EMPTY))
            pair_base = (jnp.concatenate([bases[0], bases[1]], axis=1),
                         jnp.concatenate([bases[2], bases[3]], axis=1))
            zero_row = jnp.zeros((1, 2 * V2_HALF), jnp.float32)
            inf_row = jnp.full((1, 2 * V2_HALF), RANK_INF_F, jnp.float32)
            for base, cacc, racc in ((pair_base[0], c01_acc, r01_acc),
                                     (pair_base[1], c23_acc, r23_acc)):
                fwd_rows, rev_rows, min_rows = [], [], []
                hp1_rows, hp2_rows = [], []
                for code in range(4):
                    m = base == code
                    fwd_rows.append(jnp.sum(
                        (m & (strand == 0)).astype(jnp.float32), axis=0,
                        keepdims=True))
                    rev_rows.append(jnp.sum(
                        (m & (strand == 1)).astype(jnp.float32), axis=0,
                        keepdims=True))
                    min_rows.append(jnp.min(
                        jnp.where(m, rank, RANK_INF_F), axis=0,
                        keepdims=True))
                    if phased:
                        hp1_rows.append(jnp.sum(
                            (m & (hp == 1)).astype(jnp.float32), axis=0,
                            keepdims=True))
                        hp2_rows.append(jnp.sum(
                            (m & (hp == 2)).astype(jnp.float32), axis=0,
                            keepdims=True))
                if phased:
                    tail = (hp1_rows + [zero_row] * 2 + hp2_rows
                            + [zero_row] * (C_PAD - 28))
                else:
                    tail = [zero_row] * (C_PAD - 18)
                cacc[:, :] += jnp.concatenate(
                    fwd_rows + [zero_row] * 5 + rev_rows + [zero_row] * 5
                    + tail, axis=0)
                racc[:, :] = jnp.minimum(
                    racc[:, :],
                    jnp.concatenate(min_rows + [inf_row] * (G_PAD - 4),
                                    axis=0))

        @pl.when(lasts_ref[v] == 1)
        def _():
            base = tiles_ref[v] * (2 * V2_HALF)
            dmas = [pltpu.make_async_copy(
                        acc, hbm.at[:, pl.ds(base, 2 * V2_HALF)],
                        sems.at[i])
                    for i, (acc, hbm) in enumerate(
                        ((c01_acc, c01_hbm), (c23_acc, c23_hbm),
                         (r01_acc, r01_hbm), (r23_acc, r23_hbm)))]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

    return _kernel


def tilelet_expand_v2(tl_codes2, tl_valid, tl_tile, tl_rank_f32, tl_strand,
                      visit_tiles, visit_blocks, visit_firsts, visit_lasts,
                      visit_valid, width_pad, interpret=False, tl_hp=None,
                      phased=False):
    """v2-wire Pallas expansion: identical outputs to tilelet_expand from
    the 3-bit/slot wire (2-bit crumbs [r_pad, POS_TILE/4] + validity bits
    [r_pad, POS_TILE/8])."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_pad = tl_codes2.shape[0]
    nb = r_pad // ROW_BLOCK
    n_visits = visit_tiles.shape[0]
    n_tiles = width_pad // POS_TILE
    w_h = n_tiles * 2 * V2_HALF  # paired-plane width per output

    def _spec(shape):
        return pl.BlockSpec(
            shape, lambda v, t, b, f, l, vv: (b[v], 0, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_visits,),
        in_specs=[_spec((1, ROW_BLOCK, V2_HALF)),
                  _spec((1, ROW_BLOCK, V2_VBYTES)),
                  _spec((1, 1, ROW_BLOCK)), _spec((1, 1, ROW_BLOCK)),
                  _spec((1, 1, ROW_BLOCK)), _spec((1, 1, ROW_BLOCK))],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
                        for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((C_PAD, 2 * V2_HALF), jnp.float32),
            pltpu.VMEM((C_PAD, 2 * V2_HALF), jnp.float32),
            pltpu.VMEM((G_PAD, 2 * V2_HALF), jnp.float32),
            pltpu.VMEM((G_PAD, 2 * V2_HALF), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    if tl_hp is None:
        tl_hp = jnp.zeros(r_pad, jnp.int8)
    c01, c23, r01, r23 = pl.pallas_call(
        _make_kernel_v2(phased),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((cp, w_h), jnp.float32)
            for cp in (C_PAD, C_PAD, G_PAD, G_PAD)),
        interpret=interpret,
        **kwargs,
    )(visit_tiles, visit_blocks, visit_firsts, visit_lasts, visit_valid,
      tl_codes2.astype(jnp.int32).reshape(nb, ROW_BLOCK, V2_HALF),
      tl_valid.astype(jnp.int32).reshape(nb, ROW_BLOCK, V2_VBYTES),
      tl_tile.reshape(nb, 1, ROW_BLOCK),
      tl_rank_f32.reshape(nb, 1, ROW_BLOCK),
      tl_strand.astype(jnp.int32).reshape(nb, 1, ROW_BLOCK),
      tl_hp.astype(jnp.int32).reshape(nb, 1, ROW_BLOCK))

    # unpair + interleave back into genome order: pair output block t holds
    # plane c at lanes [64*(c&1), 64*(c&1)+64); plane c column j maps to
    # position t*POS_TILE + 4j + c
    def _weave(p01, p23, cp):
        a = p01.reshape(cp, n_tiles, 2, V2_HALF)
        b = p23.reshape(cp, n_tiles, 2, V2_HALF)
        planes = jnp.stack([a[:, :, 0], a[:, :, 1],
                            b[:, :, 0], b[:, :, 1]], axis=-1)
        return planes.reshape(cp, width_pad)

    return _weave(c01, c23, C_PAD), _weave(r01, r23, G_PAD)


def tilelet_expand(tl_codes, tl_tile, tl_rank_f32, tl_strand,
                   visit_tiles, visit_blocks, visit_firsts, visit_lasts,
                   visit_valid, width_pad, interpret=False, tl_hp=None,
                   phased=False):
    """counts[C_PAD, W] f32 and grank[G_PAD, W] f32 from bucketed tilelets.

    Traceable (call inside jit); all shapes static given `bucket_rows`
    outputs. tl_codes is uint8 [r_pad, HALF] (cast to int32 here so the HBM
    wire stays one byte per two bases); tl_rank_f32 must be float32.
    Only base channels (0-3, 9-12) and groups 0-3 are populated -- stars and
    indels ride the sparse side channel in ops/fused_pileup.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_pad = tl_codes.shape[0]
    nb = r_pad // ROW_BLOCK
    n_visits = visit_tiles.shape[0]
    n_tiles = width_pad // POS_TILE
    w_half = n_tiles * HALF

    def _spec(shape):
        # metadata rides as [nb, 1, ROW_BLOCK] (Mosaic requires the last two
        # block dims be (8,128)-aligned or equal to the full array dims)
        return pl.BlockSpec(
            shape, lambda v, t, b, f, l, vv: (b[v], 0, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_visits,),
        in_specs=[_spec((1, ROW_BLOCK, HALF)), _spec((1, 1, ROW_BLOCK)),
                  _spec((1, 1, ROW_BLOCK)), _spec((1, 1, ROW_BLOCK)),
                  _spec((1, 1, ROW_BLOCK))],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
                        for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((C_PAD, HALF), jnp.float32),
            pltpu.VMEM((C_PAD, HALF), jnp.float32),
            pltpu.VMEM((G_PAD, HALF), jnp.float32),
            pltpu.VMEM((G_PAD, HALF), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    if tl_hp is None:
        tl_hp = jnp.zeros(r_pad, jnp.int8)
    ce, co, re_, ro = pl.pallas_call(
        _make_kernel(phased),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((cp, w_half), jnp.float32)
            for cp in (C_PAD, C_PAD, G_PAD, G_PAD)),
        interpret=interpret,
        **kwargs,
    )(visit_tiles, visit_blocks, visit_firsts, visit_lasts, visit_valid,
      tl_codes.astype(jnp.int32).reshape(nb, ROW_BLOCK, HALF),
      tl_tile.reshape(nb, 1, ROW_BLOCK),
      tl_rank_f32.reshape(nb, 1, ROW_BLOCK),
      tl_strand.astype(jnp.int32).reshape(nb, 1, ROW_BLOCK),
      tl_hp.astype(jnp.int32).reshape(nb, 1, ROW_BLOCK))
    # interleave even/odd position columns back into genome order
    counts = jnp.stack([ce, co], axis=-1).reshape(C_PAD, width_pad)
    granks = jnp.stack([re_, ro], axis=-1).reshape(G_PAD, width_pad)
    return counts, granks


def tilelet_expand_xla(tl_codes, tl_tile, tl_rank, tl_strand, width_pad,
                       tl_hp=None, phased=False, tl_valid=None,
                       wire="nibble"):
    """XLA fallback (scatter-based) with identical outputs; used on CPU and
    for differential testing. Takes the nibble wire, or the v2 2-bit +
    validity wire when wire="v2" (tl_valid required then)."""
    import jax
    import jax.numpy as jnp

    r = tl_codes.shape[0]
    packed = tl_codes.astype(jnp.int32)
    if wire == "v2":
        crumbs = jnp.stack([(packed >> (2 * c)) & 3 for c in range(4)],
                           axis=-1).reshape(r, POS_TILE)
        vb = tl_valid.astype(jnp.int32)
        bits = jnp.stack([(vb >> b) & 1 for b in range(8)],
                         axis=-1).reshape(r, POS_TILE)
        codes = jnp.where(bits != 0, crumbs, EMPTY)
    else:
        codes = jnp.stack([(packed >> 4) & 15, packed & 15], axis=-1) \
            .reshape(r, POS_TILE)
    pos = (tl_tile.astype(jnp.int32)[:, None] * POS_TILE
           + jnp.arange(POS_TILE, dtype=jnp.int32)[None, :])
    valid = (codes < 4) & (pos < width_pad)
    chan = jnp.where(valid, codes + 9 * tl_strand.astype(jnp.int32)[:, None],
                     C_PAD - 1)
    pos_c = jnp.minimum(pos, width_pad - 1)
    idx = (pos_c * C_PAD + chan).ravel()
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32).ravel(), idx,
        num_segments=width_pad * C_PAD).reshape(width_pad, C_PAD)
    if phased:
        hp = tl_hp.astype(jnp.int32)[:, None]
        valid_hp = valid & (hp >= 1)
        chan_hp = jnp.where(valid_hp, codes + 12 + 6 * hp, C_PAD - 1)
        idx_hp = (pos_c * C_PAD + chan_hp).ravel()
        counts = counts + jax.ops.segment_sum(
            valid_hp.astype(jnp.int32).ravel(), idx_hp,
            num_segments=width_pad * C_PAD).reshape(width_pad, C_PAD)
    counts = counts.at[:, C_PAD - 1].set(0).T.astype(jnp.float32)

    group = jnp.where(valid, codes, G_PAD - 1)
    gidx = (pos_c * G_PAD + group).ravel()
    rank_e = jnp.where(valid, tl_rank.astype(jnp.float32)[:, None],
                       RANK_INF_F).ravel()
    granks = jax.ops.segment_min(
        rank_e, gidx, num_segments=width_pad * G_PAD) \
        .reshape(width_pad, G_PAD)
    granks = jnp.minimum(granks, RANK_INF_F) \
        .at[:, G_PAD - 1].set(RANK_INF_F).T
    return counts, granks


def tilelet_oracle(tl_codes, tl_tile, tl_rank, tl_strand, width,
                   tl_hp=None, phased=False):
    """Numpy reference: scalar loops over unpacked nibbles."""
    counts = np.zeros((C_PAD, width), np.int64)
    ranks = np.full((G_PAD, width), RANK_INF_F, np.float64)
    for r in range(len(tl_tile)):
        base = int(tl_tile[r]) * POS_TILE
        hp = int(tl_hp[r]) if tl_hp is not None else 0
        for j in range(POS_TILE):
            b = int(tl_codes[r, j // 2])
            code = (b >> 4) if j % 2 == 0 else (b & 15)
            p = base + j
            if code < 4 and 0 <= p < width:
                counts[code + 9 * int(tl_strand[r]), p] += 1
                ranks[code, p] = min(ranks[code, p], float(tl_rank[r]))
                if phased and hp in (1, 2):
                    counts[12 + 6 * hp + code, p] += 1
    return counts, ranks
