"""Fused TPU-resident pileup pipeline: events -> counts -> candidate mask ->
33-window gather -> PileupNet, all under ONE jit.

This is the BASELINE.json north-star formulation: packed event arrays are
staged to device HBM once per chunk and never round-trip host<->device
between stages (the reference's per-position Python loop being replaced is
src/create_tensor_pileup.py:85-302 + the separate predict process). Contrast
with the production path, where the C++ tile builder makes the count image on
the host and only candidate windows cross the link.

Exactness strategy (VCF-identical to the host path):

- channel counts / negation / window gather are integer math, exact in f32
  (all values < 2^24);
- the candidate AF tests (count/depth >= af, float64 on the host,
  src/create_tensor_pileup.py:272-299) are replaced by per-depth integer
  thresholds precomputed on the host in float64 (`_af_thresholds`), so the
  device compares integers only -- bit-identical to the reference;
- Counter insertion-order tie-breaking (pileup_list[0][0]) uses a
  segment-min over event ranks, then argmax-count with argmin-rank
  tie-break;
- BED restriction, known-site (-G) candidates, and head/tail mode run
  natively in the jit (mask inputs + run-extent rules; see make_fused_fn's
  feature flags);
- candidates that need the high-coverage renormalization (depth >
  1.5*max_depth) are flagged (`host_flags` bit 1): their RAW count windows
  are fetched from the already-staged device image by a second lightweight
  jit (the same fused fn called with `sel`) and the reference's float64
  scale-then-truncate (clair3_rna/utils.py:88-92) is applied on the host —
  numpy float64 division is not reproducible in on-device f32/int math at
  integer-quotient boundary cases, and it costs nothing on the host — then
  the windows ride the SAME wire-forward jit the host path uses, so deep
  chunks (RNA's high-expression regime) stay on the TPU path end to end
  with bit-identical output (FusedChunkCaller._renorm_records);
- candidates that could trigger the splice-padding backfill are flagged
  (bit 2) and rebuilt on the host as 1-position mini chunks
  (FusedChunkCaller._hatch_records) — sound only when the flagged
  candidate is ISOLATED (no other candidate within 2*FLANK), because the
  host builder's backfill mutates the shared image in place and serializes
  exactly those neighbors (pileup/builder.py:537-622); clustered triggers
  fall back per chunk;
- only candidate/rank overflow, depths beyond the AF-threshold table,
  clustered splice triggers, or a splice-flag count exceeding hatch_max
  fall back per chunk.

Two wire formats feed the fused jit:

- mode="packed" (default): PackedReads tilelet rows (~0.5-0.9 B/base,
  extracted at memcpy speed by the C++ pass) expanded on device by the
  ops/tilelet Pallas kernel; stars/indels (~1% of events) ride an XLA
  segment-op side channel. This is the production TPU path.
- mode="events": flat 11 B/event arrays through ops/fused_scatter -- the
  round-2 formulation, kept as a differential oracle and ablation.

Perf reality (measured, 2-vCPU host + tunnel-attached v5e): the events wire
costs ~6x the C++ in-place count to materialize (1.98s vs 0.34s per 1.2Mb at
35x) and ~11 B/event to ship, losing ~25x end-to-end on a ~100-140 MB/s
link; the packed wire is ~15x smaller and ~10x cheaper to extract. On this
tunnel the HOST path still wins end-to-end (ship-bound; --pileup_backend
auto picks it); the fused path is the deployment formulation for
chip-local links per the PERF.md crossover model.
"""

import os
from dataclasses import dataclass
import numpy as np

from clair3_rna_tpu import config
from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.ops import fused_scatter as fsc
from clair3_rna_tpu.ops import tilelet as tlt

FLANK = config.FLANKING_BASE_NUM
WINDOW = config.NO_OF_POSITIONS
N_CH = config.CHANNEL_SIZE  # 18 unphased; phased mode (30ch) rides
                            # cfg.channel_size inside make_fused_fn
GROUP_NONE = 6              # star placeholders count depth but no group
D_TABLE = 4096              # static AF-threshold table size; candidates at
                            # depths beyond it fall back (clamped thresholds
                            # would be lenient -> candidacy itself unsound)


def _af_thresholds(af, max_depth=D_TABLE - 1):
    """thr[d] = min count c with float64(c/d) >= af -- exact mirror of the
    host's float64 comparison, one integer per depth."""
    d = np.arange(max_depth + 1, dtype=np.float64)
    d[0] = 1.0  # the host divides by max(depth, 1)
    c0 = np.floor(af * d).astype(np.int64)
    # c0 or c0+1, depending on float64 rounding of c/d
    thr = np.where(c0.astype(np.float64) / d >= af, c0, c0 + 1)
    return np.maximum(thr, 0).astype(np.int32)


def _pad_pow2(arr, fill, min_size=1024):
    """Pad a 1D/2D array's first axis to the next power of two (>= min_size)
    so each bucket shape compiles once."""
    n = len(arr)
    size = min_size
    while size < n:
        size *= 2
    if size == n:
        return arr
    pad_shape = (size - n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)])


@dataclass
class StagedChunk:
    """Host-packed per-chunk arrays, ready for one device transfer.

    Every array's leading axis is padded to a power-of-two bucket (pad
    events carry weight 0 / inert segment ids) so a whole-contig stream
    compiles a handful of shapes, not one per chunk."""

    width: int            # padded position count
    core_lo: int          # candidate emission bounds (absolute offsets)
    core_hi: int
    start: int            # absolute 0-based position of offset 0
    ev_pos: np.ndarray    # [E] int32 position offsets (tile-bucketed;
    #                       pads sit at `width`, inert in both scatters)
    ev_chan: np.ndarray   # [E] int8 channel 0..17
    ev_group: np.ndarray  # [E] int8 0..5, GROUP_NONE for stars, 7 for pads
    ev_rank: np.ndarray   # [E] int32
    ev_weight: np.ndarray  # [E] int8 1 real / 0 pad
    visit_tiles: np.ndarray   # Pallas scatter visit list (fused_scatter)
    visit_blocks: np.ndarray
    visit_firsts: np.ndarray
    visit_lasts: np.ndarray
    visit_valid: np.ndarray
    cover_pos: np.ndarray    # [R] int32 positions with cover-count deltas
    cover_delta: np.ndarray  # [R] int32
    i1_pos: np.ndarray    # [K] int32 positions with I1/i1/D1/d1 patches
    i1_vals: np.ndarray   # [K, 4] int32
    ref_code: np.ndarray  # [W] int8 (-1 non-ACGT)
    thr_snp: np.ndarray   # [D_TABLE] int32
    thr_indel: np.ndarray
    cover_allow: np.ndarray  # [W] int8 bed+-33 mask (1-elt placeholder off)
    cand_allow: np.ndarray   # [W] int8 bed-span / known-site mask
    max_skip: np.ndarray     # [W] int32 splice statistics (placeholder off)


def stage_chunk(events, ref_codes, cfg: PileupConfig, core_lo, core_hi,
                width_pad=None, scatter="pallas", cover_allow=None,
                cand_allow=None):
    """PileupEvents -> StagedChunk (one host pass; no dense image built).

    With scatter="xla" the Pallas visit machinery is skipped (the XLA
    segment ops are order-invariant): events are only power-of-two padded
    and 1-element visit placeholders ride along, saving the stable sort and
    five staged arrays on the path that never reads them."""
    width = events.end - events.start
    if width_pad is None:  # bucket widths so chunk tails reuse compilations
        width_pad = 16384
        while width_pad < width:
            width_pad *= 2

    base_chan = events.base_code.astype(np.int32) + 9 * events.base_strand
    star_chan = np.where(events.star_strand == 0, config.CHANNEL_INDEX["*"],
                         config.CHANNEL_INDEX["#"]).astype(np.int32)
    ins_chan = np.where(events.ins_strand == 0, config.CHANNEL_INDEX["I"],
                        config.CHANNEL_INDEX["i"]).astype(np.int32)
    del_chan = np.where(events.del_strand == 0, config.CHANNEL_INDEX["D"],
                        config.CHANNEL_INDEX["d"]).astype(np.int32)

    ev_pos = np.concatenate([
        events.base_pos - events.start, events.star_pos - events.start,
        events.ins_pos - events.start, events.del_pos - events.start,
    ]).astype(np.int32)
    ev_chan = np.concatenate([base_chan, star_chan, ins_chan, del_chan])
    ev_group = np.concatenate([
        events.base_code.astype(np.int32),
        np.full(len(events.star_pos), GROUP_NONE, np.int32),
        np.full(len(events.ins_pos), 4, np.int32),
        np.full(len(events.del_pos), 5, np.int32),
    ])
    ev_rank = np.concatenate([
        events.base_rank, np.zeros(len(events.star_pos), np.int64),
        events.ins_rank, events.del_rank,
    ]).astype(np.int32)

    # I1/i1/D1/d1: most-supported single allele per (pos, strand), computed
    # on host from the (sparse, ~1%-of-events) indel arrays
    from clair3_rna_tpu.pileup.builder import _max_per_allele
    ins_max = _max_per_allele(events.ins_pos - events.start,
                              events.ins_strand, events.ins_allele,
                              width, len(events.ins_seqs))
    n_del_alleles = int(events.del_len.max()) + 1 if len(events.del_len) else 0
    del_max = _max_per_allele(events.del_pos - events.start,
                              events.del_strand, events.del_len,
                              width, n_del_alleles)
    patch = np.concatenate([ins_max, del_max], axis=1)  # [W, 4] I1 i1 D1 d1
    i1_pos = np.nonzero(patch.any(axis=1))[0].astype(np.int32)
    i1_vals = patch[i1_pos].astype(np.int32)

    # cover-count deltas as a sparse (pos, delta) scatter (the dense
    # cover_count is already integrated on the host; its diff is sparse at
    # read boundaries only). The closing delta at `width` matters: without
    # it the device cumsum carries coverage into the pad region and the
    # covered-run extents bleed past the region end, over-emitting
    # candidates near the boundary (ids == width_pad are dropped by
    # segment_sum when width == width_pad, where no pad region exists).
    diff = np.diff(np.concatenate(
        [[0], events.cover_count, [0]])).astype(np.int32)
    nz = np.nonzero(diff)[0].astype(np.int32)
    cover_pos, cover_delta = nz, diff[nz]

    # 1-byte channel/group/weight on the wire (cast on device): 11 B/event.
    # Events are bucketed by 512-position tile (stable radix sort, O(E)) so
    # the Pallas scatter kernel sees contiguous per-tile ranges; the XLA
    # segment ops are order-invariant and skip the visit machinery.
    if scatter == "xla":
        z = np.zeros(1, np.int32)
        b = {
            "ev_pos": _pad_pow2(ev_pos, np.int32(width_pad)),
            "ev_chan": _pad_pow2(ev_chan.astype(np.int8), 0),
            "ev_group": _pad_pow2(ev_group.astype(np.int8), 7),
            "ev_rank": _pad_pow2(ev_rank, np.int32(fsc.MAX_RANK)),
            "visit_tiles": z, "visit_blocks": z, "visit_firsts": z,
            "visit_lasts": z, "visit_valid": z,
        }
    else:
        b = fsc.bucket_events(ev_pos, ev_chan, ev_group, ev_rank, width_pad)
    ev_weight = (b["ev_pos"] < width_pad).astype(np.int8)
    return StagedChunk(
        width=width_pad, core_lo=core_lo - events.start,
        core_hi=core_hi - events.start, start=events.start,
        ev_pos=b["ev_pos"], ev_chan=b["ev_chan"], ev_group=b["ev_group"],
        ev_rank=b["ev_rank"], ev_weight=ev_weight,
        visit_tiles=b["visit_tiles"], visit_blocks=b["visit_blocks"],
        visit_firsts=b["visit_firsts"], visit_lasts=b["visit_lasts"],
        visit_valid=b["visit_valid"],
        cover_pos=_pad_pow2(cover_pos, 0, min_size=256),
        cover_delta=_pad_pow2(cover_delta, 0, min_size=256),
        i1_pos=_pad_pow2(i1_pos, 0, min_size=256),
        i1_vals=_pad_pow2(i1_vals, 0, min_size=256),
        ref_code=np.pad(ref_codes.astype(np.int8),
                        (0, width_pad - width), constant_values=-1),
        thr_snp=_af_thresholds(cfg.effective_snp_af),
        thr_indel=_af_thresholds(cfg.effective_indel_min_af),
        **dict(zip(("cover_allow", "cand_allow", "max_skip"),
                   _mask_args(events, width_pad, cover_allow, cand_allow,
                              cfg.enable_splice_padding))),
    )


@dataclass
class StagedPacked:
    """Host-staged packed-read arrays for one chunk (mode="packed").

    The tilelet rows (bucketed by ops/tilelet.bucket_rows) carry the aligned
    base codes nibble-packed; stars and indels ride the sparse side arrays.
    All leading axes are power-of-two padded so a contig stream compiles a
    handful of shapes."""

    width: int
    core_lo: int
    core_hi: int
    start: int
    tl_codes: np.ndarray      # [R_pad, POS_TILE/2] uint8 nibble arena, or
    #                           [R_pad, POS_TILE/4] 2-bit crumbs (wire="v2")
    tl_valid: np.ndarray      # [R_pad, POS_TILE/8] uint8 validity bits
    #                           (v2 wire; 1-elt placeholder otherwise)
    tl_tile: np.ndarray       # [R_pad] int32
    tl_rank: np.ndarray       # [R_pad] int32
    tl_strand: np.ndarray     # [R_pad] int8
    tl_hp: np.ndarray         # [R_pad] int8 (phased mode)
    visit_tiles: np.ndarray
    visit_blocks: np.ndarray
    visit_firsts: np.ndarray
    visit_lasts: np.ndarray
    visit_valid: np.ndarray
    sp_pos: np.ndarray        # [S_pad] int32 sparse star/ins/del events
    sp_chan: np.ndarray       # [S_pad] int8
    sp_group: np.ndarray      # [S_pad] int8 (4 ins, 5 del, 6 star, 7 pad)
    sp_rank: np.ndarray       # [S_pad] int32
    sp_weight: np.ndarray     # [S_pad] int8
    cover_pos: np.ndarray
    cover_delta: np.ndarray
    i1_pos: np.ndarray
    i1_vals: np.ndarray
    ref_code: np.ndarray
    thr_snp: np.ndarray
    thr_indel: np.ndarray
    cover_allow: np.ndarray
    cand_allow: np.ndarray
    max_skip: np.ndarray


def _mask_args(data, width_pad, cover_allow, cand_allow, with_max_skip):
    """Padded (cover_allow, cand_allow, max_skip) staged arrays; 1-element
    placeholders when the corresponding feature flag is off (the jit never
    reads them then -- they are DCE'd at trace)."""
    width = data.end - data.start
    z = np.zeros(1, np.int8)
    ca = z if cover_allow is None else np.pad(
        np.asarray(cover_allow, np.int8), (0, width_pad - width))
    aa = z if cand_allow is None else np.pad(
        np.asarray(cand_allow, np.int8), (0, width_pad - width))
    if with_max_skip:
        ms = np.maximum.reduce([
            data.read_start_count, data.read_end_count,
            data.skip_fwd_count, data.skip_rev_count]).astype(np.int32)
        ms = np.pad(ms, (0, width_pad - width))
    else:
        ms = np.zeros(1, np.int32)
    return ca, aa, ms


def _sparse_side(packed, width_pad, phased=False):
    """Star/ins/del events as padded flat arrays for the XLA side channel.
    In phased mode, HP-tagged ins/del events contribute extra count-only
    events into the IP/DP (hp=1) and IM/DM (hp=2) channels
    (src/create_tensor_pileup.py:181-217)."""
    start = packed.start
    star_chan = np.where(packed.star_strand == 0, config.CHANNEL_INDEX["*"],
                         config.CHANNEL_INDEX["#"]).astype(np.int8)
    ins_chan = np.where(packed.ins_strand == 0, config.CHANNEL_INDEX["I"],
                        config.CHANNEL_INDEX["i"]).astype(np.int8)
    del_chan = np.where(packed.del_strand == 0, config.CHANNEL_INDEX["D"],
                        config.CHANNEL_INDEX["d"]).astype(np.int8)
    pos_parts = [packed.star_pos - start, packed.ins_pos - start,
                 packed.del_pos - start]
    chan_parts = [star_chan, ins_chan, del_chan]
    group_parts = [np.full(len(packed.star_pos), GROUP_NONE, np.int8),
                   np.full(len(packed.ins_pos), 4, np.int8),
                   np.full(len(packed.del_pos), 5, np.int8)]
    rank_parts = [np.zeros(len(packed.star_pos), np.int64),
                  packed.ins_rank, packed.del_rank]
    if phased:
        base = config.CHANNEL_SIZE  # 18: IP/DP at +4/+5, IM/DM at +10/+11
        for hp_val, off in ((1, base), (2, base + 6)):
            for kind_pos, kind_hp in ((packed.ins_pos, packed.ins_hp),
                                      (packed.del_pos, packed.del_hp)):
                sel = kind_hp == hp_val
                n = int(sel.sum())
                ch = off + (4 if kind_pos is packed.ins_pos else 5)
                pos_parts.append((kind_pos[sel] - start).astype(np.int32))
                chan_parts.append(np.full(n, ch, np.int8))
                group_parts.append(np.full(n, 7, np.int8))  # count-only
                rank_parts.append(np.zeros(n, np.int64))
    sp_pos = np.concatenate(pos_parts).astype(np.int32)
    sp_chan = np.concatenate(chan_parts)
    sp_group = np.concatenate(group_parts)
    sp_rank = np.concatenate(rank_parts).astype(np.int32)
    sp_pos = _pad_pow2(sp_pos, width_pad, min_size=512)
    sp_weight = (sp_pos < width_pad).astype(np.int8)
    return (sp_pos, _pad_pow2(sp_chan, 0, min_size=512),
            _pad_pow2(sp_group, 7, min_size=512),
            _pad_pow2(sp_rank, tlt.MAX_RANK, min_size=512), sp_weight)


def stage_chunk_packed(packed, ref_codes, cfg: PileupConfig, core_lo,
                       core_hi, width_pad=None, scatter="xla",
                       cover_allow=None, cand_allow=None, wire=None):
    """PackedReads -> StagedPacked (one cheap host pass: visit bucketing over
    ~rows, not ~events, plus the sparse side arrays).

    wire="v2" repacks the extractor's nibble arenas into the 3-bit/slot
    wire (2-bit crumbs + validity bitmap, ops/tilelet.nibble_to_v2) --
    25% fewer tilelet bytes on the link with identical expansion."""
    wire = resolve_wire() if wire is None else wire
    width = packed.end - packed.start
    if width_pad is None:
        width_pad = 16384
        while width_pad < width:
            width_pad *= 2

    if scatter == "xla":
        # the XLA expansion needs no visit machinery: pad rows to a power of
        # two only (inert rows point at tile n_tiles = beyond every position)
        n_tiles = width_pad // tlt.POS_TILE
        r_pad = tlt.quantize_rows(len(packed.tl_tile))

        def _pad_rows(a, fill):
            pad_shape = (r_pad - len(a),) + a.shape[1:]
            return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])

        tl_tile = _pad_rows(packed.tl_tile.astype(np.int32),
                            np.int32(n_tiles))
        b = {
            "tl_codes": np.full((r_pad, tlt.HALF), 0xFF, np.uint8),
            "tl_tile": tl_tile,
            "tl_rank": _pad_rows(packed.tl_rank.astype(np.int32),
                                 np.int32(tlt.MAX_RANK)),
            "tl_strand": _pad_rows(packed.tl_strand.astype(np.int8),
                                   np.int8(0)),
            "tl_hp": _pad_rows(packed.tl_hp.astype(np.int8), np.int8(0)),
            "visit_tiles": np.zeros(1, np.int32),
            "visit_blocks": np.zeros(1, np.int32),
            "visit_firsts": np.zeros(1, np.int32),
            "visit_lasts": np.zeros(1, np.int32),
            "visit_valid": np.zeros(1, np.int32),
        }
        b["tl_codes"][:len(packed.tl_codes)] = packed.tl_codes
    else:
        b = tlt.bucket_rows(packed.tl_tile, packed.tl_codes, packed.tl_rank,
                            packed.tl_strand, width_pad,
                            tl_hp=packed.tl_hp)
    if wire == "v2":
        b["tl_codes"], b["tl_valid"] = tlt.nibble_to_v2(b["tl_codes"])
    else:
        b["tl_valid"] = np.zeros(1, np.uint8)
    sp_pos, sp_chan, sp_group, sp_rank, sp_weight = _sparse_side(
        packed, width_pad, phased=cfg.phased)

    from clair3_rna_tpu.pileup.builder import _max_per_allele
    ins_max = _max_per_allele(packed.ins_pos - packed.start,
                              packed.ins_strand, packed.ins_allele,
                              width, len(packed.ins_seqs))
    n_del_alleles = int(packed.del_len.max()) + 1 if len(packed.del_len) else 0
    del_max = _max_per_allele(packed.del_pos - packed.start,
                              packed.del_strand, packed.del_len,
                              width, n_del_alleles)
    patch = np.concatenate([ins_max, del_max], axis=1)
    i1_pos = np.nonzero(patch.any(axis=1))[0].astype(np.int32)
    i1_vals = patch[i1_pos].astype(np.int32)

    # include the closing delta at `width` (see stage_chunk: pad-region
    # coverage bleed otherwise over-emits boundary candidates)
    diff = np.diff(np.concatenate(
        [[0], packed.cover_count, [0]])).astype(np.int32)
    nz = np.nonzero(diff)[0].astype(np.int32)

    return StagedPacked(
        width=width_pad, core_lo=core_lo - packed.start,
        core_hi=core_hi - packed.start, start=packed.start,
        tl_codes=b["tl_codes"], tl_valid=b["tl_valid"],
        tl_tile=b["tl_tile"], tl_rank=b["tl_rank"],
        tl_strand=b["tl_strand"], tl_hp=b["tl_hp"],
        visit_tiles=b["visit_tiles"], visit_blocks=b["visit_blocks"],
        visit_firsts=b["visit_firsts"], visit_lasts=b["visit_lasts"],
        visit_valid=b["visit_valid"],
        sp_pos=sp_pos, sp_chan=sp_chan, sp_group=sp_group, sp_rank=sp_rank,
        sp_weight=sp_weight,
        cover_pos=_pad_pow2(nz, 0, min_size=256),
        cover_delta=_pad_pow2(diff[nz], 0, min_size=256),
        i1_pos=_pad_pow2(i1_pos, 0, min_size=256),
        i1_vals=_pad_pow2(i1_vals, 0, min_size=256),
        ref_code=np.pad(ref_codes.astype(np.int8),
                        (0, width_pad - width), constant_values=-1),
        thr_snp=_af_thresholds(cfg.effective_snp_af),
        thr_indel=_af_thresholds(cfg.effective_indel_min_af),
        **dict(zip(("cover_allow", "cand_allow", "max_skip"),
                   _mask_args(packed, width_pad, cover_allow, cand_allow,
                              cfg.enable_splice_padding))),
    )


def make_fused_fn(params, cfg: PileupConfig, *, max_candidates=1024,
                  add_indel_length=False, scatter="xla", mode="events",
                  known_only=False, with_masks=False,
                  with_renorm_windows=False, wire="nibble"):
    """Build the single-jit fused function over staged device arrays.

    Returns fused(*staged_args) -> one packed f32 array
    [max_candidates + 1, P + 12] (header row carries n_cand; body rows are
    cand | probs+mask | gcount4 | grank4 | ref_count | depth | host_flags,
    P = probs-plus-prescreen width) so the host pays exactly ONE device
    fetch per chunk; see the packing comment in `_tail` for the f32
    exactness argument and the host_flags escape codes.

    `mode` picks the wire format: "packed" (tilelet rows + sparse side
    channel, from stage_chunk_packed) or "events" (flat event arrays, from
    stage_chunk). `scatter` picks the O(events) reduction backend: "xla"
    (segment ops, lowered to serialized TPU scatter), "pallas" (the
    ops/tilelet or ops/fused_scatter kernel), or "pallas_interpret" (the
    kernel's interpreter, for CPU tests). Identical integer results by
    construction.

    Feature flags (static; each compiles its own graph):
    - known_only: candidate mask = known-site positions & covered, the -G
      genotyping mode (builder.candidate_mask_from known branch); positions
      arrive as the staged cand_allow bitmask.
    - with_masks: BED restriction -- cover_allow (bed +-33) clips coverage
      runs, cand_allow (bed vs candidate deletion span) clips candidates
      (run_clair3_rna:268-296 + src/create_tensor_pileup.py:551-554).
    - cfg.enable_splice_padding: candidates whose 33-window splice-skip
      statistics could trigger the reference's backfill
      (src/create_tensor_pileup.py:573-593) are flagged in host_flags;
      ISOLATED flagged candidates are rebuilt host-side per candidate (the
      hatch), clustered ones whole-chunk fall back (the backfill mutates
      the shared image in place, so neighbors within 2*FLANK are coupled);
      non-triggering candidates stay fused and identical.
    - cfg.enable_head_tail: run-tail candidates kept and window slots
      outside the candidate's covered run zeroed
      (src/create_tensor_pileup.py:614-637).
    - with_renorm_windows: the raw (pre-network) candidate windows ride the
      SAME packed output as extra rows, so renorm-flagged candidates need
      no second windows-fetch round trip -- deep chunks keep the one-fetch-
      per-chunk invariant (selected per chunk by FusedChunkCaller when the
      chunk's max coverage can flag candidates; the extra rows cost
      ~bytes-equal to the separate fetch they replace, so shallow chunks
      keep the slim output).
    """
    import jax
    import jax.numpy as jnp

    from clair3_rna_tpu.models.network import PileupNet, _REF_GT21_BY_CODE

    model = PileupNet(add_indel_length=add_indel_length)
    ref_gt21 = jnp.asarray(_REF_GT21_BY_CODE, jnp.int32)
    n_ch = cfg.channel_size  # 18, or 30 in phased mode
    phased = bool(cfg.phased)
    if phased and mode != "packed":
        raise ValueError("phased fused mode requires mode='packed'")
    min_cov = int(cfg.min_coverage)
    fast = cfg.platform == "ont" and cfg.fast_mode
    af_zero = (cfg.effective_snp_af == 0.0
               or cfg.effective_indel_min_af == 0.0)
    snp_only = bool(cfg.call_snp_only)
    max_depth = config.MAX_DEPTH_BY_PLATFORM.get(cfg.platform,
                                                 config.MAX_DEPTH)
    RANK_INF = np.int32(2**31 - 1)
    CI = config.CHANNEL_INDEX
    splice = bool(cfg.enable_splice_padding)
    head_tail = bool(cfg.enable_head_tail)
    SKIP_THR = float(config.SKIP_PROPORTION_THRESHOLD)

    def _tail(counts, grank6, cover_pos, cover_delta, i1_pos, i1_vals,
              ref_code, thr_snp, thr_indel, cover_allow, cand_allow,
              max_skip, core, sel=None):
        """Steps 3-8, shared by both wire formats: i1 patch, features,
        candidate mask, window gather, network, prescreen.

        With `sel` (an int32 array of window-center offsets, pads = W) the
        mask/network stages are skipped and the RAW negated count windows at
        those centers are returned instead — the renorm fetch path
        (FusedChunkCaller._renorm_records) re-reads the staged image for
        flagged candidates so the host can apply the float64 scale."""
        W = ref_code.shape[0]
        counts = counts.at[i1_pos, :].add(
            jnp.zeros((i1_pos.shape[0], n_ch), counts.dtype)
            .at[:, CI["I1"]].set(i1_vals[:, 0])
            .at[:, CI["i1"]].set(i1_vals[:, 1])
            .at[:, CI["D1"]].set(i1_vals[:, 2])
            .at[:, CI["d1"]].set(i1_vals[:, 3]))
        eff = jnp.maximum(ref_code, 0).astype(jnp.int32)
        pos_iota = jnp.arange(W, dtype=jnp.int32)

        # 3. coverage + covered-run extents (finalize_features/compute_runs
        # mirror; runs feed both the eligibility rule and head/tail zeroing)
        cover = jnp.cumsum(jax.ops.segment_sum(
            cover_delta, cover_pos, num_segments=W))
        covered = cover > 0
        if with_masks:  # bed +-33 clips coverage (and so run extents)
            covered &= cover_allow != 0
        run_start = jax.lax.cummax(jnp.where(
            covered & jnp.concatenate([jnp.array([True]), ~covered[:-1]]),
            pos_iota, -1))
        run_end = -jax.lax.cummax(jnp.where(
            covered & jnp.concatenate([~covered[1:], jnp.array([True])]),
            -pos_iota, -(W + 1))[::-1])[::-1]

        if sel is None:
            gcount = jnp.stack([
                counts[:, 0] + counts[:, 9], counts[:, 1] + counts[:, 10],
                counts[:, 2] + counts[:, 11], counts[:, 3] + counts[:, 12],
                counts[:, CI["I"]] + counts[:, CI["i"]],
                counts[:, CI["D"]] + counts[:, CI["d"]],
            ], axis=1)                                        # [W, 6]
            grank = jnp.where(gcount > 0, grank6, RANK_INF)
            star_total = counts[:, CI["*"]] + counts[:, CI["#"]]
            base_total = gcount[:, :4].sum(axis=1)
            depth = base_total + star_total
            ins_total, del_total = gcount[:, 4], gcount[:, 5]
            ref_base_count = jnp.take_along_axis(gcount[:, :4], eff[:, None],
                                                 axis=1)[:, 0]
            alt_count = base_total - ref_base_count
            ref_count = jnp.maximum(
                0, depth - (del_total + star_total) - ins_total - alt_count)

            # 4. candidate mask (candidate_mask_from mirror, integer-exact)
            if known_only:
                # -G genotyping: candidates are exactly the known positions
                mask = covered & (cand_allow != 0)
            else:
                dcl = jnp.minimum(depth, thr_snp.shape[0] - 1)
                non_ref = gcount[:, :4].at[jnp.arange(W), eff].set(0)
                snp_ok = non_ref >= thr_snp[dcl][:, None]
                if fast:
                    snp_ok &= non_ref >= 4
                pass_snp = snp_ok.any(axis=1)
                ti = thr_indel[dcl]
                pass_indel = (ins_total >= ti) | (del_total >= ti)
                max_gc = gcount.max(axis=1)
                rank_if_top = jnp.where(gcount == max_gc[:, None], grank,
                                        RANK_INF)
                top_group = jnp.argmin(rank_if_top, axis=1)
                pass_top = (max_gc > 0) & (top_group != eff)
                pass_af = pass_snp if snp_only \
                    else (pass_top | pass_snp | pass_indel)
                if af_zero:
                    pass_af |= depth > 0
                mask = covered & (ref_code >= 0) & pass_af \
                    & (depth >= min_cov)
                if with_masks:  # bed vs candidate deletion span
                    mask &= cand_allow != 0

            # 5. full-window eligibility from covered-run extents
            if head_tail:
                # run-tail candidates stay; their windows zero outside the
                # run (the trailing flush, create_tensor_pileup:614-637)
                last_covered = jnp.max(jnp.where(covered, pos_iota, -1))
                kept = ((run_end >= pos_iota + FLANK)
                        | (run_end == last_covered))
            else:
                kept = ((run_start <= pos_iota - FLANK)
                        & (run_end >= pos_iota + FLANK))
            mask &= kept & (pos_iota >= core[0]) & (pos_iota < core[1])

            n_cand = mask.sum()
            cand = jnp.nonzero(mask, size=max_candidates, fill_value=W)[0]
        else:
            cand = sel

        # 6. ref-channel negation (negated_counts mirror)
        ch_iota = jnp.arange(n_ch, dtype=jnp.int32)[None, :]
        fwd_sum = counts[:, 0:4].sum(axis=1)
        rev_sum = counts[:, 9:13].sum(axis=1)
        neg_f = ch_iota == eff[:, None]
        neg_r = ch_iota == (eff[:, None] + 9)
        image = jnp.where(neg_f, -fwd_sum[:, None],
                          jnp.where(neg_r, -rev_sum[:, None], counts))

        # 7. 33-window gather (zero outside [0, W))
        win_pos = cand[:, None] + jnp.arange(-FLANK, FLANK + 1)[None, :]
        valid = (win_pos >= 0) & (win_pos < W) & (cand[:, None] < W)
        if head_tail:
            cc0 = jnp.clip(cand, 0, W - 1)
            valid &= ((win_pos >= run_start[cc0][:, None])
                      & (win_pos <= run_end[cc0][:, None]))
        wp = jnp.clip(win_pos, 0, W - 1)
        windows = jnp.where(valid[:, :, None], image[wp], 0)
        if sel is not None:
            # windows-fetch mode: raw integer windows, exact in f32
            # (|values| < 2^24), for the host-side float64 renormalization
            return windows.astype(jnp.float32)

        # 8. network + homRef prescreen (wire-forward mirror)
        probs = model.apply({"params": params},
                            windows.astype(jnp.float32))
        codes_c = jnp.maximum(ref_code, 0).astype(jnp.int32)[
            jnp.clip(cand, 0, W - 1)]
        ref_idx = ref_gt21[codes_c]
        ref_prob = jnp.take_along_axis(probs[:, :21], ref_idx[:, None],
                                       axis=1)[:, 0]
        needs_decode = ~((probs[:, 21] >= 0.5) & (ref_prob >= 0.5))
        out = jnp.concatenate(
            [probs, needs_decode.astype(jnp.float32)[:, None]], axis=-1)

        cc = jnp.clip(cand, 0, W - 1)
        depth_c = depth[cc]
        # host_flags: per-candidate escape codes (0 = fully fused).
        # 1 = renormalization depth (needs the host's float64 scale+truncate,
        #     clair3_rna/utils.py:88-92) -- the raw window is re-read from
        #     the staged device image and scaled host-side
        #     (FusedChunkCaller._renorm_records);
        # 2 = conservative splice-padding trigger superset -- isolated
        #     candidates rebuild host-side (_hatch_records), clustered ones
        #     whole-chunk fall back;
        # 4 = depth beyond the static AF-threshold table: the clamped
        #     thresholds are lenient, so this candidate's candidacy itself
        #     may be a false positive -> whole-chunk host fallback.
        flags = jnp.where(depth_c > max_depth * 1.5, 1, 0)
        flags = flags + jnp.where(depth_c >= D_TABLE, 4, 0)
        if splice:
            # conservative splice-padding trigger precondition (the exact
            # superset build_tensors uses): candidates that COULD trigger
            # the in-place backfill fall back to the host path per chunk;
            # with SKIP_THR = 1/5 the comparison is integer-exact
            skip_m = jnp.where(covered, max_skip, 0)
            wmax = skip_m
            for d in range(1, FLANK + 1):
                zpad = jnp.zeros(d, skip_m.dtype)
                wmax = jnp.maximum(
                    wmax, jnp.concatenate([skip_m[d:], zpad]))
                wmax = jnp.maximum(
                    wmax, jnp.concatenate([zpad, skip_m[:-d]]))
            wm_c = wmax[cc]
            if abs(SKIP_THR - 0.2) < 1e-12:
                over = wm_c * 5 > depth_c
            else:  # >= makes float32 rounding err on the safe (host) side
                over = (wm_c.astype(jnp.float32)
                        >= SKIP_THR * depth_c.astype(jnp.float32))
            maybe = over | ((depth_c == 0) & (wm_c > 0))
            if head_tail:
                maybe &= run_end[cc] >= cc + FLANK  # flush windows never pad
            flags = flags + jnp.where(maybe, 2, 0)
        flags = jnp.where(cand < W, flags, 0)

        # Pack every output into ONE f32 array [max_candidates+1, P+12]
        # (header row: n_cand; body rows: cand | probs+mask | gcount4 |
        # grank4 | ref_count | depth | host_flags). A tuple return costs one
        # ~28 ms link round trip PER ARRAY to materialize on a tunnel-
        # attached chip -- 8 fetches x 12 chunks was ~2.7 s of the fused
        # end-to-end wall. All packed values are exact in f32: positions
        # < 2^17, counts/depth < 2^24, and ranks are clamped to the 2^24
        # MAX_RANK sentinel (real ranks are < 2^24 by the staging guard;
        # clamped sentinels only ever fill absent groups, whose rank is
        # never read downstream -- _alt_data_fast keys on count > 0).
        grank_c = jnp.minimum(grank[cc][:, :4], tlt.MAX_RANK)
        body = jnp.concatenate([
            cand[:, None].astype(jnp.float32),
            out,
            gcount[cc][:, :4].astype(jnp.float32),
            grank_c.astype(jnp.float32),
            ref_count[cc][:, None].astype(jnp.float32),
            depth_c[:, None].astype(jnp.float32),
            flags[:, None].astype(jnp.float32),
        ], axis=-1)
        header = jnp.zeros((1, body.shape[1]), jnp.float32) \
            .at[0, 0].set(n_cand.astype(jnp.float32))
        if with_renorm_windows:
            # fold the raw (pre-network, integer-exact-in-f32) windows into
            # the same output array, reflowed to the body's column width:
            # the host slices them back by static shape, so deep chunks'
            # renorm candidates cost no second fetch round trip
            cols = body.shape[1]
            flat = windows.astype(jnp.float32).reshape(-1)
            k = -(-flat.shape[0] // cols)
            flat = jnp.concatenate(
                [flat, jnp.zeros(k * cols - flat.shape[0], jnp.float32)])
            return jnp.concatenate([header, body, flat.reshape(k, cols)],
                                   axis=0)
        return jnp.concatenate([header, body], axis=0)

    if mode == "events":
        @jax.jit
        def fused(ev_pos, ev_chan, ev_group, ev_rank, ev_weight, visit_tiles,
                  visit_blocks, visit_firsts, visit_lasts, visit_valid,
                  cover_pos, cover_delta, i1_pos, i1_vals, ref_code, thr_snp,
                  thr_indel, cover_allow, cand_allow, max_skip, core,
                  sel=None):
            W = ref_code.shape[0]
            # 1+2. channel count image + first-occurrence group ranks (exact
            # integer reductions; pads sit at position W, inert either way)
            if scatter == "xla":
                ev_chan32 = ev_chan.astype(jnp.int32)
                ev_group32 = ev_group.astype(jnp.int32)
                pos_c = jnp.minimum(ev_pos, W - 1)
                idx = pos_c * n_ch + ev_chan32
                counts = jax.ops.segment_sum(
                    ev_weight.astype(jnp.int32), idx, num_segments=W * n_ch,
                    indices_are_sorted=False).reshape(W, n_ch)
                gidx = pos_c * 8 + jnp.where(ev_pos < W,
                                             jnp.minimum(ev_group32, 7), 7)
                grank6 = jax.ops.segment_min(
                    ev_rank, gidx, num_segments=W * 8).reshape(W, 8)[:, :6]
            else:
                counts_f, ranks_f = fsc.fused_scatter(
                    ev_pos, ev_chan, ev_group, ev_rank.astype(jnp.float32),
                    visit_tiles, visit_blocks, visit_firsts, visit_lasts,
                    visit_valid, W, interpret=(scatter == "pallas_interpret"))
                counts = counts_f[:n_ch, :].T.astype(jnp.int32)
                grank6 = ranks_f[:6, :].T.astype(jnp.int32)
            return _tail(counts, grank6, cover_pos, cover_delta, i1_pos,
                         i1_vals, ref_code, thr_snp, thr_indel, cover_allow,
                         cand_allow, max_skip, core, sel=sel)
    else:
        @jax.jit
        def fused(tl_codes, tl_valid, tl_tile, tl_rank, tl_strand, tl_hp,
                  visit_tiles,
                  visit_blocks, visit_firsts, visit_lasts, visit_valid,
                  sp_pos, sp_chan, sp_group, sp_rank, sp_weight,
                  cover_pos, cover_delta, i1_pos, i1_vals, ref_code, thr_snp,
                  thr_indel, cover_allow, cand_allow, max_skip, core,
                  sel=None):
            W = ref_code.shape[0]
            # 1+2a. base channels + base group ranks from the tilelet rows
            # (device-side CIGAR expansion)
            if scatter == "xla":
                counts_f, ranks_f = tlt.tilelet_expand_xla(
                    tl_codes, tl_tile, tl_rank, tl_strand, W,
                    tl_hp=tl_hp, phased=phased, tl_valid=tl_valid,
                    wire=wire)
            elif wire == "v2":
                counts_f, ranks_f = tlt.tilelet_expand_v2(
                    tl_codes, tl_valid, tl_tile,
                    tl_rank.astype(jnp.float32),
                    tl_strand, visit_tiles, visit_blocks, visit_firsts,
                    visit_lasts, visit_valid, W,
                    interpret=(scatter == "pallas_interpret"),
                    tl_hp=tl_hp, phased=phased)
            else:
                counts_f, ranks_f = tlt.tilelet_expand(
                    tl_codes, tl_tile, tl_rank.astype(jnp.float32),
                    tl_strand, visit_tiles, visit_blocks, visit_firsts,
                    visit_lasts, visit_valid, W,
                    interpret=(scatter == "pallas_interpret"),
                    tl_hp=tl_hp, phased=phased)
            counts = counts_f[:n_ch, :].T.astype(jnp.int32)
            grank6 = ranks_f[:6, :].T.astype(jnp.int32)
            # 1+2b. sparse star/ins/del side channel (XLA segment ops; these
            # are ~1% of events in RNA data)
            pos_c = jnp.minimum(sp_pos, W - 1)
            idx = pos_c * n_ch + sp_chan.astype(jnp.int32)
            counts = counts + jax.ops.segment_sum(
                sp_weight.astype(jnp.int32), idx,
                num_segments=W * n_ch).reshape(W, n_ch)
            gidx = pos_c * 8 + jnp.minimum(sp_group.astype(jnp.int32), 7)
            sp_grank = jax.ops.segment_min(
                sp_rank, gidx, num_segments=W * 8).reshape(W, 8)[:, :6]
            grank6 = jnp.minimum(grank6, sp_grank)
            return _tail(counts, grank6, cover_pos, cover_delta, i1_pos,
                         i1_vals, ref_code, thr_snp, thr_indel, cover_allow,
                         cand_allow, max_skip, core, sel=sel)

    return fused


def staged_args(st: StagedChunk):
    """Positional argument list for the fused fn from a StagedChunk."""
    return [st.ev_pos, st.ev_chan, st.ev_group, st.ev_rank, st.ev_weight,
            st.visit_tiles, st.visit_blocks, st.visit_firsts, st.visit_lasts,
            st.visit_valid,
            st.cover_pos, st.cover_delta, st.i1_pos, st.i1_vals, st.ref_code,
            st.thr_snp, st.thr_indel, st.cover_allow, st.cand_allow,
            st.max_skip,
            np.asarray([st.core_lo, st.core_hi], np.int32)]


def staged_packed_args(st: StagedPacked):
    """Positional argument list for the packed-mode fused fn."""
    return [st.tl_codes, st.tl_valid, st.tl_tile, st.tl_rank, st.tl_strand,
            st.tl_hp,
            st.visit_tiles, st.visit_blocks, st.visit_firsts, st.visit_lasts,
            st.visit_valid,
            st.sp_pos, st.sp_chan, st.sp_group, st.sp_rank, st.sp_weight,
            st.cover_pos, st.cover_delta, st.i1_pos, st.i1_vals, st.ref_code,
            st.thr_snp, st.thr_indel, st.cover_allow, st.cand_allow,
            st.max_skip,
            np.asarray([st.core_lo, st.core_hi], np.int32)]


def pack_wire(args):
    """Concatenate staged arrays into ONE uint8 blob + a static layout.

    Shipping each staged array separately costs a per-transfer link round
    trip (26 arrays x ~7-28 ms on a tunnel-attached chip was most of the
    fused end-to-end wall). One blob per chunk pays one transfer; the jit
    unpacks it with static slices + bitcasts (`unpack_wire`). Layouts are
    hashable and power-of-two bucketed like the shapes, so each layout
    compiles once."""
    segs = []
    layout = []
    off = 0
    for a in args:
        a = np.ascontiguousarray(a)
        pad = (-off) % 4
        if pad:
            segs.append(np.zeros(pad, np.uint8))
            off += pad
        layout.append((off, a.dtype.str, a.shape))
        flat = a.view(np.uint8).reshape(-1)
        segs.append(flat)
        off += flat.nbytes
    return np.concatenate(segs), tuple(layout)


def unpack_wire(blob, layout):
    """Inverse of pack_wire, traceable inside jit (static offsets/shapes)."""
    import jax
    import jax.numpy as jnp

    out = []
    for off, dtype_str, shape in layout:
        dt = np.dtype(dtype_str)
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        seg = blob[off:off + n * dt.itemsize]
        jdt = jnp.dtype(dt)
        if dt.itemsize == 1:
            arr = seg if jdt == jnp.uint8 \
                else jax.lax.bitcast_convert_type(seg, jdt)
        else:
            arr = jax.lax.bitcast_convert_type(
                seg.reshape(n, dt.itemsize), jdt)
        out.append(arr.reshape(shape))
    return out


def resolve_wire():
    """Tilelet wire layout from CLAIR3_RNA_TPU_TILELET_WIRE:
    "v2" (2-bit crumbs + validity bitmap, 3 bits/slot -- 25% fewer
    tilelet bytes, identical expansion, measured >= the nibble wire
    end-to-end on hardware: WIRE_ABLATION.json; default) or "nibble"
    (4 bits/slot, the r03-r04 wire, kept as ablation/fallback)."""
    wire = os.environ.get("CLAIR3_RNA_TPU_TILELET_WIRE", "v2")
    if wire not in ("nibble", "v2"):
        raise ValueError(f"bad CLAIR3_RNA_TPU_TILELET_WIRE: {wire}")
    return wire


def resolve_mode():
    """Wire format from CLAIR3_RNA_TPU_FUSED_MODE (packed|events); packed --
    the wire that wins end-to-end -- is the default."""
    mode = os.environ.get("CLAIR3_RNA_TPU_FUSED_MODE", "packed")
    if mode not in ("packed", "events"):
        raise ValueError(f"bad CLAIR3_RNA_TPU_FUSED_MODE: {mode}")
    return mode


def resolve_scatter(default_backend=None):
    """Scatter mode from CLAIR3_RNA_TPU_FUSED_SCATTER (auto|pallas|xla|
    pallas_interpret); auto = Pallas kernel on TPU, XLA elsewhere."""
    mode = os.environ.get("CLAIR3_RNA_TPU_FUSED_SCATTER", "auto")
    if mode == "auto":
        if default_backend is None:
            import jax
            default_backend = jax.default_backend()
        return "pallas" if default_backend == "tpu" else "xla"
    if mode not in ("pallas", "xla", "pallas_interpret"):
        raise ValueError(f"bad CLAIR3_RNA_TPU_FUSED_SCATTER: {mode}")
    return mode


class FusedChunkCaller:
    """Chunk-level driver around the fused jit: stage -> device -> rows.

    Candidates the jit cannot finish exactly are flagged in host_flags:

    - renormalization depth (bit 1): the staged device image is re-read at
      those centers by a windows-fetch call (`_renorm_records`), the
      reference's float64 scale-then-truncate is applied on the host, and
      the windows ride the host wire-forward jit -- so uniformly-deep
      chunks (RNA's high-expression regime) stay fused;
    - splice-padding trigger superset (bit 2): ISOLATED flagged candidates
      (no other candidate within 2*FLANK) are rebuilt on the host as
      1-position mini chunks (`_hatch_records`); clustered ones force a
      whole-chunk fallback because the host backfill mutates the shared
      image in place across neighboring windows.

    Chunks whose candidate count exceeds the padded budget retry once at
    the smallest power-of-two budget that fits (each budget compiles once)
    up to max_budget. call_chunk returns None only for whole-chunk
    fallbacks: candidates beyond max_budget, rank overflow, depth beyond
    the AF-threshold table, clustered splice triggers, more than hatch_max
    splice-flagged candidates, or flagged candidates with no host context.

    Thread-safe: the pipeline's prefetch pool calls call_chunk from
    multiple threads, so the telemetry counters and the jit caches are
    guarded by a lock (JAX itself is safe for concurrent dispatch).
    """

    def __init__(self, params, cfg: PileupConfig, call_cfg,
                 max_candidates=1024, scatter=None, mode=None,
                 known_only=False, with_masks=False):
        import threading

        # the padded candidate budget is the network's per-chunk batch: an
        # oversized budget burns device time on padding rows (the network,
        # not the count scatter, dominates the fused jit), and overflowing
        # chunks fall back to the host path -- 1024 covers ~10x the typical
        # 100 kb-chunk candidate density
        self.cfg = cfg
        self.call_cfg = call_cfg
        self.params = params
        self.max_candidates = max_candidates
        self.hatch_max = int(os.environ.get(
            "CLAIR3_RNA_TPU_FUSED_HATCH_MAX", "64"))
        self.hatch_chunks = 0      # chunks that used the splice hatch
        self.hatch_candidates = 0  # candidates rebuilt host-side via hatch
        self.renorm_chunks = 0     # chunks with device-window renorm cands
        self.renorm_candidates = 0  # candidates renormalized via the fetch
        self.renorm_fold_chunks = 0    # renorm windows rode the main output
        self.renorm_window_fetches = 0  # separate windows-fetch round trips
        self.fallback_chunks = 0   # whole-chunk host fallbacks
        # dense-candidate ceiling: shallow (10-20x) noisy data passes the
        # AF test at 2 reads, so real chunks reach 4-6k candidates per
        # 100 kb (the r05 mixed bench measured 45k over 12 chunks); the
        # host path runs the network over every candidate anyway, so the
        # widened fused pass stays cheaper than a whole-chunk double build
        # well past the old 4096 ceiling
        self.max_budget = int(os.environ.get(
            "CLAIR3_RNA_TPU_FUSED_MAX_BUDGET", "8192"))
        # adaptive starting budget: candidate density is locally correlated,
        # so start each chunk at a power-of-two sized from the previous
        # chunk's count (+25% headroom) instead of always probing at
        # max_candidates and paying a retry pass per dense chunk
        self._next_budget = max_candidates
        self.overflow_retries = 0   # chunks rerun with a widened budget
        self.scatter = resolve_scatter() if scatter is None else scatter
        self.mode = resolve_mode() if mode is None else mode
        self.wire = resolve_wire() if self.mode == "packed" else "nibble"
        self.known_only = known_only
        self.with_masks = with_masks
        self._lock = threading.Lock()
        self._fused_by_budget = {}
        self.fused = self._get_fused(max_candidates)
        self._blob_fns = {}  # (layout, budget) -> jitted blob entry
        self._win_fns = {}   # layout -> jitted windows-fetch blob entry

    def _count(self, name, delta=1):
        with self._lock:
            setattr(self, name, getattr(self, name) + delta)

    @property
    def graph_count(self):
        """Number of distinct jitted graphs this caller has created. A
        chunk whose call grows this count paid a trace+compile (or an
        on-disk cache deserialization) -- the hybrid router uses the
        delta to keep one-time compile walls out of its route EWMAs."""
        with self._lock:
            return (len(self._blob_fns) + len(self._win_fns)
                    + len(self._fused_by_budget))

    def counters(self):
        """Snapshot of the telemetry counters (cumulative over the caller's
        lifetime; run-scoped deltas are the reader's job, since callers are
        reused across run_calling invocations to keep their compiled
        graphs warm)."""
        with self._lock:
            return {k: getattr(self, k) for k in (
                "renorm_candidates", "renorm_chunks", "renorm_fold_chunks",
                "renorm_window_fetches", "hatch_candidates",
                "hatch_chunks", "overflow_retries", "fallback_chunks")}

    def _fallback(self):
        """Record and request a whole-chunk host fallback."""
        self._count("fallback_chunks")
        return None

    def _get_fused(self, budget, fold=False):
        with self._lock:
            fn = self._fused_by_budget.get((budget, fold))
            if fn is None:
                fn = make_fused_fn(
                    self.params, self.cfg, max_candidates=budget,
                    add_indel_length=self.call_cfg.add_indel_length,
                    scatter=self.scatter, mode=self.mode,
                    known_only=self.known_only, with_masks=self.with_masks,
                    with_renorm_windows=fold, wire=self.wire)
                self._fused_by_budget[(budget, fold)] = fn
        return fn

    def _blob_fn(self, layout, budget=None, fold=False):
        budget = self.max_candidates if budget is None else budget
        key = (layout, budget, fold)
        with self._lock:
            fn = self._blob_fns.get(key)
        if fn is None:
            import jax
            fused = self._get_fused(budget, fold)
            fn = jax.jit(lambda blob, _l=layout: fused(*unpack_wire(blob, _l)))
            with self._lock:
                self._blob_fns[key] = fn
        return fn

    def _win_fn(self, layout):
        """Windows-fetch entry over the same staged blob: re-reads the count
        image and returns raw negated windows at given centers (the sel
        shape buckets its own compilations)."""
        with self._lock:
            fn = self._win_fns.get(layout)
        if fn is None:
            import jax
            fused = self._get_fused(self.max_candidates)
            fn = jax.jit(lambda blob, sel, _l=layout: fused(
                *unpack_wire(blob, _l), sel=sel))
            with self._lock:
                self._win_fns[layout] = fn
        return fn

    def call_chunk(self, data, ref_codes, ctg_name, ref_seq, ref_lo,
                   core_lo, core_hi, cover_allow=None, cand_allow=None,
                   host_ctx=None):
        """One chunk: stage, run the fused jit, decode on host.

        `data` is a PackedReads (mode="packed") or PileupEvents
        (mode="events"). Returns (vcf_rows, n_candidates) or None for host
        fallback. `host_ctx` enables the per-candidate escape paths: a dict
        with "bam", "fasta", "forward" (the pipeline's wire-forward jit, so
        escape-path probabilities are bit-identical to host-path
        probabilities) and optionally "known_positions"/"bed_regions" for
        the splice-hatch mini builds."""
        import numpy as np

        from clair3_rna_tpu.caller.decode import decode_batch
        from clair3_rna_tpu.pileup.builder import (SparseIndels,
                                                   _alt_data_fast)

        if self.mode == "packed":
            if not hasattr(data, "tl_codes"):  # PileupEvents given: convert
                from clair3_rna_tpu.pileup.packed import packed_from_events
                data = packed_from_events(data)
            if data.max_rank >= tlt.MAX_RANK:
                # rank exceeds exact-f32 range: host path handles
                return self._fallback()
            staged = stage_chunk_packed(data, ref_codes, self.cfg, core_lo,
                                        core_hi, scatter=self.scatter,
                                        cover_allow=cover_allow,
                                        cand_allow=cand_allow,
                                        wire=self.wire)
            args = staged_packed_args(staged)
            indels = data.sparse_indels()
        else:
            events = data
            max_rank = max((int(a[-1]) for a in (events.base_rank,
                                                 events.ins_rank,
                                                 events.del_rank) if len(a)),
                           default=0)
            if self.scatter != "xla" and max_rank >= fsc.MAX_RANK:
                return self._fallback()
            staged = stage_chunk(events, ref_codes, self.cfg, core_lo,
                                 core_hi, scatter=self.scatter,
                                 cover_allow=cover_allow,
                                 cand_allow=cand_allow)
            args = staged_args(staged)
            indels = SparseIndels.from_events(events)
        blob, layout = pack_wire(args)
        # deep chunks select the renorm-window-fold graph BEFORE dispatch
        # (max coverage bounds candidate depth, so any chunk that can flag
        # renorm candidates folds their raw windows into the one output --
        # the one-fetch-per-chunk invariant holds in the deep regime too)
        max_depth = config.MAX_DEPTH_BY_PLATFORM.get(self.cfg.platform,
                                                     config.MAX_DEPTH)
        fold = bool(len(data.cover_count)
                    and int(data.cover_count.max()) > max_depth * 1.5)
        # ONE device transfer (blob) and ONE device fetch (packed output)
        import jax
        blob_dev = jax.device_put(blob)  # reused by retries + window fetch
        if fold:
            # fold output carries a window block sized by the BUDGET, so
            # deep chunks always probe at the base budget (deep chunks are
            # candidate-sparse -- high integer AF thresholds -- and an
            # inherited dense-shallow budget would inflate the one fetch)
            budget = self.max_candidates
        else:
            with self._lock:
                budget = self._next_budget
        packed_out = np.asarray(
            self._blob_fn(layout, budget, fold=fold)(blob_dev))
        n = int(packed_out[0, 0])
        if n > budget:
            # dense-candidate chunk: n is known from the header, so retry
            # the SAME staged blob ONCE at the smallest power-of-two budget
            # that fits (mask and counts are budget-independent, only the
            # padded gather widens); beyond max_budget the host path is
            # cheaper than the widened network pass
            if n > self.max_budget:
                return self._fallback()
            while budget < n:
                budget *= 2
            self._count("overflow_retries")
            packed_out = np.asarray(
                self._blob_fn(layout, budget, fold=fold)(blob_dev))
        if not fold:
            want = self.max_candidates
            while want < min(n + (n >> 2), self.max_budget):
                want *= 2
            with self._lock:
                self._next_budget = want
        win_rows = packed_out[1 + budget:]
        body = packed_out[1:1 + budget]
        P = body.shape[1] - 12
        cand = body[:, 0].astype(np.int64)
        out = body[:, 1:1 + P]
        gcounts = body[:, 1 + P:5 + P].astype(np.int64)
        granks = body[:, 5 + P:9 + P].astype(np.int64)
        ref_count = body[:, 9 + P].astype(np.int64)
        depth_c = body[:, 10 + P].astype(np.int64)
        flags = body[:, 11 + P].astype(np.int64)
        cand = cand[:n]
        flags = flags[:n]
        probs, needs_decode = out[:n, :-1], out[:n, -1] != 0.0
        if self.call_cfg.show_ref:
            needs_decode = np.ones(n, dtype=bool)
        if (flags >= 4).any():
            # depth beyond the AF-threshold table: candidacy itself unsound
            return self._fallback()

        pos_abs = cand.astype(np.int64) + staged.start
        ins_lo = np.searchsorted(indels.ins_pos, pos_abs, side="left")
        ins_hi = np.searchsorted(indels.ins_pos, pos_abs, side="right")
        del_lo = np.searchsorted(indels.del_pos, pos_abs, side="left")
        del_hi = np.searchsorted(indels.del_pos, pos_abs, side="right")
        eff = np.maximum(staged.ref_code[cand], 0)

        def _alt(i):
            return _alt_data_fast(
                indels, int(pos_abs[i]), int(depth_c[i]), int(eff[i]),
                gcounts[i].tolist(), granks[i].tolist(), int(ref_count[i]),
                int(ins_lo[i]), int(ins_hi[i]), int(del_lo[i]),
                int(del_hi[i]), ref_seq, ref_lo)

        host_rows = []
        splice_idx = np.nonzero((flags & 2) != 0)[0]
        if len(splice_idx):
            if host_ctx is None or len(splice_idx) > self.hatch_max:
                return self._fallback()
            # the host backfill mutates the shared image across +-FLANK, so
            # the 1-position mini rebuild is exact only for flagged
            # candidates with no other candidate within 2*FLANK; clustered
            # triggers (and their coupled neighbors) need the full host
            # build's serial emit order -> whole-chunk fallback
            for i in splice_idx:
                if ((i > 0 and cand[i] - cand[i - 1] <= 2 * FLANK)
                        or (i + 1 < n and cand[i + 1] - cand[i] <= 2 * FLANK)):
                    return self._fallback()
            recs = self._hatch_records(host_ctx, ctg_name, cand, splice_idx,
                                       staged.start)
            if recs is None:
                return self._fallback()
            from clair3_rna_tpu.caller.pipeline import call_tensor_records
            host_rows += call_tensor_records(recs, host_ctx["forward"],
                                             self.params, self.cfg,
                                             self.call_cfg)
            needs_decode = needs_decode.copy()
            needs_decode[splice_idx] = False  # handled by the hatch
            self._count("hatch_chunks")
            self._count("hatch_candidates", len(splice_idx))

        renorm_idx = np.nonzero(flags == 1)[0]
        if len(renorm_idx):
            if host_ctx is None:
                return self._fallback()
            wins = None
            if fold and len(win_rows):
                n_ch = self.cfg.channel_size
                w = config.NO_OF_POSITIONS
                wins_all = win_rows.reshape(-1)[:budget * w * n_ch] \
                    .reshape(budget, w, n_ch)
                wins = wins_all[renorm_idx].astype(np.int32)
                self._count("renorm_fold_chunks")
            recs = self._renorm_records(blob_dev, layout, ctg_name, staged,
                                        cand, renorm_idx, depth_c, ref_seq,
                                        ref_lo, _alt, wins=wins)
            from clair3_rna_tpu.caller.pipeline import call_tensor_records
            host_rows += call_tensor_records(recs, host_ctx["forward"],
                                             self.params, self.cfg,
                                             self.call_cfg)
            needs_decode = needs_decode.copy()
            needs_decode[renorm_idx] = False  # handled by the renorm fetch
            self._count("renorm_chunks")
            self._count("renorm_candidates", len(renorm_idx))

        dec_idx = np.nonzero(needs_decode)[0]
        alt_data = [_alt(i) for i in dec_idx]
        from clair3_rna_tpu.pileup.builder import _flanked_ref
        refseqs = [_flanked_ref(ref_seq, ref_lo, int(pos_abs[i]), FLANK)
                   for i in dec_idx]
        rows = decode_batch([ctg_name] * len(dec_idx),
                            [int(pos_abs[i]) + 1 for i in dec_idx],
                            refseqs, alt_data, probs[dec_idx], self.call_cfg)
        if host_rows:
            rows = sorted(rows + host_rows,
                          key=lambda r: int(r.split("\t", 2)[1]))
        return rows, n

    def _hatch_records(self, host_ctx, ctg_name, cand, flagged, start):
        """Targeted host rebuild of isolated splice-flagged candidates.

        Each flagged candidate becomes a 1-position mini ChunkTask through
        build_chunk_tensors: the mini build's +-33 row halo sees exactly the
        reads and coverage runs the full-chunk build would (window content,
        splice backfill and head/tail zeroing are all window-local given the
        caller's isolation precondition: no other candidate within 2*FLANK,
        so no in-place mutation or emitted-marks state from neighbors can
        reach this window), and the record -- including the float64
        renormalization applied downstream by batch_wire -- is bit-identical
        to the host path's. Returns None to request whole-chunk fallback on
        a device/host candidacy disagreement (defensive; should not
        happen)."""
        from clair3_rna_tpu.pileup.chunk import (ChunkTask,
                                                 build_chunk_tensors)
        recs = []
        for i in flagged:
            p = int(cand[i]) + start
            mini = ChunkTask(ctg_name, p, p + 1)
            rr = build_chunk_tensors(
                host_ctx["bam"], host_ctx["fasta"], mini, self.cfg,
                known_positions=host_ctx.get("known_positions"),
                bed_regions=host_ctx.get("bed_regions"))
            rec = next((r for r in rr if r.position == p + 1), None)
            if rec is None:
                return None
            recs.append(rec)
        return recs

    def _renorm_records(self, blob_dev, layout, ctg_name, staged, cand,
                        renorm_idx, depth_c, ref_seq, ref_lo, alt_fn,
                        wins=None):
        """Renorm-flagged candidates as TensorRecords from the DEVICE image.

        `wins` normally arrives pre-sliced from the fold rows of the main
        packed output (with_renorm_windows: deep chunks pay ONE fetch).
        Without it -- a renorm flag on a chunk whose max coverage did not
        predict one, which the depth <= cover invariant should preclude --
        the staged blob is re-read by the windows-fetch jit at the flagged
        centers, returning the same raw negated count windows the fused
        pass gathered (the device image is byte-identical to the host
        builder's, proven by the fused VCF-identity tests); no BAM rebuild
        either way. The reference's float64 scale-then-truncate
        (clair3_rna/utils.py:88-92) is then applied downstream by
        batch_wire/_stack_renormed exactly as on the host path, and the
        records ride the host wire-forward jit, so probabilities are
        bit-identical to the host path's. alt_fn(i) supplies the lazy
        alt_data from the fused pass's own per-candidate outputs."""
        import numpy as np

        from clair3_rna_tpu.pileup.builder import TensorRecord, _flanked_ref

        if wins is None:
            self._count("renorm_window_fetches")
            sel = cand[renorm_idx].astype(np.int32)
            # ONE sel bucket (the candidate budget): each distinct sel shape
            # compiles its own windows graph -- minutes over a tunnel, tens
            # of seconds anywhere -- while the over-fetch it avoids costs
            # ~0.1 s ([1024, 33, 18] f32 on a 19 MB/s downlink). Overflow
            # chunks (budget > max_candidates) are the only second shape.
            bucket = self.max_candidates
            while bucket < len(sel):
                bucket *= 2
            sel_pad = np.full(bucket, staged.width, np.int32)
            sel_pad[:len(sel)] = sel
            wins = np.asarray(self._win_fn(layout)(blob_dev, sel_pad))
            wins = wins[:len(sel)].astype(np.int32)
        recs = []
        for j, i in enumerate(renorm_idx):
            p = int(cand[i]) + staged.start
            recs.append(TensorRecord(
                ctg_name, p + 1, _flanked_ref(ref_seq, ref_lo, p, FLANK),
                wins[j], int(depth_c[i]),
                alt_thunk=(lambda i=int(i): alt_fn(i))))
        return recs
