"""Differential tests for the packed-read wire and its device expansion:

- native C++ extract_packed_native == pure-Python packed_from_events
- ops/tilelet Pallas kernel (interpret) == XLA expansion == numpy oracle
- fused pipeline in packed mode (xla and pallas_interpret): VCF-identical
  to the host tile-builder path

The reference loop being replaced device-side is the per-read CIGAR
expansion of src/create_tensor_pileup.py:485-611.
"""

import random

import numpy as np
import pytest

from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.ops import tilelet as tlt
from clair3_rna_tpu.pileup.packed import (packed_from_events, unpack_codes,
                                          extract_region_packed)


def _random_rows(rng, n_rows, n_tiles, fill=0.5):
    """Synthetic tile-sorted tilelet rows."""
    tile = np.sort(rng.integers(0, n_tiles, n_rows)).astype(np.int32)
    codes = np.full((n_rows, tlt.POS_TILE), tlt.EMPTY, np.uint8)
    mask = rng.random((n_rows, tlt.POS_TILE)) < fill
    codes[mask] = rng.integers(0, 4, int(mask.sum()))
    packed = ((codes[:, 0::2] << 4) | codes[:, 1::2]).astype(np.uint8)
    rank = rng.integers(0, 2**20, n_rows).astype(np.int32)
    strand = rng.integers(0, 2, n_rows).astype(np.int8)
    return packed, tile, rank, strand


def _expand_all(packed, tile, rank, strand, width_pad):
    import jax.numpy as jnp

    oc, orank = tlt.tilelet_oracle(packed, tile, rank, strand, width_pad)

    xc, xr = tlt.tilelet_expand_xla(
        jnp.asarray(packed), jnp.asarray(tile), jnp.asarray(rank),
        jnp.asarray(strand), width_pad)

    b = tlt.bucket_rows(tile, packed, rank, strand, width_pad)
    pc, pr = tlt.tilelet_expand(
        jnp.asarray(b["tl_codes"]), jnp.asarray(b["tl_tile"]),
        jnp.asarray(b["tl_rank"], jnp.float32), jnp.asarray(b["tl_strand"]),
        jnp.asarray(b["visit_tiles"]), jnp.asarray(b["visit_blocks"]),
        jnp.asarray(b["visit_firsts"]), jnp.asarray(b["visit_lasts"]),
        jnp.asarray(b["visit_valid"]), width_pad, interpret=True)
    return (oc, orank), (np.asarray(xc), np.asarray(xr)), \
        (np.asarray(pc), np.asarray(pr))


def _assert_same(name, oracle, got):
    oc, orank = oracle
    gc, grank = got
    assert np.array_equal(oc.astype(np.float64), gc.astype(np.float64)), name
    assert np.array_equal(orank[:4].astype(np.float64),
                          grank[:4].astype(np.float64)), name


CASES = {
    # one tile's rows split across many blocks
    "deep_single_tile": dict(n_rows=150, n_tiles=1, width_pad=512),
    # rows straddling block boundaries between tiles (ROW_BLOCK=32)
    "many_sparse_tiles": dict(n_rows=90, n_tiles=16, width_pad=8192),
    # fewer rows than one block + empty tiles
    "tiny": dict(n_rows=3, n_tiles=8, width_pad=4096),
    "dense": dict(n_rows=400, n_tiles=8, width_pad=4096, fill=0.95),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_tilelet_expand_differential(case):
    p = dict(CASES[case])
    fill = p.pop("fill", 0.5)
    rng = np.random.default_rng(hash(case) % 2**31)
    packed, tile, rank, strand = _random_rows(rng, p["n_rows"], p["n_tiles"],
                                              fill)
    oracle, xla, pallas = _expand_all(packed, tile, rank, strand,
                                      p["width_pad"])
    _assert_same(case + ":xla", oracle, xla)
    _assert_same(case + ":pallas", oracle, pallas)


def test_tilelet_rank_ties_and_empty():
    """Duplicate ranks at one (pos, code) resolve to the minimum; a zero-row
    input still zero-initializes every tile."""
    packed = np.full((2, tlt.HALF), 0xFF, np.uint8)
    packed[0, 0] = 0x0F   # row 0: code 0 at tile offset 0
    packed[1, 0] = 0x0F   # row 1: same position, same code
    tile = np.array([2, 2], np.int32)
    rank = np.array([40, 12], np.int32)
    strand = np.array([0, 1], np.int8)
    oracle, xla, pallas = _expand_all(packed, tile, rank, strand, 2048)
    _assert_same("ties:xla", oracle, xla)
    _assert_same("ties:pallas", oracle, pallas)
    oc, orank = oracle
    p0 = 2 * tlt.POS_TILE
    assert orank[0, p0] == 12.0
    assert oc[0, p0] == 1 and oc[9, p0] == 1  # one per strand

    empty = _expand_all(np.zeros((0, tlt.HALF), np.uint8),
                        np.zeros(0, np.int32), np.zeros(0, np.int32),
                        np.zeros(0, np.int8), 1024)
    for name, (gc, grank) in zip(("oracle", "xla", "pallas"), empty):
        assert gc.sum() == 0, name
        assert (np.asarray(grank)[:4] >= tlt.RANK_INF_F).all(), name


def _simulate(tmp_path, seed=7, contig_len=30_000, depth=25, n_variants=80):
    from clair3_rna_tpu.io.fasta import write_fasta
    from tests import simdata

    rng = random.Random(seed)
    genome = simdata.random_genome(rng, [("chr1", contig_len)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=n_variants)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    mid = contig_len // 2
    simdata.simulate_bam(bam, genome, variants, rng, depth=depth,
                         splice_sites={"chr1": [(mid - 1500, mid + 1500)]})
    return fasta, bam


def test_native_packed_matches_python(tmp_path):
    """C++ extract_packed_native produces byte-identical tilelet rows and
    sparse arrays to packed_from_events(extract_events(...))."""
    from clair3_rna_tpu.pileup.chunk import extract_region_events, open_bam

    _, bam_path = _simulate(tmp_path)
    bam = open_bam(bam_path)
    if not hasattr(bam, "extract_packed"):
        pytest.skip("native library unavailable")
    cfg = PileupConfig()
    for lo, hi in ((0, 30_000), (7_000, 11_000), (29_000, 30_000)):
        ev = extract_region_events(bam, "chr1", lo, hi, cfg)
        py = packed_from_events(ev)
        nat = extract_region_packed(bam, "chr1", lo, hi, cfg)
        assert py.n_base == nat.n_base == len(ev.base_pos)
        for f in ("tl_codes", "tl_tile", "tl_rank", "tl_strand", "tl_hp",
                  "star_pos", "star_strand", "ins_pos", "ins_strand",
                  "ins_rank", "ins_allele", "del_pos", "del_rank", "del_len",
                  "read_start_count", "read_end_count", "skip_fwd_count",
                  "skip_rev_count", "cover_count"):
            assert np.array_equal(getattr(py, f), getattr(nat, f)), (f, lo)
        assert py.ins_seqs == nat.ins_seqs


def test_packed_roundtrip_counts(tmp_path):
    """Tilelet rows carry exactly the base events: unpacking and counting
    them reproduces the event-array base counts."""
    from clair3_rna_tpu.pileup.chunk import extract_region_events, open_bam

    _, bam_path = _simulate(tmp_path, seed=8, contig_len=8_000, depth=15)
    bam = open_bam(bam_path)
    cfg = PileupConfig()
    ev = extract_region_events(bam, "chr1", 0, 8_000, cfg)
    pk = packed_from_events(ev)
    codes = unpack_codes(pk.tl_codes)
    assert int((codes < 4).sum()) == len(ev.base_pos) == pk.n_base
    # per-position ACGT totals match the event scatter
    width = 8_192
    got = np.zeros((4, width), np.int64)
    pos = (pk.tl_tile[:, None].astype(np.int64) * tlt.POS_TILE
           + np.arange(tlt.POS_TILE))
    sel = codes < 4
    np.add.at(got, (codes[sel].astype(np.int64), pos[sel]), 1)
    want = np.zeros((4, width), np.int64)
    np.add.at(want, (ev.base_code.astype(np.int64),
                     ev.base_pos.astype(np.int64)), 1)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("scatter", ["xla", "pallas_interpret"])
def test_fused_packed_vcf_identical(tmp_path, monkeypatch, scatter):
    """Fused pipeline in packed mode == host path, through the full VCF."""
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.models.network import init_params

    fasta, bam = _simulate(tmp_path, seed=9, contig_len=24_000, depth=22,
                           n_variants=70)
    params = init_params(0)

    def _call(out, fused):
        if fused:
            monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
            monkeypatch.setenv("CLAIR3_RNA_TPU_FUSED_MODE", "packed")
            monkeypatch.setenv("CLAIR3_RNA_TPU_FUSED_SCATTER", scatter)
        else:
            for k in ("CLAIR3_RNA_TPU_PILEUP_BACKEND",
                      "CLAIR3_RNA_TPU_FUSED_MODE",
                      "CLAIR3_RNA_TPU_FUSED_SCATTER"):
                monkeypatch.delenv(k, raising=False)
        run_calling(bam, fasta, out, cfg=PileupConfig(batch_size=256),
                    call_cfg=CallConfig(show_ref=True), params=params,
                    contigs=["chr1"], chunk_size=8_000, compress=False,
                    progress=False)
        return [l for l in open(out) if not l.startswith("#")]

    host = _call(str(tmp_path / "host.vcf"), fused=False)
    fused = _call(str(tmp_path / "fused.vcf"), fused=True)
    assert len(host) > 30
    assert fused == host


def test_native_packed_thread_invariance(tmp_path, monkeypatch):
    """extract_packed_native must be byte-identical for any thread count.

    The threaded extractor shards the position axis into tile-aligned
    slices; the merge restores single-thread read-major sparse-event order
    (stable sort by rank) and first-occurrence allele ids. A 300 kb / 25x
    fixture is large enough for tile_thread_count to allow 4 threads."""
    from clair3_rna_tpu.pileup.chunk import open_bam

    _, bam_path = _simulate(tmp_path, seed=11, contig_len=300_000, depth=25,
                            n_variants=600)
    bam = open_bam(bam_path)
    if not hasattr(bam, "extract_packed"):
        pytest.skip("native library unavailable")
    cfg = PileupConfig()

    def grab(n_threads):
        monkeypatch.setenv("CLAIR3_RNA_TPU_NATIVE_THREADS", str(n_threads))
        return bam.extract_packed("chr1", 0, 300_000, min_mq=cfg.min_mq,
                                  min_bq=cfg.min_bq,
                                  exclude_flags=cfg.exclude_flags)

    base = grab(1)
    assert len(base.star_pos) > 0 and len(base.ins_pos) > 0 \
        and len(base.del_pos) > 0
    for n in (2, 4):
        multi = grab(n)
        assert base.n_base == multi.n_base
        for f in ("tl_codes", "tl_tile", "tl_rank", "tl_strand", "tl_hp",
                  "star_pos", "star_strand", "star_hp", "ins_pos",
                  "ins_strand", "ins_rank", "ins_hp", "ins_allele",
                  "del_pos", "del_strand", "del_rank", "del_hp", "del_len",
                  "read_start_count", "read_end_count", "skip_fwd_count",
                  "skip_rev_count", "cover_count"):
            assert np.array_equal(getattr(base, f), getattr(multi, f)), (f, n)
        assert base.ins_seqs == multi.ins_seqs, n


# --- v2 wire (2-bit crumbs + validity bitmap) --------------------------------

def test_v2_pack_roundtrip():
    rng = np.random.default_rng(7)
    packed, tile, rank, strand = _random_rows(rng, 200, 8, fill=0.6)
    codes2, valid = tlt.nibble_to_v2(packed)
    assert codes2.shape == (200, tlt.V2_HALF)
    assert valid.shape == (200, tlt.V2_VBYTES)
    # 25% fewer tilelet bytes than the nibble arena
    assert codes2.nbytes + valid.nbytes == packed.nbytes * 3 // 4
    assert np.array_equal(tlt.unpack_v2(codes2, valid),
                          unpack_codes(packed))


@pytest.mark.parametrize("fill", [0.15, 0.6, 0.97])
def test_v2_expansion_differential(fill):
    """v2 XLA expansion and v2 Pallas kernel (interpret) both equal the
    nibble oracle on random arenas with holes at every density (holes model
    deletion errors / bq-masked bases -- the reason a fixed-layout wire
    needs the validity bit)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n_tiles = 6
    width_pad = n_tiles * tlt.POS_TILE
    packed, tile, rank, strand = _random_rows(rng, 300, n_tiles, fill=fill)
    oc, orank = tlt.tilelet_oracle(packed, tile, rank, strand, width_pad)

    codes2, valid = tlt.nibble_to_v2(packed)
    xc, xr = tlt.tilelet_expand_xla(
        jnp.asarray(codes2), jnp.asarray(tile), jnp.asarray(rank),
        jnp.asarray(strand), width_pad, tl_valid=jnp.asarray(valid),
        wire="v2")
    _assert_same("v2 xla", (oc, orank), (np.asarray(xc), np.asarray(xr)))

    b = tlt.bucket_rows(tile, packed, rank, strand, width_pad)
    c2p, vp = tlt.nibble_to_v2(b["tl_codes"])
    pc, pr = tlt.tilelet_expand_v2(
        jnp.asarray(c2p), jnp.asarray(vp), jnp.asarray(b["tl_tile"]),
        jnp.asarray(b["tl_rank"], jnp.float32),
        jnp.asarray(b["tl_strand"]),
        jnp.asarray(b["visit_tiles"]), jnp.asarray(b["visit_blocks"]),
        jnp.asarray(b["visit_firsts"]), jnp.asarray(b["visit_lasts"]),
        jnp.asarray(b["visit_valid"]), width_pad, interpret=True)
    _assert_same("v2 pallas", (oc, orank), (np.asarray(pc), np.asarray(pr)))


def test_v2_phased_expansion_differential():
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    n_tiles = 4
    width_pad = n_tiles * tlt.POS_TILE
    packed, tile, rank, strand = _random_rows(rng, 160, n_tiles, fill=0.5)
    hp = rng.integers(0, 3, 160).astype(np.int8)
    oc, orank = tlt.tilelet_oracle(packed, tile, rank, strand, width_pad,
                                   tl_hp=hp, phased=True)
    codes2, valid = tlt.nibble_to_v2(packed)
    xc, xr = tlt.tilelet_expand_xla(
        jnp.asarray(codes2), jnp.asarray(tile), jnp.asarray(rank),
        jnp.asarray(strand), width_pad, tl_hp=jnp.asarray(hp), phased=True,
        tl_valid=jnp.asarray(valid), wire="v2")
    assert np.array_equal(oc.astype(np.float64),
                          np.asarray(xc).astype(np.float64))

    b = tlt.bucket_rows(tile, packed, rank, strand, width_pad, tl_hp=hp)
    c2p, vp = tlt.nibble_to_v2(b["tl_codes"])
    pc, pr = tlt.tilelet_expand_v2(
        jnp.asarray(c2p), jnp.asarray(vp), jnp.asarray(b["tl_tile"]),
        jnp.asarray(b["tl_rank"], jnp.float32),
        jnp.asarray(b["tl_strand"]),
        jnp.asarray(b["visit_tiles"]), jnp.asarray(b["visit_blocks"]),
        jnp.asarray(b["visit_firsts"]), jnp.asarray(b["visit_lasts"]),
        jnp.asarray(b["visit_valid"]), width_pad, interpret=True,
        tl_hp=jnp.asarray(b["tl_hp"]), phased=True)
    assert np.array_equal(oc.astype(np.float64),
                          np.asarray(pc).astype(np.float64))
    assert np.array_equal(orank[:4].astype(np.float64),
                          np.asarray(pr)[:4].astype(np.float64))


@pytest.mark.parametrize("scatter", ["xla", "pallas_interpret"])
def test_fused_v2_wire_vcf_identical(tmp_path, monkeypatch, scatter):
    """End-to-end fused calling over the v2 wire: VCF-identical to the
    host tile-builder path (same contract as the nibble wire)."""
    from tests.test_fused_pileup import _call, _dataset
    from clair3_rna_tpu.models.network import init_params

    fasta, bam = _dataset(tmp_path, seed=47, contig_len=30_000,
                          n_variants=100, depth=30)
    params = init_params(0)
    monkeypatch.setenv("CLAIR3_RNA_TPU_FUSED_SCATTER", scatter)
    host = _call(bam, fasta, str(tmp_path / "host.vcf"), params, False,
                 monkeypatch, fused=False)
    monkeypatch.setenv("CLAIR3_RNA_TPU_TILELET_WIRE", "v2")
    fused = _call(bam, fasta, str(tmp_path / "fused.vcf"), params, False,
                  monkeypatch, fused=True)
    assert len(host) > 30
    assert fused == host
