"""Fused TPU-resident pileup path (ops/fused_pileup): VCF-identical to the
host tile-builder path, including the chunk-level fallbacks."""

import os
import random

import numpy as np
import pytest

from clair3_rna_tpu.caller.decode import CallConfig
from clair3_rna_tpu.caller.pipeline import run_calling
from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.io.fasta import write_fasta
from clair3_rna_tpu.models.network import init_params
from tests import simdata


def _dataset(tmp_path, seed=41, contig_len=60_000, n_variants=220, depth=30,
             splice=True):
    rng = random.Random(seed)
    genome = simdata.random_genome(rng, [("chr1", contig_len)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=n_variants)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    mid = contig_len // 2
    simdata.simulate_bam(
        bam, genome, variants, rng, depth=depth,
        splice_sites={"chr1": [(mid - 1500, mid + 1500)]} if splice else None)
    return fasta, bam


def _call(bam, fasta, out, params, show_ref, monkeypatch, fused):
    if fused:
        monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
    else:
        monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", raising=False)
    run_calling(bam, fasta, out, cfg=PileupConfig(batch_size=256),
                call_cfg=CallConfig(show_ref=show_ref), params=params,
                contigs=["chr1"], chunk_size=20_000, compress=False,
                progress=False)
    return [l for l in open(out) if not l.startswith("#")]


@pytest.mark.parametrize("show_ref", [False, True])
def test_fused_path_vcf_identical(tmp_path, monkeypatch, show_ref):
    fasta, bam = _dataset(tmp_path)
    params = init_params(0)
    host = _call(bam, fasta, str(tmp_path / "host.vcf"), params, show_ref,
                 monkeypatch, fused=False)
    fused = _call(bam, fasta, str(tmp_path / "fused.vcf"), params, show_ref,
                  monkeypatch, fused=True)
    assert len(host) > 50
    assert fused == host


def _spy_callers(monkeypatch):
    """Capture FusedChunkCaller instances created inside run_calling, so
    tests can assert which escape path (renorm fetch / splice hatch /
    whole-chunk fallback) actually engaged."""
    import clair3_rna_tpu.ops.fused_pileup as fp

    created = []
    orig = fp.FusedChunkCaller

    class Spy(orig):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            created.append(self)

    monkeypatch.setattr(fp, "FusedChunkCaller", Spy)
    return created


@pytest.mark.parametrize("case", ["mixed", "uniform_deep"])
def test_fused_high_depth_renorm_identical(tmp_path, monkeypatch, case):
    """depth > 1.5*max_depth needs the reference's float64 renormalization
    (clair3_rna/utils.py:88-92): flagged candidates' windows are fetched
    from the staged device image and renormalized host-side while the chunk
    stays fused, with zero whole-chunk fallbacks.

    - "mixed": a deep transcript island on a normal-depth background.
    - "uniform_deep": a uniformly renorm-deep chunk -- RNA's
      high-expression regime; every candidate rides the renorm fetch."""
    params = init_params(0)
    if case == "uniform_deep":
        fasta, bam = _dataset(tmp_path, seed=42, contig_len=4_000,
                              n_variants=12, depth=260, splice=False)
    else:
        rng = random.Random(45)
        genome = simdata.random_genome(rng, [("chr1", 8_000)])
        variants = simdata.plant_variants(rng, genome, n_per_contig=24)
        fasta = str(tmp_path / "ref.fa")
        bam = str(tmp_path / "reads.bam")
        write_fasta(fasta, genome)
        simdata.simulate_bam(bam, genome, variants, rng, depth=30,
                             extra_regions={"chr1": [(3_000, 4_500, 230)]})
    host = _call(bam, fasta, str(tmp_path / "host.vcf"), params, True,
                 monkeypatch, fused=False)
    created = _spy_callers(monkeypatch)
    fused = _call(bam, fasta, str(tmp_path / "fused.vcf"), params, True,
                  monkeypatch, fused=True)
    assert len(host) > 5
    assert fused == host
    assert sum(c.renorm_candidates for c in created) > 0
    assert sum(c.fallback_chunks for c in created) == 0
    assert sum(c.hatch_candidates for c in created) == 0  # splice-only now
    # one-fetch-per-chunk invariant: the renorm windows rode the fold rows
    # of the main packed output, never a second windows-fetch round trip
    assert sum(c.renorm_fold_chunks for c in created) > 0
    assert sum(c.renorm_window_fetches for c in created) == 0


@pytest.mark.parametrize("depth", [220, 800, 2000])
def test_fused_renorm_depth_sweep_identical(tmp_path, monkeypatch, depth):
    """Renorm-fetch differential over the depth range the AF-threshold
    table covers (217..4095): fused output stays VCF-identical to the host
    float64 path at each depth, with the renorm path (not a fallback)
    engaged. Depths past the table bound are covered by the flag-4
    fallback instead (the simulator's mid-contig coverage pile-up reaches
    ~1.5x nominal depth, so the sweep tops out at nominal 2000 ~ actual
    3000)."""
    fasta, bam = _dataset(tmp_path, seed=46, contig_len=1_200, n_variants=5,
                          depth=depth, splice=False)
    params = init_params(0)
    host = _call(bam, fasta, str(tmp_path / "host.vcf"), params, True,
                 monkeypatch, fused=False)
    created = _spy_callers(monkeypatch)
    fused = _call(bam, fasta, str(tmp_path / "fused.vcf"), params, True,
                  monkeypatch, fused=True)
    assert len(host) > 2
    assert fused == host
    assert sum(c.renorm_candidates for c in created) > 0
    assert sum(c.fallback_chunks for c in created) == 0


def test_fused_chunk_caller_direct(tmp_path, monkeypatch):
    """Direct FusedChunkCaller exercise: n_candidates matches the host
    builder's record count on the same region."""
    from clair3_rna_tpu.ops.fused_pileup import FusedChunkCaller
    from clair3_rna_tpu.io.fasta import FastaFile
    from clair3_rna_tpu.pileup.chunk import (ChunkTask, build_chunk_tensors,
                                             extract_region_events, open_bam,
                                             ref_codes_from)

    fasta_path, bam_path = _dataset(tmp_path, seed=43, contig_len=20_000,
                                    n_variants=60)
    fasta = FastaFile(fasta_path)
    bam = open_bam(bam_path)
    cfg = PileupConfig(batch_size=256)
    call_cfg = CallConfig(show_ref=True)
    params = init_params(0)
    caller = FusedChunkCaller(params, cfg, call_cfg)

    task = ChunkTask("chr1", 0, 20_000)
    records = build_chunk_tensors(bam, fasta, task, cfg)
    ref_seq = fasta.fetch("chr1", 0, 20_000)
    codes = ref_codes_from(ref_seq)
    events = extract_region_events(bam, "chr1", 0, 20_000, cfg)
    out = caller.call_chunk(events, codes, "chr1", ref_seq, 0, 0, 20_000)
    assert out is not None
    rows, n = out
    assert n == len(records)


def _call_kw(bam, fasta, out, params, monkeypatch, fused, cfg=None, **kw):
    if fused:
        monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
    else:
        monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", raising=False)
    run_calling(bam, fasta, out, cfg=cfg or PileupConfig(batch_size=256),
                call_cfg=CallConfig(show_ref=True), params=params,
                contigs=["chr1"], chunk_size=20_000, compress=False,
                progress=False, **kw)
    return [l for l in open(out) if not l.startswith("#")]


def test_fused_phased_vcf_identical(tmp_path, monkeypatch):
    """Phased 30-channel mode (the second calling pass over an HP-tagged
    BAM, src/create_tensor_pileup.py:181-217) through the fused packed path:
    VCF-identical to the host phased path."""
    rng = random.Random(53)
    genome = simdata.random_genome(rng, [("chr1", 40_000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=140,
                                      het_genotypes=((0, 1), (1, 0)))
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    from clair3_rna_tpu.io.fasta import write_fasta
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=28, with_hp=True)
    cfg = PileupConfig(batch_size=256, phased=True)
    params = init_params(0, phased=True)

    def _call(out, fused):
        if fused:
            monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
        else:
            monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND",
                               raising=False)
        run_calling(bam, fasta, out, cfg=cfg,
                    call_cfg=CallConfig(show_ref=True), params=params,
                    contigs=["chr1"], chunk_size=15_000, compress=False,
                    progress=False)
        return [l for l in open(out) if not l.startswith("#")]

    host = _call(str(tmp_path / "host.vcf"), fused=False)
    fused = _call(str(tmp_path / "fused.vcf"), fused=True)
    assert len(host) > 30
    assert fused == host


def test_fused_phased_high_depth_renorm_identical(tmp_path, monkeypatch):
    """Renormalization in phased 30-channel mode: a uniformly renorm-deep
    phased chunk stays fused, flagged candidates ride the device-window
    fetch + host float64 scale + phased wire forward, and the VCF stays
    identical with zero whole-chunk fallbacks."""
    rng = random.Random(57)
    genome = simdata.random_genome(rng, [("chr1", 3_000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=10,
                                      het_genotypes=((0, 1), (1, 0)))
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    from clair3_rna_tpu.io.fasta import write_fasta
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=250, with_hp=True)
    cfg = PileupConfig(batch_size=256, phased=True)
    params = init_params(0, phased=True)

    def _run(out, fused):
        if fused:
            monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
        else:
            monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND",
                               raising=False)
        run_calling(bam, fasta, out, cfg=cfg,
                    call_cfg=CallConfig(show_ref=True), params=params,
                    contigs=["chr1"], chunk_size=3_000, compress=False,
                    progress=False)
        return [l for l in open(out) if not l.startswith("#")]

    host = _run(str(tmp_path / "host.vcf"), fused=False)
    created = _spy_callers(monkeypatch)
    fused = _run(str(tmp_path / "fused.vcf"), fused=True)
    assert len(host) > 3
    assert fused == host
    assert sum(c.renorm_candidates for c in created) > 0
    assert sum(c.fallback_chunks for c in created) == 0


@pytest.mark.parametrize("mode", ["bed", "known", "splice", "head_tail",
                                  "splice_head_tail"])
def test_fused_extended_modes_vcf_identical(tmp_path, monkeypatch, mode):
    """The previously host-gated modes (BED restriction, -G known sites,
    splice padding, head/tail) run through the fused path and stay
    VCF-identical; candidates that could trigger the splice backfill are
    rebuilt host-side via the per-candidate hatch
    (src/create_tensor_pileup.py:551-554,573-593,614-637)."""
    fasta, bam = _dataset(tmp_path, seed=47)
    params = init_params(0)
    created = _spy_callers(monkeypatch)
    cfg = PileupConfig(batch_size=256)
    kw = {}
    if mode == "bed":
        from clair3_rna_tpu.io.bed import BedRegions
        kw["bed_regions"] = BedRegions(
            {"chr1": [(5_000, 18_000), (25_000, 26_500), (40_000, 55_000)]})
    elif mode == "known":
        kw["known_vcf_positions"] = {
            "chr1": list(range(6_000, 54_000, 700))}
    elif mode == "splice":
        cfg = PileupConfig(batch_size=256, enable_splice_padding=True)
    elif mode == "head_tail":
        cfg = PileupConfig(batch_size=256, enable_head_tail=True)
    else:
        cfg = PileupConfig(batch_size=256, enable_splice_padding=True,
                           enable_head_tail=True)
    host = _call_kw(bam, fasta, str(tmp_path / "host.vcf"), params,
                    monkeypatch, fused=False, cfg=cfg, **kw)
    fused = _call_kw(bam, fasta, str(tmp_path / "fused.vcf"), params,
                     monkeypatch, fused=True, cfg=cfg, **kw)
    assert len(host) > 10
    assert fused == host
    if mode in ("splice", "splice_head_tail"):
        # the dataset's splice junction flags trigger-superset candidates;
        # isolated ones ride the hatch, clustered ones force a whole-chunk
        # fallback -- either way the escape machinery must have engaged
        # (test_fused_splice_isolated_hatch_identical pins the hatch path
        # specifically)
        assert sum(c.hatch_candidates + c.fallback_chunks
                   for c in created) > 0


def test_fused_splice_isolated_hatch_identical(tmp_path, monkeypatch):
    """An ISOLATED splice-trigger candidate (no other candidate within
    2*FLANK) rides the per-candidate mini-rebuild hatch while the rest of
    the chunk stays fused, VCF-identical."""
    rng = random.Random(63)
    genome = simdata.random_genome(rng, [("chr1", 6_000)])
    mid = 3_000
    seq = genome["chr1"]
    # one candidate inside FLANK of the intron start; the others far away
    variants = {"chr1": [
        simdata.Variant(p, seq[p],
                        next(b for b in "ACGT" if b != seq[p]), (0, 1))
        for p in (500, 1_500, mid - 8, 4_600)]}
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    # a 200bp intron is short enough for reads to span entirely, producing
    # real CIGAR-N ref-skips (the simulator only splices fully-spanning
    # reads); skip count * 5 > depth flags the mid-8 candidate. Zero error
    # rate keeps noise candidates from landing inside the 2*FLANK isolation
    # radius (which would legitimately force a whole-chunk fallback).
    simdata.simulate_bam(bam, genome, variants, rng, depth=30,
                         error_rate=0.0,
                         splice_sites={"chr1": [(mid, mid + 200)]})
    cfg = PileupConfig(batch_size=256, enable_splice_padding=True)
    params = init_params(0)
    host = _call_kw(bam, fasta, str(tmp_path / "host.vcf"), params,
                    monkeypatch, fused=False, cfg=cfg)
    created = _spy_callers(monkeypatch)
    fused = _call_kw(bam, fasta, str(tmp_path / "fused.vcf"), params,
                     monkeypatch, fused=True, cfg=cfg)
    assert len(host) >= 3
    assert fused == host
    assert sum(c.hatch_candidates for c in created) > 0
    assert sum(c.fallback_chunks for c in created) == 0


def test_fused_splice_cluster_falls_back_identical(tmp_path, monkeypatch):
    """Clustered splice-trigger candidates (another candidate within
    2*FLANK of a flagged one) must force a whole-chunk host fallback, not
    the per-candidate hatch: the host builder's in-place backfill mutates
    neighbors' windows and serializes their emit order
    (pileup/builder.py:537-622), which a 1-position mini rebuild cannot
    replay. The fused output must still be VCF-identical."""
    rng = random.Random(61)
    genome = simdata.random_genome(rng, [("chr1", 6_000)])
    mid = 3_000
    # candidates straddling the junction edge, 22bp apart (< 2*FLANK = 66):
    # the one inside FLANK of the intron start gets splice-flagged, its
    # neighbors are coupled through the shared-image backfill
    seq = genome["chr1"]
    variants = {"chr1": [
        simdata.Variant(p, seq[p],
                        next(b for b in "ACGT" if b != seq[p]), (0, 1))
        for p in (mid - 52, mid - 30, mid - 8)]}
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    # short intron -> reads span it entirely and emit real CIGAR-N skips
    simdata.simulate_bam(bam, genome, variants, rng, depth=30,
                         splice_sites={"chr1": [(mid, mid + 200)]})
    cfg = PileupConfig(batch_size=256, enable_splice_padding=True)
    params = init_params(0)
    host = _call_kw(bam, fasta, str(tmp_path / "host.vcf"), params,
                    monkeypatch, fused=False, cfg=cfg)
    created = _spy_callers(monkeypatch)
    fused = _call_kw(bam, fasta, str(tmp_path / "fused.vcf"), params,
                     monkeypatch, fused=True, cfg=cfg)
    assert len(host) >= 3
    assert fused == host
    # the clustered chunk fell back wholesale; nothing rode the mini-rebuild
    assert sum(c.fallback_chunks for c in created) > 0
    assert sum(c.hatch_candidates for c in created) == 0


def test_fused_overflow_retry_identical(tmp_path, monkeypatch):
    """A chunk with more candidates than the padded budget (1024) retries
    with a doubled budget instead of falling back to the host path; -G
    known-site grids produce exactly such dense chunks."""
    fasta, bam = _dataset(tmp_path, seed=49, contig_len=20_000, n_variants=60,
                          splice=False)
    params = init_params(0)
    known = {"chr1": list(range(200, 19_800, 15))}  # ~1300 candidate sites
    host = _call_kw(bam, fasta, str(tmp_path / "host.vcf"), params,
                    monkeypatch, fused=False, known_vcf_positions=known)
    created = _spy_callers(monkeypatch)
    fused = _call_kw(bam, fasta, str(tmp_path / "fused.vcf"), params,
                     monkeypatch, fused=True, known_vcf_positions=known)
    assert len(host) > 1000
    assert fused == host
    assert sum(c.overflow_retries for c in created) > 0


def test_fused_with_manifest_resume(tmp_path, monkeypatch):
    """Fused-path rows persist in contig manifests and restore on --resume,
    matching a fresh host-path run."""
    import json
    import os

    fasta, bam = _dataset(tmp_path, seed=44, contig_len=30_000, n_variants=90)
    params = init_params(0)
    mdir = str(tmp_path / "manifests")
    monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
    out1 = str(tmp_path / "first.vcf")
    run_calling(bam, fasta, out1, cfg=PileupConfig(batch_size=256),
                call_cfg=CallConfig(show_ref=True), params=params,
                contigs=["chr1"], chunk_size=10_000, compress=False,
                progress=False, manifest_dir=mdir)
    assert os.path.exists(os.path.join(mdir, "chr1.done.json"))
    rows_manifest = json.load(open(os.path.join(mdir, "chr1.done.json")))
    assert rows_manifest["rows"]

    # resume run restores from the manifest (no rebuild) and matches
    out2 = str(tmp_path / "resumed.vcf")
    run_calling(bam, fasta, out2, cfg=PileupConfig(batch_size=256),
                call_cfg=CallConfig(show_ref=True), params=params,
                contigs=["chr1"], chunk_size=10_000, compress=False,
                progress=False, manifest_dir=mdir, resume=True)
    a = [l for l in open(out1) if not l.startswith("#")]
    b = [l for l in open(out2) if not l.startswith("#")]
    assert a == b and len(a) > 20


def test_pack_unpack_wire_roundtrip():
    """The one-blob-per-chunk wire (pack_wire/unpack_wire) must be exact for
    every dtype the staged arrays use, including 4-byte alignment padding
    between segments."""
    import jax

    from clair3_rna_tpu.ops.fused_pileup import pack_wire, unpack_wire

    rng = np.random.RandomState(3)
    args = [
        rng.randint(0, 256, (7, 128)).astype(np.uint8),      # tl_codes-like
        rng.randint(-2**31, 2**31 - 1, 33).astype(np.int32),
        rng.randint(-128, 128, 11).astype(np.int8),          # odd length ->
        rng.randint(0, 2**24, (5, 4)).astype(np.int32),      # padded before
        np.asarray([3, 9], np.int32),                        # this segment
    ]
    blob, layout = pack_wire(args)
    assert blob.dtype == np.uint8
    out = jax.jit(lambda b: tuple(unpack_wire(b, layout)))(blob)
    for want, got in zip(args, out):
        assert want.dtype.name == np.asarray(got).dtype.name
        np.testing.assert_array_equal(want, np.asarray(got))
    # layouts are hashable (used as the jit-wrapper cache key)
    assert hash(layout) == hash(pack_wire(args)[1])
