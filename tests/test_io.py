"""BGZF / FASTA / BAM round-trip tests."""

import random

from clair3_rna_tpu.io.bgzf import bgzf_compress, bgzf_decompress, BgzfReader, BgzfWriter
from clair3_rna_tpu.io.fasta import FastaFile, write_fasta
from clair3_rna_tpu.io.bam import BamReader, BamRecord, BamWriter, CIGAR_M, CIGAR_N
from tests import simdata


def test_bgzf_roundtrip(tmp_path):
    rng = random.Random(0)
    data = bytes(rng.randrange(256) for _ in range(200_000))
    assert bgzf_decompress(bgzf_compress(data)) == data

    path = tmp_path / "x.bgz"
    with BgzfWriter(str(path)) as w:
        w.write(data)
    with open(path, "rb") as f:
        assert bgzf_decompress(f.read()) == data
    r = BgzfReader(str(path))
    assert r.read(100) == data[:100]
    assert r.read(len(data)) == data[100:]


def test_fasta_fetch(tmp_path):
    genome = {"chr1": "ACGTACGTGGGTTTACGATCG" * 10, "chr2": "TTTTACGT" * 5}
    path = write_fasta(str(tmp_path / "ref.fa"), genome, line_width=13)
    with FastaFile(path) as fa:
        assert fa.contigs == ["chr1", "chr2"]
        assert fa.contig_length("chr1") == 210
        assert fa.fetch("chr1", 0, 10) == genome["chr1"][:10]
        assert fa.fetch("chr1", 25, 90) == genome["chr1"][25:90]
        assert fa.fetch("chr2", 0) == genome["chr2"]
        assert fa.fetch("chr2", 30, 999) == genome["chr2"][30:]
        assert fa.fetch("chr1", -5, 3) == genome["chr1"][:3]


def test_bam_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    recs = [
        BamRecord("r1", 0, 0, 5, 60, [(CIGAR_M, 8)], "ACGTACGT",
                  bytes([30] * 8), {"HP": 1, "XS": "note"}),
        BamRecord("r2", 16, 0, 10, 42, [(CIGAR_M, 4), (CIGAR_N, 100), (CIGAR_M, 4)],
                  "GGGGTTTT", bytes([20] * 8), {}),
    ]
    with BamWriter(path, [("chr1", 1000)]) as w:
        for r in recs:
            w.write(r)
    reader = BamReader(path)
    assert reader.references == ["chr1"]
    assert reader.reference_lengths["chr1"] == 1000
    got = list(reader)
    assert len(got) == 2
    assert got[0].name == "r1" and got[0].seq == "ACGTACGT"
    assert got[0].tags == {"HP": 1, "XS": "note"}
    assert got[1].cigar == [(CIGAR_M, 4), (CIGAR_N, 100), (CIGAR_M, 4)]
    assert got[1].is_reverse
    assert got[1].reference_end == 10 + 4 + 100 + 4

    fetched = list(reader.fetch("chr1", 0, 9))
    assert [r.name for r in fetched] == ["r1"]
    fetched = list(reader.fetch("chr1", 0, 9, min_mapq=61))
    assert fetched == []


def test_simulated_dataset(tmp_path):
    fasta, bam, genome, variants = simdata.make_dataset(tmp_path, seed=3)
    reader = BamReader(bam)
    recs = list(reader)
    assert len(recs) > 100
    # reads are coordinate sorted
    assert all(a.pos <= b.pos for a, b in zip(recs, recs[1:]))
    # read sequences match the reference where no variant/error was injected:
    # spot-check that pileup majority at a hom SNP is the alt base
    with FastaFile(fasta) as fa:
        ref_seq = fa.fetch("chr1")
    hom_snps = [v for v in variants["chr1"] if v.is_snp and v.genotype == (1, 1)]
    assert hom_snps
    v = hom_snps[0]
    from clair3_rna_tpu.pileup.text import pileup_columns
    cols = pileup_columns(recs, v.pos, v.pos + 1)
    assert cols, "no coverage at planted SNP"
    bases = [c for c in cols[0].bases.upper() if c in "ACGT"]
    assert bases.count(v.alt) > len(bases) * 0.7
    assert ref_seq[v.pos] == v.ref
