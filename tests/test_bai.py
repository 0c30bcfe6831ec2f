"""BAI index: build, save/load round-trip, indexed fetch parity, and the
bounded-I/O guarantee (fetch cost scales with region, not file size).

The reference relies on htslib for all of this (samtools index +
`mpileup -r ctg:start-end`, src/create_tensor_pileup.py:438-451); these tests
pin our in-framework equivalent to the same semantics.
"""

import random

import pytest

from clair3_rna_tpu.io.bai import BaiIndex, build_index, reg2bin, reg2bins
from clair3_rna_tpu.io.bam import BamReader
from clair3_rna_tpu.io.fasta import write_fasta
from tests import simdata


def _make_bam(tmp_path, contigs, depth=12, n_per_contig=20, seed=7):
    rng = random.Random(seed)
    genome = simdata.random_genome(rng, contigs)
    variants = simdata.plant_variants(rng, genome, n_per_contig=n_per_contig)
    fasta_path = str(tmp_path / "ref.fa")
    bam_path = str(tmp_path / "reads.bam")
    write_fasta(fasta_path, genome)
    simdata.simulate_bam(bam_path, genome, variants, rng, depth=depth)
    return fasta_path, bam_path


def test_reg2bin_levels():
    # leaves are 16 kb; bin 4681 is the first leaf
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert reg2bin(0, (1 << 14) + 1) == 585  # spans two leaves -> level up
    assert reg2bin(0, 1 << 29) == 0
    # query bins always include every level covering the region
    bins = reg2bins(20_000, 40_000)
    assert 0 in bins and 4682 in bins and 4683 in bins and 585 in bins


def test_index_roundtrip_and_fetch_parity(tmp_path):
    _, bam_path = _make_bam(tmp_path, [("chr1", 60_000), ("chr2", 45_000)])
    index = build_index(bam_path, prefer_native=False)
    loaded = BaiIndex.load(bam_path + ".bai")
    assert [sorted(b) for b in loaded.bins] == [sorted(b) for b in index.bins]
    assert loaded.linear == index.linear

    # linear-scan oracle: no index, full streaming iteration
    plain = BamReader(bam_path, load_index=False)
    indexed = BamReader(bam_path)
    assert indexed.has_index
    for ctg, lo, hi in [("chr1", 0, 60_000), ("chr1", 20_000, 21_000),
                        ("chr2", 0, 500), ("chr2", 44_000, 45_000),
                        ("chr1", 59_990, 60_000)]:
        want = [(r.name, r.pos) for r in plain
                if r.ref_id == plain.ref_index[ctg]
                and r.pos < hi and r.reference_end > lo]
        got = [(r.name, r.pos) for r in indexed.fetch(ctg, lo, hi)]
        assert got == want, (ctg, lo, hi)


def test_fetch_filters_match_linear_reader(tmp_path):
    _, bam_path = _make_bam(tmp_path, [("chr1", 30_000)])
    build_index(bam_path)
    indexed = BamReader(bam_path)
    plain = BamReader(bam_path, load_index=False)
    kw = dict(exclude_flags=2316, min_mapq=5)
    got = [r.name for r in indexed.fetch("chr1", 5_000, 12_000, **kw)]
    want = [r.name for r in plain.fetch("chr1", 5_000, 12_000, **kw)]
    assert got == want and len(got) > 0


def test_in_memory_index_built_on_first_fetch(tmp_path):
    _, bam_path = _make_bam(tmp_path, [("chr1", 30_000)])
    reader = BamReader(bam_path)  # no .bai on disk
    assert not reader.has_index
    names = [r.name for r in reader.fetch("chr1", 1_000, 2_000)]
    assert reader.has_index  # built lazily, once
    again = [r.name for r in reader.fetch("chr1", 1_000, 2_000)]
    assert names == again


def test_indexed_fetch_reads_bounded_bytes(tmp_path):
    """The offset-access proof: a small region fetch must read only the
    blocks covering that region, far less than the file."""
    import os

    _, bam_path = _make_bam(tmp_path, [("chr1", 400_000)], depth=25,
                            n_per_contig=200)
    build_index(bam_path)
    file_size = os.path.getsize(bam_path)

    counts = {"bytes": 0}
    real_open = open

    class CountingFile:
        def __init__(self, fp):
            self._fp = fp

        def read(self, n=-1):
            data = self._fp.read(n)
            counts["bytes"] += len(data)
            return data

        def __getattr__(self, name):
            return getattr(self._fp, name)

    def counting_open(path, mode="r", *a, **k):
        fp = real_open(path, mode, *a, **k)
        return CountingFile(fp) if "b" in mode else fp

    reader = BamReader(bam_path)
    import clair3_rna_tpu.io.bgzf as bgzf_mod
    try:
        # shadow builtins `open` for the bgzf module only
        bgzf_mod.open = counting_open
        n = sum(1 for _ in reader.fetch("chr1", 200_000, 201_000))
    finally:
        del bgzf_mod.open
    assert n > 0
    # a 1 kb window of a 400 kb contig: compressed bytes touched must be a
    # small fraction of the file
    assert counts["bytes"] < file_size / 10, (counts["bytes"], file_size)


def test_index_rejects_unsorted(tmp_path):
    from clair3_rna_tpu.io.bam import BamRecord, BamWriter, CIGAR_M

    path = str(tmp_path / "unsorted.bam")
    with BamWriter(path, [("chr1", 1000)]) as w:
        w.write(BamRecord("r1", 0, 0, 500, 60, [(CIGAR_M, 8)], "ACGTACGT",
                          bytes([30] * 8)))
        w.write(BamRecord("r2", 0, 0, 5, 60, [(CIGAR_M, 8)], "ACGTACGT",
                          bytes([30] * 8)))
    with pytest.raises(ValueError, match="not coordinate-sorted"):
        build_index(path)


def test_native_index_builder_matches_python(tmp_path):
    """The C++ bam_build_index and the Python IndexBuilder must yield
    equivalent indexes: same fetch results for every probed region."""
    from clair3_rna_tpu.native import get_library

    if get_library() is None:
        pytest.skip("native library unavailable")
    _, bam_path = _make_bam(tmp_path, [("chr1", 80_000), ("chr2", 30_000)],
                            depth=15, n_per_contig=40)
    py_bai = str(tmp_path / "py.bai")
    nat_bai = str(tmp_path / "nat.bai")
    build_index(bam_path, py_bai, prefer_native=False)
    got = build_index(bam_path, nat_bai, prefer_native=True)
    assert isinstance(got, BaiIndex)

    py_idx = BaiIndex.load(py_bai)
    nat_idx = BaiIndex.load(nat_bai)
    reader = BamReader(bam_path, load_index=False)
    for ctg, lo, hi in [("chr1", 0, 80_000), ("chr1", 40_000, 41_000),
                        ("chr2", 10_000, 10_500), ("chr2", 0, 30_000)]:
        ref_id = reader.ref_index[ctg]

        def names(idx):
            out = []
            for vbeg, vend in idx.query(ref_id, lo, hi):
                for rec, voff in reader._records_from(vbeg):
                    if rec.ref_id != ref_id or rec.pos >= hi:
                        break
                    if rec.reference_end > lo:
                        out.append((rec.name, rec.pos))
                    if voff >= vend:
                        break
            return out

        assert names(py_idx) == names(nat_idx), (ctg, lo, hi)


def test_native_indexed_tile_matches_full_load(tmp_path):
    """NativeBam in BAI mode (bounded memory) must produce the identical
    dense tile as whole-file mode, while inflating far fewer bytes."""
    import os
    import numpy as np
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.native import NativeBam, get_library

    if get_library() is None:
        pytest.skip("native library unavailable")
    _, bam_path = _make_bam(tmp_path, [("chr1", 300_000)], depth=20,
                            n_per_contig=150)
    cfg = PileupConfig()
    full = NativeBam(bam_path)  # no .bai yet: legacy whole-load mode
    assert not full.has_index
    build_index(bam_path)
    indexed = NativeBam(bam_path)
    assert indexed.has_index

    codes = None
    for lo, hi in [(150_000, 151_000), (0, 2_000), (299_000, 300_000)]:
        t_full, i_full = full.build_tile("chr1", lo, hi, cfg)
        t_idx, i_idx = indexed.build_tile("chr1", lo, hi, cfg)
        for key in t_full:
            np.testing.assert_array_equal(t_full[key], t_idx[key], err_msg=key)
        assert i_full.ins_seqs == i_idx.ins_seqs
        np.testing.assert_array_equal(i_full.ins_pos, i_idx.ins_pos)
        np.testing.assert_array_equal(i_full.del_pos, i_idx.del_pos)
    # bounded-I/O proof: three 1-2 kb regions of a 300 kb contig. The
    # absolute cost per query is ~constant (region blocks + boundary-
    # crossing reads' scattered blocks), so the fraction shrinks as the
    # file grows; 1/3 is a conservative bound at this small fixture size.
    assert indexed.bytes_read() < os.path.getsize(bam_path) / 3


def test_cli_index_subcommand(tmp_path):
    import os
    from clair3_rna_tpu.cli import main as cli_main

    _, bam_path = _make_bam(tmp_path, [("chr1", 20_000)])
    cli_main(["index", bam_path])
    assert os.path.exists(bam_path + ".bai")
    reader = BamReader(bam_path)
    assert reader.has_index
    assert sum(1 for _ in reader.fetch("chr1", 0, 20_000)) > 0


def test_open_bam_auto_indexes(tmp_path):
    """open_bam on an unindexed BAM builds the .bai on open (the bounded-
    memory production path; without it a whole-genome BAM is decompressed
    into RAM wholesale -- see tools/scale_run.py's RSS assertion)."""
    import os
    from clair3_rna_tpu.native import get_library
    from clair3_rna_tpu.pileup.chunk import open_bam

    if get_library() is None:
        pytest.skip("native library unavailable")
    _, bam_path = _make_bam(tmp_path, [("chr1", 30_000)])
    assert not os.path.exists(bam_path + ".bai")
    bam = open_bam(bam_path)
    assert os.path.exists(bam_path + ".bai")
    assert bam.has_index
    # and the index is used on a second open too
    assert open_bam(bam_path).has_index
