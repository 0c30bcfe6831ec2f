"""Native (C++) event extraction must produce byte-identical PileupEvents to
the pure-Python extractor."""

import numpy as np
import pytest

from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.io.bam import BamReader
from clair3_rna_tpu.io.fasta import FastaFile
from clair3_rna_tpu.pileup.chunk import ChunkTask, build_chunk_tensors
from clair3_rna_tpu.pileup.events import extract_events
from tests import simdata


def _native():
    native = pytest.importorskip("clair3_rna_tpu.native")
    if not native.native_available():
        pytest.skip("no C++ toolchain")
    return native


@pytest.mark.parametrize("seed,with_hp,splice", [(3, False, False),
                                                 (51, True, False),
                                                 (21, False, True)])
def test_native_matches_python(tmp_path, seed, with_hp, splice):
    native = _native()
    fasta, bam_path, genome, variants = simdata.make_dataset(
        tmp_path, seed=seed, contig_len=5000, depth=25, splice=splice,
        with_hp=with_hp)
    nb = native.NativeBam(bam_path)
    pyb = BamReader(bam_path)
    assert nb.references == pyb.references
    assert nb.reference_lengths == pyb.reference_lengths

    start, end = 0, 5000
    ev_native = nb.extract_events("chr1", start, end, min_mq=5, min_bq=0,
                                  exclude_flags=2316)
    records = list(pyb.fetch("chr1", start, end, exclude_flags=2316, min_mapq=5))
    ev_py = extract_events(records, start, end, min_bq=0)

    for field in ("base_pos", "base_code", "base_strand", "base_rank", "base_hp",
                  "star_pos", "star_strand", "star_hp",
                  "ins_pos", "ins_strand", "ins_rank", "ins_hp", "ins_allele",
                  "del_pos", "del_strand", "del_rank", "del_hp", "del_len",
                  "read_start_count", "read_end_count",
                  "skip_fwd_count", "skip_rev_count", "cover_count"):
        a = getattr(ev_native, field)
        b = getattr(ev_py, field)
        np.testing.assert_array_equal(a, b, err_msg=field)
    assert ev_native.ins_seqs == ev_py.ins_seqs


def test_native_chunk_tensors_identical(tmp_path):
    native = _native()
    fasta, bam_path, genome, variants = simdata.make_dataset(
        tmp_path, seed=7, contig_len=6000, depth=30)
    cfg = PileupConfig()
    task = ChunkTask("chr1", 0, 6000)
    fa = FastaFile(fasta)
    rows_py = [r.to_reference_row()
               for r in build_chunk_tensors(BamReader(bam_path), fa, task, cfg)]
    rows_native = [r.to_reference_row()
                   for r in build_chunk_tensors(native.NativeBam(bam_path), fa,
                                                task, cfg)]
    assert rows_py == rows_native
    assert len(rows_py) > 5


def test_native_finalize_matches_python(tmp_path):
    """finalize_tile_native == finalize_features + candidate_mask_from +
    negated_counts, field by field."""
    native = _native()
    from clair3_rna_tpu.pileup import builder
    from clair3_rna_tpu.pileup.chunk import ref_codes_from

    fasta, bam_path, genome, variants = simdata.make_dataset(
        tmp_path, seed=11, contig_len=8000, depth=25, splice=True)
    cfg = PileupConfig()
    fa = FastaFile(fasta)
    ref_seq = fa.fetch("chr1", 0, 8000)
    codes = ref_codes_from(ref_seq)
    nb = native.NativeBam(bam_path)

    tile, indels = nb.build_tile("chr1", 0, 8000, cfg)
    feat_py = builder.finalize_features(
        0, 8000, tile["counts"], tile["group_count"], tile["group_rank"],
        tile["max_del_length"], tile["cover_count"],
        tile["read_start_count"], tile["read_end_count"],
        tile["skip_fwd_count"], tile["skip_rev_count"], codes)
    mask_py = builder.candidate_mask_from(feat_py, cfg)
    image_py = builder.negated_counts(feat_py)

    tile2, _, fin = nb.build_tile("chr1", 0, 8000, cfg, ref_codes=codes)
    for field in ("depth", "covered", "ins_total", "del_total", "star_total",
                  "alt_count", "ref_count", "max_skip", "eff_ref_code"):
        np.testing.assert_array_equal(fin[field], getattr(feat_py, field),
                                      err_msg=field)
    np.testing.assert_array_equal(fin["cand_mask"], mask_py)
    np.testing.assert_array_equal(tile2["counts"], image_py)
    assert mask_py.sum() > 5
