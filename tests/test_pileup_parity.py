"""Differential parity: vectorized tile builder vs the reference
generate_tensor streamed through the ring-buffer harness."""

import pytest

from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.io.bam import BamReader
from clair3_rna_tpu.io.fasta import FastaFile
from clair3_rna_tpu.pileup.chunk import ChunkTask, build_chunk_tensors
from tests import simdata
from tests.conftest import requires_reference
from tests.ref_harness import reference_tensor_rows


def _our_rows(bam_path, fasta_path, task, cfg):
    bam = BamReader(bam_path)
    fasta = FastaFile(fasta_path)
    records = build_chunk_tensors(bam, fasta, task, cfg)
    return [r.to_reference_row() for r in records]


def _compare(tmp_path, seed, cfg, *, splice=False, depth=35, contig_len=6000,
             n_variants=10, with_hp=False, **harness_kwargs):
    fasta_path, bam_path, genome, variants = simdata.make_dataset(
        tmp_path, seed=seed, contig_len=contig_len, n_variants=n_variants,
        depth=depth, splice=splice, with_hp=with_hp)
    task = ChunkTask("chr1", 0, contig_len)
    ours = _our_rows(bam_path, fasta_path, task, cfg)
    ref = reference_tensor_rows(
        bam_path, fasta_path, "chr1", 0, contig_len,
        platform=cfg.platform, snp_min_af=cfg.snp_min_af,
        indel_min_af=cfg.indel_min_af, min_coverage=cfg.min_coverage,
        fast_mode=cfg.fast_mode, call_snp_only=cfg.call_snp_only,
        head_tail=cfg.enable_head_tail, splice_padding=cfg.enable_splice_padding,
        phased=cfg.phased, **harness_kwargs)
    assert len(ref) > 0, "oracle produced no tensors; test data too sparse"
    if ours != ref:
        for i, (a, b) in enumerate(zip(ours, ref)):
            assert a == b, f"row {i} differs:\nours: {a[:400]}\nref : {b[:400]}"
        assert len(ours) == len(ref), (
            f"row count differs: ours={len(ours)} ref={len(ref)}\n"
            f"extra ours: {[r[:80] for r in ours[len(ref):]]}\n"
            f"extra ref: {[r[:80] for r in ref[len(ours):]]}"
        )


@requires_reference
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_parity_basic(tmp_path, reference_path, seed):
    _compare(tmp_path, seed, PileupConfig())


@requires_reference
def test_parity_low_coverage_gaps(tmp_path, reference_path):
    # sparse coverage creates gaps -> exercises ring-buffer reset semantics
    _compare(tmp_path, 11, PileupConfig(), depth=6, contig_len=4000)


@requires_reference
def test_parity_spliced_reads(tmp_path, reference_path):
    _compare(tmp_path, 21, PileupConfig(), splice=True, depth=25)


@requires_reference
def test_parity_splice_padding(tmp_path, reference_path):
    _compare(tmp_path, 22, PileupConfig(enable_splice_padding=True),
             splice=True, depth=25)


@requires_reference
def test_parity_head_tail(tmp_path, reference_path):
    _compare(tmp_path, 31, PileupConfig(enable_head_tail=True),
             depth=12, contig_len=3000)


@requires_reference
def test_parity_hifi_platform(tmp_path, reference_path):
    _compare(tmp_path, 41, PileupConfig(platform="hifi", snp_min_af=0.08,
                                        indel_min_af=0.08))


@requires_reference
def test_parity_phased(tmp_path, reference_path):
    _compare(tmp_path, 51, PileupConfig(phased=True), with_hp=True)


@requires_reference
def test_parity_zero_af_reference_sites(tmp_path, reference_path):
    _compare(tmp_path, 61, PileupConfig(snp_min_af=0.0, indel_min_af=0.0))
