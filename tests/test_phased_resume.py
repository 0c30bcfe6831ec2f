"""Resume of the --enable_phasing_model second pass.

The reference resumes steps 3-6 (phase -> haplotag -> pileup re-call) via
--skip_steps (/root/reference/run_clair3_rna:855-867). Here the analogue is
two-grain: the phase+haplotag step is skipped when its tagged BAM +
completion marker match the first-pass VCF, and the 30-channel re-call
checkpoints per chunk into tmp_phased exactly like the first pass."""

import json
import os
import random

import pytest

from clair3_rna_tpu.cli import main
from clair3_rna_tpu.io.fasta import write_fasta
from tests import simdata


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("phased_resume")
    rng = random.Random(77)
    genome = simdata.random_genome(rng, [("chr1", 60_000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=160)
    fasta = str(tmp / "ref.fa")
    bam = str(tmp / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=30)
    return fasta, bam


def _call_args(bam, fasta, out, resume=False):
    # small batches so the cross-chunk inference queue drains mid-contig
    # (chunk manifest lines only land once a chunk's candidates drain)
    args = ["call", "-B", bam, "-R", fasta, "-o", out,
            "--include_all_ctgs", "--no_compress", "--chunk_size", "10000",
            "--batch_size", "32",
            "--enable_phasing_model", "--phaser", "builtin"]
    if resume:
        args.append("--resume")
    return args


def _phased_rows(out):
    path = os.path.join(out, "output_enable_phasing.vcf")
    return [l for l in open(path) if not l.startswith("#")]


def test_crash_in_second_pass_resumes_chunk_granular(tmp_path, monkeypatch,
                                                     dataset):
    fasta, bam = dataset
    # ground truth: one uninterrupted two-pass run
    truth_out = str(tmp_path / "truth")
    main(_call_args(bam, fasta, truth_out))
    truth = _phased_rows(truth_out)
    assert truth  # the phased re-call produced rows

    # crash during the SECOND pass: pass 1 runs 6 chunks, phase+haplotag
    # completes, the re-call crashes after 4 of its 6 chunk builds. (Both
    # passes share build_chunk_tensors through the host route; the counter
    # spans the whole driver invocation.)
    import clair3_rna_tpu.caller.pipeline as pl
    orig = pl.build_chunk_tensors
    calls = []

    def wrapped(*a, **k):
        calls.append(1)
        if len(calls) > 10:
            raise RuntimeError("injected crash")
        return orig(*a, **k)

    monkeypatch.setattr(pl, "build_chunk_tensors", wrapped)
    crash_out = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected crash"):
        main(_call_args(bam, fasta, crash_out))

    # the phase+haplotag step completed and is marked done
    tagged = os.path.join(crash_out, "phased_tagged.bam")
    marker = tagged + ".done.json"
    assert os.path.exists(tagged) and os.path.exists(marker)
    tagged_mtime = os.stat(tagged).st_mtime_ns
    # the finished second-pass chunk persisted in the tmp_phased manifest
    lines = [json.loads(l) for l in open(
        os.path.join(crash_out, "tmp_phased", "chr1.chunks.jsonl"))]
    assert 1 <= len(lines) <= 4

    # resume: phase+haplotag is NOT redone (same tagged BAM bytes), only
    # the unfinished second-pass chunks rebuild, and output matches truth
    monkeypatch.undo()
    calls2 = []

    def counting(*a, **k):
        calls2.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "build_chunk_tensors", counting)
    main(_call_args(bam, fasta, crash_out, resume=True))
    assert os.stat(tagged).st_mtime_ns == tagged_mtime
    # pass 1 restored whole-contig from its manifest (0 builds); pass 2
    # rebuilt only the chunks whose lines were not persisted
    assert len(calls2) == 6 - len(lines)
    assert _phased_rows(crash_out) == truth


def test_marker_mismatch_redoes_phasing(tmp_path, monkeypatch, dataset):
    """A resume whose first-pass VCF changed (different size/mtime) must
    re-run phase+haplotag instead of trusting the stale tagged BAM."""
    fasta, bam = dataset
    out = str(tmp_path / "o")
    main(_call_args(bam, fasta, out))
    marker = os.path.join(out, "phased_tagged.bam.done.json")
    stamp = json.load(open(marker))
    # simulate a first-pass VCF whose content came from another config
    stamp["vcf_body_sha1"] = "0" * 40
    json.dump(stamp, open(marker, "w"))

    from clair3_rna_tpu.phasing import pipeline as ph
    orig = ph.phase_and_haplotag
    redone = []

    def spy(*a, **k):
        redone.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(ph, "phase_and_haplotag", spy)
    main(_call_args(bam, fasta, out, resume=True))
    assert redone  # the stale marker did not suppress the re-phase
