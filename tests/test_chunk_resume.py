"""Chunk-granular resume: a crash mid-contig only redoes unfinished chunks
(the recovery unit of the reference's per-chunk pileup_{ctg}_{chunk}.vcf
files + --skip_steps, /root/reference/src/sort_vcf.py:218-253)."""

import json
import os
import random

import pytest

from clair3_rna_tpu.caller.decode import CallConfig
from clair3_rna_tpu.caller.pipeline import run_calling
from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.io.fasta import write_fasta
from clair3_rna_tpu.models.network import init_params
from tests import simdata


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chunk_resume")
    rng = random.Random(71)
    genome = simdata.random_genome(rng, [("chr1", 60_000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=200)
    fasta = str(tmp / "ref.fa")
    bam = str(tmp / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=30)
    return fasta, bam


def _run(dataset, out, mdir, params, resume=False, crash_after=None,
         monkeypatch=None, count_calls=None):
    fasta, bam = dataset
    if crash_after is not None or count_calls is not None:
        import clair3_rna_tpu.caller.pipeline as pl
        orig = pl.build_chunk_tensors
        calls = count_calls if count_calls is not None else []

        def wrapped(*a, **k):
            calls.append(1)
            if crash_after is not None and len(calls) > crash_after:
                raise RuntimeError("injected crash")
            return orig(*a, **k)

        monkeypatch.setattr(pl, "build_chunk_tensors", wrapped)
    run_calling(bam, fasta, out, cfg=PileupConfig(batch_size=64),
                call_cfg=CallConfig(show_ref=True), params=params,
                contigs=["chr1"], chunk_size=10_000, compress=False,
                progress=False, manifest_dir=mdir, resume=resume)
    return [l for l in open(out) if not l.startswith("#")]


def test_crash_mid_contig_resume_redoes_only_unfinished(tmp_path,
                                                        monkeypatch, dataset):
    params = init_params(0)
    # ground truth: one uninterrupted run (6 chunks of 10 kb)
    truth = _run(dataset, str(tmp_path / "truth.vcf"),
                 str(tmp_path / "m_truth"), params)
    assert len(truth) > 100

    # crash after 4 of 6 chunk builds: no contig manifest, but finished
    # chunks persisted as lines in chr1.chunks.jsonl
    mdir = str(tmp_path / "m_crash")
    with pytest.raises(RuntimeError, match="injected crash"):
        _run(dataset, str(tmp_path / "crashed.vcf"), mdir, params,
             crash_after=4, monkeypatch=monkeypatch)
    assert not os.path.exists(os.path.join(mdir, "chr1.done.json"))
    lines = [json.loads(l) for l in open(os.path.join(mdir,
                                                      "chr1.chunks.jsonl"))]
    assert 1 <= len(lines) <= 4
    assert all(l["rows"] for l in lines)
    n_persisted = len(lines)

    # resume: only the unfinished chunks are rebuilt, output identical
    monkeypatch.undo()
    calls = []
    resumed = _run(dataset, str(tmp_path / "resumed.vcf"), mdir, params,
                   resume=True, monkeypatch=monkeypatch, count_calls=calls)
    assert resumed == truth
    assert len(calls) == 6 - n_persisted  # finished chunks were NOT rebuilt
    # the contig completed this time, so the line file is superseded
    assert os.path.exists(os.path.join(mdir, "chr1.done.json"))
    assert not os.path.exists(os.path.join(mdir, "chr1.chunks.jsonl"))


def test_torn_tail_and_duplicate_lines_tolerated(tmp_path, monkeypatch,
                                                 dataset):
    params = init_params(0)
    truth = _run(dataset, str(tmp_path / "truth.vcf"),
                 str(tmp_path / "m_truth"), params)

    mdir = str(tmp_path / "m_torn")
    with pytest.raises(RuntimeError):
        _run(dataset, str(tmp_path / "crashed.vcf"), mdir, params,
             crash_after=4, monkeypatch=monkeypatch)
    path = os.path.join(mdir, "chr1.chunks.jsonl")
    first = open(path).readline()
    with open(path, "a") as f:
        f.write(first)                      # duplicate complete line
        f.write('{"start": 50000, "end"')   # torn tail (kill mid-write)
    monkeypatch.undo()
    resumed = _run(dataset, str(tmp_path / "resumed.vcf"), mdir, params,
                   resume=True, monkeypatch=monkeypatch)
    assert resumed == truth


def test_resume_without_manifests_runs_everything(tmp_path, dataset):
    params = init_params(0)
    out = _run(dataset, str(tmp_path / "fresh.vcf"),
               str(tmp_path / "m_fresh"), params, resume=True)
    assert len(out) > 100


def test_crash_resume_under_fused_backend(tmp_path, monkeypatch, dataset):
    """Chunk manifests also checkpoint fused-path chunks (whose rows arrive
    synchronously, not through the inference queue): crash after 4 fused
    chunks, resume, identical output."""
    monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
    params = init_params(0)
    truth = _run(dataset, str(tmp_path / "truth.vcf"),
                 str(tmp_path / "m_truth"), params)

    import clair3_rna_tpu.ops.fused_pileup as fp
    calls = []
    orig = fp.FusedChunkCaller.call_chunk

    def crashing(self, *a, **k):
        calls.append(1)
        if len(calls) > 4:
            raise RuntimeError("injected fused crash")
        return orig(self, *a, **k)

    monkeypatch.setattr(fp.FusedChunkCaller, "call_chunk", crashing)
    mdir = str(tmp_path / "m_crash")
    with pytest.raises(RuntimeError, match="injected fused crash"):
        _run(dataset, str(tmp_path / "crashed.vcf"), mdir, params)
    lines = open(os.path.join(mdir, "chr1.chunks.jsonl")).readlines()
    assert 1 <= len(lines) <= 4

    monkeypatch.setattr(fp.FusedChunkCaller, "call_chunk", orig)
    resumed = _run(dataset, str(tmp_path / "resumed.vcf"), mdir, params,
                   resume=True)
    assert resumed == truth
