"""Contig-shard distributed calling: N-shard manifests merge to the exact
single-host VCF, for any N (the determinism contract in SURVEY §2.3)."""

import os
import random

from clair3_rna_tpu.caller.decode import CallConfig
from clair3_rna_tpu.caller.pipeline import run_calling
from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.io.fasta import write_fasta
from clair3_rna_tpu.models.network import init_params, make_forward_fn
from clair3_rna_tpu.parallel.distributed import (merge_shards,
                                                 run_sharded_calling,
                                                 shard_tasks)
from clair3_rna_tpu.pileup.chunk import ChunkTask
from tests import simdata


def _rows(path):
    return [l for l in open(path) if not l.startswith("#")]


def test_shard_tasks_partition():
    tasks = [ChunkTask("chr1", i * 100, (i + 1) * 100) for i in range(10)]
    parts = [shard_tasks(tasks, 3, s) for s in range(3)]
    assert sorted(sum([[t.start for t in p] for p in parts], [])) == \
        [t.start for t in tasks]
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1


def test_sharded_merge_matches_single_host(tmp_path):
    rng = random.Random(51)
    genome = simdata.random_genome(rng, [("chr1", 9000), ("chr2", 6000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=15)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=30)

    cfg = PileupConfig(batch_size=64)
    call_cfg = CallConfig(show_ref=True)
    params = init_params(0)
    _, forward = make_forward_fn()
    contigs = ["chr1", "chr2"]

    single = str(tmp_path / "single.vcf")
    run_calling(bam, fasta, single, cfg=cfg, call_cfg=call_cfg, params=params,
                forward=forward, contigs=contigs, chunk_size=2500,
                compress=False, progress=False)

    for n_shards in (1, 4):
        work = str(tmp_path / f"work{n_shards}")
        for shard_id in range(n_shards):
            run_sharded_calling(
                bam, fasta, work, cfg=cfg, call_cfg=call_cfg, params=params,
                forward=forward, contigs=contigs, n_shards=n_shards,
                shard_id=shard_id, chunk_size=2500)
        merged = str(tmp_path / f"merged{n_shards}.vcf")
        merge_shards(work, n_shards, merged, show_ref=True, compress=False,
                     qual_cutoff=cfg.effective_qual_cutoff)
        assert _rows(merged) == _rows(single), f"{n_shards}-shard diverged"
    assert len(_rows(single)) > 0


def test_sharded_resume_skips_completed(tmp_path):
    """A shard retried with resume=True reuses its manifests (crash retry)."""
    rng = random.Random(52)
    genome = simdata.random_genome(rng, [("chr1", 6000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=10)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=30)

    cfg = PileupConfig(batch_size=64)
    call_cfg = CallConfig(show_ref=True)
    params = init_params(0)
    _, forward = make_forward_fn()
    work = str(tmp_path / "work")

    stats1 = run_sharded_calling(
        bam, fasta, work, cfg=cfg, call_cfg=call_cfg, params=params,
        forward=forward, contigs=["chr1"], n_shards=1, shard_id=0,
        chunk_size=3000)
    assert stats1.candidates > 0
    stats2 = run_sharded_calling(
        bam, fasta, work, cfg=cfg, call_cfg=call_cfg, params=params,
        forward=forward, contigs=["chr1"], n_shards=1, shard_id=0,
        chunk_size=3000, resume=True)
    assert stats2.candidates == 0, "resume should skip completed work"
    merged = str(tmp_path / "merged.vcf")
    _, n_rows, _ = merge_shards(work, 1, merged, show_ref=True,
                                compress=False)
    assert n_rows == len(_rows(merged)) > 0


def test_shard_tasks_lpt_partition_and_balance():
    """LPT exactness + balance: every task lands on exactly one shard and
    the makespan beats round-robin on a skewed cost vector (the RNA
    deep-transcript shape: a few chunks cost 20x the background)."""
    from clair3_rna_tpu.parallel.distributed import shard_tasks_lpt

    tasks = [ChunkTask("chr1", i * 100, (i + 1) * 100) for i in range(64)]
    costs = [1.0] * 64
    for i in range(0, 64, 16):
        costs[i] = 20.0  # deep islands, round-robin stacks them on shard 0
    parts = [shard_tasks_lpt(tasks, 4, s, costs) for s in range(4)]
    starts = sorted(t.start for p in parts for t in p)
    assert starts == [t.start for t in tasks]

    def makespan(parts_):
        by_start = {t.start: c for t, c in zip(tasks, costs)}
        return max(sum(by_start[t.start] for t in p) for p in parts_)

    rr = [shard_tasks(tasks, 4, s) for s in range(4)]
    assert makespan(parts) < makespan(rr)
    # LPT on this vector is near-perfect: 4 islands spread 1-per-shard
    total = sum(costs)
    assert makespan(parts) <= total / 4 * 1.1


def test_estimate_chunk_costs_tracks_coverage(tmp_path):
    from clair3_rna_tpu.parallel.distributed import estimate_chunk_costs

    rng = random.Random(57)
    genome = simdata.random_genome(rng, [("chr1", 40_000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=20)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=15,
                         extra_regions={"chr1": [(20_000, 30_000, 150)]})
    tasks = [ChunkTask("chr1", s, s + 10_000) for s in range(0, 40_000,
                                                            10_000)]
    costs = estimate_chunk_costs(bam, tasks)  # builds the .bai itself
    assert costs is not None and len(costs) == 4
    # the deep island chunk reads as heavy (compare the byte-proportional
    # part; the additive fixed-cost constant is depth-independent)
    from clair3_rna_tpu.parallel.distributed import CHUNK_FIXED_COST_CBYTES
    assert (costs[2] - CHUNK_FIXED_COST_CBYTES) \
        > 3 * (costs[0] - CHUNK_FIXED_COST_CBYTES)


def test_run_shards_with_retry_recovers_crashed_shard(tmp_path):
    """An injected shard crash recovers without manual intervention and the
    merge is identical to the single-host run (VERDICT r04 item 8)."""
    from clair3_rna_tpu.parallel.distributed import run_shards_with_retry

    rng = random.Random(58)
    genome = simdata.random_genome(rng, [("chr1", 9000), ("chr2", 6000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=15)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=30)

    cfg = PileupConfig(batch_size=64)
    call_cfg = CallConfig(show_ref=True)
    params = init_params(0)
    _, forward = make_forward_fn()
    contigs = ["chr1", "chr2"]

    single = str(tmp_path / "single.vcf")
    run_calling(bam, fasta, single, cfg=cfg, call_cfg=call_cfg,
                params=params, forward=forward, contigs=contigs,
                chunk_size=2500, compress=False, progress=False)

    work = str(tmp_path / "work")
    crashes = []

    def one_shard(shard_id, resume):
        st = run_sharded_calling(
            bam, fasta, work, cfg=cfg, call_cfg=call_cfg, params=params,
            forward=forward, contigs=contigs, n_shards=3, shard_id=shard_id,
            chunk_size=2500, resume=resume)
        if shard_id == 1 and not crashes:
            crashes.append(1)  # crash AFTER manifests landed: retry must
            raise RuntimeError("injected shard crash")  # not redo them
        return st

    stats = run_shards_with_retry(one_shard, 3)
    assert len(stats) == 3 and crashes
    # the retried shard resumed from its manifests: zero rebuilt candidates
    assert stats[1].candidates == 0
    merged = str(tmp_path / "merged.vcf")
    merge_shards(work, 3, merged, show_ref=True, compress=False,
                 qual_cutoff=cfg.effective_qual_cutoff)
    assert _rows(merged) == _rows(single)
