"""Multi-host calling: jax.distributed + contig-shard data parallelism.

The reference fans chunks out as GNU-parallel OS processes on one machine
(run_clair3_rna:681-707) and has no cross-host story. The TPU-native design
(SURVEY §2.3) shards the *genome coordinate axis* across hosts over DCN:

  - every process calls `initialize()` (jax.distributed), then owns the
    deterministic subset of (contig, chunk) work items returned by
    `shard_tasks` -- interleaved round-robin so long contigs spread evenly;
  - each host runs the normal in-process streaming pipeline over its shard
    on its local devices (dp x tp mesh within the host over ICI), writing
    per-shard row manifests (idempotent atomic files -- the same mechanism
    the single-host --resume uses);
  - `merge_shards` (host 0, after a barrier) reads every shard's manifests
    and emits one contig-major, position-sorted VCF, identical regardless of
    shard count (tests/test_distributed.py proves 1-shard == 4-shard).

Weights replicate (the pileup net is ~2M params); nothing about the model
needs cross-host collectives, so the only cross-host traffic is the final
row merge -- variant rows are ~10^-4 of input bytes, making DCN bandwidth
irrelevant and scaling limited purely by shard balance.
"""

import json
import logging
import os

logger = logging.getLogger(__name__)


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize passthrough; no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return 1, 0
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count(), jax.process_index()


def shard_tasks(tasks, n_shards, shard_id):
    """Deterministic interleaved partition of (contig, chunk) work items.

    Round-robin over the task list keeps every shard's work within one chunk
    of even regardless of contig length skew (a genome is a few long contigs
    plus many short ones)."""
    if not (0 <= shard_id < n_shards):
        raise ValueError(f"shard_id {shard_id} outside [0, {n_shards})")
    return [t for i, t in enumerate(tasks) if i % n_shards == shard_id]


def shard_manifest_dir(base_dir, shard_id):
    return os.path.join(base_dir, f"shard_{shard_id:04d}")


def run_sharded_calling(bam_path, ref_path, work_dir, *, cfg, call_cfg,
                        params, forward, contigs, n_shards, shard_id,
                        chunk_size=None, known_vcf_positions=None,
                        bed_regions=None, progress=False, resume=False,
                        pileup_backend=None):
    """One shard's worth of calling; rows persist as shard manifests.

    Unlike run_calling this writes no merged VCF -- merge_shards does that
    once, after every shard reports complete."""
    from clair3_rna_tpu import config as _config
    from clair3_rna_tpu.caller.pipeline import run_calling

    manifest_dir = shard_manifest_dir(work_dir, shard_id)
    from clair3_rna_tpu.io.fasta import FastaFile
    from clair3_rna_tpu.pileup.chunk import plan_chunks
    fasta = FastaFile(ref_path)
    tasks = plan_chunks(fasta, contigs=contigs,
                        chunk_size=chunk_size or _config.CHUNK_SIZE)
    mine = shard_tasks(tasks, n_shards, shard_id)
    # each shard runs the normal streaming pipeline over its own task list
    # and keeps its own manifest dir: per-(shard, contig) row files that
    # double as this shard's --resume state and as merge input
    _, stats = run_calling(
        bam_path, ref_path,
        os.path.join(manifest_dir, "_scratch.vcf"),
        cfg=cfg, call_cfg=call_cfg, params=params, forward=forward,
        contigs=contigs, chunk_size=chunk_size,
        known_vcf_positions=known_vcf_positions, bed_regions=bed_regions,
        progress=progress, compress=False, manifest_dir=manifest_dir,
        resume=resume, tasks=mine, pileup_backend=pileup_backend)
    return stats


def merge_shards(work_dir, n_shards, output_fn, *, show_ref=False,
                 qual_cutoff=None, rediportal=None, reference_file_path=None,
                 sample_name="SAMPLE", cmd_line=None, compress=True):
    """Host-0 merge: gather every shard's chunk manifests into one sorted VCF.

    Deterministic for any shard count: rows are keyed (contig, position) and
    sorted contig-major exactly like the single-host path."""
    from clair3_rna_tpu.postprocess.sort_vcf import sort_rows

    rows_by_contig = {}
    for shard_id in range(n_shards):
        sdir = shard_manifest_dir(work_dir, shard_id)
        if not os.path.isdir(sdir):
            raise FileNotFoundError(f"missing shard manifest dir: {sdir}")
        for fn in sorted(os.listdir(sdir)):
            if not fn.endswith(".done.json"):
                continue
            with open(os.path.join(sdir, fn)) as f:
                for row in json.load(f)["rows"]:
                    rows_by_contig.setdefault(
                        row.split("\t", 1)[0], []).append(row)
    outputs, n_rows, n_tagged = sort_rows(
        rows_by_contig, output_fn, show_ref=show_ref,
        qual_cutoff=qual_cutoff, rediportal=rediportal,
        reference_file_path=reference_file_path, sample_name=sample_name,
        cmd_line=cmd_line, compress=compress)
    return outputs, n_rows, n_tagged
