"""Multi-device calling: the dp-sharded forward on an 8-device (virtual CPU)
mesh must produce the same VCF as single-device inference, byte for byte --
the determinism contract behind contig/batch sharding (SURVEY §2.3)."""

import os

import numpy as np

from tests import simdata


def _read_rows(path):
    return [l for l in open(path) if not l.startswith("#")]


def test_mesh_calling_matches_single_device(tmp_path):
    import jax
    assert jax.device_count() >= 8, "conftest forces an 8-device CPU mesh"

    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.models.network import init_params, make_forward_fn
    from clair3_rna_tpu.parallel.mesh import (make_mesh, shard_params,
                                              sharded_forward_fn)

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=41, contig_len=8000, n_variants=20, depth=30)
    cfg = PileupConfig(batch_size=64)
    call_cfg = CallConfig(show_ref=True)
    params = init_params(0)
    model, forward = make_forward_fn()

    single = str(tmp_path / "single.vcf")
    run_calling(bam, fasta, single, cfg=cfg, call_cfg=call_cfg,
                params=params, forward=forward, contigs=["chr1"],
                chunk_size=3000, compress=False, progress=False)

    for tp in (1, 2):
        mesh = make_mesh(n_devices=8, tp=tp)
        sharded_params = shard_params(params, mesh)
        sharded_forward = sharded_forward_fn(model, mesh)
        out = str(tmp_path / f"mesh_tp{tp}.vcf")
        run_calling(bam, fasta, out, cfg=cfg, call_cfg=call_cfg,
                    params=sharded_params, forward=sharded_forward,
                    contigs=["chr1"], chunk_size=3000, compress=False,
                    progress=False)
        assert _read_rows(out) == _read_rows(single), f"tp={tp} diverged"
    assert len(_read_rows(single)) > 0


def test_driver_auto_mesh(tmp_path):
    """The CLI driver builds a mesh automatically on multi-device hosts and
    still produces a valid VCF (rows sorted, unique)."""
    from clair3_rna_tpu.cli import main
    from clair3_rna_tpu.io.bgzf import bgzf_decompress

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=42, contig_len=6000, n_variants=12, depth=30)
    outdir = str(tmp_path / "out")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir,
          "--include_all_ctgs", "--print_ref_calls", "--batch_size", "66"])
    data = bgzf_decompress(
        open(os.path.join(outdir, "output.vcf.gz"), "rb").read()).decode()
    rows = [l for l in data.splitlines() if l and not l.startswith("#")]
    assert rows
    positions = [int(r.split("\t")[1]) for r in rows]
    assert positions == sorted(positions)
    assert len(set(positions)) == len(positions)


def test_contig_manifest_resume(tmp_path):
    """Crash-retry semantics: a completed contig's manifest short-circuits the
    re-run, and the final VCF is identical."""
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.models.network import init_params, make_forward_fn

    import random
    from clair3_rna_tpu.io.fasta import write_fasta
    rng = random.Random(43)
    genome = simdata.random_genome(rng, [("chr1", 5000), ("chr2", 5000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=10)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=30)

    cfg = PileupConfig(batch_size=64)
    call_cfg = CallConfig(show_ref=True)
    params = init_params(0)
    _, forward = make_forward_fn()
    manifest = str(tmp_path / "manifest")

    base = str(tmp_path / "base.vcf")
    run_calling(bam, fasta, base, cfg=cfg, call_cfg=call_cfg, params=params,
                forward=forward, contigs=["chr1", "chr2"], compress=False,
                progress=False, manifest_dir=manifest)
    assert os.path.exists(os.path.join(manifest, "chr1.done.json"))
    assert os.path.exists(os.path.join(manifest, "chr2.done.json"))

    # poison chr1's manifest to prove resume actually reads it
    import json
    p = os.path.join(manifest, "chr1.done.json")
    payload = json.load(open(p))
    sentinel = "chr1\t1\t.\tA\tT\t99.00\tPASS\t.\tGT\t1/1"
    payload["rows"] = [sentinel] + payload["rows"]
    json.dump(payload, open(p, "w"))

    resumed = str(tmp_path / "resumed.vcf")
    run_calling(bam, fasta, resumed, cfg=cfg, call_cfg=call_cfg, params=params,
                forward=forward, contigs=["chr1", "chr2"], compress=False,
                progress=False, manifest_dir=manifest, resume=True)
    rows = _read_rows(resumed)
    assert any(r.startswith("chr1\t1\t") for r in rows), \
        "resume did not read the manifest"

    # fresh (no resume) run matches the base output exactly
    fresh = str(tmp_path / "fresh.vcf")
    run_calling(bam, fasta, fresh, cfg=cfg, call_cfg=call_cfg, params=params,
                forward=forward, contigs=["chr1", "chr2"], compress=False,
                progress=False)
    assert _read_rows(fresh) == _read_rows(base)
