"""--pileup_backend hybrid: per-chunk host-vs-fused routing end to end.

The round-4 measurements proved the backend choice is depth-dependent on
mid-grade links (fused wins 1.8x at 14x, SCALE_RUN.json; loses 2.6x at 260x,
BENCH_r04) and real lrRNA coverage contains both regimes in one sample --
hybrid must route each chunk independently and the mixed output must be
row-identical to both pure policies (each route is proven row-identical, so
any mix merges exactly)."""

import random

import pytest

from clair3_rna_tpu.caller import backend as be
from clair3_rna_tpu.caller.decode import CallConfig
from clair3_rna_tpu.caller.pipeline import run_calling
from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.io.bai import build_index
from clair3_rna_tpu.io.fasta import write_fasta
from clair3_rna_tpu.models.network import init_params
from tests import simdata


@pytest.fixture(scope="module")
def mixed_dataset(tmp_path_factory):
    """14x background with a 64x island: chunks of both routing regimes at
    production-like (60 kb) chunk sizes, where the cost model's fixed terms
    do not swamp the per-base terms (the routing flip point at 60 kb /
    130 MB/s sits near 26x, well between the two depths)."""
    tmp_path = tmp_path_factory.mktemp("hybrid")
    rng = random.Random(53)
    contig_len = 300_000
    genome = simdata.random_genome(rng, [("chr1", contig_len)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=400)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=14,
                         extra_regions={"chr1": [(120_000, 180_000, 50)]})
    build_index(bam)
    return fasta, bam


def _call(bam, fasta, out, params, monkeypatch, backend):
    monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", backend)
    _, stats = run_calling(
        bam, fasta, out, cfg=PileupConfig(batch_size=256),
        call_cfg=CallConfig(show_ref=False), params=params,
        contigs=["chr1"], chunk_size=60_000, compress=False, progress=False)
    return [l for l in open(out) if not l.startswith("#")], stats


def test_hybrid_mixes_routes_and_is_row_identical(tmp_path, monkeypatch,
                                                  mixed_dataset):
    fasta, bam = mixed_dataset
    params = init_params(0)
    # tunnel-grade link: shallow chunks route fused, the island routes host
    monkeypatch.setattr(be, "cached_link_bandwidth", lambda: 130e6)
    host, _ = _call(bam, fasta, str(tmp_path / "host.vcf"), params,
                    monkeypatch, "host")
    fused, _ = _call(bam, fasta, str(tmp_path / "fused.vcf"), params,
                     monkeypatch, "fused")
    hybrid, stats = _call(bam, fasta, str(tmp_path / "hybrid.vcf"), params,
                          monkeypatch, "hybrid")
    assert len(host) > 50
    assert fused == host
    assert hybrid == host
    # the routing must be GENUINELY mixed: the island chunk(s) on the host
    # route, the shallow background fused
    assert stats.routing is not None
    assert stats.routing["fused_chunks"] >= 2
    assert stats.routing["host_chunks"] >= 1


# (a "BAM without index" e2e scenario cannot arise: open_bam builds a .bai
# on open; the policy's unwritable-directory degradation is unit-tested in
# test_backend.py::test_missing_index_degrades_to_host)


def test_hybrid_fast_link_fuses_everything(tmp_path, monkeypatch,
                                           mixed_dataset):
    fasta, bam = mixed_dataset
    params = init_params(0)
    monkeypatch.setattr(be, "cached_link_bandwidth", lambda: 8e9)
    rows, stats = _call(bam, fasta, str(tmp_path / "fast.vcf"), params,
                        monkeypatch, "hybrid")
    # chip-local link: the ship stage is ~free, the shallow background
    # fuses (the island may still route host: extraction cost dominates
    # there regardless of link speed)
    assert stats.routing["fused_chunks"] >= 3
    host, _ = _call(bam, fasta, str(tmp_path / "host.vcf"), params,
                    monkeypatch, "host")
    assert rows == host
