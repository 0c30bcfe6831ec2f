"""bench.py reporting invariants: the compact last-line summary must carry
the headline and per-config digests (BENCH_r03 lost its headline to output
tail-capture truncation of a single value-first giant line), and fused
telemetry must be run-scoped despite process-level caller reuse."""

import json

from bench import _compact_summary


def _fake_ours():
    return {
        "sites_per_s": 7821.2,
        "median_sites_per_s": 7327.3,
        "link_h2d_mbps": 130.1,
        "high_depth": {"sites_per_s": 1403.1},
        "sustained_5mb": {"sites_per_s": 7235.7},
        "fused_e2e": {"sites_per_s": 6110.4, "median_sites_per_s": 5971.2,
                      "fused_vcf_identical": True,
                      "fused_counters": {"renorm_candidates": 0,
                                         "fallback_chunks": 0}},
        "fused_high_depth": {"sites_per_s": 726.7,
                             "fused_vcf_identical": True,
                             "fused_counters": {"renorm_candidates": 800,
                                                "fallback_chunks": 0}},
        "fused_device_only": {"device_s": 0.453,
                              "events_per_s": 116078570.0,
                              "sites_per_s": 17928.1,
                              "stage_expand_count_gather_s": 0.3233,
                              "stage_mask_network_s_est": 0.1297},
    }


def test_compact_summary_carries_headline_and_config_digests():
    baseline = {"sites_per_s": 33.4}
    s = _compact_summary(_fake_ours(), baseline, 7821.2 / 33.4)
    # headline fields present and small enough to survive tail capture
    assert s["value"] == 7821.2
    assert s["headline_median_sites_per_s"] == 7327.3
    assert s["vs_baseline"] == round(7821.2 / 33.4, 2)
    assert s["baseline_sites_per_s"] == 33.4
    # fused identity + renorm telemetry survive into the digest
    hd = s["configs"]["fused_high_depth"]
    assert hd["fused_vcf_identical"] is True
    assert hd["renorm_candidates"] == 800
    assert hd["fallback_chunks"] == 0
    dev = s["configs"]["fused_device_only"]
    assert dev["stage_expand_count_gather_s"] == 0.3233
    # must be a single modest JSON line (tail capture keeps ~last lines)
    line = json.dumps(s)
    assert "\n" not in line and len(line) < 4000


def test_compact_summary_tolerates_missing_baseline_and_configs():
    s = _compact_summary({"sites_per_s": 100.0}, {"sites_per_s": None}, None)
    assert s["value"] == 100.0
    assert s["vs_baseline"] is None
    assert s["baseline_sites_per_s"] is None
    assert all(isinstance(v, dict) for v in s["configs"].values())


def test_fused_counters_are_run_scoped_across_caller_reuse(tmp_path,
                                                           monkeypatch):
    """Two fused runs sharing one cached FusedChunkCaller must each report
    only their own renorm/fallback counts in CallStats.fused."""
    import random

    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.io.fasta import write_fasta
    from clair3_rna_tpu.models.network import init_params
    from tests import simdata

    rng = random.Random(81)
    genome = simdata.random_genome(rng, [("chr1", 1_500)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=6)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=240)

    monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
    params = init_params(0)
    stats = []
    for i in range(2):
        _, st = run_calling(bam, fasta, str(tmp_path / f"o{i}.vcf"),
                            cfg=PileupConfig(batch_size=64),
                            call_cfg=CallConfig(show_ref=True),
                            params=params, contigs=["chr1"],
                            chunk_size=20_000, compress=False,
                            progress=False)
        stats.append(st)
    assert stats[0].fused["renorm_candidates"] > 0
    # identical work -> identical per-run counts (not cumulative doubling)
    assert stats[1].fused == stats[0].fused
