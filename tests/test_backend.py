"""--pileup_backend auto|host|fused resolution (caller/backend.py)."""

import pytest

from clair3_rna_tpu.caller import backend as be


def test_explicit_choice_passthrough(monkeypatch):
    monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", raising=False)
    assert be.resolve_backend("host") == "host"
    assert be.resolve_backend("fused") == "fused"
    assert be.resolve_backend(None) == "host"  # default


def test_env_var_is_the_operator_override(monkeypatch):
    monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
    assert be.resolve_backend(None) == "fused"
    # an explicit CLI choice still beats the env var
    assert be.resolve_backend("host") == "host"


def test_bad_value_rejected(monkeypatch):
    monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", raising=False)
    with pytest.raises(ValueError):
        be.resolve_backend("gpu")


def test_auto_without_tpu_picks_host(monkeypatch):
    # the test harness runs CPU JAX, so the probe short-circuits: no chip,
    # no fused path
    monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", raising=False)
    assert be.resolve_backend("auto") == "host"


@pytest.mark.parametrize("bw,want", [
    (139e6, "host"),     # this environment's tunnel-grade link
    (0.5e9, "host"),     # below the crossover
    (8e9, "fused"),      # TPU-VM-class local attachment
])
def test_auto_crossover_threshold(monkeypatch, bw, want):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(be, "probe_link_bandwidth", lambda nbytes=0: bw)
    got, reason = be.choose_backend()
    assert got == want
    assert reason  # the decision is explained in the log line


def test_builder_scatter_env_values_mean_host_pipeline(monkeypatch):
    # "device"/"pallas" select the pure-array builder's scatter backend
    # (pileup/builder._pileup_backend reads the same env var); the pipeline
    # must treat them as the host formulation, not reject them
    for v in ("device", "pallas"):
        monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", v)
        assert be.resolve_backend(None) == "host"


@pytest.mark.parametrize("depth,bam,want", [
    (14.0, "reads.bam", "fused"),   # the SCALE_RUN-measured win regime
    (35.0, "reads.bam", "host"),    # bench-measured host win at 35x
    (14.0, None, "host"),           # no BAM to sample -> conservative
])
def test_auto_shallow_coverage_clause(monkeypatch, depth, bam, want):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(be, "probe_link_bandwidth", lambda nbytes=0: 130e6)
    monkeypatch.setattr(be, "estimate_mean_depth",
                        lambda *a, **k: depth)
    got, reason = be.choose_backend(bam_path=bam)
    assert got == want
    if want == "fused":
        assert "shallow" in reason


def test_estimate_mean_depth_on_sim_bam(tmp_path):
    import random

    from clair3_rna_tpu.io.fasta import write_fasta
    from tests import simdata

    rng = random.Random(91)
    genome = simdata.random_genome(rng, [("chr1", 50_000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=20)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=14)
    d = be.estimate_mean_depth(bam)
    assert d is not None
    assert 7 <= d <= 28, d  # mid-contig sample lands near nominal 14x
