"""--pileup_backend auto|host|fused|hybrid resolution + per-chunk routing
(caller/backend.py)."""

import random

import pytest

from clair3_rna_tpu.caller import backend as be


def test_explicit_choice_passthrough(monkeypatch):
    monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", raising=False)
    assert be.resolve_backend("host") == "host"
    assert be.resolve_backend("fused") == "fused"
    assert be.resolve_backend("hybrid") == "hybrid"
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
    # the test harness runs CPU JAX, so auto short-circuits: no chip,
    # no fused formulation
    monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", raising=False)
    assert be.resolve_backend("auto") == "host"


def test_auto_on_tpu_picks_hybrid(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got, reason = be.choose_backend()
    assert got == "hybrid"
    assert reason  # the decision is explained in the log line


def test_builder_scatter_env_values_mean_host_pipeline(monkeypatch):
    # "device"/"pallas" select the pure-array builder's scatter backend
    # (pileup/builder._pileup_backend reads the same env var); the pipeline
    # must treat them as the host formulation, not reject them
    for v in ("device", "pallas"):
        monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", v)
        assert be.resolve_backend(None) == "host"


def _sim_bam(tmp_path, depth=14, extra_regions=None, length=120_000):
    from clair3_rna_tpu.io.bai import build_index
    from clair3_rna_tpu.io.fasta import write_fasta
    from tests import simdata

    rng = random.Random(91)
    genome = simdata.random_genome(rng, [("chr1", length)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=30)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=depth,
                         extra_regions=extra_regions)
    build_index(bam)
    return fasta, bam


class TestChunkRoutePolicy:
    def _policy(self, bam, link_bps=130e6):
        return be.ChunkRoutePolicy(bam, link_bps, {"chr1": 0})

    def test_estimates_track_depth(self, tmp_path):
        """The BAI byte span of a deep island reads ~10x a shallow span."""
        fasta, bam = _sim_bam(
            tmp_path, depth=14,
            extra_regions={"chr1": [(60_000, 100_000, 200)]})
        pol = self._policy(bam)
        assert pol.usable
        shallow = pol.estimate_bases("chr1", 0, 40_000)
        deep = pol.estimate_bases("chr1", 60_000, 100_000)
        assert deep > 5 * shallow
        # the absolute estimate lands within ~2x of truth (depth * width)
        # even before calibration -- all the 20x regime split needs
        assert 0.4 * 14 * 40_000 < shallow < 2.5 * 14 * 40_000

    def test_routing_follows_the_measured_regimes(self, tmp_path):
        """On a tunnel-grade link: shallow chunks -> fused (the measured
        1.8x win at 14x, SCALE_RUN.json), deep chunks -> host (the
        measured 2.6x loss at 260x, BENCH_r04)."""
        fasta, bam = _sim_bam(
            tmp_path, depth=14,
            extra_regions={"chr1": [(60_000, 100_000, 246)]})
        pol = self._policy(bam, link_bps=130e6)
        assert pol.route("chr1", 0, 40_000) == "fused"
        assert pol.route("chr1", 60_000, 100_000) == "host"
        c = pol.counters()
        assert c["fused_chunks"] == 1 and c["host_chunks"] == 1

    def test_chip_local_link_fuses_moderate_depth(self, tmp_path):
        """At 8 GB/s the ship stage is ~free: 35x routes fused (the
        deployment regime the formulation exists for)."""
        fasta, bam = _sim_bam(tmp_path, depth=35)
        pol = self._policy(bam, link_bps=8e9)
        assert pol.route("chr1", 0, 100_000) == "fused"

    def test_slow_link_routes_host(self, tmp_path):
        """On a slow link the wire cannot pay for itself at moderate+
        depth (at very shallow depth the host build's fixed cost keeps
        the decision genuinely marginal, so 35x is the clear regime)."""
        fasta, bam = _sim_bam(tmp_path, depth=35)
        pol = self._policy(bam, link_bps=30e6)
        assert pol.route("chr1", 0, 100_000) == "host"

    def test_calibration_converges_on_truth(self, tmp_path):
        fasta, bam = _sim_bam(tmp_path, depth=20)
        pol = self._policy(bam)
        truth = 20 * 100_000
        for _ in range(12):
            pol.observe("chr1", 0, 100_000, truth)
        est = pol.estimate_bases("chr1", 0, 100_000)
        assert abs(est - truth) / truth < 0.05

    def test_missing_index_degrades_to_host(self, tmp_path):
        import os

        fasta, bam = _sim_bam(tmp_path, depth=14)
        os.remove(bam + ".bai")
        pol = self._policy(bam)
        assert not pol.usable
        assert pol.route("chr1", 0, 100_000) == "host"

    # --- measurement-driven routing (r05: static constants routed every
    # 14x chunk fused while the host route was measured winning 1.7x on
    # that session's link -- measured walls must override the prior) ----

    def test_measured_walls_override_the_model(self, tmp_path):
        fasta, bam = _sim_bam(tmp_path, depth=14)
        pol = self._policy(bam, link_bps=130e6)  # prior: fused at 14x
        assert pol.route("chr1", 0, 100_000) == "fused"
        # measured walls: fused far above host's
        pol.observe_wall("fused", "chr1", 0, 100_000, 0.12)
        pol.observe_wall("host", "chr1", 0, 100_000, 0.07)
        assert pol.route("chr1", 0, 100_000) == "host"
        c = pol.counters()
        assert c["bucket_walls"]  # telemetry carries the measured EWMAs

    def test_compile_walls_never_enter_the_ewmas(self, tmp_path):
        fasta, bam = _sim_bam(tmp_path, depth=14)
        pol = self._policy(bam, link_bps=130e6)
        pol.observe_wall("fused", "chr1", 0, 100_000, 60.0,
                         compiled=True)  # jit compile, discarded
        pol.observe_wall("host", "chr1", 0, 100_000, 0.07)
        pol.observe_wall("fused", "chr1", 0, 100_000, 0.04)
        # the 60 s compile must not have poisoned the fused EWMA
        assert pol.route("chr1", 0, 100_000) == "fused"

    def test_exploration_retries_the_losing_route(self, tmp_path, \
            monkeypatch):
        monkeypatch.setattr(be, "ROUTE_EXPLORE_EVERY", 5)
        fasta, bam = _sim_bam(tmp_path, depth=14)
        pol = self._policy(bam, link_bps=130e6)
        pol.observe_wall("fused", "chr1", 0, 100_000, 0.10)
        pol.observe_wall("host", "chr1", 0, 100_000, 0.05)
        routes = [pol.route("chr1", 0, 100_000) for _ in range(12)]
        assert "fused" in routes         # the loser is re-tried...
        assert routes.count("host") > routes.count("fused")  # ...sparsely
        assert pol.counters()["explore_chunks"] >= 1

    def test_cold_fused_not_bought_when_model_says_far(self, tmp_path, \
            monkeypatch):
        """One route measured (host), fused never run: exploration must
        not pay a cold fused compile when the prior puts fused >3x out
        (deep chunks on a slow link)."""
        monkeypatch.setattr(be, "ROUTE_EXPLORE_EVERY", 2)
        fasta, bam = _sim_bam(
            tmp_path, depth=14,
            extra_regions={"chr1": [(0, 100_000, 246)]})
        pol = self._policy(bam, link_bps=30e6)
        pol.observe_wall("host", "chr1", 0, 100_000, 0.2)
        routes = [pol.route("chr1", 0, 100_000) for _ in range(10)]
        assert routes == ["host"] * 10
