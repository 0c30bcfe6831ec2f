"""Differential tests for the Pallas event scatter/rank kernel
(ops/fused_scatter): bucket_events + fused_scatter(interpret=True) against
the numpy oracle and the XLA segment ops, across tile-boundary shared
blocks, empty tiles, rank tie-breaks and pad inertness; plus one fused-
pipeline e2e run with scatter="pallas_interpret".

Reference semantics being preserved: the per-column Counter insertion-order
tie-break of src/create_tensor_pileup.py:219-266.
"""

import random

import numpy as np
import pytest

from clair3_rna_tpu.ops import fused_scatter as fsc


def _run_all_backends(ev_pos, ev_chan, ev_group, ev_rank, width_pad):
    """(oracle, pallas-interpret, xla-segment-ops) count/rank images."""
    import jax
    import jax.numpy as jnp

    oc, orank = fsc.scatter_oracle(ev_pos, ev_chan, ev_group, ev_rank,
                                   width_pad)

    b = fsc.bucket_events(np.asarray(ev_pos, np.int32),
                          np.asarray(ev_chan, np.int8),
                          np.asarray(ev_group, np.int8),
                          np.asarray(ev_rank, np.int32), width_pad)
    pc, pr = fsc.fused_scatter(
        jnp.asarray(b["ev_pos"]), jnp.asarray(b["ev_chan"]),
        jnp.asarray(b["ev_group"]),
        jnp.asarray(b["ev_rank"], jnp.float32),
        jnp.asarray(b["visit_tiles"]), jnp.asarray(b["visit_blocks"]),
        jnp.asarray(b["visit_firsts"]), jnp.asarray(b["visit_lasts"]),
        jnp.asarray(b["visit_valid"]), width_pad, interpret=True)
    pc, pr = np.asarray(pc), np.asarray(pr)

    # XLA segment ops over the SAME bucketed layout (order-invariant)
    W = width_pad
    pos = jnp.asarray(b["ev_pos"])
    weight = (pos < W).astype(jnp.int32)
    pos_c = jnp.minimum(pos, W - 1)
    idx = pos_c * fsc.C_PAD + jnp.asarray(b["ev_chan"], jnp.int32)
    xc = jax.ops.segment_sum(weight, idx, num_segments=W * fsc.C_PAD)
    xc = np.asarray(xc).reshape(W, fsc.C_PAD).T
    # pads carry chan 0: remove their weightless contribution is automatic
    gidx = pos_c * fsc.G_PAD + jnp.minimum(
        jnp.asarray(b["ev_group"], jnp.int32), fsc.G_PAD - 1)
    xr = jax.ops.segment_min(jnp.asarray(b["ev_rank"], jnp.float32)
                             .clip(max=fsc.RANK_INF_F),
                             gidx, num_segments=W * fsc.G_PAD)
    xr = np.minimum(np.asarray(xr).reshape(W, fsc.G_PAD).T, fsc.RANK_INF_F)
    return (oc, orank), (pc, pr), (xc, xr)


def _assert_equal(name, oracle, got):
    oc, orank = oracle
    gc, grank = got
    assert np.array_equal(oc.astype(np.float64), gc.astype(np.float64)), name
    # only groups 0..5 are meaningful; pads land in group 7
    assert np.array_equal(orank[:6].astype(np.float64),
                          grank[:6].astype(np.float64)), name


CASES = {
    # events clumped in one tile; empty tiles elsewhere
    "single_tile": dict(n=500, width_pad=4096, lo=600, hi=1000),
    # events straddling tile boundaries -> shared blocks between visits
    "tile_boundary": dict(n=3000, width_pad=4096, lo=480, hi=560),
    # uniform spread over every tile
    "uniform": dict(n=20000, width_pad=8192, lo=0, hi=8192),
    # fewer events than one 2048-event block
    "tiny": dict(n=7, width_pad=1024, lo=0, hi=1024),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_fused_scatter_differential(case):
    p = CASES[case]
    rng = np.random.default_rng(hash(case) % 2**31)
    n = p["n"]
    ev_pos = rng.integers(p["lo"], p["hi"], n).astype(np.int32)
    ev_chan = rng.integers(0, 18, n).astype(np.int8)
    ev_group = rng.integers(0, 8, n).astype(np.int8)   # incl. 6 none / 7 pad
    ev_rank = rng.integers(0, 2**20, n).astype(np.int32)
    oracle, pallas, xla = _run_all_backends(ev_pos, ev_chan, ev_group,
                                            ev_rank, p["width_pad"])
    _assert_equal(case + ":pallas", oracle, pallas)
    _assert_equal(case + ":xla", oracle, xla)


def test_rank_ties_and_duplicates():
    """Several events at one (pos, group) with duplicate ranks: the minimum
    must win regardless of visit/block order."""
    ev_pos = np.array([100, 100, 100, 100, 612, 612], np.int32)
    ev_chan = np.array([0, 0, 0, 9, 1, 1], np.int8)
    ev_group = np.array([0, 0, 0, 0, 1, 1], np.int8)
    ev_rank = np.array([44, 2, 2, 8, 7, 3], np.int32)
    oracle, pallas, xla = _run_all_backends(ev_pos, ev_chan, ev_group,
                                            ev_rank, 1024)
    _assert_equal("ties:pallas", oracle, pallas)
    _assert_equal("ties:xla", oracle, xla)
    oc, orank = oracle
    assert orank[0, 100] == 2.0 and orank[1, 612] == 3.0


def test_empty_input_and_pad_inertness():
    """Zero events: every tile must still be zero-initialized (not garbage),
    and block padding must contribute nothing."""
    oracle, pallas, xla = _run_all_backends(
        np.zeros(0, np.int32), np.zeros(0, np.int8), np.zeros(0, np.int8),
        np.zeros(0, np.int32), 2048)
    _assert_equal("empty:pallas", oracle, pallas)
    oc, orank = oracle
    assert oc.sum() == 0 and (orank[:6] == fsc.RANK_INF_F).all()


def test_bucket_events_visit_invariants():
    """Visit list structure: per-tile first/last flags bracket contiguous
    runs, blocks cover each tile's event range, pads are invalid."""
    rng = np.random.default_rng(5)
    n = 5000
    width_pad = 4096
    ev_pos = rng.integers(0, width_pad, n).astype(np.int32)
    b = fsc.bucket_events(ev_pos, np.zeros(n, np.int8), np.zeros(n, np.int8),
                          np.arange(n, dtype=np.int32), width_pad)
    n_tiles = width_pad // fsc.POS_TILE
    valid = b["visit_valid"] == 1
    tiles = b["visit_tiles"][valid]
    firsts = b["visit_firsts"][valid]
    lasts = b["visit_lasts"][valid]
    # tiles nondecreasing, every tile present exactly once as a run
    assert (np.diff(tiles) >= 0).all()
    assert set(tiles.tolist()) == set(range(n_tiles))
    for t in range(n_tiles):
        sel = tiles == t
        assert firsts[sel][0] == 1 and lasts[sel][-1] == 1
        assert firsts[sel][1:].sum() == 0 and lasts[sel][:-1].sum() == 0
    # bucketed events sorted by tile; pads sit beyond every tile
    pos = b["ev_pos"]
    real = pos < width_pad
    assert (np.diff(pos[real] >> fsc.TILE_SHIFT) >= 0).all()
    assert (pos[~real] == width_pad).all()


def test_max_rank_fallback_guard(tmp_path, monkeypatch):
    """FusedChunkCaller returns None (host fallback) when a chunk's ranks
    exceed the exact-f32 range on a Pallas scatter."""
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.models.network import init_params
    from clair3_rna_tpu.ops.fused_pileup import FusedChunkCaller
    from clair3_rna_tpu.pileup.events import PileupEvents

    width = 1024
    z8 = np.zeros(0, np.int8)
    z32 = np.zeros(0, np.int32)
    z64 = np.zeros(0, np.int64)
    dense = np.zeros(width, np.int32)
    cover = np.ones(width, np.int32)
    events = PileupEvents(
        start=0, end=width,
        base_pos=np.array([5], np.int32), base_code=np.array([0], np.int8),
        base_strand=np.array([0], np.int8),
        base_rank=np.array([fsc.MAX_RANK + 2], np.int64),
        base_hp=np.array([0], np.int8),
        star_pos=z32, star_strand=z8, star_hp=z8,
        ins_pos=z32, ins_strand=z8, ins_rank=z64, ins_hp=z8, ins_allele=z32,
        ins_seqs=[], del_pos=z32, del_strand=z8, del_rank=z64, del_hp=z8,
        del_len=z32, read_start_count=dense, read_end_count=dense,
        skip_fwd_count=dense, skip_rev_count=dense, cover_count=cover)
    for mode in ("events", "packed"):
        caller = FusedChunkCaller(init_params(0), PileupConfig(),
                                  CallConfig(), scatter="pallas_interpret",
                                  mode=mode)
        out = caller.call_chunk(events, np.zeros(width, np.int8), "chr1",
                                "A" * width, 0, 0, width)
        assert out is None


def test_fused_e2e_pallas_interpret(tmp_path, monkeypatch):
    """Whole fused pipeline with the event-mode Pallas kernel (interpreter):
    VCF-identical to the host path."""
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.io.fasta import write_fasta
    from clair3_rna_tpu.models.network import init_params
    from tests import simdata

    rng = random.Random(91)
    genome = simdata.random_genome(rng, [("chr1", 12_000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=40)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=20)
    params = init_params(0)

    def _call(out, fused):
        if fused:
            monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "fused")
            monkeypatch.setenv("CLAIR3_RNA_TPU_FUSED_MODE", "events")
            monkeypatch.setenv("CLAIR3_RNA_TPU_FUSED_SCATTER",
                               "pallas_interpret")
        else:
            for k in ("CLAIR3_RNA_TPU_PILEUP_BACKEND",
                      "CLAIR3_RNA_TPU_FUSED_MODE",
                      "CLAIR3_RNA_TPU_FUSED_SCATTER"):
                monkeypatch.delenv(k, raising=False)
        run_calling(bam, fasta, out, cfg=PileupConfig(batch_size=256),
                    call_cfg=CallConfig(show_ref=True), params=params,
                    contigs=["chr1"], chunk_size=6_000, compress=False,
                    progress=False)
        return [l for l in open(out) if not l.startswith("#")]

    host = _call(str(tmp_path / "host.vcf"), fused=False)
    fused = _call(str(tmp_path / "fused.vcf"), fused=True)
    assert len(host) > 10
    assert fused == host
