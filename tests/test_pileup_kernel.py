"""Pileup count kernel: Pallas (interpret mode on CPU) and jax fallback vs
numpy bincount oracle."""

import numpy as np
import pytest

from clair3_rna_tpu.ops import pileup_kernel as pk


def _oracle(event_pos, event_channel, length, n_channels=18):
    out = np.zeros((length, n_channels), np.int64)
    np.add.at(out, (event_pos, event_channel), 1)
    return out


def _random_events(rng, n_events, length, n_channels=18):
    # realistic clumping: positions cluster like read pileups
    centers = rng.randint(0, length, size=max(1, n_events // 50))
    pos = np.clip(rng.choice(centers, n_events) +
                  rng.randint(-40, 40, n_events), 0, length - 1)
    chan = rng.randint(0, n_channels, n_events)
    return pos.astype(np.int32), chan.astype(np.int32)


@pytest.mark.parametrize("n_events,length", [(0, 700), (5000, 700),
                                             (60000, 5000)])
def test_jax_fallback_matches_oracle(n_events, length):
    rng = np.random.RandomState(0)
    pos, chan = _random_events(rng, n_events, length)
    got = pk.pileup_counts_jax(pos, chan, length) if n_events else \
        pk.pileup_counts(pos, chan, length)
    np.testing.assert_array_equal(got, _oracle(pos, chan, length))


@pytest.mark.parametrize("n_events,length", [(3000, 600), (40000, 2100)])
def test_pallas_interpret_matches_oracle(n_events, length):
    rng = np.random.RandomState(1)
    pos, chan = _random_events(rng, n_events, length)
    got = pk.pileup_counts_pallas(pos, chan, length, interpret=True)
    np.testing.assert_array_equal(got, _oracle(pos, chan, length))


def test_pallas_interpret_uneven_density():
    # everything piled on a single position tile, others empty
    rng = np.random.RandomState(2)
    length = 4 * pk.POS_BLOCK
    pos = rng.randint(pk.POS_BLOCK, pk.POS_BLOCK + 30, size=9000).astype(np.int32)
    chan = rng.randint(0, 18, size=9000).astype(np.int32)
    got = pk.pileup_counts_pallas(pos, chan, length, interpret=True)
    np.testing.assert_array_equal(got, _oracle(pos, chan, length))


def test_builder_device_backend_byte_identical(tmp_path, monkeypatch):
    """CLAIR3_RNA_TPU_PILEUP_BACKEND=device routes the builder's channel
    accumulation through the device kernel dispatch and must produce
    byte-identical tensor rows to the host bincount path."""
    from tests import simdata
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.io.fasta import FastaFile
    from clair3_rna_tpu.pileup.chunk import (ChunkTask, build_chunk_tensors,
                                             open_bam)

    fasta, bam_path, genome, variants = simdata.make_dataset(
        tmp_path, seed=33, contig_len=2500, n_variants=6, depth=25)
    fa = FastaFile(fasta)
    cfg = PileupConfig()
    task = ChunkTask("chr1", 0, 2500)

    # pure-array path (prefer_native=False) so _scatter_count is exercised
    bam = open_bam(bam_path, prefer_native=False)
    monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", raising=False)
    host_rows = [r.to_reference_row()
                 for r in build_chunk_tensors(bam, fa, task, cfg)]
    monkeypatch.setenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", "device")
    device_rows = [r.to_reference_row()
                   for r in build_chunk_tensors(bam, fa, task, cfg)]
    assert host_rows and host_rows == device_rows
