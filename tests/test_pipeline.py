"""Full-pipeline smoke tests: run_calling produces a sorted, indexed VCF."""

import gzip

from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.caller.decode import CallConfig
from clair3_rna_tpu.caller.pipeline import run_calling
from clair3_rna_tpu.io.bgzf import bgzf_decompress
from clair3_rna_tpu.postprocess.sort_vcf import sort_rows, contig_sort_order
from tests import simdata


def test_run_calling_end_to_end(tmp_path):
    fasta_path, bam_path, genome, variants = simdata.make_dataset(
        tmp_path, seed=13, contig_len=5000, n_variants=10, depth=30)
    out_path = str(tmp_path / "out.vcf")
    outputs, stats = run_calling(
        bam_path, fasta_path, out_path,
        cfg=PileupConfig(batch_size=64),
        call_cfg=CallConfig(show_ref=True),
        compress=True, progress=False)
    assert outputs[0].endswith(".vcf.gz")
    data = bgzf_decompress(open(outputs[0], "rb").read()).decode()
    lines = [l for l in data.splitlines() if l]
    header = [l for l in lines if l.startswith("#")]
    rows = [l for l in lines if not l.startswith("#")]
    assert any(l.startswith("##fileformat=VCFv4.2") for l in header)
    assert any("##contig=<ID=chr1,length=5000>" in l for l in header)
    assert stats.candidates > 0
    assert len(rows) == stats.rows
    positions = [int(r.split("\t")[1]) for r in rows]
    assert positions == sorted(positions)
    # tabix index exists
    assert (tmp_path / "out.vcf.gz.tbi").exists()


def test_sort_rows_semantics(tmp_path):
    rows = {
        "chr2": [
            "chr2\t50\t.\tA\tC\t3.10\tPASS\t.\tGT:GQ:DP:AD:AF\t0/1:3:10:5,5:0.5000",
        ],
        "chr1": [
            "chr1\t100\t.\tA\tC\t20.50\tPASS\t.\tGT:GQ:DP:AD:AF\t0/1:20:10:5,5:0.5000",
            "chr1\t42\t.\tG\tT\t9.00\tPASS\t.\tGT:GQ:DP:AD:AF\t1/1:9:8:0,8:1.0000",
            "chr1\t7\t.\tT\t.\t1.00\tRefCall\t.\tGT:GQ:DP:AD:AF\t0/0:1:5:5:1.0000",
            # duplicate position: last one wins (chunk-boundary dedup)
            "chr1\t42\t.\tG\tT\t9.50\tPASS\t.\tGT:GQ:DP:AD:AF\t1/1:9:9:0,9:1.0000",
        ],
    }
    out = str(tmp_path / "sorted.vcf")
    rediportal = {("chr1", 100): ("A", "C", "A,D")}
    outputs, n_rows, n_tagged = sort_rows(
        rows, out, show_ref=False, qual_cutoff=8,
        rediportal=rediportal,
        output_no_tagging_fn=str(tmp_path / "untagged.vcf"),
        compress=False)
    body = [l for l in open(out) if not l.startswith("#")]
    assert len(body) == 3  # RefCall dropped
    assert body[0].split("\t")[0] == "chr1"
    assert body[-1].split("\t")[0] == "chr2"
    # qual 9.5 dup won; qual<=8 -> LowQual on chr2 row
    chr1_42 = [l for l in body if l.split("\t")[1] == "42"][0]
    assert "9.50" in chr1_42
    chr2_row = [l for l in body if l.startswith("chr2")][0]
    assert chr2_row.split("\t")[6] == "LowQual"
    # REDIportal tagging
    tagged = [l for l in body if l.split("\t")[1] == "100"][0]
    assert tagged.split("\t")[6] == "RNAEditing"
    assert n_tagged == 1
    untagged = [l for l in open(tmp_path / "untagged.vcf") if "\t100\t" in l][0]
    assert untagged.split("\t")[6] == "PASS"


def test_contig_sort_order():
    assert contig_sort_order(["chr10", "chr2", "weird", "chr1"]) == \
        ["chr1", "chr2", "chr10", "weird"]


def test_wire_forward_matches_legacy_vcf(tmp_path):
    """The uint8 wire + on-device negation/prescreen path produces the exact
    VCF of the legacy signed-int16 path (pipeline.batch_wire +
    models.network.make_wire_forward_fn)."""
    import random

    import numpy as np

    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.models.network import (init_params, make_forward_fn,
                                               make_wire_forward_fn)
    from tests import simdata

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=91, contig_len=30_000, n_variants=80, depth=30)
    params = init_params(0)
    _, legacy = make_forward_fn()
    _, wire = make_wire_forward_fn()
    for show_ref in (False, True):
        outs = []
        for fwd, name in ((legacy, "legacy"), (wire, "wire")):
            out = str(tmp_path / f"{name}_{show_ref}.vcf")
            run_calling(bam, fasta, out, cfg=PileupConfig(batch_size=128),
                        call_cfg=CallConfig(show_ref=show_ref), params=params,
                        forward=fwd, compress=False, progress=False)
            outs.append([l for l in open(out) if not l.startswith("#")])
        assert outs[0] == outs[1]
        assert outs[0]


def test_wire_forward_int16_fallback_exact():
    """When magnitudes exceed uint8 range, batch_wire falls back to signed
    int16 and the wire forward's probabilities match the legacy forward
    bitwise."""
    import numpy as np

    from clair3_rna_tpu.caller.pipeline import batch_wire, batch_tensors
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.models.network import (init_params, make_forward_fn,
                                               make_wire_forward_fn)
    from clair3_rna_tpu.pileup.builder import TensorRecord

    rng = np.random.RandomState(5)
    cfg = PileupConfig(batch_size=64)
    records = []
    for i in range(64):
        seq = "".join(rng.choice(list("ACGT"), 33))
        t = rng.randint(0, 300 if i % 3 else 600, (33, 18)).astype(np.int32)
        codes = np.frombuffer(seq.encode(), np.uint8)
        eff = np.array(["ACGT".index(c) for c in seq])
        rows = np.arange(33)
        t[rows, eff] = -np.abs(t[rows, eff])          # ref-channel negation
        t[rows, eff + 9] = -np.abs(t[rows, eff + 9])
        records.append(TensorRecord("chr1", 100 + i, seq, t, depth=30,
                                    alt_info="30-RG 30"))
    params = init_params(0)
    _, legacy = make_forward_fn()
    _, wire_fwd = make_wire_forward_fn()

    wire, codes = batch_wire(records, cfg)
    assert wire.dtype == np.int16  # magnitudes up to 600 force the fallback
    probs_wire = np.asarray(wire_fwd(params, wire, codes))[:, :-1]
    probs_legacy = legacy(params, batch_tensors(records, cfg))
    np.testing.assert_array_equal(probs_wire, np.asarray(probs_legacy))

    # and the uint8 path on a <=255 batch
    small = [TensorRecord(r.ctg_name, r.position, r.ref_seq,
                          np.clip(r.tensor, -200, 200), depth=30,
                          alt_info="30-RG 30") for r in records]
    wire8, codes8 = batch_wire(small, cfg)
    assert wire8.dtype == np.uint8
    probs8 = np.asarray(wire_fwd(params, wire8, codes8))[:, :-1]
    legacy8 = legacy(params, batch_tensors(small, cfg))
    np.testing.assert_array_equal(probs8, np.asarray(legacy8))
