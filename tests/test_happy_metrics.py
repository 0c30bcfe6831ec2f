"""hap.py-annotated VCF ingestion parity: our happy_metrics vs the reference
src/calculate_overall_metrics.py on an identical synthetic fixture.

This is the pathway every published reference accuracy number flows through
(demo/ont_quick_demo.sh:81-96), so the table must match exactly.
"""

import gzip
import os
from types import SimpleNamespace

import pytest

from tests.conftest import requires_reference


HAPPY_HEADER = """##fileformat=VCFv4.1
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=BD,Number=1,Type=String,Description="Decision">
##FORMAT=<ID=BK,Number=1,Type=String,Description="Match kind">
##FORMAT=<ID=BI,Number=1,Type=String,Description="Benchmarking category">
##FORMAT=<ID=BVT,Number=1,Type=String,Description="Variant type">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tTRUTH\tQUERY
"""

FMT = "GT:BD:BK:BI:BVT"


def _row(ctg, pos, ref, alt, truth, query):
    return "\t".join([ctg, str(pos), ".", ref, alt, ".", ".", ".",
                      FMT, truth, query])


def _fixture_rows():
    rows = [
        # SNP TP both sides (genotype match)
        _row("chr1", 100, "A", "G", "0/1:TP:gm:.:SNP", "0/1:TP:gm:.:SNP"),
        # SNP FP (query only)
        _row("chr1", 200, "C", "T", ".:.:.:.:NOCALL", "0/1:FP:.:.:SNP"),
        # SNP FN (truth only)
        _row("chr1", 300, "G", "A", "1/1:FN:.:.:SNP", ".:.:.:.:NOCALL"),
        # allele match, zygosity mismatch: FP+FN that --skip_genotyping
        # promotes to TP on both sides
        _row("chr1", 400, "T", "C", "1/1:FN:am:.:SNP", "0/1:FP:am:.:SNP"),
        # insertion TP
        _row("chr1", 500, "A", "ATT", "0/1:TP:gm:i1_5:INDEL",
             "0/1:TP:gm:i1_5:INDEL"),
        # deletion FP
        _row("chr1", 600, "ACA", "A", ".:.:.:.:NOCALL", "1/1:FP:.:d1_5:INDEL"),
        # deletion FN
        _row("chr1", 700, "GTT", "G", "0/1:FN:.:d1_5:INDEL",
             ".:.:.:.:NOCALL"),
        # UNK on both sides: skipped entirely
        _row("chr1", 800, "A", "C", "0/1:UNK:.:.:SNP", "0/1:UNK:.:.:SNP"),
        # SNP TP filtered away by the truths-support coverage threshold
        _row("chr1", 900, "A", "G", "0/1:TP:gm:.:SNP", "0/1:TP:gm:.:SNP"),
        # SNP FP removed by the input-VCF DP re-filter (low_confident)
        _row("chr1", 1000, "C", "G", ".:.:.:.:NOCALL", "0/1:FP:.:.:SNP"),
        # another contig (exercises ctg_name=None keying)
        _row("chr2", 150, "T", "A", "0/1:TP:gm:.:SNP", "0/1:TP:gm:.:SNP"),
    ]
    return rows


def _write_fixture(tmp_path):
    happy_fn = str(tmp_path / "happy.vcf.gz")
    with gzip.open(happy_fn, "wt") as f:
        f.write(HAPPY_HEADER)
        f.write("\n".join(_fixture_rows()) + "\n")

    truths_fn = str(tmp_path / "truths")
    with open(truths_fn, "w") as f:
        # ctg pos cov alt_cov ; site 900 fails min_coverage=4
        f.write("chr1 100 20 9\n")
        f.write("chr1 900 2 1\n")
        f.write("chr1 400 30 15\n")

    input_fn = str(tmp_path / "calls.vcf")
    with open(input_fn, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        rows = [
            ("chr1", 100, "A", "G", 18.0, 20, "10,10"),
            ("chr1", 200, "C", "T", 3.0, 25, "20,5"),
            ("chr1", 400, "T", "C", 12.0, 22, "11,11"),
            ("chr1", 500, "A", "ATT", 15.0, 30, "20,10"),
            ("chr1", 600, "ACA", "A", 2.5, 18, "12,6"),
            ("chr1", 1000, "C", "G", 9.0, 2, "1,1"),   # DP 2 -> low confident
            ("chr2", 150, "T", "A", 22.0, 40, "20,20"),
        ]
        for ctg, pos, ref, alt, qual, dp, ad in rows:
            f.write(f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t{qual}\tPASS\t.\t"
                    f"GT:DP:AD:AF\t0/1:{dp}:{ad}:0.5\n")
    return happy_fn, truths_fn, input_fn


def _reference_table(tmp_path, happy_fn, truths_fn, input_fn,
                     skip_genotyping, use_filters):
    import sys
    sys.path.insert(0, "/root/reference")
    from src.calculate_overall_metrics import Cal

    out_fn = str(tmp_path / f"ref_{skip_genotyping}_{use_filters}.txt")
    args = SimpleNamespace(
        happy_vcf_fn=happy_fn, ctg_name=None, output_fn=out_fn,
        skip_genotyping=skip_genotyping,
        truths_info_fn=truths_fn if use_filters else None,
        input_vcf_fn=input_fn if use_filters else None,
        bed_fn=None,
        min_qual=None,
        min_coverage=4 if use_filters else None,
        min_alt_coverage=2 if use_filters else None,
        min_af=0.1 if use_filters else None,
        debug=False, input_filter_tag=None,
        output_best_f1_score=True, use_int_cut_off=True)
    Cal(args)
    with open(out_fn) as f:
        return [l.rstrip() for l in f if l.strip()]


def _our_table(happy_fn, truths_fn, input_fn, skip_genotyping, use_filters):
    from clair3_rna_tpu.evaluation.af_distribution import load_truths_file
    from clair3_rna_tpu.evaluation.overall_metrics import (
        best_f1_sweep, format_happy_table, happy_metrics)

    counts, sweep_inputs = happy_metrics(
        happy_fn,
        truths_support=load_truths_file(truths_fn) if use_filters else None,
        input_vcf_fn=input_fn if use_filters else None,
        min_coverage=4 if use_filters else None,
        min_alt_coverage=2 if use_filters else None,
        min_af=0.1 if use_filters else None,
        skip_genotyping=skip_genotyping)
    sweep = best_f1_sweep(*sweep_inputs)
    table = format_happy_table(counts, sweep)
    return [l.rstrip() for l in table.split("\n") if l.strip()]


@requires_reference
@pytest.mark.parametrize("skip_genotyping,use_filters",
                         [(False, False), (True, False), (True, True)])
def test_happy_table_matches_reference(tmp_path, skip_genotyping, use_filters):
    happy_fn, truths_fn, input_fn = _write_fixture(tmp_path)
    ref_lines = _reference_table(tmp_path, happy_fn, truths_fn, input_fn,
                                 skip_genotyping, use_filters)
    our_lines = _our_table(happy_fn, truths_fn, input_fn,
                           skip_genotyping, use_filters)
    assert our_lines == ref_lines


def test_happy_metrics_counts_direct(tmp_path):
    """Spot-check the stratified counts without the reference available."""
    happy_fn, truths_fn, input_fn = _write_fixture(tmp_path)
    from clair3_rna_tpu.evaluation.overall_metrics import happy_metrics

    counts, _ = happy_metrics(happy_fn, skip_genotyping=False)
    # SNPs: TPs at 100, 900, chr2:150; FPs at 200, 400(q), 1000; FNs 300, 400(t)
    assert counts["SNP"].query_tp == 3
    assert counts["SNP"].query_fp == 3
    assert counts["SNP"].truth_fn == 2
    assert counts["INDEL"].query_tp == 1
    assert counts["INS"].query_tp == 1
    assert counts["DEL"].query_fp == 1
    assert counts["DEL"].truth_fn == 1

    counts_sg, _ = happy_metrics(happy_fn, skip_genotyping=True)
    # the am pair at 400 is promoted: one more TP each side, one less FP/FN
    assert counts_sg["SNP"].query_tp == 4
    assert counts_sg["SNP"].query_fp == 2
    assert counts_sg["SNP"].truth_fn == 1
