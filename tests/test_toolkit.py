"""Offline toolkit: AF distribution, stratified metrics, truth filtering,
editing-site discovery, add-back, concat."""

import numpy as np

from clair3_rna_tpu.config import PileupConfig
from tests import simdata


def _write_truth(path, variants, contig="chr1"):
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
                "\tINFO\tFORMAT\tS\n")
        for v in variants[contig]:
            gt = "1/1" if v.genotype == (1, 1) else "0/1"
            f.write(f"{contig}\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\tGT\t{gt}\n")
    return path


def test_truth_site_support_and_filtering(tmp_path):
    from clair3_rna_tpu.evaluation.af_distribution import (
        load_truths_file, truth_site_support, write_truths_file)
    from clair3_rna_tpu.evaluation.truth_filter import (
        find_low_confident_variants, write_filtered_truth)

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=41, contig_len=6000, n_variants=12, depth=30)
    truth_path = _write_truth(str(tmp_path / "truth.vcf"), variants)

    records = truth_site_support(bam, fasta, truth_path)
    assert len(records) == len(variants["chr1"])
    by_pos = {(c, p): (cov, alts) for c, p, cov, alts in records}
    hom_snps = [v for v in variants["chr1"] if v.is_snp and v.genotype == (1, 1)]
    for v in hom_snps:
        cov, alts = by_pos[("chr1", v.pos + 1)]
        assert cov > 0 and alts[0] > cov * 0.6, (v, cov, alts)

    truths_fn = write_truths_file(records, str(tmp_path / "truths"))
    support = load_truths_file(truths_fn)
    assert len(support) == len(records)

    kept, dropped = find_low_confident_variants(truth_path, support)
    assert len(kept) >= len(variants["chr1"]) * 0.5
    out = write_filtered_truth(truth_path, kept, str(tmp_path / "filtered.vcf"))
    body = [l for l in open(out) if not l.startswith("#")]
    assert len(body) == len(kept)


def test_stratified_metrics(tmp_path):
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.evaluation.af_distribution import (
        load_truths_file, truth_site_support, write_truths_file)
    from clair3_rna_tpu.evaluation.overall_metrics import stratified_metrics

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=42, contig_len=5000, n_variants=10, depth=30)
    truth_path = _write_truth(str(tmp_path / "truth.vcf"), variants)
    out_path = str(tmp_path / "calls.vcf")
    outputs, _ = run_calling(bam, fasta, out_path, cfg=PileupConfig(batch_size=64),
                             call_cfg=CallConfig(), compress=False, progress=False)
    truths_fn = write_truths_file(
        truth_site_support(bam, fasta, truth_path), str(tmp_path / "truths"))
    results = stratified_metrics(
        outputs[0], truth_path, truths_support=load_truths_file(truths_fn),
        min_coverage=4, min_alt_coverage=2, skip_genotyping=True)
    assert results and 0.0 <= results[0].f1 <= 1.0


def test_editing_site_discovery(tmp_path):
    import random
    from clair3_rna_tpu.evaluation.silver_editing import find_editing_sites
    from clair3_rna_tpu.io.fasta import write_fasta

    rng = random.Random(3)
    genome = simdata.random_genome(rng, [("chr1", 3000)])
    # plant a hom A->G "editing" site
    seq = list(genome["chr1"])
    seq[1500] = "A"
    genome["chr1"] = "".join(seq)
    v = simdata.Variant(1500, "A", "G", (1, 1))
    variants = {"chr1": [v]}
    write_fasta(str(tmp_path / "r.fa"), genome)
    simdata.simulate_bam(str(tmp_path / "r.bam"), genome, variants, rng, depth=40)
    sites = find_editing_sites(str(tmp_path / "r.bam"), str(tmp_path / "r.fa"),
                               rna_min_af=0.75)
    assert ("chr1", 1501) in {(c, p) for c, p, *_ in sites}


def test_add_back_and_concat(tmp_path):
    from clair3_rna_tpu.postprocess.concat import concat_files
    from clair3_rna_tpu.postprocess.genotyping import add_back_missing_variants

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=43, contig_len=3000, n_variants=6, depth=25)
    sites_path = _write_truth(str(tmp_path / "sites.vcf"), variants)
    # calls: only the first site called
    call_path = str(tmp_path / "calls.vcf")
    v0 = variants["chr1"][0]
    with open(call_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
                "\tINFO\tFORMAT\tS\n")
        f.write(f"chr1\t{v0.pos + 1}\t.\t{v0.ref}\t{v0.alt}\t20.00\tPASS\t.\t"
                f"GT:GQ:DP:AD:AF\t0/1:20:30:15,15:0.5000\n")
    out, n_added = add_back_missing_variants(
        call_path, sites_path, bam, fasta, str(tmp_path / "merged.vcf"))
    assert n_added == len(variants["chr1"]) - 1
    body = [l for l in open(out) if not l.startswith("#")]
    assert len(body) == len(variants["chr1"])
    assert sum(1 for l in body if "./." in l) == n_added
    positions = [int(l.split("\t")[1]) for l in body]
    assert positions == sorted(positions)

    d = tmp_path / "parts"
    d.mkdir()
    (d / "part_a.txt").write_text("#h\n1\n")
    (d / "part_b.txt").write_text("#h\n2\n")
    out, n = concat_files(str(d), str(tmp_path / "cat.txt"), prefix="part_")
    assert n == 2
    assert open(out).read() == "#h\n1\n2\n"


def test_paired_af_distribution(tmp_path):
    """Tumor/normal support tool (src/cal_af_distribution.py capability)."""
    from clair3_rna_tpu.evaluation.af_distribution import (
        paired_site_support, write_paired_file)

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=61, contig_len=5000, n_variants=8, depth=25)
    truth_path = _write_truth(str(tmp_path / "truth.vcf"), variants)
    records = paired_site_support(bam, bam, fasta, truth_path)
    assert records
    for ctg, pos, n_cov, t_cov, n_alt, t_alt in records:
        assert n_cov == t_cov and n_alt == t_alt  # same BAM both sides
        assert n_cov > 0
    out = write_paired_file(records, str(tmp_path / "paired"))
    rows = open(out).read().splitlines()
    assert len(rows) == len(records)
    # one-sided: normal only
    one = paired_site_support(bam, None, fasta, truth_path)
    assert all(r[3] == 0 for r in one)


def test_truth_support_with_hp(tmp_path):
    from clair3_rna_tpu.evaluation.af_distribution import (
        load_truths_file, truth_site_support, write_truths_file)

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=62, contig_len=5000, n_variants=8, depth=25,
        with_hp=True)
    truth_path = _write_truth(str(tmp_path / "truth.vcf"), variants)
    records = truth_site_support(bam, fasta, truth_path, with_hp=True)
    assert records
    for rec in records:
        assert len(rec) == 5
        cov, hp = rec[2], rec[4]
        # HP1 + HP2 + untagged covers the base reads; depth can also
        # include deletion placeholders, so the sum is bounded by cov
        assert 0 < sum(hp) <= cov
    out = write_truths_file(records, str(tmp_path / "truths"))
    support = load_truths_file(out)   # HP column must not break the loader
    assert len(support) == len(records)


def test_compare_vcf_roc_and_site_dumps(tmp_path):
    """--roc_fn qual-sweep table and --output_dir per-class VCF dumps
    (src/compare_vcf.py:450-553 capability)."""
    header = ("##fileformat=VCFv4.2\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
    call_fn = str(tmp_path / "calls.vcf")
    truth_fn = str(tmp_path / "truth.vcf")
    with open(call_fn, "w") as f:
        f.write(header)
        f.write("chr1\t100\t.\tA\tG\t30.0\tPASS\t.\tGT\t0/1\n")   # TP
        f.write("chr1\t200\t.\tC\tT\t5.0\tPASS\t.\tGT\t0/1\n")    # FP
        f.write("chr1\t300\t.\tG\tA\t12.0\tPASS\t.\tGT\t1/1\n")   # TP
    with open(truth_fn, "w") as f:
        f.write(header)
        f.write("chr1\t100\t.\tA\tG\t60\tPASS\t.\tGT\t0/1\n")
        f.write("chr1\t300\t.\tG\tA\t60\tPASS\t.\tGT\t1/1\n")
        f.write("chr1\t400\t.\tT\tC\t60\tPASS\t.\tGT\t0/1\n")     # FN

    from clair3_rna_tpu.cli import main
    roc_fn = str(tmp_path / "roc.tsv")
    out_dir = str(tmp_path / "classes")
    main(["compare_vcf", "--vcf_fn", call_fn, "--truth_vcf_fn", truth_fn,
          "--roc_fn", roc_fn, "--output_dir", out_dir])

    rows = [l.split("\t") for l in open(roc_fn).read().splitlines()]
    assert len(rows) == 3  # distinct quals 30, 12, 5
    quals = [float(r[0]) for r in rows]
    assert quals == sorted(quals, reverse=True)
    # strictest cutoff (30): tp=1 fp=0 fn=2 -> precision 1.0
    assert float(rows[0][1]) == 1.0
    # loosest cutoff (5): tp=2 fp=1 fn=1
    assert float(rows[-1][1]) == round(2 / 3, 4)
    assert float(rows[-1][2]) == round(2 / 3, 4)

    import os
    fp_rows = open(os.path.join(out_dir, "fp.vcf")).read()
    fn_rows = open(os.path.join(out_dir, "fn.vcf")).read()
    tp_rows = open(os.path.join(out_dir, "tp.vcf")).read()
    fp_fn_rows = open(os.path.join(out_dir, "fp_fn.vcf")).read()
    assert "chr1\t200" in fp_rows and "chr1\t100" not in fp_rows
    assert "chr1\t400" in fn_rows
    assert "chr1\t100" in tp_rows and "chr1\t300" in tp_rows
    assert "chr1\t200" in fp_fn_rows and "chr1\t400" in fp_fn_rows
