#!/usr/bin/env python
"""Measure the phasing-model F1 delta on synthetic data.

The reference reports +~2% SNP / +~6% indel F1 from its phasing model on
real data (README.md:50). Real lrRNA data is unreachable here, so this
experiment quantifies the same A/B on synthetic reads with a raised error
rate (clean synthetic reads leave nothing for haplotype channels to
disambiguate; noise is what makes per-haplotype counts informative):

  1. simulate a diploid dataset with planted haplotypes + sequencing errors
  2. train an 18-channel model on unphased tensors, call, score F1
  3. phase+haplotag with our pairwise phaser, train a 30-channel model on
     phased tensors, re-call, score F1
  4. print both and the delta (updates docs/quick_demo.md numbers)

Run: python tools/phased_delta.py [--depth 25] [--error-rate 0.06]
"""

import argparse
import os
import random
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_truth_vcf(path, variants):
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tS\n")
        for v in variants["chr1"]:
            gt = "1/1" if v.genotype == (1, 1) else "0/1"
            f.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\t"
                    f"GT\t{gt}\n")


def f1_of(call_vcf, truth_vcf):
    from clair3_rna_tpu.evaluation.compare_vcf import compare_vcf
    r = compare_vcf(call_vcf, truth_vcf, skip_genotyping=True)
    return {"overall": r.overall.f1, "snv": r.by_type["snv"].f1,
            "ins": r.by_type["ins"].f1, "del": r.by_type["del"].f1}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--contig-len", type=int, default=400_000)
    ap.add_argument("--n-variants", type=int, default=1200)
    ap.add_argument("--depth", type=int, default=25)
    ap.add_argument("--error-rate", type=float, default=0.06)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    from tests import simdata
    from clair3_rna_tpu.cli import main as cli
    from clair3_rna_tpu.io.fasta import write_fasta

    with tempfile.TemporaryDirectory() as d:
        rng = random.Random(4242)
        genome = simdata.random_genome(rng, [("chr1", args.contig_len)])
        variants = simdata.plant_variants(
            rng, genome, n_per_contig=args.n_variants,
            het_genotypes=((0, 1), (1, 0)))
        fasta = os.path.join(d, "ref.fa")
        bam = os.path.join(d, "reads.bam")
        truth = os.path.join(d, "truth.vcf")
        write_fasta(fasta, genome)
        simdata.simulate_bam(bam, genome, variants, rng, depth=args.depth,
                             error_rate=args.error_rate)
        build_truth_vcf(truth, variants)

        # A: unphased model
        bins = os.path.join(d, "bins18")
        w18 = os.path.join(d, "w18.npz")
        cli(["tensor2bin", "--bam_fn", bam, "--ref_fn", fasta,
             "--truth_vcf_fn", truth, "--output_dir", bins,
             "--non_variant_keep_fraction", "1.0"])
        cli(["train", "--bin_dir", bins, "--output_fn", w18,
             "--no_indel_length", "--max_epochs", str(args.epochs),
             "--batch_size", "256"])
        out18 = os.path.join(d, "call18")
        cli(["call", "-B", bam, "-R", fasta, "-o", out18, "--model_path",
             w18, "--include_all_ctgs", "--no_compress"])
        f18 = f1_of(os.path.join(out18, "output.vcf"), truth)

        # B: phase + haplotag with OUR pairwise phaser, then phased model
        tagged = os.path.join(d, "tagged.bam")
        cli(["phase_bam", "--bam_fn", bam, "--ref_fn", fasta, "--vcf_fn",
             os.path.join(out18, "output.vcf"), "--output_bam_fn", tagged])
        bins30 = os.path.join(d, "bins30")
        w30 = os.path.join(d, "w30.npz")
        cli(["tensor2bin", "--bam_fn", tagged, "--ref_fn", fasta,
             "--truth_vcf_fn", truth, "--output_dir", bins30, "--phased",
             "--non_variant_keep_fraction", "1.0"])
        cli(["train", "--bin_dir", bins30, "--output_fn", w30, "--phased",
             "--no_indel_length", "--max_epochs", str(args.epochs),
             "--batch_size", "256"])
        out30 = os.path.join(d, "call30")
        cli(["call", "-B", bam, "-R", fasta, "-o", out30, "--model_path",
             w18, "--include_all_ctgs", "--no_compress",
             "--enable_phasing_model", "--phased_model_path", w30])
        phased_vcf = os.path.join(out30, "output_enable_phasing.vcf")
        if not os.path.exists(phased_vcf):
            phased_vcf = os.path.join(out30, "output.vcf")
        f30 = f1_of(phased_vcf, truth)

        print("F1 (zygosity disregarded, skip_genotyping):")
        print(f"{'':12}{'unphased':>10}{'phased':>10}{'delta':>9}")
        for k in ("overall", "snv", "ins", "del"):
            print(f"{k:12}{f18[k]:>10.4f}{f30[k]:>10.4f}"
                  f"{f30[k] - f18[k]:>+9.4f}")


if __name__ == "__main__":
    main()
