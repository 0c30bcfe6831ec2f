"""CLI subcommands for the evaluation toolkit."""

import os


def add_tool_parsers(subparsers):
    p = subparsers.add_parser("compare_vcf", help="benchmark calls vs truth VCF")
    p.add_argument("--vcf_fn", required=True, help="called VCF")
    p.add_argument("--truth_vcf_fn", required=True)
    p.add_argument("--bed_fn", default=None, help="high-confidence regions")
    p.add_argument("--ctg_name", default=None)
    p.add_argument("--qual", type=float, default=None)
    p.add_argument("--skip_genotyping", action="store_true",
                   help="count allele matches as TP regardless of zygosity")
    p.add_argument("--best_f1", action="store_true",
                   help="sweep QUAL cutoffs for the best F1")

    t = subparsers.add_parser("phase_bam",
                              help="read-backed phasing + HP haplotagging")
    t.add_argument("--bam_fn", required=True)
    t.add_argument("--ref_fn", required=True)
    t.add_argument("--vcf_fn", required=True, help="first-pass het calls")
    t.add_argument("--output_bam_fn", required=True)
    t.add_argument("--ctg_name", default=None)

    b = subparsers.add_parser("get_rna_bed",
                              help="coverage >= N BED from a BAM (mosdepth+"
                                   "bedtools replacement)")
    b.add_argument("--bam_fn", required=True)
    b.add_argument("--output_fn", required=True)
    b.add_argument("--min_coverage", type=int, default=4)
    b.add_argument("--high_conf_bed_fn", default=None,
                   help="intersect with this BED (e.g. GIAB high-confidence)")


def dispatch_tool(args) -> bool:
    if args.command == "compare_vcf":
        from clair3_rna_tpu.evaluation.compare_vcf import (
            best_f1_qual_sweep, compare_vcf, print_report)
        if args.best_f1:
            q, result = best_f1_qual_sweep(
                args.vcf_fn, args.truth_vcf_fn, bed_fn=args.bed_fn,
                ctg_name=args.ctg_name, skip_genotyping=args.skip_genotyping)
            print_report(result, title=f"best F1 at QUAL>={q}")
        else:
            result = compare_vcf(
                args.vcf_fn, args.truth_vcf_fn, bed_fn=args.bed_fn,
                ctg_name=args.ctg_name, min_qual=args.qual,
                skip_genotyping=args.skip_genotyping)
            print_report(result)
        return True
    if args.command == "phase_bam":
        from clair3_rna_tpu.phasing.pipeline import phase_and_haplotag
        contigs = args.ctg_name.split(",") if args.ctg_name else None
        phase_and_haplotag(args.bam_fn, args.ref_fn, args.vcf_fn,
                           args.output_bam_fn, contigs=contigs)
        return True
    if args.command == "get_rna_bed":
        from clair3_rna_tpu.evaluation.rna_bed import build_rna_bed
        build_rna_bed(args.bam_fn, args.output_fn,
                      min_coverage=args.min_coverage,
                      high_conf_bed_fn=args.high_conf_bed_fn)
        return True
    return False
