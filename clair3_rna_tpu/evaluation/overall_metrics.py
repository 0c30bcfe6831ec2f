"""Coverage/AF-stratified benchmarking metrics.

Capability match for src/calculate_overall_metrics.py:101-442: re-filter a
call-vs-truth comparison by minimum coverage / alt support / AF (from a
'truths' support file), optionally disregard zygosity (allele-match
promotion), and sweep QUAL cutoffs for the best F1. Operates on our
compare_vcf result instead of hap.py-annotated VCFs -- no external hap.py
dependency."""

from dataclasses import dataclass

from clair3_rna_tpu.evaluation.compare_vcf import Metrics, compare_vcf
from clair3_rna_tpu.io.vcf import VcfReader


def metrics_from_counts(query_fp, query_tp, truth_fn, truth_tp):
    precision = query_tp / (query_tp + query_fp) if query_tp + query_fp else 0.0
    recall = truth_tp / (truth_tp + truth_fn) if truth_tp + truth_fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return round(precision, 6), round(recall, 6), round(f1, 6)


@dataclass
class StratifiedResult:
    qual: float
    precision: float
    recall: float
    f1: float
    tp: int
    fp: int
    fn: int


def stratified_metrics(call_fn, truth_fn, *, truths_support=None, bed_fn=None,
                       ctg_name=None, min_coverage=None, min_alt_coverage=None,
                       min_af=None, skip_genotyping=False, qual_sweep=True):
    """Filter truth sites by support thresholds, then sweep QUAL for best F1.

    truths_support: {(ctg,pos): (cov, [alt_cov], [af])} from
    evaluation.af_distribution.load_truths_file.
    """
    def site_passes(ctg, pos):
        if truths_support is None:
            return True
        info = truths_support.get((ctg, pos))
        if info is None:
            return True
        cov, alts, afs = info
        if min_coverage is not None and cov < min_coverage:
            return False
        if min_alt_coverage is not None and max(alts, default=0) < min_alt_coverage:
            return False
        if min_af is not None and max(afs, default=0.0) < min_af:
            return False
        return True

    base = compare_vcf(call_fn, truth_fn, bed_fn=bed_fn, ctg_name=ctg_name,
                       skip_genotyping=skip_genotyping)
    calls = VcfReader(call_fn, ctg_name=ctg_name, show_ref=False)
    qual_of = {(r.ctg_name, r.pos): (r.qual if r.qual is not None else 0.0)
               for r in calls.variant_dict.values()}

    tp_sites = [(c, p) for c, p, *_ in base.tp_sites if site_passes(c, p)]
    fp_sites = [(c, p) for c, p, *_ in base.fp_sites]
    fn_sites = [(c, p) for c, p, *_ in base.fn_sites if site_passes(c, p)]

    quals = sorted({int(qual_of.get(s, 0)) for s in tp_sites + fp_sites}) \
        if qual_sweep else [0]
    results = []
    for q in quals:
        tp = sum(1 for s in tp_sites if qual_of.get(s, 0) >= q)
        fp = sum(1 for s in fp_sites if qual_of.get(s, 0) >= q)
        fn = len(fn_sites) + (len(tp_sites) - tp)
        pre, rec, f1 = metrics_from_counts(fp, tp, fn, tp)
        results.append(StratifiedResult(q, pre, rec, f1, tp, fp, fn))
    results.sort(key=lambda r: r.f1, reverse=True)
    return results


def print_table(results, limit=5):
    print("QUAL\tPrecision\tRecall\tF1\tTP\tFP\tFN")
    for r in results[:limit]:
        print(f"{r.qual}\t{r.precision:.4f}\t{r.recall:.4f}\t{r.f1:.4f}"
              f"\t{r.tp}\t{r.fp}\t{r.fn}")
