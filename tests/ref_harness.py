"""Differential-test harness around the reference implementation.

Feeds mpileup columns emulated from a BAM (clair3_rna_tpu.pileup.text) into
the reference's `generate_tensor` and replicates the surrounding streaming
ring-buffer loop of CreateTensorPileup (src/create_tensor_pileup.py:463-637)
faithfully, so our vectorized builder can be compared line-for-line without
samtools. Requires /root/reference on sys.path (reference_path fixture).
"""

from clair3_rna_tpu import config
from clair3_rna_tpu.io.bam import BamReader
from clair3_rna_tpu.io.fasta import FastaFile
from clair3_rna_tpu.pileup.text import pileup_columns


def reference_tensor_rows(bam_path, fasta_path, ctg, start0, end0, *,
                          platform="ont", snp_min_af=0.08, indel_min_af=0.15,
                          min_coverage=4, fast_mode=False, call_snp_only=False,
                          head_tail=False, splice_padding=False, phased=False):
    """Run the reference tensor-generation semantics; returns TSV rows.

    start0/end0 are the 0-based chunk bounds (rows extend +-33 like the
    reference's mpileup region).
    """
    from src.create_tensor_pileup import generate_tensor, get_flanked_sequence

    flanking = 16
    window = 33
    fasta = FastaFile(fasta_path)
    contig_len = fasta.contig_length(ctg)
    row_lo = max(0, start0 - window)
    row_hi = min(contig_len, end0 + window)
    ref_lo = max(0, start0 - config.EXPAND_REFERENCE_REGION)
    ref_hi = min(contig_len, end0 + config.EXPAND_REFERENCE_REGION)
    reference_sequence = fasta.fetch(ctg, ref_lo, ref_hi)
    reference_start = ref_lo + 1  # 1-based

    bam = BamReader(bam_path)
    records = list(bam.fetch(ctg, row_lo, row_hi, exclude_flags=2316, min_mapq=5))
    columns = pileup_columns(records, row_lo, row_hi, min_bq=0,
                             with_haplotype=phased)

    channel_size = 18 + (12 if phased else 0)
    tensor = [[]] * window if not head_tail else [[0] * channel_size] * window
    candidate_position = []
    all_alt_dict, depth_dict, af_dict, max_skip_count_dict = {}, {}, {}, {}
    pos_offset = 0
    pre_pos = -1
    rows = []

    def emit(center, concat_tensor):
        depth = depth_dict[center]
        ref_seq33 = get_flanked_sequence(reference_sequence, center, flanking,
                                         reference_start)
        alt_info = str(depth) + "-" + " ".join(
            " ".join([item[0], str(item[1])]) for item in all_alt_dict[center].items()
        )
        rows.append("%s\t%d\t%s\t%s\t%s" % (
            ctg, center, ref_seq33,
            " ".join(" ".join("%d" % x for x in inner) for inner in concat_tensor),
            alt_info,
        ))

    for col in columns:
        pos = col.pos + 1  # mpileup rows are 1-based
        pileup_bases = col.bases
        phasing_info = col.haplotypes if phased else None
        reference_base = reference_sequence[pos - reference_start].upper()

        if pre_pos + 1 != pos:
            pos_offset = 0
            tensor = [[]] * window if not head_tail else [[0] * channel_size] * window
            candidate_position = []
        pre_pos = pos

        (pileup_tensor, alt_dict, af, depth, pass_af, pileup_list,
         max_del_length, max_skip_count) = generate_tensor(
            pos=pos, pileup_bases=pileup_bases,
            reference_sequence=reference_sequence,
            reference_start=reference_start, reference_base=reference_base,
            minimum_af_for_candidate=0.08,
            minimum_snp_af_for_candidate=snp_min_af,
            minimum_indel_af_for_candidate=indel_min_af,
            platform=platform, fast_mode=fast_mode,
            call_snp_only=call_snp_only, phasing_info=phasing_info)

        if splice_padding:
            max_skip_count_dict[pos] = max_skip_count
            depth_dict[pos] = depth
        if depth > 0 and (snp_min_af == 0.0 or indel_min_af == 0.0):
            pass_af = True

        if reference_base in "ACGT" and pass_af and depth >= min_coverage:
            candidate_position.append(pos)
            all_alt_dict[pos] = alt_dict
            depth_dict[pos] = depth
            af_dict[pos] = af
        tensor[pos_offset] = pileup_tensor
        pos_offset = (pos_offset + 1) % window

        if len(candidate_position) and pos - candidate_position[0] == flanking:
            center = candidate_position.pop(0)
            has_empty_tensor = sum([True for item in tensor if not len(item)])
            if not has_empty_tensor:
                depth = depth_dict[center]
                concat_tensor = tensor[pos_offset:] + tensor[0:pos_offset]
                if splice_padding:
                    max_depth = max(depth_dict[p] for p in
                                    range(center - flanking, center + flanking + 1)
                                    if p in depth_dict)
                    max_skip_count = max(max_skip_count_dict[p] for p in
                                         range(center - flanking, center + flanking + 1)
                                         if p in max_skip_count_dict)
                    if max_skip_count / float(max_depth) > 0.2:
                        center_strand = center - reference_start
                        ref = reference_sequence[center_strand]
                        from src.create_tensor_pileup import BASE2INDEX
                        strand_forward = concat_tensor[flanking][BASE2INDEX[ref.upper()]]
                        strand_reverse = concat_tensor[flanking][BASE2INDEX[ref.lower()]]
                        strand_forward = abs(strand_forward)
                        strand_reverse = abs(strand_reverse)
                        total = strand_forward + strand_reverse
                        strand_forward_pct = strand_forward / float(total) if total > 0 else 0
                        strand_reverse_pct = 1 - strand_forward_pct
                        for idx in range(flanking * 2 + 1):
                            p = center - flanking + idx
                            current_depth = depth_dict[p] if p in depth_dict else 0
                            if current_depth < depth * 0.2 and idx != flanking:
                                # NB: mutates the shared ring-buffer row list,
                                # exactly like the reference (create_tensor_pileup.py:592-593):
                                # padding persists into later overlapping windows
                                ref_p = reference_sequence[p - reference_start].upper()
                                concat_tensor[idx][BASE2INDEX[ref_p.upper()]] = \
                                    -1 * int(depth * strand_forward_pct)
                                concat_tensor[idx][BASE2INDEX[ref_p.lower()]] = \
                                    -1 * int(depth * strand_reverse_pct)
                emit(center, concat_tensor)
                del all_alt_dict[center], depth_dict[center], af_dict[center]

    if head_tail:
        ens_pos = pre_pos + flanking
        for pos in range(pre_pos + 1, ens_pos + 1):
            tensor[pos_offset] = [0] * channel_size
            pos_offset = (pos_offset + 1) % window
            if pos - flanking in candidate_position:
                center = pos - flanking
                has_empty_tensor = sum([True for item in tensor if not len(item)])
                if not has_empty_tensor:
                    concat_tensor = tensor[pos_offset:] + tensor[0:pos_offset]
                    emit(center, concat_tensor)

    return rows
