"""Golden mpileup-column corpus for the emulation (pileup/text.py).

The tensor-parity oracle (tests/ref_harness.py) feeds EMULATED mpileup
columns into the reference's generate_tensor — so a shared misunderstanding
of an mpileup quirk would pass parity while diverging from production
samtools (/root/reference/src/create_tensor_pileup.py:113-176 parses the
real thing). This corpus pins the emulation to the samtools-1.x mpileup
text format spec by hand-derived expected strings, independent of our BAM
writer: each case is a read scenario (CIGAR + strand + position) whose
column output the `samtools mpileup --reverse-del` (no -f) documentation
determines exactly:

- match bases print as the read base, UPPER = forward, lower = reverse
  (no reference given, so no ./, matching);
- `^X` precedes the FIRST aligned base of a read, X = chr(mapq+33);
- `$` follows the base at the read's LAST reference-consuming position
  (after any attached indel string);
- an insertion between this base and the next prints as `+LLLseq` attached
  to the preceding base, seq cased by strand, LLL the decimal length
  (multi-digit for >= 10);
- a deletion following this base prints `-LLLbody`, body = N/n repeated
  (no reference fasta), and each deleted position itself prints `*`
  (forward) or `#` (reverse, --reverse-del) and COUNTS toward depth;
- a CIGAR N ref-skip prints `>` (forward) / `<` (reverse) at each skipped
  position and does NOT count toward depth;
- soft-clipped bases consume query only and never appear; hard clips and
  pads are invisible;
- bases with BQ below --min-BQ are dropped from the column entirely;
- positions with no covering entries produce no row at all.
"""

from dataclasses import dataclass, field

import pytest

from clair3_rna_tpu.io.bam import (CIGAR_D, CIGAR_H, CIGAR_I, CIGAR_M,
                                   CIGAR_N, CIGAR_P, CIGAR_S, CIGAR_X,
                                   CIGAR_EQ)
from clair3_rna_tpu.pileup.text import pileup_columns


@dataclass
class Read:
    """Duck-typed stand-in for io.bam.BamRecord (spec cases must not depend
    on our own BAM writer)."""
    pos: int
    cigar: list
    seq: str
    mapq: int = 60
    is_reverse: bool = False
    qual: bytes = b""
    tags: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.qual:
            self.qual = bytes([30] * len(self.seq))


def cols(records, start=0, end=100, min_bq=0, with_haplotype=False):
    return {c.pos: c for c in pileup_columns(records, start, end,
                                             min_bq=min_bq,
                                             with_haplotype=with_haplotype)}


# mapq 60 -> '^]' (chr(60+33) == ']'), the value real samtools prints
M60 = "^]"

CASES = [
    # (name, reads, {pos: (bases, depth)})
    ("forward_match_upper",
     [Read(5, [(CIGAR_M, 3)], "ACG")],
     {5: (M60 + "A", 1), 6: ("C", 1), 7: ("G$", 1)}),
    ("reverse_match_lower",
     [Read(5, [(CIGAR_M, 3)], "ACG", is_reverse=True)],
     {5: (M60 + "a", 1), 6: ("c", 1), 7: ("g$", 1)}),
    ("caret_encodes_mapq_plus_33",
     [Read(0, [(CIGAR_M, 1)], "T", mapq=0)],
     {0: ("^!T$", 1)}),  # mapq 0 -> '!'
    ("single_base_read_has_caret_and_dollar",
     [Read(9, [(CIGAR_M, 1)], "G")],
     {9: (M60 + "G$", 1)}),
    ("insertion_attaches_to_preceding_base",
     [Read(2, [(CIGAR_M, 2), (CIGAR_I, 2), (CIGAR_M, 1)], "ACTTG")],
     {2: (M60 + "A", 1), 3: ("C+2TT", 1), 4: ("G$", 1)}),
    ("insertion_reverse_lowercase",
     [Read(2, [(CIGAR_M, 1), (CIGAR_I, 3), (CIGAR_M, 1)], "ATTAG",
           is_reverse=True)],
     {2: (M60 + "a+3tta", 1), 3: ("g$", 1)}),
    ("multi_digit_insertion_length",
     [Read(0, [(CIGAR_M, 1), (CIGAR_I, 12), (CIGAR_M, 1)],
           "A" + "T" * 12 + "G")],
     {0: (M60 + "A+12" + "T" * 12, 1), 1: ("G$", 1)}),
    ("deletion_suffix_and_star_bodies",
     [Read(2, [(CIGAR_M, 1), (CIGAR_D, 3), (CIGAR_M, 1)], "AG")],
     # no reference fasta -> deletion body prints as N's
     {2: (M60 + "A-3NNN", 1), 3: ("*", 1), 4: ("*", 1), 5: ("*", 1),
      6: ("G$", 1)}),
    ("deletion_reverse_hash_bodies",  # --reverse-del
     [Read(2, [(CIGAR_M, 1), (CIGAR_D, 2), (CIGAR_M, 1)], "AG",
           is_reverse=True)],
     {2: (M60 + "a-2nn", 1), 3: ("#", 1), 4: ("#", 1), 5: ("g$", 1)}),
    ("multi_digit_deletion_length",
     [Read(0, [(CIGAR_M, 1), (CIGAR_D, 11), (CIGAR_M, 1)], "AG")],
     dict([(0, (M60 + "A-11" + "N" * 11, 1))]
          + [(p, ("*", 1)) for p in range(1, 12)] + [(12, ("G$", 1))])),
    ("deleted_positions_count_in_depth",
     [Read(0, [(CIGAR_M, 1), (CIGAR_D, 1), (CIGAR_M, 1)], "AG"),
      Read(0, [(CIGAR_M, 3)], "ATG")],
     {0: (M60 + "A-1N" + M60 + "A", 2), 1: ("*T", 2), 2: ("G$G$", 2)}),
    ("read_ending_in_deletion_gets_dollar_on_star",
     [Read(0, [(CIGAR_M, 1), (CIGAR_D, 2)], "A")],
     {0: (M60 + "A-2NN", 1), 1: ("*", 1), 2: ("*$", 1)}),
    ("refskip_angle_brackets_not_in_depth",
     [Read(0, [(CIGAR_M, 1), (CIGAR_N, 3), (CIGAR_M, 1)], "AG")],
     {0: (M60 + "A", 1), 1: (">", 0), 2: (">", 0), 3: (">", 0),
      4: ("G$", 1)}),
    ("refskip_reverse_left_bracket",
     [Read(0, [(CIGAR_M, 1), (CIGAR_N, 2), (CIGAR_M, 1)], "AG",
           is_reverse=True)],
     {0: (M60 + "a", 1), 1: ("<", 0), 2: ("<", 0), 3: ("g$", 1)}),
    ("refskip_stacks_with_covering_read",
     [Read(0, [(CIGAR_M, 1), (CIGAR_N, 1), (CIGAR_M, 1)], "AG"),
      Read(1, [(CIGAR_M, 1)], "C")],
     {0: (M60 + "A", 1), 1: (">" + M60 + "C$", 1), 2: ("G$", 1)}),
    ("soft_clips_invisible",
     [Read(5, [(CIGAR_S, 2), (CIGAR_M, 2), (CIGAR_S, 3)], "TTACGGG")],
     {5: (M60 + "A", 1), 6: ("C$", 1)}),
    ("hard_clip_and_pad_invisible",
     [Read(5, [(CIGAR_H, 4), (CIGAR_M, 2), (CIGAR_P, 1), (CIGAR_H, 2)],
           "AC")],
     {5: (M60 + "A", 1), 6: ("C$", 1)}),
    ("eq_and_x_ops_behave_like_match",
     [Read(0, [(CIGAR_EQ, 1), (CIGAR_X, 1)], "AT")],
     {0: (M60 + "A", 1), 1: ("T$", 1)}),
    ("insertion_then_read_end_dollar_after_indel",
     [Read(0, [(CIGAR_M, 2), (CIGAR_I, 2)], "ACTT")],
     {0: (M60 + "A", 1), 1: ("C+2TT$", 1)}),
    ("column_concatenates_in_record_order",
     [Read(0, [(CIGAR_M, 1)], "A"),
      Read(0, [(CIGAR_M, 1)], "C", is_reverse=True),
      Read(0, [(CIGAR_M, 1)], "G")],
     {0: (M60 + "A$" + M60 + "c$" + M60 + "G$", 3)}),
    ("uncovered_positions_emit_no_row",
     [Read(3, [(CIGAR_M, 1)], "A")],
     {3: (M60 + "A$", 1)}),
]


@pytest.mark.parametrize("name,reads,expected",
                         CASES, ids=[c[0] for c in CASES])
def test_mpileup_golden(name, reads, expected):
    got = cols(reads)
    assert set(got) == set(expected), f"{name}: covered positions differ"
    for pos, (bases, depth) in expected.items():
        assert got[pos].bases == bases, (
            f"{name} pos {pos}: {got[pos].bases!r} != {bases!r}")
        assert got[pos].depth == depth, (
            f"{name} pos {pos}: depth {got[pos].depth} != {depth}")


def test_low_bq_bases_dropped_from_column():
    # --min-BQ drops the base entirely (it neither prints nor counts)
    r = Read(0, [(CIGAR_M, 3)], "ACG", qual=bytes([30, 3, 30]))
    got = cols([r], min_bq=10)
    assert got[0].bases == M60 + "A"
    assert 1 not in got          # the dropped base was the only entry
    assert got[2].bases == "G$"


def test_window_edges_clip_entries():
    # entries outside [start, end) never appear, including indel suffix
    # carriers and deletion bodies straddling the boundary
    r = Read(8, [(CIGAR_M, 2), (CIGAR_D, 3), (CIGAR_M, 1)], "ACG")
    got = cols([r], start=10, end=12)
    assert sorted(got) == [10, 11]
    assert got[10].bases == "*" and got[11].bases == "*"


def test_haplotype_tags_tracked_per_entry():
    reads = [Read(0, [(CIGAR_M, 1)], "A", tags={"HP": 1}),
             Read(0, [(CIGAR_M, 1)], "C", tags={"HP": 2}),
             Read(0, [(CIGAR_M, 1)], "G")]
    got = cols(reads, with_haplotype=True)
    assert got[0].haplotypes == ["1", "2", "0"]
