"""Decoder parity: our decode_one vs reference output_with on identical
probabilities + alt_info across outcome classes."""

import numpy as np
import pytest

from tests.conftest import requires_reference


def _softmax(x):
    e = np.exp(x - x.max())
    return (e / e.sum()).astype(np.float32)


def _make_cases(add_indel_length):
    rng = np.random.RandomState(42)
    ref33 = "ACGTACGTACGTACGT" + "G" + "TACGTACGTACGTACG"
    cases = []

    def probs(gt21_peak=None, geno_peak=None, vl_peaks=(16, 16), sharp=6.0):
        gt21 = rng.randn(21).astype(np.float32)
        if gt21_peak is not None:
            gt21[gt21_peak] += sharp
        geno = rng.randn(3).astype(np.float32)
        if geno_peak is not None:
            geno[geno_peak] += sharp
        vl1 = rng.randn(33).astype(np.float32)
        vl2 = rng.randn(33).astype(np.float32)
        vl1[vl_peaks[0]] += sharp
        vl2[vl_peaks[1]] += sharp
        return _softmax(gt21), _softmax(geno), _softmax(vl1), _softmax(vl2)

    # homRef early exit
    cases.append((probs(7, 0, sharp=8.0), "25-RG 24 XA 1"))
    # hom SNP  (GG ref, peak AA + homo)
    cases.append((probs(0, 1), "30-XA 26 RG 4"))
    # het SNP ref/alt
    cases.append((probs(2, 2), "28-XA 13 RG 15"))
    # het SNP multi (AC, ref G)
    cases.append((probs(1, 2), "31-XA 14 XC 13 RG 4"))
    # hom ins
    cases.append((probs(15, 1, vl_peaks=(18, 18)), "22-IGTT 20 RG 2"))
    # het ins (GIns)
    cases.append((probs(18, 2, vl_peaks=(16, 18)), "26-IGTT 12 RG 13"))
    # het SNP+ins multi (AIns)
    cases.append((probs(16, 2, vl_peaks=(16, 18)), "27-XA 10 IGTT 9 RG 8"))
    # hetero InsIns
    cases.append((probs(15, 2, vl_peaks=(17, 18)), "24-IGT 9 IGTTA 8 RG 6"))
    # hom del
    cases.append((probs(10, 1, vl_peaks=(14, 14)), "23-DTA 19 RG 3"))
    # het del (GDel)
    cases.append((probs(13, 2, vl_peaks=(14, 16)), "25-DTA 11 RG 13"))
    # het SNP+del multi (ADel)
    cases.append((probs(11, 2, vl_peaks=(14, 16)), "26-XA 9 DTA 10 RG 7"))
    # hetero DelDel
    cases.append((probs(10, 2, vl_peaks=(13, 15)), "27-DT 8 DTAC 9 RG 9"))
    # InsDel
    cases.append((probs(20, 2, vl_peaks=(14, 18)), "25-IGTT 9 DTA 8 RG 8"))
    # evidence-missing fallbacks: network says ins but no ins in alt_info
    cases.append((probs(15, 1, vl_peaks=(18, 18)), "20-XA 9 RG 11"))
    # network says SNP A but reads support T (depth-gap retarget)
    cases.append((probs(0, 1), "40-XT 30 XA 2 RG 8"))
    # no evidence at all
    cases.append((probs(0, 1), "15-RG 15"))
    # zero depth
    cases.append((probs(7, 0, sharp=8.0), "0-"))
    return ref33, cases


def _reference_rows(ref33, cases, add_indel_length, show_ref, gvcf=False):
    import sys
    sys.path.insert(0, "/root/reference")
    import clair3_rna.call_variants as cv

    captured = []
    output_utilities = cv.OutputUtilities(
        print_debug_message=lambda *a, **k: None,
        output=captured.append,
        output_header=lambda: None,
        close_opened_files=lambda: None,
        gen_output_file=lambda: None,
    )
    output_config = cv.OutputConfig(
        is_show_reference=show_ref, is_debug=False,
        is_haploid_precise_mode_enabled=False,
        is_haploid_sensitive_mode_enabled=False,
        is_output_for_ensemble=False, quality_score_for_pass=None,
        tensor_fn="PIPE", input_probabilities=False,
        add_indel_length=add_indel_length, gvcf=gvcf, pileup=True,
        enable_long_indel=False,
        maximum_variant_length_that_need_infer=50,
        keep_iupac_bases=False,
    )
    rows = []
    for i, ((gt21, geno, vl1, vl2), alt_info) in enumerate(cases):
        captured.clear()
        cv.output_with(
            f"chr1:{1000 + i}:{ref33}", alt_info, gt21, geno,
            vl1 if add_indel_length else 0, vl2 if add_indel_length else 0,
            output_config, output_utilities)
        rows.append(captured[0] if captured else None)
    return rows


def _our_rows(ref33, cases, add_indel_length, show_ref, gvcf=False):
    from clair3_rna_tpu.caller.decode import CallConfig, decode_one

    call_cfg = CallConfig(show_ref=show_ref, add_indel_length=add_indel_length,
                          gvcf=gvcf)
    rows = []
    for i, ((gt21, geno, vl1, vl2), alt_info) in enumerate(cases):
        rows.append(decode_one(
            "chr1", 1000 + i, ref33, alt_info, gt21, geno,
            vl1 if add_indel_length else None, vl2 if add_indel_length else None,
            call_cfg))
    return rows


@requires_reference
@pytest.mark.parametrize("add_indel_length,show_ref",
                         [(False, False), (False, True), (True, False), (True, True)])
def test_decode_parity(reference_path, add_indel_length, show_ref):
    ref33, cases = _make_cases(add_indel_length)
    ref_rows = _reference_rows(ref33, cases, add_indel_length, show_ref)
    our_rows = _our_rows(ref33, cases, add_indel_length, show_ref)
    for i, (a, b) in enumerate(zip(our_rows, ref_rows)):
        assert a == b, f"case {i}:\nours: {a}\nref : {b}"


@requires_reference
def test_decode_parity_gvcf_pl(reference_path):
    ref33, cases = _make_cases(False)
    ref_rows = _reference_rows(ref33, cases, False, True, gvcf=True)
    our_rows = _our_rows(ref33, cases, False, True, gvcf=True)
    for i, (a, b) in enumerate(zip(our_rows, ref_rows)):
        assert a == b, f"case {i}:\nours: {a}\nref : {b}"


@requires_reference
def test_decode_parity_random_fuzz(reference_path):
    """Fuzz: random probability vectors + random alt_info across many sites."""
    rng = np.random.RandomState(7)
    ref33 = "ACGTACGTACGTACGT" + "C" + "TACGTACGTACGTACG"
    cases = []
    for _ in range(300):
        gt21 = _softmax(rng.randn(21).astype(np.float32) * rng.uniform(0.5, 6))
        geno = _softmax(rng.randn(3).astype(np.float32) * rng.uniform(0.5, 6))
        vl1 = _softmax(rng.randn(33).astype(np.float32) * 3)
        vl2 = _softmax(rng.randn(33).astype(np.float32) * 3)
        entries = []
        depth = rng.randint(0, 60)
        for base in "AGT":
            if rng.rand() < 0.5:
                entries.append(f"X{base} {rng.randint(1, 20)}")
        if rng.rand() < 0.5:
            entries.append(f"IC{'ACGT'[rng.randint(4)] * rng.randint(1, 4)} {rng.randint(1, 10)}")
        if rng.rand() < 0.4:
            entries.append(f"ICGT {rng.randint(1, 10)}")
        if rng.rand() < 0.5:
            entries.append(f"DTA {rng.randint(1, 10)}")
        if rng.rand() < 0.3:
            entries.append(f"DT {rng.randint(1, 10)}")
        if rng.rand() < 0.8:
            entries.append(f"RC {rng.randint(1, 30)}")
        alt_info = f"{depth}-" + " ".join(entries)
        cases.append(((gt21, geno, vl1, vl2), alt_info))
    for add_indel in (False, True):
        ref_rows = _reference_rows(ref33, cases, add_indel, True)
        our_rows = _our_rows(ref33, cases, add_indel, True)
        for i, (a, b) in enumerate(zip(our_rows, ref_rows)):
            assert a == b, f"indel={add_indel} case {i}:\nours: {a}\nref : {b}"


def _reference_rows_flags(ref33, cases, *, show_ref=True, haploid_precise=False,
                          haploid_sensitive=False, keep_iupac_bases=False,
                          enable_long_indel=False):
    """Reference output_with with the previously-untested decode modes
    (clair3_rna/call_variants.py:1117-1392 flag branches)."""
    import sys
    sys.path.insert(0, "/root/reference")
    import clair3_rna.call_variants as cv

    captured = []
    output_utilities = cv.OutputUtilities(
        print_debug_message=lambda *a, **k: None,
        output=captured.append,
        output_header=lambda: None,
        close_opened_files=lambda: None,
        gen_output_file=lambda: None,
    )
    max_len = 100000 if enable_long_indel else 50
    output_config = cv.OutputConfig(
        is_show_reference=show_ref, is_debug=False,
        is_haploid_precise_mode_enabled=haploid_precise,
        is_haploid_sensitive_mode_enabled=haploid_sensitive,
        is_output_for_ensemble=False, quality_score_for_pass=None,
        tensor_fn="PIPE", input_probabilities=False,
        add_indel_length=False, gvcf=False, pileup=True,
        enable_long_indel=enable_long_indel,
        maximum_variant_length_that_need_infer=max_len,
        keep_iupac_bases=keep_iupac_bases,
    )
    rows = []
    for i, ((gt21, geno, vl1, vl2), alt_info) in enumerate(cases):
        captured.clear()
        cv.output_with(f"chr1:{1000 + i}:{ref33}", alt_info, gt21, geno,
                       0, 0, output_config, output_utilities)
        rows.append(captured[0] if captured else None)
    return rows


def _our_rows_flags(ref33, cases, *, show_ref=True, haploid_precise=False,
                    haploid_sensitive=False, keep_iupac_bases=False,
                    enable_long_indel=False):
    from clair3_rna_tpu.caller.decode import CallConfig, decode_one

    call_cfg = CallConfig(show_ref=show_ref, haploid_precise=haploid_precise,
                          haploid_sensitive=haploid_sensitive,
                          keep_iupac_bases=keep_iupac_bases,
                          enable_long_indel=enable_long_indel)
    rows = []
    for i, ((gt21, geno, vl1, vl2), alt_info) in enumerate(cases):
        rows.append(decode_one("chr1", 1000 + i, ref33, alt_info, gt21, geno,
                               None, None, call_cfg))
    return rows


def _mode_fuzz_cases(rng, n=250, long_indel=False):
    cases = []
    for _ in range(n):
        gt21 = _softmax(rng.randn(21).astype(np.float32) * rng.uniform(0.5, 6))
        geno = _softmax(rng.randn(3).astype(np.float32) * rng.uniform(0.5, 6))
        vl1 = _softmax(rng.randn(33).astype(np.float32) * 3)
        vl2 = _softmax(rng.randn(33).astype(np.float32) * 3)
        entries = []
        depth = rng.randint(0, 60)
        for base in "AGT":
            if rng.rand() < 0.6:
                entries.append(f"X{base} {rng.randint(1, 20)}")
        if rng.rand() < 0.5:
            ins_len = rng.randint(52, 80) if long_indel and rng.rand() < 0.5 \
                else rng.randint(1, 4)
            ins = "".join("ACGT"[rng.randint(4)] for _ in range(ins_len))
            entries.append(f"IC{ins} {rng.randint(1, 10)}")
        if rng.rand() < 0.5:
            del_len = rng.randint(52, 80) if long_indel and rng.rand() < 0.5 \
                else rng.randint(1, 4)
            dseq = "".join("ACGT"[rng.randint(4)] for _ in range(del_len))
            entries.append(f"D{dseq} {rng.randint(1, 10)}")
        if rng.rand() < 0.8:
            entries.append(f"RC {rng.randint(1, 30)}")
        alt_info = f"{depth}-" + " ".join(entries)
        cases.append(((gt21, geno, vl1, vl2), alt_info))
    return cases


@requires_reference
@pytest.mark.parametrize("mode", ["haploid_precise", "haploid_sensitive",
                                  "keep_iupac_bases", "enable_long_indel"])
def test_decode_parity_modes(reference_path, mode):
    """The four previously-untested decode-mode branches, fuzzed against the
    reference oracle (clair3_rna/call_variants.py:1117-1392)."""
    rng = np.random.RandomState(99)
    if mode == "keep_iupac_bases":
        # IUPAC center base exercises convert_iupac_to_n vs pass-through
        ref33 = "ACGTACGTACGTACGT" + "R" + "TACGTACGTACGTACG"
    else:
        ref33 = "ACGTACGTACGTACGT" + "C" + "TACGTACGTACGTACG"
    cases = _mode_fuzz_cases(rng, long_indel=(mode == "enable_long_indel"))
    flags = {mode: True}
    ref_rows = _reference_rows_flags(ref33, cases, **flags)
    our_rows = _our_rows_flags(ref33, cases, **flags)
    n_rows = sum(1 for r in our_rows if r is not None)
    assert n_rows > 20  # the mode must not suppress everything
    for i, (a, b) in enumerate(zip(our_rows, ref_rows)):
        assert a == b, f"{mode} case {i}:\nours: {a}\nref : {b}"
    # and with the flag OFF the same cases still agree (guards interactions)
    ref_off = _reference_rows_flags(ref33, cases)
    our_off = _our_rows_flags(ref33, cases)
    for i, (a, b) in enumerate(zip(our_off, ref_off)):
        assert a == b, f"{mode}=off case {i}:\nours: {a}\nref : {b}"
    # the mode must have actually changed some outputs, or the parity above
    # proves nothing about the branch
    assert our_rows != our_off, f"{mode} had no observable effect"
