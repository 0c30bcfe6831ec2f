"""Label-space unit tests + differential parity vs the reference task package."""

import itertools

import pytest

from clair3_rna_tpu import task
from tests.conftest import requires_reference

BASES = "ACGT"


def test_gt21_labels():
    assert len(task.GT21_LABELS) == 21
    assert task.GT21_LABELS[task.GT21.AA] == "AA"
    assert task.GT21_LABELS[task.GT21.InsDel] == "InsDel"
    assert task.gt21_from_label("CT") == task.GT21.CT


def test_mix_partial_labels():
    assert task.mix_partial_labels("A", "C") == "AC"
    assert task.mix_partial_labels("C", "A") == "AC"
    assert task.mix_partial_labels("T", "T") == "TT"
    assert task.mix_partial_labels("A", "Ins") == "AIns"
    assert task.mix_partial_labels("Ins", "A") == "AIns"
    assert task.mix_partial_labels("Del", "Del") == "DelDel"
    assert task.mix_partial_labels("Ins", "Ins") == "InsIns"
    assert task.mix_partial_labels("Ins", "Del") == "InsDel"
    assert task.mix_partial_labels("Del", "Ins") == "InsDel"


def test_genotype_enum():
    assert task.genotype_enum_from(0, 0) == task.Genotype.homo_reference
    assert task.genotype_enum_from(1, 1) == task.Genotype.homo_variant
    assert task.genotype_enum_from(0, 1) == task.Genotype.hetero_variant
    assert task.genotype_enum_from(1, 2) == task.Genotype.hetero_variant_multi
    assert (
        task.genotype_enum_for_task(task.Genotype.hetero_variant_multi)
        == task.Genotype.hetero_variant
    )


def test_output_slices():
    assert task.GT21_SLICE.y_end_index == 21
    assert task.GENOTYPE_SLICE.y_end_index == 24
    assert task.VARIANT_LENGTH_1_SLICE.y_end_index == 57
    assert task.VARIANT_LENGTH_2_SLICE.y_end_index == 90


def test_label_vector_from_reference():
    vec = task.label_vector_from_reference("G")
    assert len(vec) == 90
    assert vec[task.GT21.GG] == 1
    assert sum(vec) == 4


@requires_reference
def test_gt21_parity(reference_path):
    ref_gt21 = pytest.importorskip("clair3_rna.task.gt21")
    assert list(ref_gt21.GT21_LABELS) == list(task.GT21_LABELS)
    for a, b in itertools.product(["A", "C", "G", "T", "Ins", "Del"], repeat=2):
        assert task.mix_partial_labels(a, b) == ref_gt21.mix_two_partial_labels(a, b)
    assert list(task.HOMO_SNP_GT21) == list(ref_gt21.HOMO_SNP_GT21)
    assert list(task.HETERO_SNP_GT21) == list(ref_gt21.HETERO_SNP_GT21)


@requires_reference
def test_label_vector_parity(reference_path):
    ref_main = pytest.importorskip("clair3_rna.task.main")
    cases = [
        ("A", "C", 0, 1),
        ("A", "C", 1, 1),
        ("A", "C,G", 1, 2),
        ("AT", "A", 0, 1),
        ("A", "ATTT", 1, 1),
        ("ACGT", "A,AC", 1, 2),
        ("A", "AC,ATT", 1, 2),
        ("ACC", "A,ACCTT", 1, 2),
    ]
    for ref, alt, g1, g2 in cases:
        expected = ref_main.output_labels_from_vcf_columns(["x", "y", ref, alt, str(g1), str(g2)])
        actual = task.label_vector_from_truth(ref, alt, g1, g2)
        assert actual == list(expected), (ref, alt, g1, g2)
    for base in BASES:
        assert task.label_vector_from_reference(base) == list(
            ref_main.output_labels_from_reference(base)
        )


@requires_reference
def test_config_parity(reference_path):
    import shared.param_p as ref_param
    from clair3_rna_tpu import config

    assert tuple(ref_param.channel) == config.CHANNELS
    assert ref_param.flankingBaseNum == config.FLANKING_BASE_NUM
    assert ref_param.no_of_positions == config.NO_OF_POSITIONS
    assert ref_param.max_depth == config.MAX_DEPTH
    assert ref_param.min_mq == config.MIN_MQ
    assert ref_param.min_bq == config.MIN_BQ
    assert ref_param.min_coverage == config.MIN_COVERAGE
    assert ref_param.snp_min_af == config.SNP_MIN_AF
    assert ref_param.indel_min_af == config.INDEL_MIN_AF
    assert ref_param.SAMTOOLS_VIEW_FILTER_FLAG == config.EXCLUDE_FLAGS
    assert ref_param.label_shape == config.LABEL_SHAPE
    assert ref_param.label_shape_cum == config.LABEL_SHAPE_CUM
    assert ref_param.CHUNK_SIZE == config.CHUNK_SIZE
    assert ref_param.min_thred_qual == config.QUAL_CUTOFF_BY_PLATFORM
    assert ref_param.min_af_dict == config.MIN_AF_BY_PLATFORM
    assert ref_param.support_platform_dict == config.SUPPORTED_FULL_PLATFORMS
    assert ref_param.model_name_platform_dict == config.PLATFORM_ALIASES
    assert ref_param.support_phasing_platform_dict == config.PHASING_SUPPORTED_PLATFORMS
    assert ref_param.skip_proportion_threshold == config.SKIP_PROPORTION_THRESHOLD
