"""End-to-end parity: BAM -> tensors -> network -> decode, our pipeline vs
the reference chain (emulated mpileup -> generate_tensor -> TF Clair3_P ->
batch_output), with weights converted from the same random-init TF model.

All fields must match exactly except QUAL/GQ, which may differ in the last
rounded digit because TF and XLA re-associate float32 differently (the decode
layer itself is proven bit-exact in test_decode_parity on identical inputs).
"""

import numpy as np
import pytest

from clair3_rna_tpu.config import PileupConfig
from clair3_rna_tpu.caller.decode import CallConfig
from clair3_rna_tpu.caller.pipeline import call_tensor_records
from clair3_rna_tpu.io.bam import BamReader
from clair3_rna_tpu.io.fasta import FastaFile
from clair3_rna_tpu.pileup.chunk import ChunkTask, build_chunk_tensors
from tests import simdata
from tests.conftest import requires_reference
from tests.ref_harness import reference_tensor_rows


def _reference_call_chain(tensor_rows, tf_model, show_ref,
                          add_indel_length=False):
    """Reference utils.tensor_generator_from + call_variants.batch_output."""
    import sys
    sys.path.insert(0, "/root/reference")
    import clair3_rna.call_variants as cv
    import shared.param_p as param

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
        add_indel_length=add_indel_length, gvcf=False, pileup=True,
        enable_long_indel=False,
        maximum_variant_length_that_need_infer=50,
        keep_iupac_bases=False,
    )

    batch_size = param.predictBatchSize
    for lo in range(0, len(tensor_rows), batch_size):
        batch = tensor_rows[lo:lo + batch_size]
        tensors, positions, alt_infos = [], [], []
        for row in batch:
            chrom, coord, seq, tensor, alt_info = row.split("\t")
            t = np.array(tensor.split(), dtype=np.int32)
            depth = int(alt_info.split("-", maxsplit=1)[0])
            max_depth = param.max_depth_dict["ont"]
            out = np.empty(len(t), dtype=np.int32)
            if depth > 0 and depth > max_depth * 1.5:
                out[:] = t / (depth / max_depth)
            else:
                out[:] = t
            tensors.append(out.reshape(33, -1))
            positions.append(chrom + ":" + coord + ":" + seq)
            alt_infos.append(alt_info)
        X = np.stack(tensors)
        prediction = np.asarray(tf_model(X))
        cv.batch_output(positions, alt_infos, prediction, output_config,
                        output_utilities)
    return captured


def _split_for_compare(row):
    cols = row.split("\t")
    qual = float(cols[5])
    fmt_vals = cols[9].split(":")
    gq = float(fmt_vals[1])
    cols[5] = "QUAL"
    fmt_vals[1] = "GQ"
    cols[9] = ":".join(fmt_vals)
    return cols, qual, gq


def _assert_rows_match(our_rows, ref_rows):
    assert len(our_rows) == len(ref_rows), (
        f"row count: ours={len(our_rows)} ref={len(ref_rows)}\n"
        f"ours: {our_rows[:3]}\nref: {ref_rows[:3]}")
    n_exact = 0
    for i, (a, b) in enumerate(zip(our_rows, ref_rows)):
        if a == b:
            n_exact += 1
            continue
        cols_a, qual_a, gq_a = _split_for_compare(a)
        cols_b, qual_b, gq_b = _split_for_compare(b)
        assert cols_a == cols_b, f"row {i} fields differ:\nours: {a}\nref : {b}"
        assert abs(qual_a - qual_b) <= 0.011, f"row {i} QUAL: {a} vs {b}"
        assert abs(gq_a - gq_b) <= 0.011, f"row {i} GQ: {a} vs {b}"
    # the overwhelming majority must be bit-exact
    assert n_exact >= 0.9 * len(our_rows)


@requires_reference
@pytest.mark.parametrize("show_ref", [False, True])
def test_e2e_calling_parity(tmp_path, reference_path, show_ref):
    import sys
    sys.path.insert(0, "/root/reference")
    from clair3_rna.model import Clair3_P
    from clair3_rna_tpu.models.convert import params_from_keras_model
    from clair3_rna_tpu.models.network import make_forward_fn

    fasta_path, bam_path, genome, variants = simdata.make_dataset(
        tmp_path, seed=5, contig_len=6000, n_variants=12, depth=30)

    # shared random-weight model
    tf_model = Clair3_P(add_indel_length=False, predict=True)
    tf_model(np.zeros((1, 33, 18), np.int32))
    params = params_from_keras_model(tf_model)
    _, forward = make_forward_fn()

    cfg = PileupConfig(batch_size=64)
    call_cfg = CallConfig(show_ref=show_ref)

    task = ChunkTask("chr1", 0, 6000)
    records = build_chunk_tensors(BamReader(bam_path), FastaFile(fasta_path),
                                  task, cfg)
    assert len(records) > 10
    our_rows = call_tensor_records(records, forward, params, cfg, call_cfg)

    ref_tensor_rows = reference_tensor_rows(bam_path, fasta_path, "chr1", 0, 6000)
    ref_rows = _reference_call_chain(ref_tensor_rows, tf_model, show_ref)
    _assert_rows_match(our_rows, ref_rows)


@requires_reference
def test_e2e_high_depth_renormalization(tmp_path, reference_path):
    import sys
    sys.path.insert(0, "/root/reference")
    from clair3_rna.model import Clair3_P
    from clair3_rna_tpu.models.convert import params_from_keras_model
    from clair3_rna_tpu.models.network import make_forward_fn

    # depth > 216 triggers the tensor renormalization path
    fasta_path, bam_path, genome, variants = simdata.make_dataset(
        tmp_path, seed=9, contig_len=1500, n_variants=5, depth=260)
    tf_model = Clair3_P(add_indel_length=False, predict=True)
    tf_model(np.zeros((1, 33, 18), np.int32))
    params = params_from_keras_model(tf_model)
    _, forward = make_forward_fn()
    cfg = PileupConfig(batch_size=64)
    call_cfg = CallConfig(show_ref=True)
    task = ChunkTask("chr1", 0, 1500)
    records = build_chunk_tensors(BamReader(bam_path), FastaFile(fasta_path),
                                  task, cfg)
    assert max(r.depth for r in records) > 216
    our_rows = call_tensor_records(records, forward, params, cfg, call_cfg)
    ref_rows = _reference_call_chain(
        reference_tensor_rows(bam_path, fasta_path, "chr1", 0, 1500),
        tf_model, True)
    _assert_rows_match(our_rows, ref_rows)


@requires_reference
def test_e2e_calling_parity_with_indel_length(tmp_path, reference_path):
    """Full chain with the variant-length heads enabled (add_indel_length:
    the four-softmax network layout, clair3_rna/model.py:146-170, and the
    length-aware decode paths)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from clair3_rna.model import Clair3_P
    from clair3_rna_tpu.models.convert import params_from_keras_model
    from clair3_rna_tpu.models.network import make_forward_fn

    fasta_path, bam_path, genome, variants = simdata.make_dataset(
        tmp_path, seed=21, contig_len=6000, n_variants=14, depth=30)
    tf_model = Clair3_P(add_indel_length=True, predict=True)
    tf_model(np.zeros((1, 33, 18), np.int32))
    params = params_from_keras_model(tf_model, add_indel_length=True)
    _, forward = make_forward_fn(add_indel_length=True)

    cfg = PileupConfig(batch_size=64)
    call_cfg = CallConfig(show_ref=True, add_indel_length=True)
    task = ChunkTask("chr1", 0, 6000)
    records = build_chunk_tensors(BamReader(bam_path), FastaFile(fasta_path),
                                  task, cfg)
    assert len(records) > 10
    our_rows = call_tensor_records(records, forward, params, cfg, call_cfg)
    ref_rows = _reference_call_chain(
        reference_tensor_rows(bam_path, fasta_path, "chr1", 0, 6000),
        tf_model, True, add_indel_length=True)
    _assert_rows_match(our_rows, ref_rows)
