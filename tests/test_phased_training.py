"""End-to-end phasing-model workflow: read-backed phase+haplotag the BAM,
build 30-channel training bins, train the phasing model from scratch, and
re-call with it -- the from-scratch version of the reference's
--enable_phasing_model second pass (run_clair3_rna:729-852)."""

import os

import numpy as np

from clair3_rna_tpu.cli import main
from tests import simdata


def test_phased_tensor2bin_and_train(tmp_path):
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=71, contig_len=9000, n_variants=20, depth=30,
        with_hp=True)

    truth = str(tmp_path / "truth.vcf")
    with open(truth, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tS\n")
        for v in variants["chr1"]:
            gt = "1/1" if v.genotype == (1, 1) else "0/1"
            f.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\t"
                    f"GT\t{gt}\n")

    bins = str(tmp_path / "bins")
    main(["tensor2bin", "--bam_fn", bam, "--ref_fn", fasta,
          "--truth_vcf_fn", truth, "--output_dir", bins, "--phased",
          "--non_variant_keep_fraction", "1.0"])
    data = np.load(os.path.join(bins, sorted(os.listdir(bins))[0]))
    assert data["position_matrix"].shape[-1] == 30, "phased bins must be 30ch"
    # HP channels must actually carry counts (the BAM is haplotagged)
    assert np.abs(data["position_matrix"][..., 18:]).sum() > 0

    weights = str(tmp_path / "phased.npz")
    main(["train", "--bin_dir", bins, "--output_fn", weights, "--phased",
          "--no_indel_length", "--batch_size", "16", "--max_epochs", "2"])
    from clair3_rna_tpu.models.network import make_forward_fn
    from clair3_rna_tpu.models.params_io import load_params
    _, forward = make_forward_fn(add_indel_length=False)
    probs = np.asarray(forward(load_params(weights),
                               data["position_matrix"][:4]))
    assert probs.shape == (4, 24), "trained phased model must accept 30ch"

    # channel-mismatch guard: unphased training on phased bins errors clearly
    import pytest
    with pytest.raises(SystemExit, match="30 channels"):
        main(["train", "--bin_dir", bins, "--output_fn",
              str(tmp_path / "x.npz"), "--no_indel_length"])


def test_phase_then_recall_cli(tmp_path):
    """phase_bam on first-pass calls, then a phased re-call runs end to end."""
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=72, contig_len=8000, n_variants=16, depth=30)
    out1 = str(tmp_path / "pass1")
    main(["call", "-B", bam, "-R", fasta, "-o", out1,
          "--include_all_ctgs", "--no_compress"])
    first_vcf = os.path.join(out1, "output.vcf")

    tagged = str(tmp_path / "tagged.bam")
    main(["phase_bam", "--bam_fn", bam, "--ref_fn", fasta,
          "--vcf_fn", first_vcf, "--output_bam_fn", tagged])
    assert os.path.exists(tagged)

    out2 = str(tmp_path / "pass2")
    main(["create_tensor_pileup", "--bam_fn", tagged, "--ref_fn", fasta,
          "--ctgName", "chr1", "--phased",
          "--tensor_can_fn", str(tmp_path / "t30.tsv")])
    rows = [l for l in open(tmp_path / "t30.tsv") if l.strip()]
    assert rows
    assert len(rows[0].split("\t")[3].split()) == 33 * 30
