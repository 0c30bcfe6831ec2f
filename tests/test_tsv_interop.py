"""Reference-format TSV interop: create_tensor_pileup | call_variants must
reproduce the in-process pipeline, matching the reference's process-boundary
wire format (src/create_tensor_pileup.py:595-605, clair3_rna/utils.py:64-138).
"""

import io
import os

import numpy as np

from clair3_rna_tpu.cli import main
from tests import simdata


def _make(tmp_path, seed=31, contig_len=6000, n_variants=14, depth=30):
    return simdata.make_dataset(tmp_path, seed=seed, contig_len=contig_len,
                                n_variants=n_variants, depth=depth)


def test_create_tensor_pileup_rows(tmp_path, capsys):
    fasta, bam, genome, variants = _make(tmp_path)
    tsv = str(tmp_path / "tensor.tsv")
    main(["create_tensor_pileup", "--bam_fn", bam, "--ref_fn", fasta,
          "--ctgName", "chr1", "--tensor_can_fn", tsv])
    rows = [l for l in open(tsv).read().splitlines() if l]
    assert rows
    cols = rows[0].split("\t")
    assert len(cols) == 5
    assert cols[0] == "chr1"
    assert len(cols[2]) == 33
    assert len(cols[3].split()) == 33 * 18
    assert "-" in cols[4]


def test_tsv_roundtrip_matches_in_process(tmp_path):
    """builder TSV -> call_variants == direct `call` (same random weights)."""
    fasta, bam, genome, variants = _make(tmp_path, seed=32)
    weights = str(tmp_path / "w.npz")
    # persist one random-init so both paths share weights
    from clair3_rna_tpu.models.network import init_params
    from clair3_rna_tpu.models.params_io import save_params
    save_params(weights, init_params(0))

    tsv = str(tmp_path / "tensor.tsv")
    main(["create_tensor_pileup", "--bam_fn", bam, "--ref_fn", fasta,
          "--ctgName", "chr1", "--tensor_can_fn", tsv])
    piped = str(tmp_path / "piped.vcf")
    main(["call_variants", "--tensor_fn", tsv, "--call_fn", piped,
          "--model_path", weights, "--show_ref"])

    outdir = str(tmp_path / "direct")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir, "--model_path",
          weights, "--include_all_ctgs", "--ctg_name", "chr1",
          "--print_ref_calls", "--no_compress"])
    def normalize(lines):
        # call_variants emits unmarked rows; the `call` pipeline's merge stage
        # adds LowQual marking (src/sort_vcf.py:46-54) -- blank the FILTER
        # column for the comparison
        out = []
        for l in lines:
            if l.startswith("#"):
                continue
            cols = l.rstrip("\n").split("\t")
            cols[6] = "."
            out.append("\t".join(cols))
        return out

    direct_rows = normalize(open(os.path.join(outdir, "output.vcf")))
    piped_rows = normalize(open(piped))
    assert piped_rows == direct_rows
    assert len(piped_rows) > 0


def test_call_variants_reads_reference_format_stdin(tmp_path, monkeypatch):
    """call_variants accepts rows on stdin like the reference pipe."""
    import sys

    fasta, bam, genome, variants = _make(tmp_path, seed=33)
    tsv = str(tmp_path / "tensor.tsv")
    main(["create_tensor_pileup", "--bam_fn", bam, "--ref_fn", fasta,
          "--ctgName", "chr1", "--tensor_can_fn", tsv])
    out_fn = str(tmp_path / "out.vcf")
    monkeypatch.setattr(sys, "stdin", io.StringIO(open(tsv).read()))
    main(["call_variants", "--call_fn", out_fn, "--show_ref"])
    rows = [l for l in open(out_fn) if l.strip()]
    assert rows
    assert all(len(r.split("\t")) >= 10 for r in rows)


def test_toolkit_subcommands(tmp_path, capsys):
    """The offline toolkit is reachable through the CLI dispatcher."""
    fasta, bam, genome, variants = _make(tmp_path, seed=34)
    truth = str(tmp_path / "truth.vcf")
    with open(truth, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tS\n")
        for v in variants["chr1"]:
            gt = "1/1" if v.genotype == (1, 1) else "0/1"
            f.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\t"
                    f"GT\t{gt}\n")

    truths_fn = str(tmp_path / "truths")
    main(["cal_truth_vcf_af_distribution", "--bam_fn", bam, "--ref_fn", fasta,
          "--truth_vcf_fn", truth, "--output_fn", truths_fn])
    assert os.path.getsize(truths_fn) > 0

    filtered = str(tmp_path / "truth_filtered.vcf")
    main(["get_truth_from_af", "--truth_vcf_fn", truth,
          "--truths_fn", truths_fn, "--output_fn", filtered])
    assert os.path.exists(filtered)

    # concat_files over two fragments
    frag_dir = tmp_path / "frags"
    frag_dir.mkdir()
    (frag_dir / "part_a.vcf").write_text("#h\nrow1\n")
    (frag_dir / "part_b.vcf").write_text("#h\nrow2\n")
    out_cat = str(tmp_path / "cat.vcf")
    main(["concat_files", "--input_dir", str(frag_dir),
          "--output_fn", out_cat, "--prefix", "part_"])
    assert open(out_cat).read() == "#h\nrow1\nrow2\n"


def test_call_variants_zstd_tensor_input(tmp_path):
    """A .zst-compressed tensor file streams through call_variants like the
    reference's `zstd -fdc` pipe (clair3_rna/utils.py:73-75)."""
    import zstandard

    fasta, bam, genome, variants = _make(tmp_path, seed=33)
    from clair3_rna_tpu.models.network import init_params
    from clair3_rna_tpu.models.params_io import save_params
    weights = str(tmp_path / "w.npz")
    save_params(weights, init_params(0))

    tsv = str(tmp_path / "tensor.tsv")
    main(["create_tensor_pileup", "--bam_fn", bam, "--ref_fn", fasta,
          "--ctgName", "chr1", "--tensor_can_fn", tsv])
    zst = tsv + ".zst"
    with open(tsv, "rb") as fin, open(zst, "wb") as fout:
        fout.write(zstandard.ZstdCompressor().compress(fin.read()))

    plain_vcf = str(tmp_path / "plain.vcf")
    zst_vcf = str(tmp_path / "zst.vcf")
    main(["call_variants", "--tensor_fn", tsv, "--call_fn", plain_vcf,
          "--model_path", weights, "--show_ref"])
    main(["call_variants", "--tensor_fn", zst, "--call_fn", zst_vcf,
          "--model_path", weights, "--show_ref"])
    assert open(plain_vcf).read() == open(zst_vcf).read()
    assert os.path.getsize(plain_vcf) > 0


def test_ensemble_output_matches_reference(tmp_path):
    """--output_for_ensemble row format parity vs the reference's
    batch_output_for_ensemble (clair3_rna/call_variants.py:1023-1076) on
    identical probabilities."""
    import sys

    import pytest
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not available")
    sys.path.insert(0, "/root/reference")
    import clair3_rna.call_variants as cv

    fasta, bam, genome, variants = _make(tmp_path, seed=34)
    from clair3_rna_tpu.models.network import init_params
    from clair3_rna_tpu.models.params_io import save_params
    weights = str(tmp_path / "w.npz")
    save_params(weights, init_params(0))

    tsv = str(tmp_path / "tensor.tsv")
    main(["create_tensor_pileup", "--bam_fn", bam, "--ref_fn", fasta,
          "--ctgName", "chr1", "--tensor_can_fn", tsv])
    ours = str(tmp_path / "ens.tsv")
    main(["call_variants", "--tensor_fn", tsv, "--call_fn", ours,
          "--model_path", weights, "--output_for_ensemble"])
    our_rows = open(ours).read().splitlines()
    assert our_rows and not our_rows[0].startswith("#")  # no VCF header

    # reproduce with the reference formatter fed OUR probabilities
    from clair3_rna_tpu.caller.tsv_interop import read_tensor_rows
    from clair3_rna_tpu.models.params_io import load_params
    from clair3_rna_tpu.models.network import make_wire_forward_fn
    from clair3_rna_tpu.caller.pipeline import _WIRE_CODE
    params = load_params(weights)
    _, forward = make_wire_forward_fn()
    captured = []
    output_utilities = cv.OutputUtilities(
        lambda *a, **k: None, captured.append,
        lambda: None, lambda: None, lambda: None)
    output_config = cv.OutputConfig(
        is_show_reference=False, is_debug=False,
        is_haploid_precise_mode_enabled=False,
        is_haploid_sensitive_mode_enabled=False,
        is_output_for_ensemble=True, quality_score_for_pass=None,
        tensor_fn="PIPE", input_probabilities=False, add_indel_length=False,
        gvcf=False, pileup=True, enable_long_indel=False,
        maximum_variant_length_that_need_infer=50, keep_iupac_bases=False)
    with open(tsv) as f:
        for chroms, positions, refseqs, X, alt_infos in read_tensor_rows(f, 2048):
            # pad to the CLI's batch shape: XLA results can differ by 1 ulp
            # across batch shapes, and the %.6f format exposes that
            n = len(X)
            codes = _WIRE_CODE[np.frombuffer(
                "".join(refseqs).encode(), dtype=np.uint8)].reshape(n, -1)
            W = np.abs(X).astype(np.uint8)
            if n < 2048:
                W = np.concatenate([W, np.zeros((2048 - n,) + W.shape[1:],
                                                W.dtype)])
                codes = np.concatenate([codes, np.zeros(
                    (2048 - n, codes.shape[1]), codes.dtype)])
            probs = np.asarray(forward(params, W, codes))[:n, :-1]
            cv.batch_output_for_ensemble(
                X, list(zip(chroms, map(str, positions), refseqs)),
                [a.encode() for a in alt_infos],
                (probs[:, :21], probs[:, 21:24]),
                output_config, output_utilities)
    assert our_rows == captured
