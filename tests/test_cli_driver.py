"""CLI + orchestration driver tests on synthetic data."""

import os

import numpy as np

from clair3_rna_tpu.cli import main
from clair3_rna_tpu.io.bgzf import bgzf_decompress
from tests import simdata


def _read_vcf_gz(path):
    data = bgzf_decompress(open(path, "rb").read()).decode()
    return [l for l in data.splitlines() if l and not l.startswith("#")]


def test_cli_call_basic(tmp_path):
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=17, contig_len=4000, n_variants=8, depth=30)
    outdir = str(tmp_path / "out")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir,
          "-p", "ont_dorado_drna004", "--include_all_ctgs",
          "--print_ref_calls", "--chunk_size", "2000"])
    out = os.path.join(outdir, "output.vcf.gz")
    assert os.path.exists(out)
    rows = _read_vcf_gz(out)
    assert len(rows) > 0
    positions = [int(r.split("\t")[1]) for r in rows]
    assert positions == sorted(positions)
    assert len(set(positions)) == len(positions), "chunk-boundary dup not merged"


def test_cli_call_region_and_bed(tmp_path):
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=18, contig_len=4000, n_variants=10, depth=30)
    outdir = str(tmp_path / "out_region")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir,
          "--include_all_ctgs", "--print_ref_calls",
          "--region", "chr1:1000-2000"])
    rows = _read_vcf_gz(os.path.join(outdir, "output.vcf.gz"))
    assert rows, "no rows in region"
    for r in rows:
        pos = int(r.split("\t")[1])
        assert 960 <= pos <= 2040, r

    bed_path = str(tmp_path / "regions.bed")
    with open(bed_path, "w") as f:
        f.write("chr1\t2500\t3500\n")
    outdir2 = str(tmp_path / "out_bed")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir2,
          "--include_all_ctgs", "--print_ref_calls", "--bed_fn", bed_path])
    rows = _read_vcf_gz(os.path.join(outdir2, "output.vcf.gz"))
    assert rows
    for r in rows:
        pos = int(r.split("\t")[1])
        assert 2400 <= pos <= 3600, r


def test_cli_call_known_sites(tmp_path):
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=19, contig_len=3000, n_variants=6, depth=30)
    sites_path = str(tmp_path / "sites.vcf")
    wanted = [v for v in variants["chr1"] if v.is_snp][:3]
    with open(sites_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for v in wanted:
            f.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\n")
    outdir = str(tmp_path / "out_known")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir,
          "--include_all_ctgs", "--print_ref_calls", "--vcf_fn", sites_path])
    rows = _read_vcf_gz(os.path.join(outdir, "output.vcf.gz"))
    positions = {int(r.split("\t")[1]) for r in rows}
    assert positions <= {v.pos + 1 for v in wanted}
    assert len(positions) >= 1


def test_cli_compare_and_phase(tmp_path, capsys):
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=20, contig_len=4000, n_variants=8, depth=35)
    truth_path = str(tmp_path / "truth.vcf")
    with open(truth_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
                "\tINFO\tFORMAT\tS\n")
        for v in variants["chr1"]:
            gt = "1/1" if v.genotype == (1, 1) else "0/1"
            f.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\tGT\t{gt}\n")

    outdir = str(tmp_path / "out")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir,
          "--include_all_ctgs", "--no_compress"])
    call_vcf = os.path.join(outdir, "output.vcf")
    assert os.path.exists(call_vcf)

    main(["compare_vcf", "--vcf_fn", call_vcf, "--truth_vcf_fn", truth_path,
          "--skip_genotyping"])
    captured = capsys.readouterr().out
    assert "Overall" in captured and "F1=" in captured

    tagged = str(tmp_path / "tagged.bam")
    main(["phase_bam", "--bam_fn", bam, "--ref_fn", fasta,
          "--vcf_fn", truth_path, "--output_bam_fn", tagged])
    from clair3_rna_tpu.io.bam import BamReader
    reader = BamReader(tagged)
    hp_values = [r.tags.get("HP") for r in reader]
    n_tagged = sum(1 for h in hp_values if h in (1, 2))
    # with planted hets, most reads should get a haplotype
    assert n_tagged > len(hp_values) * 0.3


def test_phasing_accuracy(tmp_path):
    """Reads simulated from known haplotypes should be grouped consistently."""
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=23, contig_len=4000, n_variants=12, depth=40,
        with_hp=True)
    truth_path = str(tmp_path / "truth.vcf")
    hets = [v for v in variants["chr1"] if v.genotype != (1, 1) and v.is_snp]
    with open(truth_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
                "\tINFO\tFORMAT\tS\n")
        for v in hets:
            f.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\tGT\t0/1\n")
    from clair3_rna_tpu.phasing.pipeline import phase_and_haplotag
    from clair3_rna_tpu.io.bam import BamReader

    tagged = str(tmp_path / "tagged.bam")
    phase_and_haplotag(bam, fasta, truth_path, tagged, contigs=["chr1"])
    # simulated reads carry their true haplotype in the original HP tag
    # (with_hp=True); compare our assignment consistency per true haplotype
    orig = {r.name: r.tags.get("HP") for r in BamReader(bam)}
    agree = {(1, 1): 0, (1, 2): 0, (2, 1): 0, (2, 2): 0}
    for rec in BamReader(tagged):
        ours = rec.tags.get("HP")
        true = orig.get(rec.name)
        if ours in (1, 2) and true in (1, 2):
            agree[(true, ours)] += 1
    total = sum(agree.values())
    assert total > 20
    # either polarity is fine; consistency is what matters
    same = agree[(1, 1)] + agree[(2, 2)]
    flipped = agree[(1, 2)] + agree[(2, 1)]
    assert max(same, flipped) / total > 0.8, agree


def test_cli_genotyping_alias_prefix_and_cleanup(tmp_path):
    """-G alias, --output_prefix naming, --remove_intermediate_dir
    (run_clair3_rna --genotyping_mode_vcf_fn/--output_prefix/
    --remove_intermediate_dir equivalents)."""
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=21, contig_len=3000, n_variants=6, depth=30)
    sites_path = str(tmp_path / "sites.vcf")
    wanted = [v for v in variants["chr1"] if v.is_snp][:3]
    with open(sites_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for v in wanted:
            f.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\n")
    outdir = str(tmp_path / "out_g")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir,
          "--include_all_ctgs", "--print_ref_calls",
          "-G", sites_path, "--output_prefix", "geno",
          "--remove_intermediate_dir"])
    out = os.path.join(outdir, "geno.vcf.gz")
    assert os.path.exists(out)
    rows = _read_vcf_gz(out)
    assert {int(r.split("\t")[1]) for r in rows} <= {v.pos + 1 for v in wanted}
    assert not os.path.exists(os.path.join(outdir, "tmp"))


def test_cli_call_variants_debug_rows(tmp_path, capsys):
    """call_variants --debug emits probability rows, not VCF rows
    (clair3_rna/call_variants.py:273-290)."""
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=22, contig_len=3000, n_variants=6, depth=30)
    tensor_path = str(tmp_path / "tensors.tsv")
    main(["create_tensor_pileup", "--bam_fn", bam, "--ref_fn", fasta,
          "--ctg_name", "chr1", "--tensor_can_fn", tensor_path])
    debug_path = str(tmp_path / "debug.out")
    main(["call_variants", "--tensor_fn", tensor_path,
          "--call_fn", debug_path, "--show_ref", "--debug"])
    lines = [l for l in open(debug_path).read().splitlines() if l]
    assert lines
    for line in lines:
        fields = line.split("\t")
        assert fields[0] == "chr1"
        assert fields[2].startswith("['")          # gt21 probability list
        assert fields[-1] in ("Normal output", "Reference")


def test_cli_call_var_bam_chunks_match_call(tmp_path):
    """call_var_bam per-chunk workers + sort_vcf == the in-process `call`
    driver (clair3_rna/call_var_bam.py:88-333 fan-out equivalence)."""
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=23, contig_len=4000, n_variants=8, depth=30)
    chunk_dir = tmp_path / "chunks"
    chunk_dir.mkdir()
    for chunk_id in (1, 2):
        main(["call_var_bam", "--bam_fn", bam, "--ref_fn", fasta,
              "--ctgName", "chr1", "--chunk_id", str(chunk_id),
              "--chunk_num", "2", "--show_ref",
              "--call_fn", str(chunk_dir / f"pileup_chr1_{chunk_id}.vcf")])
    merged = str(tmp_path / "merged.vcf")
    main(["sort_vcf", "--input_dir", str(chunk_dir), "--output_fn", merged,
          "--ref_fn", fasta, "--show_ref", "--no_compress", "--qual", "8"])
    chunk_rows = [l for l in open(merged).read().splitlines()
                  if l and not l.startswith("#")]

    outdir = str(tmp_path / "out")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir,
          "--include_all_ctgs", "--print_ref_calls", "--chunk_size", "2000"])
    call_rows = _read_vcf_gz(os.path.join(outdir, "output.vcf.gz"))
    assert chunk_rows == call_rows


def test_cli_call_var_bam_region(tmp_path):
    """--ctgStart/--ctgEnd restrict the called region (1-based inclusive)."""
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=24, contig_len=3000, n_variants=6, depth=30)
    out = str(tmp_path / "region.vcf")
    main(["call_var_bam", "--bam_fn", bam, "--ref_fn", fasta,
          "--ctgName", "chr1", "--ctgStart", "1001", "--ctgEnd", "2000",
          "--show_ref", "--call_fn", out])
    rows = [l for l in open(out).read().splitlines()
            if l and not l.startswith("#")]
    assert rows
    for r in rows:
        pos = int(r.split("\t")[1])
        assert 960 <= pos <= 2040, r


def test_cli_rediportal_bundled_table(tmp_path, monkeypatch):
    """--readiportal_reference_genome_version resolves the bundled table from
    $CLAIR3_RNA_TPU_MODELS_DIR (run_clair3_rna:497-515) and tags matching
    rows RNAEditing with an untagged twin output."""
    import gzip

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=25, contig_len=3000, n_variants=6, depth=30)
    outdir = str(tmp_path / "plain")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir,
          "--include_all_ctgs", "--print_ref_calls"])
    rows = _read_vcf_gz(os.path.join(outdir, "output.vcf.gz"))
    target = next(r for r in rows
                  if r.split("\t")[4] not in (".", r.split("\t")[3]))
    ctg, pos, _, ref, alt = target.split("\t")[:5]

    models_dir = tmp_path / "models"
    models_dir.mkdir()
    with gzip.open(models_dir / "TABLE1_hg38.txt.gz", "wt") as f:
        f.write("Region\tPosition\tRef\tEd\tStrand\tdb\n")
        f.write(f"{ctg}\t{pos}\t{ref}\t{alt}\t+\tA,D\n")
    monkeypatch.setenv("CLAIR3_RNA_TPU_MODELS_DIR", str(models_dir))

    outdir2 = str(tmp_path / "tagged")
    main(["call", "-B", bam, "-R", fasta, "-o", outdir2,
          "--include_all_ctgs", "--print_ref_calls",
          "--tag_variant_using_readiportal"])
    tagged = _read_vcf_gz(os.path.join(outdir2, "output.vcf.gz"))
    hit = [r for r in tagged if r.split("\t")[1] == pos]
    assert hit and hit[0].split("\t")[6] == "RNAEditing"
    untagged_path = os.path.join(outdir2, "output_no_editing_tagging.vcf.gz")
    assert os.path.exists(untagged_path)
    untagged = _read_vcf_gz(untagged_path)
    uhit = [r for r in untagged if r.split("\t")[1] == pos]
    assert uhit and uhit[0].split("\t")[6] != "RNAEditing"


def test_cli_joblog_and_profile_trace(tmp_path, monkeypatch):
    """--joblog per-chunk TSV (parallel --joblog analogue) and the
    CLAIR3_RNA_TPU_PROFILE device-trace hook."""
    from tests import simdata

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=81, contig_len=7000, n_variants=12, depth=25)
    out = str(tmp_path / "out")
    joblog = str(tmp_path / "chunks.tsv")
    prof_dir = str(tmp_path / "trace")
    monkeypatch.setenv("CLAIR3_RNA_TPU_PROFILE", prof_dir)
    main(["call", "-B", bam, "-R", fasta, "-o", out, "--include_all_ctgs",
          "--no_compress", "--chunk_size", "3000", "--joblog", joblog])
    rows = open(joblog).read().splitlines()
    assert rows[0].startswith("contig\tstart\tend\tcandidates")
    assert len(rows) >= 4  # header + >=3 chunks of 3000 over 7000
    total_cand = sum(int(r.split("\t")[3]) for r in rows[1:])
    assert total_cand > 0
    import os
    assert os.path.isdir(prof_dir) and os.listdir(prof_dir)


def test_cli_pileup_backend_flag(tmp_path, monkeypatch):
    """--pileup_backend plumbs from the CLI through the driver to
    run_calling: 'fused' and 'host' produce identical VCFs, and 'auto' on
    a CPU-only harness resolves to host without error."""
    monkeypatch.delenv("CLAIR3_RNA_TPU_PILEUP_BACKEND", raising=False)
    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=29, contig_len=6000, n_variants=12, depth=30)
    outs = {}
    for backend in ("host", "fused", "auto"):
        outdir = str(tmp_path / f"out_{backend}")
        main(["call", "-B", bam, "-R", fasta, "-o", outdir,
              "--include_all_ctgs", "--print_ref_calls",
              "--chunk_size", "3000", "--pileup_backend", backend])
        outs[backend] = _read_vcf_gz(os.path.join(outdir, "output.vcf.gz"))
    assert len(outs["host"]) > 5
    assert outs["fused"] == outs["host"]
    assert outs["auto"] == outs["host"]  # no TPU here -> auto picks host
