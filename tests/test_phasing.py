"""Phasing quality: switch error of the pairwise linkage phaser vs planted
truth haplotypes, and its advantage over the adjacent-only chain phaser.

The reference delegates this stage to whatshap/longphase
(run_clair3_rna:729-801); these tests measure our in-framework replacement
the way `whatshap compare` would (switch errors against truth phasing).
"""

import os
import random

import numpy as np
import pytest

from clair3_rna_tpu.phasing.phase import (
    HetSite, assign_read_haplotypes, phase_sites, phase_sites_pairwise,
    read_alleles, switch_error_rate,
)
from tests import simdata


def test_pairwise_unionfind_orients_simple_triangle():
    """Three sites, reads covering (0,1), (1,2) and (0,2): the long-range
    pair must orient site 2 even when the adjacent link (1,2) is too weak."""
    reads = (
        [[(0, 0), (1, 1)]] * 5        # 0 and 1 trans-linked
        + [[(0, 1), (2, 1)]] * 5      # 0 and 2 cis-linked
        + [[(1, 1), (2, 0)]] * 1      # weak (below min_link) adjacent pair
    )
    phase, block = phase_sites_pairwise(reads, 3, min_link=2)
    assert list(block) == [0, 0, 0]
    assert phase[0] == 0
    assert phase[1] == 1  # trans to site 0
    assert phase[2] == 0  # cis to site 0 despite no usable adjacent link

    # the adjacent-only phaser cannot link site 2 (its only neighbour link
    # is below min_link) -- it starts a new block
    phase_adj, block_adj = phase_sites(reads, 3, min_link=2)
    assert block_adj[2] != block_adj[1]


def test_switch_error_rate_metric():
    phase = np.array([0, 1, 1, 0], np.int8)
    block = np.array([0, 0, 0, 0], np.int64)
    truth = np.array([0, 1, 0, 1], np.int8)
    # relative flips: pred (1,0,1) vs truth (1,1,1) -> one switch at pair (1,2)
    ser, n = switch_error_rate(phase, block, truth)
    assert n == 3
    assert abs(ser - 1 / 3) < 1e-9
    # a global flip of the block is NOT a switch error
    ser_flip, _ = switch_error_rate(1 - phase, block, 1 - truth)
    assert ser_flip == ser


def _phasing_dataset(tmp_path, seed=17, contig_len=60_000, n_variants=150,
                     depth=30, error_rate_range=None):
    rng = random.Random(seed)
    genome = simdata.random_genome(rng, [("chr1", contig_len)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=n_variants,
                                      indel_fraction=0.0,
                                      het_genotypes=((0, 1), (1, 0)))
    bam_path = str(tmp_path / "reads.bam")
    simdata.simulate_bam(bam_path, genome, variants, rng, depth=depth,
                         with_hp=True, error_rate_range=error_rate_range)
    return genome, variants, bam_path


def test_pairwise_phaser_switch_error_vs_truth(tmp_path):
    """On simulated reads with planted haplotypes the pairwise phaser's
    switch error is low and no worse than the adjacent-only chain's, with
    fewer (longer) phase blocks."""
    from clair3_rna_tpu.io.bam import BamReader

    genome, variants, bam_path = _phasing_dataset(tmp_path)
    het = [v for v in variants["chr1"] if sorted(v.genotype) == [0, 1]
           and len(v.ref) == 1 and len(v.alt) == 1]
    sites = [HetSite(pos=v.pos, ref=v.ref, alt=v.alt) for v in het]
    # truth phase: which haplotype carries the alt allele
    truth_phase = np.array([v.genotype.index(1) for v in het], np.int8)
    site_positions = np.array([s.pos for s in sites], np.int64)
    lookup = {s.pos: i for i, s in enumerate(sites)}

    bam = BamReader(bam_path)
    usable = [r for r in bam.fetch("chr1") if not (r.flag & 2316)]
    alleles = [read_alleles(r, site_positions, lookup, sites) for r in usable]

    pw_phase, pw_block = phase_sites_pairwise(alleles, len(sites))
    adj_phase, adj_block = phase_sites(alleles, len(sites))

    pw_ser, pw_pairs = switch_error_rate(pw_phase, pw_block, truth_phase)
    adj_ser, adj_pairs = switch_error_rate(adj_phase, adj_block, truth_phase)
    assert pw_pairs > 50  # blocks actually span sites
    assert pw_ser <= adj_ser + 1e-9
    assert pw_ser < 0.05, f"pairwise switch error too high: {pw_ser:.3f}"
    # pairwise linkage bridges weak adjacent links -> fewer, longer blocks
    assert len(set(pw_block.tolist())) <= len(set(adj_block.tolist()))

    # read-level haplotagging accuracy against the planted read haplotypes,
    # scored per block with the block's majority orientation (a global flip
    # within a block is not an error)
    hp = assign_read_haplotypes(alleles, pw_phase, pw_block)
    by_block = {}
    for rec, alleles_one, h in zip(usable, alleles, hp):
        if h == 0 or not alleles_one:
            continue
        b = pw_block[alleles_one[0][0]]
        truth_hap = rec.tags["HP"]  # 1 or 2
        by_block.setdefault(b, []).append((h, truth_hap))
    n_ok = n_all = 0
    for pairs in by_block.values():
        agree = sum(1 for h, t in pairs if h == t)
        n_ok += max(agree, len(pairs) - agree)
        n_all += len(pairs)
    assert n_all > len(usable) // 2, "too few reads haplotagged"
    assert n_ok / n_all > 0.95, f"haplotag accuracy {n_ok / n_all:.3f}"


def test_pairwise_phaser_switch_error_nonuniform_errors(tmp_path):
    """Phaser quality under a realistic per-read quality spread (error rates
    drawn per read from 1%-12%, like mixed-quality dRNA reads) rather than
    the uniform-error idealization: switch error must stay low and the
    pairwise linkage must still do no worse than the adjacent-only chain."""
    from clair3_rna_tpu.io.bam import BamReader

    genome, variants, bam_path = _phasing_dataset(
        tmp_path, seed=23, error_rate_range=(0.01, 0.12))
    het = [v for v in variants["chr1"] if sorted(v.genotype) == [0, 1]
           and len(v.ref) == 1 and len(v.alt) == 1]
    sites = [HetSite(pos=v.pos, ref=v.ref, alt=v.alt) for v in het]
    truth_phase = np.array([v.genotype.index(1) for v in het], np.int8)
    site_positions = np.array([s.pos for s in sites], np.int64)
    lookup = {s.pos: i for i, s in enumerate(sites)}

    bam = BamReader(bam_path)
    usable = [r for r in bam.fetch("chr1") if not (r.flag & 2316)]
    alleles = [read_alleles(r, site_positions, lookup, sites) for r in usable]

    pw_phase, pw_block = phase_sites_pairwise(alleles, len(sites))
    adj_phase, adj_block = phase_sites(alleles, len(sites))
    pw_ser, pw_pairs = switch_error_rate(pw_phase, pw_block, truth_phase)
    adj_ser, _ = switch_error_rate(adj_phase, adj_block, truth_phase)
    assert pw_pairs > 50
    assert pw_ser <= adj_ser + 1e-9
    assert pw_ser < 0.10, f"switch error too high on noisy reads: {pw_ser:.3f}"


def test_external_phaser_orchestration(tmp_path, monkeypatch):
    """--phaser whatshap delegates with the reference's invocations
    (run_clair3_rna:739-783); exercised against a stub executable that logs
    its argv and emulates whatshap's outputs."""
    import os
    import stat
    import subprocess
    import sys

    from clair3_rna_tpu.phasing.pipeline import phase_and_haplotag

    genome, variants, bam_path = _phasing_dataset(tmp_path, seed=19,
                                                  contig_len=12_000,
                                                  n_variants=30)
    from clair3_rna_tpu.io.fasta import write_fasta
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, genome)
    vcf = str(tmp_path / "calls.vcf")
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tS\n")
        for v in variants["chr1"]:
            gt = "1/1" if v.genotype == (1, 1) else "0/1"
            f.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t30\tPASS\t.\t"
                    f"GT\t{gt}\n")

    log = str(tmp_path / "calls.log")
    stub = str(tmp_path / "whatshap")
    with open(stub, "w") as f:
        f.write(f"""#!{sys.executable}
import shutil, sys
with open({log!r}, "a") as lf:
    lf.write(" ".join(sys.argv[1:]) + "\\n")
args = sys.argv[1:]
out = args[args.index("--output") + 1]
if args[0] == "phase":
    shutil.copyfile(args[-2], out)   # phased VCF := input VCF (gz passthrough)
else:
    shutil.copyfile(args[-1], out)   # tagged BAM := input BAM
""")
    os.chmod(stub, os.stat(stub).st_mode | stat.S_IEXEC)

    out_bam = str(tmp_path / "tagged.bam")
    result = phase_and_haplotag(bam_path, ref, vcf, out_bam,
                                phaser="whatshap", whatshap=stub)
    assert result == out_bam and os.path.getsize(out_bam) > 0
    calls = open(log).read().splitlines()
    assert len(calls) == 2
    assert calls[0].startswith("phase ") and "--distrust-genotypes" in calls[0]
    assert calls[1].startswith("haplotag ") and "--ignore-read-groups" in calls[1]
    # the emulated output is a readable BAM (stub copies the input)
    from clair3_rna_tpu.io.bam import BamReader
    assert len(list(BamReader(out_bam).fetch("chr1"))) > 0

    # a missing tool fails with a clear error, not a cryptic subprocess one
    import pytest
    with pytest.raises(FileNotFoundError, match="longphase not found"):
        phase_and_haplotag(bam_path, ref, vcf, out_bam, phaser="longphase",
                           longphase=str(tmp_path / "nope"))


def test_phasing_rss_bounded(tmp_path):
    """The builtin phasing pass streams (two lazy fetches per contig): peak
    RSS of a multi-contig run stays bounded by blocks + per-read allele
    summaries, never a contig's decoded records. The pre-streaming
    implementation (records = list(bam.fetch(ctg))) measured ~125 MB above
    interpreter base on this dataset; the budget below would catch any
    regression back to record-resident rewriting."""
    import os
    import subprocess
    import sys

    rng = random.Random(23)
    genome = simdata.random_genome(rng, [("chr1", 500_000),
                                         ("chr2", 350_000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=1000,
                                      indel_fraction=0.0,
                                      het_genotypes=((0, 1), (1, 0)))
    bam_path = str(tmp_path / "reads.bam")
    simdata.simulate_bam(bam_path, genome, variants, rng, depth=20,
                         with_hp=True)
    vcf_path = str(tmp_path / "hets.vcf")
    with open(vcf_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tS\n")
        for ctg, vs in variants.items():
            for v in vs:
                if sorted(v.genotype) == [0, 1] and len(v.ref) == 1 == len(v.alt):
                    f.write(f"{ctg}\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t30\t"
                            f"PASS\t.\tGT\t0/1\n")
    out_bam = str(tmp_path / "tagged.bam")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = (
        "import resource, sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from clair3_rna_tpu.phasing.pipeline import phase_and_haplotag\n"
        f"phase_and_haplotag({bam_path!r}, {tmp_path.as_posix()!r},"
        f" {vcf_path!r}, {out_bam!r})\n"
        "print('RSS_KB', resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)\n"
    )
    # clean env: the ambient sitecustomize imports jax at startup (~165 MB),
    # which would swamp the measurement
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = repo
    # hop through /bin/sh: ru_maxrss is inherited across fork, so a child
    # forked directly from this (pytest) process would inherit its ~200 MB
    # high-water mark; forking from sh gives a clean floor
    script = tmp_path / "rss_child.py"
    script.write_text(child)
    out = subprocess.run(
        ["/bin/sh", "-c", f"{sys.executable} {script}"], env=env,
        capture_output=True, text=True, check=True)
    rss_kb = int(out.stdout.split("RSS_KB")[1].strip().split()[0])
    assert rss_kb < 100 * 1024, f"phasing peak RSS {rss_kb // 1024} MB"

    # output sanity: every read present, a good share HP-tagged
    from clair3_rna_tpu.io.bam import BamReader
    src = BamReader(bam_path)
    tagged = BamReader(out_bam)
    n_src = sum(1 for ctg in src.references for _ in src.fetch(ctg))
    n_out = n_hp = 0
    for ctg in tagged.references:
        for rec in tagged.fetch(ctg):
            n_out += 1
            n_hp += int(rec.tags.get("HP", 0) in (1, 2))
    assert n_out == n_src
    assert n_hp > n_out * 0.5


@pytest.mark.parametrize("tool,platform", [
    ("whatshap", "ont_dorado_drna004"),
    ("longphase", "ont_dorado_drna004"),
    ("longphase", "hifi_sequel2"),
])
def test_external_phaser_golden_argv(tmp_path, monkeypatch, tool, platform):
    """String-for-string golden argv for the whatshap/longphase delegations
    vs the reference's invocations (run_clair3_rna:729-801) -- a drifted
    flag in either tool's command line fails here, executable-free.

    Intentional, documented differences from the reference command lines:
    the reference fans per-contig jobs out under GNU parallel (whatshap
    --chromosome {ctg} / --regions {ctg}, longphase -t N per job), ours
    phases the whole VCF in ONE invocation; and the reference's external
    bgzip/tabix/samtools-index steps are replaced by our in-process
    BGZF/tabix/BAI writers. Every semantic flag is identical."""
    import subprocess

    from clair3_rna_tpu.phasing import pipeline as ph

    wd = str(tmp_path)
    vcf = os.path.join(wd, "calls.vcf")
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tS\nchr1\t100\t.\tA\tC\t30\tPASS\t.\t"
                "GT\t0/1\n")
    bam = os.path.join(wd, "reads.bam")
    ref = os.path.join(wd, "ref.fa")
    out_bam = os.path.join(wd, "tagged.bam")
    phased_prefix = os.path.join(wd, "external_phased")
    vcf_gz = os.path.join(wd, "phase_input.vcf.gz")

    calls = []

    def fake_run(cmd, check=True, **kw):
        calls.append(list(cmd))
        if cmd[0].endswith("longphase") and cmd[1] == "phase":
            # longphase writes <prefix>.vcf; fabricate it so the in-process
            # bgzip+tabix that follows has something to compress
            with open(phased_prefix + ".vcf", "w") as f:
                f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\t"
                        "QUAL\tFILTER\tINFO\tFORMAT\tS\n")
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(ph.os.path, "exists",
                        lambda p: True if p.endswith(tool)
                        else os.path.exists(p))
    monkeypatch.setattr(subprocess, "run", fake_run)
    ph.phase_and_haplotag(bam, ref, vcf, out_bam, phaser=tool,
                          whatshap="/opt/bin/whatshap",
                          longphase="/opt/bin/longphase",
                          platform=platform)

    if tool == "whatshap":
        # run_clair3_rna:752-761 (phase) / 786-794 (haplotag)
        assert calls == [
            ["/opt/bin/whatshap", "phase",
             "--output", phased_prefix + ".vcf.gz",
             "--reference", ref,
             "--distrust-genotypes", "--ignore-read-groups",
             vcf_gz, bam],
            ["/opt/bin/whatshap", "haplotag",
             "--output", out_bam,
             "--reference", ref,
             "--ignore-read-groups",
             phased_prefix + ".vcf.gz", bam],
        ]
    else:
        # run_clair3_rna:733-741 (phase) / 772-779 (haplotag)
        plat_flag = "--ont" if platform.startswith("ont") else "--pb"
        assert calls == [
            ["/opt/bin/longphase", "phase",
             "-s", vcf_gz, "-b", bam, "-r", ref, plat_flag,
             "-o", phased_prefix],
            ["/opt/bin/longphase", "haplotag",
             "-s", phased_prefix + ".vcf.gz",
             "-b", bam, "-r", ref,
             "-o", os.path.splitext(out_bam)[0]],
        ]
