"""GVCF subsystem: numeric parity vs the reference variantInfoCalculator and
full-pipeline integration."""

import os

import numpy as np
import pytest

from tests import simdata
from tests.conftest import requires_reference


def test_reference_likelihood_values():
    from clair3_rna_tpu.gvcf import reference_likelihood

    valid, gq, binned, probs = reference_likelihood(30, 30, 0.001, 5)
    assert valid and gq == 50 and binned == 46
    valid, gq, binned, probs = reference_likelihood(0, 0, 0.001, 5)
    assert not valid or probs[0] == max(probs)
    valid, gq, binned, probs = reference_likelihood(2, 30, 0.001, 5)
    assert not valid  # mostly alt reads: 0/0 not the best genotype
    assert binned in (0, 1)


@requires_reference
def test_block_construction_parity(reference_path, tmp_path):
    """Feed the same site stream to ours and the reference accumulator.

    The reference is pinned to its deterministic pure-Python math path: its
    cffi fast path contains an out-of-bounds read (src/utils.py:698 loops
    i<=n_list) and optional mpmath precision, both of which make its output
    environment-dependent. We match the documented float fallback.
    """
    import math as stdlib_math
    import src.utils as ref_utils
    from clair3_rna_tpu.gvcf import NonVariantAccumulator
    from src.utils import variantInfoCalculator

    ref_utils.math = stdlib_math
    ref_utils.use_mpmath = False

    rng = np.random.RandomState(5)
    sites = []
    pos = 100
    for _ in range(300):
        n_total = int(rng.randint(0, 40))
        n_ref = int(n_total * rng.uniform(0.6, 1.0))
        ref = "ACGTN"[rng.randint(5)] if rng.rand() < 0.1 else "ACGT"[rng.randint(4)]
        sites.append((pos, ref, n_total, n_ref))
        pos += 1 if rng.rand() < 0.95 else rng.randint(2, 5)

    ours = NonVariantAccumulator(p_err=0.001, gq_bin_size=5)
    for pos, ref, n_total, n_ref in sites:
        ours.push("chr1", pos, ref, n_total, n_ref)
    our_rows = ours.finish()

    calc = variantInfoCalculator(
        gvcfWritePath="PIPE", ref_path=None, p_err=0.001, gq_bin_size=5,
        ctgName="chr1", sample_name="S")
    calc.variantMath.speedUp = False
    calc.constant_log10_probs = calc.variantMath.normalize_log10_prob(
        [-1.0, -1.0, -1.0])
    calc.logp = stdlib_math.log(0.001) / calc.LOG_10
    calc.log1p = stdlib_math.log1p(-0.001) / calc.LOG_10
    import io
    buf = io.StringIO()
    calc.vcf_writer = buf
    for pos, ref, n_total, n_ref in sites:
        calc.make_gvcf_online({"chr": "chr1", "pos": pos, "ref": ref,
                               "n_total": n_total, "n_ref": n_ref})
    if len(calc.current_block):
        calc.write_to_gvcf_batch(calc.current_block, calc.cur_min_DP,
                                 calc.cur_raw_gq)
    ref_out = [l for l in buf.getvalue().splitlines() if l and not l.startswith("#")]
    assert our_rows == ref_out


def test_gvcf_pipeline_output(tmp_path):
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=31, contig_len=4000, n_variants=8, depth=30)
    out_path = str(tmp_path / "out.vcf")
    outputs, stats = run_calling(
        bam, fasta, out_path, cfg=PileupConfig(batch_size=64),
        call_cfg=CallConfig(show_ref=False, gvcf=True),
        compress=False, progress=False)
    gvcf = [p for p in outputs if p.endswith(".g.vcf")]
    assert gvcf, outputs
    body = [l for l in open(gvcf[0]) if not l.startswith("#")]
    assert body
    nonref = [l for l in body if "<NON_REF>" in l and "END=" in l]
    var = [l for l in body if "<NON_REF>" not in l.split("\t")[4].split(",")[0]]
    assert nonref, "no non-variant blocks"
    # every variant row present in the g.vcf carries the <NON_REF> alt + PLs
    for l in body:
        alt = l.split("\t")[4]
        if alt != "<NON_REF>":
            assert alt.endswith(",<NON_REF>"), l
            assert ",990" in l.rstrip().split("\t")[-1], l
    # blocks must not overlap variants
    spans = []
    for l in body:
        cols = l.split("\t")
        pos = int(cols[1])
        if cols[4] == "<NON_REF>":
            import re
            end = int(re.search(r"END=(\d+)", cols[7]).group(1))
            spans.append((pos, end))
        else:
            var_end = pos + len(cols[3]) - 1
            for s, e in spans:
                assert not (s <= pos <= e or s <= var_end <= e), (l, (s, e))


def test_gvcf_bp_resolution(tmp_path):
    """--bp_resolution emits per-base non-variant records (call_var_bam
    --bp_resolution, src/utils.py:607): every covered reference base becomes
    its own <NON_REF> row instead of a GQ-binned block."""
    import re
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=32, contig_len=3000, n_variants=4, depth=25)
    cfgs = {
        "block": CallConfig(gvcf=True),
        "bp": CallConfig(gvcf=True, gvcf_bp_resolution=True),
    }
    bodies = {}
    for name, call_cfg in cfgs.items():
        out_path = str(tmp_path / f"{name}.vcf")
        outputs, _ = run_calling(
            bam, fasta, out_path, cfg=PileupConfig(batch_size=64),
            call_cfg=call_cfg, compress=False, progress=False)
        gvcf = next(p for p in outputs if p.endswith(".g.vcf"))
        bodies[name] = [l for l in open(gvcf) if not l.startswith("#")]
    blocks = [l for l in bodies["block"] if l.split("\t")[4] == "<NON_REF>"]
    per_base = [l for l in bodies["bp"] if l.split("\t")[4] == "<NON_REF>"]
    assert len(per_base) > len(blocks) * 3
    for l in per_base:
        cols = l.split("\t")
        end = int(re.search(r"END=(\d+)", cols[7]).group(1))
        assert end == int(cols[1]), l
