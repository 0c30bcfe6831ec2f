#!/usr/bin/env python
"""On-chip tilelet-wire ablation: nibble (4 bits/slot) vs v2 (3 bits/slot).

Measures, on the bench dataset with HBM-staged chunks (bench.py's
_bench_fused_device methodology, stream-ordered timings), the wire bytes
and device throughput of both layouts, then runs the fused END-TO-END
pipeline once per wire and asserts the VCFs are identical to each other
and to the host path. Results land in WIRE_ABLATION.json and feed
PERF.md's wire table.

Run on the chip (single TPU client at a time): python tools/wire_ablation.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import bench

    fasta_path, bam_path = bench.make_data()
    cfg_params = None
    out = {}
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.models.network import make_wire_forward_fn

    cfg = PileupConfig(batch_size=2048)
    call_cfg = CallConfig(show_ref=False)
    params = bench.get_trained_params()
    _, forward = make_wire_forward_fn()
    out_path = bam_path + ".wire_ablation.vcf"

    bodies = {}
    for wire in ("nibble", "v2"):
        os.environ["CLAIR3_RNA_TPU_TILELET_WIRE"] = wire
        try:
            out[wire] = {"device": bench._bench_fused_device(
                bam_path, fasta_path, params, cfg)}
            os.environ["CLAIR3_RNA_TPU_PILEUP_BACKEND"] = "fused"
            out[wire]["e2e"] = bench._timed_runs(
                bam_path, fasta_path, cfg, call_cfg, params, forward,
                n_runs=2)
            bodies[wire] = bench._vcf_body(bam_path + ".bench_out.vcf")
        finally:
            os.environ.pop("CLAIR3_RNA_TPU_PILEUP_BACKEND", None)
            os.environ.pop("CLAIR3_RNA_TPU_TILELET_WIRE", None)
    assert bodies["v2"] == bodies["nibble"], "v2 wire changed the VCF"
    out["vcf_identical"] = True
    out["wire_mb"] = {w: out[w]["device"].get("wire_mb") for w in bodies}
    out["shrink"] = round(out["wire_mb"]["nibble"]
                          / max(out["wire_mb"]["v2"], 1e-9), 3)
    with open(os.path.join(REPO, "WIRE_ABLATION.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("wire_mb", "shrink",
                                          "vcf_identical")}))


if __name__ == "__main__":
    main()
