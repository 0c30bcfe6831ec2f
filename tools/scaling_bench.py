#!/usr/bin/env python
"""Measure and project candidate-sites/s scaling; writes SCALING.md.

Three measurements, each honest about what it can show on this box:

1. **dp-mesh throughput on virtual devices** — the sharded-inference path
   (parallel/mesh) on an 8-virtual-device CPU mesh at dp = 1/2/4/8. All
   virtual devices share the host's two cores, so this validates that the
   sharded program compiles, runs, and stays VCF-identical while the batch
   axis splits; it cannot show speedup and is not expected to.
2. **Shard-balance efficiency (measured work)** — per-chunk candidate counts
   from the bench-shaped dataset, round-robin sharded (the exact
   parallel.distributed.shard_tasks policy): efficiency = mean/max shard
   load. For this embarrassingly-parallel workload cross-shard traffic is
   ~10^-4 of input bytes (variant rows only), so shard balance IS the
   scaling ceiling.
3. **Whole-genome projection** — the same policy over GRCh38 chromosome
   lengths with the reference's 5 Mb chunks (shared/param_p.py:91), chunk
   cost proportional to length.

Run: python tools/scaling_bench.py  (re-execs itself under a CPU mesh for
part 1; the real-chip single-device anchor comes from BENCH bench.py).
"""

import json
import os
import random
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GRCH38 = [  # chromosome lengths (bp), GRCh38 primary assembly
    248956422, 242193529, 198295559, 190214555, 181538259, 170805979,
    159345973, 145138636, 138394717, 133797422, 135086622, 133275309,
    114364328, 107043718, 101991189, 90338345, 83257441, 80373285,
    58617616, 64444167, 46709983, 50818468, 156040895, 57227415,
]


def _make_data(tmpdir, contig_len=600_000, depth=35, n_variants=3300):
    from tests import simdata
    from clair3_rna_tpu.io.fasta import write_fasta

    rng = random.Random(1234)
    genome = simdata.random_genome(rng, [("chr1", contig_len)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=n_variants)
    fasta = os.path.join(tmpdir, "ref.fa")
    bam = os.path.join(tmpdir, "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=depth)
    return fasta, bam, contig_len


def measure_dp_mesh():
    """Child mode: runs under an 8-virtual-device CPU backend."""
    import numpy as np
    import jax

    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.models.network import init_params, make_forward_fn
    from clair3_rna_tpu.parallel.mesh import (make_mesh, shard_params,
                                              sharded_forward_fn)
    from clair3_rna_tpu.models.network import PileupNet

    assert jax.device_count() == 8, jax.devices()
    with tempfile.TemporaryDirectory() as tmpdir:
        fasta, bam, contig_len = _make_data(tmpdir)
        cfg = PileupConfig(batch_size=512)
        call_cfg = CallConfig(show_ref=False)
        params_host = init_params(0)
        results = {}
        baseline_rows = None
        for dp in (1, 2, 4, 8):
            mesh = make_mesh(n_devices=dp, tp=1)
            model = PileupNet()
            params = shard_params(params_host, mesh)
            forward = sharded_forward_fn(model, mesh)
            out = os.path.join(tmpdir, f"dp{dp}.vcf")
            run_calling(bam, fasta, out, cfg=cfg, call_cfg=call_cfg,
                        params=params, forward=forward, contigs=["chr1"],
                        chunk_size=100_000, compress=False, progress=False)
            t0 = time.time()
            _, stats = run_calling(bam, fasta, out, cfg=cfg,
                                   call_cfg=call_cfg, params=params,
                                   forward=forward, contigs=["chr1"],
                                   chunk_size=100_000, compress=False,
                                   progress=False)
            wall = time.time() - t0
            rows = [l for l in open(out) if not l.startswith("#")]
            if baseline_rows is None:
                baseline_rows = rows
            assert rows == baseline_rows, f"dp={dp} VCF diverged"
            results[dp] = {"sites_per_s": stats.candidates / wall,
                           "wall_s": wall, "candidates": stats.candidates}
        print("DPMESH " + json.dumps(results))


def measured_shard_balance():
    """Per-chunk measured candidate counts -> round-robin shard efficiency."""
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.io.fasta import FastaFile
    from clair3_rna_tpu.parallel.distributed import shard_tasks
    from clair3_rna_tpu.pileup.chunk import (build_chunk_tensors, open_bam,
                                             plan_chunks)

    with tempfile.TemporaryDirectory() as tmpdir:
        fasta_path, bam_path, contig_len = _make_data(tmpdir)
        fasta = FastaFile(fasta_path)
        bam = open_bam(bam_path)
        cfg = PileupConfig()
        tasks = plan_chunks(fasta, contigs=["chr1"], chunk_size=20_000)
        loads = []
        for t in tasks:
            recs = build_chunk_tensors(bam, fasta, t, cfg)
            loads.append(len(recs))
        out = {}
        for n in (2, 4, 8, 16):
            shard_loads = []
            for s in range(n):
                mine = shard_tasks(list(range(len(tasks))), n, s)
                shard_loads.append(sum(loads[i] for i in mine))
            mean = sum(shard_loads) / n
            out[n] = round(mean / max(shard_loads), 4) if max(shard_loads) else 1.0
        return {"n_chunks": len(tasks), "total_candidates": sum(loads),
                "efficiency_by_shards": out}


def genome_projection(chunk_mb=5):
    from clair3_rna_tpu.parallel.distributed import shard_tasks

    chunk = chunk_mb * 1_000_000
    chunks = []
    for length in GRCH38:
        n = max(1, -(-length // chunk))
        per = length // n + (1 if length % n else 0)
        for i in range(n):
            chunks.append(min(per, length - per * i))
    out = {}
    for n in (8, 16, 32, 64, 128, 256):
        shard_loads = []
        for s in range(n):
            mine = shard_tasks(list(range(len(chunks))), n, s)
            shard_loads.append(sum(chunks[i] for i in mine))
        mean = sum(shard_loads) / n
        out[n] = round(mean / max(shard_loads), 4)
    return {"n_chunks": len(chunks), "efficiency_by_shards": out}


def main():
    if "--dp-mesh-child" in sys.argv:
        measure_dp_mesh()
        return

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    child = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--dp-mesh-child"], env=env, capture_output=True,
                           text=True, timeout=3600)
    dp_mesh = None
    for line in child.stdout.splitlines():
        if line.startswith("DPMESH "):
            dp_mesh = json.loads(line[len("DPMESH "):])
    if dp_mesh is None:
        print(child.stdout[-2000:], file=sys.stderr)
        print(child.stderr[-4000:], file=sys.stderr)
        raise SystemExit("dp-mesh child failed")

    balance = measured_shard_balance()
    projection = genome_projection()

    bench_anchor = None
    for fn in sorted(os.listdir(REPO)):
        if fn.startswith("BENCH_r") and fn.endswith(".json"):
            with open(os.path.join(REPO, fn)) as f:
                d = json.load(f)
            if "value" not in d:  # driver wrapper: bench line is in 'tail'
                for line in d.get("tail", "").splitlines():
                    if line.startswith("{"):
                        try:
                            d = json.loads(line)
                            break
                        except ValueError:
                            pass
            if "value" in d:
                bench_anchor = d

    lines = ["# SCALING — candidate-sites/s scaling measurements", ""]
    lines.append("Workload model: contig-chunk data parallelism "
                 "(parallel/distributed.py). Cross-shard traffic is the "
                 "merged variant rows only (~10^-4 of input bytes), so the "
                 "scaling ceiling is shard load balance, not bandwidth.")
    lines.append("")
    lines.append("## 1. Real-chip single-device anchor")
    lines.append("")
    if bench_anchor:
        v = bench_anchor.get("value")
        lines.append(f"- bench.py on the attached TPU chip: **{v} "
                     "candidate-sites/s/chip** (see BENCH_r*.json; "
                     "best-of-3, tunnel-attached v5e).")
    lines.append("- Multi-chip hardware is not reachable from this "
                 "environment; rows 2–4 establish the sharded program and "
                 "its balance ceiling on virtual devices + measured "
                 "per-chunk work.")
    lines.append("")
    lines.append("## 2. dp-mesh sharded inference (8 virtual CPU devices)")
    lines.append("")
    lines.append("VCF-identical at every dp (asserted in the run); wall "
                 "clock shares two physical cores across all virtual "
                 "devices, so throughput parity — not speedup — is the "
                 "expected result and validates the sharded program only.")
    lines.append("")
    lines.append("| dp | sites/s | wall s |")
    lines.append("|---|---|---|")
    for dp, r in sorted(dp_mesh.items(), key=lambda kv: int(kv[0])):
        lines.append(f"| {dp} | {r['sites_per_s']:.0f} | {r['wall_s']:.2f} |")
    lines.append("")
    lines.append("## 3. Measured shard balance (real per-chunk candidate "
                 "counts)")
    lines.append("")
    lines.append(f"{balance['n_chunks']} chunks, "
                 f"{balance['total_candidates']} candidates, round-robin "
                 "`shard_tasks` assignment. Efficiency = mean/max shard "
                 "load (= the throughput fraction of perfect linear "
                 "scaling for compute-bound shards):")
    lines.append("")
    lines.append("| shards | efficiency |")
    lines.append("|---|---|")
    for n, e in balance["efficiency_by_shards"].items():
        lines.append(f"| {n} | {e * 100:.1f}% |")
    lines.append("")
    lines.append("## 4. Whole-genome projection (GRCh38, 5 Mb chunks)")
    lines.append("")
    lines.append(f"{projection['n_chunks']} chunks across 24 chromosomes, "
                 "chunk cost proportional to span:")
    lines.append("")
    lines.append("| shards (chips) | efficiency |")
    lines.append("|---|---|")
    for n, e in projection["efficiency_by_shards"].items():
        lines.append(f"| {n} | {e * 100:.1f}% |")
    lines.append("")
    lines.append("## 5. Multi-process mechanism")
    lines.append("")
    lines.append("tests/test_multiprocess_distributed.py spawns two real "
                 "processes through `jax.distributed.initialize` "
                 "(coordinator + client on localhost CPU), runs one shard "
                 "in each, and asserts the merged VCF equals the "
                 "single-process VCF. tests/test_distributed.py proves "
                 "1-shard == 4-shard merges.")
    lines.append("")
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALING.md")
    print(json.dumps({"dp_mesh": dp_mesh, "balance": balance,
                      "projection": projection}))


if __name__ == "__main__":
    main()
