"""Two REAL processes through jax.distributed.initialize on localhost CPU:
each process initializes the collective runtime, owns its contig-chunk shard,
writes shard manifests, and the parent merges them to the exact single-host
VCF. This exercises parallel/distributed.py:initialize end to end, not just
the sharding arithmetic."""

import os
import random
import socket
import subprocess
import sys
import textwrap

from tests import simdata
from clair3_rna_tpu.io.fasta import write_fasta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    repo, work, bam, fasta, coord, n_proc, pid = sys.argv[1:8]
    sys.path.insert(0, repo)
    n_proc, pid = int(n_proc), int(pid)

    from clair3_rna_tpu.parallel import distributed

    n, i = distributed.initialize(coordinator_address=coord,
                                  num_processes=n_proc, process_id=pid)
    assert (n, i) == (n_proc, pid), (n, i)
    import jax
    assert jax.process_count() == n_proc

    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.models.network import init_params, make_wire_forward_fn

    params = init_params(0)
    _, forward = make_wire_forward_fn()
    stats = distributed.run_sharded_calling(
        bam, fasta, work, cfg=PileupConfig(batch_size=64),
        call_cfg=CallConfig(show_ref=True), params=params, forward=forward,
        contigs=["chr1", "chr2"], n_shards=n_proc, shard_id=pid,
        chunk_size=2500)
    print("SHARD_DONE", pid, stats.rows, flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_jax_distributed_calling(tmp_path):
    rng = random.Random(61)
    genome = simdata.random_genome(rng, [("chr1", 8000), ("chr2", 5000)])
    variants = simdata.plant_variants(rng, genome, n_per_contig=14)
    fasta = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "reads.bam")
    write_fasta(fasta, genome)
    simdata.simulate_bam(bam, genome, variants, rng, depth=30)

    # single-host oracle (in this process)
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.models.network import init_params, make_wire_forward_fn

    params = init_params(0)
    _, forward = make_wire_forward_fn()
    single = str(tmp_path / "single.vcf")
    run_calling(bam, fasta, single, cfg=PileupConfig(batch_size=64),
                call_cfg=CallConfig(show_ref=True), params=params,
                forward=forward, contigs=["chr1", "chr2"], chunk_size=2500,
                compress=False, progress=False)

    work = str(tmp_path / "work")
    worker_py = str(tmp_path / "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    # force the pure-CPU backend in the children: the coordinator/client pair
    # must not race for the single tunnelled TPU, and the ambient
    # sitecustomize pins the axon platform unless PYTHONPATH is replaced
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    procs = [subprocess.Popen(
        [sys.executable, worker_py, REPO, work, bam, fasta, coord, "2",
         str(pid)], env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\nstdout:{out}\nstderr:{err[-2000:]}"
        assert "SHARD_DONE" in out

    from clair3_rna_tpu.parallel.distributed import merge_shards
    merged = str(tmp_path / "merged.vcf")
    merge_shards(work, 2, merged, show_ref=True, compress=False,
                 qual_cutoff=PileupConfig().effective_qual_cutoff,
                 reference_file_path=fasta)

    def rows(path):
        return [l for l in open(path) if not l.startswith("#")]

    assert rows(merged) == rows(single)
    assert len(rows(merged)) > 10
