"""Pileup backend selection: host C++ tile builder vs fused TPU-resident.

The reference picks its runtimes for the user (pypy for I/O-bound stages,
CPython+TF for inference, run_clair3_rna:1256-1296); the analogous product
decision here is which pileup formulation to run:

- "host": the C++ tile builder makes the count image on the host and only
  candidate windows cross the link (~4.8 MB per 1.2 Mb chunk set). Right
  whenever the host->device link is slow (tunnel-attached chips) or there
  is no accelerator.
- "fused": packed reads (~1 B/base, ~50 MB per 1.2 Mb chunk set) ship to
  HBM and the whole chunk (CIGAR expansion, count image, candidate mask,
  window gather, network, prescreen) runs in ONE jit (ops/fused_pileup).
  Right when the chip is locally attached: the ship stage drops under the
  host build's wall and the fused path frees the host cores that counting
  would burn (PERF.md crossover model).
- "auto": probe once and decide (below).
"""

import logging
import time

logger = logging.getLogger(__name__)

# Fused wins when shipping the packed wire is no slower than the host tile
# build it replaces: ~42 MB/s of wire per host-build-second measured on this
# class of host (50 MB wire vs ~1 s host build per 1.2 Mb @ 35x chunk set,
# PERF.md), with ~2x headroom for fetch round trips and contention. Below
# this the ship stage dominates and the host path's 4.8 MB wire wins;
# tunnel-grade links (~100-140 MB/s here) sit well below, PCIe/TPU-VM links
# (>= 8 GB/s) well above.
FUSED_MIN_LINK_BYTES_PER_S = 1e9

# Shallow-coverage exception: the wire is ~1 B/base of coverage, so at low
# depth it shrinks while host tile-build fixed costs do not -- measured at
# whole-genome scale (SCALE_RUN.json, 100 Mb at 14x over a ~130 MB/s
# tunnel): fused 1646 sites/s vs host 901, row-identical. Gated tightly
# around that measured point.
LOW_DEPTH_MIN_LINK_BYTES_PER_S = 100e6
LOW_DEPTH_MAX_MEAN_COVERAGE = 16.0


def estimate_mean_depth(bam_path, contigs=None, samples=4, span=20_000):
    """Crude mean coverage (bases per reference position, uncovered = 0)
    from a few mid-contig windows -- enough to gate the backend choice, not
    a promise (RNA coverage is bursty). None when nothing is sampled."""
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.pileup.chunk import open_bam
    from clair3_rna_tpu.pileup.packed import extract_region_packed

    bam = open_bam(bam_path)
    names = list(contigs) if contigs else list(bam.references)
    cfg = PileupConfig()
    total = n = 0
    for name in names[:samples]:
        length = bam.reference_lengths.get(name, 0)
        if length < span:
            continue
        mid = length // 2
        pk = extract_region_packed(bam, name, mid - span // 2,
                                   mid + span // 2, cfg)
        total += int(pk.cover_count.sum())
        n += len(pk.cover_count)
    return (total / n) if n else None


def probe_link_bandwidth(nbytes=50_000_000):
    """Measured host->device bandwidth (bytes/s) of one large transfer.

    One warm transfer is timed (the first transfer pays allocator setup);
    ~50 MB matches the fused path's per-chunk-set wire so TCP windows and
    chunking effects are representative."""
    import jax
    import numpy as np

    buf = np.zeros(nbytes, np.uint8)
    jax.device_put(buf).block_until_ready()  # warm allocator + route
    t0 = time.time()
    jax.device_put(buf).block_until_ready()
    return nbytes / max(time.time() - t0, 1e-9)


def choose_backend(bam_path=None, contigs=None):
    """-> (backend, reason) for --pileup_backend auto.

    With a bam_path, a few coverage windows are sampled so the measured
    shallow-coverage fused win (SCALE_RUN.json) is captured on mid-grade
    links too."""
    import jax

    if jax.default_backend() != "tpu":
        return "host", f"no TPU present (backend={jax.default_backend()})"
    bw = probe_link_bandwidth()
    if bw >= FUSED_MIN_LINK_BYTES_PER_S:
        return "fused", (f"TPU link {bw / 1e9:.2f} GB/s >= "
                         f"{FUSED_MIN_LINK_BYTES_PER_S / 1e9:.1f} GB/s: "
                         "chip-local, ship stage under the host-build wall")
    if bam_path is not None and bw >= LOW_DEPTH_MIN_LINK_BYTES_PER_S:
        try:
            depth = estimate_mean_depth(bam_path, contigs)
        except Exception:
            depth = None
        if depth is not None and depth <= LOW_DEPTH_MAX_MEAN_COVERAGE:
            return "fused", (
                f"TPU link {bw / 1e6:.0f} MB/s with shallow coverage "
                f"(~{depth:.0f}x <= {LOW_DEPTH_MAX_MEAN_COVERAGE:.0f}x): "
                "the ~1 B/base wire stays under the host-build wall "
                "(measured 1.8x fused win at 14x, SCALE_RUN.json)")
    return "host", (f"TPU link {bw / 1e6:.0f} MB/s < "
                    f"{FUSED_MIN_LINK_BYTES_PER_S / 1e9:.1f} GB/s: "
                    "packed wire would be transfer-bound")


def resolve_backend(requested=None, bam_path=None, contigs=None):
    """Final backend from the CLI flag / env var / auto probe.

    Precedence: explicit argument, then CLAIR3_RNA_TPU_PILEUP_BACKEND (kept
    as the operator override), then "host". "auto" probes the link (and,
    when a bam_path is given, samples coverage) once and logs the
    decision."""
    import os

    backend = (requested
               or os.environ.get("CLAIR3_RNA_TPU_PILEUP_BACKEND")
               or "host")
    if backend == "auto":
        backend, reason = choose_backend(bam_path=bam_path, contigs=contigs)
        logger.info("[INFO] pileup backend auto-selected: %s (%s)",
                    backend, reason)
    if backend in ("device", "pallas"):
        # scatter-backend selectors for the pure-array builder path
        # (pileup/builder._pileup_backend reads the same env var); at the
        # pipeline level they mean "not the fused formulation"
        return "host"
    if backend not in ("host", "fused"):
        raise ValueError(f"bad pileup backend: {backend!r} "
                         "(expected auto|host|fused)")
    return backend
