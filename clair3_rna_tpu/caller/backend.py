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
# tunnel-grade links (~139 MB/s here) sit well below, PCIe/TPU-VM links
# (>= 8 GB/s) well above.
FUSED_MIN_LINK_BYTES_PER_S = 1e9


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


def choose_backend():
    """-> (backend, reason) for --pileup_backend auto."""
    import jax

    if jax.default_backend() != "tpu":
        return "host", f"no TPU present (backend={jax.default_backend()})"
    bw = probe_link_bandwidth()
    if bw >= FUSED_MIN_LINK_BYTES_PER_S:
        return "fused", (f"TPU link {bw / 1e9:.2f} GB/s >= "
                         f"{FUSED_MIN_LINK_BYTES_PER_S / 1e9:.1f} GB/s: "
                         "chip-local, ship stage under the host-build wall")
    return "host", (f"TPU link {bw / 1e6:.0f} MB/s < "
                    f"{FUSED_MIN_LINK_BYTES_PER_S / 1e9:.1f} GB/s: "
                    "packed wire would be transfer-bound")


def resolve_backend(requested=None):
    """Final backend from the CLI flag / env var / auto probe.

    Precedence: explicit argument, then CLAIR3_RNA_TPU_PILEUP_BACKEND (kept
    as the operator override), then "host". "auto" probes the link once and
    logs the decision."""
    import os

    backend = (requested
               or os.environ.get("CLAIR3_RNA_TPU_PILEUP_BACKEND")
               or "host")
    if backend == "auto":
        backend, reason = choose_backend()
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
