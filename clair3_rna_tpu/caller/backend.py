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
- "hybrid": decide PER CHUNK, from measurements taken DURING the run.
  The repo's own artifacts prove the right choice depends on both depth
  and the day's link: fused won 1.8x at 14x on the round-4 link
  (SCALE_RUN_r04.json) yet lost 1.7x at the same 14x on the round-5
  link (SCALE_RUN.json), and lost 2.6x at 260x (BENCH_r04) -- while real
  lrRNA coverage spans 3-4 orders of magnitude within one sample (that
  is why the reference's renormalization exists,
  /root/reference/clair3_rna/utils.py:88-92). ChunkRoutePolicy therefore
  routes each chunk to the route with the lower MEASURED per-chunk wall
  in its depth bucket (EWMAs fed by the pipeline's own joblog timer,
  losers re-explored on a bounded cadence); a static cost model over the
  chunk's BAI-byte span and the probed link only steers chunks in
  not-yet-measured buckets. Both routes are VCF-row-identical, so any
  mix merges exactly.
- "auto": "hybrid" whenever a TPU is present, else "host". (Rounds 3-4
  used a global link-bandwidth probe plus a sampled mean-depth clause
  here; per-chunk routing strictly dominates both and made the global
  depth estimate unnecessary.)
"""

import logging
import os
import time

import numpy as np

logger = logging.getLogger(__name__)

# --- ChunkRoutePolicy cost-model PRIOR constants -----------------------------
# Fitted to MEASURED per-chunk pipeline walls on this class of host (2-vCPU
# + tunnel v5e: SCALE_RUN_r04.json 14x whole-genome, BENCH_r04 35x/260x)
# and env-overridable for other deployments. Since r05 these constants
# only steer chunks whose depth bucket has no measured walls yet (the
# router then follows in-run measurements -- the r04-fitted constants
# mis-routed every chunk on the r05 link, see ChunkRoutePolicy); they
# fold build + staging + overlap effects, not isolated stage rates, and
# only have to ORDER two costs that differ by integer factors at the
# regime boundaries:
#
#   host_s(chunk)  = H_FIX_S_PER_POS * width + bases / HOST_BUILD_BPS
#   fused_s(chunk) = FUSED_FIX_S + bases / PACKED_EXTRACT_BPS
#                    + bases * WIRE_BYTES_PER_BASE / link_bps
#   route fused iff fused_s <= host_s * FUSED_PREFERENCE
#
# Fit checks against the committed measurements (130 MB/s link, 100 kb
# chunks; "measured" = the round-4 per-chunk walls those artifacts imply):
#   14x  (1.4 M bases): model host 0.064 / fused 0.046 -> fused
#        (measured: host 0.074 s/chunk, fused 0.040 -- the 1.8x win)
#   35x  (3.5 M bases): model host 0.070 / fused 0.101 -> host
#        (measured: host 0.072 s/chunk, fused 0.098)
#   260x (26 M bases):  model host 0.134 / fused 0.68  -> host
#        (measured: host ~0.22 s/chunk, fused ~0.58 -- the 2.6x loss)
#   chip-local 8 GB/s at 35x: model host 0.070 / fused 0.074 -> fused via
#        the preference margin (equal walls, but fused frees the host
#        cores that counting would burn -- the deployment regime the
#        formulation exists for, PERF.md crossover model)
H_FIX_S_PER_POS = float(os.environ.get(
    "CLAIR3_RNA_TPU_HOST_FIX_S_PER_POS", 0.6e-6))
HOST_BUILD_BPS = float(os.environ.get(
    "CLAIR3_RNA_TPU_HOST_BUILD_BPS", 350e6))
PACKED_EXTRACT_BPS = float(os.environ.get(
    "CLAIR3_RNA_TPU_PACKED_EXTRACT_BPS", 55e6))
FUSED_FIX_S = float(os.environ.get("CLAIR3_RNA_TPU_FUSED_FIX_S", 0.01))
FUSED_PREFERENCE = float(os.environ.get(
    "CLAIR3_RNA_TPU_FUSED_PREFERENCE", 1.25))
WIRE_BYTES_PER_BASE = float(os.environ.get(
    "CLAIR3_RNA_TPU_WIRE_BYTES_PER_BASE", 1.0))
# bases-per-compressed-BAM-byte seed before any chunk has calibrated it.
# A BAM spends ~0.5 B/base of seq + ~1 B/base of qual + per-read overhead,
# and BGZF recovers ~30-50% on that mix -- measured ~0.5 bases/cbyte on the
# test corpus. Refined online with an EWMA as chunks complete, so the seed
# only steers the first few chunks.
BASES_PER_CBYTE_SEED = float(os.environ.get(
    "CLAIR3_RNA_TPU_BASES_PER_CBYTE", 0.6))
# re-try a bucket's measured-losing route every N chunks (scaled by the
# measured gap) so routing tracks link weather within the run; at a 2x
# route gap the exploration overhead is ~(2-1)/N = 4%
ROUTE_EXPLORE_EVERY = int(os.environ.get(
    "CLAIR3_RNA_TPU_ROUTE_EXPLORE_EVERY", "25"))
# a bucket whose ALTERNATIVE route has never been measured tries it much
# sooner -- small runs (the 12-chunk bench configs, targeted regions)
# must be able to learn the day's regime inside one pass
ROUTE_PROBE_AFTER = int(os.environ.get(
    "CLAIR3_RNA_TPU_ROUTE_PROBE_AFTER", "4"))


def probe_link_bandwidth(nbytes=50_000_000):
    """Measured host->device bandwidth (bytes/s) of one large transfer.

    One warm transfer is timed (the first transfer pays allocator setup);
    ~50 MB matches the fused path's per-chunk-set wire so TCP windows and
    chunking effects are representative."""
    import jax

    buf = np.zeros(nbytes, np.uint8)
    jax.device_put(buf).block_until_ready()  # warm allocator + route
    t0 = time.time()
    jax.device_put(buf).block_until_ready()
    return nbytes / max(time.time() - t0, 1e-9)


_LINK_BPS_CACHE = None


def cached_link_bandwidth():
    """probe_link_bandwidth, once per process (the probe ships 100 MB)."""
    global _LINK_BPS_CACHE
    if _LINK_BPS_CACHE is None:
        _LINK_BPS_CACHE = probe_link_bandwidth()
    return _LINK_BPS_CACHE


class ChunkRoutePolicy:
    """Per-chunk host-vs-fused routing for --pileup_backend hybrid.

    The chunk's aligned-base count is estimated from the compressed BAM
    bytes its region spans in the BAI (io/bai.py; the same index every
    fetch uses), scaled by a bases-per-compressed-byte ratio that starts
    at a measured seed and is EWMA-calibrated from every completed chunk's
    ACTUAL base count (`observe`), whichever route ran it. The estimate
    only has to land within ~2x: the regimes it separates differ by 20x+
    in wire bytes.

    Routing itself is MEASUREMENT-DRIVEN within the run: chunks bucket by
    log2(estimated bases), and per (bucket, route) the policy keeps an
    EWMA of the MEASURED per-chunk build wall (`observe_wall`, fed by the
    pipeline's joblog timer; compile-bearing chunks excluded). A bucket
    with both routes measured routes to the measured winner and re-tries
    the loser every ROUTE_EXPLORE_EVERY chunks scaled by the measured gap
    so the decision tracks link weather at bounded cost; a bucket with
    one route measured probes the other after just ROUTE_PROBE_AFTER
    chunks -- small runs must learn the day's regime inside one pass --
    but fused only once its graphs exist in-process or the static model
    puts it within 3x (a cold fused compile can cost minutes on a tunnel
    and must not be bought for curiosity). Only unmeasured buckets fall
    back to the static cost-model prior below. The r05 SCALE_RUN runs
    made the case for this: constants
    fitted to the round-4 link routed every 14x chunk fused while the
    host route was measured winning 1.7x on that day's link -- a static
    model cannot track an environment that swings 10x between sessions.
    Known bias: the host route's wall excludes its (async, cross-chunk
    batched) device inference, so ties lean host -- the direction that
    never buys a wire regression.

    Thread-safe: `route`/`observe*` are called from the pipeline's
    prefetch pool. Routing is intentionally NOT bit-deterministic across
    runs (EWMAs depend on completion order under threading) -- both
    routes emit identical VCF rows, so the merged output is deterministic
    regardless (tests/test_hybrid_backend.py proves it).
    """

    def __init__(self, bam_path, link_bps, ref_index):
        import threading

        from clair3_rna_tpu.io.bai import BaiIndex, index_path_for

        self.link_bps = float(link_bps)
        self.ref_index = ref_index
        self.bases_per_cbyte = BASES_PER_CBYTE_SEED
        self.fused_chunks = 0
        self.host_chunks = 0
        self.explore_chunks = 0
        # bucket -> route -> [ewma_wall_s, n_obs]; bucket -> chunks since
        # the measured loser (or unmeasured route) was last tried
        self._walls: dict = {}
        self._since_alt: dict = {}
        self._lock = threading.Lock()
        self._bai = None
        bai_path = index_path_for(bam_path) if bam_path else None
        if bai_path and os.path.exists(bai_path):
            try:
                self._bai = BaiIndex.load(bai_path)
            except Exception:
                logger.warning("[WARNING] hybrid backend: unreadable BAI "
                               "index %s; routing all chunks to host",
                               bai_path)

    @property
    def usable(self):
        return self._bai is not None

    def region_cbytes(self, ctg, start, end):
        """Compressed BAM bytes whose records may overlap [start, end) --
        the BAI chunk spans' compressed-offset extent (merged)."""
        rid = self.ref_index.get(ctg)
        if self._bai is None or rid is None:
            return None
        total = 0
        for vbeg, vend in self._bai.query(rid, start, end):
            # virtual offset = coffset << 16 | uoffset; spans are merged by
            # BGZF block already, so coffset deltas do not double-count
            total += max((vend >> 16) - (vbeg >> 16), 0)
        return total

    def estimate_bases(self, ctg, start, end):
        cb = self.region_cbytes(ctg, start, end)
        if cb is None:
            return None
        with self._lock:
            ratio = self.bases_per_cbyte
        return cb * ratio

    @staticmethod
    def _bucket(bases):
        """log2 depth bucket; chunks within one bucket differ <=2x in
        bases, so raw wall EWMAs compare fairly inside it."""
        import math

        return max(0, int(math.log2(max(bases, 1.0) / 1e5)))

    def _model_costs(self, width, bases):
        """Static cost-model prior (constants above): (choice, host_s,
        fused_s). Used before a bucket has measurements."""
        host_s = H_FIX_S_PER_POS * width + bases / HOST_BUILD_BPS
        fused_s = (FUSED_FIX_S + bases / PACKED_EXTRACT_BPS
                   + bases * WIRE_BYTES_PER_BASE / self.link_bps)
        choice = "fused" if fused_s <= host_s * FUSED_PREFERENCE else "host"
        return choice, host_s, fused_s

    def route(self, ctg, start, end):
        """-> "fused" | "host" for one chunk (measured walls first, static
        model prior for unmeasured buckets; see class docstring)."""
        bases = self.estimate_bases(ctg, start, end)
        if bases is None:
            with self._lock:
                self.host_chunks += 1
            return "host"
        width = end - start
        model_pick, model_host_s, model_fused_s = self._model_costs(
            width, bases)
        b = self._bucket(bases)
        with self._lock:
            walls = self._walls.get(b, {})
            measured = {r: w[0] for r, w in walls.items() if w[1] > 0}
            self._since_alt[b] = self._since_alt.get(b, 0) + 1
            due = self._since_alt[b] >= ROUTE_EXPLORE_EVERY
            explored = False
            if len(measured) == 2:
                choice = min(measured, key=measured.get)
                # cadence scales with the measured gap so exploration
                # overhead stays ~(r-1)/(EXPLORE_EVERY*r) <= 4% even when
                # the loser is far behind
                ratio = max(measured.values()) / max(min(measured.values()),
                                                     1e-9)
                if self._since_alt[b] >= ROUTE_EXPLORE_EVERY * max(1.0,
                                                                   ratio):
                    choice = "fused" if choice == "host" else "host"
                    explored = True
            elif len(measured) == 1:
                (choice,) = measured
                if self._since_alt[b] >= ROUTE_PROBE_AFTER:
                    other = "fused" if choice == "host" else "host"
                    # a cold fused compile costs minutes on a tunnel; only
                    # buy it when fused graphs already exist in-process or
                    # the model prior puts fused within 3x of host
                    if other == "host" or self.fused_chunks > 0 \
                            or model_fused_s < 3.0 * model_host_s:
                        choice = other
                        explored = True
            else:
                choice = model_pick
            if explored:
                self.explore_chunks += 1
                self._since_alt[b] = 0
            if choice == "fused":
                self.fused_chunks += 1
            else:
                self.host_chunks += 1
        return choice

    def observe(self, ctg, start, end, actual_bases):
        """Calibrate bases-per-compressed-byte from a completed chunk."""
        cb = self.region_cbytes(ctg, start, end)
        if not cb or actual_bases <= 0:
            return
        ratio = actual_bases / cb
        with self._lock:
            self.bases_per_cbyte = (0.7 * self.bases_per_cbyte
                                    + 0.3 * ratio)

    def observe_wall(self, route, ctg, start, end, wall_s,
                     compiled=False):
        """Record a completed chunk's measured build wall for its route.

        Bucketed by the same BAI-byte ESTIMATE route() used, so the
        statistics land where the decisions are made. Walls from chunks
        that paid a jit trace/compile (`compiled`, detected by the
        pipeline via FusedChunkCaller.graph_count) are discarded -- a
        ~60 s one-time compile would poison a ~0.1 s steady-state EWMA
        and exile the route; as belt-and-braces any wall >20x the
        existing EWMA is soft-clamped (a genuine sustained regression
        still drags the EWMA up at 20x/observation, an isolated anomaly
        cannot exile a route)."""
        if wall_s <= 0 or compiled:
            return
        bases = self.estimate_bases(ctg, start, end)
        if not bases or bases <= 0:
            return
        b = self._bucket(bases)
        with self._lock:
            ew = self._walls.setdefault(b, {}).setdefault(route, [0.0, 0])
            if ew[1] > 0:
                wall_s = min(wall_s, 20.0 * ew[0])
            ew[0] = wall_s if ew[1] == 0 else 0.7 * ew[0] + 0.3 * wall_s
            ew[1] += 1

    def counters(self):
        with self._lock:
            return {"fused_chunks": self.fused_chunks,
                    "host_chunks": self.host_chunks,
                    "explore_chunks": self.explore_chunks,
                    "bases_per_cbyte": round(self.bases_per_cbyte, 3),
                    "bucket_walls": {
                        b: {r: round(w[0], 4) for r, w in rw.items()}
                        for b, rw in sorted(self._walls.items())}}


def choose_backend():
    """-> (backend, reason) for --pileup_backend auto."""
    import jax

    if jax.default_backend() != "tpu":
        return "host", f"no TPU present (backend={jax.default_backend()})"
    return "hybrid", ("TPU present: per-chunk host-vs-fused routing from "
                      "walls measured during the run (ChunkRoutePolicy; "
                      "the winning route flips with depth AND link "
                      "weather -- fused won 1.8x at 14x on the r04 link "
                      "and lost 1.7x at the same depth on the r05 link, "
                      "SCALE_RUN_r04/SCALE_RUN)")


def resolve_backend(requested=None, bam_path=None, contigs=None):
    """Final backend from the CLI flag / env var / auto probe.

    Precedence: explicit argument, then CLAIR3_RNA_TPU_PILEUP_BACKEND (kept
    as the operator override), then "host". "auto" picks hybrid on TPU,
    host elsewhere, and logs the decision. bam_path/contigs are accepted
    for call-site compatibility (the per-chunk policy reads the BAI itself
    inside run_calling)."""
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
    if backend not in ("host", "fused", "hybrid"):
        raise ValueError(f"bad pileup backend: {backend!r} "
                         "(expected auto|host|fused|hybrid)")
    return backend
