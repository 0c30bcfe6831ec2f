#!/usr/bin/env python
"""Roofline + limiter isolation for the fused device pass (VERDICT r04 #3).

Measures, STREAM-ORDERED (dispatch everything, sync once on the last
output -- the same methodology as bench.py's device_stream_s), three
nested slices of the fused graph over the bench chunk set pre-staged in
HBM:

  1. kernel_only   -- the ops/tilelet Pallas expansion alone
                      (counts+ranks from packed rows; no side channel,
                      no mask, no network);
  2. front_end     -- the fused graph's sel path (expansion + sparse side
                      channel + i1 patch + negation + window gather;
                      everything EXCEPT mask+network+prescreen);
  3. full_graph    -- the complete fused jit (what bench times).

and derives the HBM roofline for the expansion pattern:

  bytes/event = codes read (the int32-cast tilelet bytes the kernel
                actually streams: 2 B per aligned base) + per-tile output
                flush amortized over the tile's events
                (2x[C_PAD,HALF] + 2x[G_PAD,HALF] f32 = 40 KiB per
                256-position tile) + visit metadata (negligible)

  roofline_events_per_s = HBM_BW / bytes_per_event

v5e HBM ~819 GB/s. The gap between kernel_only and that bound, and the
split between the three slices, names the limiter with measurement rather
than conjecture. Results print as one JSON line and should be quoted in
PERF.md's roofline table.

Run on the chip: python tools/roofline.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HBM_BW = 819e9  # v5e spec HBM bandwidth, bytes/s


def main():
    import jax
    import numpy as np

    import bench
    from clair3_rna_tpu import config as _c
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.config import PileupConfig
    from clair3_rna_tpu.io.fasta import FastaFile
    from clair3_rna_tpu.ops import tilelet as tlt
    from clair3_rna_tpu.ops.fused_pileup import (FusedChunkCaller,
                                                 resolve_scatter,
                                                 stage_chunk_packed,
                                                 staged_packed_args)
    from clair3_rna_tpu.pileup.chunk import (open_bam, plan_chunks,
                                             ref_codes_from)
    from clair3_rna_tpu.pileup.packed import extract_region_packed

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    fasta_path, bam_path = bench.make_data()
    cfg = PileupConfig(batch_size=2048)
    params = bench.get_trained_params()
    fasta = FastaFile(fasta_path)
    bam = open_bam(bam_path)
    scatter = resolve_scatter()

    staged_list = []
    n_events = 0
    n_tiles_rows = []
    for task in plan_chunks(fasta, contigs=["chr1"], chunk_size=100_000):
        contig_len = fasta.contig_length(task.ctg_name)
        row_lo = max(0, task.start - 33)
        row_hi = min(contig_len, task.end + 33)
        ref_lo = max(0, task.start - _c.EXPAND_REFERENCE_REGION)
        ref_seq = fasta.fetch(task.ctg_name, ref_lo,
                              min(contig_len,
                                  task.end + _c.EXPAND_REFERENCE_REGION))
        codes = ref_codes_from(ref_seq[row_lo - ref_lo: row_hi - ref_lo])
        pk = extract_region_packed(bam, task.ctg_name, row_lo, row_hi, cfg)
        n_events += pk.n_events
        st = stage_chunk_packed(pk, codes, cfg, task.start, task.end,
                                scatter=scatter)
        n_tiles_rows.append((st.width // tlt.POS_TILE,
                             st.tl_codes.shape[0],
                             int(st.visit_valid.sum())))
        staged_list.append([jax.device_put(a)
                            for a in staged_packed_args(st)])

    caller = FusedChunkCaller(params, cfg, CallConfig(show_ref=False),
                              scatter=scatter, mode="packed")

    # --- slice 1: the Pallas kernel alone -------------------------------
    import functools

    import jax.numpy as jnp

    @functools.lru_cache(maxsize=None)
    def kernel_fn(width):
        # one jitted graph per width bucket (a tiny reduction returns, so
        # only O(1) bytes materialize to the host per call)
        if scatter == "xla":
            return jax.jit(lambda c, t, r, s: tlt.tilelet_expand_xla(
                c, t, r, s, width)[0].sum())
        return jax.jit(lambda c, t, r, s, vt, vb, vf, vl, vv:
                       tlt.tilelet_expand(
                           c, t, r.astype(jnp.float32), s, vt, vb, vf, vl,
                           vv, width)[0].sum())

    def _stream(fn_calls, n=3):
        best = None
        for _ in range(n):
            t0 = time.time()
            outs = [f() for f in fn_calls]
            jax.block_until_ready(outs[-1])
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best

    # staged_packed_args order: [tl_codes, tl_valid, tl_tile, tl_rank,
    # tl_strand, tl_hp, visit_tiles, visit_blocks, visit_firsts,
    # visit_lasts, visit_valid, ...]
    kern_calls = []
    for args, (n_tiles, _r, _v) in zip(staged_list, n_tiles_rows):
        w = n_tiles * tlt.POS_TILE
        fn = kernel_fn(w)
        if scatter == "xla":
            kern_calls.append(lambda a=args, f=fn: f(a[0], a[2], a[3],
                                                     a[4]))
        else:
            kern_calls.append(lambda a=args, f=fn: f(
                a[0], a[2], a[3], a[4], a[6], a[7], a[8], a[9], a[10]))

    sel = np.arange(caller.max_candidates, dtype=np.int32)
    front_calls = [lambda a=args: caller.fused(*a, sel=sel)
                   for args in staged_list]
    full_calls = [lambda a=args: caller.fused(*a) for args in staged_list]

    for calls in (kern_calls, front_calls, full_calls):
        calls[0]()  # warm compile
        _stream(calls, n=1)

    kernel_s = _stream(kern_calls)
    front_s = _stream(front_calls)
    full_s = _stream(full_calls)

    # --- roofline -------------------------------------------------------
    total_rows = sum(r for _t, r, _v in n_tiles_rows)
    total_tiles = sum(t for t, _r, _v in n_tiles_rows)
    total_visits = sum(v for _t, _r, v in n_tiles_rows)
    codes_bytes = total_rows * tlt.HALF * 4        # int32-cast stream
    flush_bytes = total_tiles * (2 * tlt.C_PAD + 2 * tlt.G_PAD) \
        * tlt.HALF * 4
    bytes_per_event = (codes_bytes + flush_bytes) / max(n_events, 1)
    roofline_eps = HBM_BW / bytes_per_event

    result = {
        "n_events": int(n_events),
        "n_chunks": len(staged_list),
        "total_rows": int(total_rows),
        "total_tiles": int(total_tiles),
        "total_visits": int(total_visits),
        "scatter": scatter,
        "kernel_only_s": round(kernel_s, 4),
        "front_end_s": round(front_s, 4),
        "full_graph_s": round(full_s, 4),
        "kernel_events_per_s": round(n_events / kernel_s, 1),
        "front_end_events_per_s": round(n_events / front_s, 1),
        "full_graph_events_per_s": round(n_events / full_s, 1),
        "mask_network_s": round(max(full_s - front_s, 0.0), 4),
        "hbm_bytes_per_event": round(bytes_per_event, 2),
        "roofline_events_per_s": round(roofline_eps, 1),
        "kernel_pct_of_roofline": round(
            100.0 * (n_events / kernel_s) / roofline_eps, 2),
        "note": ("stream-ordered best-of-3; kernel_only = tilelet "
                 "expansion alone, front_end = fused sel path (no "
                 "mask/network), full_graph = complete fused jit"),
    }
    with open(os.path.join(REPO, "ROOFLINE.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
