#!/usr/bin/env python
"""Analytical multi-chip communication model for the sharded bootstrap
(VERDICT r3 weak item 3: quantify the >=80%-at-v5e-16 scaling target
without multi-chip hardware).

Per blind-rotation step (lambda=110 l2: N=1024, k+1=2, n=500 steps,
int32 coefficients), the collectives per parallelism axis are:

* ``dp`` (batch over chips): ZERO per-step communication -- each chip
  bootstraps its own gate lanes with replicated keys.  The only wire
  traffic is input/output ciphertext movement, outside the hot loop.
* ``tp`` (TRGSW rows / keyswitch contraction sharded): ONE psum of the
  partial external product, (B_local, k+1, N) int32, per step
  (`dist/shard.py:external_product_step_sharded`), plus one psum of
  (B_local, n+1) at the keyswitch.
* ``sp`` (polynomial axis sharded): ONE all_gather of the N-sharded
  accumulator per step (`dist/shard.py:_external_product_step_sp`) and
  one scatter+psum recombination at the end.

Bandwidth assumptions (publicly documented v5e figures; the model
carries them explicitly so they can be re-based):

* ICI: 1600 Gbit/s per chip aggregate = 200 GB/s (v5e 2D-torus ICI;
  ring-collective effective per-direction bandwidth taken as half).
* DCN: 25 GB/s per host (conservative; v5e-16 spans 2 hosts over ICI,
  so DCN only matters past a pod slice -- included for reference).

Compute time per step is the MEASURED single-chip figure
(artifacts/r4: 0.2348 ms/step at B=1024, split plane kernel), scaled
by the per-chip batch share.  Collectives are modeled two ways:

* UNOVERLAPPED (the r4 lower bound: the CMux scan is serial
  step-to-step, a psum sits on the critical path);
* OVERLAPPED via the r5 batch-pipelined schedule
  (`ops/blind_rotate.blind_rotate_sharded(overlap_chunks=C)`): the
  per-shard batch is split into C independent sub-chunks, so chunk
  c's psum runs concurrently with chunk c+1's matmuls (XLA async
  collectives).  Pipeline model: step time
  T(C) = max(K + M/C, K/C + M) for compute K and total comm M —
  the MXU is busy for K regardless; only the last chunk's psum (M/C)
  is exposed when compute dominates, and the first chunk's compute
  (K/C) when comm dominates.  Bit-exactness of the schedule is
  pinned on the virtual mesh
  (tests/test_dist.py::test_sharded_bootstrap_tp_overlap_chunks_bit_exact).

Writes one JSON artifact line.
"""

import json
import os
import sys

#: Cited bandwidth figures (VERDICT r4 weak #5: constants must carry
#: sources).  ICI: the Google Cloud TPU v5e product documentation
#: lists 1,600 Gbps inter-chip interconnect bandwidth per chip
#: (4 links x 400 Gbps, 2D torus) = 200 GB/s aggregate.  The ring
#: factor models per-collective effective bandwidth: a bidirectional
#: ring uses 2 of the 4 links per direction pair, and ring
#: all-reduce moves 2(w-1)/w of the payload per link
#: (standard ring-allreduce accounting; see e.g. the "How to Scale
#: Your Model" collectives chapter, jax-ml.github.io/scaling-book).
#: DCN: ~25 GB/s (200 Gbps) per v5e host NIC (scaling-book's quoted
#: order; conservative — used only to show why tp/sp must stay
#: intra-slice).
CITATIONS = {
    "ici": "Google Cloud TPU v5e docs: 1600 Gbps ICI per chip "
           "(4 links, 2D torus) = 200e9 B/s aggregate",
    "ring_factor": "ring collective on a 1D sub-ring uses 2/4 links; "
                   "ring-allreduce per-link traffic 2(w-1)/w x bytes "
                   "(jax-ml.github.io/scaling-book, collectives)",
    "dcn": "~2.5e10 B/s per v5e host (scaling-book roofline tables; "
           "order-of-magnitude, conservative)",
    "measured_step": "artifacts/EXT_FLOOR_r04.json / r4 step bench: "
                     "0.2348 ms/step at B=1024, split kernel, "
                     "ieache_110_l2",
}

ICI_GBPS = 200e9          # bytes/s per chip, v5e aggregate ICI
RING_FACTOR = 0.5         # effective per-collective bandwidth share
DCN_BPS = 25e9            # bytes/s per host (DCN)
MEASURED_STEP_MS = 0.2348  # B=1024, split plane kernel (r4 step bench)
MEASURED_B = 1024
N, KP1, NSTEPS, NP1 = 1024, 2, 500, 501
BYTES = 4


def ring_allreduce_bytes(nbytes, ways):
    return 2 * (ways - 1) / ways * nbytes


def ring_allgather_bytes(local_bytes, ways):
    return (ways - 1) * local_bytes


def model(total_chips, axis, ways, batch_per_chip, overlap_chunks=1,
          link_bps=None):
    """-> dict with per-step comm bytes/time and projected efficiency."""
    b = batch_per_chip
    step_compute_ms = MEASURED_STEP_MS * b / MEASURED_B
    acc_bytes = b * KP1 * N * BYTES
    if axis == "dp":
        comm_bytes = 0.0
    elif axis == "tp":
        comm_bytes = ring_allreduce_bytes(acc_bytes, ways)
    elif axis == "sp":
        comm_bytes = ring_allgather_bytes(acc_bytes / ways, ways)
    else:
        raise ValueError(axis)
    bw = (link_bps if link_bps is not None else ICI_GBPS) * RING_FACTOR
    comm_ms = comm_bytes / bw * 1e3
    k, m, c = step_compute_ms, comm_ms, overlap_chunks
    if c > 1:
        step_ms = max(k + m / c, k / c + m)
    else:
        step_ms = k + m
    eff = k / step_ms if step_ms else 1.0
    return {
        "axis": axis, "ways": ways, "chips": total_chips,
        "batch_per_chip": b,
        "overlap_chunks": c,
        "fabric": "dcn" if link_bps not in (None, ICI_GBPS) else "ici",
        "step_compute_ms": round(step_compute_ms, 4),
        "comm_bytes_per_step": int(comm_bytes),
        "comm_ms_per_step": round(comm_ms, 4),
        "projected_efficiency": round(eff, 3),
        "projected_bootstraps_per_s_total": round(
            total_chips * b / (NSTEPS * step_ms / 1e3), 1),
    }


def main():
    rows = []
    # the primary axis: dp weak scaling at the bench batch per chip
    for chips in (8, 16):
        rows.append(model(chips, "dp", chips, 1024))
    # tp within a host (ways=2/4), dp across the rest: unoverlapped
    # (r4 lower bound) AND the r5 batch-pipelined schedule
    for chips, tp in ((8, 2), (8, 4), (16, 2), (16, 4)):
        for c in (1, 2, 4):
            rows.append(model(chips, "tp", tp, 1024, overlap_chunks=c))
    # sp for latency-critical small batches (the only reason to shard
    # one bootstrap): B=8 expression-latency shapes
    for chips, sp in ((8, 4), (16, 4)):
        rows.append(model(chips, "sp", sp, 8))
        rows.append(model(chips, "sp", sp, 1024))
    # DCN rows: why the per-step axes must stay intra-slice — a tp=2
    # psum over DCN is ~8x slower than over ICI; dp over DCN stays at
    # 100% (zero per-step traffic), which is how multi-host scales
    rows.append(model(16, "tp", 2, 1024, overlap_chunks=4,
                      link_bps=DCN_BPS))
    rows.append(model(16, "dp", 16, 1024, link_bps=DCN_BPS))

    out = {
        "probe": "comm_model_v5e",
        "assumptions": {
            "ici_bytes_per_s_per_chip": ICI_GBPS,
            "ring_factor": RING_FACTOR,
            "dcn_bytes_per_s_per_host": DCN_BPS,
            "measured_step_ms_b1024": MEASURED_STEP_MS,
            "overlap": "overlap_chunks=1 rows are the unoverlapped "
                       "lower bound; overlap_chunks=C rows use the r5 "
                       "batch-pipelined schedule T=max(K+M/C, K/C+M)",
            "params": "ieache_110_l2 (N=1024, k+1=2, n=500)",
            "citations": CITATIONS,
        },
        "rows": rows,
        "conclusion": (
            "The batch axis (dp) carries the throughput target with "
            "ZERO per-step collectives: >=99% projected efficiency at "
            "v5e-16 over ICI and DCN alike, far above the >=80% "
            "BASELINE target -- the reference's own concurrency axis "
            "(independent gates) maps to dp, not tp/sp.  tp=2 "
            "projects "
            f"{model(8, 'tp', 2, 1024)['projected_efficiency']:.0%} "
            "unoverlapped (the r4 bound) and rises to "
            f"{model(8, 'tp', 2, 1024, 2)['projected_efficiency']:.0%}"
            " / "
            f"{model(8, 'tp', 2, 1024, 4)['projected_efficiency']:.0%}"
            " with the r5 batch-pipelined psum at C=2/4 chunks "
            "(bit-exact, tests/test_dist.py); tp remains primarily a "
            "memory-capacity tool but no longer costs a quarter of "
            "the machine.  sp at tiny batches is latency-bound by the "
            "same ratio; its r4 windowed block build makes it a "
            "memory fix (each device holds 1/sp of the Toeplitz "
            "transient), with comm cost only paying off when HBM, not "
            "FLOPs, is the binding constraint.  The DCN rows show why "
            "per-step collectives must stay intra-slice: a tp=2 psum "
            "over DCN drops to "
            f"{model(16, 'tp', 2, 1024, 4, DCN_BPS)['projected_efficiency']:.0%}"
            " even overlapped."
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
