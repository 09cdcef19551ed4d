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
by the per-chip batch share.  Collectives are modeled UNOVERLAPPED
(worst case: the CMux scan is serial step-to-step, so a psum sits on
the critical path; XLA can partially hide the all_gather under the
rotation, making these lower bounds on efficiency).

Writes one JSON artifact line.
"""

import json
import os
import sys

ICI_GBPS = 200e9          # bytes/s per chip, v5e aggregate ICI
RING_FACTOR = 0.5         # effective per-collective bandwidth share
MEASURED_STEP_MS = 0.2348  # B=1024, split plane kernel (r4 step bench)
MEASURED_B = 1024
N, KP1, NSTEPS, NP1 = 1024, 2, 500, 501
BYTES = 4


def ring_allreduce_bytes(nbytes, ways):
    return 2 * (ways - 1) / ways * nbytes


def ring_allgather_bytes(local_bytes, ways):
    return (ways - 1) * local_bytes


def model(total_chips, axis, ways, batch_per_chip):
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
    comm_ms = comm_bytes / (ICI_GBPS * RING_FACTOR) * 1e3
    eff = step_compute_ms / (step_compute_ms + comm_ms)
    return {
        "axis": axis, "ways": ways, "chips": total_chips,
        "batch_per_chip": b,
        "step_compute_ms": round(step_compute_ms, 4),
        "comm_bytes_per_step": int(comm_bytes),
        "comm_ms_per_step": round(comm_ms, 4),
        "projected_efficiency": round(eff, 3),
        "projected_bootstraps_per_s_total": round(
            total_chips * b / (NSTEPS * (step_compute_ms + comm_ms)
                               / 1e3), 1),
    }


def main():
    rows = []
    # the primary axis: dp weak scaling at the bench batch per chip
    for chips in (8, 16):
        rows.append(model(chips, "dp", chips, 1024))
    # tp within a host (ways=2/4), dp across the rest
    for chips, tp in ((8, 2), (8, 4), (16, 2), (16, 4)):
        rows.append(model(chips, "tp", tp, 1024))
    # sp for latency-critical small batches (the only reason to shard
    # one bootstrap): B=8 expression-latency shapes
    for chips, sp in ((8, 4), (16, 4)):
        rows.append(model(chips, "sp", sp, 8))
        rows.append(model(chips, "sp", sp, 1024))

    out = {
        "probe": "comm_model_v5e",
        "assumptions": {
            "ici_bytes_per_s_per_chip": ICI_GBPS,
            "ring_factor": RING_FACTOR,
            "measured_step_ms_b1024": MEASURED_STEP_MS,
            "overlap": "none (lower bound; scan is step-serial)",
            "params": "ieache_110_l2 (N=1024, k+1=2, n=500)",
        },
        "rows": rows,
        "conclusion": (
            "The batch axis (dp) carries the throughput target with "
            "ZERO per-step collectives: >=99% projected efficiency at "
            "v5e-16, far above the >=80% BASELINE target -- the "
            "reference's own concurrency axis (independent gates) maps "
            "to dp, not tp/sp.  tp=2 projects ~"
            f"{model(8, 'tp', 2, 1024)['projected_efficiency']:.0%} and "
            "tp=4 ~"
            f"{model(8, 'tp', 4, 1024)['projected_efficiency']:.0%} "
            "unoverlapped (one 8 MB psum per step vs 0.235 ms of "
            "compute), so tp is a memory-capacity tool, not a "
            "throughput tool.  sp at tiny batches is latency-bound by "
            "the same ratio; its r4 windowed block build makes it a "
            "memory fix (each device holds 1/sp of the Toeplitz "
            "transient), with comm cost only paying off when HBM, not "
            "FLOPs, is the binding constraint."
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
