"""Weak-scaling harness over a virtual device mesh (SURVEY §7 step 9).

Weak scaling: each device gets a constant per-device workload, so
ideal scaling keeps wall-clock flat as devices are added. Set 1 is k
concatenated copies of one base block (identical per-shard rows ->
identical per-shard worklists by construction); set 2 is that base
block, so matched pairs and the matrix checksum scale exactly
linearly with k — a nonzero-output workload, not an empty worklist.

Runs the sharded dense overlap (replicated set 2, psum merge) and the
ring variant (set 2 sharded + ppermute) on 1..N devices of the
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N).

Two efficiencies are reported:
  efficiency       = t(1) / t(k)      — the real-hardware definition.
  core_normalized  = k * t(1) / t(k)  — honest on THIS host: all k
    virtual "devices" share one physical core, so even a perfectly
    scaling SPMD program serializes to k * t(1); values near 1.0 mean
    the collectives/padding add little beyond that serialization.
On real chips (one core of silicon per device) `efficiency` is the
number to quote; the virtual mesh can only validate the program and
bound the non-compute overhead via `core_normalized`.

Usage:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/weak_scaling.py [--per-device 20000] [--mode ring]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def tile_db(base, k: int):
    """k stacked copies of a SeqDB (weak-scaling workload builder)."""
    if k == 1:
        return base
    return dataclasses.replace(
        base,
        seqs=np.tile(base.seqs, (k, 1)),
        lengths=np.tile(base.lengths, k),
        counts=np.tile(base.counts, k),
        rep_no=np.tile(base.rep_no, k),
        v_no=np.tile(base.v_no, k),
        j_no=np.tile(base.j_no, k),
        sequence_ids=list(base.sequence_ids) * k,
        keep=list(base.keep) * k,
        residues_count=base.residues_count * k,
        total_dup_count=base.total_dup_count * k,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=20_000)
    ap.add_argument("--mode", choices=["sharded", "ring"],
                    default="sharded")
    args = ap.parse_args()

    import jax

    from bench import synth_arrays
    from compairr_tpu.constants import SCORE_PRODUCT
    from compairr_tpu.ops.engine import MatchSpec
    from compairr_tpu.parallel.mesh import (
        dense_matrix_ring,
        dense_matrix_sharded,
    )

    devices = jax.devices()
    nmax = len(devices)
    spec = MatchSpec(differences=1, indels=False, ignore_genes=False)
    run = dense_matrix_ring if args.mode == "ring" else dense_matrix_sharded

    base = synth_arrays(args.per_device, n_reps=12, n_v=16, n_j=6, seed=76)
    results = []
    t1 = None
    counts = [1]
    k = 2
    while k <= nmax:
        counts.append(k)
        k *= 2
    for ndev in counts:
        d1 = tile_db(base, ndev)
        devs = devices[:ndev]
        # warm (compile) then measure
        run(d1, base, spec, SCORE_PRODUCT, False, devices=devs)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            m = run(d1, base, spec, SCORE_PRODUCT, False, devices=devs)
            best = min(best, time.perf_counter() - t0)
        if t1 is None:
            t1 = best
        results.append(
            dict(devices=ndev, rows1=d1.n, wall_s=best,
                 efficiency=t1 / best,
                 core_normalized=min(ndev * t1 / best, float(ndev)),
                 checksum=float(m.sum()))
        )
        print(json.dumps(results[-1]))

    # the workload construction guarantees exact linearity
    assert all(
        abs(r["checksum"] - r["devices"] * results[0]["checksum"]) < 1e-6
        for r in results
    ), "matrix checksum must scale linearly with the device count"

    print(
        json.dumps(
            dict(
                metric=f"weak-scaling ({args.mode}, virtual "
                       f"{nmax}-device mesh)",
                per_device_rows=args.per_device,
                efficiency_at_max=results[-1]["efficiency"],
                core_normalized_at_max=results[-1]["core_normalized"],
                results=results,
            )
        )
    )


if __name__ == "__main__":
    main()
