"""Weak-scaling harness over a virtual device mesh (SURVEY §7 step 9).

Weak scaling: each device gets a constant per-device workload (set-1
rows scale with the device count; set 2 fixed), so ideal scaling keeps
wall-clock flat. Runs the sharded dense overlap (replicated set 2) and
the ring variant (set 2 sharded + ppermute) on 1..N devices of the
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
and reports efficiency = t(1 device) / t(k devices).

On real hardware the same code runs over ICI (and DCN across hosts
after initialize_distributed); the virtual mesh validates the SPMD
program and the scaling bookkeeping without N chips. CPU timings on an
oversubscribed host undercount true efficiency — the collectives are
real but all "devices" share host cores.

Usage:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/weak_scaling.py [--per-device 20000] [--n2 20000]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=20_000)
    ap.add_argument("--n2", type=int, default=20_000)
    ap.add_argument("--mode", choices=["sharded", "ring"],
                    default="sharded")
    args = ap.parse_args()

    import jax

    sys.path.insert(0, REPO)
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

    d2 = synth_arrays(args.n2, n_reps=12, n_v=16, n_j=6, seed=77)
    results = []
    t1 = None
    counts = [1]
    k = 2
    while k <= nmax:
        counts.append(k)
        k *= 2
    for ndev in counts:
        d1 = synth_arrays(
            args.per_device * ndev, n_reps=12, n_v=16, n_j=6, seed=76
        )
        devs = devices[:ndev]
        # warm (compile) then measure
        run(d1, d2, spec, SCORE_PRODUCT, False, devices=devs)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            m = run(d1, d2, spec, SCORE_PRODUCT, False, devices=devs)
            best = min(best, time.perf_counter() - t0)
        if t1 is None:
            t1 = best
        eff = t1 / best
        results.append(
            dict(devices=ndev, rows1=d1.n, wall_s=best,
                 efficiency=eff, checksum=float(m.sum()))
        )
        print(json.dumps(results[-1]))

    print(
        json.dumps(
            dict(
                metric=f"weak-scaling ({args.mode}, virtual "
                       f"{nmax}-device mesh)",
                per_device_rows=args.per_device,
                n2=args.n2,
                efficiency_at_max=results[-1]["efficiency"],
                results=results,
            )
        )
    )


if __name__ == "__main__":
    main()
