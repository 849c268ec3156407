"""A/B probe: the v2 dense kernel at the bench kernel-section shape.

Run via scripts/ab_compare.py (which passes the package tree as
argv[1] and sets PYTHONPATH); prints `ABRESULT <best-seconds> ...`.
Used for the round-5 uniform-tile fast-path claim (the per-tree
checksum must agree, so A/B also proves the optimisation changed no
answers).

Env knobs: AB_NK (rows/side, default 1,000,000), AB_TILE (default
768), AB_REPS (dispatches per timed batch, default 8), AB_ROUNDS
(timed batches, default 3), AB_INDELS=1 (d=1 indel dense run — the
round-4 tree serves it with the v1 per-tile-rebuild kernel, round 5
with the cached-operand v2c kernel).
"""

import os
import sys
import time

import numpy as np

tree = sys.argv[1]
sys.path.insert(0, tree)
import compairr_tpu  # noqa: E402

assert compairr_tpu.__file__.startswith(tree), compairr_tpu.__file__
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (synth_arrays only — tree-independent)
import jax  # noqa: E402

from compairr_tpu.constants import SCORE_PRODUCT  # noqa: E402
from compairr_tpu.ops.engine import (  # noqa: E402
    _round_up,
    pack_keys,
    worklist_from_keys,
)
from compairr_tpu.ops.pallas_kernels import (  # noqa: E402
    dense_matrix_pallas_prepared,
    device_args_raw,
)

n = int(os.environ.get("AB_NK", 1_000_000))
tile = int(os.environ.get("AB_TILE", 768))
reps = int(os.environ.get("AB_REPS", 8))
rounds = int(os.environ.get("AB_ROUNDS", 3))
indels = os.environ.get("AB_INDELS") == "1"
diffs = 1 if indels else 2

d1 = bench.synth_arrays(n, n_reps=60, n_v=48, n_j=13, seed=11)
d2 = bench.synth_arrays(n, n_reps=60, n_v=48, n_j=13, seed=12)
bench._plant_near_dups(d1, d2, 0.01, seed=13)

lmax = _round_up(max(d1.longest, d2.longest), 8)
order_a, key_a, npad_a = pack_keys(d1, tile, True)
order_b, key_b, npad_b = pack_keys(d2, tile, True)
da = device_args_raw(
    d1, order_a, npad_a, lmax, indels=indels, sort_key=key_a
)
db = device_args_raw(
    d2, order_b, npad_b, lmax, indels=indels, sort_key=key_b
)
work = worklist_from_keys(
    key_a, d1.n, key_b, d2.n, 1 if indels else 0, tile, tile
)
r1p = _round_up(d1.repertoire_count, 8)
r2p = _round_up(d2.repertoire_count, 128)
run = dense_matrix_pallas_prepared(
    da["a"], db["b"], work,
    differences=diffs, indels=indels, ignore_genes=False,
    score_int=SCORE_PRODUCT, ignore_counts=False,
    tile_m=tile, tile_n=tile, r1p=r1p, r2p=r2p,
)
t0 = time.perf_counter()
parts = run()  # warmup + compile
jax.block_until_ready(parts)
compile_s = time.perf_counter() - t0
checksum = float(np.sum([np.asarray(p, np.float64) for p in parts]))

best = float("inf")
for _ in range(rounds):
    t0 = time.perf_counter()
    outs = [run() for _ in range(reps)]
    jax.block_until_ready(outs[-1])
    best = min(best, (time.perf_counter() - t0) / reps)

print(
    f"ABRESULT {best:.6f} checksum={checksum} tiles={len(work)} "
    f"compile={compile_s:.1f}"
)
