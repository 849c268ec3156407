"""A/B probe: the sparse indel count kernel on a >2M-row worklist.

Run via scripts/ab_compare.py (which passes the package tree as
argv[1] and sets PYTHONPATH); prints `ABRESULT <best-seconds> ...`.

This is the probe used for the round-3/4 sparse-kernel claims: it
exercises count_tiles_pallas on mixed (equal-length + off-by-one)
tiles exactly as a Keck `-m -d 1 -i` count phase does.

Env knobs: AB_N (rows, default 2,000,001), AB_TILES (worklist cap,
default 65,536), AB_REPEATS (timed repeats, default 3).
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
import bench  # noqa: E402  (synth_arrays)
from compairr_tpu.ops.engine import (  # noqa: E402
    _round_up, classify_worklist, pack_keys, worklist_from_keys,
)
from compairr_tpu.ops.pallas_kernels import (  # noqa: E402
    count_tiles_pallas, device_rows_raw,
)

n = int(os.environ.get("AB_N", 2_000_001))  # >2M -> tile 512 regime
max_tiles = int(os.environ.get("AB_TILES", 65_536))
repeats = int(os.environ.get("AB_REPEATS", 3))

d1 = bench.synth_arrays(n, n_reps=60, n_v=48, n_j=13, seed=21)
bench._plant_near_dups(d1, d1, 0.01, seed=23)  # nonzero checksum
tile = 512
lmax = _round_up(int(d1.longest), 8)
order, key, npad = pack_keys(d1, tile, True)
# sort_key engages the fused-key kernels (the production path since
# round 3; round 4 adds cached b-side one-hots on top)
pa, pb = device_rows_raw(
    d1, order, npad, lmax, indels=True, sort_key=key, pad_salt=0
)
work = worklist_from_keys(key, d1.n, key, d1.n, 1, tile, tile)
has_eq, has_pm = classify_worklist(work, key, d1.n, key, d1.n, tile, tile)
mixed = work[has_eq & has_pm]
print("tiles total", len(work), "mixed", len(mixed), flush=True)
# column-major, as find_pairs orders its streams since round 4
# (inlined so the probe also runs against pre-round-4 trees)
mixed = mixed[np.lexsort((mixed[:, 0], mixed[:, 1]))][:max_tiles]
kw = dict(differences=1, indels=True, ignore_genes=False,
          exclude_self=True, tile_m=tile, tile_n=tile)
c = count_tiles_pallas(pa, pb, mixed[:1024], **kw)  # warmup/compile
best = float("inf")
for _ in range(repeats):
    t0 = time.perf_counter()
    c = count_tiles_pallas(pa, pb, mixed, **kw)
    best = min(best, time.perf_counter() - t0)
checksum = int(np.asarray(c).sum())
print(f"ABRESULT {best:.3f} tiles={len(mixed)} "
      f"per_tile_us={best / len(mixed) * 1e6:.1f} checksum={checksum}")
