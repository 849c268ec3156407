"""f32 exactness guard for the dense paths (ops/engine.py).

The dense [R1, R2] accumulation is float32 on device; integer scores
sum exactly only below 2^24 per cell. The guard chunks the worklist
(partials summed in f64 on host) and computes pathological tiles on
host. These tests pin: (a) the planner's splitting/host-routing
decisions, (b) end-to-end exactness vs the sparse f64 path at scales
that provably cross 2^24 — both the all-host-tile regime (duplicate
blocks, one repertoire) and the chunked-device regime (many
repertoires).
"""

import numpy as np

from compairr_tpu.constants import SCORE_PRODUCT
from compairr_tpu.core.score import pair_scores
from compairr_tpu.ops.engine import (
    MatchSpec,
    _F32_EXACT_LIMIT,
    _plan_exact_chunks,
    dense_matrix,
    find_pairs,
)

from test_oracle import make_db


def test_plan_unit_safe_worklist_is_single_shot():
    work = np.array([[0, 0], [0, 128], [128, 0]], dtype=np.int32)
    stats = (np.array([10.0, 10.0]), np.array([100.0, 100.0]))
    plan = _plan_exact_chunks(
        work, stats, stats, 128, 128, SCORE_PRODUCT, False
    )
    assert plan is None  # 3 * 100*100 << 2^24


def test_plan_unit_chunking_and_host_tiles():
    # block 0: moderate (chunkable); block 1: pathological (host)
    s = np.array([3000.0, 100000.0])
    m = np.array([128.0, 128.0])
    work = np.array(
        [[0, 0]] * 5 + [[128, 128]] + [[0, 0]] * 5, dtype=np.int32
    )
    plan = _plan_exact_chunks(
        work, (m, s), (m, s), 128, 128, SCORE_PRODUCT, False
    )
    assert plan is not None
    chunks, host = plan
    # the (128,128) tile's bound is 1e10 >= 2^24 -> host
    assert len(host) == 1 and tuple(host[0]) == (128, 128)
    # 10 remaining tiles of bound 9e6 each: <2^24 per chunk => 1 tile
    # per chunk (9e6*2 > 2^24)
    assert sum(len(c) for c in chunks) == 10
    for c in chunks:
        assert len(c) * 9e6 < _F32_EXACT_LIMIT


def _sparse_reference(db, spec, r):
    i1, i2, _ = find_pairs(db, db, spec)
    scores = pair_scores(
        db.counts[i1], db.counts[i2], SCORE_PRODUCT, False
    )
    matrix = np.zeros((r, r), dtype=np.float64)
    np.add.at(matrix, (db.rep_no[i1], db.rep_no[i2]), scores)
    return matrix


def test_dense_exact_duplicate_block_one_repertoire():
    # 3000 identical sequences, one repertoire, odd counts <= 99:
    # exact cell value = (sum counts)^2 ~ 2.2e10, far past 2^24 — every
    # tile's own bound crosses the limit, so all tiles take the exact
    # host path.
    rng = np.random.default_rng(0)
    n = 3000
    seqs = [[1, 2, 3, 0, 1, 2, 3, 0]] * n
    counts = (2 * rng.integers(0, 50, size=n) + 1).tolist()
    db = make_db(seqs, [0] * n, [0] * n, counts=counts)
    spec = MatchSpec(differences=0, indels=False, ignore_genes=False)
    dense = dense_matrix(db, db, spec, SCORE_PRODUCT, False)
    want = float(np.asarray(counts, dtype=np.float64).sum()) ** 2
    assert dense[0, 0] == want
    assert np.array_equal(dense, _sparse_reference(db, spec, 1))


def _risky_db(n=4000, n_reps=2, n_base=100, cmax=25, seed=2):
    """Planted-duplicate set whose exact matrix provably crosses 2^24
    per cell while every tile's own bound stays chunkable."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, size=(n_base, 10))
    rows = base[rng.integers(0, n_base, size=n)]
    seqs = [list(r) for r in rows]
    reps = rng.integers(0, n_reps, size=n).tolist()
    counts = (2 * rng.integers(0, cmax, size=n) + 1).tolist()
    db = make_db(seqs, [0] * n, [0] * n, reps=reps, counts=counts)
    db.repertoire_ids = [f"R{k:02d}" for k in range(n_reps)]
    return db


def test_sharded_and_ring_exact_at_risk():
    import jax

    from compairr_tpu.parallel.mesh import (
        dense_matrix_ring,
        dense_matrix_sharded,
    )

    db = _risky_db()
    spec = MatchSpec(differences=0, indels=False, ignore_genes=False)
    ref = _sparse_reference(db, spec, 2)
    assert ref.max() > _F32_EXACT_LIMIT  # scale genuinely at risk
    devs = jax.devices()[:2]
    sharded = dense_matrix_sharded(
        db, db, spec, SCORE_PRODUCT, False, devices=devs
    )
    assert np.array_equal(sharded, ref)
    # the ring cannot chunk its fused loop; it must delegate to the
    # sharded guard and still return the exact result
    ring = dense_matrix_ring(
        db, db, spec, SCORE_PRODUCT, False, devices=devs
    )
    assert np.array_equal(ring, ref)


def test_cli_dense_engine_byte_identical(tmp_path, monkeypatch):
    """COMPAIRR_ENGINE=dense is a product surface: a CLI --matrix run
    routes through dense_matrix_sharded on >1 device and its output is
    byte-identical to the sparse default (integer scores are exact
    under the f32 guard)."""
    import compairr_tpu.parallel.mesh as mesh
    from compairr_tpu.cli import main
    from synth import make_tsv

    a = make_tsv(
        str(tmp_path / "a.tsv"), 400, 4, seed=41, alphabet_sub=3,
        max_count=30, len_range=(6, 9),
    )
    b = make_tsv(
        str(tmp_path / "b.tsv"), 300, 5, seed=42, alphabet_sub=3,
        max_count=30, len_range=(6, 9),
    )
    out_sparse = tmp_path / "sparse.tsv"
    monkeypatch.delenv("COMPAIRR_ENGINE", raising=False)
    assert main(["-m", "-d", "1", a, b, "-o", str(out_sparse),
                 "-l", str(tmp_path / "l1.txt")]) == 0

    calls = []
    real = mesh.dense_matrix_sharded

    def probe(*args, **kw):
        calls.append(1)
        return real(*args, **kw)

    monkeypatch.setattr(mesh, "dense_matrix_sharded", probe)
    monkeypatch.setenv("COMPAIRR_ENGINE", "dense")
    out_dense = tmp_path / "dense.tsv"
    assert main(["-m", "-d", "1", a, b, "-o", str(out_dense),
                 "-l", str(tmp_path / "l2.txt")]) == 0
    assert calls, "dense engine did not route through the sharded path"
    assert out_dense.read_bytes() == out_sparse.read_bytes()

    # unsupported combinations (pairs files need the matched pair
    # list) are rejected, not silently degraded
    import pytest

    with pytest.raises(SystemExit):
        main(["-m", "-d", "1", a, b, "-o", str(tmp_path / "x.tsv"),
              "-p", str(tmp_path / "p.tsv"),
              "-l", str(tmp_path / "l3.txt")])

    # -s ratio is not exact in f32: the dense engine must fall back to
    # the sparse path (byte-identical output, warning in the log, no
    # dense kernels dispatched) rather than silently drift
    monkeypatch.delenv("COMPAIRR_ENGINE", raising=False)
    out_rs = tmp_path / "ratio_sparse.tsv"
    assert main(["-m", "-d", "1", "-s", "ratio", a, b,
                 "-o", str(out_rs), "-l", str(tmp_path / "l4.txt")]) == 0
    calls.clear()
    monkeypatch.setenv("COMPAIRR_ENGINE", "dense")
    out_rd = tmp_path / "ratio_dense.tsv"
    log_rd = tmp_path / "l5.txt"
    assert main(["-m", "-d", "1", "-s", "ratio", a, b,
                 "-o", str(out_rd), "-l", str(log_rd)]) == 0
    assert not calls, "ratio run must not use the dense engine"
    assert out_rd.read_bytes() == out_rs.read_bytes()
    assert "does not support the ratio" in log_rd.read_text()


def test_dense_exact_chunked_many_repertoires():
    # 20k rows over 16 repertoires with planted duplicates: per-tile
    # bounds stay under 2^24 (chunked device path) but the total
    # crosses it, so the guard must split and f64-sum the partials.
    rng = np.random.default_rng(1)
    n = 20_000
    base = rng.integers(0, 4, size=(400, 10))
    rows = base[rng.integers(0, 400, size=n)]
    seqs = [list(r) for r in rows]
    reps = rng.integers(0, 16, size=n).tolist()
    counts = (2 * rng.integers(0, 100, size=n) + 1).tolist()
    db = make_db(seqs, [0] * n, [0] * n, reps=reps, counts=counts)
    db.repertoire_ids = [f"R{k:02d}" for k in range(16)]
    spec = MatchSpec(differences=0, indels=False, ignore_genes=False)
    dense = dense_matrix(db, db, spec, SCORE_PRODUCT, False)
    ref = _sparse_reference(db, spec, 16)
    assert ref.max() > _F32_EXACT_LIMIT  # scale genuinely at risk
    assert np.array_equal(dense, ref)
