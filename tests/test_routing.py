"""Routing-threshold pins.

find_pairs picks between four sparse routes (exact hash join, d=1
variant join, pigeonhole piece grouping, Pallas/XLA tile engine) with
measured-once heuristics (engine.variant_join_route, the pigeonhole
candidate budget). All routes are pair-identical (tests/test_oracle.py)
so a flipped threshold is silent — these tests pin which route
representative shapes take via the engine.LAST_ROUTE probe, and the
variant_join_route decision boundaries themselves with shape fakes.
"""

import random
from dataclasses import dataclass

import numpy as np
import pytest

import compairr_tpu.ops.sparse_host as sparse_host
from compairr_tpu.ops import engine
from compairr_tpu.ops.engine import MatchSpec, find_pairs, variant_join_route

from test_oracle import make_db


def _rand_db(n, rng, lo=6, hi=9, alpha=3, nv=2, nj=2):
    seqs = [
        [rng.randrange(alpha) for _ in range(rng.randint(lo, hi))]
        for _ in range(n)
    ]
    vs = [rng.randrange(nv) for _ in seqs]
    js = [rng.randrange(nj) for _ in seqs]
    return make_db(seqs, vs, js)


def test_route_exact_d0():
    rng = random.Random(0)
    db = _rand_db(100, rng)
    find_pairs(db, db, MatchSpec(0, False, False))
    assert engine.LAST_ROUTE == "exact"


def test_route_same_set_d1_pigeonhole():
    rng = random.Random(1)
    db = _rand_db(150, rng)
    find_pairs(db, db, MatchSpec(1, False, False))
    assert engine.LAST_ROUTE == "pigeonhole"


def test_route_asymmetric_two_file_variant_join():
    # existence-style shape: tiny query set vs large subject set where
    # nmin * lmax * alpha < n1 + n2 (variant rows cheaper than extra
    # pigeonhole passes)
    rng = random.Random(2)
    small = _rand_db(5, rng, lo=8, hi=8)
    big = _rand_db(1000, rng, lo=8, hi=8)
    assert variant_join_route(small, big, MatchSpec(1, False, False))
    find_pairs(small, big, MatchSpec(1, False, False))
    assert engine.LAST_ROUTE == "variant_join"


def test_route_indel_default_tiles():
    rng = random.Random(3)
    db = _rand_db(120, rng)
    find_pairs(db, db, MatchSpec(1, True, False))
    assert engine.LAST_ROUTE == "tiles"


def test_route_indel_forced_host(monkeypatch):
    monkeypatch.setenv("COMPAIRR_PIGEONHOLE", "all")
    rng = random.Random(4)
    db = _rand_db(120, rng)
    find_pairs(db, db, MatchSpec(1, True, False))
    assert engine.LAST_ROUTE == "pigeonhole_indel"


def test_route_budget_overflow_falls_to_tiles(monkeypatch):
    # duplicate-heavy data blows the candidate budget; the pigeonhole
    # must hand the run to the tile engine, with identical pairs
    rng = random.Random(5)
    db = _rand_db(80, rng)
    spec = MatchSpec(1, False, False)
    i1, i2, _ = find_pairs(db, db, spec)
    assert engine.LAST_ROUTE == "pigeonhole"
    monkeypatch.setattr(sparse_host, "PIGEONHOLE_MAX_CANDIDATES", 0)
    j1, j2, _ = find_pairs(db, db, spec)
    assert engine.LAST_ROUTE == "tiles"
    assert set(zip(i1, i2)) == set(zip(j1, j2))


@dataclass
class _Shape:
    """Duck-typed stand-in carrying only what variant_join_route reads."""

    n: int
    longest: int
    nucleotides: bool = False


def test_variant_join_boundaries():
    spec = MatchSpec(1, False, False)
    big = _Shape(n=100_000_000, longest=10)

    # nmin boundary: 2^16 qualifies, 2^16 + 1 does not
    assert variant_join_route(_Shape(1 << 16, 10), big, spec)
    assert not variant_join_route(_Shape((1 << 16) + 1, 10), big, spec)

    # cost boundary: nmin*lmax*alpha < n1+n2 is strict
    # aa alpha=20: nmin=100, lmax=10 -> 20000 variant rows
    small = _Shape(100, 10)
    just_over = _Shape(20_000 - small.n + 1, 10)
    just_under = _Shape(20_000 - small.n, 10)
    assert variant_join_route(small, just_over, spec)
    assert not variant_join_route(small, just_under, spec)

    # nt alphabet shrinks the variant row count 5x
    small_nt = _Shape(100, 10, nucleotides=True)
    mid_nt = _Shape(4_000 - 100 + 1, 10, nucleotides=True)
    assert variant_join_route(small_nt, mid_nt, spec)

    # same-object and wrong-spec guards
    assert not variant_join_route(small, small, spec)
    assert not variant_join_route(small, big, MatchSpec(1, True, False))
    assert not variant_join_route(small, big, MatchSpec(2, False, False))


def test_route_profile_derivations(monkeypatch):
    """Routing constants derive from the measured dispatch RTT
    (engine.route_profile): the tunnel profile reproduces round-3
    behaviour exactly; a sub-ms local profile relaxes the device-split
    minimum and raises the big-tile crossover (VERDICT r3 item 4 —
    constants must not hard-code this tunnel)."""

    def with_profile(value):
        monkeypatch.setenv("COMPAIRR_ROUTE_PROFILE", value)
        engine.route_profile.cache_clear()
        return engine.route_profile()

    assert with_profile("tunnel") == pytest.approx(0.030)
    assert engine._tiles_per_device_min() == 8

    @dataclass
    class Fake:
        n: int
        longest: int = 14
        nucleotides: bool = False

    spec = MatchSpec(1, False, False)
    tile_small, *_ = engine._pair_plan(Fake(2_000_000), Fake(2_000_000), spec, True)
    tile_big, *_ = engine._pair_plan(Fake(2_000_001), Fake(2_000_001), spec, True)
    assert (tile_small, tile_big) == (engine.TILE_M, 512)

    assert with_profile("local") == pytest.approx(0.001)
    assert engine._tiles_per_device_min() == 2
    tile_mid, *_ = engine._pair_plan(Fake(3_000_000), Fake(3_000_000), spec, True)
    tile_big2, *_ = engine._pair_plan(Fake(4_000_001), Fake(4_000_001), spec, True)
    assert (tile_mid, tile_big2) == (engine.TILE_M, 512)

    assert with_profile("0.06") == pytest.approx(0.06)
    assert engine._tiles_per_device_min() == 16

    # restore the pinned test profile for the rest of the session
    monkeypatch.setenv("COMPAIRR_ROUTE_PROFILE", "tunnel")
    engine.route_profile.cache_clear()
    assert engine.route_profile() == pytest.approx(0.030)


def test_route_profile_auto_end_to_end(tmp_path):
    """COMPAIRR_ROUTE_PROFILE=auto exercised end-to-end through the
    CLI (not a pinned profile): a device-route indel run under auto
    must produce the same matrix as under the pinned tunnel profile,
    and the -l log must record the resolved RTT (cli.py writes a
    'Dispatch RTT' line for any non-pinned source, so a production
    mis-calibration is visible — VERDICT r4 item 7)."""
    import os
    import subprocess
    import sys as _sys

    from synth import make_tsv

    tsv = make_tsv(str(tmp_path / "a.tsv"), 60, 3, seed=11)

    def run(profile_env, tag):
        env = dict(os.environ)
        env.pop("COMPAIRR_ROUTE_PROFILE", None)
        if profile_env is not None:
            env["COMPAIRR_ROUTE_PROFILE"] = profile_env
        out = tmp_path / f"{tag}.tsv"
        log = tmp_path / f"{tag}.log"
        r = subprocess.run(
            [_sys.executable, "-m", "compairr_tpu", "-m", "-d", "1",
             "-i", tsv, tsv, "-o", str(out), "-l", str(log)],
            capture_output=True, text=True, env=env,
        )
        assert r.returncode == 0, r.stderr
        return out.read_bytes(), log.read_text()

    m_auto, log_auto = run(None, "auto")  # default = auto
    m_pin, log_pin = run("tunnel", "pin")
    assert m_auto == m_pin
    # auto resolves to the "cpu" pseudo-measurement on this backend;
    # on live TPU the same line carries the measured value
    assert "Dispatch RTT (cpu): 1.000 ms" in log_auto
    assert "Dispatch RTT" not in log_pin


def test_route_profile_degraded_measurement(monkeypatch):
    """A transiently catastrophic RTT measurement (chip-claim
    recovery, tunnel brown-out) must not pin nonsense routing
    constants for the process: measurements over 1 s fall back to the
    tunnel default, with the source recorded."""
    import time as time_mod

    from compairr_tpu.ops import engine as E

    monkeypatch.setenv("COMPAIRR_ROUTE_PROFILE", "auto")
    E.route_profile.cache_clear()
    monkeypatch.setattr(E.jax, "default_backend", lambda: "tpu")

    ticks = iter([0.0, 30.0, 60.0, 90.0, 120.0, 150.0, 180.0, 210.0])
    monkeypatch.setattr(time_mod, "perf_counter", lambda: next(ticks))
    monkeypatch.setattr(E.jax, "device_put", lambda x: x)
    rtt = E.route_profile()
    E.route_profile.cache_clear()
    assert rtt == E._RTT_TUNNEL
    assert E.ROUTE_PROFILE_INFO[1] == "tunnel(degraded-measure)"
