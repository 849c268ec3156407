"""Property tests: engine match semantics vs a brute-force oracle.

These run everywhere (no reference binary needed) and pin down the
kernel semantics: Hamming distance for equal lengths, the
one-substitution-or-indel criterion for d=1 -i (restricted Levenshtein,
/root/reference/src/variants.cc:166-240), V/J gene gating, and the
self-exclusion used by clustering.
"""

import random

import numpy as np
import pytest

from compairr_tpu.core.db import GeneTables, SeqDB
from compairr_tpu.ops.engine import MatchSpec, find_pairs


def make_db(seqs, vs, js, reps=None, counts=None):
    n = len(seqs)
    lmax = max((len(s) for s in seqs), default=1)
    arr = np.full((n, lmax), 20, dtype=np.int8)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = s
    genes = GeneTables()
    nv = max(vs) + 1 if vs else 1
    nj = max(js) + 1 if js else 1
    for k in range(nv):
        genes.intern_v(f"V{k}")
    for k in range(nj):
        genes.intern_j(f"J{k}")
    lengths = np.asarray([len(s) for s in seqs], dtype=np.int32)
    return SeqDB(
        nucleotides=False,
        seqs=arr,
        lengths=lengths,
        counts=np.asarray(counts if counts else [1] * n, dtype=np.int64),
        rep_no=np.asarray(reps if reps else [0] * n, dtype=np.int32),
        v_no=np.asarray(vs, dtype=np.int32),
        j_no=np.asarray(js, dtype=np.int32),
        sequence_ids=[f"S{i}" for i in range(n)],
        keep=[None] * n,
        repertoire_ids=["R0"],
        genes=genes,
        residues_count=int(lengths.sum()),
        total_dup_count=n,
        shortest=int(lengths.min()) if n else 0,
        longest=int(lengths.max()) if n else 0,
    )


def hamming(a, b):
    return sum(x != y for x, y in zip(a, b))


def one_indel(a, b):
    """True iff b is a with exactly one deletion or insertion."""
    if len(a) - len(b) == 1:
        a, b = b, a
    if len(b) - len(a) != 1:
        return False
    # a shorter by 1: prefix + suffix >= len(a)
    p = 0
    while p < len(a) and a[p] == b[p]:
        p += 1
    s = 0
    while s < len(a) - 0 and s < len(a) and a[len(a) - 1 - s] == b[len(b) - 1 - s]:
        s += 1
    return p + s >= len(a)


def oracle_pairs(db1, db2, spec):
    out = set()
    for i in range(db1.n):
        for j in range(db2.n):
            if spec.exclude_self and i == j:
                continue
            if not spec.ignore_genes and (
                db1.v_no[i] != db2.v_no[j] or db1.j_no[i] != db2.j_no[j]
            ):
                continue
            a = list(db1.seqs[i, : db1.lengths[i]])
            b = list(db2.seqs[j, : db2.lengths[j]])
            if len(a) == len(b):
                if hamming(a, b) <= spec.differences:
                    out.add((i, j))
            elif spec.indels and spec.differences == 1:
                if one_indel(a, b):
                    out.add((i, j))
    return out


@pytest.mark.parametrize(
    "d,indels,genes,self_ex",
    [
        (0, False, False, False),
        (1, False, False, False),
        (1, True, False, False),
        (1, True, True, False),
        (2, False, False, False),
        (3, False, True, False),
        (1, True, False, True),
    ],
)
def test_engine_matches_oracle(d, indels, genes, self_ex):
    rng = random.Random(d * 100 + indels * 10 + genes)
    # tiny alphabet & lengths force collisions, runs of equal residues,
    # and indel edge cases (deletions at run boundaries, ends)
    seqs = []
    for _ in range(180):
        L = rng.randint(1, 7)
        seqs.append([rng.randrange(3) for _ in range(L)])
    vs = [rng.randrange(2) for _ in seqs]
    js = [rng.randrange(2) for _ in seqs]
    db = make_db(seqs, vs, js)
    spec = MatchSpec(
        differences=d,
        indels=indels,
        ignore_genes=genes,
        exclude_self=self_ex,
    )
    i1, i2, dist = find_pairs(db, db, spec)
    got = set(zip(i1.tolist(), i2.tolist()))
    want = oracle_pairs(db, db, spec)
    assert got == want

    # distances reported for pairs agree with the oracle definition
    for a, b, dd in zip(i1.tolist(), i2.tolist(), dist.tolist()):
        la, lb = db.lengths[a], db.lengths[b]
        if la == lb:
            assert dd == hamming(
                list(db.seqs[a, :la]), list(db.seqs[b, :lb])
            )
        else:
            assert dd == 1


def test_pigeonhole_vs_tile_paths():
    """The pigeonhole candidate path and the tile engine must find the
    identical pair set for substitution-only specs."""
    import os

    def rand_db(n, seed):
        rng = random.Random(seed)
        seqs = []
        for _ in range(n):
            L = rng.randint(1, 12)
            seqs.append([rng.randrange(4) for _ in range(L)])
        vs = [rng.randrange(3) for _ in seqs]
        js = [rng.randrange(2) for _ in seqs]
        return make_db(seqs, vs, js)

    db = rand_db(1200, 21)
    db2 = rand_db(700, 22)
    for d, indels in ((1, False), (2, False), (3, False), (1, True)):
        for other, excl in ((db, False), (db, True), (db2, False)):
            spec = MatchSpec(differences=d, indels=indels,
                             ignore_genes=False, exclude_self=excl)
            os.environ["COMPAIRR_PIGEONHOLE"] = "all"
            try:
                ph = find_pairs(db, other, spec)
            finally:
                os.environ.pop("COMPAIRR_PIGEONHOLE", None)
            os.environ["COMPAIRR_PIGEONHOLE"] = "0"
            try:
                tl = find_pairs(db, other, spec)
            finally:
                os.environ.pop("COMPAIRR_PIGEONHOLE", None)
            kp = np.sort(ph[0] * (1 << 32) + ph[1])
            kt = np.sort(tl[0] * (1 << 32) + tl[1])
            np.testing.assert_array_equal(
                kp, kt, err_msg=f"d={d} indels={indels} excl={excl}"
            )
            np.testing.assert_array_equal(np.sort(ph[2]), np.sort(tl[2]))


def test_variant_join_vs_pigeonhole():
    """The asymmetric d=1 variant-join must find the identical pair
    set as the pigeonhole path (both against the tile engine)."""
    import os

    def rand_db(n, seed):
        rng = random.Random(seed)
        seqs = []
        for _ in range(n):
            L = rng.randint(1, 10)
            seqs.append([rng.randrange(4) for _ in range(L)])
        vs = [rng.randrange(3) for _ in seqs]
        js = [rng.randrange(2) for _ in seqs]
        return make_db(seqs, vs, js)

    small = rand_db(40, 31)   # 40*10*20 = 8000 < (40+50000)/2
    big = rand_db(50000, 32)  # -> the variant-join condition holds
    spec = MatchSpec(differences=1, indels=False, ignore_genes=False)
    vj = find_pairs(small, big, spec)
    os.environ["COMPAIRR_PIGEONHOLE"] = "0"
    try:
        tl = find_pairs(small, big, spec)
    finally:
        os.environ.pop("COMPAIRR_PIGEONHOLE", None)
    kv = np.sort(vj[0] * (1 << 32) + vj[1])
    kt = np.sort(tl[0] * (1 << 32) + tl[1])
    np.testing.assert_array_equal(kv, kt)
    np.testing.assert_array_equal(np.sort(vj[2]), np.sort(tl[2]))
    # reversed argument order exercises the small_is_1=False branch
    vj2 = find_pairs(big, small, spec)
    kv2 = np.sort(vj2[0] * (1 << 32) + vj2[1])
    kt2 = np.sort(np.asarray(tl[1]) * (1 << 32) + np.asarray(tl[0]))
    np.testing.assert_array_equal(kv2, kt2)


def test_pigeonhole_overflow_falls_back(monkeypatch):
    """A candidate-budget overflow must silently reroute to the tile
    engine with identical results."""
    import os

    from compairr_tpu.ops import sparse_host

    rng = random.Random(41)
    seqs = [[rng.randrange(2) for _ in range(rng.randint(3, 5))]
            for _ in range(400)]
    vs = [0] * len(seqs)
    js = [0] * len(seqs)
    db = make_db(seqs, vs, js)
    spec = MatchSpec(differences=1, indels=False, ignore_genes=False)

    monkeypatch.setattr(sparse_host, "PIGEONHOLE_MAX_CANDIDATES", 10)
    ov = find_pairs(db, db, spec)
    os.environ["COMPAIRR_PIGEONHOLE"] = "0"
    try:
        tl = find_pairs(db, db, spec)
    finally:
        os.environ.pop("COMPAIRR_PIGEONHOLE", None)
    ko = np.sort(ov[0] * (1 << 32) + ov[1])
    kt = np.sort(tl[0] * (1 << 32) + tl[1])
    np.testing.assert_array_equal(ko, kt)


def test_classify_worklist_exact():
    """classify_worklist's per-tile (has_eq, has_pm) flags must agree
    with a brute-force scan of the key values actually present in each
    tile's row/column blocks — exactly, both directions (a wrongly
    dropped tile loses pairs; a wrongly kept one only wastes work, but
    the classes feed kernels that skip matmuls, so both must be
    right)."""
    from compairr_tpu.ops.engine import classify_worklist, worklist_from_keys

    rng = np.random.default_rng(7)
    for trial in range(30):
        tile = int(rng.choice([4, 8]))
        n_a = int(rng.integers(1, 90))
        n_b = int(rng.integers(1, 90))
        # clustered keys with gaps so blocks span bucket boundaries
        ka = np.sort(rng.choice(np.arange(0, 40, 3), n_a)
                     + rng.integers(0, 3, n_a)).astype(np.int64)
        kb = np.sort(rng.choice(np.arange(0, 40, 3), n_b)
                     + rng.integers(0, 3, n_b)).astype(np.int64)
        npad_a = ((n_a + tile) // tile + 1) * tile
        npad_b = ((n_b + tile) // tile + 1) * tile
        keys_a = np.full(npad_a, np.iinfo(np.int64).max, dtype=np.int64)
        keys_a[:n_a] = ka
        keys_b = np.full(npad_b, np.iinfo(np.int64).max, dtype=np.int64)
        keys_b[:n_b] = kb
        work = worklist_from_keys(keys_a, n_a, keys_b, n_b, 1, tile, tile)
        has_eq, has_pm = classify_worklist(
            work, keys_a, n_a, keys_b, n_b, tile, tile
        )
        for t in range(len(work)):
            ra = set(ka[work[t, 0]: min(work[t, 0] + tile, n_a)].tolist())
            rb = set(kb[work[t, 1]: min(work[t, 1] + tile, n_b)].tolist())
            want_eq = bool(ra & rb)
            want_pm = bool(
                {k + 1 for k in ra} & rb or {k - 1 for k in ra} & rb
            )
            assert has_eq[t] == want_eq, (trial, t)
            assert has_pm[t] == want_pm, (trial, t)


def test_join_groups_order_oracle():
    """_join_groups must emit the exact pair order the downstream
    paths were verified against: non-drop emits singleton-group rows
    first then multi-group rows, both in ascending set-1 row order
    with ascending set-2 members within each row; drop_singletons
    emits only multi-group rows in the same order (the subset argsort
    optimisation must not change it)."""
    from compairr_tpu.ops.sparse_host import _join_groups

    rng = np.random.default_rng(0)
    for trial in range(120):
        n1 = int(rng.integers(0, 40))
        n2 = int(rng.integers(0, 40))
        ng = int(rng.integers(1, 12))
        ga = rng.integers(0, ng, n1)
        gb = rng.integers(0, ng, n2)
        same = bool(rng.integers(0, 2)) and n1 == n2
        if same:
            gb = ga
        for ds in (False, True):
            i1, i2 = _join_groups(ga, gb, drop_singletons=ds)
            gcnt = np.bincount(gb, minlength=ng + 1)
            o1, o2 = [], []
            if ds:
                rows = [a for a in range(n1) if gcnt[ga[a]] > 1]
            else:
                rows = [a for a in range(n1) if gcnt[ga[a]] == 1] + [
                    a for a in range(n1) if gcnt[ga[a]] > 1
                ]
            for a in rows:
                for b in range(n2):
                    if gb[b] == ga[a]:
                        o1.append(a)
                        o2.append(b)
            assert np.array_equal(i1, np.array(o1, np.int64)), (trial, ds)
            assert np.array_equal(i2, np.array(o2, np.int64)), (trial, ds)
