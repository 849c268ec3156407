"""Equivalence: native C++ parser vs pure-Python parser."""

import io
import os

import numpy as np
import pytest

from compairr_tpu.config import Options
from compairr_tpu.core.db import GeneTables
from compairr_tpu.io.airr import read_db
from compairr_tpu.io.native import load_library
from compairr_tpu.utils.progress import Logger, NullLogger

from conftest import REF_TEST_DIR
from synth import make_tsv

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native parser not built"
)


def read_both(path, opt, require_sid=False, default_rep="1"):
    dbs = []
    for native in ("1", "0"):
        os.environ["COMPAIRR_NATIVE_IO"] = native
        try:
            dbs.append(
                read_db(
                    path, opt, GeneTables(), NullLogger(), require_sid,
                    default_rep,
                )
            )
        finally:
            os.environ.pop("COMPAIRR_NATIVE_IO", None)
    return dbs


def assert_same(a, b):
    assert a.n == b.n
    np.testing.assert_array_equal(a.seqs, b.seqs)
    np.testing.assert_array_equal(a.lengths, b.lengths)
    np.testing.assert_array_equal(a.counts, b.counts)
    np.testing.assert_array_equal(a.rep_no, b.rep_no)
    np.testing.assert_array_equal(a.v_no, b.v_no)
    np.testing.assert_array_equal(a.j_no, b.j_no)
    assert a.sequence_ids == b.sequence_ids
    assert a.keep == b.keep
    assert a.repertoire_ids == b.repertoire_ids
    assert a.genes.v_names == b.genes.v_names
    assert a.genes.j_names == b.genes.j_names
    assert a.ignored_unknown == b.ignored_unknown
    assert a.ignored_empty == b.ignored_empty
    assert a.residues_count == b.residues_count
    assert a.total_dup_count == b.total_dup_count
    assert (a.shortest, a.longest) == (b.shortest, b.longest)


@pytest.mark.parametrize(
    "opt",
    [
        Options(),
        Options(nucleotides=True),
        Options(ignore_genes=True, ignore_counts=True),
    ],
)
def test_reference_fixtures(opt):
    for name in ("seta.tsv", "setb.tsv", "setc.tsv"):
        nat, py = read_both(f"{REF_TEST_DIR}/{name}", opt)
        assert_same(nat, py)


def test_synthetic(tmp_path):
    path = make_tsv(str(tmp_path / "s.tsv"), 2000, 6, seed=5)
    nat, py = read_both(path, Options())
    assert_same(nat, py)


def test_keep_columns(tmp_path):
    path = make_tsv(str(tmp_path / "s.tsv"), 100, 3, seed=6)
    opt = Options(
        keep_columns="colx,coly,missing_col",
        keep_columns_names=("colx", "coly", "missing_col"),
        pairs="p.tsv",
    )
    nat, py = read_both(path, opt)
    assert_same(nat, py)
    assert nat.keep[0] is not None and nat.keep[0].endswith("\t")


def test_ignore_flags(tmp_path):
    p = tmp_path / "in.tsv"
    p.write_text(
        "repertoire_id\tsequence_id\tduplicate_count\tv_call\tj_call\t"
        "junction_aa\n"
        "A\tS1\t1\tV1\tJ1\tCAS5F\n"
        "A\tS2\t2\tV1\tJ1\t\n"
        "A\tS3\t3\tV1\tJ1\tCASSF\n"
    )
    opt = Options(ignore_unknown=True, ignore_empty=True)
    nat, py = read_both(str(p), opt)
    assert_same(nat, py)
    assert nat.n == 1 and nat.ignored_unknown == 1 and nat.ignored_empty == 1


@pytest.mark.parametrize(
    "row,fragment",
    [
        ("A\tS1\t1\tV1\tJ1\tCAS5F", "Illegal character '5'"),
        ("A\tS1\t1\tV1\tJ1\t", "Empty sequence in sequence on line 2"),
        ("A\tS1\t0\tV1\tJ1\tCASSF", "Illegal duplicate_count on line 2: 0"),
        ("A\tS1\t\tV1\tJ1\tCASSF", "missing or empty duplicate_count"),
        ("A\tS1\t1\t\tJ1\tCASSF", "missing or empty v_call"),
        ("A\tS1\t1\tV1\t\tCASSF", "missing or empty j_call"),
    ],
)
def test_error_message_parity(tmp_path, row, fragment):
    p = tmp_path / "bad.tsv"
    p.write_text(
        "repertoire_id\tsequence_id\tduplicate_count\tv_call\tj_call\t"
        f"junction_aa\n{row}\n"
    )
    msgs = []
    for native in ("1", "0"):
        os.environ["COMPAIRR_NATIVE_IO"] = native
        buf = io.StringIO()
        logger = Logger(buf, to_file=True)
        try:
            with pytest.raises(SystemExit):
                read_db(str(p), Options(), GeneTables(), logger, False, "1")
        finally:
            os.environ.pop("COMPAIRR_NATIVE_IO", None)
        msgs.append(buf.getvalue())
    assert fragment in msgs[0]
    # identical final error text from both parsers
    assert msgs[0].splitlines()[-1] == msgs[1].splitlines()[-1]


def test_group_rows_native_vs_numpy():
    """Native open-addressing grouping == numpy hash-sort fallback,
    including duplicate-heavy and collision-prone inputs."""
    import numpy as np

    from compairr_tpu.core.exact import group_rows
    from compairr_tpu.io.native import group_rows_native

    rng = np.random.default_rng(5)
    for n, width, mcols, dup in [
        (1, 8, 0, False),
        (257, 11, 2, True),
        (4096, 24, 3, True),
        (5000, 22, 0, False),
    ]:
        seqs = rng.integers(0, 4, size=(n, width), endpoint=False).astype(
            np.int8
        )
        if dup:
            # force many exact duplicates
            src = rng.integers(0, n, size=n // 2)
            seqs[: n // 2] = seqs[src]
        meta = rng.integers(0, 3, size=(n, mcols)).astype(np.int32)
        if dup and mcols:
            meta[: n // 2] = meta[src]
        nat = group_rows_native(np.ascontiguousarray(seqs),
                                np.ascontiguousarray(meta))
        assert nat is not None
        import os

        os.environ["COMPAIRR_NATIVE_IO"] = "0"
        try:
            ref = group_rows(seqs, meta, 20)
        finally:
            os.environ.pop("COMPAIRR_NATIVE_IO", None)
        np.testing.assert_array_equal(nat[0], ref[0])
        assert nat[1] == ref[1]


def test_pack_rows_native_vs_numpy():
    import numpy as np

    from compairr_tpu.io.airr import _pack_residues
    from compairr_tpu.io.native import pack_rows_native

    rng = np.random.default_rng(9)
    lens = rng.integers(1, 23, size=997).astype(np.int32)
    flat = rng.integers(0, 20, size=int(lens.sum())).astype(np.int8)
    nat = pack_rows_native(flat, lens, 22, 20)
    assert nat is not None
    ref = _pack_residues(flat, lens, 22, 20)
    np.testing.assert_array_equal(nat, ref)


def test_group_pieces_native_vs_numpy():
    """Fused native piece grouping == materialised numpy piece rows +
    group_rows, across piece counts."""
    import random
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo/tests")
    from test_oracle import make_db

    from compairr_tpu.core.exact import group_rows
    from compairr_tpu.io.native import group_pieces_native
    from compairr_tpu.ops.sparse_host import _piece_rows

    rng = random.Random(13)
    seqs = [[rng.randrange(4) for _ in range(rng.randint(1, 11))]
            for _ in range(2000)]
    vs = [rng.randrange(3) for _ in seqs]
    js = [rng.randrange(2) for _ in seqs]
    db = make_db(seqs, vs, js)
    meta = np.ascontiguousarray(
        np.stack(
            [db.lengths.astype(np.int32), db.v_no.astype(np.int32),
             db.j_no.astype(np.int32)],
            axis=1,
        )
    )
    for pieces in (2, 3, 4):
        for p in range(pieces):
            nat = group_pieces_native(db.seqs, db.lengths, meta, p, pieces)
            assert nat is not None
            w_max = -(-db.seqs.shape[1] // pieces)
            rows = _piece_rows(db, p, pieces, w_max)
            ref = group_rows(rows, meta, 20)
            np.testing.assert_array_equal(nat[0], ref[0])
            assert nat[1] == ref[1]


def test_threaded_parse_parity(tmp_path):
    """-t N parsing must be bit-identical to -t 1 (shard merge +
    intern renumbering, native/airr_parser.cpp)."""
    path = make_tsv(str(tmp_path / "big.tsv"), 30000, 8, seed=9)
    assert os.path.getsize(path) > (1 << 20)  # crosses the MT threshold
    dbs = []
    for t in (1, 4, 13):
        dbs.append(
            read_db(
                path, Options(threads=t), GeneTables(), NullLogger(),
                False, "1",
            )
        )
    assert_same(dbs[0], dbs[1])
    assert_same(dbs[0], dbs[2])
    if dbs[0].row_hash is not None:
        np.testing.assert_array_equal(dbs[0].row_hash, dbs[1].row_hash)
        np.testing.assert_array_equal(dbs[0].row_hash, dbs[2].row_hash)


def test_threaded_error_lineno(tmp_path):
    """An error deep in the file must report the same global line
    number from every thread count (shards record local lines; the
    merge rebases them)."""
    p = tmp_path / "err.tsv"
    n = 35000
    bad_at = 30000  # 0-based data row; line number = 2 + bad_at
    with open(p, "w") as f:
        f.write(
            "repertoire_id\tsequence_id\tduplicate_count\tv_call\t"
            "j_call\tjunction_aa\n"
        )
        for i in range(n):
            cnt = "0" if i == bad_at else "1"
            f.write(f"R1\tS{i}\t{cnt}\tTRBV1\tTRBJ1\tCASSLGQAYEQYF\n")
    assert os.path.getsize(p) > (1 << 20)
    msgs = []
    for t in (1, 4):
        log = io.StringIO()
        logger = Logger(log, to_file=True)
        with pytest.raises(SystemExit):
            read_db(
                str(p), Options(threads=t), GeneTables(), logger,
                False, "1",
            )
        msgs.append(log.getvalue())
    assert msgs[0] == msgs[1]
    assert f"on line {bad_at + 2}" in msgs[0]


def test_mt_grouping_parity():
    """Native CAS grouping (-t > 1) must match the sequential table
    bit-for-bit (first-occurrence numbering)."""
    from compairr_tpu.config import set_runtime_threads
    from compairr_tpu.io.native import group_pieces_native, group_rows_native

    rng = np.random.default_rng(3)
    n = 40000
    seqs = rng.integers(0, 4, size=(n, 12), dtype=np.int8)
    lengths = rng.integers(6, 13, size=n).astype(np.int32)
    meta = np.ascontiguousarray(
        np.stack([lengths, rng.integers(0, 3, n).astype(np.int32)], axis=1)
    )
    try:
        set_runtime_threads(1)
        seq_rows = group_rows_native(seqs, meta)
        seq_pieces = group_pieces_native(seqs, lengths, meta, 0, 2)
        set_runtime_threads(5)
        mt_rows = group_rows_native(seqs, meta)
        mt_pieces = group_pieces_native(seqs, lengths, meta, 0, 2)
    finally:
        set_runtime_threads(1)
    assert seq_rows is not None and mt_rows is not None
    np.testing.assert_array_equal(seq_rows[0], mt_rows[0])
    assert seq_rows[1] == mt_rows[1]
    assert seq_pieces is not None and mt_pieces is not None
    np.testing.assert_array_equal(seq_pieces[0], mt_pieces[0])
    assert seq_pieces[1] == mt_pieces[1]


def test_parse_progress_counter(tmp_path):
    """The native parser's byte-progress counter must cover the whole
    body by parse end (the interactive poller reads it concurrently;
    here the deterministic final value is asserted) and the padded
    fused-pack matrix must match the separate packing path."""
    from compairr_tpu.io.native import NativeSession, load_library

    lib = load_library()
    if lib is None or not hasattr(lib, "airr_parse_progress"):
        import pytest

        pytest.skip("native parser without progress support")
    path = make_tsv(str(tmp_path / "p.tsv"), 20000, 4, seed=17)
    seen = []
    s = NativeSession(lib)
    res = s.parse(
        path, nucleotides=False, cdr3=False, ignore_counts=False,
        ignore_genes=False, ignore_unknown=False, ignore_empty=False,
        require_sequence_id=True, default_repertoire_id="X",
        keep_names=(), threads=3, progress=seen.append,
        pack_padded=True,
    )
    assert res.status == 0
    data = res.arrays()
    total = int(lib.airr_parse_progress())
    with open(path, "rb") as f:
        header_len = len(f.readline())
    assert total == os.path.getsize(path) - header_len
    # fused-pack matrix == flat arena + host pack
    s2 = NativeSession(lib)
    res2 = s2.parse(
        path, nucleotides=False, cdr3=False, ignore_counts=False,
        ignore_genes=False, ignore_unknown=False, ignore_empty=False,
        require_sequence_id=True, default_repertoire_id="X",
        keep_names=(), threads=1, pack_padded=False,
    )
    d2 = res2.arrays()
    from compairr_tpu.io.native import pack_rows_native

    n = data["n"]
    lmax = data["packed_lmax"]
    assert lmax == d2["longest"]
    packed = data["residues"].reshape(n, lmax)
    ref = pack_rows_native(d2["residues"], d2["lengths"], lmax, 20)
    np.testing.assert_array_equal(packed, ref)


def test_group_progress_ticks_interactively():
    """The native grouping passes expose a row counter
    (group_progress) polled during the GIL-released call — interactive
    phases must redraw mid-phase instead of jumping 0->100%
    (/root/reference/src/util.cc:28-37 grants ~200 redraws/phase)."""
    import numpy as np

    from compairr_tpu.io.native import group_rows_native, load_library

    if load_library() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    n = 2_000_000
    seqs = rng.integers(0, 20, size=(n, 12), dtype=np.int8)
    meta = rng.integers(0, 4, size=(n, 2), dtype=np.int32)
    ticks = []
    out = group_rows_native(seqs, meta, progress=ticks.append)
    assert out is not None
    # a multi-hundred-ms grouping at 20 Hz must tick several times,
    # values monotonically nondecreasing and bounded by n
    assert len(ticks) >= 2
    assert all(0 <= t <= n for t in ticks)
    assert ticks == sorted(ticks)


def test_pack_keys_native_matches_numpy(monkeypatch):
    """The native counting-sort pack (pack_group.cpp pack_keys_vjl)
    must reproduce numpy's stable argsort order and sorted key vector
    bit-exactly, for both key modes, including tie runs (equal keys
    keep input order — the downstream worklists and canonical output
    orders depend on it)."""
    import numpy as np

    from compairr_tpu.io.native import load_library, pack_keys_native
    from compairr_tpu.ops.engine import pack_keys

    if load_library() is None or not hasattr(
        load_library(), "pack_keys_vjl"
    ):
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(5)
    n = 30_000

    class G:
        j_names = [f"J{k}" for k in range(7)]

    db = type("D", (), {})()
    db.n = n
    db.v_no = rng.integers(0, 40, n).astype(np.int32)
    db.j_no = rng.integers(0, 7, n).astype(np.int32)
    db.lengths = rng.integers(5, 30, n).astype(np.int32)
    db.genes = G()
    for by_vjl in (True, False):
        o1, k1, p1 = pack_keys(db, 256, by_vjl)
        monkeypatch.setenv("COMPAIRR_NATIVE_IO", "0")
        o2, k2, p2 = pack_keys(db, 256, by_vjl)
        monkeypatch.delenv("COMPAIRR_NATIVE_IO")
        assert p1 == p2
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(k1, k2)
