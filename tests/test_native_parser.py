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
