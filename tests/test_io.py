import io

import numpy as np
import pytest

from compairr_tpu.config import Options
from compairr_tpu.core.db import GeneTables
from compairr_tpu.core.exact import count_duplicates, group_ids
from compairr_tpu.io.airr import read_db
from compairr_tpu.utils.progress import NullLogger

from conftest import REF_TEST_DIR


def read(path, opt=None, require_sid=False, default_rep="1"):
    opt = opt or Options()
    return read_db(path, opt, GeneTables(), NullLogger(), require_sid, default_rep)


def test_read_seta():
    db = read(f"{REF_TEST_DIR}/seta.tsv")
    assert db.n == 2
    assert db.repertoire_ids == ["A1", "A2"]
    assert db.sequence_ids == ["R", "S"]
    assert list(db.counts) == [1, 3]
    assert db.shortest == 11
    assert db.longest == 14
    assert db.residues_count == 25
    assert db.total_dup_count == 4
    assert db.sequence_str(0) == "CASSTSHEQYF"
    assert db.sequence_str(1) == "CASSLRVGGYGYTF"
    assert db.v_name(0) == "TCRBV07-06"
    assert db.j_name(1) == "TCRBJ01-02"


def test_read_nucleotides():
    opt = Options(nucleotides=True)
    db = read(f"{REF_TEST_DIR}/setb.tsv", opt)
    assert db.n == 3
    assert db.longest == 42
    assert db.sequence_str(2) == "tgcgcgagcagcaccagccatcagcagtatttt"


def test_gene_interning_shared():
    genes = GeneTables()
    opt = Options()
    log = NullLogger()
    d1 = read_db(f"{REF_TEST_DIR}/seta.tsv", opt, genes, log, False, "1")
    d2 = read_db(f"{REF_TEST_DIR}/setb.tsv", opt, genes, log, False, "2")
    assert len(genes.v_names) == 2
    assert len(genes.j_names) == 2
    # same gene names map to the same numbers across both sets
    assert d1.v_no[0] == d2.v_no[2]
    assert d1.j_no[1] == d2.j_no[0]


def _tsv(*rows):
    header = (
        "repertoire_id\tsequence_id\tduplicate_count\tv_call\tj_call"
        "\tjunction\tjunction_aa"
    )
    return "\n".join([header, *rows]) + "\n"


def write_tmp(tmp_path, content, name="in.tsv"):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_illegal_character_errors(tmp_path):
    path = write_tmp(
        tmp_path, _tsv("A\tS1\t1\tV1\tJ1\tacgt\tCAS5F")
    )
    buf = io.StringIO()
    from compairr_tpu.utils.progress import Logger

    logger = Logger(buf, to_file=True)
    with pytest.raises(SystemExit):
        read_db(path, Options(), GeneTables(), logger, False, "1")
    assert "Illegal character '5' in sequence on line 2" in buf.getvalue()


def test_ignore_unknown(tmp_path):
    path = write_tmp(
        tmp_path,
        _tsv(
            "A\tS1\t1\tV1\tJ1\tacgt\tCAS5F",
            "A\tS2\t2\tV1\tJ1\tacgt\tCASSF",
        ),
    )
    db = read(path, Options(ignore_unknown=True))
    assert db.n == 1
    assert db.ignored_unknown == 1
    assert db.sequence_str(0) == "CASSF"


def test_empty_sequence(tmp_path):
    path = write_tmp(
        tmp_path,
        _tsv("A\tS1\t1\tV1\tJ1\tacgt\t", "A\tS2\t2\tV1\tJ1\tacgt\tCASSF"),
    )
    with pytest.raises(SystemExit):
        read(path)
    db = read(path, Options(ignore_empty=True))
    assert db.n == 1
    assert db.ignored_empty == 1


def test_bad_duplicate_count(tmp_path):
    path = write_tmp(tmp_path, _tsv("A\tS1\t0\tV1\tJ1\tacgt\tCASSF"))
    with pytest.raises(SystemExit):
        read(path)
    path = write_tmp(tmp_path, _tsv("A\tS1\tx7\tV1\tJ1\tacgt\tCASSF"))
    with pytest.raises(SystemExit):
        read(path)


def test_missing_columns_header(tmp_path):
    p = tmp_path / "bad.tsv"
    p.write_text("repertoire_id\tjunction_aa\nA\tCASSF\n")
    buf = io.StringIO()
    from compairr_tpu.utils.progress import Logger

    logger = Logger(buf, to_file=True)
    with pytest.raises(SystemExit):
        read_db(str(p), Options(), GeneTables(), logger, False, "1")
    msg = buf.getvalue()
    assert "Missing essential column(s)" in msg
    assert "duplicate_count" in msg
    assert "v_call" in msg and "j_call" in msg
    # with -f -g it parses fine
    db = read(str(p), Options(ignore_counts=True, ignore_genes=True))
    assert db.n == 1
    assert list(db.counts) == [1]


def test_default_repertoire_id(tmp_path):
    p = tmp_path / "norep.tsv"
    p.write_text(
        "sequence_id\tduplicate_count\tv_call\tj_call\tjunction_aa\n"
        "S1\t4\tV1\tJ1\tCASSF\n"
    )
    db = read(str(p), default_rep="2")
    assert db.repertoire_ids == ["2"]


def test_group_ids_and_duplicates(tmp_path):
    path = write_tmp(
        tmp_path,
        _tsv(
            "A\tS1\t1\tV1\tJ1\tacgt\tCASSF",
            "A\tS2\t2\tV1\tJ1\tacgt\tCASSF",  # dup of S1
            "B\tS3\t3\tV1\tJ1\tacgt\tCASSF",  # other repertoire
            "A\tS4\t4\tV2\tJ1\tacgt\tCASSF",  # other V gene
            "A\tS5\t5\tV1\tJ1\tacgt\tCASSG",  # other sequence
        ),
    )
    db = read(path)
    groups, n_groups = group_ids(db, include_genes=True, include_rep=True)
    assert n_groups == 4
    assert groups[0] == groups[1]
    assert len(set(groups[1:4])) == 3
    assert count_duplicates(db, include_genes=True) == 1
    # ignoring genes merges S4 too
    g2, n2 = group_ids(db, include_genes=False, include_rep=True)
    assert n2 == 3
