import numpy as np
import pytest

from compairr_tpu.config import Options
from compairr_tpu.constants import (
    SCORE_MAX,
    SCORE_MEAN,
    SCORE_MIN,
    SCORE_PRODUCT,
)
from compairr_tpu.core.db import GeneTables
from compairr_tpu.core.score import pair_scores
from compairr_tpu.io.airr import read_db
from compairr_tpu.ops.engine import MatchSpec, dense_matrix, find_pairs
from compairr_tpu.utils.progress import NullLogger

from synth import make_tsv


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    d = tmp_path_factory.mktemp("dense")
    # small counts keep every dense f32 partial sum exact (< 2^24), so
    # dense and sparse results must agree bit-for-bit
    a_path = make_tsv(
        str(d / "a.tsv"), 400, 5, seed=21, alphabet_sub=5, max_count=3
    )
    b_path = make_tsv(
        str(d / "b.tsv"), 500, 7, seed=22, alphabet_sub=5, max_count=3
    )
    genes = GeneTables()
    opt = Options()
    log = NullLogger()
    d1 = read_db(a_path, opt, genes, log, False, "1")
    d2 = read_db(b_path, opt, genes, log, False, "2")
    return d1, d2


def sparse_matrix(d1, d2, spec, score_int, ignore_counts):
    idx1, idx2, _ = find_pairs(d1, d2, spec)
    m = np.zeros((d1.repertoire_count, d2.repertoire_count))
    s = pair_scores(
        d1.counts[idx1], d2.counts[idx2], score_int, ignore_counts
    )
    np.add.at(m, (d1.rep_no[idx1], d2.rep_no[idx2]), s)
    return m


@pytest.mark.parametrize(
    "d,indels,genes,score,f",
    [
        (0, False, False, SCORE_PRODUCT, False),
        (1, False, False, SCORE_PRODUCT, False),
        (1, True, False, SCORE_PRODUCT, False),
        (2, False, False, SCORE_PRODUCT, False),
        (1, False, True, SCORE_MIN, False),
        (1, False, False, SCORE_MAX, True),
        (2, False, False, SCORE_MEAN, False),
    ],
)
def test_dense_matches_sparse(dbs, d, indels, genes, score, f):
    d1, d2 = dbs
    spec = MatchSpec(differences=d, indels=indels, ignore_genes=genes)
    dm = dense_matrix(d1, d2, spec, score, f)
    sm = sparse_matrix(d1, d2, spec, score, f)
    np.testing.assert_allclose(dm, sm, rtol=0, atol=0)


def test_dense_self_comparison(dbs):
    d1, _ = dbs
    spec = MatchSpec(differences=1, indels=False, ignore_genes=False)
    dm = dense_matrix(d1, d1, spec, SCORE_PRODUCT, False)
    sm = sparse_matrix(d1, d1, spec, SCORE_PRODUCT, False)
    np.testing.assert_allclose(dm, sm, rtol=0, atol=0)


def test_device_derivations_match_host_pack(dbs):
    """device_args_raw / device_rows_raw (the TPU upload paths, which
    sort and reverse rows on device) must reproduce pack_set's host
    layouts exactly."""
    from compairr_tpu.ops.engine import pack_keys, pack_set
    from compairr_tpu.ops.pallas_kernels import (
        device_args_raw,
        device_rows_raw,
    )

    d1, _ = dbs
    lmax = int(d1.longest)
    tile = 128
    p = pack_set(d1, lmax, tile, by_vjl=True)
    order, key, npad = pack_keys(d1, tile, by_vjl=True)
    assert npad == p.np_
    np.testing.assert_array_equal(key, p.key)
    np.testing.assert_array_equal(order, p.orig[: d1.n])

    seqs, rseqs, lens, v, j, orig = (
        np.asarray(x) for x in device_rows_raw(d1, order, npad, lmax)
    )
    n = d1.n
    np.testing.assert_array_equal(seqs[:n], p.seqs[:n])
    np.testing.assert_array_equal(rseqs[:n], p.rseqs[:n])
    np.testing.assert_array_equal(lens[:n], p.lengths[:n])
    np.testing.assert_array_equal(v[:n], p.v[:n])
    np.testing.assert_array_equal(j[:n], p.j[:n])
    np.testing.assert_array_equal(orig[:n], p.orig[:n])
    # pad rows must never match: pad residues and non-positive lengths
    assert (lens[n:] <= 0).all()
    assert (seqs[n:] == d1.pad_value).all()

    dev = device_args_raw(d1, order, npad, lmax)
    np.testing.assert_array_equal(np.asarray(dev["a"]["seqs"])[:n], p.seqs[:n])
    np.testing.assert_array_equal(np.asarray(dev["a"]["rseqs"])[:n], p.rseqs[:n])
    np.testing.assert_array_equal(
        np.asarray(dev["a"]["len"]).ravel()[:n], p.lengths[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(dev["b"]["seqsT"]).T[:n], p.seqs[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(dev["b"]["rseqsT"]).T[:n], p.rseqs[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(dev["b"]["cnt"]).ravel()[:n],
        p.counts[:n].astype(np.float32),
    )
