import jax
import numpy as np
import pytest

from compairr_tpu.config import Options
from compairr_tpu.constants import SCORE_PRODUCT
from compairr_tpu.core.db import GeneTables
from compairr_tpu.io.airr import read_db
from compairr_tpu.ops.engine import MatchSpec, dense_matrix
from compairr_tpu.parallel.mesh import dense_matrix_sharded
from compairr_tpu.utils.progress import NullLogger

from synth import make_tsv


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    d = tmp_path_factory.mktemp("shard")
    a_path = make_tsv(
        str(d / "a.tsv"), 600, 5, seed=31, alphabet_sub=5, max_count=3
    )
    b_path = make_tsv(
        str(d / "b.tsv"), 450, 7, seed=32, alphabet_sub=5, max_count=3
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
