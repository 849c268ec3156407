"""Exact-match grouping on host.

The reference resolves exact matches through Zobrist hashes + an
open-addressing hash table (/root/reference/src/hashtable.cc,
zobrist.cc). Those are latency-optimised CPU structures; here the same
semantics — group sequences that are identical under the active match
criterion — are a vectorised numpy sort/unique over fixed-width key
rows, which is both simpler and far faster per element for bulk data,
and keeps the TPU free for the approximate-matching grids.
"""

from __future__ import annotations

import numpy as np

from .db import SeqDB


def group_ids(
    db: SeqDB,
    *,
    include_genes: bool,
    include_rep: bool,
) -> tuple[np.ndarray, int]:
    """Assign a group id to every sequence.

    Two entries share a group iff their sequences are identical and
    (when include_genes) their V and J genes match and (when
    include_rep) they belong to the same repertoire — the exact
    duplicate criterion of hash_insert (/root/reference/src/overlap.cc:63-128)
    and dedup's process() (/root/reference/src/dedup.cc:60-132).

    Returns (inverse, n_groups) where inverse[i] is the group id of
    sequence i, numbered by first occurrence order.
    """
    n = db.n
    if n == 0:
        return np.zeros(0, dtype=np.int64), 0

    cols: list[np.ndarray] = [db.lengths.astype(np.int32)]
    if include_genes:
        cols.append(db.v_no.astype(np.int32))
        cols.append(db.j_no.astype(np.int32))
    if include_rep:
        cols.append(db.rep_no.astype(np.int32))

    meta = np.stack(cols, axis=1).view(np.int8).reshape(n, -1)
    key = np.concatenate([meta, db.seqs], axis=1)
    key = np.ascontiguousarray(key)
    void = key.view([("k", np.void, key.shape[1])]).ravel()

    _, first_idx, inverse = np.unique(
        void, return_index=True, return_inverse=True
    )
    # renumber groups by first-occurrence order
    order = np.argsort(first_idx, kind="stable")
    remap = np.empty_like(order)
    remap[order] = np.arange(len(order))
    inverse = remap[inverse]
    return inverse.astype(np.int64), len(first_idx)


def count_duplicates(db: SeqDB, *, include_genes: bool) -> int:
    """Number of entries that have an earlier exact duplicate
    (same repertoire + genes-unless-ignored + sequence), i.e. the
    counts behind the reference's duplicate warnings
    (/root/reference/src/overlap.cc:579-605,861-873)."""
    _, n_groups = group_ids(db, include_genes=include_genes, include_rep=True)
    return db.n - n_groups
