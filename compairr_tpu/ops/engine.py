"""Block-sparse all-vs-all matching engine.

TPU-first formulation of CompAIRR's matching problem. The reference
avoids the all-vs-all grid with Zobrist-hashed variant enumeration
(/root/reference/src/variants.cc, overlap.cc:253-284) — a
pointer-chasing design hostile to accelerators. Here the d>2 fallback
(overlap.cc:286-359, an all-vs-all distance grid) becomes the primary
algorithm for every d, made fast by:

  * packing sequences into int8 [N, Lmax] tensors (pad residue matches
    itself so equal-length Hamming distance is Lmax - #position-matches)
  * sorting both sets by length and only visiting tile pairs whose
    length ranges are compatible (equal, or ±1 with indels) — a
    host-built worklist of (row_block, col_block) tiles
  * computing each tile with XLA (this module) or a Pallas MXU kernel
    (ops/pallas_kernels.py) selected by backend
  * one-indel matching via the prefix+suffix identity: a and b with
    |len(a)-len(b)| == 1 match iff common_prefix(a,b) +
    common_suffix(a,b) >= min(len), equivalent to the reference's
    deletion check (variants.cc:197-216)

Two result paths:
  * sparse: matched (i, j, distance) triples — feeds --pairs output,
    clustering, and byte-exact f64 score accumulation on host
  * dense: per-repertoire score matrix accumulated on device — the
    throughput path for huge inputs
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..core.db import SeqDB
from ..utils.progress import Logger

TILE_M = 128
TILE_N = 128
SLAB = 64  # worklist tiles per device dispatch


@dataclass(frozen=True)
class MatchSpec:
    differences: int
    indels: bool
    ignore_genes: bool
    exclude_self: bool = False  # cluster mode: seed != hit


@dataclass
class PackedSet:
    """A SeqDB sorted by length and padded for tiling."""

    seqs: np.ndarray  # int8 [Np, L] (pad rows appended)
    rseqs: np.ndarray  # int8 [Np, L] per-row reversed sequences
    lengths: np.ndarray  # int32 [Np], padding rows = -1000000
    v: np.ndarray  # int32 [Np]
    j: np.ndarray  # int32 [Np]
    orig: np.ndarray  # int64 [Np] original index, -1 for padding
    n: int  # real sequence count

    @property
    def np_(self) -> int:
        return int(self.seqs.shape[0])


_LEN_PAD = -1000000


def _reverse_rows(seqs: np.ndarray, lengths: np.ndarray, pad: int) -> np.ndarray:
    n, lmax = seqs.shape
    if n == 0:
        return seqs.copy()
    pos = np.arange(lmax)[None, :]
    idx = lengths[:, None].astype(np.int64) - 1 - pos
    out = np.where(
        idx >= 0,
        np.take_along_axis(seqs, np.clip(idx, 0, lmax - 1), axis=1),
        np.int8(pad),
    ).astype(np.int8)
    return out


def pack_set(db: SeqDB, lmax: int, tile: int) -> PackedSet:
    """Sort by length and pad row count to a tile multiple plus one
    all-padding dummy tile (the target of worklist padding)."""
    n = db.n
    order = np.argsort(db.lengths, kind="stable")
    pad_rows = (-n) % tile + tile  # at least one full dummy tile
    npad = n + pad_rows

    pad_val = db.pad_value
    seqs = np.full((npad, lmax), pad_val, dtype=np.int8)
    if n:
        width = db.seqs.shape[1]
        seqs[:n, :width] = db.seqs[order]
    lengths = np.full(npad, _LEN_PAD, dtype=np.int32)
    lengths[:n] = db.lengths[order]
    v = np.full(npad, -1, dtype=np.int32)
    jj = np.full(npad, -1, dtype=np.int32)
    if n:
        v[:n] = db.v_no[order]
        jj[:n] = db.j_no[order]
    orig = np.full(npad, -1, dtype=np.int64)
    orig[:n] = order

    rseqs = np.full((npad, lmax), pad_val, dtype=np.int8)
    if n:
        rseqs[:n] = _reverse_rows(seqs[:n], lengths[:n], pad_val)

    return PackedSet(
        seqs=seqs, rseqs=rseqs, lengths=lengths, v=v, j=jj, orig=orig, n=n
    )


def build_worklist(
    a: PackedSet, b: PackedSet, spec: MatchSpec, tile_m: int, tile_n: int
) -> np.ndarray:
    """Host-side tile worklist: (row_start, col_start) pairs covering
    every block whose length ranges can contain a match. Sets are
    length-sorted, so compatible columns form one contiguous range per
    row block."""
    n_a, n_b = a.n, b.n
    if n_a == 0 or n_b == 0:
        return np.zeros((0, 2), dtype=np.int32)
    delta = 1 if (spec.indels and spec.differences == 1) else 0
    lens_b = b.lengths[:n_b]
    starts = []
    for ra in range(0, n_a, tile_m):
        lo_len = int(a.lengths[ra]) - delta
        hi_len = int(a.lengths[min(ra + tile_m, n_a) - 1]) + delta
        lo = int(np.searchsorted(lens_b, lo_len, side="left"))
        hi = int(np.searchsorted(lens_b, hi_len, side="right"))
        if hi <= lo:
            continue
        for rb in range((lo // tile_n) * tile_n, hi, tile_n):
            starts.append((ra, rb))
    return np.asarray(starts, dtype=np.int32) if starts else np.zeros(
        (0, 2), dtype=np.int32
    )


# --------------------------------------------------------------------
# XLA tile computation (works on CPU and TPU; Pallas path is separate)
# --------------------------------------------------------------------


def _tile_codes(
    a_seq,
    a_rseq,
    a_len,
    a_v,
    a_j,
    a_orig,
    b_seq,
    b_rseq,
    b_len,
    b_v,
    b_j,
    b_orig,
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    exclude_self: bool,
):
    """Distance codes for one [TM, TN] tile: 0 = no match, else
    distance + 1. Pure jnp; shapes are static."""
    # Hamming for equal lengths: pad matches pad, so distance is the
    # number of mismatching positions over the padded width.
    mism = jnp.sum(
        a_seq[:, None, :] != b_seq[None, :, :], axis=2, dtype=jnp.int32
    )
    len_eq = a_len[:, None] == b_len[None, :]
    valid = (a_len[:, None] > 0) & (b_len[None, :] > 0)
    match = len_eq & (mism <= differences)
    dist = mism

    if indels:
        # one-indel check for |len difference| == 1:
        # common_prefix + common_suffix >= min(len)
        pref_eq = (a_seq[:, None, :] == b_seq[None, :, :]).astype(jnp.int32)
        pref = jnp.sum(jnp.cumprod(pref_eq, axis=2), axis=2, dtype=jnp.int32)
        suf_eq = (a_rseq[:, None, :] == b_rseq[None, :, :]).astype(jnp.int32)
        suf = jnp.sum(jnp.cumprod(suf_eq, axis=2), axis=2, dtype=jnp.int32)
        minlen = jnp.minimum(a_len[:, None], b_len[None, :])
        len_pm1 = jnp.abs(a_len[:, None] - b_len[None, :]) == 1
        indel_match = len_pm1 & (pref + suf >= minlen)
        match = match | indel_match
        dist = jnp.where(len_pm1, 1, dist)

    if not ignore_genes:
        match = match & (a_v[:, None] == b_v[None, :]) & (
            a_j[:, None] == b_j[None, :]
        )
    if exclude_self:
        match = match & (a_orig[:, None] != b_orig[None, :])
    match = match & valid

    return jnp.where(match, dist + 1, 0).astype(jnp.int8)


@lru_cache(maxsize=None)
def _slab_fn(spec: MatchSpec, tile_m: int, tile_n: int):
    kw = dict(
        differences=spec.differences,
        indels=spec.indels and spec.differences == 1,
        ignore_genes=spec.ignore_genes,
        exclude_self=spec.exclude_self,
    )

    def run(a_seq, a_rseq, a_len, a_v, a_j, a_orig,
            b_seq, b_rseq, b_len, b_v, b_j, b_orig, starts):
        def one(_, st):
            ra, rb = st[0], st[1]
            sl_a = lambda x: lax.dynamic_slice_in_dim(x, ra, tile_m, axis=0)
            sl_b = lambda x: lax.dynamic_slice_in_dim(x, rb, tile_n, axis=0)
            codes = _tile_codes(
                sl_a(a_seq), sl_a(a_rseq), sl_a(a_len), sl_a(a_v),
                sl_a(a_j), sl_a(a_orig),
                sl_b(b_seq), sl_b(b_rseq), sl_b(b_len), sl_b(b_v),
                sl_b(b_j), sl_b(b_orig),
                **kw,
            )
            return None, codes

        _, out = lax.scan(one, None, (starts[:, 0], starts[:, 1]))
        return out

    return jax.jit(run)


def find_pairs(
    db1: SeqDB,
    db2: SeqDB,
    spec: MatchSpec,
    logger: Optional[Logger] = None,
    progress_prompt: Optional[str] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sparse path: all matching pairs under the spec.

    Returns (idx1, idx2, dist) in original indices, unordered.
    """
    lmax = int(max(db1.longest, db2.longest, 1))
    a = pack_set(db1, lmax, TILE_M)
    b = pack_set(db2, lmax, TILE_N) if db2 is not db1 else (
        a if TILE_M == TILE_N else pack_set(db2, lmax, TILE_N)
    )

    work = build_worklist(a, b, spec, TILE_M, TILE_N)
    w = len(work)

    if logger is not None and progress_prompt is not None:
        logger.progress_init(progress_prompt, max(w, 1))

    out1: list[np.ndarray] = []
    out2: list[np.ndarray] = []
    outd: list[np.ndarray] = []

    if w:
        run = _slab_fn(spec, TILE_M, TILE_N)
        dev = jax.device_put
        a_args = (dev(a.seqs), dev(a.rseqs), dev(a.lengths), dev(a.v),
                  dev(a.j), dev(a.orig))
        b_args = (dev(b.seqs), dev(b.rseqs), dev(b.lengths), dev(b.v),
                  dev(b.j), dev(b.orig))
        # pad worklist to SLAB multiple pointing at the all-pad dummy tile
        dummy = np.array([[a.np_ - TILE_M, b.np_ - TILE_N]], dtype=np.int32)
        wpad = (-w) % SLAB
        work_padded = np.concatenate(
            [work, np.repeat(dummy, wpad, axis=0)]
        ) if wpad else work

        for s0 in range(0, len(work_padded), SLAB):
            slab = work_padded[s0 : s0 + SLAB]
            codes = np.asarray(run(*a_args, *b_args, jnp.asarray(slab)))
            wz, mz, nz = np.nonzero(codes)
            if len(wz):
                ra = slab[wz, 0].astype(np.int64)
                rb = slab[wz, 1].astype(np.int64)
                ia = a.orig[ra + mz]
                ib = b.orig[rb + nz]
                out1.append(ia)
                out2.append(ib)
                outd.append(codes[wz, mz, nz].astype(np.int64) - 1)
            if logger is not None and progress_prompt is not None:
                logger.progress_update(min(s0 + SLAB, w))

    if logger is not None and progress_prompt is not None:
        logger.progress_done()

    if out1:
        return (
            np.concatenate(out1),
            np.concatenate(out2),
            np.concatenate(outd),
        )
    z = np.zeros(0, dtype=np.int64)
    return z, z, z.copy()
