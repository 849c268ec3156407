"""Pallas TPU kernels for the matching grid.

The XLA scan path (ops/engine.py) dispatches one fused computation per
worklist tile inside a lax.scan; Pallas removes the per-iteration
overhead, pipelines the HBM->VMEM tile fetches (double buffering via
BlockSpec index maps), and keeps the one-hot construction, the int8 MXU
matmul, the masks, and the score reduction entirely in VMEM.

Grid = one program per worklist tile, driven by scalar-prefetched
(row_block, col_block) arrays — the block-sparse pattern. All programs
accumulate into the single [R1p, R2p] output block, which Pallas keeps
resident in VMEM across the whole grid (the classic reduction layout).

Layout choices: per-sequence scalars (length, V, J, repertoire, count)
are stored as [1, N] rows, so every in-kernel broadcast is a native
[TM, 1] x [1, TN] op — no sublane/lane transposes inside the kernel.
Residues (forward and, for indel runs, reversed) are row-major
[N, lpad] on both sides; all distance work runs on the MXU.

Distance semantics identical to ops/engine.py:
  * equal lengths: Hamming = padded_width - one-hot matches
    (pad residue matches itself)
  * |len diff| == 1 with indels at d=1: match iff common_prefix +
    common_suffix >= min(len) (the reference's one-indel criterion,
    /root/reference/src/variants.cc:197-216), with the prefix/suffix
    lengths extracted from weighted one-hot matmuls (_first_mismatch)
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

from ..utils.lazyjax import ensure_jax

ensure_jax()  # bootstrap a deferred accelerator plugin before binding

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# device-only module: enable the persistent compile cache for direct
# consumers (bench's prepared dense path) that never enter ops.engine's
# device entry points
from .engine import _enable_compilation_cache
from .engine import order_colmajor as _order_colmajor

_enable_compilation_cache()

# One-hot channels: residue codes are 0..19 aa / 0..3 nt plus the pad
# code (db.pad_value = 20/4), so 21 classes cover every operand. The
# matmul contraction width is NCLASS*lpad lanes, padded to 128-lane
# tiles by Mosaic: 21*24 = 504 -> 4 lane tiles vs 32*24 = 768 -> 6, a
# 1.5x MXU-pass cut on every Hamming/prefix/suffix matmul.
# COMPAIRR_NCLASS overrides for A/B benchmarking.
NCLASS = int(__import__("os").environ.get("COMPAIRR_NCLASS", "21"))


def _onehot(seq_i8, nclass: int):
    """[T, L] int8 residues -> [T, nclass*L] int8 one-hot, built with
    2-D ops only. pltpu.repeat tiles whole copies, so feature
    (c, l) lives at lane c*L + l and the class index is lane // L; the
    ordering is irrelevant to the matmul as long as both operands use
    the same one."""
    t, l = seq_i8.shape
    rep = pltpu.repeat(seq_i8, nclass, axis=1)  # [T, nclass*L] tiled
    cls = lax.broadcasted_iota(jnp.int32, (t, l * nclass), 1) // l
    return (rep.astype(jnp.int32) == cls).astype(jnp.int8)


@lru_cache(maxsize=None)
def _dummy_i8(shape: tuple, device=None):
    """Tiny placeholder block for kernel inputs that are compile-time
    unused (the reversed/transposed residue matrices when indels are
    off) — their BlockSpecs use a constant (0, 0) index map, so only
    this one block ever loads. Saves deriving and keeping [N, Lmax]
    transposes resident (~1.8 GB at 24M sequences). `device` pins the
    placeholder next to the real operands (multi-device dispatch mixes
    committed inputs, which must all share a device)."""
    return jax.device_put(np.zeros(shape, np.int8), device)


def _device_of(x):
    """The single device a committed array lives on (None when the
    placement is unknown/uncommitted)."""
    try:
        (dev,) = x.devices()
        return dev
    except Exception:
        return None


def _score_tile(ca, cb, score_int: int, ignore_counts: bool):
    """Per-pair score g(count_a, count_b); ca is [TM, 1], cb [1, TN]
    (compute_score, /root/reference/src/overlap.cc:144-166)."""
    from ..constants import (
        SCORE_JACCARD,
        SCORE_MAX,
        SCORE_MH,
        SCORE_MIN,
        SCORE_PRODUCT,
        SCORE_RATIO,
    )

    if ignore_counts:
        return jnp.ones((ca.shape[0], cb.shape[1]), dtype=jnp.float32)
    if score_int in (SCORE_MH, SCORE_PRODUCT):
        return ca * cb
    if score_int == SCORE_RATIO:
        return ca / jnp.where(cb == 0, 1.0, cb)
    if score_int in (SCORE_JACCARD, SCORE_MIN):
        return jnp.minimum(ca + jnp.zeros_like(cb), cb)
    if score_int == SCORE_MAX:
        return jnp.maximum(ca + jnp.zeros_like(cb), cb)
    return (ca + cb) * 0.5


_BAND = 24  # first-mismatch band width: sums of 2^0..2^-23 are exact f32


def _first_mismatch(oh_a, oh_b, lpad: int):
    """[TM, TN] index of the first aligned mismatch between every row
    pair (lpad when the padded rows agree everywhere) — the common
    prefix length, computed on the MXU instead of a per-position VPU
    scan: weight each one-hot lane by 2^-(p - band_start); the matched
    weight sum then encodes the first mismatching position in its f32
    EXPONENT (mismatch weights are distinct powers of two, so sums of
    <= 24 of them are exact and the leading term determines the
    exponent), which an i32 bitcast extracts exactly. Bands of 24
    positions keep every sum exactly representable for any lpad.

    Takes _onehot-layout one-hot operands (shared with the Hamming
    matmul — building them is the dominant per-tile VPU cost) and
    casts to bfloat16 (half the VMEM, double the MXU rate): the
    weights are single powers of two within bf16's exponent range and
    the one-hots are 0/1, so every product is exact, and the MXU
    accumulates in f32 where sums of <= 24 distinct powers of two
    spanning 2^0..2^-23 fit the 24-bit mantissa exactly."""
    oh_a = oh_a.astype(jnp.bfloat16)
    oh_b = oh_b.astype(jnp.bfloat16)
    lanes = oh_a.shape[1]
    # _onehot puts feature (c, p) at lane c*lpad + p
    lane_pos = lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % lpad

    tm = oh_a.shape[0]
    tn = oh_b.shape[0]
    pref = jnp.zeros((tm, tn), dtype=jnp.int32)
    alive = jnp.ones((tm, tn), dtype=jnp.bool_)
    for lo in range(0, lpad, _BAND):
        hi = min(lo + _BAND, lpad)
        w = jnp.where(
            (lane_pos >= lo) & (lane_pos < hi),
            jnp.exp2(-(lane_pos - lo).astype(jnp.float32)),
            0.0,
        ).astype(jnp.bfloat16)
        msum = lax.dot_general(
            oh_a * w,
            oh_b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wtot = float(2.0 - 2.0 ** (-(hi - lo - 1)))  # sum 2^0..2^-(k-1)
        x = wtot - msum  # sum of the mismatched weights; exact
        bits = lax.bitcast_convert_type(x, jnp.int32)
        expo = ((bits >> 23) & 0xFF) - 127
        q = jnp.where(x > 0.0, -expo, hi - lo)
        pref = pref + jnp.where(alive, q, 0)
        alive = alive & (x <= 0.0)
    return pref


def _nbands(lpad: int) -> int:
    return -(-lpad // _BAND)


def _onehot_bf(seq_i8, nclass: int):
    """[T, L] int8 residues -> [T, nclass*L] bfloat16 one-hot (same
    lane layout as _onehot) — for operands only ever consumed by bf16
    matmuls, skipping the int8 materialisation + cast."""
    t, l = seq_i8.shape
    rep = pltpu.repeat(seq_i8, nclass, axis=1)
    cls = lax.broadcasted_iota(jnp.int32, (t, l * nclass), 1) // l
    return (rep.astype(jnp.int32) == cls).astype(jnp.bfloat16)


def _band_weight_row(lanes: int, lpad: int, lo: int, hi: int):
    """[1, lanes] bf16 first-mismatch band weights (2^-(p-lo) within
    [lo, hi), 0 outside) in the _onehot lane layout."""
    lane_pos = lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % lpad
    return jnp.where(
        (lane_pos >= lo) & (lane_pos < hi),
        jnp.exp2(-(lane_pos - lo).astype(jnp.float32)),
        0.0,
    ).astype(jnp.bfloat16)


def _first_mismatch_bw(oh_a_bf, bw_ref, lpad: int):
    """_first_mismatch with the band weights pre-applied to the CACHED
    b side (msum = (oh_a w) . oh_b^T == oh_a . (w oh_b)^T): bw_ref is a
    [nbands, TN, lanes] bf16 VMEM scratch holding the weighted b-side
    one-hots, rebuilt only when the column block changes. The a side
    supplies one plain bf16 one-hot per program."""
    tm = oh_a_bf.shape[0]
    tn = bw_ref.shape[1]
    pref = jnp.zeros((tm, tn), dtype=jnp.int32)
    alive = jnp.ones((tm, tn), dtype=jnp.bool_)
    for bi, lo in enumerate(range(0, lpad, _BAND)):
        hi = min(lo + _BAND, lpad)
        msum = lax.dot_general(
            oh_a_bf,
            bw_ref[bi],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wtot = float(2.0 - 2.0 ** (-(hi - lo - 1)))
        x = wtot - msum  # sum of the mismatched weights; exact
        bits = lax.bitcast_convert_type(x, jnp.int32)
        expo = ((bits >> 23) & 0xFF) - 127
        q = jnp.where(x > 0.0, -expo, hi - lo)
        pref = pref + jnp.where(alive, q, 0)
        alive = alive & (x <= 0.0)
    return pref


def _cached_key_match(
    i,
    cols_ref,
    a_seq,
    a_rseq,
    a_key,
    b_seq,
    b_rseq,
    b_key,
    scratch: dict,
    *,
    differences: int,
    indels: bool,
    lpad: int,
    indel_only: bool,
    a_oh_ref=None,
):
    """Key-fused match mask with the b-side one-hots cached in VMEM
    scratch across grid programs — the sparse kernels' analogue of the
    dense v2 kernel's HBM one-hots (which cannot exist at 24M-row
    indel scale: forward + reversed one-hots would need ~2x 12 GiB of
    HBM). Worklists are column-major ordered, so the cache rebuild
    (the round-3 kernels' dominant per-tile VPU cost, paid 2x per tile
    and 4x on indel tiles) amortises over each column run; only the
    a-side one-hots are built per program.

    scratch keys (allocated by the _*_pallas_fn builders):
      bh_i8  [TN, lanes] int8      Hamming operand  (skip if indel_only)
      bw_f   [nbands, TN, lanes] bf16  weighted fwd (indels only)
      bw_r   [nbands, TN, lanes] bf16  weighted rev (indels only)

    a_oh_ref: optional HBM-streamed a-side one-hot block (the dense
    v2c kernel passes it when only one set fits the HBM one-hot
    budget); when given, the per-program a-side build is skipped
    (non-indel configs only)."""
    prev = cols_ref[jnp.maximum(i - 1, 0)]
    rebuild = jnp.logical_or(i == 0, cols_ref[i] != prev)

    @pl.when(rebuild)
    def _():
        if not indel_only:
            oh_b = _onehot(b_seq[:], NCLASS)
            # HBM-streamed a blocks carry _ohp zero pad lanes; match
            # the cached b operand's width (zero x zero contributes 0)
            wpad = scratch["bh_i8"].shape[1] - oh_b.shape[1]
            if wpad:
                oh_b = jnp.pad(oh_b, ((0, 0), (0, wpad)))
            scratch["bh_i8"][:] = oh_b
        if indels:
            lanes = NCLASS * lpad
            ohb = _onehot_bf(b_seq[:], NCLASS)
            ohrb = _onehot_bf(b_rseq[:], NCLASS)
            for bi, lo in enumerate(range(0, lpad, _BAND)):
                hi = min(lo + _BAND, lpad)
                w = _band_weight_row(lanes, lpad, lo, hi)
                scratch["bw_f"][bi] = ohb * w
                scratch["bw_r"][bi] = ohrb * w

    keq = a_key[:].T == b_key[:]  # [TM, TN]
    if indel_only:
        match = jnp.zeros((a_seq.shape[0], b_seq.shape[0]), jnp.bool_)
    else:
        oh_a = (
            a_oh_ref[:] if a_oh_ref is not None
            else _onehot(a_seq[:], NCLASS)
        )
        matches = lax.dot_general(
            oh_a,
            scratch["bh_i8"][:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        match = keq & (matches >= lpad - differences)

    if indels:
        oh_a_bf = (
            oh_a.astype(jnp.bfloat16)
            if not indel_only
            else _onehot_bf(a_seq[:], NCLASS)
        )
        pref = _first_mismatch_bw(oh_a_bf, scratch["bw_f"], lpad)
        suf = _first_mismatch_bw(
            _onehot_bf(a_rseq[:], NCLASS), scratch["bw_r"], lpad
        )
        la = a_key[:].T & 0xFFFF  # garbage for pads, but pads never
        lb = b_key[:] & 0xFFFF  # pass the key-distance test
        dk = a_key[:].T - b_key[:]
        len_pm1 = (dk == 1) | (dk == -1)
        minlen = jnp.minimum(la + jnp.zeros_like(lb), lb)
        match = match | (len_pm1 & (pref + suf >= minlen))

    return match


def _match_tile_pallas(
    a_seq, a_rseq, a_len, a_v, a_j,
    b_seq, b_rseq, b_len, b_v, b_j,
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    lpad: int,
    tile_m: int,
    tile_n: int,
    indel_only: bool = False,
    a_key=None,
    b_key=None,
):
    """Shared in-kernel match mask (refs already loaded): one-hot int8
    MXU matmul Hamming + optional one-indel prefix/suffix check (also
    MXU, via _first_mismatch over the forward and reversed rows) +
    gene/length/validity masks. Returns (match bool [TM,TN],
    len_pm1 bool [TM,TN] or None).

    With a_key/b_key ([TM,1]/[1,TN] int32 fused bucket keys, see
    device_rows_raw) the whole length/v/j/validity chain collapses to
    one compare: equal keys are the match precondition, keys differing
    by exactly 1 are the one-indel length tolerance, and pad rows
    (unique spaced keys in a high band) never key-match anything. The
    a_len/a_v/... operands are unused then (callers pass dummies);
    lengths for the indel minimum come from the key's low 16 bits.

    indel_only serves tiles classify_worklist proved contain no
    equal-key pair: the Hamming matmul is dead weight there and is
    skipped (2 matmuls per tile instead of 3)."""
    use_key = a_key is not None
    if use_key:
        keq = a_key == b_key  # [TM, TN]
    else:
        la = a_len  # [TM, 1] int32
        lb = b_len  # [1, TN] int32
        valid = (la > 0) & (lb > 0)
    len_pm1 = None

    oh_a = oh_b = None
    if indel_only:
        assert indels, "indel_only tiles only exist on indel runs"
        match = jnp.zeros((a_seq.shape[0], b_seq.shape[0]), jnp.bool_)
    else:
        oh_a = _onehot(a_seq, NCLASS)
        oh_b = _onehot(b_seq, NCLASS)
        matches = lax.dot_general(
            oh_a,
            oh_b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if use_key:
            match = keq & (matches >= lpad - differences)
        else:
            match = (la == lb) & ((lpad - matches) <= differences)

    if indels:
        # one-indel criterion (variants.cc:197-216): common prefix +
        # common suffix >= min(len) for |len difference| == 1. The
        # forward one-hots are shared with the Hamming matmul (built
        # once per tile, not twice); only the reversed rows need their
        # own build.
        if oh_a is None:
            oh_a = _onehot(a_seq, NCLASS)
            oh_b = _onehot(b_seq, NCLASS)
        pref = _first_mismatch(oh_a, oh_b, lpad)
        suf = _first_mismatch(
            _onehot(a_rseq, NCLASS), _onehot(b_rseq, NCLASS), lpad
        )
        if use_key:
            la = a_key & 0xFFFF  # [TM, 1]; garbage for pads, but pads
            lb = b_key & 0xFFFF  # never pass the key-distance test
            dk = a_key - b_key
            len_pm1 = (dk == 1) | (dk == -1)
        else:
            len_pm1 = jnp.abs(la - lb) == 1
        minlen = jnp.minimum(la + jnp.zeros_like(lb), lb)
        match = match | (len_pm1 & (pref + suf >= minlen))

    if use_key:
        return match, len_pm1
    if not ignore_genes:
        match = match & (a_v == b_v) & (a_j == b_j)
    return match & valid, len_pm1


def _make_kernel(
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    score_int: int,
    ignore_counts: bool,
    lpad: int,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
):
    def kernel(
        rows_ref,
        cols_ref,
        a_seq,
        a_rseq,
        a_len,
        a_v,
        a_j,
        a_rep,
        a_cnt,
        b_seq,
        b_rseq,
        b_len,
        b_v,
        b_j,
        b_rep,
        b_cnt,
        out_ref,
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        match, _ = _match_tile_pallas(
            a_seq[:], a_rseq[:], a_len[:].T, a_v[:].T, a_j[:].T,
            b_seq[:], b_rseq[:], b_len[:], b_v[:], b_j[:],
            differences=differences, indels=indels,
            ignore_genes=ignore_genes, lpad=lpad,
            tile_m=tile_m, tile_n=tile_n,
        )

        g = _score_tile(a_cnt[:].T, b_cnt[:], score_int, ignore_counts)
        sc = jnp.where(match, g, 0.0)

        oh1 = (
            a_rep[:].T == lax.broadcasted_iota(jnp.int32, (tile_m, r1p), 1)
        ).astype(jnp.float32)
        # oh2 transposed ([r2p, TN]) so it builds from the [1, TN]
        # repertoire row without any lane->sublane transpose
        oh2t = (
            b_rep[:] == lax.broadcasted_iota(jnp.int32, (r2p, tile_n), 0)
        ).astype(jnp.float32)
        # Precision.HIGHEST: the default TPU matmul truncates f32
        # operands to bf16, rounding count products (sc can carry
        # integers up to 2^24, far past bf16's 8-bit mantissa) — seen
        # as +-1..3 drift per cell vs the reference. 6-pass emulation
        # keeps these small matmuls exact; the int8 Hamming matmul is
        # unaffected.
        part = lax.dot_general(
            oh1,
            sc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        out_ref[:] += lax.dot_general(
            part,
            oh2t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )

    return kernel


@lru_cache(maxsize=None)
def _dense_pallas_fn(
    differences: int,
    indels: bool,
    ignore_genes: bool,
    score_int: int,
    ignore_counts: bool,
    lpad: int,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    n_tiles: int,
    interpret: bool = False,
):
    kernel = _make_kernel(
        differences=differences,
        indels=indels,
        ignore_genes=ignore_genes,
        score_int=score_int,
        ignore_counts=ignore_counts,
        lpad=lpad,
        tile_m=tile_m,
        tile_n=tile_n,
        r1p=r1p,
        r2p=r2p,
    )

    def a_spec(width):
        return pl.BlockSpec(
            (tile_m, width),
            index_map=lambda i, rows, cols: (rows[i], 0),
            memory_space=pltpu.VMEM,
        )

    def b_spec(width):
        return pl.BlockSpec(
            (tile_n, width),
            index_map=lambda i, rows, cols: (cols[i], 0),
            memory_space=pltpu.VMEM,
        )

    def bT_spec(height):
        return pl.BlockSpec(
            (height, tile_n),
            index_map=lambda i, rows, cols: (0, cols[i]),
            memory_space=pltpu.VMEM,
        )

    def a_dummy(width):
        return pl.BlockSpec(
            (tile_m, width),
            index_map=lambda i, rows, cols: (0, 0),
            memory_space=pltpu.VMEM,
        )

    def b_dummy(width):
        return pl.BlockSpec(
            (tile_n, width),
            index_map=lambda i, rows, cols: (0, 0),
            memory_space=pltpu.VMEM,
        )

    def aT_spec(height):
        # a-side scalars live as [1, N] rows (see _gather_derive_fn);
        # the kernel transposes the (1, TM) block in VMEM
        return pl.BlockSpec(
            (height, tile_m),
            index_map=lambda i, rows, cols: (0, rows[i]),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            a_spec(lpad),  # a_seq
            a_spec(lpad) if indels else a_dummy(lpad),  # a_rseq
            aT_spec(1),  # a_len
            aT_spec(1),  # a_v
            aT_spec(1),  # a_j
            aT_spec(1),  # a_rep
            aT_spec(1),  # a_cnt
            b_spec(lpad),  # b_seq
            b_spec(lpad) if indels else b_dummy(lpad),  # b_rseq
            bT_spec(1),  # b_len
            bT_spec(1),  # b_v
            bT_spec(1),  # b_j
            bT_spec(1),  # b_rep
            bT_spec(1),  # b_cnt
        ],
        out_specs=pl.BlockSpec(
            (r1p, r2p),
            index_map=lambda i, rows, cols: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r1p, r2p), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(fn)


# min/max score decomposition cap: min(ca,cb) = sum over thresholds t
# of 1[ca>=t]*1[cb>=t] needs cmax chains, each with its own [r1p, TN]
# Q scratch — cap the count (VERDICT r4 item 6; the VMEM gate in
# _v2_scratch_ok bounds the actual bytes per shape).
_V2_GE_CMAX = int(__import__("os").environ.get("COMPAIRR_V2_GE_CMAX", "64"))


def _v2_chains(score_int: int, ignore_counts: bool, cmax: float):
    """The v2 kernel's score reduction as a static list of bilinear
    chains (a_weight, b_weight, scale): matrix[r1,r2] accumulates
    scale * (oh1 spec a_weight)^T M (oh2 spec b_weight) per chain.
    a_weight in {"one", "lo", "hi", "ge<t>"} ("lo"/"hi" = count
    low/high byte, bf16-exact since bytes <= 255; "ge<t>" = the 0/1
    threshold indicator 1[count >= t]), b_weight in {"one", "cnt",
    "ge<t>"}. Returns None for score modes with no exact bilinear
    decomposition at this cmax (ratio always; min/max/Jaccard when
    cmax > _V2_GE_CMAX or non-integer) — those keep the v1 kernel.

    min/max (and Jaccard, which accumulates min — compute_score,
    /root/reference/src/overlap.cc:144-166) decompose by threshold:
      min(ca,cb) = sum_{t=1..cmax} 1[ca>=t] * 1[cb>=t]
      max(ca,cb) = ca + cb - min(ca,cb)
    one bilinear chain per threshold, exact for the parser-validated
    integer duplicate counts. Every chain term is bounded by the
    engine guard's min/max tile bound S_a*M_b + S_b*M_a
    (_plan_exact_chunks), so chunked accumulation stays f32-exact.

    The high-byte chain only exists when some count >= 256: synthetic
    and most real AIRR duplicate counts are small, and dropping the
    dead all-zero stage removes a whole [r1p, TM] x [TM, TN] matmul
    per program."""
    from ..constants import (
        SCORE_JACCARD,
        SCORE_MAX,
        SCORE_MEAN,
        SCORE_MH,
        SCORE_MIN,
        SCORE_PRODUCT,
    )

    if ignore_counts:
        return (("one", "one", 1.0),)
    hi = cmax >= 256
    if score_int in (SCORE_MH, SCORE_PRODUCT):
        ch = [("lo", "cnt", 1.0)]
        if hi:
            ch.append(("hi", "cnt", 256.0))
        return tuple(ch)
    if score_int == SCORE_MEAN:
        # sum (ca+cb)/2 = 0.5*(sum ca * 1) + 0.5*(1 * sum cb): exact
        # half-integers in f32 under the engine's 2^24 guard (the mean
        # bound S_a*M_b + S_b*M_a is 2x the half-integer sum, so the
        # sum stays < 2^23 where 0.5 spacing is exact)
        ch = [("lo", "one", 0.5), ("one", "cnt", 0.5)]
        if hi:
            ch.append(("hi", "one", 128.0))
        return tuple(ch)
    if score_int in (SCORE_JACCARD, SCORE_MIN, SCORE_MAX):
        tmax = int(cmax)
        if cmax != tmax or tmax > _V2_GE_CMAX:
            return None
        ge = [
            (f"ge{t}", f"ge{t}", 1.0) for t in range(1, max(tmax, 1) + 1)
        ]
        if score_int == SCORE_MAX:
            return (
                ("lo", "one", 1.0),
                ("one", "cnt", 1.0),
                *((a, b, -1.0) for a, b, _ in ge),
            )
        return tuple(ge)
    return None


def _v2_run_cap(tile_m: int, wmax: int = 255) -> int:
    """Max programs accumulated into the Q scratch between flushes:
    each Q entry is a sum of a-side weights (<= wmax) over at most
    tile_m rows per program, so run_cap * tile_m * wmax < 2^24 keeps
    every Q partial exactly representable in f32 (the int8 stage-1
    accumulates in i32, but its flush converts Q to f32 for the
    stage-2 matmul, so the same bound applies)."""
    return max(1, ((1 << 24) - 1) // (tile_m * max(wmax, 1)))


def _chain_aweights(a_rep, a_cnt, *, chains: tuple, tile_m: int,
                    r1p: int):
    """Per-program a-side stage-1 weight matrices, one per distinct
    chain a-kind (see _v2_chains)."""
    a_kinds = {c[0] for c in chains}
    oh1 = (
        a_rep[:].T == lax.broadcasted_iota(jnp.int32, (tile_m, r1p), 1)
    ).astype(jnp.float32)
    aw = {"one": oh1}
    if not a_kinds <= {"one"}:
        ca = a_cnt[:].T  # [TM, 1] f32
        if "lo" in a_kinds or "hi" in a_kinds:
            h = jnp.floor(ca * (1.0 / 256.0))
            aw["lo"] = oh1 * (ca - 256.0 * h)
            aw["hi"] = oh1 * h
        for k in a_kinds:
            if k.startswith("ge"):
                aw[k] = oh1 * (ca >= float(k[2:]))
    return aw


def _chain_stage1(qs, m_s, aw, *, chains: tuple, int8_stage1: bool):
    """Q_c += A_c^T M for every chain (stage 1; exact integer sums —
    see _v2_run_cap)."""
    s1_dtype = jnp.int8 if int8_stage1 else jnp.bfloat16
    q_dtype = jnp.int32 if int8_stage1 else jnp.float32
    for q, (ak, _bk, _s) in zip(qs, chains):
        q[:] += lax.dot_general(
            aw[ak].astype(s1_dtype),
            m_s,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=q_dtype,
        )  # [r1p, TN]


def _chain_flush(i, flush_ref, b_rep, b_cnt, out_ref, qs, *,
                 chains: tuple, tile_n: int, r2p: int):
    """out += scale_c Q_c B_c on flush programs (stage 2); Q cleared
    after. Runs at Precision.HIGHEST — the flush results carry exact
    integer sums (see _make_dense_v2_kernel)."""
    b_kinds = sorted({c[1] for c in chains})

    @pl.when(flush_ref[i] != 0)
    def _():
        b_oh2 = (
            b_rep[:]
            == lax.broadcasted_iota(jnp.int32, (r2p, tile_n), 0)
        ).astype(jnp.float32)
        bm = {}
        for bk in b_kinds:
            if bk == "cnt":
                bm[bk] = b_oh2 * b_cnt[:]
            elif bk.startswith("ge"):
                bm[bk] = b_oh2 * (b_cnt[:] >= float(bk[2:]))
            else:
                bm[bk] = b_oh2
        acc = None
        for q, (_ak, bk, scale) in zip(qs, chains):
            t = lax.dot_general(
                q[:].astype(jnp.float32),
                bm[bk],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )  # [r1p, r2p]
            if scale != 1.0:
                t = t * scale
            acc = t if acc is None else acc + t
            q[:] = jnp.zeros_like(q)
        out_ref[:] += acc


def _chain_reduce(
    i,
    flush_ref,
    match,
    a_rep,
    a_cnt,
    b_rep,
    b_cnt,
    out_ref,
    qs,
    *,
    chains: tuple,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    int8_stage1: bool,
):
    """Shared v2-family score reduction (in-kernel): per chain
      Q_c += A_c^T M          every program (stage 1)
      out += scale_c Q_c B_c  on flush programs (stage 2)
    See _make_dense_v2_kernel's docstring for the full exactness
    argument; "ge<t>" kinds are the 0/1 threshold indicators of the
    min/max decomposition (_v2_chains)."""
    s1_dtype = jnp.int8 if int8_stage1 else jnp.bfloat16
    aw = _chain_aweights(
        a_rep, a_cnt, chains=chains, tile_m=tile_m, r1p=r1p
    )
    _chain_stage1(
        qs, match.astype(s1_dtype), aw, chains=chains,
        int8_stage1=int8_stage1,
    )
    _chain_flush(
        i, flush_ref, b_rep, b_cnt, out_ref, qs, chains=chains,
        tile_n=tile_n, r2p=r2p,
    )


def _make_dense_v2_kernel(
    *,
    differences: int,
    chains: tuple,
    lpad: int,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    int8_stage1: bool = False,
):
    """Throughput dense kernel (substitution-only): one-hot rows come
    precomputed from HBM, so the program is two MXU matmuls (Hamming +
    one stage-1 per chain) plus cheap masks — no per-tile VPU one-hot
    rebuild.

    Score reduction (exact, fast): per chain (see _v2_chains)
      Q_c += A_c^T M        every program  (bf16 matmul, f32 accum —
                             integer sums are exact; Q_c lives in VMEM
                             scratch across programs)
      out += scale_c * Q_c B_c   only on flush programs (host-computed
                             flush flags: column-block change or the
                             _v2_run_cap exactness bound)
    The worklist is ordered column-major, so consecutive programs
    share the b-block: the stage-2 [r1p,TN]x[TN,r2p] Precision.HIGHEST
    matmul and the b-side repertoire one-hot build amortise over the
    whole run instead of running per tile.

    int8_stage1 (all a-side weights <= 127, i.e. counts < 128 or -f):
    the stage-1 matmul runs int8 x int8 -> i32 at twice the bf16 MXU
    rate; Q accumulates in i32 (exact) and converts to f32 at flush
    (exact under the same _v2_run_cap bound)."""

    def kernel(
        rows_ref,
        cols_ref,
        flush_ref,
        a_oh,
        a_key,
        a_rep,
        a_cnt,
        b_oh,
        b_key,
        b_rep,
        b_cnt,
        out_ref,
        *qs,
    ):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            for q in qs:
                q[:] = jnp.zeros_like(q)

        matches = lax.dot_general(
            a_oh[:],
            b_oh[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # the match precondition (equal v, j, AND length — or just
        # length with -g) is exactly bucket-key equality, one [TM, TN]
        # compare instead of four. Pad rows carry key -1: pad-pad
        # "matches" are harmless because a pad row's repertoire one-hot
        # row is all zero in both reduction operands.
        #
        # (Two measured dead ends, r5 same-window A/Bs: a per-tile
        # "uniform key" branch skipping this compare was 17% SLOWER —
        # pl.when on a traced scalar predicates rather than branches
        # on Mosaic, so both stage-1 variants executed every program —
        # and deleting keq outright measured 15.10 vs 15.12 ms: the
        # VPU compare is fully hidden behind the MXU/DMA pipeline.
        # The real per-program cost is fixed overhead (~2 us/program
        # from the 512/768/1024 tile scaling fit), i.e. the small
        # per-program block DMAs, not this arithmetic.)
        keq = a_key[:].T == b_key[:]
        match = keq & (matches >= lpad - differences)
        _chain_reduce(
            i, flush_ref, match, a_rep, a_cnt, b_rep, b_cnt, out_ref,
            qs, chains=chains, tile_m=tile_m, tile_n=tile_n, r1p=r1p,
            r2p=r2p, int8_stage1=int8_stage1,
        )

    return kernel


@lru_cache(maxsize=None)
def _dense_v2_fn(
    differences: int,
    chains: tuple,
    lpad: int,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    n_tiles: int,
    interpret: bool = False,
    int8_stage1: bool = False,
):
    kernel = _make_dense_v2_kernel(
        differences=differences,
        chains=chains,
        lpad=lpad,
        tile_m=tile_m,
        tile_n=tile_n,
        r1p=r1p,
        r2p=r2p,
        int8_stage1=int8_stage1,
    )
    ohw = _ohp(lpad)  # HBM one-hot rows carry zero pad lanes

    def a_spec(width):
        return pl.BlockSpec(
            (tile_m, width),
            index_map=lambda i, rows, cols, flush: (rows[i], 0),
            memory_space=pltpu.VMEM,
        )

    def b_spec(width):
        return pl.BlockSpec(
            (tile_n, width),
            index_map=lambda i, rows, cols, flush: (cols[i], 0),
            memory_space=pltpu.VMEM,
        )

    def aT_spec(height):
        return pl.BlockSpec(
            (height, tile_m),
            index_map=lambda i, rows, cols, flush: (0, rows[i]),
            memory_space=pltpu.VMEM,
        )

    def bT_spec(height):
        return pl.BlockSpec(
            (height, tile_n),
            index_map=lambda i, rows, cols, flush: (0, cols[i]),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            a_spec(ohw),  # a_oh
            aT_spec(1),  # a_key
            aT_spec(1),  # a_rep
            aT_spec(1),  # a_cnt
            b_spec(ohw),  # b_oh
            bT_spec(1),  # b_key
            bT_spec(1),  # b_rep
            bT_spec(1),  # b_cnt
        ],
        out_specs=pl.BlockSpec(
            (r1p, r2p),
            index_map=lambda i, rows, cols, flush: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (r1p, tile_n),
                jnp.int32 if int8_stage1 else jnp.float32,
            )
            for _ in chains
        ],
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r1p, r2p), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(fn)


def _make_dense_v3_kernel(
    *,
    differences: int,
    chains: tuple,
    lpad: int,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    n_tiles: int,
    depth: int,
    int8_stage1: bool,
):
    """Manually pipelined v2 (the throughput dense kernel): ONE grid
    program, an in-kernel fori_loop over the worklist, and a
    depth-deep DMA ring streaming the a/b one-hot blocks plus packed
    key/rep/count rows ("scal4") from HBM.

    Why: Mosaic's automatic per-program pipeline only overlaps the
    Hamming matmul with the next block fetch — same-window ablations
    measured the v2 kernel's match/stage-1/flush tail (~1.7 us per
    768-tile program) fully additive on top of a ~3.1 us/program
    DMA-bound floor, and a ~1.2 us fixed cost per grid program that
    batching bodies into one program does NOT remove (kbatch=2/4 ran
    1.3-1.9x SLOWER). Issuing the copies ourselves from a single
    program overlaps the WHOLE body with the ring's in-flight fetches:
    15.2 ms -> 10.7 ms on the benchmark worklist (3162 tiles, 1M x 1M
    rows, d=2 product chains), checksum-identical, projecting the MXU
    utilisation from 0.34 to ~0.51 of int8 peak.

    Exactness is unchanged from v2: the score reduction is the same
    _chain_reduce (stage-1 Q accumulation + flush at the same
    host-computed flags), iterated in the same worklist order.
    Reference analogue: the all-vs-all grid it accelerates,
    /root/reference/src/overlap.cc:286-359."""

    def kernel(
        rows_ref, cols_ref, flush_ref,
        a_oh_hbm, a_scal_hbm, b_oh_hbm, b_scal_hbm,
        out_ref,
        a_buf, a_sbuf, b_buf, b_sbuf, sems, *qs,
    ):
        out_ref[:] = jnp.zeros_like(out_ref)
        for q in qs:
            q[:] = jnp.zeros_like(q)

        def copies(slot, t):
            r = rows_ref[t]
            c = cols_ref[t]
            return (
                pltpu.make_async_copy(
                    a_oh_hbm.at[pl.ds(r * tile_m, tile_m), :],
                    a_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    a_scal_hbm.at[:, pl.ds(r * tile_m, tile_m)],
                    a_sbuf.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(
                    b_oh_hbm.at[pl.ds(c * tile_n, tile_n), :],
                    b_buf.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(
                    b_scal_hbm.at[:, pl.ds(c * tile_n, tile_n)],
                    b_sbuf.at[slot], sems.at[slot, 3]),
            )

        def start(slot, t):
            for d in copies(slot, t):
                d.start()

        for s in range(depth - 1):
            if s < n_tiles:
                start(s, s)

        def body(t, carry):
            slot = lax.rem(t, depth)
            nxt = t + depth - 1

            @pl.when(nxt < n_tiles)
            def _():
                start(lax.rem(nxt, depth), nxt)

            for d in copies(slot, t):
                d.wait()
            matches = lax.dot_general(
                a_buf[slot], b_buf[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            a_s = a_sbuf[slot]  # [4, TM] i32: key / rep / count / pad
            b_s = b_sbuf[slot]
            keq = a_s[0:1].T == b_s[0:1]
            match = keq & (matches >= lpad - differences)
            _chain_reduce(
                t, flush_ref, match,
                a_s[1:2], a_s[2:3].astype(jnp.float32),
                b_s[1:2], b_s[2:3].astype(jnp.float32),
                out_ref, qs, chains=chains, tile_m=tile_m,
                tile_n=tile_n, r1p=r1p, r2p=r2p,
                int8_stage1=int8_stage1,
            )
            return carry

        lax.fori_loop(0, n_tiles, body, 0)

    return kernel


_V3_DEPTH = int(__import__("os").environ.get("COMPAIRR_V3_DEPTH", "3"))


def _v3_scratch_ok(
    chains: tuple, r1p: int, tile_m: int, tile_n: int, lpad: int,
    depth: int = _V3_DEPTH,
) -> bool:
    """v3 VMEM budget: the chain Q accumulators plus the DMA ring
    buffers (depth x one-hot block + scal rows per side)."""
    total = len(chains) * r1p * tile_n * 4
    total += depth * (tile_m + tile_n) * (_ohp(lpad) + 4 * 4)
    return total <= _V2_SCRATCH_BYTES_MAX


@lru_cache(maxsize=None)
def _dense_v3_fn(
    differences: int,
    chains: tuple,
    lpad: int,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    n_tiles: int,
    depth: int = _V3_DEPTH,
    interpret: bool = False,
    int8_stage1: bool = False,
):
    kernel = _make_dense_v3_kernel(
        differences=differences, chains=chains, lpad=lpad,
        tile_m=tile_m, tile_n=tile_n, r1p=r1p, r2p=r2p,
        n_tiles=n_tiles, depth=depth, int8_stage1=int8_stage1,
    )
    ohw = _ohp(lpad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # a one-hot rows
            pl.BlockSpec(memory_space=pltpu.ANY),  # a scal4
            pl.BlockSpec(memory_space=pltpu.ANY),  # b one-hot rows
            pl.BlockSpec(memory_space=pltpu.ANY),  # b scal4
        ],
        out_specs=pl.BlockSpec(
            (r1p, r2p),
            index_map=lambda i, rows, cols, flush: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((depth, tile_m, ohw), jnp.int8),
            pltpu.VMEM((depth, 4, tile_m), jnp.int32),
            pltpu.VMEM((depth, tile_n, ohw), jnp.int8),
            pltpu.VMEM((depth, 4, tile_n), jnp.int32),
            pltpu.SemaphoreType.DMA((depth, 4)),
        ] + [
            pltpu.VMEM(
                (r1p, tile_n),
                jnp.int32 if int8_stage1 else jnp.float32,
            )
            for _ in chains
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r1p, r2p), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(fn)


def _make_dense_v2c_kernel(
    *,
    differences: int,
    indels: bool,
    chains: tuple,
    lpad: int,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    a_hbm: bool,
    int8_stage1: bool,
):
    """Cached-operand dense kernel — the v2 architecture (Q-chain
    accumulation + flush amortisation, _chain_reduce) for runs the
    HBM-one-hot v2 kernel cannot serve: indel runs (forward+reversed
    HBM one-hots would be 2x ~12 GiB at Keck scale) and runs whose
    one-hot rows miss the HBM budget (two-file Keck shapes). The
    b-side one-hots live in VMEM scratch rebuilt once per column run
    (_cached_key_match — the sparse kernels' treatment, VERDICT r4
    item 2); the a side streams HBM one-hot rows when they fit
    (a_hbm) and otherwise builds per program. Replaces the v1
    per-tile-rebuild kernel for every key32-carrying dense run."""
    assert not (a_hbm and indels), "HBM a-side one-hots are fwd-only"

    def kernel(
        rows_ref,
        cols_ref,
        flush_ref,
        a1,
        a_rseq,
        a_key,
        a_rep,
        a_cnt,
        b_seq,
        b_rseq,
        b_key,
        b_rep,
        b_cnt,
        out_ref,
        *scr,
    ):
        scratch = {"bh_i8": scr[0]}
        k = 1
        if indels:
            scratch["bw_f"], scratch["bw_r"] = scr[1], scr[2]
            k = 3
        qs = scr[k:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            for q in qs:
                q[:] = jnp.zeros_like(q)

        match = _cached_key_match(
            i,
            cols_ref,
            None if a_hbm else a1,
            a_rseq,
            a_key,
            b_seq,
            b_rseq,
            b_key,
            scratch,
            differences=differences,
            indels=indels,
            lpad=lpad,
            indel_only=False,
            a_oh_ref=a1 if a_hbm else None,
        )
        _chain_reduce(
            i, flush_ref, match, a_rep, a_cnt, b_rep, b_cnt, out_ref,
            qs, chains=chains, tile_m=tile_m, tile_n=tile_n, r1p=r1p,
            r2p=r2p, int8_stage1=int8_stage1,
        )

    return kernel


@lru_cache(maxsize=None)
def _dense_v2c_fn(
    differences: int,
    indels: bool,
    chains: tuple,
    lpad: int,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    n_tiles: int,
    interpret: bool = False,
    int8_stage1: bool = False,
    a_hbm: bool = False,
):
    kernel = _make_dense_v2c_kernel(
        differences=differences,
        indels=indels,
        chains=chains,
        lpad=lpad,
        tile_m=tile_m,
        tile_n=tile_n,
        r1p=r1p,
        r2p=r2p,
        a_hbm=a_hbm,
        int8_stage1=int8_stage1,
    )
    ohw = NCLASS * lpad
    # the cached b-side Hamming operand matches the a operand's width:
    # _ohp zero pad lanes when a streams HBM one-hot rows, bare ohw
    # when a one-hots are built in-kernel
    bh_w = _ohp(lpad) if a_hbm else ohw

    def a_spec(width):
        return pl.BlockSpec(
            (tile_m, width),
            index_map=lambda i, rows, cols, flush: (rows[i], 0),
            memory_space=pltpu.VMEM,
        )

    def a_dummy(width):
        return pl.BlockSpec(
            (tile_m, width),
            index_map=lambda i, rows, cols, flush: (0, 0),
            memory_space=pltpu.VMEM,
        )

    def b_spec(width):
        return pl.BlockSpec(
            (tile_n, width),
            index_map=lambda i, rows, cols, flush: (cols[i], 0),
            memory_space=pltpu.VMEM,
        )

    def b_dummy(width):
        return pl.BlockSpec(
            (tile_n, width),
            index_map=lambda i, rows, cols, flush: (0, 0),
            memory_space=pltpu.VMEM,
        )

    def aT_spec(height):
        return pl.BlockSpec(
            (height, tile_m),
            index_map=lambda i, rows, cols, flush: (0, rows[i]),
            memory_space=pltpu.VMEM,
        )

    def bT_spec(height):
        return pl.BlockSpec(
            (height, tile_n),
            index_map=lambda i, rows, cols, flush: (0, cols[i]),
            memory_space=pltpu.VMEM,
        )

    scratch = [pltpu.VMEM((tile_n, bh_w), jnp.int8)]
    if indels:
        nb = _nbands(lpad)
        scratch += [
            pltpu.VMEM((nb, tile_n, ohw), jnp.bfloat16),
            pltpu.VMEM((nb, tile_n, ohw), jnp.bfloat16),
        ]
    scratch += [
        pltpu.VMEM(
            (r1p, tile_n), jnp.int32 if int8_stage1 else jnp.float32
        )
        for _ in chains
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            a_spec(bh_w if a_hbm else lpad),  # a_oh / a_seq
            a_spec(lpad) if indels else a_dummy(lpad),  # a_rseq
            aT_spec(1),  # a_key
            aT_spec(1),  # a_rep
            aT_spec(1),  # a_cnt
            b_spec(lpad),  # b_seq
            b_spec(lpad) if indels else b_dummy(lpad),  # b_rseq
            bT_spec(1),  # b_key
            bT_spec(1),  # b_rep
            bT_spec(1),  # b_cnt
        ],
        out_specs=pl.BlockSpec(
            (r1p, r2p),
            index_map=lambda i, rows, cols, flush: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )

    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r1p, r2p), jnp.float32),
        interpret=interpret,
    )
    return jax.jit(fn)


# VMEM scratch ceiling for the v2-family kernels (the chip has ~16 MiB
# of VMEM/core shared with the operand blocks and double buffering):
# chain Q accumulators plus the v2c b-side caches must fit under it or
# the run keeps the v1 kernel.
_V2_SCRATCH_BYTES_MAX = int(
    __import__("os").environ.get("COMPAIRR_V2_SCRATCH_MAX", str(6 << 20))
)


def _v2_scratch_ok(
    chains: tuple,
    r1p: int,
    tile_n: int,
    *,
    lpad: int = 0,
    indels: bool = False,
    cached_b: bool = False,
) -> bool:
    total = len(chains) * r1p * tile_n * 4  # Q accumulators
    if cached_b:
        ohw = NCLASS * lpad
        total += tile_n * _ohp(lpad)  # bh_i8 (pad lanes when a_hbm)
        if indels:
            total += 2 * _nbands(lpad) * tile_n * ohw * 2  # bf16 fwd+rev
    return total <= _V2_SCRATCH_BYTES_MAX


def _dense_v2_eligible(
    a_dev, b_dev, *, indels, score_int, ignore_counts, r1p, tile_n
):
    """The v2 kernel serves substitution-only runs whose score has an
    exact bilinear decomposition (product/MH/mean — the byte split
    needs counts < 2^16 — min/max/Jaccard at small integer cmax, or
    -f), when both sides carry HBM one-hots and an int32 fused bucket
    key, and the chain scratch fits VMEM."""
    if indels or a_dev.get("oh") is None or b_dev.get("oh") is None:
        return False
    if a_dev.get("key32") is None or b_dev.get("key32") is None:
        return False
    cmax = max(a_dev.get("cmax", 1 << 30), b_dev.get("cmax", 1 << 30))
    chains = _v2_chains(score_int, ignore_counts, cmax)
    if chains is None or not _v2_scratch_ok(chains, r1p, tile_n):
        return False
    return ignore_counts or cmax < (1 << 16)


def _dense_v2c_eligible(
    a_dev, b_dev, *, indels, score_int, ignore_counts, r1p, tile_n
):
    """The cached-operand v2c kernel serves every chain-decomposable
    dense run that carries fused keys but misses v2's HBM one-hot
    requirement: indel runs and one-hot-budget overflows."""
    if a_dev.get("key32") is None or b_dev.get("key32") is None:
        return False
    if indels and (
        a_dev.get("rseqs") is None or b_dev.get("rseqs") is None
    ):
        return False
    cmax = max(a_dev.get("cmax", 1 << 30), b_dev.get("cmax", 1 << 30))
    chains = _v2_chains(score_int, ignore_counts, cmax)
    if chains is None:
        return False
    lpad = a_dev["seqs"].shape[1]
    if not _v2_scratch_ok(
        chains, r1p, tile_n, lpad=lpad, indels=indels, cached_b=True
    ):
        return False
    return ignore_counts or cmax < (1 << 16)


# the kernel class chosen by the latest dense dispatch ("v2", "v2c",
# "v1") — a test/diagnostics probe, not a control knob
LAST_DENSE_KERNEL: Optional[str] = None


def _dense_kernel_kind(
    a_dev, b_dev, *, indels, score_int, ignore_counts, r1p, tile_n,
    tile_m: Optional[int] = None,
) -> str:
    global LAST_DENSE_KERNEL
    if _dense_v2_eligible(
        a_dev, b_dev, indels=indels, score_int=score_int,
        ignore_counts=ignore_counts, r1p=r1p, tile_n=tile_n,
    ):
        kind = "v2"
        cmax = max(a_dev.get("cmax", 0.0), b_dev.get("cmax", 0.0))
        chains = _v2_chains(score_int, ignore_counts, cmax)
        lpad = a_dev["seqs"].shape[1]
        if (
            a_dev.get("scal4") is not None
            and b_dev.get("scal4") is not None
            and _v3_scratch_ok(
                chains, r1p, tile_m if tile_m else tile_n, tile_n,
                lpad,
            )
            and __import__("os").environ.get("COMPAIRR_V3", "1") != "0"
        ):
            kind = "v3"
    elif _dense_v2c_eligible(
        a_dev, b_dev, indels=indels, score_int=score_int,
        ignore_counts=ignore_counts, r1p=r1p, tile_n=tile_n,
    ):
        kind = "v2c"
    else:
        kind = "v1"
    LAST_DENSE_KERNEL = kind
    return kind


def _v2_weight_max(chains: tuple, cmax: float) -> int:
    """Largest a-side stage-1 weight across the chain set: 1 for
    "one"/"ge<t>" indicator chains, the full count for a low byte
    below 256, else 255 (byte-split weights; the high byte is
    cmax >> 8 <= 255 too)."""

    def kind_max(kind: str) -> int:
        if kind == "one" or kind.startswith("ge"):
            return 1
        if kind == "lo":
            return int(min(cmax, 255.0))
        return int(cmax) >> 8  # "hi"

    return max(1, *(kind_max(c[0]) for c in chains))




def _flush_flags(chunk: np.ndarray, run_cap: int) -> np.ndarray:
    """Per-program flush flags for a (padded) v2 dispatch chunk: flush
    where the next program's column block differs, at the exactness
    run cap (_v2_run_cap), and at the last program."""
    n = len(chunk)
    flush = np.zeros(n, dtype=np.int32)
    if n == 0:
        return flush
    change = np.nonzero(np.diff(chunk[:, 1]) != 0)[0]
    flush[change] = 1
    flush[n - 1] = 1
    seg = np.zeros(n, dtype=np.int64)
    seg[1:] = np.cumsum(np.diff(chunk[:, 1]) != 0)
    segstart = np.concatenate([[0], change + 1])
    pos = np.arange(n, dtype=np.int64) - segstart[seg]
    flush[(pos + 1) % run_cap == 0] = 1
    return flush


def _cached_scratch_shapes(indels: bool, indel_only: bool, lpad: int,
                           tile_n: int):
    """(keys, shapes) of the cached b-side one-hot scratch buffers for
    the key-fused sparse kernels (see _cached_key_match)."""
    lanes = NCLASS * lpad
    keys, shapes = [], []
    if not indel_only:
        keys.append("bh_i8")
        shapes.append(pltpu.VMEM((tile_n, lanes), jnp.int8))
    if indels:
        nb = _nbands(lpad)
        keys.append("bw_f")
        shapes.append(pltpu.VMEM((nb, tile_n, lanes), jnp.bfloat16))
        keys.append("bw_r")
        shapes.append(pltpu.VMEM((nb, tile_n, lanes), jnp.bfloat16))
    return keys, shapes


def _make_count_kernel(
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    exclude_self: bool,
    lpad: int,
    tile_m: int,
    tile_n: int,
    indel_only: bool = False,
    use_key: bool = False,
):
    scr_keys, _ = _cached_scratch_shapes(indels, indel_only, lpad, tile_n)

    def kernel(rows_ref, cols_ref, *refs):
        if use_key:
            (a_seq, a_rseq, a_key, a_orig,
             b_seq, b_rseq, b_key, b_orig, out_ref) = refs[: 9]
            scratch = dict(zip(scr_keys, refs[9:]))
            match = _cached_key_match(
                pl.program_id(0), cols_ref,
                a_seq, a_rseq, a_key, b_seq, b_rseq, b_key, scratch,
                differences=differences, indels=indels, lpad=lpad,
                indel_only=indel_only,
            )
        else:
            (a_seq, a_rseq, a_len, a_v, a_j, a_orig,
             b_seq, b_rseq, b_len, b_v, b_j, b_orig, out_ref) = refs
            match, _ = _match_tile_pallas(
                a_seq[:], a_rseq[:], a_len[:].T, a_v[:].T, a_j[:].T,
                b_seq[:], b_rseq[:], b_len[:], b_v[:], b_j[:],
                differences=differences, indels=indels,
                ignore_genes=ignore_genes, lpad=lpad,
                tile_m=tile_m, tile_n=tile_n, indel_only=indel_only,
            )
        if exclude_self:
            match = match & (a_orig[:].T != b_orig[:])
        # 1024 consecutive programs share one (1024,) SMEM output
        # block (matching XLA's T(1024) layout for 1-D s32 arrays);
        # each writes its own slot
        out_ref[pl.program_id(0) % 1024] = jnp.sum(match.astype(jnp.int32))

    return kernel


@lru_cache(maxsize=None)
def _count_pallas_fn(
    differences: int,
    indels: bool,
    ignore_genes: bool,
    exclude_self: bool,
    lpad: int,
    tile_m: int,
    tile_n: int,
    n_tiles: int,
    interpret: bool = False,
    indel_only: bool = False,
    use_key: bool = False,
):
    """Per-worklist-tile match counts on the MXU — phase 1 of sparse
    extraction. One program per tile; each writes its own [1,1] count
    block. ~10^4x the throughput of the XLA-scan count on big
    worklists (the scan serialises tiny VPU tiles)."""
    kernel = _make_count_kernel(
        differences=differences,
        indels=indels,
        ignore_genes=ignore_genes,
        exclude_self=exclude_self,
        lpad=lpad,
        tile_m=tile_m,
        tile_n=tile_n,
        indel_only=indel_only,
        use_key=use_key,
    )

    def a_spec(width):
        return pl.BlockSpec(
            (tile_m, width),
            index_map=lambda i, rows, cols: (rows[i], 0),
            memory_space=pltpu.VMEM,
        )

    def bT_spec(height):
        return pl.BlockSpec(
            (height, tile_n),
            index_map=lambda i, rows, cols: (0, cols[i]),
            memory_space=pltpu.VMEM,
        )

    def b_row_spec(width):
        return pl.BlockSpec(
            (tile_n, width),
            index_map=lambda i, rows, cols: (cols[i], 0),
            memory_space=pltpu.VMEM,
        )

    def a_dummy(width):
        return pl.BlockSpec(
            (tile_m, width),
            index_map=lambda i, rows, cols: (0, 0),
            memory_space=pltpu.VMEM,
        )

    def b_row_dummy(width):
        return pl.BlockSpec(
            (tile_n, width),
            index_map=lambda i, rows, cols: (0, 0),
            memory_space=pltpu.VMEM,
        )

    def aT_spec(height):
        # a-side scalars live as [1, N] rows (see _gather_sparse_fn);
        # the kernel transposes the (1, TM) block in VMEM
        return pl.BlockSpec(
            (height, tile_m),
            index_map=lambda i, rows, cols: (0, rows[i]),
            memory_space=pltpu.VMEM,
        )

    if use_key:
        in_specs = [
            a_spec(lpad),  # a_seq
            a_spec(lpad) if indels else a_dummy(lpad),  # a_rseq
            aT_spec(1),  # a_key
            aT_spec(1),  # a_orig
            b_row_spec(lpad),  # b_seq
            b_row_spec(lpad) if indels else b_row_dummy(lpad),  # b_rseq
            bT_spec(1),  # b_key
            bT_spec(1),  # b_orig
        ]
    else:
        in_specs = [
            a_spec(lpad),  # a_seq
            a_spec(lpad) if indels else a_dummy(lpad),  # a_rseq
            aT_spec(1),  # a_len
            aT_spec(1),  # a_v
            aT_spec(1),  # a_j
            aT_spec(1),  # a_orig
            b_row_spec(lpad),  # b_seq
            b_row_spec(lpad) if indels else b_row_dummy(lpad),  # b_rseq
            bT_spec(1),  # b_len
            bT_spec(1),  # b_v
            bT_spec(1),  # b_j
            bT_spec(1),  # b_orig
        ]
    _keys, scr_shapes = _cached_scratch_shapes(
        indels, indel_only, lpad, tile_n
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1024,),
            index_map=lambda i, rows, cols: (i // 1024,),
            memory_space=pltpu.SMEM,
        ),
        scratch_shapes=scr_shapes if use_key else [],
    )

    assert n_tiles % 1024 == 0, "count worklist must be a 1024-multiple"
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles,), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(fn)


def _make_extract_kernel(
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    exclude_self: bool,
    lpad: int,
    tile_m: int,
    tile_n: int,
    indel_only: bool = False,
    use_key: bool = False,
):
    """Phase-2 kernel: per worklist tile, the match mask packed into
    uint32 bit-words (32 columns per word). The packing runs on the
    MXU as two exact f32 matmuls against constant bit-weight matrices
    (weights <= 2^15, row sums < 2^24, so f32 arithmetic is exact);
    lo|hi<<16 reassembles the 32-bit words."""
    wpr = tile_n // 32
    scr_keys, _ = _cached_scratch_shapes(indels, indel_only, lpad, tile_n)

    def kernel(rows_ref, cols_ref, *refs):
        if use_key:
            (a_seq, a_rseq, a_key, a_orig,
             b_seq, b_rseq, b_key, b_orig, out_ref) = refs[: 9]
            scratch = dict(zip(scr_keys, refs[9:]))
            match = _cached_key_match(
                pl.program_id(0), cols_ref,
                a_seq, a_rseq, a_key, b_seq, b_rseq, b_key, scratch,
                differences=differences, indels=indels, lpad=lpad,
                indel_only=indel_only,
            )
        else:
            (a_seq, a_rseq, a_len, a_v, a_j, a_orig,
             b_seq, b_rseq, b_len, b_v, b_j, b_orig, out_ref) = refs
            match, _ = _match_tile_pallas(
                a_seq[:], a_rseq[:], a_len[:].T, a_v[:].T, a_j[:].T,
                b_seq[:], b_rseq[:], b_len[:], b_v[:], b_j[:],
                differences=differences, indels=indels,
                ignore_genes=ignore_genes, lpad=lpad,
                tile_m=tile_m, tile_n=tile_n, indel_only=indel_only,
            )
        if exclude_self:
            match = match & (a_orig[:].T != b_orig[:])
        mf = match.astype(jnp.float32)  # [TM, TN]
        lane = lax.broadcasted_iota(jnp.int32, (tile_n, wpr), 0)
        word = lax.broadcasted_iota(jnp.int32, (tile_n, wpr), 1)
        bit = lane % 32
        sel = (lane // 32) == word
        pow_lo = jnp.exp2(bit.astype(jnp.float32))
        pow_hi = jnp.exp2((bit - 16).astype(jnp.float32))
        w_lo = jnp.where(sel & (bit < 16), pow_lo, 0.0)
        w_hi = jnp.where(sel & (bit >= 16), pow_hi, 0.0)
        lo = lax.dot_general(
            mf, w_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hi = lax.dot_general(
            mf, w_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Mosaic lacks f32->u32 casts; go through i32 (values < 2^16)
        lo_i = lo.astype(jnp.int32)
        hi_i = hi.astype(jnp.int32)
        words = (lo_i | (hi_i << 16)).astype(jnp.uint32)
        out_ref[0] = words

    return kernel


@lru_cache(maxsize=None)
def _extract_pallas_fn(
    differences: int,
    indels: bool,
    ignore_genes: bool,
    exclude_self: bool,
    lpad: int,
    tile_m: int,
    tile_n: int,
    n_tiles: int,
    k: int,
    interpret: bool = False,
    indel_only: bool = False,
    use_key: bool = False,
):
    """Packed-word extraction for one slab: the Pallas kernel emits
    [n_tiles, TM, TN/32] uint32 match words; the fused XLA epilogue
    compacts the nonzero words into a fixed [k] record buffer — one
    device dispatch, O(matched words) download."""
    kernel = _make_extract_kernel(
        differences=differences,
        indels=indels,
        ignore_genes=ignore_genes,
        exclude_self=exclude_self,
        lpad=lpad,
        tile_m=tile_m,
        tile_n=tile_n,
        indel_only=indel_only,
        use_key=use_key,
    )
    wpr = tile_n // 32

    def a_spec(width):
        return pl.BlockSpec(
            (tile_m, width),
            index_map=lambda i, rows, cols: (rows[i], 0),
            memory_space=pltpu.VMEM,
        )

    def bT_spec(height):
        return pl.BlockSpec(
            (height, tile_n),
            index_map=lambda i, rows, cols: (0, cols[i]),
            memory_space=pltpu.VMEM,
        )

    def b_row_spec(width):
        return pl.BlockSpec(
            (tile_n, width),
            index_map=lambda i, rows, cols: (cols[i], 0),
            memory_space=pltpu.VMEM,
        )

    def a_dummy(width):
        return pl.BlockSpec(
            (tile_m, width),
            index_map=lambda i, rows, cols: (0, 0),
            memory_space=pltpu.VMEM,
        )

    def b_row_dummy(width):
        return pl.BlockSpec(
            (tile_n, width),
            index_map=lambda i, rows, cols: (0, 0),
            memory_space=pltpu.VMEM,
        )

    def aT_spec(height):
        # a-side scalars live as [1, N] rows (see _gather_sparse_fn);
        # the kernel transposes the (1, TM) block in VMEM
        return pl.BlockSpec(
            (height, tile_m),
            index_map=lambda i, rows, cols: (0, rows[i]),
            memory_space=pltpu.VMEM,
        )

    if use_key:
        in_specs = [
            a_spec(lpad),  # a_seq
            a_spec(lpad) if indels else a_dummy(lpad),  # a_rseq
            aT_spec(1),  # a_key
            aT_spec(1),  # a_orig
            b_row_spec(lpad),  # b_seq
            b_row_spec(lpad) if indels else b_row_dummy(lpad),  # b_rseq
            bT_spec(1),  # b_key
            bT_spec(1),  # b_orig
        ]
    else:
        in_specs = [
            a_spec(lpad),  # a_seq
            a_spec(lpad) if indels else a_dummy(lpad),  # a_rseq
            aT_spec(1),  # a_len
            aT_spec(1),  # a_v
            aT_spec(1),  # a_j
            aT_spec(1),  # a_orig
            b_row_spec(lpad),  # b_seq
            b_row_spec(lpad) if indels else b_row_dummy(lpad),  # b_rseq
            bT_spec(1),  # b_len
            bT_spec(1),  # b_v
            bT_spec(1),  # b_j
            bT_spec(1),  # b_orig
        ]
    _keys, scr_shapes = _cached_scratch_shapes(
        indels, indel_only, lpad, tile_n
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_m, wpr),
            index_map=lambda i, rows, cols: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scr_shapes if use_key else [],
    )

    pall = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, tile_m, wpr), jnp.uint32
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(rows, cols, *args):
        words = pall(rows, cols, *args)
        flat = words.reshape(-1)
        # two-level compaction: jnp.nonzero costs ~9 ms per million
        # input elements on TPU, so run it on a 32x-reduced "block has
        # any nonzero word" bitmap first, then on the gathered blocks
        # only. Records (ascending flat indices + word values) are
        # identical to a direct nonzero over flat.
        blocks = flat.reshape(-1, 32)
        flags = jnp.any(blocks != 0, axis=1)
        bcnt = jnp.sum(flags.astype(jnp.int32))
        (bidx,) = jnp.nonzero(flags, size=k, fill_value=0)
        sub = jnp.take(blocks, bidx, axis=0)  # [k, 32]
        # rows past bcnt replay block bidx[0]=0 (fill_value) whose
        # words may be real matches — mask them out
        sub = jnp.where(
            jnp.arange(k, dtype=jnp.int32)[:, None] < bcnt, sub, 0
        )
        subf = sub.reshape(-1)
        count = jnp.sum((subf != 0).astype(jnp.int32))
        (p2,) = jnp.nonzero(subf, size=k, fill_value=0)
        vals = jnp.take(subf, p2)
        idx = bidx[p2 // 32] * 32 + (p2 % 32)
        return idx.astype(jnp.int32), vals, count

    return run


def extract_tiles_pallas(
    pa: dict,
    pb: dict,
    slab: np.ndarray,
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    exclude_self: bool,
    tile_m: int,
    tile_n: int,
    k: int,
    interpret: bool = False,
    indel_only: bool = False,
):
    """Dispatch one padded extraction slab; returns device
    (word_indices, word_bits, count)."""
    lpad = pa["seqs"].shape[1]
    dev = _device_of(pa["seqs"])
    use_key = (
        pa.get("key32") is not None and pb.get("key32") is not None
    )
    fn = _extract_pallas_fn(
        differences, indels, ignore_genes, exclude_self,
        lpad, tile_m, tile_n, int(len(slab)), k, interpret, indel_only,
        use_key,
    )
    rows = jax.device_put((slab[:, 0] // tile_m).astype(np.int32), dev)
    cols = jax.device_put((slab[:, 1] // tile_n).astype(np.int32), dev)
    a_rseq = pa["rseqs"] if indels else _dummy_i8((tile_m, lpad), dev)
    b_rseq = pb["rseqs"] if indels else _dummy_i8((tile_n, lpad), dev)
    if use_key:
        return fn(
            rows, cols,
            pa["seqs"], a_rseq, pa["key32"], pa["orig"],
            pb["seqs"], b_rseq, pb["key32"], pb["orig"],
        )
    return fn(
        rows, cols,
        pa["seqs"], a_rseq, pa["len"], pa["v"], pa["j"], pa["orig"],
        pb["seqs"], b_rseq, pb["len"], pb["v"],
        pb["j"], pb["orig"],
    )


MAX_TILES_PER_CALL = 1 << 16  # scalar-prefetch rows+cols must fit SMEM


def _pad_target(c: int, minimum: int) -> int:
    """Padded grid size for a dispatch chunk: pow2 up to 2048, then
    multiples of max(minimum, 256) — bounds the set of compiled grid
    sizes while capping padding waste at ~6% (pow2 alone wastes up to
    2x: a 3.2k-tile dense worklist padded to 4096 ran 29% dummy
    programs; the persistent compile cache absorbs the finer ladder).
    `minimum` also sets the step, so the count kernel's 1024-multiple
    output-block constraint holds on its path (minimum=1024)."""
    t = max(minimum, c, 1)
    if t <= 2048:
        return max(minimum, 1 << (t - 1).bit_length())
    step = max(minimum, 256)
    return -(-t // step) * step


def _chunk_worklist(work: np.ndarray, tile_m: int, tile_n: int,
                    npad_a: int, npad_b: int, minimum: int):
    """Split a worklist into dispatch chunks of at most
    MAX_TILES_PER_CALL tiles, padded to the _pad_target ladder with
    dummy tiles aimed at the all-pad rows. Bounds both the SMEM
    scalar-prefetch footprint and the set of compiled grid sizes."""
    dummy = np.array([[npad_a - tile_m, npad_b - tile_n]], dtype=np.int32)
    w = len(work)
    chunks = []
    s0 = 0
    while s0 < w or not chunks:
        chunk = work[s0 : s0 + MAX_TILES_PER_CALL]
        c = len(chunk)
        target = (
            MAX_TILES_PER_CALL
            if (w - s0) > MAX_TILES_PER_CALL
            else _pad_target(c, minimum)
        )
        if c < target:
            chunk = np.concatenate(
                [chunk, np.repeat(dummy, target - c, axis=0)]
            )
        chunks.append((chunk, c))
        s0 += MAX_TILES_PER_CALL
    return chunks


def count_tiles_pallas(
    pa: dict,
    pb: dict,
    work: np.ndarray,
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    exclude_self: bool,
    tile_m: int,
    tile_n: int,
    interpret: bool = False,
    indel_only: bool = False,
) -> np.ndarray:
    """Per-tile match counts over an (unpadded) worklist of element
    starts, chunked to keep the scalar-prefetch arrays within SMEM.
    Returns a host int32[len(work)] array."""
    lpad = pa["seqs"].shape[1]
    npad_a = pa["seqs"].shape[0]
    npad_b = pb["seqs"].shape[0]
    dev = _device_of(pa["seqs"])
    a_rseq = pa["rseqs"] if indels else _dummy_i8((tile_m, lpad), dev)
    b_rseq = pb["rseqs"] if indels else _dummy_i8((tile_n, lpad), dev)
    use_key = (
        pa.get("key32") is not None and pb.get("key32") is not None
    )
    if use_key:
        args = (
            pa["seqs"], a_rseq, pa["key32"], pa["orig"],
            pb["seqs"], b_rseq, pb["key32"], pb["orig"],
        )
    else:
        args = (
            pa["seqs"], a_rseq, pa["len"], pa["v"], pa["j"], pa["orig"],
            pb["seqs"], b_rseq, pb["len"], pb["v"],
            pb["j"], pb["orig"],
        )
    outs = []
    for chunk, c in _chunk_worklist(
        work, tile_m, tile_n, npad_a, npad_b, 1024
    ):
        fn = _count_pallas_fn(
            differences, indels, ignore_genes, exclude_self,
            lpad, tile_m, tile_n, int(len(chunk)), interpret, indel_only,
            use_key,
        )
        rows = jax.device_put((chunk[:, 0] // tile_m).astype(np.int32), dev)
        cols = jax.device_put((chunk[:, 1] // tile_n).astype(np.int32), dev)
        outs.append((fn(rows, cols, *args), c))
    return np.concatenate([np.asarray(o)[:c] for o, c in outs])


RES_PER_WORD = 6  # 5-bit residues per int32 word (values < 32)


def _pack_residues(seqs_i8: np.ndarray) -> np.ndarray:
    """Host half of the residue compression: 6 five-bit residues per
    int32 word, cutting the dominant host->device transfer ~4x vs the
    int8 layout at lmax 24. All residue codes (aa 0..20 incl. pad, nt
    0..4) fit 5 bits."""
    n, l = seqs_i8.shape
    nw = -(-l // RES_PER_WORD)
    grown = np.zeros((n, nw * RES_PER_WORD), dtype=np.uint32)
    grown[:, :l] = seqs_i8.astype(np.uint32)
    g = grown.reshape(n, nw, RES_PER_WORD)
    packed = g[:, :, 0].copy()
    for k in range(1, RES_PER_WORD):
        packed |= g[:, :, k] << np.uint32(5 * k)
    return packed.astype(np.int32)


def _packed_upload(db, m: int, lpad: int, pad_val: int) -> np.ndarray:
    """[m, nw] int32 packed residues for upload: native single pass
    when available, else the staging-copy + numpy pack."""
    from ..io.native import pack5_rows_native

    nw = -(-lpad // RES_PER_WORD)
    nat = pack5_rows_native(db.seqs, m, lpad, nw, pad_val)
    if nat is not None:
        return nat
    n = db.n
    seqs = np.full((m, lpad), pad_val, dtype=np.int8)
    if n:
        seqs[:n, : db.seqs.shape[1]] = db.seqs
    return _pack_residues(seqs)


def _unpack_residues(packed, lmax: int):
    """Device half: [N, nw] int32 -> [N, lmax] int8."""
    npad, nw = packed.shape
    shifts = (jnp.arange(RES_PER_WORD, dtype=jnp.int32) * 5).reshape(
        1, 1, RES_PER_WORD
    )
    res = ((packed[:, :, None] >> shifts) & 31).astype(jnp.int8)
    return res.reshape(npad, nw * RES_PER_WORD)[:, :lmax]


_DERIVE_CHUNK = 1 << 21  # rows per derive step: bounds int32 temps

# Precompute one-hot residue rows in HBM for the dense kernel when the
# padded set fits the budget (NCLASS*lpad ~ 504 bytes/row: 11.4 GiB at
# Keck's 24.3M padded rows). Removes the dominant per-tile VPU cost
# (the in-kernel one-hot rebuild, done twice per tile and redone for
# the same block by every tile that touches it); above the budget the
# dense path falls back to the in-kernel build. The budget is derived
# from the device's HBM limit (~78%, leaving room for the residue
# rows, scalars, staging and matmul workspace — a Keck self-compare
# measures ~1.7 GB of non-one-hot arrays); COMPAIRR_OH_BYTES_MAX
# overrides the byte budget, COMPAIRR_OH_ROWS_MAX a row cap.


def _oh_bytes_budget() -> int:
    env = __import__("os").environ.get("COMPAIRR_OH_BYTES_MAX")
    if env is not None:
        return int(env)
    limit = 0
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
    except Exception:
        limit = 0
    if limit <= 0:
        limit = 16_000_000_000  # v5e HBM; conservative default
    return int(limit * 0.78)


def _ohp(lpad: int) -> int:
    """HBM one-hot row width, padded to the 128-lane tiling so the v3
    kernel's manual DMA slices stay aligned (Mosaic requires lane-dim
    DMA slices in 128 multiples). The pad lanes are zero on every row,
    so Hamming matmuls over the full padded width are exact."""
    return ((NCLASS * lpad + 127) // 128) * 128


def _oh_fits(npad: int, lpad: int, budget_scale: float = 1.0) -> bool:
    """True when a set's HBM one-hot rows fit the device budget.
    budget_scale < 1 shares the budget between two distinct sets."""
    env_rows = __import__("os").environ.get("COMPAIRR_OH_ROWS_MAX")
    if env_rows is not None and npad > int(env_rows):
        return False
    return npad * _ohp(lpad) <= _oh_bytes_budget() * budget_scale


def _onehot_rows_chunk(seqs_c, nclass: int):
    """[rows, L] int8 -> [rows, _ohp(L)] int8 one-hot, feature (c, l)
    at lane c*L + l — the exact layout _onehot builds in-kernel, so
    HBM-precomputed and in-kernel operands are interchangeable; lanes
    beyond nclass*L are zero padding (see _ohp)."""
    rows, lpad = seqs_c.shape
    cls = lax.broadcasted_iota(jnp.int32, (1, nclass, 1), 1)
    oh = (seqs_c[:, None, :].astype(jnp.int32) == cls).astype(jnp.int8)
    oh = oh.reshape(rows, nclass * lpad)
    pad = _ohp(lpad) - nclass * lpad
    if pad:
        oh = jnp.pad(oh, ((0, 0), (0, pad)))
    return oh


def _onehot_rows(seqs_s, nclass: int):
    """Chunked HBM one-hot derive (the compare's int32 temporaries are
    4x the output; chunking bounds them at scale)."""
    npad = seqs_s.shape[0]
    lpad = seqs_s.shape[1]
    c = _DERIVE_CHUNK >> 2  # one-hot rows are ~21x wider than residues
    if npad <= c:
        return _onehot_rows_chunk(seqs_s, nclass)
    nchunks = -(-npad // c)

    def body(i, buf):
        start = jnp.minimum(i * c, npad - c)
        s = lax.dynamic_slice_in_dim(seqs_s, start, c)
        return lax.dynamic_update_slice(
            buf, _onehot_rows_chunk(s, nclass), (start, 0)
        )

    init = jnp.zeros((npad, _ohp(lpad)), jnp.int8)
    return lax.fori_loop(0, nchunks, body, init)


def _seqs_chunk(seqs_packed, lengths_c, order_c, pad_val: int, lmax: int,
                with_rseqs: bool = True):
    """Gather + unpack (+ per-row reversal) for one row chunk."""
    seqs = _unpack_residues(jnp.take(seqs_packed, order_c, axis=0), lmax)
    if not with_rseqs:
        return seqs, None
    pos = jnp.arange(lmax, dtype=jnp.int32)[None, :]
    idx = jnp.clip(lengths_c[:, None] - 1 - pos, 0, lmax - 1)
    rev = jnp.take_along_axis(seqs, idx, axis=1)
    rseqs = jnp.where(
        pos < lengths_c[:, None], rev, jnp.int8(pad_val)
    ).astype(jnp.int8)
    return seqs, rseqs


def _gathered_seqs(seqs_packed, lengths_s, order, pad_val: int, lmax: int,
                   with_rseqs: bool = True):
    """Sorted residue matrices (+ reversed rows when the indel check
    needs them), derived in fixed-size row chunks: the
    gather/unpack/reversal temporaries are int32 [rows, lmax], which
    at tens of millions of rows would otherwise exceed HBM in one shot
    (the 24M-sequence OOM)."""
    npad = order.shape[0]
    if npad <= _DERIVE_CHUNK:
        s, r = _seqs_chunk(
            seqs_packed, lengths_s, order, pad_val, lmax, with_rseqs
        )
        return s, r
    c = _DERIVE_CHUNK
    nchunks = -(-npad // c)

    def body(i, bufs):
        sb, rb = bufs
        start = jnp.minimum(i * c, npad - c)
        o = lax.dynamic_slice_in_dim(order, start, c)
        lens = lax.dynamic_slice_in_dim(lengths_s, start, c)
        s, r = _seqs_chunk(seqs_packed, lens, o, pad_val, lmax, with_rseqs)
        sb = lax.dynamic_update_slice(sb, s, (start, 0))
        if with_rseqs:
            rb = lax.dynamic_update_slice(rb, r, (start, 0))
        return sb, rb

    init = (
        jnp.zeros((npad, lmax), jnp.int8),
        jnp.zeros((npad if with_rseqs else 1, lmax), jnp.int8),
    )
    seqs, rseqs = lax.fori_loop(0, nchunks, body, init)
    return seqs, (rseqs if with_rseqs else None)


@lru_cache(maxsize=None)
def _gather_derive_fn(pad_val: int, lmax: int, with_indels: bool,
                      with_oh: bool = False):
    """Device-side bucket sort + layout derivation from the raw
    (unsorted) upload. The host only computes the argsort permutation
    and the 5-bit residue packing; the row gather, residue unpack,
    per-row reversal, transposes, and the [Np,1]/[1,Np] scalar layouts
    happen on device. This keeps the host->device transfer minimal and
    lets it overlap the host-side key sort (the transfer over the TPU
    tunnel is the end-to-end bottleneck, 30-100 MB/s)."""

    @jax.jit
    def f(seqs_packed, lengths, v, j, rep, cnt, order):
        # raw arrays carry one trailing sentinel row/element (all-pad
        # sequence, length/v/j/rep = -1, count = 0); `order` maps every
        # padded output row to a source row, pads pointing at the
        # sentinel.
        npad = order.shape[0]
        lengths_s = jnp.take(lengths.astype(jnp.int32), order)
        v_s = jnp.take(v.astype(jnp.int32), order)
        j_s = jnp.take(j.astype(jnp.int32), order)
        rep_s = jnp.take(rep.astype(jnp.int32), order)
        cnt_s = jnp.take(cnt.astype(jnp.float32), order)
        seqs_s, rseqs = _gathered_seqs(
            seqs_packed, lengths_s, order, pad_val, lmax, with_indels
        )
        row = lambda x: x.reshape(1, npad)
        scal = dict(
            len=row(lengths_s), v=row(v_s), j=row(j_s),
            rep=row(rep_s), cnt=row(cnt_s),
        )
        # both sides consume the same row layouts (the indel
        # prefix/suffix check is MXU matmuls over row-major one-hots,
        # _first_mismatch — no transposed copies exist any more)
        a = dict(
            seqs=seqs_s,
            rseqs=rseqs if with_indels else None,
            **scal,
        )
        if with_oh:
            a["oh"] = _onehot_rows(seqs_s, NCLASS)
        b = dict(a)
        return a, b

    return f


@lru_cache(maxsize=None)
def _gather_sparse_key_fn(pad_val: int, lmax: int, with_indels: bool):
    """Key-fused sparse derive: when the fused bucket key fits int32
    (the production case), the key row itself carries the per-row
    length in its low 16 bits, so the lengths/v/j uploads are skipped
    entirely (~20% of the Keck host->device bytes; the tunnel transfer
    is the end-to-end bottleneck). Pad rows' key-derived "lengths" are
    garbage, which is harmless: their residue rows are all-pad (any
    reversal is still all-pad) and the salted pad-band keys never pass
    the kernels' key-distance test."""

    @jax.jit
    def f(seqs_packed, key_row, sentinel, order):
        npad = order.shape[0]
        lengths_s = jnp.clip(
            (key_row.reshape(npad) & 0xFFFF).astype(jnp.int32), 0, lmax
        )
        seqs_s, rseqs = _gathered_seqs(
            seqs_packed, lengths_s, order, pad_val, lmax, with_indels
        )
        orig_s = jnp.where(order >= sentinel, jnp.int32(-1), order)
        pa = dict(
            seqs=seqs_s,
            rseqs=rseqs if with_indels else None,
            key32=key_row,
            orig=orig_s.reshape(1, npad),
        )
        pb = dict(pa)
        return pa, pb

    return f


@lru_cache(maxsize=None)
def _gather_sparse_fn(pad_val: int, lmax: int, with_indels: bool):
    """Sparse-path derive: the [Np,1]/[1,Np] layouts the Pallas
    count/extract kernels consume, from one raw (packed) upload.
    `orig` is derived on device from the order permutation itself
    (pads point at the sentinel index, a traced scalar), not uploaded.
    Reversed rows exist only when the indel check needs them — at 24M
    sequences they are ~0.6 GB of HBM."""

    @jax.jit
    def f(seqs_packed, lengths, v, j, sentinel, order):
        npad = order.shape[0]
        lengths_s = jnp.take(lengths.astype(jnp.int32), order)
        seqs_s, rseqs = _gathered_seqs(
            seqs_packed, lengths_s, order, pad_val, lmax, with_indels
        )
        v_s = jnp.take(v.astype(jnp.int32), order)
        j_s = jnp.take(j.astype(jnp.int32), order)
        orig_s = jnp.where(order >= sentinel, jnp.int32(-1), order)
        # both sides share [1, N] scalar rows: Mosaic pads [N, 1]
        # operands to T(8,128) lanes — a 128x HBM expansion (12 GB per
        # scalar at 24M rows); [1, N] pads sublanes only (8x) and the
        # kernels transpose the tiny (1, T) block in VMEM
        row = lambda x: x.reshape(1, npad)
        scal = dict(
            len=row(lengths_s), v=row(v_s), j=row(j_s), orig=row(orig_s)
        )
        pa = dict(
            seqs=seqs_s,
            rseqs=rseqs if with_indels else None,
            **scal,
        )
        pb = dict(pa)
        return pa, pb

    return f


def _canon_src(n: int) -> int:
    """Canonical raw-upload row count (see engine.canon_rows)."""
    from .engine import canon_rows

    return canon_rows(n, 1024)


_KEY_FUSE_MAX = 1 << 29  # real keys must stay below the pad-key band


def device_rows_raw(db, order: np.ndarray, npad: int, lpad: int,
                    indels: bool = True,
                    sort_key: Optional[np.ndarray] = None,
                    pad_salt: int = 0):
    """Upload a SeqDB's raw arrays and derive the sorted layouts on
    device — the sparse-path twin of device_args_raw. Returns
    (pallas_a_dict, pallas_b_dict); with indels=False the reversed and
    transposed residue layouts are None (the kernels take dummy
    blocks).

    `sort_key` (pack_keys' sorted padded key vector) additionally
    uploads an int32 [1, npad] "key32" row when every real key fits
    below 2^29: the count/extract kernels then replace the
    length/v/j/validity mask chain with ONE key compare (equal keys =
    match precondition; |difference| == 1 = one-indel length
    tolerance). Pad rows get unique keys spaced 4 apart in a band far
    above the real keys; `pad_salt` (0 for set 1, 2 for set 2) offsets
    the two sets' pad bands so cross-set pad differences are always
    2 mod 4 — never 0 or +-1 — and no pad ever key-matches anything,
    with no separate validity mask."""
    n = db.n
    pad_val = int(db.pad_value)
    m = _canon_src(n + 1)
    order_full = np.full(npad, n, dtype=np.int32)
    order_full[:n] = order
    dev = jax.device_put
    if sort_key is not None and (
        n == 0 or int(sort_key[:n].max()) < _KEY_FUSE_MAX
    ):
        from .engine import _PhaseTimer

        tm = _PhaseTimer()
        tm.mark()
        k32 = np.empty(npad, dtype=np.int32)
        k32[:n] = sort_key[:n]
        # band starts at MAX+2 so even a real key of exactly MAX-1 is
        # at distance >= 3 from every pad key (distance 1 would make a
        # pad an indel candidate whose garbage minlen trivially matches)
        k32[n:] = (_KEY_FUSE_MAX + 2 + pad_salt) + 4 * np.arange(
            npad - n, dtype=np.int32
        )
        tm.lap("host_prep")
        pu = _packed_upload(db, m, lpad, pad_val)
        tm.lap("host_pack")
        d_pu = dev(pu)
        d_k32 = dev(k32.reshape(1, npad))
        d_ord = dev(order_full)
        tm.lap("puts")
        # key-fused derive: the key row carries the lengths, so the
        # lengths/v/j uploads are skipped (see _gather_sparse_key_fn)
        pa, pb = _gather_sparse_key_fn(pad_val, lpad, indels)(
            d_pu, d_k32, jnp.int32(n), d_ord,
        )
        tm.lap("derive_enqueue")
        tm.report(f"device_rows_raw n={n}")
        return dict(pa), dict(pb)
    pa, pb = _gather_sparse_fn(pad_val, lpad, indels)(
        dev(_packed_upload(db, m, lpad, pad_val)),
        dev(_shrink(db.lengths, -1, m)),
        dev(_shrink(db.v_no, -1, m)),
        dev(_shrink(db.j_no, -1, m)),
        jnp.int32(n),
        dev(order_full),
    )
    return dict(pa), dict(pb)


def _shrink(x: np.ndarray, sentinel: int, m: int) -> np.ndarray:
    """Pad to the canonical length with sentinels and downcast to
    int16 when the values fit — halves the per-sequence scalar
    transfer."""
    out = np.full(m, sentinel, dtype=np.int64)
    out[: len(x)] = x
    if out.min() >= -32768 and out.max() < 32768:
        return out.astype(np.int16)
    return out.astype(np.int32)


def device_args_raw(db, order: np.ndarray, npad: int, lpad: int,
                    indels: bool = True,
                    sort_key: Optional[np.ndarray] = None,
                    oh_budget_scale: float = 1.0) -> dict:
    """Upload a SeqDB's raw arrays (plus one sentinel row) and derive
    the sorted kernel layouts on device (see _gather_derive_fn).
    `order` is pack_keys' permutation; padding rows map to the
    sentinel. Substitution-only sets within the _oh_fits HBM budget
    also get HBM-precomputed one-hot rows ("oh") for the v2 dense
    kernel; "cmax" carries the host-side count maximum for its
    byte-split eligibility check. `sort_key` (pack_keys' sorted padded
    key vector) uploads as an int32 [1, npad] row ("key32", pads -1)
    when it fits — the v2 kernel's one-compare match precondition.
    oh_budget_scale shares the one-hot budget across two distinct
    sets (engine.dense_matrix passes 0.5 for two-file runs)."""
    n = db.n
    pad_val = int(db.pad_value)
    m = _canon_src(n + 1)
    cnt = np.zeros(m, dtype=np.float32)
    cnt[:n] = db.counts
    order_full = np.full(npad, n, dtype=np.int32)
    order_full[:n] = order
    dev = jax.device_put
    with_oh = (not indels) and _oh_fits(npad, lpad, oh_budget_scale)
    a, b = _gather_derive_fn(pad_val, lpad, indels, with_oh)(
        dev(_packed_upload(db, m, lpad, pad_val)),
        dev(_shrink(db.lengths, -1, m)),
        dev(_shrink(db.v_no, -1, m)),
        dev(_shrink(db.j_no, -1, m)),
        dev(_shrink(db.rep_no, -1, m)),
        dev(cnt),
        dev(order_full),
    )
    a, b = dict(a), dict(b)
    a["cmax"] = b["cmax"] = float(db.counts.max()) if n else 0.0
    # key32 is independent of the one-hot budget: the cached-operand
    # v2c kernel consumes it on runs whose one-hots do NOT fit HBM
    # (and on indel runs, where pad keys are plain -1 — the dense
    # kernels zero pad contributions via the all-zero repertoire
    # one-hot rows, so no salted pad band is needed)
    if sort_key is not None and (
        n == 0 or int(sort_key[:n].max()) < (1 << 31)
    ):
        k32 = np.full(npad, -1, dtype=np.int32)
        k32[:n] = sort_key[:n]
        a["key32"] = b["key32"] = dev(k32.reshape(1, npad))
        if with_oh:
            # packed per-row scalars for the v3 kernel's DMA ring: one
            # [4, npad] int32 operand per side (key / rep / count /
            # zero pad — DMA sublane slices need 4-multiples) instead
            # of three separate rows. Counts are parser-validated
            # integers, so the int32 round trip is exact.
            rep_i = np.full(npad, -1, dtype=np.int32)
            rep_i[:n] = db.rep_no[order]
            cnt_i = np.zeros(npad, dtype=np.int32)
            cnt_i[:n] = np.asarray(db.counts[order], dtype=np.int64)
            a["scal4"] = b["scal4"] = dev(
                np.stack(
                    [k32, rep_i, cnt_i, np.zeros(npad, np.int32)]
                ).astype(np.int32)
            )
    return {"a": a, "b": b}


def dense_matrix_pallas(
    a_dev: dict,
    b_dev: dict,
    work: np.ndarray,
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    score_int: int,
    ignore_counts: bool,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    interpret: bool = False,
):
    """Run the dense accumulation over an (unpadded) worklist of
    element starts with the Pallas kernel, chunked to keep the
    scalar-prefetch arrays within SMEM; per-chunk partial matrices are
    summed."""
    lpad = a_dev["seqs"].shape[1]
    npad_a = a_dev["seqs"].shape[0]
    npad_b = b_dev["seqs"].shape[0]
    acc = None
    for chunk, _c in _chunk_worklist(
        _order_colmajor(work), tile_m, tile_n, npad_a, npad_b, 64
    ):
        part = _dense_pallas_chunk(
            a_dev, b_dev, chunk,
            differences=differences, indels=indels,
            ignore_genes=ignore_genes, score_int=score_int,
            ignore_counts=ignore_counts, tile_m=tile_m, tile_n=tile_n,
            r1p=r1p, r2p=r2p, interpret=interpret,
        )
        acc = part if acc is None else acc + part
    return acc


def dense_matrix_pallas_prepared(
    a_dev: dict,
    b_dev: dict,
    work: np.ndarray,
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    score_int: int,
    ignore_counts: bool,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    interpret: bool = False,
):
    """One-time prep (chunk split, worklist upload, kernel build) for
    repeated dispatch of the same dense accumulation — the benchmark's
    sustained-throughput path. Returns a zero-arg callable that queues
    the full worklist asynchronously and returns the per-chunk partial
    device matrices (sum them for the result)."""
    lpad = a_dev["seqs"].shape[1]
    npad_a = a_dev["seqs"].shape[0]
    npad_b = b_dev["seqs"].shape[0]
    dev = _device_of(a_dev["seqs"])
    kind = _dense_kernel_kind(
        a_dev, b_dev,
        indels=indels, score_int=score_int, ignore_counts=ignore_counts,
        r1p=r1p, tile_n=tile_n, tile_m=tile_m,
    )
    if kind != "v1":
        cmax = max(a_dev.get("cmax", 0.0), b_dev.get("cmax", 0.0))
        chains = _v2_chains(score_int, ignore_counts, cmax)
        wmax = _v2_weight_max(chains, cmax)
        int8_s1 = wmax <= 127
        run_cap = _v2_run_cap(tile_m, wmax)
        a_hbm = (not indels) and a_dev.get("oh") is not None
    prepared = []
    for chunk, _c in _chunk_worklist(
        _order_colmajor(work), tile_m, tile_n, npad_a, npad_b, 64
    ):
        rows = jax.device_put(
            (chunk[:, 0] // tile_m).astype(np.int32), dev
        )
        cols = jax.device_put(
            (chunk[:, 1] // tile_n).astype(np.int32), dev
        )
        if kind == "v3":
            fn0 = _dense_v3_fn(
                differences, chains, lpad, tile_m, tile_n, r1p, r2p,
                int(len(chunk)), _V3_DEPTH, interpret, int8_s1,
            )
            flush = jax.device_put(_flush_flags(chunk, run_cap), dev)

            def fn(r, c, *a, _f=fn0, _fl=flush):
                return _f(r, c, _fl, *a)

            args = (
                a_dev["oh"], a_dev["scal4"],
                b_dev["oh"], b_dev["scal4"],
            )
            prepared.append((fn, rows, cols, args))
            continue
        if kind == "v2":
            fn0 = _dense_v2_fn(
                differences, chains,
                lpad, tile_m, tile_n, r1p, r2p, int(len(chunk)),
                interpret, int8_s1,
            )
            flush = jax.device_put(_flush_flags(chunk, run_cap), dev)

            def fn(r, c, *a, _f=fn0, _fl=flush):
                return _f(r, c, _fl, *a)

            args = (
                a_dev["oh"], a_dev["key32"], a_dev["rep"], a_dev["cnt"],
                b_dev["oh"], b_dev["key32"], b_dev["rep"], b_dev["cnt"],
            )
        elif kind == "v2c":
            fn0 = _dense_v2c_fn(
                differences, indels, chains,
                lpad, tile_m, tile_n, r1p, r2p, int(len(chunk)),
                interpret, int8_s1, a_hbm,
            )
            flush = jax.device_put(_flush_flags(chunk, run_cap), dev)

            def fn(r, c, *a, _f=fn0, _fl=flush):
                return _f(r, c, _fl, *a)

            args = (
                a_dev["oh"] if a_hbm else a_dev["seqs"],
                a_dev["rseqs"] if indels
                else _dummy_i8((tile_m, lpad), dev),
                a_dev["key32"], a_dev["rep"], a_dev["cnt"],
                b_dev["seqs"],
                b_dev["rseqs"] if indels
                else _dummy_i8((tile_n, lpad), dev),
                b_dev["key32"], b_dev["rep"], b_dev["cnt"],
            )
        else:
            fn = _dense_pallas_fn(
                differences, indels, ignore_genes, score_int,
                ignore_counts, lpad, tile_m, tile_n, r1p, r2p,
                int(len(chunk)), interpret,
            )
            a_rseq = (
                a_dev["rseqs"] if indels
                else _dummy_i8((tile_m, lpad), dev)
            )
            b_rseq = (
                b_dev["rseqs"] if indels
                else _dummy_i8((tile_n, lpad), dev)
            )
            args = (
                a_dev["seqs"], a_rseq, a_dev["len"], a_dev["v"],
                a_dev["j"], a_dev["rep"], a_dev["cnt"],
                b_dev["seqs"], b_rseq, b_dev["len"], b_dev["v"],
                b_dev["j"], b_dev["rep"], b_dev["cnt"],
            )
        prepared.append((fn, rows, cols, args))

    def run():
        return [f(r, c, *a) for f, r, c, a in prepared]

    return run


def _dense_pallas_chunk(
    a_dev: dict,
    b_dev: dict,
    work: np.ndarray,
    *,
    differences: int,
    indels: bool,
    ignore_genes: bool,
    score_int: int,
    ignore_counts: bool,
    tile_m: int,
    tile_n: int,
    r1p: int,
    r2p: int,
    interpret: bool = False,
):
    lpad = a_dev["seqs"].shape[1]
    rows = (work[:, 0] // tile_m).astype(np.int32)
    cols = (work[:, 1] // tile_n).astype(np.int32)
    dev = _device_of(a_dev["seqs"])
    kind = _dense_kernel_kind(
        a_dev, b_dev,
        indels=indels, score_int=score_int, ignore_counts=ignore_counts,
        r1p=r1p, tile_n=tile_n, tile_m=tile_m,
    )
    if kind != "v1":
        cmax = max(a_dev.get("cmax", 0.0), b_dev.get("cmax", 0.0))
        chains = _v2_chains(score_int, ignore_counts, cmax)
        wmax = _v2_weight_max(chains, cmax)
        int8_s1 = wmax <= 127
        flush = jax.device_put(
            _flush_flags(work, _v2_run_cap(tile_m, wmax)), dev
        )
        if kind == "v3":
            fn = _dense_v3_fn(
                differences, chains, lpad, tile_m, tile_n, r1p, r2p,
                int(len(rows)), _V3_DEPTH, interpret, int8_s1,
            )
            return fn(
                jax.device_put(rows, dev),
                jax.device_put(cols, dev),
                flush,
                a_dev["oh"], a_dev["scal4"],
                b_dev["oh"], b_dev["scal4"],
            )
        if kind == "v2":
            fn = _dense_v2_fn(
                differences, chains,
                lpad, tile_m, tile_n, r1p, r2p, int(len(rows)),
                interpret, int8_s1,
            )
            return fn(
                jax.device_put(rows, dev),
                jax.device_put(cols, dev),
                flush,
                a_dev["oh"],
                a_dev["key32"],
                a_dev["rep"],
                a_dev["cnt"],
                b_dev["oh"],
                b_dev["key32"],
                b_dev["rep"],
                b_dev["cnt"],
            )
        a_hbm = (not indels) and a_dev.get("oh") is not None
        fn = _dense_v2c_fn(
            differences, indels, chains,
            lpad, tile_m, tile_n, r1p, r2p, int(len(rows)),
            interpret, int8_s1, a_hbm,
        )
        return fn(
            jax.device_put(rows, dev),
            jax.device_put(cols, dev),
            flush,
            a_dev["oh"] if a_hbm else a_dev["seqs"],
            a_dev["rseqs"] if indels
            else _dummy_i8((tile_m, lpad), dev),
            a_dev["key32"],
            a_dev["rep"],
            a_dev["cnt"],
            b_dev["seqs"],
            b_dev["rseqs"] if indels
            else _dummy_i8((tile_n, lpad), dev),
            b_dev["key32"],
            b_dev["rep"],
            b_dev["cnt"],
        )
    fn = _dense_pallas_fn(
        differences,
        indels,
        ignore_genes,
        score_int,
        ignore_counts,
        lpad,
        tile_m,
        tile_n,
        r1p,
        r2p,
        int(len(rows)),
        interpret,
    )
    a_rseq = a_dev["rseqs"] if indels else _dummy_i8((tile_m, lpad), dev)
    b_rseq = b_dev["rseqs"] if indels else _dummy_i8((tile_n, lpad), dev)
    return fn(
        jax.device_put(rows, dev),
        jax.device_put(cols, dev),
        a_dev["seqs"],
        a_rseq,
        a_dev["len"],
        a_dev["v"],
        a_dev["j"],
        a_dev["rep"],
        a_dev["cnt"],
        b_dev["seqs"],
        b_rseq,
        b_dev["len"],
        b_dev["v"],
        b_dev["j"],
        b_dev["rep"],
        b_dev["cnt"],
    )
