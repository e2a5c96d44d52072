"""Stream compaction of payload rows by a keep mask (TPU kernel).

The extraction front-end's dominant cost is the Morton sort over ALL N
rows (~7 ms device time at 4M on v5e) even though ~75-80% of rows are
below the ground pre-cut and never participate in clustering.  XLA has
no efficient stream compaction on TPU (nonzero+gather 49 ms,
cumsum+scatter 26 ms at 4M — scripts/profile_compaction.py), so this
kernel compacts the kept rows into a fixed-capacity [C] buffer in one
pass; the sort then runs at C ~= N/4 (~2 ms) and every downstream [N]
pass shrinks by the same factor.

The kernel is generic over the CHANNEL COUNT: the fast path routes the
two Morton code words (hi, lo); the exact-semantics path routes the raw
(x, y, z) coordinates bitcast to i32 (compact_rows_multi).  All
channels share one routing computation — extra channels only add the
per-stage partner fetch and their own staging DMA.

Algorithm, per sequential 32k-row block (as [256, 128] i32):

1. flat ranks of kept rows within each 1024-element (8, 128) tile:
   a 7-stage lane scan + 3-stage within-tile row scan (Hillis-Steele).
2. pack each tile's kept rows to its front with a 10-stage LSB-first
   XOR-butterfly (reverse-banyan) routing network: monotone
   rank-routing (concentration) is conflict-free on such a network
   (verified exhaustively in tests), so packing costs log2(1024)
   compare/roll stages instead of a log^2 bitonic sort.
3. sequential carry merge over the block's 32 tiles: each packed tile
   is flat-rotated by the carry fill (10 conditional constant-distance
   rotations) and OR-merged; full 1024-tiles are appended to a VMEM
   staging buffer (dynamic tile-aligned index) and staged tiles are
   DMA'd to the HBM output in double-buffered 32-tile chunks.

The kept rows appear in input order (the network is order-preserving),
though callers only need SOME order — a sort follows.  Capacity
overflow (count > C) drops the tail and is reported via the returned
count; rows past the count hold garbage and the caller masks them
(compact_rows masks with the Morton sentinel, compact_rows_multi with
zeros).

No reference-code analogue: the reference's pipeline (sklearn DBSCAN
over chunks, /root/reference/utils/tower_extraction.py:96-122) never
materializes a compacted above-ground set; this is a TPU-design
artifact of making the single fused sort cheap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 256            # rows per grid block
_BLOCK = _ROWS * _LANES  # 32768 elements
_TROWS = 8             # rows per (8,128) tile
_TILE = _TROWS * _LANES  # 1024 elements
_NTILES = _ROWS // _TROWS  # 32 tiles per block
_STAGE_TILES = 32      # staging buffer: DMA chunk, in tiles
_CHUNK = _STAGE_TILES * _TILE  # 32768 elements per DMA
_CH_ROWS = _STAGE_TILES * _TROWS  # staging rows per buffer


def _lane_iota():
    return lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)


def _row_iota():
    return lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)


def _fetch_partner(v, b):
    """value of each element's XOR-partner at distance 2^b (flat order
    within (8,128) tiles; b<7 lanes, b>=7 rows-within-tile)."""
    if b < 7:
        step = 1 << b
        bit = (_lane_iota() >> b) & 1
        up = pltpu.roll(v, shift=_LANES - step, axis=1)  # [i] = v[i+step]
        dn = pltpu.roll(v, shift=step, axis=1)           # [i] = v[i-step]
    else:
        step = 1 << (b - 7)
        bit = ((_row_iota() & (_TROWS - 1)) >> (b - 7)) & 1
        up = pltpu.roll(v, shift=_ROWS - step, axis=0)
        dn = pltpu.roll(v, shift=step, axis=0)
    # bit clear: partner above (i+step); bit set: partner below (i-step).
    # rolls that cross a tile boundary land on the discarded select arm.
    return jnp.where(bit == 0, up, dn), bit


def _tile_ranks(kb):
    """inclusive flat rank of set bits within each (8,128) tile of the
    [256,128] i32 0/1 block; also the per-row inclusive row totals."""
    lane = _lane_iota()
    rowin = _row_iota() & (_TROWS - 1)
    s = kb
    d = 1
    while d < _LANES:
        s = jnp.where(lane >= d, s + pltpu.roll(s, shift=d, axis=1), s)
        d <<= 1
    rt = lax.broadcast_in_dim(s[:, _LANES - 1:], (_ROWS, _LANES), (0, 1))
    p = rt
    d = 1
    while d < _TROWS:
        p = jnp.where(rowin >= d, p + pltpu.roll(p, shift=d, axis=0), p)
        d <<= 1
    # p: inclusive prefix (within tile) of row totals, broadcast on lanes
    return s + (p - rt), p


def _flat_rotate_tile(v, p):
    """rotate an (8,128) tile by a dynamic amount p (flat order):
    element at flat f moves to (f + p) % 1024."""
    lane = lax.broadcasted_iota(jnp.int32, (_TROWS, _LANES), 1)
    for b in range(10):
        s = 1 << b
        cond = ((p >> b) & 1) == 1
        if b < 7:
            v1 = pltpu.roll(v, shift=s, axis=1)
            v2 = pltpu.roll(v1, shift=1, axis=0)
            rolled = jnp.where(lane < s, v2, v1)
        else:
            rolled = pltpu.roll(v, shift=s >> 7, axis=0)
        v = jnp.where(cond, rolled, v)
    return v


def _kernel(
    kb_ref, *rest, nchan: int, max_chunks: int,
):
    """rest layout (inputs were flattened by pallas_call):
    chan_refs[nchan] (VMEM in [256,128]),
    out_refs[nchan] (ANY), cnt_ref (SMEM),
    carry[nchan], staging[nchan] ([2, _CH_ROWS, _LANES]),
    routed[nchan], rp_ref, st_ref (SMEM [8]), sems[nchan]."""
    chan = rest[:nchan]
    outs = rest[nchan:2 * nchan]
    cnt_ref = rest[2 * nchan]
    base = 2 * nchan + 1
    carry = rest[base:base + nchan]
    stag = rest[base + nchan:base + 2 * nchan]
    routed = rest[base + 2 * nchan:base + 3 * nchan]
    rp_ref = rest[base + 3 * nchan]
    st_ref = rest[base + 3 * nchan + 1]
    sems = rest[base + 3 * nchan + 2:base + 3 * nchan + 2 + nchan]

    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        st_ref[0] = 0  # carry fill
        st_ref[1] = 0  # staging tile index
        st_ref[2] = 0  # chunk index
        st_ref[3] = 0  # total kept
        st_ref[4] = 0  # current staging buffer (0/1)
        st_ref[5] = 0  # buffer 0 DMA outstanding
        st_ref[6] = 0  # buffer 1 DMA outstanding

    kb = kb_ref[:]
    # block-homogeneity dispatch: corridor points arrive in scan order,
    # so after the ground pre-cut most 32k blocks are PURE ground
    # (kbsum == 0, nothing to do at all) or occasionally pure structure
    # (kbsum == _BLOCK, routing is the identity).  Only mixed blocks pay
    # the rank + butterfly stages — the kernel's entire compute cost
    # (3.1 ms at 4M when every block is mixed — the fully-random
    # worst case; ~1 ms on scan-ordered corridor data).
    kbsum = jnp.sum(kb)
    mixed = (kbsum > 0) & (kbsum < _BLOCK)

    @pl.when(mixed)
    def _():
        vals = [c[:] for c in chan]
        # ---- phase 1: within-tile flat ranks
        rank, rowpref = _tile_ranks(kb)
        dest = jnp.where(kb > 0, rank - 1, jnp.int32(-1))

        # ---- phase 2: butterfly concentration (pack kept to tile
        # fronts).  The partner's move intent is recomputed from its
        # routed dest instead of routing an extra array.
        for b in range(10):
            if b < 7:
                posbit = (_lane_iota() >> b) & 1
            else:
                posbit = ((_row_iota() & (_TROWS - 1)) >> (b - 7)) & 1
            want = (dest >> b) & 1
            move = (dest >= 0) & (want != posbit)
            partners = [_fetch_partner(v, b)[0] for v in vals]
            d_p, _ = _fetch_partner(dest, b)
            move_p = (d_p >= 0) & (((d_p >> b) & 1) == posbit)
            swap = move | move_p
            vals = [jnp.where(swap, p, v) for v, p in zip(vals, partners)]
            dest = jnp.where(swap, d_p, dest)
        for r, v in zip(routed, vals):
            r[:] = v
        rp_ref[:] = rowpref

    @pl.when(kbsum == _BLOCK)
    def _():
        for r, c in zip(routed, chan):
            r[:] = c[:]

    # ---- phase 3: carry merge + staged emission, tile by tile
    fpos = (
        lax.broadcasted_iota(jnp.int32, (_TROWS, _LANES), 0) * _LANES
        + lax.broadcasted_iota(jnp.int32, (_TROWS, _LANES), 1)
    )

    def _wait_buf(b):
        # descriptor shapes only size the wait; offsets are irrelevant
        for s, o, sem in zip(stag, outs, sems):
            pltpu.make_async_copy(
                s.at[b], o.at[pl.ds(0, _CH_ROWS)], sem.at[b]
            ).wait()
        st_ref[5 + b] = 0

    def flush_chunk():
        # double-buffered: start the DMA on the current buffer, switch,
        # and only wait for the other buffer's in-flight DMA (started a
        # whole chunk of compute ago) before its reuse — 256 synchronous
        # start+wait pairs per 4M rows cost ~1.7 ms before this
        chunk = st_ref[2]
        buf = st_ref[4]

        @pl.when(chunk < max_chunks)
        def _():
            doff = chunk * _CH_ROWS
            for s, o, sem in zip(stag, outs, sems):
                pltpu.make_async_copy(
                    s.at[buf], o.at[pl.ds(doff, _CH_ROWS)],
                    sem.at[buf],
                ).start()
            st_ref[5 + buf] = 1

        st_ref[2] = chunk + 1
        st_ref[1] = 0
        st_ref[4] = 1 - buf

        @pl.when(st_ref[5 + (1 - buf)] == 1)
        def _():
            _wait_buf(1 - buf)

    @pl.when(kbsum > 0)
    def _():
        all_kept = kbsum == _BLOCK
        for t in range(_NTILES):
            r0 = t * _TROWS
            tiles = [r[r0:r0 + _TROWS, :] for r in routed]
            cnt = jnp.where(
                all_kept,
                jnp.int32(_TILE),
                jnp.sum(
                    rp_ref[r0 + _TROWS - 1:r0 + _TROWS, _LANES - 1:]
                ),
            )
            p = st_ref[0]
            tiles = [_flat_rotate_tile(tv, p) for tv in tiles]
            end = p + cnt
            merged = [
                jnp.where(fpos >= p, tv, c[:])
                for tv, c in zip(tiles, carry)
            ]
            full = end >= _TILE

            @pl.when(full)
            def _():
                si = st_ref[1]
                buf = st_ref[4]
                off = pl.ds(pl.multiple_of(si * _TROWS, _TROWS), _TROWS)
                for s, mg in zip(stag, merged):
                    s[buf, off, :] = mg
                # wrapped elements of the rotated tile live at
                # [0, end-1024)
                for c, tv in zip(carry, tiles):
                    c[:] = tv
                st_ref[0] = end - _TILE
                st_ref[1] = si + 1

                @pl.when(si + 1 == _STAGE_TILES)
                def _():
                    flush_chunk()

            @pl.when(jnp.logical_not(full))
            def _():
                for c, mg in zip(carry, merged):
                    c[:] = mg
                st_ref[0] = end

        st_ref[3] = st_ref[3] + kbsum

    # ---- finalization on the last block: flush carry + pad staging
    @pl.when(i == nb - 1)
    def _():
        p = st_ref[0]
        si = st_ref[1]
        buf = st_ref[4]
        zero = jnp.zeros((_TROWS, _LANES), jnp.int32)
        off = pl.ds(pl.multiple_of(si * _TROWS, _TROWS), _TROWS)
        for s, c in zip(stag, carry):
            s[buf, off, :] = jnp.where(fpos < p, c[:], zero)
        si = si + 1
        for j in range(_STAGE_TILES):
            @pl.when(j >= si)
            def _():
                joff = pl.ds(pl.multiple_of(j * _TROWS, _TROWS), _TROWS)
                for s in stag:
                    s[buf, joff, :] = zero
        st_ref[1] = si
        flush_chunk()
        for b in range(2):
            @pl.when(st_ref[5 + b] == 1)
            def _():
                _wait_buf(b)
        cnt_ref[0] = st_ref[3]


@functools.partial(jax.jit, static_argnames=("capacity", "interpret"))
def compact_rows_multi(keep, channels, capacity: int, *, interpret: bool = False):
    """Compact rows where `keep` into fixed [capacity] buffers.

    keep bool[N]; channels: tuple of i32[N] (bitcast other 32-bit dtypes
    outside).  N must be a multiple of 32768 and capacity a multiple of
    32768.  Returns (tuple of i32[capacity], count): rows
    [0, min(count, capacity)) hold the kept rows in input order, the
    remainder holds zeros.  count is the TRUE number of kept rows —
    count > capacity means the tail was dropped (caller decides whether
    to fall back)."""
    nchan = len(channels)
    n = keep.shape[0]
    if n % _BLOCK:
        raise ValueError(f"N={n} must be a multiple of {_BLOCK}")
    if capacity % _CHUNK:
        raise ValueError(f"capacity={capacity} must be a multiple of {_CHUNK}")
    # one slack chunk: the final flush may emit a partially-padded chunk
    cap_pad = capacity + _CHUNK
    max_chunks = cap_pad // _CHUNK
    nb = n // _BLOCK

    kernel = functools.partial(_kernel, nchan=nchan, max_chunks=max_chunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))]
        * (1 + nchan),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nchan
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=(
            [pltpu.VMEM((_TROWS, _LANES), jnp.int32)] * nchan      # carry
            + [pltpu.VMEM((2, _CH_ROWS, _LANES), jnp.int32)] * nchan  # staging
            + [pltpu.VMEM((_ROWS, _LANES), jnp.int32)] * nchan     # routed
            + [
                pltpu.VMEM((_ROWS, _LANES), jnp.int32),            # rowpref
                pltpu.SMEM((8,), jnp.int32),
            ]
            + [pltpu.SemaphoreType.DMA((2,))] * nchan
        ),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cap_pad // _LANES, _LANES), jnp.int32)
        ] * nchan
        + [jax.ShapeDtypeStruct((1,), jnp.int32)],
        interpret=interpret,
    )(
        keep.astype(jnp.int32).reshape(n // _LANES, _LANES),
        *[c.reshape(n // _LANES, _LANES) for c in channels],
    )
    count = outs[nchan][0]
    iota = jnp.arange(capacity, dtype=jnp.int32)
    ok = iota < jnp.minimum(count, capacity)
    # rows at/after the count (or past a dropped-tail overflow) must be
    # deterministic for every downstream stage; the kernel zero-pads its
    # final chunk but chunks past max_chunks were never written
    comp = tuple(
        jnp.where(ok, o.reshape(-1)[:capacity], 0) for o in outs[:nchan]
    )
    return comp, count


def compact_rows_multi_reference(keep, channels, capacity: int):
    """XLA oracle with identical semantics (slow on TPU — tests/CPU)."""
    n = keep.shape[0]
    count = jnp.sum(keep.astype(jnp.int32))
    (idx,) = jnp.nonzero(keep, size=capacity, fill_value=n - 1)
    iota = jnp.arange(capacity, dtype=jnp.int32)
    ok = iota < jnp.minimum(count, capacity)
    comp = tuple(
        jnp.where(ok, jnp.take(c, idx, indices_are_sorted=True), 0)
        for c in channels
    )
    return comp, count


@functools.partial(jax.jit, static_argnames=("capacity", "interpret"))
def compact_rows(keep, hi, lo, capacity: int, *, interpret: bool = False):
    """Compact Morton (hi, lo) rows where `keep` into a [capacity] buffer.

    keep bool[N], hi/lo i32[N]; N must be a multiple of 32768 and
    capacity a multiple of 32768.  Returns (hi_c, lo_c, count) with
    hi_c/lo_c i32[capacity]: rows [0, min(count, capacity)) hold the
    kept rows in input order, the remainder holds the Morton sentinel.
    count is the TRUE number of kept rows — count > capacity means the
    tail was dropped (caller decides whether to fall back).
    """
    from pointcloudhookup_tpu.ops.morton import SENTINEL_HI

    (hi_c, lo_c), count = compact_rows_multi(
        keep, (hi, lo), capacity, interpret=interpret
    )
    iota = jnp.arange(capacity, dtype=jnp.int32)
    ok = iota < jnp.minimum(count, capacity)
    hi_c = jnp.where(ok, hi_c, jnp.int32(SENTINEL_HI))
    return hi_c, lo_c, count


def compact_rows_reference(keep, hi, lo, capacity: int):
    """XLA oracle with identical semantics (slow on TPU — tests/CPU)."""
    from pointcloudhookup_tpu.ops.morton import SENTINEL_HI

    (hi_c, lo_c), count = compact_rows_multi_reference(
        keep, (hi, lo), capacity
    )
    iota = jnp.arange(capacity, dtype=jnp.int32)
    ok = iota < jnp.minimum(count, capacity)
    hi_c = jnp.where(ok, hi_c, jnp.int32(SENTINEL_HI))
    return hi_c, lo_c, count
