"""DBSCAN-equivalent Euclidean clustering on TPU.

The reference delegates clustering to sklearn DBSCAN (eps=8.0,
min_samples=80, ball_tree) over 50k-point chunks
(/root/reference/utils/tower_extraction.py:96-122).  Trees are
pointer-chasing structures that do not map to TPU; instead we compute
neighborhoods with *tiled pairwise distances* (an [N,3]x[3,T] matmul per
tile — MXU-friendly, memory bounded by N*T) and cluster via iterative
min-label propagation with pointer-jumping (union-find style path
compression), which converges in O(log diameter) passes for the dense
neighborhoods this workload produces (eps=8 m after 0.1 m voxelization).

Semantics match sklearn DBSCAN:
  * core point: >= min_samples points (incl. self) within eps,
  * two core points within eps are in the same cluster (transitively),
  * border (non-core) points adopt a neighboring core point's cluster,
  * everything else is noise (-1).
Compacted labels are numbered by ascending minimum core-point index,
which is also sklearn's numbering; the only permitted divergence is a
border point adjacent to two clusters (order-dependent in sklearn).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _tile_dist2(xyz, sq, pts_j, sq_j):
    """Squared distances [N, T] between all points and one tile.

    precision='highest': JAX's DEFAULT matmul precision runs f32 dots in
    reduced (bf16-pass) precision, which at corridor coordinate scales
    (|p| ~ 1e2..1e3 m, |p|^2 ~ 1e5-1e6) produces distance errors far above
    eps^2; full f32 is required for correct neighborhoods.  The K=3
    contraction is bandwidth-bound anyway, so the extra MXU passes are free.
    """
    return sq[:, None] + sq_j[None, :] - 2.0 * jnp.dot(
        xyz, pts_j.T, precision=jax.lax.Precision.HIGHEST
    )


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    for t in range(min(target, n), 0, -1):
        if n % t == 0:
            return t
    return 1


# VMEM budget for the fused Pallas path: six 1-D f32/i32 arrays resident
_PALLAS_MAX_N = 262144


def dbscan(
    xyz,
    mask,
    eps,
    min_points: int,
    *,
    tile: int | None = None,
    max_iters: int = 64,
    use_pallas: bool | None = None,
):
    """Cluster points within eps (DBSCAN semantics).

    xyz: f32[N,3], mask: bool[N].  `tile` (column-tile width of the
    pairwise-distance pass) defaults to the largest divisor of N <= 512.
    Returns (labels i32[N], core bool[N]); labels are compact cluster ids
    (0..K-1 ordered by min core index), -1 for noise/invalid.

    On TPU, tables up to 256k points run the fused Pallas
    neighbor-reduction kernel (whole table VMEM-resident).
    """
    n = xyz.shape[0]
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and n % 1024 == 0 and n <= _PALLAS_MAX_N
        )
    tile = _pick_tile(n, 512) if tile is None else tile
    return _dbscan_jit(
        xyz, mask, eps, min_points, tile=tile, max_iters=max_iters,
        use_pallas=use_pallas,
    )


@functools.partial(
    jax.jit, static_argnames=("min_points", "tile", "max_iters", "use_pallas")
)
def _dbscan_jit(
    xyz, mask, eps, min_points: int, *, tile: int, max_iters: int,
    use_pallas: bool = False,
):
    n = xyz.shape[0]
    if n % tile:
        raise ValueError(f"capacity {n} must be a multiple of tile {tile}")
    nt = n // tile
    eps2 = jnp.square(jnp.float32(eps))
    inf = jnp.int32(n)

    if use_pallas:
        from pointcloudhookup_tpu.ops.pallas.neighbor import neighbor_reduce

        pop, _ = neighbor_reduce(
            xyz, jnp.zeros(n, jnp.int32), mask.astype(jnp.float32), mask, eps2,
            sentinel=n, mode="pop",
        )
        counts = pop.astype(jnp.int32)
        core = mask & (counts >= min_points)

        def neighbor_min(labels, allowed):
            _, lmin = neighbor_reduce(
                xyz, labels, jnp.zeros(n, jnp.float32), allowed, eps2,
                sentinel=n, mode="lmin",
            )
            return lmin

    else:
        sq = jnp.sum(xyz * xyz, axis=1)

        def get_tile(arr, j):
            return lax.dynamic_slice_in_dim(arr, j * tile, tile, axis=0)

        # ---- pass 1: neighbor counts -> core mask
        def count_body(acc, j):
            d2 = _tile_dist2(xyz, sq, get_tile(xyz, j), get_tile(sq, j))
            nb = (d2 <= eps2) & get_tile(mask, j)[None, :]
            return acc + jnp.sum(nb.astype(jnp.int32), axis=1), None

        counts, _ = lax.scan(count_body, jnp.zeros(n, jnp.int32), jnp.arange(nt))
        core = mask & (counts >= min_points)

        # ---- tiled min-label-over-neighbors reduction
        def neighbor_min(labels, allowed):
            def body(acc, j):
                d2 = _tile_dist2(xyz, sq, get_tile(xyz, j), get_tile(sq, j))
                nb = (d2 <= eps2) & get_tile(allowed, j)[None, :]
                lmin = jnp.min(
                    jnp.where(nb, get_tile(labels, j)[None, :], inf), axis=1
                )
                return jnp.minimum(acc, lmin), None

            res, _ = lax.scan(body, jnp.full(n, inf, jnp.int32), jnp.arange(nt))
            return res

    # ---- pass 2: propagate min representative over the core-core graph
    labels0 = jnp.where(core, jnp.arange(n, dtype=jnp.int32), inf)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def step(state):
        labels, _, it = state
        new = jnp.where(core, jnp.minimum(labels, neighbor_min(labels, core)), labels)
        # pointer jumping: a label is a representative point index, so
        # following it once (labels[labels]) shortcuts chains.
        for _ in range(2):
            new = jnp.where(
                core, jnp.minimum(new, new[jnp.clip(new, 0, n - 1)]), new
            )
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = lax.while_loop(
        cond, step, (labels0, jnp.bool_(True), jnp.int32(0))
    )

    # ---- pass 3: border points adopt the min core-neighbor representative
    border = neighbor_min(labels, core)
    raw = jnp.where(core, labels, jnp.where(mask, border, inf))
    return compact_labels(raw, inf), core


def compact_labels(raw, inf):
    """Map representative-index labels (inf = noise) to compact ids
    0..K-1 ordered by ascending representative; noise -> -1.

    Sort-rank-unsort: sort (value, row), rank each run by a cumsum of
    run starts, sort back by row.  The previous searchsorted delivery
    cost log2(M) gather rounds on TPU (~several ms at 64k); a
    value-indexed scatter table costs an [M]-row scatter (~1 ms); two
    small payload sorts cost ~0.2 ms each and work on every backend."""
    n = raw.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_lab, src = lax.sort((raw, iota), num_keys=1)
    is_new = (sorted_lab != jnp.roll(sorted_lab, 1)).at[0].set(True)
    valid = is_new & (sorted_lab < inf)
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    _, rank_orig = lax.sort((src, rank), num_keys=1)
    return jnp.where(raw < inf, rank_orig, -1)


def dbscan_chunked(
    xyz,
    mask,
    eps,
    min_points: int,
    *,
    chunk_size: int = 50_000,
    tile: int | None = None,
    max_iters: int = 64,
):
    """Reference-parity chunked clustering: each contiguous chunk of
    `chunk_size` points is clustered independently and labels are offset
    so they stay globally unique (ref: utils/tower_extraction.py:104-116;
    the reference never merges across chunks).  Capacity must be a
    multiple of chunk_size (which must be a multiple of tile).
    """
    n = xyz.shape[0]
    if n % chunk_size:
        raise ValueError(f"capacity {n} not a multiple of chunk_size {chunk_size}")
    tile = _pick_tile(chunk_size, 512) if tile is None else tile
    nc = n // chunk_size
    xyz_c = xyz.reshape(nc, chunk_size, 3)
    mask_c = mask.reshape(nc, chunk_size)
    labels_c, core_c = jax.vmap(
        lambda p, m: _dbscan_jit(p, m, eps, min_points, tile=tile, max_iters=max_iters)
    )(xyz_c, mask_c)
    # offset labels per chunk so they are globally unique
    offs = jnp.arange(nc, dtype=jnp.int32)[:, None] * jnp.int32(chunk_size)
    labels_c = jnp.where(labels_c >= 0, labels_c + offs, -1)
    return labels_c.reshape(n), core_c.reshape(n)


@functools.partial(jax.jit, static_argnames=("max_clusters", "max_iters"))
def merge_cluster_fragments(
    labels,
    xyz,
    mask,
    merge_radius,
    *,
    max_clusters: int = 256,
    max_iters: int = 16,
):
    """Cross-chunk cluster merging: clusters whose centroids lie within
    `merge_radius` are unioned (the fix for chunked-DBSCAN fragmentation
    prototyped with a KD-tree + union-find in
    /root/reference/test/tttt.py:104-174; default radius there is 6.0 m).

    labels: i32[N] compact-ish ids in [0, max_clusters) or -1.
    Returns relabeled i32[N] (compact, -1 noise preserved).
    """
    k = max_clusters
    lab = jnp.where((labels >= 0) & mask, labels, k)
    w = ((labels >= 0) & mask).astype(jnp.float32)
    sums = jax.ops.segment_sum(xyz * w[:, None], lab, num_segments=k + 1)[:k]
    cnts = jax.ops.segment_sum(w, lab, num_segments=k + 1)[:k]
    cent = sums / jnp.maximum(cnts, 1.0)[:, None]
    alive = cnts > 0

    d2 = jnp.sum((cent[:, None, :] - cent[None, :, :]) ** 2, axis=-1)
    adj = (d2 <= jnp.square(jnp.float32(merge_radius))) & alive[:, None] & alive[None, :]

    rep0 = jnp.where(alive, jnp.arange(k, dtype=jnp.int32), jnp.int32(k))

    def step(state):
        rep, _, it = state
        nm = jnp.min(jnp.where(adj, rep[None, :], k), axis=1)
        new = jnp.where(alive, jnp.minimum(rep, nm), rep)
        new = jnp.where(alive, jnp.minimum(new, new[jnp.clip(new, 0, k - 1)]), new)
        return new, jnp.any(new != rep), it + 1

    rep, _, _ = lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters),
        step,
        (rep0, jnp.bool_(True), jnp.int32(0)),
    )
    merged = jnp.where(labels >= 0, rep[jnp.clip(labels, 0, k - 1)], jnp.int32(k))
    return compact_labels(merged, jnp.int32(k))
