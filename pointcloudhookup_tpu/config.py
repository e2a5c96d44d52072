"""Central configuration dataclasses.

The reference exposes its configuration as function kwargs with defaults
(`/root/reference/utils/tower_extraction.py:26-32`,
`/root/reference/utils/table_match_gim.py:145`,
`/root/reference/ui/import_PC.py:19-20`).  We keep the same names and
defaults so parity configs map 1:1, but gather them into hashable frozen
dataclasses that can be closed over by jitted functions.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class VoxelParams:
    """Voxel-grid downsampling (ref: ui/import_PC.py:15-20, defaults from
    pyGUI_towers_test.py:210-212)."""

    voxel_size: float = 0.1
    # Per-chunk voxelization size used by the reference GUI path.  In
    # "parity" mode voxels are deduplicated only within a chunk (the
    # reference behavior, ui/import_PC.py:45-50); in "global" mode the
    # whole cloud shares one voxel grid (higher quality).
    chunk_size: int = 500_000
    per_chunk: bool = False


@dataclasses.dataclass(frozen=True)
class GroundParams:
    """Height-percentile ground filtering (ref: utils/tower_extraction.py:83-89)."""

    percentile: float = 25.0
    offset: float = 3.0
    # If fewer than `min_points_after` survive, retry with `retry_offset`.
    min_points_after: int = 1000
    retry_offset: float = 1.0


@dataclasses.dataclass(frozen=True)
class ClusterParams:
    """DBSCAN-equivalent Euclidean clustering
    (ref: utils/tower_extraction.py:26-28,96,107-112)."""

    eps: float = 8.0
    min_points: int = 80
    # Reference chunks points into 50k blocks and clusters each
    # independently (labels offset per chunk).  parity mode replicates
    # that; global mode clusters the whole tile at once.
    chunk_size: int = 50_000
    per_chunk: bool = False
    # clustering backend: "exact" (O(N^2) tiled DBSCAN), "grid"
    # (cell-graph fast path), "adaptive" (knob-free: data-derived eps +
    # min-cluster-size semantics, the reference's HDBSCAN-path analogue,
    # test/008.py:245-268), or "auto" (grid above auto_grid_threshold)
    method: str = "auto"
    auto_grid_threshold: int = 200_000
    # grid-path knobs
    max_cells: int = 65536
    min_cell_points: int = 1
    # adaptive-path knob: clusters smaller than this many points are
    # demoted to noise (None -> min_points, HDBSCAN's default coupling)
    min_cluster_size: int | None = None


@dataclasses.dataclass(frozen=True)
class TowerFilterParams:
    """Tower acceptance filters + dedup (ref: utils/tower_extraction.py:26-32,142-161)."""

    aspect_ratio_threshold: float = 0.8
    min_height: float = 15.0
    max_width: float = 50.0
    min_width: float = 8.0
    duplicate_threshold: float = 30.0


@dataclasses.dataclass(frozen=True)
class ExtractParams:
    """Full extraction pipeline parameters (downsample + ground + cluster +
    OBB + filters), mirroring extract_towers() kwargs
    (ref: utils/tower_extraction.py:20-32)."""

    ground: GroundParams = GroundParams()
    cluster: ClusterParams = ClusterParams()
    filters: TowerFilterParams = TowerFilterParams()
    # Maximum number of cluster candidates / accepted towers carried in
    # fixed-shape device buffers.
    max_clusters: int = 128
    # Number of candidate orientations scanned for the min-area XY
    # rectangle (the gravity-aligned OBB).
    obb_angles: int = 256


@dataclasses.dataclass(frozen=True)
class MatchParams:
    """GIM <-> point-cloud tower matching (ref: utils/table_match_gim.py:145)."""

    distance_threshold: float = 50.0  # meters, haversine
    height_threshold: float = 100.0  # meters, |orthometric height difference|
    region_n_value: float = 25.0  # fallback geoid undulation (m), Changsha region


DEFAULT_EXTRACT = ExtractParams()
DEFAULT_MATCH = MatchParams()
DEFAULT_VOXEL = VoxelParams()
