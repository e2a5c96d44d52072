"""PLY scene export round-trip (viz/export.py).

Closes the "no standard-format geometry export" gap: an external
viewer-loadable file with per-point cluster colors and tower
wireframe edges (reference shows these live in ui/vtk_widget.py)."""

import numpy as np
import pytest

from pointcloudhookup_tpu.viz.boxes import box_lineset
from pointcloudhookup_tpu.viz.export import (
    cluster_palette,
    colors_from_labels,
    export_scene_ply,
    height_colors,
    read_ply_scene,
)


def test_palette_distinct():
    pal = cluster_palette(24)
    assert pal.shape == (24, 3) and pal.dtype == np.uint8
    # all colors pairwise distinct
    assert len({tuple(c) for c in pal}) == 24


def test_colors_from_labels():
    labels = np.array([-1, 0, 0, 3, 7, -1])
    cols = colors_from_labels(labels, accepted_labels=[0, 3])
    assert cols.shape == (6, 3)
    # noise is gray, both noise rows identical
    assert (cols[0] == cols[5]).all()
    # accepted clusters bright + distinct from each other and noise
    assert not (cols[1] == cols[0]).all()
    assert not (cols[1] == cols[3]).all()
    # same cluster -> same color
    assert (cols[1] == cols[2]).all()
    # non-accepted cluster (7) gets the dim "other" color
    assert not (cols[4] == cols[1]).all() and not (cols[4] == cols[0]).all()


def test_roundtrip_with_boxes(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 10, (500, 3))
    labels = np.repeat(np.arange(5) - 1, 100)
    corners = box_lineset(np.array([-1.0, -1, -1]), np.array([1.0, 1, 1]))
    geoms = [(corners, (1.0, 0.0, 0.0)), (corners + 5.0, (0.0, 1.0, 0.0))]
    path = str(tmp_path / "scene.ply")
    summary = export_scene_ply(path, pts, labels=labels, geoms=geoms)
    assert summary["cloud_points"] == 500
    assert summary["boxes"] == 2 and summary["edges"] == 24

    xyz, rgb, edges = read_ply_scene(path)
    assert len(xyz) == 500 + 2 * len(corners)
    np.testing.assert_allclose(xyz[:500], pts, atol=1e-4)
    # cloud colors survive
    expect = colors_from_labels(labels)
    assert (rgb[:500] == expect).all()
    # box vertices carry the box color and edges index into them
    assert (rgb[500] == np.array([255, 0, 0])).all()
    assert (rgb[500 + len(corners)] == np.array([0, 255, 0])).all()
    assert edges.min() >= 500 and edges.max() < len(xyz)
    # each edge joins two consecutive lineset points (pairs)
    seg = xyz[edges[0][0]], xyz[edges[0][1]]
    np.testing.assert_allclose(seg[0], corners[0], atol=1e-4)
    np.testing.assert_allclose(seg[1], corners[1], atol=1e-4)


def test_display_cap_keeps_colors_aligned(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(0, 1, (1000, 3))
    # color = f(point) so alignment is checkable after subsampling
    cols = (np.abs(pts * 50) % 256).astype(np.uint8)
    path = str(tmp_path / "capped.ply")
    summary = export_scene_ply(path, pts, colors=cols, display_cap=200)
    assert summary["cloud_points"] == 200
    xyz, rgb, _ = read_ply_scene(path)
    expect = (np.abs(xyz * 50) % 256).astype(np.uint8)
    # f32 quantization can flip a borderline byte; demand 99%+ agreement
    assert (rgb == expect).mean() > 0.99


def test_height_colormap(tmp_path):
    z = np.linspace(0, 100, 50)
    pts = np.column_stack([np.zeros(50), np.zeros(50), z])
    cols = height_colors(z)
    # low points blue-ish, high points yellow-ish
    assert cols[0, 2] > cols[0, 0] and cols[-1, 0] > cols[-1, 2]
    path = str(tmp_path / "h.ply")
    export_scene_ply(path, pts)
    _, rgb, _ = read_ply_scene(path)
    assert (rgb == cols).all()


def test_colored_las_roundtrip(tmp_path):
    from pointcloudhookup_tpu.io.las import read_las
    from pointcloudhookup_tpu.viz.export import export_scene_las

    rng = np.random.default_rng(2)
    pts = rng.normal(0, 10, (300, 3))
    labels = np.repeat(np.arange(3) - 1, 100)
    path = str(tmp_path / "scene.las")
    summary = export_scene_las(path, pts, labels=labels)
    assert summary["cloud_points"] == 300
    las = read_las(path)
    assert las.point_format == 2
    np.testing.assert_allclose(las.xyz(), pts, atol=1e-3)
    expect = colors_from_labels(labels).astype(np.uint16) * 257
    assert (las.points["red"] == expect[:, 0]).all()
    assert (las.points["blue"] == expect[:, 2]).all()


def test_colored_laz_roundtrip(tmp_path):
    """A .laz-named output must be genuinely LASzip-compressed (ADVICE
    round 4: it used to be raw LAS bytes under a .laz name)."""
    from pointcloudhookup_tpu.io.las import read_las
    from pointcloudhookup_tpu.viz.export import export_scene_las

    rng = np.random.default_rng(3)
    pts = rng.normal(0, 10, (300, 3))
    path = str(tmp_path / "scene.laz")
    export_scene_las(path, pts, labels=np.repeat(np.arange(3) - 1, 100))
    with open(path, "rb") as f:
        raw = f.read()
    # a LAZ file advertises the laszip VLR; raw LAS would not
    assert b"laszip encoded" in raw
    las = read_las(path)
    assert las.point_format == 2 and "red" in las.points.dtype.names
    np.testing.assert_allclose(
        np.sort(las.xyz(), axis=0), np.sort(pts, axis=0), atol=1e-3
    )


def test_read_ply_scene_clear_errors(tmp_path):
    path = str(tmp_path / "odd.ply")
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 0\nproperty double x\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
    with pytest.raises(ValueError, match="unsupported PLY property type"):
        read_ply_scene(path)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element face 0\nproperty list uchar int vertex_indices\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
    with pytest.raises(ValueError, match="list properties"):
        read_ply_scene(path)


def test_color_length_mismatch(tmp_path):
    with pytest.raises(ValueError):
        export_scene_ply(
            str(tmp_path / "x.ply"),
            np.zeros((4, 3)),
            colors=np.zeros((3, 3), np.uint8),
        )
