"""Offscreen renderer — headless twin of ui/vtk_widget.py."""

import numpy as np

from pointcloudhookup_tpu.viz.boxes import box_lineset, tower_display_geometries
from pointcloudhookup_tpu.viz.render import (
    Camera,
    height_colormap,
    render_scene,
    render_to_png,
)


def test_camera_fit_bounds_looks_at_center():
    cam = Camera.fit_bounds([-10, -10, 0], [10, 10, 20])
    assert np.allclose(cam.focal, [0, 0, 10])
    # position sits distance_scale * diagonal away from the focal point
    diag = np.linalg.norm([20, 20, 20])
    assert np.isclose(np.linalg.norm(cam.position - cam.focal), 1.8 * diag)
    r, u, f = cam.basis()
    # orthonormal basis
    for a, b in [(r, u), (u, f), (r, f)]:
        assert abs(np.dot(a, b)) < 1e-9
    assert np.isclose(np.linalg.norm(r), 1.0)


def test_height_colormap_spans_blue_to_red():
    c = height_colormap(np.linspace(0.0, 1.0, 101))
    assert c.shape == (101, 3)
    assert c[0, 2] > 200 and c[0, 0] == 0  # low -> blue
    assert c[-1, 0] > 200 and c[-1, 2] == 0  # high -> red


def test_render_scene_points_land_in_image(rng):
    pts = rng.normal(0, 5.0, size=(5000, 3))
    img = render_scene(pts, width=320, height=240, background=(0, 0, 0))
    assert img.shape == (240, 3 * 320 // 3, 3) == (240, 320, 3)
    # a gaussian blob centered in view colors a meaningful pixel fraction
    lit = (img.sum(axis=2) > 0).mean()
    assert 0.005 < lit < 0.9


def test_render_wireframe_draws_box_edges():
    # empty cloud + one box: only wireframe pixels, in the box color
    lines = box_lineset(np.array([-5.0, -5, -5]), np.array([5.0, 5, 5]))
    img = render_scene(
        np.zeros((0, 3)),
        [{"lines": lines, "color": (0.0, 1.0, 0.0)}],
        width=200, height=200, background=(0, 0, 0),
        camera=Camera.fit_bounds([-5] * 3, [5] * 3),
    )
    green = (img[:, :, 1] == 255) & (img[:, :, 0] == 0)
    assert green.sum() > 50  # edges rasterized
    assert (img[:, :, 0] == 0).all()  # nothing but background + green


def test_occlusion_near_point_wins():
    # two points projecting to the same pixel: nearer one's color stays
    cam = Camera(position=(0, -20, 0), focal=(0, 0, 0), fov_deg=30.0)
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 10.0, 0.0]])  # near, far
    colors = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
    img = render_scene(
        pts, width=64, height=64, camera=cam, point_colors=colors,
        background=(0, 0, 0),
    )
    assert (img[:, :, 0] == 255).sum() == 1  # near/red visible
    assert (img[:, :, 2] == 255).sum() == 0  # far/blue occluded


def test_render_to_png_roundtrip(tmp_path, rng):
    from PIL import Image

    pts = rng.uniform(-10, 10, size=(2000, 3))
    towers = [dict(center=[0.0, 0.0, 10.0], extent=[8.0, 8.0, 20.0],
                   width=8.0, height=20.0, angle=0.3)]
    geoms = tower_display_geometries(towers, preset="kuangxuan_original")
    path = str(tmp_path / "scene.png")
    render_to_png(pts, geoms, path, width=320, height=240)
    im = Image.open(path)
    assert im.size == (320, 240)
    assert np.asarray(im).shape == (240, 320, 3)


def test_display_cap_subsamples(rng):
    pts = rng.uniform(-10, 10, size=(10_000, 3))
    img_full = render_scene(pts, width=160, height=120, display_cap=10_000)
    img_cap = render_scene(pts, width=160, height=120, display_cap=500)
    lit_full = (img_full.sum(axis=2) > 44).sum()
    lit_cap = (img_cap.sum(axis=2) > 44).sum()
    assert lit_cap < lit_full
