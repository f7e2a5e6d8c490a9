"""Adaptive-MSAA color-function renderer (`visualization/drawing.py`)
vs exact analytic coverage — parity target `flowmap/visualization/drawing/
rendering.py:76-167`."""

import numpy as np

from flowmap_tpu.visualization.drawing import (
    _detect_edge_pixels,
    render,
    render_over_image,
)


def _disk_fn(center, radius, color=(1.0, 0.0, 0.0)):
    def fn(xy):
        inside = np.linalg.norm(xy - np.asarray(center), axis=-1) <= radius
        rgba = np.zeros((xy.shape[0], 4), np.float32)
        rgba[:, :3] = color
        rgba[:, 3] = inside.astype(np.float32)
        return rgba

    return fn


def test_detect_edge_pixels_marks_boundary_only():
    rgba = np.zeros((1, 8, 8, 4), np.float32)
    rgba[0, :, 4:] = 1.0  # vertical edge between columns 3 and 4
    mask = _detect_edge_pixels(rgba)
    assert mask[0, :, 3].all() and mask[0, :, 4].all()
    assert not mask[0, :, :3].any() and not mask[0, :, 5:].any()


def test_msaa_alpha_approximates_disk_area():
    h = w = 32
    radius = 10.0
    overlay = render((h, w), _disk_fn((16.0, 16.0), radius), num_passes=2)
    assert overlay.shape == (h, w, 4)
    covered = overlay[..., 3].sum()
    np.testing.assert_allclose(covered, np.pi * radius**2, rtol=0.02)
    # Interior pixels stay fully opaque; a 45-degree straddling pixel is
    # fractional (pixel (23, 23) spans distances ~9.9..11.3 vs radius 10).
    assert overlay[16, 16, 3] == 1.0
    boundary = overlay[23, 23, 3]
    assert 0.0 < boundary < 1.0


def test_msaa_refines_vs_single_pass():
    """More passes -> closer to the true disk area."""
    h = w = 24
    fn = _disk_fn((12.0, 12.0), 7.3)
    area = np.pi * 7.3**2
    err0 = abs(render((h, w), fn, num_passes=0)[..., 3].sum() - area)
    err2 = abs(render((h, w), fn, num_passes=2)[..., 3].sum() - area)
    assert err2 < err0


def test_render_over_image_composites_straight_alpha():
    image = np.zeros((3, 16, 16), np.float32)
    out = render_over_image(image, _disk_fn((8.0, 8.0), 4.0), num_passes=1)
    assert out.shape == (3, 16, 16)
    assert out[0, 8, 8] == 1.0  # red disk center
    assert out[1, 8, 8] == 0.0
    assert out[0, 0, 0] == 0.0  # background untouched
