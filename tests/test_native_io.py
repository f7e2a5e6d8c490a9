"""Native image I/O: decode parity with PIL, resize parity with torch."""

import numpy as np
import pytest
from PIL import Image

from flowmap_tpu.utils import native_io


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.uniform(0, 255, size=(37, 53, 3))).astype(np.uint8)
        Image.fromarray(arr).save(root / f"{i}.png")
        Image.fromarray(arr).save(root / f"{i}.jpg", quality=95)
    return root


def test_native_library_builds_and_loads():
    assert native_io.native_available(), "run `make -C native` first"


def test_png_decode_matches_pil(image_dir):
    paths = sorted(image_dir.glob("*.png"))
    got = native_io.load_image_batch(paths)
    for i, p in enumerate(paths):
        want = np.asarray(Image.open(p), np.float32).transpose(2, 0, 1) / 255.0
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_jpg_decode_close_to_pil(image_dir):
    paths = sorted(image_dir.glob("*.jpg"))
    got = native_io.load_image_batch(paths)
    for i, p in enumerate(paths):
        want = np.asarray(Image.open(p), np.float32).transpose(2, 0, 1) / 255.0
        # Different IDCT implementations may differ by a few levels.
        assert np.abs(got[i] - want).max() < 8 / 255.0


def test_resize_matches_torch(image_dir):
    import torch
    import torch.nn.functional as F

    paths = sorted(image_dir.glob("*.png"))
    got = native_io.load_image_batch(paths, shape=(20, 28))
    native = native_io.load_image_batch(paths)
    want = F.interpolate(
        torch.from_numpy(native), (20, 28), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_shape_probe(image_dir):
    h, w = native_io.image_shape(sorted(image_dir.glob("*.png"))[0])
    assert (h, w) == (37, 53)
