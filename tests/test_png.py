import os

import numpy as np
import pytest

from bhraytracer_tpu.utils.png import read_png, write_png


def test_roundtrip_rgb(tmp_path, rng):
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    out = read_png(p)
    np.testing.assert_array_equal(img, out)


def test_roundtrip_grey(tmp_path, rng):
    img = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    write_png(p, img)
    out = read_png(p)
    np.testing.assert_array_equal(np.repeat(img[:, :, None], 3, 2), out)


@pytest.mark.parametrize("name", ["clouds.png", "bricks.png"])
def test_decode_reference_textures(reference_dir, name):
    path = os.path.join(reference_dir, "Resource", "Data", name)
    img = read_png(path)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 4 and img.shape[1] > 4
    assert img.dtype == np.uint8
    # Textures are not constant images.
    assert img.std() > 1.0
