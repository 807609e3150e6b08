import numpy as np
import pytest

from rgk_tpu.io import exr


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("pixel_type", ["float", "half"])
def test_exr_round_trip(tmp_path, compression, pixel_type):
    rng = np.random.default_rng(0)
    img = rng.random((33, 17, 3), dtype=np.float32) * 10.0
    path = str(tmp_path / "t.exr")
    exr.write_exr(path, img, pixel_type=pixel_type, compression=compression)
    back = exr.read_exr(path)
    tol = 1e-6 if pixel_type == "float" else 1e-2
    assert back.shape == img.shape
    np.testing.assert_allclose(back, img, rtol=tol, atol=tol)


def test_exr_rgba(tmp_path):
    img = np.random.default_rng(1).random((8, 8, 4)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    exr.write_exr(path, img)
    back = exr.read_exr(path)
    np.testing.assert_allclose(back, img, atol=1e-6)


def test_accumulation_image():
    acc = exr.AccumulationImage(4, 2)
    ones = np.ones((2, 4, 3))
    acc.add(ones * 4.0, np.full((2, 4), 2.0))
    img = acc.resolve()
    np.testing.assert_allclose(img, 2.0)
    # Auto exposure maps the max channel to 1.
    scaled = acc.normalize(-1.0)
    np.testing.assert_allclose(scaled.max(), 1.0)
