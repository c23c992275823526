"""Native C++ image IO: decode parity with PIL + prefetcher ordering."""

import numpy as np
import pytest

from orbslam2_tpu.native import Prefetcher, decode_image, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


class TestDecode:
    def test_png_gray8(self, tmp_path, rng):
        arr = rng.integers(0, 255, (37, 53), dtype=np.uint8)
        p = str(tmp_path / "g.png")
        _write_png(p, arr)
        out = decode_image(p)
        assert out is not None and out.shape == (37, 53)
        np.testing.assert_allclose(out, arr.astype(np.float32), atol=0.5)

    def test_png_gray16(self, tmp_path, rng):
        arr = rng.integers(0, 65535, (24, 31), dtype=np.uint16)
        p = str(tmp_path / "d.png")
        _write_png(p, arr)
        out = decode_image(p)
        assert out is not None
        np.testing.assert_allclose(out, arr.astype(np.float32), atol=0.5)

    def test_png_rgb(self, tmp_path, rng):
        arr = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
        p = str(tmp_path / "c.png")
        _write_png(p, arr)
        out = decode_image(p)
        assert out is not None
        expect = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
        np.testing.assert_allclose(out, expect, atol=1.0)

    def test_pgm(self, tmp_path, rng):
        arr = rng.integers(0, 255, (16, 18), dtype=np.uint8)
        p = str(tmp_path / "x.pgm")
        with open(p, "wb") as f:
            f.write(b"P5\n18 16\n255\n")
            f.write(arr.tobytes())
        out = decode_image(p)
        assert out is not None
        np.testing.assert_allclose(out, arr.astype(np.float32), atol=0.5)

    def test_missing_file(self):
        assert decode_image("/nonexistent/nope.png") is None


class TestPrefetcher:
    def test_ordered_access(self, tmp_path, rng):
        paths = []
        truth = []
        for i in range(12):
            arr = rng.integers(0, 255, (10, 10), dtype=np.uint8)
            p = str(tmp_path / f"{i}.png")
            _write_png(p, arr)
            paths.append(p)
            truth.append(arr)
        pf = Prefetcher(paths, n_threads=3, max_ahead=4)
        for i in range(12):
            out = pf.get(i)
            np.testing.assert_allclose(out, truth[i].astype(np.float32), atol=0.5)
        pf.close()
