"""C++ native-module tests: build availability, parity with the python
implementations, and error paths.  Skipped wholesale when no toolchain."""

import numpy as np
import pytest

from anystereo_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native module not built"
)


class TestReadPfm:
    def test_parity_with_python_reader(self, tmp_path, rng):
        from anystereo_tpu.data.frame_utils import read_pfm, write_pfm

        arr = rng.rand(25, 31).astype(np.float32) * 50
        p = str(tmp_path / "x.pfm")
        write_pfm(p, arr)
        native = native_io.read_pfm(p)
        np.testing.assert_allclose(native, arr, rtol=1e-7)
        # python reader path (which may itself dispatch to native) agrees
        np.testing.assert_allclose(read_pfm(p), native)

    def test_big_endian_pfm(self, tmp_path):
        arr = np.arange(6, dtype=">f4").reshape(2, 3)
        p = str(tmp_path / "be.pfm")
        with open(p, "wb") as f:
            f.write(b"Pf\n3 2\n1.0\n")  # positive scale = big-endian
            np.flipud(arr).astype(">f4").tofile(f)
        got = native_io.read_pfm(p)
        np.testing.assert_allclose(got, arr.astype(np.float32))

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            native_io.read_pfm("/nonexistent/file.pfm")

    def test_not_pfm_raises(self, tmp_path):
        p = str(tmp_path / "bad.pfm")
        with open(p, "wb") as f:
            f.write(b"P6\n1 1\n255\n\x00\x00\x00")
        with pytest.raises(ValueError):
            native_io.read_pfm(p)

    def test_implausible_dims_raise(self, tmp_path):
        """A corrupt header must raise ValueError, not request petabytes
        (an uncaught C++ bad_alloc would abort the whole process)."""
        p = str(tmp_path / "huge.pfm")
        with open(p, "wb") as f:
            f.write(b"Pf\n99999999 99999999\n-1.0\n")
        with pytest.raises(ValueError):
            native_io.read_pfm(p)


class TestScatterResize:
    def test_parity_with_python(self, rng):
        from anystereo_tpu.data.augment import AugmentorConfig, StereoAugmentor

        aug = StereoAugmentor(AugmentorConfig(), sparse=True)
        flow = np.zeros((40, 60, 2), np.float32)
        valid = np.zeros((40, 60), np.float32)
        ys, xs = rng.randint(0, 40, 50), rng.randint(0, 60, 50)
        flow[ys, xs, 0] = rng.rand(50) * 30
        valid[ys, xs] = 1
        fx, fy = 1.37, 0.81
        nf, nv = native_io.scatter_resize_sparse(flow, valid, fx, fy)

        # pure-python reference (the original numpy implementation)
        ht, wd = flow.shape[:2]
        coords = np.stack(np.meshgrid(np.arange(wd), np.arange(ht)), -1)
        coords = coords.reshape(-1, 2).astype(np.float32)
        ff = flow.reshape(-1, 2)
        vv = valid.reshape(-1)
        c0, f0 = coords[vv >= 1], ff[vv >= 1]
        ht1, wd1 = int(round(ht * fy)), int(round(wd * fx))
        c1 = c0 * [fx, fy]
        f1 = f0 * [fx, fy]
        xx = np.round(c1[:, 0]).astype(np.int32)
        yy = np.round(c1[:, 1]).astype(np.int32)
        keep = (xx > 0) & (xx < wd1) & (yy > 0) & (yy < ht1)
        pf = np.zeros([ht1, wd1, 2], np.float32)
        pv = np.zeros([ht1, wd1], np.int32)
        pf[yy[keep], xx[keep]] = f1[keep]
        pv[yy[keep], xx[keep]] = 1

        np.testing.assert_array_equal(nv, pv)
        np.testing.assert_allclose(nf, pf, rtol=1e-6)


class TestSampleQueries:
    def test_gather(self, rng):
        vals = rng.rand(100).astype(np.float32)
        coords = rng.rand(100, 2).astype(np.float32)
        idx = rng.permutation(100)[:17].astype(np.int64)
        v, c = native_io.sample_queries(vals, coords, idx)
        np.testing.assert_array_equal(v, vals[idx])
        np.testing.assert_array_equal(c, coords[idx])

    def test_out_of_range_raises(self):
        vals = np.zeros(4, np.float32)
        coords = np.zeros((4, 2), np.float32)
        with pytest.raises(IndexError):
            native_io.sample_queries(vals, coords, np.array([10], np.int64))

    def test_shape_mismatch_raises(self):
        """values/coords length mismatch must raise, not read past the
        shorter buffer (heap overread)."""
        vals = np.zeros(10, np.float32)
        coords = np.zeros((4, 2), np.float32)  # shorter than values
        with pytest.raises(ValueError):
            native_io.sample_queries(vals, coords, np.array([7], np.int64))


class TestScatterResizeValidation:
    def test_valid_shape_mismatch_raises(self):
        """valid dims must equal flow's [H,W] — a half-size valid map
        previously caused an out-of-bounds heap read."""
        flow = np.zeros((40, 60, 2), np.float32)
        valid = np.zeros((20, 30), np.float32)
        with pytest.raises(ValueError):
            native_io.scatter_resize_sparse(flow, valid, 1.0, 1.0)

    def test_half_even_shape_matches_python(self):
        """Output dims use round-half-to-even like the python fallback
        (lround would give 33 rows for 40*0.8125=32.5)."""
        flow = np.zeros((40, 64, 2), np.float32)
        valid = np.ones((40, 64), np.float32)
        nf, nv = native_io.scatter_resize_sparse(flow, valid, 1.0, 0.8125)
        assert nf.shape[0] == int(round(40 * 0.8125)) == 32
