"""Round-trip tests for the ply/xyz IO (reference utils/main_utils.py:58-117)."""

import numpy as np

from gcanet_tpu.utils import io


def test_ply_roundtrip_points_only(tmp_path):
    pts = np.random.RandomState(0).randn(50, 3)
    fn = str(tmp_path / "a.ply")
    io.write_ply(fn, pts)
    rpts, rnrm, rrgb = io.read_ply(fn)
    np.testing.assert_allclose(rpts, pts, atol=1e-6)
    assert rnrm is None and rrgb is None
    head = open(fn).read().split("end_header")[0]
    assert "element vertex 50" in head


def test_ply_roundtrip_normals_colors(tmp_path):
    rs = np.random.RandomState(1)
    pts, nrm = rs.randn(20, 3), rs.randn(20, 3)
    rgb = rs.rand(20, 3)
    fn = str(tmp_path / "b.ply")
    io.write_ply(fn, pts, normal=nrm, color=rgb)
    rpts, rnrm, rrgb = io.read_ply(fn)
    np.testing.assert_allclose(rpts, pts, atol=1e-6)
    np.testing.assert_allclose(rnrm, nrm, atol=1e-6)
    np.testing.assert_allclose(rrgb, rgb, atol=1.0 / 255)


def test_xyz_roundtrip(tmp_path):
    rs = np.random.RandomState(2)
    pts, nrm = rs.randn(30, 3), rs.randn(30, 3)
    fn = str(tmp_path / "c.xyz")
    io.write_xyz_files(fn, pts, nrm)
    rpts, rnrm = io.read_xyz_files(fn, normal=True)
    np.testing.assert_allclose(rpts, pts, atol=1e-5)
    np.testing.assert_allclose(rnrm, nrm, atol=1e-5)

    fn2 = str(tmp_path / "d.xyz")
    io.write_xyz_files(fn2, pts)
    np.testing.assert_allclose(io.read_xyz_files(fn2, normal=False), pts,
                               atol=1e-5)
