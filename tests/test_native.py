"""Native C++ data-prep library vs numpy fallbacks and reference semantics."""

import numpy as np

from gcanet_tpu.data import native


def test_native_lib_loads():
    assert native._load() is not None, "libgcadata.so should build via make"


def test_voxelize_idx_insertion_order():
    coords = np.array([[0, 1, 1, 1], [0, 2, 2, 2], [0, 1, 1, 1],
                       [1, 1, 1, 1], [0, 2, 2, 2]], np.int32)
    out, p2v, v = native.voxelize_idx(coords)
    assert v == 3
    np.testing.assert_array_equal(p2v, [0, 1, 0, 2, 1])
    np.testing.assert_array_equal(out[0], [0, 1, 1, 1])
    np.testing.assert_array_equal(out[1], [0, 2, 2, 2])
    np.testing.assert_array_equal(out[2], [1, 1, 1, 1])


def test_voxelize_matches_numpy_fallback():
    rng = np.random.RandomState(0)
    coords = np.concatenate([
        rng.randint(-5, 5, (500, 3)),
    ], axis=-1) if False else np.concatenate(
        [rng.randint(0, 2, (500, 1)), rng.randint(-5, 5, (500, 3))], axis=1)
    out_c, p2v_c, v_c = native.voxelize_idx(coords)
    lib, native._LIB = native._LIB, None
    tried, native._TRIED = native._TRIED, True
    try:
        out_n, p2v_n, v_n = native.voxelize_idx(coords)
    finally:
        native._LIB, native._TRIED = lib, tried
    assert v_c == v_n
    np.testing.assert_array_equal(p2v_c, p2v_n)
    np.testing.assert_array_equal(out_c[:v_c], out_n[:v_n])


def test_instance_info_matches_reference_semantics():
    rng = np.random.RandomState(1)
    n = 300
    xyz = rng.randn(n, 3).astype(np.float32)
    labels = rng.randint(-1, 4, n).astype(np.int32)
    semantic = rng.randint(0, 7, n).astype(np.int32)
    num, pointnum, cls, offsets = native.instance_info(xyz, labels, semantic, 8)
    assert num == labels.max() + 1
    for i in range(num):
        idx = labels == i
        assert pointnum[i] == idx.sum()
        first = np.nonzero(idx)[0][0]
        assert cls[i] == semantic[first]
        np.testing.assert_allclose(offsets[idx], xyz[idx].mean(0) - xyz[idx],
                                   atol=1e-5)
    bg = labels == -1
    np.testing.assert_allclose(offsets[bg], -100.0 - xyz[bg], atol=1e-5)


def test_relabel_small_instances_become_background():
    raw = np.array([0] * 150 + [1] * 50 + [2] * 120, np.int64)
    prim = np.array([7] * 150 + [3] * 50 + [8] * 120, np.int64)
    labels, clean = native.relabel(raw, prim, min_points=100, fold7=True)
    assert (labels[:150] == 0).all()
    assert (labels[150:200] == -1).all()      # only 50 points -> background
    assert (labels[200:] == 1).all()          # compacted id
    assert (clean[:150] == 6).all()           # 7 -> 6 fold
    assert (clean[150:200] == -1).all()
    assert (clean[200:] == 2).all()           # 8 -> 2 fold
