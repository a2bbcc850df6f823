"""Native C++ feature-store gather: build + parity + performance sanity."""
import os
import time

import numpy as np
import pytest

from fvt_tpu.data import native_store


def test_native_gather_parity(tmp_path):
    if not native_store.ensure_built():
        pytest.skip('native library failed to build')
    rng = np.random.default_rng(0)
    for shape, dtype in [((200, 128), np.float32),
                         ((150, 96, 64), np.float16),
                         ((64, 256, 256, 3), np.uint8),
                         ((100,), np.int64)]:
        arr = (rng.normal(size=shape) * 10).astype(dtype)
        p = str(tmp_path / f'a_{len(shape)}.npy')
        np.save(p, arr)

        idx = rng.integers(0, shape[0], size=37)
        got = native_store.gather_rows(p, idx)
        assert got is not None
        np.testing.assert_array_equal(got, arr[idx])


def test_npy_header_parse(tmp_path):
    arr = np.zeros((5, 7), np.float32)
    p = str(tmp_path / 'h.npy')
    np.save(p, arr)
    offset, shape, dtype, fortran = native_store.npy_header(p)
    assert shape == (5, 7) and dtype == np.float32 and not fortran
    with open(p, 'rb') as f:
        f.seek(offset)
        data = np.frombuffer(f.read(), dtype=np.float32)
    assert data.size == 35


def test_example_builder_uses_native(tmp_path):
    from fvt_tpu.data.dataset import ExampleBuilder
    from fvt_tpu import constants
    rng = np.random.default_rng(1)
    tdir = str(tmp_path / 'trial')
    os.makedirs(tdir)
    vggish = rng.normal(size=(40, 128)).astype(np.float32)
    np.save(os.path.join(tdir, 'vggish.npy'), vggish)
    labels = rng.integers(0, 7, size=(40,))
    np.save(os.path.join(tdir, 'EXPR_continuous_label.npy'), labels)

    for use_native in (True, False):
        b = ExampleBuilder(['vggish', constants.EXPR], window_length=16,
                           use_native=use_native)
        ex = b.build([tdir, 't', 40, np.arange(8, 24)])
        np.testing.assert_allclose(ex['vggish'], vggish[8:24], atol=0)
        np.testing.assert_array_equal(ex[constants.EXPR], labels[8:24])


def test_header_cache_invalidates_on_rewrite(tmp_path):
    """compact_video_npy rewrites .npy files in place; a later gather in
    the same process must see the NEW shape, not a cached header."""
    if not native_store.ensure_built():
        pytest.skip('native library failed to build')
    p = str(tmp_path / 'v.npy')
    big = np.arange(20 * 4, dtype=np.float32).reshape(20, 4)
    np.save(p, big)
    _, shape, _, _ = native_store.npy_header(p)
    assert shape == (20, 4)
    got = native_store.gather_rows(p, np.arange(20))
    np.testing.assert_array_equal(got, big)

    small = big[:5] + 100.0
    np.save(p, small)  # in-place rewrite, same path
    _, shape2, _, _ = native_store.npy_header(p)
    assert shape2 == (5, 4)
    got2 = native_store.gather_rows(p, np.arange(5))
    np.testing.assert_array_equal(got2, small)


def test_truncated_file_falls_back_not_segfault(tmp_path):
    """A file whose data section is shorter than its header claims must
    yield an error/fallback, not an out-of-bounds read."""
    if not native_store.ensure_built():
        pytest.skip('native library failed to build')
    p = str(tmp_path / 't.npy')
    np.save(p, np.ones((100, 8), np.float32))
    offset, shape, dtype, _ = native_store.npy_header(p)
    # truncate: keep the header + 10 rows only
    keep = offset + 10 * 8 * 4
    with open(p, 'rb') as f:
        data = f.read(keep)
    with open(p, 'wb') as f:
        f.write(data)

    import ctypes
    lib = native_store._load_lib()
    idx = np.asarray([50], np.int64)  # header says valid; disk says no
    out = np.empty((1, 8), np.float32)
    rc = lib.fvt_gather_rows(
        p.encode(), offset, 8 * 4,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 1)
    assert rc == -3

    # the python wrapper degrades to None on the same inputs (and on
    # indices past the header's shape), never raising in a loader thread
    assert native_store.gather_rows(p, idx) is None
    assert native_store.gather_rows(p, np.asarray([200], np.int64)) is None


# ------------------------------------------------- fused gather + resize
def test_gather_resize_matches_python_resize(tmp_path):
    """C band-walk resize == host_resize.resize_frames_uint8 up to fp32
    summation-order rounding (<= 1 lsb), incl. rectangular frames and
    pad-by-repeat duplicate indices."""
    if not native_store.ensure_built():
        pytest.skip('native library failed to build')
    from fvt_tpu.data.host_resize import resize_frames, resize_frames_uint8

    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, size=(12, 64, 40, 3)).astype(np.uint8)
    p = str(tmp_path / 'video.npy')
    np.save(p, video)

    idx = np.asarray([0, 3, 3, 11, 7, 11, 11], np.int64)
    got = native_store.gather_resize_rows(p, idx, 48)
    assert got is not None and got.shape == (7, 48, 48, 3)
    want_u8 = resize_frames_uint8(video[idx], 48)
    diff = np.abs(got.astype(np.int32) - want_u8.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # in float space both must sit within the rounding radius
    want_f = resize_frames(video[idx], 48)
    assert np.abs(got.astype(np.float32) - want_f).max() <= 0.5 + 1e-3


def test_gather_resize_declines_non_contract_inputs(tmp_path):
    if not native_store.ensure_built():
        pytest.skip('native library failed to build')
    f32 = str(tmp_path / 'f.npy')
    np.save(f32, np.zeros((4, 64, 64, 3), np.float32))
    assert native_store.gather_resize_rows(f32, np.arange(2), 48) is None
    # already at target size: plain gather is the cheaper path
    sized = str(tmp_path / 's.npy')
    np.save(sized, np.zeros((4, 48, 48, 3), np.uint8))
    assert native_store.gather_resize_rows(sized, np.arange(2), 48) is None


def test_gather_resize_fused_center_crop_bit_identical(tmp_path):
    """crop= folds eval's center crop into the resize weight matrices:
    the output must equal cropping the full resize output BIT-identically
    (same C kernel, same per-pixel dot products — crop-after-round is
    round-after-crop for a row selection), incl. rectangular frames."""
    if not native_store.ensure_built():
        pytest.skip('native library failed to build')
    rng = np.random.default_rng(2)
    video = rng.integers(0, 256, size=(9, 96, 64, 3)).astype(np.uint8)
    p = str(tmp_path / 'video.npy')
    np.save(p, video)

    idx = np.asarray([0, 5, 5, 8, 2], np.int64)
    full = native_store.gather_resize_rows(p, idx, 48)
    crop = native_store.gather_resize_rows(p, idx, 48, crop=40)
    assert crop is not None and crop.shape == (5, 40, 40, 3)
    off = (48 - 40) // 2
    np.testing.assert_array_equal(
        crop, full[:, off:off + 40, off:off + 40])
    # degenerate crops fall back to the plain resize
    same = native_store.gather_resize_rows(p, idx, 48, crop=48)
    np.testing.assert_array_equal(same, full)


def test_builder_center_crop_all_paths_agree(tmp_path):
    """ExampleBuilder(center_crop=40) is bit-identical to slicing the
    uncropped 48^2 output, on each video path: native fused resize,
    python-fallback resize, and the recompacted video_48 store."""
    if not native_store.ensure_built():
        pytest.skip('native library failed to build')
    from fvt_tpu.data.dataset import ExampleBuilder

    rng = np.random.default_rng(3)
    tdir = str(tmp_path / 'trial')
    os.makedirs(tdir)
    video = rng.integers(0, 256, size=(10, 256, 256, 3)).astype(np.uint8)
    np.save(os.path.join(tdir, 'video.npy'), video)
    np.save(os.path.join(tdir, 'EXPR_continuous_label.npy'),
            np.zeros((10,), np.int64))
    item = [tdir, 't', 10, np.arange(10)]
    off = (48 - 40) // 2

    for use_native in (True, False):
        b = ExampleBuilder(['video'], window_length=8,
                           use_native=use_native)
        full = b.build(item)['video']
        crop = b.build(item, center_crop=40)['video']
        assert crop.shape == (10, 40, 40, 3)
        np.testing.assert_array_equal(
            crop, full[:, off:off + 40, off:off + 40],
            err_msg=f'use_native={use_native}')

    # recompacted store: 48^2 frames on disk are gathered as plain rows,
    # the crop is a slice
    from fvt_tpu.preprocess.recompact import recompact_trial
    recompact_trial(tdir, size=48)
    b = ExampleBuilder(['video'], window_length=8, use_native=True)
    full = b.build(item)['video']
    assert full.shape == (10, 48, 48, 3)
    crop = b.build(item, center_crop=40)['video']
    np.testing.assert_array_equal(
        crop, full[:, off:off + 40, off:off + 40])


def test_builder_uses_fused_resize_when_available(tmp_path):
    """ExampleBuilder's video branch produces identical output whether
    the fused C path or the python fallback runs."""
    if not native_store.ensure_built():
        pytest.skip('native library failed to build')
    from fvt_tpu.data.dataset import ExampleBuilder

    rng = np.random.default_rng(1)
    tdir = str(tmp_path / 'trial')
    os.makedirs(tdir)
    video = rng.integers(0, 256, size=(10, 256, 256, 3)).astype(np.uint8)
    np.save(os.path.join(tdir, 'video.npy'), video)
    np.save(os.path.join(tdir, 'EXPR_continuous_label.npy'),
            np.zeros((10,), np.int64))
    item = [tdir, 't', 10, np.arange(10)]

    native_b = ExampleBuilder(['video'], window_length=8, use_native=True)
    python_b = ExampleBuilder(['video'], window_length=8, use_native=False)
    a = native_b.build(item)['video']
    b = python_b.build(item)['video']
    assert a.shape == b.shape == (10, 48, 48, 3)
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1


def test_ensure_built_rebuilds_stale_library(tmp_path):
    """A fvt_store.cpp newer than the .so triggers an atomic
    temp-build-and-rename rebuild, after which the loaded library serves
    the full entry-point surface (a stale .so from an older checkout
    must not silently disable gather_resize_rows forever)."""
    import subprocess
    if not native_store.ensure_built():
        pytest.skip('native library failed to build')
    lib_dir = os.path.dirname(native_store._LIB_PATH)
    src = os.path.join(lib_dir, 'fvt_store.cpp')
    # age the library below the source
    os.utime(native_store._LIB_PATH,
             (os.path.getmtime(src) - 10, os.path.getmtime(src) - 10))
    assert native_store.ensure_built()
    assert os.path.getmtime(native_store._LIB_PATH) >= \
        os.path.getmtime(src)
    assert hasattr(native_store._load_lib(), 'fvt_gather_resize_u8')
    # no temp artifacts left behind
    assert not [f for f in os.listdir(lib_dir) if f.endswith('.tmp.so')]
    # functional after the rebuild
    p = str(tmp_path / 'v.npy')
    np.save(p, np.zeros((4, 64, 64, 3), np.uint8))
    out = native_store.gather_resize_rows(p, np.arange(2), 48)
    assert out is not None and out.shape == (2, 48, 48, 3)
