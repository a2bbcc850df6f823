"""Host-side frame resize == jax.image.resize kernel; pipeline parity."""
import numpy as np
import pytest

from fvt_tpu.data.host_resize import (resize_frames, resize_frames_uint8,
                                      resize_weights)


@pytest.mark.parametrize('n_in,n_out', [(256, 48), (64, 48), (8, 48),
                                        (48, 48)])
def test_weights_match_jax_image(n_in, n_out):
    """The numpy weight matrix reproduces jax.image.resize bilinear
    (incl. the antialiased downsample kernel) exactly."""
    import jax
    import jax.numpy as jnp
    eye = np.eye(n_in, dtype=np.float32)
    want = np.asarray(jax.image.resize(jnp.asarray(eye), (n_out, n_in),
                                       method='bilinear'))
    got = resize_weights(n_in, n_out)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_frames_matches_device_resize():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, size=(3, 256, 256, 3)).astype(np.uint8)
    got = resize_frames(video, 48)
    want = np.asarray(jax.image.resize(
        jnp.asarray(video).astype(jnp.float32), (3, 48, 48, 3),
        method='bilinear'))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_uint8_round_small_error():
    rng = np.random.default_rng(1)
    video = rng.integers(0, 255, size=(2, 256, 256, 3)).astype(np.uint8)
    f = resize_frames(video, 48)
    u = resize_frames_uint8(video, 48)
    assert u.dtype == np.uint8
    assert np.abs(u.astype(np.float32) - f).max() <= 0.5 + 1e-3


def test_builder_host_resize_pipeline_equivalence(tmp_path):
    """Host-resized 48^2 uint8 frames through the eval step == raw 256^2
    frames through the device-resize path, up to the uint8 rounding the
    reference's own GroupScale applies (<=0.5/255 per pixel pre-norm)."""
    import os
    import jax
    import jax.numpy as jnp
    from fvt_tpu import constants
    from fvt_tpu.data.dataset import ExampleBuilder
    from fvt_tpu.train.steps import _device_transform

    rng = np.random.default_rng(2)
    tdir = str(tmp_path / 'trial')
    os.makedirs(tdir)
    video = rng.integers(0, 255, size=(10, 256, 256, 3)).astype(np.uint8)
    np.save(os.path.join(tdir, 'video.npy'), video)
    np.save(os.path.join(tdir, 'EXPR_continuous_label.npy'),
            np.zeros((10,), np.int64))

    item = [tdir, 't', 10, np.arange(10)]
    host = ExampleBuilder(['video'], window_length=8,
                          host_resize=True).build(item)
    dev = ExampleBuilder(['video'], window_length=8,
                         host_resize=False).build(item)
    assert host['video'].shape == (10, 48, 48, 3)
    assert host['video'].dtype == np.uint8
    assert dev['video'].shape == (10, 256, 256, 3)

    out_h = np.asarray(_device_transform(
        {'video': jnp.asarray(host['video'][None])}, train=False)['video'])
    out_d = np.asarray(_device_transform(
        {'video': jnp.asarray(dev['video'][None])}, train=False)['video'])
    assert out_h.shape == out_d.shape == (1, 10, 40, 40, 3)
    # normalized units: 0.5/255 / 0.5 = 0.0039 max rounding error
    assert np.abs(out_h - out_d).max() <= 0.5 / 255 / 0.5 + 1e-4
