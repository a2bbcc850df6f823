"""Native 2D-FAN-4 port (preprocess/fan.py): architecture, weight-port
mapping, crop/decode contract.  Synthetic state dict — no torch, no
downloaded weights needed (mirrors tests/test_retinaface.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fvt_tpu.preprocess import fan as F


def synth_state_dict(rng):
    sd = {}
    for key, shape in F.expected_state_dict_shapes().items():
        sd[key] = (rng.normal(size=shape) * 0.05).astype(np.float32)
        if '.bn' in key or 'bn1.' in key or 'bn_end' in key \
                or key.endswith('downsample.0.weight'):
            if key.endswith('.weight'):
                base = key[:-len('.weight')]
                sd[base + '.bias'] = np.zeros(shape, np.float32)
                sd[base + '.running_mean'] = np.zeros(shape, np.float32)
                sd[base + '.running_var'] = np.ones(shape, np.float32)
    return sd


@pytest.fixture(scope='module')
def ported():
    sd = synth_state_dict(np.random.default_rng(0))
    params, stats = F.port_torch_state_dict(sd)
    return sd, params, stats


def test_port_matches_flax_init_tree(ported):
    _, params, stats = ported
    model = F.FAN()
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    ref = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    ref_p = jax.tree.map(lambda a: a.shape, ref['params'])
    got_p = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert ref_p == got_p
    ref_s = jax.tree.map(lambda a: a.shape, ref['batch_stats'])
    got_s = jax.tree.map(lambda a: np.asarray(a).shape, stats)
    assert ref_s == got_s


def test_forward_shape_and_finite(ported):
    _, params, stats = ported
    model = F.FAN()
    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(size=(1, 256, 256, 3)), jnp.float32)
    hm = model.apply({'params': params, 'batch_stats': stats}, x)
    assert hm.shape == (1, 64, 64, 68)
    assert bool(jnp.isfinite(hm).all())


def test_port_transposes_conv_weights(ported):
    sd, params, _ = ported
    np.testing.assert_allclose(
        np.asarray(params['conv1']['kernel']),
        sd['conv1.weight'].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(params['m0']['b1_4']['conv1']['kernel']),
        sd['m0.b1_4.conv1.weight'].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(params['l3']['bias']), sd['l3.bias'])


def test_bbox_center_scale():
    center, scale = F.bbox_to_center_scale([10, 20, 110, 140])
    np.testing.assert_allclose(center, [60.0, 80.0 - 120 * 0.12])
    np.testing.assert_allclose(scale, (100 + 120) / 195.0)


def test_transform_round_trip():
    center = np.array([120.0, 100.0])
    scale = 1.1
    p_crop = np.array([32.0, 17.0])
    p_img = F.transform_point(p_crop, center, scale, 64, invert=True)
    back = F.transform_point(p_img, center, scale, 64, invert=False)
    # int truncation costs at most one heatmap pixel each way
    assert np.abs(back - p_crop).max() <= 1.0 + 1e-9


def test_decode_heatmaps_known_peak():
    center = np.array([128.0, 128.0])
    scale = 1.0
    hm = np.zeros((64, 64, 68), np.float32)
    peak = (40, 22)  # (x, y)
    for j in range(68):
        hm[peak[1], peak[0], j] = 1.0
        hm[peak[1], peak[0] + 1, j] = 0.5   # pull +x subpixel shift
    out = F.decode_heatmaps(hm, center, scale)
    assert out.shape == (68, 2)
    # closed form: crop coords (peak + 0.25 subpixel - 0.5 + 1-based)
    expect = F.transform_point(
        [peak[0] + 1 + 0.25 - 0.5, peak[1] + 1 - 0.5],
        center, scale, 64, invert=True)
    np.testing.assert_allclose(out[0], expect)
    # all 68 identical heatmaps -> identical predictions
    assert (out == out[0]).all()


def test_decode_localizes_gaussian_in_image_coords():
    bbox = [60, 80, 190, 230]
    center, scale = F.bbox_to_center_scale(bbox)
    # put the true point at a known IMAGE coordinate, map it to the 64^2
    # heatmap frame, rasterize a gaussian there, decode, compare.
    true_img = np.array([140.0, 150.0])
    fwd = F._transform_matrix(center, scale, 64.0)
    hm_xy = (fwd @ np.array([true_img[0], true_img[1], 1.0]))[:2]
    yy, xx = np.mgrid[0:64, 0:64]
    g = np.exp(-((xx - hm_xy[0]) ** 2 + (yy - hm_xy[1]) ** 2) / 4.0)
    hm = np.repeat(g[:, :, None], 68, axis=2).astype(np.float32)
    out = F.decode_heatmaps(hm, center, scale)
    # one heatmap pixel = 200*scale/64 image px; allow ~1.5 px of grid
    px = 200.0 * scale / 64.0
    assert np.abs(out[0] - true_img).max() <= 1.5 * px, (out[0], true_img)


def test_crop_face_linear_ramp_exact():
    # bilinear resampling reproduces a linear ramp exactly, so the crop
    # is checkable in closed form (away from the zero-padded border).
    yy, xx = np.mgrid[0:300, 0:300].astype(np.float64)
    img = np.stack([xx + 2 * yy] * 3, axis=2)
    center = np.array([150.0, 150.0])
    scale = 256.0 / 200.0  # crop window ~= 256 px
    crop = F.crop_face(img, center, scale)
    assert crop.shape == (256, 256, 3)
    # the window is image rows/cols 23..277 (255 px) resized to 256
    ul = F.transform_point([1, 1], center, scale, 256, invert=True)
    br = F.transform_point([256, 256], center, scale, 256, invert=True)
    win = int(br[0]) - int(ul[0])
    i = np.arange(256)
    src = (i + 0.5) * win / 256.0 - 0.5  # half-pixel sample positions
    exp_x = src + int(ul[0])
    exp_y = src + int(ul[1])
    expect = exp_x[None, :] + 2 * exp_y[:, None]
    np.testing.assert_allclose(crop[4:-4, 4:-4, 0],
                               expect[4:-4, 4:-4], atol=1e-6)


def test_landmarks_gate_without_weights(monkeypatch, tmp_path):
    monkeypatch.delenv('FVT_FAN_WEIGHTS', raising=False)
    monkeypatch.setenv('TORCH_HOME', str(tmp_path))  # empty hub cache
    with pytest.raises(NotImplementedError):
        F.FANLandmarks()


def test_end_to_end_with_npz_weights(tmp_path, monkeypatch):
    sd = synth_state_dict(np.random.default_rng(5))
    p = tmp_path / 'fan_sd.npz'
    np.savez(p, **sd)
    monkeypatch.setenv('FVT_FAN_WEIGHTS', str(p))
    fan = F.FANLandmarks()
    img = (np.random.default_rng(6).uniform(0, 255, (240, 240, 3))
           .astype(np.uint8))
    lms = fan.predict(img, [40, 40, 200, 220])
    assert lms.shape == (68, 2)
    assert np.isfinite(lms).all()

    class FakeDetector:
        def detect(self, im):
            return [{'bbox': np.array([40., 40., 200., 220.]),
                     'score': 1.0,
                     'landmarks': np.zeros((5, 2), np.float32)}]

    out = F.extract_landmarks_68_native(img, detector=FakeDetector(),
                                        fan=fan)
    assert out.shape == (68, 2)
