"""Native RetinaFace-R50 port (preprocess/retinaface.py).

The published checkpoint is not in this image (zero egress), so the
port is pinned structurally: a SYNTHETIC torch-layout state dict (the
exact key/shape contract of retinaface_resnet50_2020-07-20.pth,
expected_state_dict_shapes) must port loss-lessly into the flax model
and drive the full predict pipeline; the prior/decode/NMS math is
pinned against independent oracles.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fvt_tpu.preprocess import retinaface as RF


def synth_state_dict(seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in RF.expected_state_dict_shapes().items():
        if k.endswith('running_var'):
            sd[k] = np.ones(shape, np.float32)
        elif k.endswith('running_mean') or k.endswith('.bias'):
            sd[k] = np.zeros(shape, np.float32)
        elif k.endswith('.weight') and len(shape) == 1:  # bn scale
            sd[k] = np.ones(shape, np.float32)
        else:
            sd[k] = rng.normal(size=shape).astype(np.float32) * scale
    return sd


def test_prior_boxes_match_reference_formula():
    """Oracle: the itertools.product loop of retinaface/prior_box.py."""
    h = w = 64
    pri = RF.prior_boxes(h, w)
    # level feature maps: 8, 4, 2 -> anchors = 2*(8*8 + 4*4 + 2*2)
    assert pri.shape == (2 * (64 + 16 + 4), 4)
    # first anchor: level 0 (step 8), cell (0,0), min_size 16
    np.testing.assert_allclose(pri[0], [0.5 * 8 / 64, 0.5 * 8 / 64,
                                        16 / 64, 16 / 64])
    # second: same cell, min_size 32
    np.testing.assert_allclose(pri[1], [0.5 * 8 / 64, 0.5 * 8 / 64,
                                        32 / 64, 32 / 64])
    # all centers in (0, 1)
    assert (pri[:, :2] > 0).all() and (pri[:, :2] < 1).all()


def test_decode_inverts_encode():
    """decode(encode(gt)) == gt for the SSD box parameterization."""
    rng = np.random.default_rng(1)
    pri = RF.prior_boxes(64, 64)
    n = pri.shape[0]
    # ground-truth boxes near their priors
    centers = pri[:, :2] + rng.normal(size=(n, 2)) * 0.01
    sizes = pri[:, 2:] * np.exp(rng.normal(size=(n, 2)) * 0.1)
    gt = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)

    v0, v1 = RF.VARIANCES
    loc = np.concatenate([
        (centers - pri[:, :2]) / (v0 * pri[:, 2:]),
        np.log(sizes / pri[:, 2:]) / v1], axis=1)
    np.testing.assert_allclose(RF.decode_boxes(loc, pri), gt, atol=1e-5)

    # landmarks: 5 points offset from the center
    pts = centers[:, None, :] + rng.normal(size=(n, 5, 2)) * 0.01
    ldm = ((pts - pri[:, None, :2]) / (v0 * pri[:, None, 2:])
           ).reshape(n, 10)
    np.testing.assert_allclose(RF.decode_landmarks(ldm, pri), pts,
                               atol=1e-5)


def test_nms_oracle():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30],
                      [0, 0, 10, 10]], float)
    scores = np.array([0.9, 0.8, 0.7, 0.95])
    keep = RF.nms(boxes, scores, 0.4)
    # 3 (highest, same box as 0) suppresses 0 and 1; 2 is disjoint
    assert keep == [3, 2]
    assert RF.nms(boxes[:0], scores[:0], 0.4) == []


def test_postprocess_matches_ternaus_int_semantics():
    """Hand oracle for predict_jsons' double int truncation + asymmetric
    clip: boxes trunc at the padded scale, unpad, rescale, trunc again;
    landmarks trunc once after rescale; x_max clips to [x_min+1, w-1]."""
    max_size, h, w = 128, 96, 80  # scale = 128/96, pads: left=27, top=0
    left, top = 27, 0
    coeff = 96 / 128
    boxes = np.array([[30.7, 10.9, 70.2, 90.6]], np.float32)
    lands = np.array([[[31.5, 20.4], [60.9, 20.2], [45.1, 40.8],
                       [35.3, 60.9], [55.8, 61.2]]], np.float32)
    scores = np.array([0.97])
    out = RF.postprocess_detections(boxes, lands, scores, [0],
                                    left, top, max_size, h, w)
    assert len(out) == 1
    # box: trunc -> [30,10,70,90]; unpad x by 27 -> [3,10,43,90];
    # * 0.75 -> [2.25, 7.5, 32.25, 67.5] -> trunc [2, 7, 32, 67]
    np.testing.assert_array_equal(out[0]['bbox'], [2, 7, 32, 67])
    want_l5 = ((lands[0] - [27, 0]) * coeff).astype(int)
    np.testing.assert_array_equal(out[0]['landmarks'], want_l5)
    assert out[0]['score'] == pytest.approx(0.97)

    # degenerate thin box at the border: x_max >= x_min + 1 enforced
    bx = np.array([[127.0, 0.0, 127.5, 1.0]], np.float32)
    out = RF.postprocess_detections(bx, lands[:, :, :], scores, [0],
                                    0, 0, max_size, h, w)
    x0, y0, x1, y1 = out[0]['bbox']
    assert x1 >= x0 + 1 or x1 == w - 1
    assert 0 <= x0 <= w - 1 and 0 <= y0 <= h - 1


def test_port_and_forward_shapes():
    """The synthetic torch-layout state dict ports into the flax model
    with the SAME tree the model initializes (no orphan/missing leaves)
    and the forward produces anchor-aligned outputs."""
    sd = synth_state_dict()
    params, stats = RF.port_torch_state_dict(sd)

    model = RF.RetinaFaceNet()
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    ref_vars = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    got_tree = jax.tree_util.tree_structure(
        {'params': params, 'batch_stats': stats})
    assert got_tree == jax.tree_util.tree_structure(
        {'params': ref_vars['params'],
         'batch_stats': ref_vars['batch_stats']})
    # shapes agree leaf-by-leaf
    jax.tree_util.tree_map(
        lambda a, b: None if np.shape(a) == b.shape else
        (_ for _ in ()).throw(AssertionError((np.shape(a), b.shape))),
        {'params': params, 'batch_stats': stats},
        {'params': ref_vars['params'],
         'batch_stats': ref_vars['batch_stats']})

    loc, conf, ldm = model.apply(
        {'params': params, 'batch_stats': stats}, x)
    n_anchors = RF.prior_boxes(128, 128).shape[0]
    assert loc.shape == (1, n_anchors, 4)
    assert conf.shape == (1, n_anchors, 2)
    assert ldm.shape == (1, n_anchors, 10)
    # softmaxed confidences
    np.testing.assert_allclose(np.asarray(conf).sum(-1), 1.0, atol=1e-5)


def test_detector_contract_end_to_end(tmp_path):
    """RetinaFaceJAX behind the faces.py contract: weights loaded from a
    (synthetic, torch-saved) checkpoint file, detect() returns the
    bbox/score/landmarks dicts sorted by score, thresholding works."""
    import torch
    # near-zero weights -> head logits ~0 -> softmax scores ~0.5: the
    # 0.9 threshold must reject everything, threshold 0 returns all
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in synth_state_dict(scale=1e-4).items()}
    path = str(tmp_path / 'retinaface_resnet50_2020-07-20.pth')
    torch.save(sd, path)

    det = RF.RetinaFaceJAX(confidence_threshold=0.9, max_size=128,
                           weights_path=path)
    img = np.random.default_rng(3).integers(
        0, 255, size=(96, 80, 3)).astype(np.uint8)
    out = det.detect(img)
    # random weights -> near-0.5 scores; threshold .9 rejects them
    assert out == []

    det.threshold = 0.0
    out = det.detect(img)
    assert out, 'threshold 0 must return detections'
    scores = [d['score'] for d in out]
    assert scores == sorted(scores, reverse=True)
    for d in out:
        assert d['bbox'].shape == (4,)
        assert d['landmarks'].shape == (5, 2)
        x0, y0, x1, y1 = d['bbox']
        assert 0 <= x0 <= x1 <= 80 - 1 and 0 <= y0 <= y1 <= 96 - 1
