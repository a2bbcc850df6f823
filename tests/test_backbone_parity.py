"""ArcFace ResNet-50 + VGGish parity vs the reference torch modules."""
import numpy as np
import pytest

from conftest import add_reference_to_path

add_reference_to_path()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fvt_tpu.models.arcface import (VisualBackbone,  # noqa: E402
                                    visual_backbone_from_torch)
from fvt_tpu.models.vggish import VGGish, vggish_from_torch  # noqa: E402


def test_arcface_parity():
    from models.backbone import VisualBackbone as RefVB
    torch.manual_seed(0)
    ref = RefVB(use_pretrained=False, mode='ir')
    ref.eval()

    x = np.random.default_rng(0).normal(
        size=(4, 3, 40, 40)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    sd = {k: v for k, v in ref.state_dict().items()}
    params, stats = visual_backbone_from_torch(sd)
    model = VisualBackbone()
    got = model.apply({'params': params, 'batch_stats': stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(got)
    assert got.shape == (4, 512)
    # embeddings are l2-normalized; element tolerance after a 50-block net
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
    # cosine similarity must be ~1
    cos = (got * want).sum(axis=1)
    assert (cos > 0.99999).all(), cos


def test_vggish_parity():
    from models.backbone import VGGish as RefVGGish
    torch.manual_seed(1)
    ref = RefVGGish()
    ref.eval()

    x = np.random.default_rng(1).normal(size=(3, 96, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    params = vggish_from_torch({k: v for k, v in ref.state_dict().items()})
    model = VGGish()
    got = np.asarray(model.apply({'params': params}, jnp.asarray(x),
                                 train=False))
    assert got.shape == (3, 128)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_arcface_train_mode_running_stats_match_torch():
    """The frozen-backbone TRAIN-mode contract updates running stats
    every step; torch's running_var EMA accumulates the UNBIASED
    (n/(n-1)) batch variance. One train-mode forward through both
    stacks must leave IDENTICAL running stats (flax nn.BatchNorm would
    store the biased estimator — the drift TorchEMABatchNorm exists to
    prevent, since it is baked into checkpoints and reverse exports)."""
    import jax
    from models.backbone import VisualBackbone as RefVB

    torch.manual_seed(3)
    ref = RefVB(use_pretrained=False, mode='ir')
    ref.train()

    x = np.random.default_rng(3).normal(
        size=(4, 3, 40, 40)).astype(np.float32)
    with torch.no_grad():
        ref(torch.from_numpy(x))
    ref_sd = ref.state_dict()

    torch.manual_seed(3)
    ref0 = RefVB(use_pretrained=False, mode='ir')
    params, stats = visual_backbone_from_torch(
        {k: v for k, v in ref0.state_dict().items()})
    model = VisualBackbone()
    _, mutated = model.apply(
        {'params': params, 'batch_stats': stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
        mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(0)})
    new_stats = mutated['batch_stats']

    bb = new_stats['backbone']
    # pre-dropout BNs only: output_bn1d sits after nn.Dropout, whose
    # train-mode draws cannot match across frameworks. The unbiased
    # n/(n-1) factor is ~1.6e-4 relative at these n, so the 2e-5 rtol
    # below DOES discriminate the biased flax EMA from torch's.
    for flax_path, tprefix in (
            (bb['input_bn'], 'backbone.input_layer.1'),
            (bb['body0']['bn1'], 'backbone.body.0.res_layer.0'),
            (bb['output_bn2d'], 'backbone.output_layer.0')):
        for ours, theirs in (('mean', 'running_mean'), ('var',
                                                        'running_var')):
            want = ref_sd[f'{tprefix}.{theirs}'].numpy()
            got = np.asarray(flax_path[ours])
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6), \
                (flax_path, ours)
