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
