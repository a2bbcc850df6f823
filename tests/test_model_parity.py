"""Golden-value parity: fvt_tpu flax models vs the reference torch models.

The reference is imported (never copied) from /root/reference; its
state_dicts are converted with fvt_tpu.models.torch_port and outputs are
compared in eval mode at fp32 tolerance.
"""
import numpy as np
import pytest

from conftest import add_reference_to_path

add_reference_to_path()

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fvt_tpu import constants  # noqa: E402
from fvt_tpu.config import model_config as MC  # noqa: E402
from fvt_tpu.models import torch_port as port  # noqa: E402
from fvt_tpu.models.tcn import TemporalConvNet  # noqa: E402
from fvt_tpu.models.layers import TorchMultiheadAttention  # noqa: E402
from fvt_tpu.models.models import LFAN, CAN, JMT  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-5)


def _sd(model):
    return {k: v for k, v in model.state_dict().items()}


def test_tcn_parity():
    from models.temporal_convolutional_model import (
        TemporalConvNet as RefTCN)
    torch.manual_seed(0)
    channels = [16, 16, 8, 8]
    ref = RefTCN(num_inputs=12, num_channels=channels, kernel_size=5,
                 dropout=0.1)
    ref.eval()

    x = np.random.default_rng(0).normal(size=(2, 12, 37)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (B, C, T)

    sd = _sd(ref)
    # tcn() expects keys rooted at a module prefix
    params = port.tcn({f'tcn.{k}': v for k, v in sd.items()}, 'tcn',
                      channels, 12)

    model = TemporalConvNet(channels, kernel_size=5, dropout=0.1)
    got = model.apply({'params': params}, jnp.asarray(x.transpose(0, 2, 1)),
                      train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               **TOL)


def test_multihead_attention_parity():
    torch.manual_seed(1)
    ref = torch.nn.MultiheadAttention(32, 4)  # seq-first
    ref.eval()
    rng = np.random.default_rng(1)
    q = rng.normal(size=(13, 3, 32)).astype(np.float32)  # (L, B, E)
    k = rng.normal(size=(17, 3, 32)).astype(np.float32)
    v = k.copy()
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(q), torch.from_numpy(k),
                      torch.from_numpy(v))
    want = want.numpy().transpose(1, 0, 2)  # -> (B, L, E)

    sd = _sd(ref)
    params = port.mha({f'm.{key}': val for key, val in sd.items()}, 'm')
    model = TorchMultiheadAttention(32, 4)
    got = model.apply({'params': params},
                      jnp.asarray(q.transpose(1, 0, 2)),
                      jnp.asarray(k.transpose(1, 0, 2)),
                      jnp.asarray(v.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def _ref_lfan(modality, example_length=300):
    from models.model import LFAN as RefLFAN
    torch.manual_seed(2)
    model = RefLFAN(backbone_settings=MC.BACKBONE_SETTINGS, output_dim=7,
                    task=constants.CLASSIFICATION, modality=modality,
                    example_length=example_length, kernel_size=5,
                    tcn_channel=MC.TCN_CHANNELS, modal_dim=32, num_heads=2,
                    root_dir='', device='cpu')
    model.init()
    model.eval()
    return model


def test_lfan_parity_vggish_bert():
    modality = ['vggish', 'bert']
    ref = _ref_lfan(modality)
    rng = np.random.default_rng(2)
    B, T = 2, 300
    vggish = rng.normal(size=(B, 1, T, 128)).astype(np.float32)
    bert = rng.normal(size=(B, 1, T, 768)).astype(np.float32)
    with torch.no_grad():
        want = ref({'vggish': torch.from_numpy(vggish.copy()),
                    'bert': torch.from_numpy(bert.copy())}).numpy()

    params, stats = port.lfan_from_torch(
        _sd(ref), modality, MC.TCN_CHANNELS, MC.EMBEDDING_DIM)
    model = LFAN(modality=tuple(modality), output_dim=7)
    got = model.apply(
        {'params': params, 'batch_stats': stats},
        {'vggish': jnp.asarray(vggish[:, 0]),
         'bert': jnp.asarray(bert[:, 0])},
        train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_can_parity_vggish_bert():
    from models.model import CAN as RefCAN
    torch.manual_seed(3)
    modality = ['vggish', 'bert']
    ref = RefCAN(task=constants.CLASSIFICATION, modalities=modality,
                 tcn_settings=MC.TCN_SETTINGS,
                 backbone_settings=MC.BACKBONE_SETTINGS, output_dim=7,
                 root_dir='', device='cpu')
    ref.eval()

    rng = np.random.default_rng(3)
    B, T = 2, 64
    vggish = rng.normal(size=(B, 1, T, 128)).astype(np.float32)
    bert = rng.normal(size=(B, 1, T, 768)).astype(np.float32)
    with torch.no_grad():
        want = ref({'vggish': torch.from_numpy(vggish.copy()),
                    'bert': torch.from_numpy(bert.copy())}).numpy()

    params, stats = port.can_from_torch(_sd(ref), modality, MC.TCN_SETTINGS)
    model = CAN(modality=tuple(modality), output_dim=7)
    got = model.apply(
        {'params': params, 'batch_stats': stats},
        {'vggish': jnp.asarray(vggish[:, 0]),
         'bert': jnp.asarray(bert[:, 0])},
        train=False)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


class _DummySpatial(torch.nn.Module):
    """Stand-in frozen visual backbone: flatten + linear to 512-d."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(7)
        self.fc = torch.nn.Linear(3 * 8 * 8, 512)

    def forward(self, x):
        return self.fc(x.reshape(x.shape[0], -1))


@pytest.mark.parametrize('model_name', [constants.JMT, constants.MT])
def test_jmt_mt_parity(model_name):
    from models.model import JMT as RefJMT

    orig = RefJMT.load_visual_backbone
    RefJMT.load_visual_backbone = lambda self, backbone_settings: \
        _DummySpatial()
    try:
        torch.manual_seed(4)
        modality = ['video', 'vggish']
        ref = RefJMT(task=constants.CLASSIFICATION, modalities=modality,
                     tcn_settings=MC.TCN_SETTINGS,
                     backbone_settings=MC.BACKBONE_SETTINGS, output_dim=7,
                     root_dir='', device='cpu', model_name=model_name)
        ref.eval()
    finally:
        RefJMT.load_visual_backbone = orig

    rng = np.random.default_rng(4)
    B, T = 1, 48
    video = rng.normal(size=(B, T, 3, 8, 8)).astype(np.float32)
    vggish = rng.normal(size=(B, 1, T, 128)).astype(np.float32)
    with torch.no_grad():
        want = ref({'video': torch.from_numpy(video.copy()),
                    'vggish': torch.from_numpy(vggish.copy())}).numpy()

    sd = _sd(ref)
    params, stats = port.jmt_from_torch(
        sd, modality, MC.TCN_SETTINGS, joint=(model_name == constants.JMT))

    # dummy spatial: torch flatten is (C, H, W); ours is (H, W, C)
    w = port._np(sd['spatial.visual.fc.weight'])  # (512, 3*8*8)
    w = w.reshape(512, 3, 8, 8).transpose(0, 2, 3, 1).reshape(512, -1)
    params['spatial_video'] = {
        'dense': {'kernel': w.T, 'bias': port._np(sd['spatial.visual.fc.bias'])}}

    import flax.linen as nn
    from fvt_tpu.models.layers import TorchLinear

    class DummySpatialJax(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):  # (N, H, W, C)
            return TorchLinear(512, name='dense')(x.reshape(x.shape[0], -1))

    # hack: TorchLinear wraps Dense under 'dense'; align the tree
    params['spatial_video'] = {'dense': params['spatial_video']}

    model = JMT(modality=('video', 'vggish'), output_dim=7,
                model_name=model_name, spatial_video=DummySpatialJax())
    got = model.apply(
        {'params': params, 'batch_stats': stats},
        {'video': jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
         'vggish': jnp.asarray(vggish[:, 0])},
        train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=1e-4)


def test_lfan_trimodal_with_real_arcface_parity():
    """FULL tri-modal LFAN — real ArcFace ResNet embedded — parity after
    porting the whole reference checkpoint (incl. spatial.visual.*)."""
    from models.model import LFAN as RefLFAN
    from models.backbone import VisualBackbone as RefVB

    orig = RefLFAN.load_visual_backbone
    torch.manual_seed(11)
    ref_vb = RefVB(use_pretrained=False, mode='ir')
    RefLFAN.load_visual_backbone = lambda self, backbone_settings: ref_vb
    try:
        modality = ['video', 'vggish', 'bert']
        ref = _ref_lfan(modality, example_length=12)
    finally:
        RefLFAN.load_visual_backbone = orig

    rng = np.random.default_rng(11)
    B, T = 1, 12
    video = rng.normal(size=(B, T, 3, 40, 40)).astype(np.float32)
    vggish = rng.normal(size=(B, 1, T, 128)).astype(np.float32)
    bert = rng.normal(size=(B, 1, T, 768)).astype(np.float32)
    with torch.no_grad():
        want = ref({'video': torch.from_numpy(video.copy()),
                    'vggish': torch.from_numpy(vggish.copy()),
                    'bert': torch.from_numpy(bert.copy())}).numpy()

    sd = _sd(ref)
    params, stats = port.lfan_from_torch(
        sd, modality, MC.TCN_CHANNELS, MC.EMBEDDING_DIM)
    sp, ss = port.spatial_from_torch(sd)
    params.update(sp)
    stats.update(ss)

    from fvt_tpu.models.arcface import VisualBackbone
    model = LFAN(modality=tuple(modality), output_dim=7,
                 spatial_video=VisualBackbone())
    got = model.apply(
        {'params': params, 'batch_stats': stats},
        {'video': jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
         'vggish': jnp.asarray(vggish[:, 0]),
         'bert': jnp.asarray(bert[:, 0])},
        train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
