"""Two-way checkpoint interop: fvt_tpu -> torch export round-trips.

For each fusion model the IMPORTED reference model's state_dict is ported
to fvt_tpu (torch_port) and exported back (torch_export); the exported
dict must carry EXACTLY the reference's key set, load via
``load_state_dict(strict=True)`` (/root/reference/experiment.py:242-247),
be bit-identical to the original tensors, and leave the reference
forward unchanged.  This is the contract that lets a TPU-trained
best-model deploy into the reference ecosystem (tools/port_checkpoint.py
--reverse; the trained-checkpoint version runs in tools/twin_train.py).
"""
import numpy as np
import pytest
import torch

from conftest import add_reference_to_path

add_reference_to_path()

from fvt_tpu import constants  # noqa: E402
from fvt_tpu.config import model_config as MC  # noqa: E402
from fvt_tpu.models import torch_export as export  # noqa: E402
from fvt_tpu.models import torch_port as port  # noqa: E402


# synthesized-as-zeros keys: dead modules the reference constructs but
# never calls in forward (CAN.conv_c model.py:607, VisualBackbone.logits
# backbone.py:105) — presence matters for strict=True, values don't
_DEAD = ('num_batches_tracked', 'conv_c.', 'spatial.visual.logits.',
         'fuse.reduce_feats_dim.')


def _roundtrip_and_check(ref, np_sd):
    """Assert exact key set, bit-exact tensors, strict load, and an
    unchanged forward after reload."""
    sd = {k: v for k, v in ref.state_dict().items()}
    assert set(np_sd) == set(sd), (
        sorted(set(sd) - set(np_sd))[:5], sorted(set(np_sd) - set(sd))[:5])
    for k in sd:
        if any(t in k for t in _DEAD):
            continue
        d = float(np.abs(sd[k].numpy() - np_sd[k]).max())
        assert d == 0.0, (k, d)
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in np_sd.items()}
    ref.load_state_dict(torch_sd, strict=True)


def test_lfan_export_strict_roundtrip():
    from models.model import LFAN as RefLFAN
    torch.manual_seed(2)
    modality = ['vggish', 'bert']
    ref = RefLFAN(backbone_settings=MC.BACKBONE_SETTINGS, output_dim=7,
                  task=constants.CLASSIFICATION, modality=modality,
                  example_length=300, kernel_size=5,
                  tcn_channel=MC.TCN_CHANNELS, modal_dim=32, num_heads=2,
                  root_dir='', device='cpu')
    ref.init()
    ref.eval()

    rng = np.random.default_rng(2)
    feats = {'vggish': torch.from_numpy(
                 rng.normal(size=(2, 1, 300, 128)).astype(np.float32)),
             'bert': torch.from_numpy(
                 rng.normal(size=(2, 1, 300, 768)).astype(np.float32))}
    with torch.no_grad():
        want = ref({k: v.clone() for k, v in feats.items()}).numpy()

    params, stats = port.lfan_from_torch(
        {k: v for k, v in ref.state_dict().items()}, modality,
        MC.TCN_CHANNELS, MC.EMBEDDING_DIM)
    np_sd = export.lfan_to_torch(params, stats, modality,
                                 MC.TCN_CHANNELS, MC.EMBEDDING_DIM)
    _roundtrip_and_check(ref, np_sd)

    with torch.no_grad():
        got = ref({k: v.clone() for k, v in feats.items()}).numpy()
    np.testing.assert_array_equal(got, want)


def test_can_export_strict_roundtrip():
    from models.model import CAN as RefCAN
    torch.manual_seed(3)
    modality = ['vggish', 'bert']
    ref = RefCAN(task=constants.CLASSIFICATION, modalities=modality,
                 tcn_settings=MC.TCN_SETTINGS,
                 backbone_settings=MC.BACKBONE_SETTINGS, output_dim=7,
                 root_dir='', device='cpu')
    ref.eval()

    params, stats = port.can_from_torch(
        {k: v for k, v in ref.state_dict().items()}, modality,
        MC.TCN_SETTINGS)
    np_sd = export.can_to_torch(params, stats, modality, MC.TCN_SETTINGS)
    _roundtrip_and_check(ref, np_sd)


@pytest.mark.parametrize('model_name', [constants.JMT, constants.MT])
def test_jmt_mt_export_strict_roundtrip(model_name):
    """JMT/MT with the REAL embedded ArcFace backbone: the export must
    reproduce the full tri-part key set incl. spatial.visual.backbone.*."""
    from models.model import JMT as RefJMT
    from models.backbone import VisualBackbone as RefVB

    orig = RefJMT.load_visual_backbone
    torch.manual_seed(4)
    ref_vb = RefVB(use_pretrained=False, mode='ir')
    RefJMT.load_visual_backbone = lambda self, backbone_settings: ref_vb
    try:
        modality = ['video', 'vggish']
        ref = RefJMT(task=constants.CLASSIFICATION, modalities=modality,
                     tcn_settings=MC.TCN_SETTINGS,
                     backbone_settings=MC.BACKBONE_SETTINGS, output_dim=7,
                     root_dir='', device='cpu', model_name=model_name)
        ref.eval()
    finally:
        RefJMT.load_visual_backbone = orig

    sd = {k: v for k, v in ref.state_dict().items()}
    params, stats = port.jmt_from_torch(
        sd, modality, MC.TCN_SETTINGS, joint=(model_name == constants.JMT))
    sp, ss = port.spatial_from_torch(sd)
    params.update(sp)
    stats.update(ss)
    np_sd = export.jmt_to_torch(params, stats, modality, MC.TCN_SETTINGS,
                                joint=(model_name == constants.JMT))
    _roundtrip_and_check(ref, np_sd)


def test_port_checkpoint_reverse_cli(tmp_path):
    """End-to-end CLI: msgpack best-model -> --reverse -> model.pt loads
    strict into the reference LFAN."""
    import sys
    from os.path import dirname, join
    sys.path.insert(0, join(dirname(dirname(__file__)), 'tools'))
    import port_checkpoint

    from flax import serialization
    from models.model import LFAN as RefLFAN

    torch.manual_seed(5)
    modality = ['vggish', 'bert']
    ref = RefLFAN(backbone_settings=MC.BACKBONE_SETTINGS, output_dim=7,
                  task=constants.CLASSIFICATION, modality=modality,
                  example_length=300, kernel_size=5,
                  tcn_channel=MC.TCN_CHANNELS, modal_dim=32, num_heads=2,
                  root_dir='', device='cpu')
    ref.init()

    params, stats = port.lfan_from_torch(
        {k: v for k, v in ref.state_dict().items()}, modality,
        MC.TCN_CHANNELS, MC.EMBEDDING_DIM)
    msgpack = tmp_path / 'model.msgpack'
    with open(msgpack, 'wb') as f:
        f.write(serialization.to_bytes({'params': params,
                                        'batch_stats': stats}))

    out = tmp_path / 'model.pt'
    port_checkpoint.main(['--reverse', '--model_name', 'LFAN',
                          '--modality', 'vggish+bert',
                          '--in', str(msgpack), '--out', str(out)])
    sd = torch.load(out, map_location='cpu')
    ref.load_state_dict(sd, strict=True)
