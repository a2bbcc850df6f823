"""Parity for the secondary fusion variants vs the imported reference."""
import numpy as np
import pytest

from conftest import add_reference_to_path

add_reference_to_path()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fvt_tpu.models import torch_port as port  # noqa: E402
from fvt_tpu.models.fusion_extra import (  # noqa: E402
    IntraModalTransformerEncoder, InterModalTransformerEncoder,
    TCNAttentionBlock)


def _sd(m):
    return {k: v for k, v in m.state_dict().items()}


def test_intra_modal_encoder_parity():
    from models.transformer import IntraModalTransformerEncoder as Ref
    torch.manual_seed(0)
    ref = Ref(num_layers=2, input_dim=32, num_heads=4, dim_feedforward=64)
    ref.eval()
    x = np.random.default_rng(0).normal(size=(2, 9, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    sd = _sd(ref)
    params = {}
    for i in range(2):
        params[f'layer{i}'] = {
            'self_attn': {
                'qkv_proj': port.linear(sd, f'layers.{i}.self_attn.qkv_proj'),
                'o_proj': port.linear(sd, f'layers.{i}.self_attn.o_proj'),
            },
            'ff1': port.linear(sd, f'layers.{i}.linear_net.0'),
            'ff2': port.linear(sd, f'layers.{i}.linear_net.3'),
            'norm1': port.layernorm(sd, f'layers.{i}.norm1'),
            'norm2': port.layernorm(sd, f'layers.{i}.norm2'),
        }
    model = IntraModalTransformerEncoder(num_layers=2, input_dim=32,
                                         num_heads=4, dim_feedforward=64)
    got = model.apply({'params': params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_inter_modal_encoder_parity():
    from models.transformer import InterModalTransformerEncoder as Ref
    torch.manual_seed(1)
    modalities = ['vggish', 'bert']
    input_dim = {'vggish': 32, 'bert': 128}
    ref = Ref(modalities, input_dim, modal_dim=32, num_heads=2)
    ref.eval()
    rng = np.random.default_rng(1)
    x = {'vggish': rng.normal(size=(2, 7, 32)).astype(np.float32),
         'bert': rng.normal(size=(2, 7, 128)).astype(np.float32)}
    with torch.no_grad():
        want = ref({k: torch.from_numpy(v) for k, v in x.items()}).numpy()

    sd = _sd(ref)
    params = {
        'self_attn': {
            **{f'qkv_{m}': port.linear(
                sd, f'layers.self_attn.qkv_proj.{m}') for m in modalities},
            'o_proj': port.linear(sd, 'layers.self_attn.o_proj'),
        },
        'ff1': port.linear(sd, 'layers.linear_net.0'),
        'ff2': port.linear(sd, 'layers.linear_net.3'),
        'norm1': port.layernorm(sd, 'layers.norm1'),
        'norm2': port.layernorm(sd, 'layers.norm2'),
    }
    model = InterModalTransformerEncoder(tuple(modalities), input_dim,
                                         modal_dim=32, num_heads=2)
    got = model.apply({'params': params},
                      {k: jnp.asarray(v) for k, v in x.items()},
                      train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_tcn_attention_block_parity():
    from models.temporal_convolutional_model import AttentionBlock as Ref
    torch.manual_seed(2)
    ref = Ref(dims=16, k_size=8, v_size=16)
    ref.eval()
    # the reference hardcodes .cuda() for the mask; emulate on cpu
    import models.temporal_convolutional_model as tcm

    x = np.random.default_rng(2).normal(size=(2, 6, 16)).astype(np.float32)

    class _CpuTensor(torch.Tensor):
        pass

    orig_from_numpy = torch.from_numpy
    # monkeypatch Tensor.cuda to no-op for this call
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
    finally:
        torch.Tensor.cuda = orig_cuda

    sd = _sd(ref)
    params = {
        'key_layer': port.linear(sd, 'key_layer'),
        'query_layer': port.linear(sd, 'query_layer'),
        'value_layer': port.linear(sd, 'value_layer'),
    }
    model = TCNAttentionBlock(k_size=8, v_size=16)
    got = model.apply({'params': params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_positional_encoding_parity():
    """layers.PositionalEncoding == reference transformer.py:22-47
    (a model-zoo surface class; no live consumer in either tree)."""
    from models.transformer import PositionalEncoding as Ref
    from fvt_tpu.models.layers import PositionalEncoding

    ref = Ref(d_model=32, max_len=64)
    ref.eval()
    x = np.random.default_rng(2).normal(size=(3, 50, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = PositionalEncoding(d_model=32, max_len=64)
    got = model.apply({}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
