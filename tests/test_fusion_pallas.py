"""Pallas fused multimodal fusion == flax MultimodalTransformerEncoder."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fvt_tpu.models.fusion import MultimodalTransformerEncoder
from fvt_tpu.ops.fusion_pallas import fused_multimodal_fusion


@pytest.mark.parametrize('mods,dims', [
    (('video', 'vggish', 'bert'), {'video': 128, 'vggish': 32,
                                   'bert': 128}),
    (('vggish', 'bert'), {'vggish': 32, 'bert': 128}),
])
def test_fused_fusion_matches_flax(mods, dims):
    modal_dim, heads = 32, 2
    model = MultimodalTransformerEncoder(mods, dims, modal_dim, heads,
                                         dropout=0.1)
    rng = np.random.default_rng(0)
    B, T = 2, 64
    x = {m: jnp.asarray(rng.normal(size=(B, T, dims[m])
                                   ).astype(np.float32)) for m in mods}
    variables = model.init(jax.random.key(0), x, train=False)

    want = model.apply(variables, x, train=False)
    got = fused_multimodal_fusion(x, variables['params'], mods, modal_dim,
                                  heads, time_tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
