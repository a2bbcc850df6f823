"""Serving-path (Pallas TCN) forward == flax model.apply (eval mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from fvt_tpu import constants
from fvt_tpu.models.models import LFAN
from fvt_tpu.serve import build_lfan_serving_fn


def test_lfan_serving_matches_model_apply():
    model = LFAN(modality=('vggish', 'bert'), output_dim=7)
    rng = np.random.default_rng(0)
    batch = {
        'vggish': jnp.asarray(rng.normal(size=(2, 32, 128)
                                         ).astype(np.float32)),
        'bert': jnp.asarray(rng.normal(size=(2, 32, 768)
                                       ).astype(np.float32)),
    }
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), batch)

    want = model.apply(variables, batch, train=False)
    serve_fn = build_lfan_serving_fn(model, variables, interpret=True)
    got = serve_fn(batch)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
