"""2-D ('data','model') mesh expressibility (SURVEY §2.4 TP row).

These models are far below TP scale (<10 M trainable params), so no TP
is shipped — but the sharding design must stay EXPRESSIBLE on a richer
mesh: any param may carry a PartitionSpec over a 'model' axis and GSPMD
inserts the collectives.  This pins that contract concretely: the LFAN
head's Dense kernel sharded over 'model' on a (4, 2) ('data','model')
mesh reproduces single-device logits, with the batch sharded over
'data' at the same time.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fvt_tpu.models.models import LFAN
from fvt_tpu.parallel.mesh import make_mesh_nd, replicated
from fvt_tpu.train.steps import make_eval_step


def test_model_axis_sharded_head_matches_single_device():
    model = LFAN(modality=('vggish', 'bert'), output_dim=7)
    rng = np.random.default_rng(0)
    batch = {
        'vggish': jnp.asarray(rng.normal(size=(8, 12, 128))
                              .astype(np.float32)),
        'bert': jnp.asarray(rng.normal(size=(8, 12, 768))
                            .astype(np.float32)),
    }
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), batch)
    params = variables['params']
    stats = variables.get('batch_stats', {})

    step = make_eval_step(model)
    ref = np.asarray(step(params, stats, batch))

    mesh = make_mesh_nd((4, 2))  # ('data', 'model')
    assert mesh.shape == {'data': 4, 'model': 2}
    repl = replicated(mesh)

    shardings = jax.tree.map(lambda _: repl, params)
    # the head's CONTRACTION dim split across 'model': GSPMD must
    # insert the partial-sum all-reduce for the logits to be right
    k = params['regressor']['dense']['kernel']
    assert k.shape[0] % 2 == 0, k.shape
    shardings['regressor']['dense']['kernel'] = NamedSharding(
        mesh, P('model', None))

    p2 = jax.tree.map(jax.device_put, params, shardings)
    s2 = jax.device_put(stats, repl)
    b2 = {k: jax.device_put(v, NamedSharding(mesh, P('data')))
          for k, v in batch.items()}
    with mesh:
        got = np.asarray(step(p2, s2, b2))

    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
