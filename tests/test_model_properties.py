"""TPU-design properties: fixed-shape padded eval must match ragged eval.

LFAN/CAN are frame-causal/frame-local, so right-padding the timeline must
not change the valid prefix.  JMT/MT attend over time, so a key-padding
mask must make the padded forward equal the unpadded one.
"""
import numpy as np
import jax
import jax.numpy as jnp

from fvt_tpu import constants
from fvt_tpu.models.models import LFAN, CAN, JMT

RNG = np.random.default_rng(0)


def _inputs(B, T):
    return {'vggish': RNG.normal(size=(B, T, 128)).astype(np.float32),
            'bert': RNG.normal(size=(B, T, 768)).astype(np.float32)}


def _pad(x, T_pad):
    pad = T_pad - x.shape[1]
    return np.concatenate(
        [x, np.zeros((x.shape[0], pad) + x.shape[2:], x.dtype)], axis=1)


def test_lfan_right_padding_is_exact():
    model = LFAN(modality=('vggish', 'bert'), output_dim=7)
    x = _inputs(2, 40)
    variables = model.init(jax.random.key(0),
                           jax.tree.map(jnp.asarray, x), train=False)
    out = model.apply(variables, jax.tree.map(jnp.asarray, x), train=False)
    xp = {k: jnp.asarray(_pad(v, 64)) for k, v in x.items()}
    out_p = model.apply(variables, xp, train=False)
    np.testing.assert_allclose(np.asarray(out_p[:, :40]), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_can_right_padding_is_exact():
    model = CAN(modality=('vggish', 'bert'), output_dim=7)
    x = _inputs(2, 40)
    variables = model.init(jax.random.key(0),
                           jax.tree.map(jnp.asarray, x), train=False)
    out = model.apply(variables, jax.tree.map(jnp.asarray, x), train=False)
    xp = {k: jnp.asarray(_pad(v, 64)) for k, v in x.items()}
    out_p = model.apply(variables, xp, train=False)
    np.testing.assert_allclose(np.asarray(out_p[:, :40]), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_jmt_time_mask_matches_unpadded():
    B, T, T_pad = 1, 40, 64
    x = {'video': RNG.normal(size=(B, T, 512)).astype(np.float32),
         'vggish': RNG.normal(size=(B, T, 128)).astype(np.float32)}
    model = JMT(modality=('video', 'vggish'), output_dim=7,
                model_name=constants.MT)
    variables = model.init(jax.random.key(0),
                           jax.tree.map(jnp.asarray, x), train=False)
    out = model.apply(variables, jax.tree.map(jnp.asarray, x), train=False)

    xp = {k: jnp.asarray(_pad(v, T_pad)) for k, v in x.items()}
    mask = jnp.arange(T_pad)[None, :] < T
    out_p = model.apply(variables, xp, train=False, time_mask=mask)
    np.testing.assert_allclose(np.asarray(out_p[:, :T]), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_train_mode_runs_with_dropout_and_batchstats():
    model = LFAN(modality=('vggish', 'bert'), output_dim=7)
    x = jax.tree.map(jnp.asarray, _inputs(2, 32))
    variables = model.init(jax.random.key(0), x, train=False)
    out, mutated = model.apply(
        variables, x, train=True,
        rngs={'dropout': jax.random.key(1)},
        mutable=['batch_stats'])
    assert out.shape == (2, 32, 7)
    assert 'batch_stats' in mutated
    # dropout actually fires: two different keys -> different outputs
    out2, _ = model.apply(
        variables, x, train=True,
        rngs={'dropout': jax.random.key(2)},
        mutable=['batch_stats'])
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_frozen_spatial_params_do_not_train():
    """The spatial backbone must stay bit-identical through train steps
    (reference freezes it, model.py:432-433) — including no weight decay."""
    from fvt_tpu import constants
    from fvt_tpu.train.steps import create_train_state, make_train_step
    from fvt_tpu.train import optim
    from fvt_tpu.config.defaults import get_config
    import flax.linen as nn
    from fvt_tpu.models.layers import TorchLinear

    class TinySpatial(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            return TorchLinear(16, name='dense')(
                x.reshape(x.shape[0], -1))

    from fvt_tpu.models.models import LFAN
    model = LFAN(modality=('video', 'vggish'), output_dim=7,
                 tcn_channel={'video': [8, 8], 'vggish': [8, 8]},
                 encoder_dim={'video': 8, 'vggish': 8},
                 spatial_video=TinySpatial())

    hp = optim.standardize_opt_params(get_config(constants.MELD))
    optimizer = optim.build_optimizer(hp)
    rng_np = np.random.default_rng(0)
    batch = {
        'video': jnp.asarray(rng_np.integers(
            0, 255, size=(2, 8, 8, 8, 3)).astype(np.uint8)),
        'vggish': jnp.asarray(rng_np.normal(size=(2, 8, 128)
                                            ).astype(np.float32)),
        constants.EXPR: jnp.asarray(rng_np.integers(
            0, 7, size=(2, 8)).astype(np.int32)),
    }
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    spatial_before = jax.tree.map(np.asarray,
                                  state.params['spatial_video'])
    head_before = np.asarray(
        state.params['regressor']['dense']['kernel']).copy()
    step = make_train_step(model, optimizer)
    for i in range(3):
        state, _ = step(state, batch, jax.random.key(i))
    spatial_after = jax.tree.map(np.asarray, state.params['spatial_video'])
    for a, b in zip(jax.tree.leaves(spatial_before),
                    jax.tree.leaves(spatial_after)):
        np.testing.assert_array_equal(a, b)
    # and the head DID train: its kernel moved from the INIT values (a
    # compare-to-zero here could never fail — Dense init is nonzero)
    assert not np.allclose(
        np.asarray(state.params['regressor']['dense']['kernel']),
        head_before, atol=1e-9)
