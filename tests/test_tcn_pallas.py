"""Pallas fused TCN block vs the flax TemporalConvNet (eval mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fvt_tpu.models.tcn import TemporalConvNet
from fvt_tpu.ops.tcn_pallas import tcn_forward_pallas, fused_temporal_block


def test_tcn_pallas_matches_flax():
    channels = [32, 32, 16, 16]
    model = TemporalConvNet(channels, kernel_size=5, dropout=0.1)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 24)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)

    want = model.apply(variables, jnp.asarray(x), train=False)
    got = tcn_forward_pallas(jnp.asarray(x), variables['params'],
                             channels, kernel_size=5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_block_no_downsample():
    """in==out channels: identity residual path."""
    rng = np.random.default_rng(1)
    cin = cout = 16
    k, d = 3, 2
    x = rng.normal(size=(1, 32, cin)).astype(np.float32)
    w1 = rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(k, cout, cout)).astype(np.float32) * 0.1
    b1 = rng.normal(size=(cout,)).astype(np.float32)
    b2 = rng.normal(size=(cout,)).astype(np.float32)

    got = fused_temporal_block(jnp.asarray(x), jnp.asarray(w1),
                               jnp.asarray(b1), jnp.asarray(w2),
                               jnp.asarray(b2), None, None,
                               kernel_size=k, dilation=d, interpret=True)

    # numpy oracle
    def causal_conv(inp, w, b, dil):
        pad = (w.shape[0] - 1) * dil
        xp = np.pad(inp, ((pad, 0), (0, 0)))
        out = np.zeros((inp.shape[0], w.shape[2]), np.float32)
        for kk in range(w.shape[0]):
            out += xp[kk * dil:kk * dil + inp.shape[0]] @ w[kk]
        return out + b

    def leaky(v):
        return np.where(v >= 0, v, 0.01 * v)

    h = leaky(causal_conv(x[0], w1, b1, d))
    net = leaky(causal_conv(h, w2, b2, d))
    want = leaky(net + x[0])
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-4,
                               atol=1e-5)


# ---------------------------------------------------------------- train path
def _ref_block(x, w1, b1, w2, b2, m1, m2, res, *, kernel_size, dilation):
    """Pure-jnp reference of the fused train block (same masks)."""
    import jax
    import jax.numpy as jnp
    pad = (kernel_size - 1) * dilation

    def causal_conv(inp, w, b):
        xp = jnp.pad(inp, ((0, 0), (pad, 0), (0, 0)))
        acc = 0.
        for k in range(kernel_size):
            acc = acc + xp[:, k * dilation:k * dilation + inp.shape[1]] @ w[k]
        return acc + b

    h = jax.nn.leaky_relu(causal_conv(x, w1, b1), negative_slope=0.01) * m1
    net = jax.nn.leaky_relu(causal_conv(h, w2, b2),
                            negative_slope=0.01) * m2
    return jax.nn.leaky_relu(net + res, negative_slope=0.01)


@pytest.mark.parametrize('dropout', [0.0, 0.3])
def test_fused_block_train_grad_parity(dropout):
    """custom-VJP grads == jax.grad of the pure-jnp block with the SAME
    masks, for inputs, both convs, biases, and the residual stream."""
    import jax
    import jax.numpy as jnp
    from fvt_tpu.ops.tcn_pallas import fused_temporal_block_train

    ks, dil, b, t, cin, cout = 3, 2, 2, 16, 8, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, cin)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(ks, cin, cout)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(ks, cout, cout)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(b, t, cout)).astype(np.float32))
    if dropout:
        keep = 1 - dropout
        m1 = (rng.random((b, t, cout)) < keep).astype(np.float32) / keep
        m2 = (rng.random((b, t, cout)) < keep).astype(np.float32) / keep
        m1, m2 = jnp.asarray(m1), jnp.asarray(m2)
    else:
        m1 = m2 = jnp.ones((b, t, cout), jnp.float32)

    tgt = jnp.asarray(rng.normal(size=(b, t, cout)).astype(np.float32))

    def loss_fused(x, w1, b1, w2, b2, res):
        out = fused_temporal_block_train(
            x, w1, b1, w2, b2, m1, m2, res,
            kernel_size=ks, dilation=dil, interpret=True)
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(x, w1, b1, w2, b2, res):
        out = _ref_block(x, w1, b1, w2, b2, m1, m2, res,
                         kernel_size=ks, dilation=dil)
        return jnp.sum((out - tgt) ** 2)

    args = (x, w1, b1, w2, b2, res)
    out_f = fused_temporal_block_train(
        x, w1, b1, w2, b2, m1, m2, res, kernel_size=ks, dilation=dil,
        interpret=True)
    out_r = _ref_block(*args[:5], m1, m2, res, kernel_size=ks, dilation=dil)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)

    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_fused_tcn_train_step_matches_xla_at_dropout0(tmp_path):
    """A full LFAN train step with tcn_fused=True produces the same loss
    and grads as the XLA path when dropout is 0 (fp32 tolerance)."""
    import jax
    import jax.numpy as jnp
    from fvt_tpu import constants
    from fvt_tpu.models.models import LFAN
    from fvt_tpu.train.steps import create_train_state, make_train_step
    from fvt_tpu.train import optim
    from fvt_tpu.config.defaults import get_config

    hp = optim.standardize_opt_params(get_config(constants.MELD))
    optimizer = optim.build_optimizer(hp)

    rng = np.random.default_rng(1)
    batch = {
        'vggish': jnp.asarray(rng.normal(size=(2, 16, 128)
                                         ).astype(np.float32)),
        'bert': jnp.asarray(rng.normal(size=(2, 16, 768)
                                       ).astype(np.float32)),
        constants.EXPR: jnp.asarray(rng.integers(0, 7, size=(2, 16)
                                                 ).astype(np.int32)),
    }

    losses, states = [], []
    for fused in (False, True):
        model = LFAN(modality=('vggish', 'bert'), output_dim=7,
                     tcn_dropout=0.0, fusion_dropout=0.0, tcn_fused=fused)
        state = create_train_state(model, optimizer, batch,
                                   jax.random.key(0))
        step = make_train_step(model, optimizer)
        state, loss = step(state, batch, jax.random.key(1))
        losses.append(float(loss))
        states.append(state)

    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(states[0].params),
                    jax.tree.leaves(states[1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_fused_tcn_train_step_runs_with_dropout():
    """tcn_fused + dropout>0 draws masks from the step's dropout rng
    (make_rng wiring) and trains without error; loss is finite and the
    step is deterministic given the rng."""
    import jax
    import jax.numpy as jnp
    from fvt_tpu import constants
    from fvt_tpu.models.models import LFAN
    from fvt_tpu.train.steps import create_train_state, make_train_step
    from fvt_tpu.train import optim
    from fvt_tpu.config.defaults import get_config

    hp = optim.standardize_opt_params(get_config(constants.MELD))
    optimizer = optim.build_optimizer(hp)
    rng = np.random.default_rng(2)
    batch = {
        'vggish': jnp.asarray(rng.normal(size=(2, 16, 128)
                                         ).astype(np.float32)),
        constants.EXPR: jnp.asarray(rng.integers(0, 7, size=(2, 16)
                                                 ).astype(np.int32)),
    }
    model = LFAN(modality=('vggish',), output_dim=7, tcn_dropout=0.1,
                 tcn_fused=True)
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    step = make_train_step(model, optimizer)
    _, l1 = step(state, batch, jax.random.key(5))
    _, l2 = step(state, batch, jax.random.key(5))
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)  # same rng -> same masks


def test_pallas_train_auto_gated_on_backbone_modalities():
    """--pallas_train must never make a workload slower silently: the
    fused TCN train kernel measured slower than XLA on backbone-carrying
    (video/logmel) steps, so init_model gates it to feature-only
    modalities (round-3 VERDICT #4)."""
    from types import SimpleNamespace
    from fvt_tpu.models.registry import init_model
    from fvt_tpu import constants

    def make_args(modality):
        return SimpleNamespace(
            modality=modality, num_classes=7, dataset_name='MELD',
            use_other_class=False, model_name=constants.LFAN,
            task=constants.CLASSIFICATION, tcn_kernel_size=5,
            modal_dim=32, num_heads=2, pallas_train=True)

    tri = init_model(make_args('video+vggish+bert+EXPR_continuous_label'))
    assert tri.tcn_fused is False
    feat = init_model(make_args('vggish+bert+EXPR_continuous_label'))
    assert feat.tcn_fused is True
