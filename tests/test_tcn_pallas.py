"""Pallas fused TCN block vs the flax TemporalConvNet (eval mode)."""
import numpy as np
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
