"""Pallas 3x3 conv kernel parity vs lax.conv (ResNet stage shapes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fvt_tpu.ops.conv_pallas import conv3x3_pallas


@pytest.mark.parametrize('shape', [(8, 5, 5, 512, 512),
                                   (8, 10, 10, 256, 256),
                                   (4, 7, 9, 64, 128)])
def test_conv3x3_parity(shape):
    n, h, w, c, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, c, co)).astype(np.float32)
                    * 0.05)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    got = conv3x3_pallas(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
