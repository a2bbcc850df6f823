"""Param freezing: frozen leaves unchanged, staged release unlocks them."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from fvt_tpu.train.param_control import path_mask, freeze, ParamControl


def _params():
    return {
        'backbone': {'conv': {'kernel': jnp.ones((4, 4))}},
        'head': {'dense': {'kernel': jnp.ones((4, 2)),
                           'bias': jnp.zeros((2,))}},
    }


def test_path_mask():
    p = _params()
    m = path_mask(p, ['head'])
    assert m['head']['dense']['kernel'] and m['head']['dense']['bias']
    assert not m['backbone']['conv']['kernel']
    m_all = path_mask(p, [])
    assert m_all['backbone']['conv']['kernel']


def test_freeze_blocks_updates():
    p = _params()
    opt = freeze(optax.sgd(0.1), p, ['head'])
    state = opt.init(p)
    grads = jax.tree.map(jnp.ones_like, p)
    updates, _ = opt.update(grads, state, p)
    new = optax.apply_updates(p, updates)
    np.testing.assert_array_equal(np.asarray(new['backbone']['conv'][
        'kernel']), np.ones((4, 4)))  # frozen
    assert (np.asarray(new['head']['dense']['kernel']) != 1).all()


def test_staged_release():
    """Reference semantics (parameter_control.py:82-105): the head
    trains from the start, staged groups stay frozen until release()
    pops them in order, and exhausting the stack sets early_stop."""
    p = _params()
    pc = ParamControl([['backbone']], release_count=1,
                      base_patterns=['head'])
    opt = freeze(optax.sgd(0.1), p, pc.current_patterns())
    grads = jax.tree.map(jnp.ones_like, p)
    updates, _ = opt.update(grads, opt.init(p), p)
    new = optax.apply_updates(p, updates)
    # nothing released yet: backbone frozen, head training
    assert (np.asarray(new['backbone']['conv']['kernel']) == 1).all()
    assert (np.asarray(new['head']['dense']['kernel']) != 1).all()

    assert pc.can_release()
    opt2 = pc.release(optax.sgd(0.1), p)
    updates, _ = opt2.update(grads, opt2.init(p), p)
    new = optax.apply_updates(p, updates)
    assert (np.asarray(new['backbone']['conv']['kernel']) != 1).all()
    assert not pc.can_release()

    # a further release sets the reference's early-stop flag
    assert not pc.early_stop
    pc.release(optax.sgd(0.1), p)
    assert pc.early_stop
