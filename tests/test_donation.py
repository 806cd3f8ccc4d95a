"""Buffer-donation contracts (SURVEY §5 race-detection/aliasing row).

XLA verifies donation aliasing at compile time; these tests assert the
runtime effect — the donated input buffer is actually dead after the
call (so progressive accumulation / optimizer steps reuse memory
instead of reallocating per frame/step) — and that values are
unchanged."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.renderer import AccumState, accum_add


def test_accum_add_donates_and_matches():
    cfg = RenderConfig(width=8, height=8, max_depth=1)
    acc = AccumState.create(cfg)
    old_total = acc.total
    img = jnp.full((8, 8, 3), 0.25, jnp.float32)
    acc = accum_add(acc, img)
    acc = accum_add(acc, img)
    np.testing.assert_allclose(np.asarray(acc.total), 0.5, atol=0)
    assert int(acc.count) == 2
    np.testing.assert_allclose(np.asarray(acc.resolve()), 0.25, atol=0)
    # the donated buffer must be dead — the step reuses it in place
    assert old_total.is_deleted()


def test_adam_update_donates():
    """adam_optimize's jitted update must keep values identical to the
    eager optax chain while donating the previous params/opt state."""
    import optax

    params = {"env_image": jnp.ones((4, 4, 3), jnp.float32)}
    grads = {"env_image": jnp.full((4, 4, 3), 0.5, jnp.float32)}
    opt = optax.adam(1e-1)
    opt_state = opt.init(params)

    # reference eager chain
    updates, ref_state = opt.update(grads, opt_state, params)
    ref_params = optax.apply_updates(params, updates)
    ref_params["env_image"] = jnp.maximum(ref_params["env_image"], 0.0)

    @jax.jit
    def upd(opt_state_, params_, grads_):
        u, opt_state_ = opt.update(grads_, opt_state_, params_)
        params_ = optax.apply_updates(params_, u)
        params_["env_image"] = jnp.maximum(params_["env_image"], 0.0)
        return opt_state_, params_

    upd_don = jax.jit(upd, donate_argnums=(0, 1))
    old_leaf = params["env_image"]
    new_state, new_params = upd_don(opt_state, params, grads)
    np.testing.assert_allclose(
        np.asarray(new_params["env_image"]),
        np.asarray(ref_params["env_image"]), rtol=1e-6)
    assert old_leaf.is_deleted()
