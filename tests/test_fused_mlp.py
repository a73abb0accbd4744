"""Fused MLP fwd/bwd Pallas kernel vs the flax reference (CPU interpret).

The kernel must be a drop-in for networks.MLP (linear final layer): same
outputs and same gradients for x, kernels, and biases — exercised with
odd, padding-requiring shapes and both supported precisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu.training import fused_mlp, networks


def _flax_apply(sizes, activation, params, x):
    mlp = networks.MLP(layer_sizes=list(sizes), activation=activation)
    return mlp.apply(params, x)


@pytest.mark.parametrize(
    "sizes,act_name,act",
    [
        ((256,) * 5 + (1,), "swish", jax.nn.swish),
        ((32,) * 4 + (16,), "swish", jax.nn.swish),
        ((64, 64, 8), "relu", jax.nn.relu),
        ((40, 3), "tanh", jnp.tanh),
    ],
)
def test_dense_chain_matches_flax_fwd_and_grads(sizes, act_name, act):
    key = jax.random.PRNGKey(0)
    obs = 87
    x = jax.random.normal(key, (137, obs))  # odd row count: exercises padding
    mlp = networks.MLP(layer_sizes=list(sizes), activation=act)
    params = mlp.init(key, x)
    kernels, biases = fused_mlp.flax_mlp_params(params)

    y_ref = _flax_apply(sizes, act, params, x)
    y_fused = fused_mlp.dense_chain(
        x, kernels, biases, activation=act_name, matmul_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=2e-5, atol=2e-5
    )

    # gradients: d mean(f(x)^2) / d {params, x}
    def loss_ref(params, x):
        return jnp.mean(_flax_apply(sizes, act, params, x) ** 2)

    def loss_fused(kb, x):
        k, b = kb
        return jnp.mean(
            fused_mlp.dense_chain(
                x, k, b, activation=act_name, matmul_dtype=jnp.float32
            )
            ** 2
        )

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    (gk, gb), gx = jax.grad(loss_fused, argnums=(0, 1))((kernels, biases), x)
    gk_ref, gb_ref = fused_mlp.flax_mlp_params(gp_ref)
    for a, b_ in zip(gk, gk_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)
    for a, b_ in zip(gb, gb_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-5)


def test_dense_chain_bf16_close():
    """bf16 matmul inputs (the TPU-default contraction precision): outputs
    track f32 within bf16 round-off scale."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (64, 87))
    mlp = networks.MLP(layer_sizes=[256, 256, 1], activation=jax.nn.swish)
    params = mlp.init(key, x)
    kernels, biases = fused_mlp.flax_mlp_params(params)
    y32 = fused_mlp.dense_chain(
        x, kernels, biases, activation="swish", matmul_dtype=jnp.float32
    )
    y16 = fused_mlp.dense_chain(
        x, kernels, biases, activation="swish", matmul_dtype=jnp.bfloat16
    )
    err = np.abs(np.asarray(y16) - np.asarray(y32))
    scale = np.abs(np.asarray(y32)).mean() + 1e-6
    assert (err.mean() / scale) < 2e-2


def test_network_factories_route_through_fused(monkeypatch):
    """enable(True) flips policy/value/q applies to the fused kernel with
    equivalent outputs (bf16-contraction tolerance) and working grads."""
    key = jax.random.PRNGKey(3)
    obs_size, act_size = 87, 8
    obs = jax.random.normal(key, (96, obs_size))
    acts = jax.random.normal(key, (96, act_size))

    pol = networks.make_policy_network(
        2 * act_size, obs_size, hidden_layer_sizes=(32,) * 4,
        activation=jax.nn.swish,
    )
    val = networks.make_value_network(
        obs_size, hidden_layer_sizes=(256,) * 5, activation=jax.nn.swish
    )
    qn = networks.make_q_network(
        obs_size, act_size, hidden_layer_sizes=(256, 256),
        activation=jax.nn.swish,
    )
    pp, vp, qp = pol.init(key), val.init(key), qn.init(key)

    ref = (pol.apply(None, pp, obs), val.apply(None, vp, obs),
           qn.apply(None, qp, obs, acts))
    fused_mlp.enable(True)
    try:
        got = (pol.apply(None, pp, obs), val.apply(None, vp, obs),
               qn.apply(None, qp, obs, acts))
        # grads flow (SAC actor path: dQ/d action)
        g = jax.grad(lambda a: jnp.mean(qn.apply(None, qp, obs, a)))(acts)
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0
    finally:
        fused_mlp.enable(False)
    for r, f in zip(ref, got):
        scale = np.abs(np.asarray(r)).mean() + 1e-6
        assert np.abs(np.asarray(f) - np.asarray(r)).mean() / scale < 2e-2


def test_dense_chain_3d_batch():
    """Leading dims beyond 2 (the loss applies over [T, B, obs])."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (5, 33, 29))
    mlp = networks.MLP(layer_sizes=[64, 7], activation=jax.nn.swish)
    params = mlp.init(key, x.reshape(-1, 29))
    kernels, biases = fused_mlp.flax_mlp_params(params)
    y = fused_mlp.dense_chain(
        x, kernels, biases, activation="swish", matmul_dtype=jnp.float32
    )
    assert y.shape == (5, 33, 7)
    y_ref = mlp.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)
