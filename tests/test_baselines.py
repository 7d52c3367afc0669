"""LSTMBaseline (discrete supervised baseline, reference model.py:322-380)."""

import jax
import jax.numpy as jnp
import numpy as np

from hybridode.models.encoders import (
    LSTMBaselineSpec,
    init_lstm_baseline,
    lstm_baseline_apply,
    lstm_baseline_loss,
)


class TestLSTMBaseline:
    def test_forward_and_loss(self):
        T, B, obs, act, stat = 6, 4, 5, 1, 2
        spec = LSTMBaselineSpec(obs + act + stat, 8, obs)
        p = init_lstm_baseline(jax.random.PRNGKey(0), spec)
        batch = {
            "measurements": jax.random.normal(jax.random.PRNGKey(1), (T, B, obs)),
            "actions": jnp.ones((T, B, act)) * 0.1,
            "masks": jnp.ones((T, B, obs)),
            "statics": jnp.ones((T, B, stat)),
        }
        pred = lstm_baseline_apply(p, spec, batch["measurements"],
                                   jnp.concatenate([batch["actions"], batch["statics"]], -1),
                                   batch["masks"])
        assert pred.shape == (T, B, obs)
        loss = lstm_baseline_loss(p, spec, batch)
        assert np.isfinite(float(loss))
        g = jax.grad(lstm_baseline_loss)(p, spec, batch)
        assert float(jnp.abs(g["lstm"]["w_ih"]).sum()) > 0

    def test_loss_decreases_with_training(self):
        import optax

        T, B, obs = 8, 16, 3
        spec = LSTMBaselineSpec(obs + 2, 16, obs)
        p = init_lstm_baseline(jax.random.PRNGKey(0), spec)
        key = jax.random.PRNGKey(1)
        # learnable pattern: x_{t+1} = 0.9 x_t
        x0 = jax.random.normal(key, (1, B, obs))
        xs = jnp.concatenate([x0 * (0.9**t) for t in range(T)], axis=0)
        batch = {
            "measurements": xs,
            "actions": jnp.zeros((T, B, 1)),
            "masks": jnp.ones((T, B, obs)),
            "statics": jnp.zeros((T, B, 1)),
        }
        opt = optax.adam(0.01)
        state = opt.init(p)

        @jax.jit
        def step(p, state):
            loss, g = jax.value_and_grad(lstm_baseline_loss)(p, spec, batch)
            up, state = opt.update(g, state)
            return optax.apply_updates(p, up), state, loss

        p, state, l0 = step(p, state)
        for _ in range(30):
            p, state, loss = step(p, state)
        assert float(loss) < float(l0)
