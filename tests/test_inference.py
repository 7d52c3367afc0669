"""ELBO loss, parameter freezing, checkpointing, and training-loop tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridode.inference import (
    VIModel,
    init_vi,
    load_checkpoint,
    loss_fn,
    make_optimizer,
    param_labels,
    save_checkpoint,
    variational_training_loop,
)
from hybridode.inference.elbo import mc_kl
from hybridode.models.decoders import SimDecoderSpec
from hybridode.models.encoders import EncoderLSTMSpec
from hybridode.models.priors import exponential_log_density


def tiny_sim_model(latent=4, obs=6, roche=True, elbo=True, prior="exponential", mc_size=5, kind="sim"):
    """Small, fast-compiling sim model: rk4 fixed-step decoder."""
    enc = EncoderLSTMSpec(obs + 1, 8, latent, normalize=roche)
    dec = SimDecoderSpec(obs, latent, 1, t_max=4, step_size=1, roche=roche, method="rk4", ode_step_size=0.5)
    return VIModel(kind=kind, encoder_spec=enc, decoder_spec=dec, elbo=elbo,
                   prior=prior if roche else None, mc_size=mc_size)


def tiny_batch(key, T=5, B=6, obs=6):
    k1, k2 = jax.random.split(key)
    return {
        "measurements": jax.random.normal(k1, (T, B, obs)),
        "actions": jnp.zeros((T, B, 1)).at[2, :, 0].set(0.3),
        "masks": (jax.random.uniform(k2, (T, B, obs)) > 0.5).astype(jnp.float32),
        "latents": jnp.abs(jax.random.normal(k1, (T, B, 4))) * 0.01,
    }


class TestLosses:
    def test_sim_loss_finite_and_grad(self):
        model = tiny_sim_model()
        params = init_vi(jax.random.PRNGKey(0), model)
        batch = tiny_batch(jax.random.PRNGKey(1))
        loss, grads = jax.value_and_grad(loss_fn)(params, model, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(g)) for g in flat)
        # encoder grads nonzero
        assert float(jnp.abs(grads["encoder"]["lin"]["w"]).sum()) > 0

    def test_neural_model_analytic_kl(self):
        model = tiny_sim_model(latent=4, roche=False, prior=None)
        params = init_vi(jax.random.PRNGKey(0), model)
        batch = tiny_batch(jax.random.PRNGKey(1))
        loss = loss_fn(params, model, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))

    def test_elbo_false_is_pure_mse(self):
        model = tiny_sim_model(elbo=False)
        params = init_vi(jax.random.PRNGKey(0), model)
        batch = tiny_batch(jax.random.PRNGKey(1))
        l1 = loss_fn(params, model, batch, jax.random.PRNGKey(2))
        l2 = loss_fn(params, model, batch, jax.random.PRNGKey(3))
        # elbo=False uses the posterior mean: loss is deterministic in the key
        np.testing.assert_allclose(l1, l2)

    def test_mc_kl_estimates(self):
        """MC KL with many samples should be stable and finite for the
        exponential prior with positive mu."""
        mu = jnp.full((8, 4), 0.05)
        log_var = jnp.full((8, 4), -6.0)
        kl1 = mc_kl(jax.random.PRNGKey(0), mu, log_var, exponential_log_density, 512)
        kl2 = mc_kl(jax.random.PRNGKey(1), mu, log_var, exponential_log_density, 512)
        assert kl1.shape == (8,)
        np.testing.assert_allclose(kl1, kl2, rtol=0.1, atol=0.5)

    @pytest.mark.slow
    def test_flow_loss(self):
        from hybridode.models.encoders import EncoderPlanarLSTMSpec

        obs, latent = 6, 4
        enc = EncoderPlanarLSTMSpec(obs + 1, 8, latent, num_flows=2)
        dec = SimDecoderSpec(obs, latent, 1, t_max=4, step_size=1, roche=True, method="rk4", ode_step_size=0.5)
        model = VIModel(kind="flow", encoder_spec=enc, decoder_spec=dec, prior="exponential", mc_size=3)
        params = init_vi(jax.random.PRNGKey(0), model)
        batch = tiny_batch(jax.random.PRNGKey(1))
        loss, grads = jax.value_and_grad(loss_fn)(params, model, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        assert float(jnp.abs(grads["encoder"]["amor_u"]["w"]).sum()) > 0


class TestFreezing:
    def test_expert_params_frozen(self):
        model = tiny_sim_model(latent=6)
        params = init_vi(jax.random.PRNGKey(0), model)
        labels = param_labels(params)
        assert labels["decoder"]["ode"]["expert"]["kel"] == "freeze"
        assert labels["decoder"]["ode"]["ml_net"][0]["w"] == "train"
        assert labels["encoder"]["lstm"]["w_ih"] == "train"

        import optax

        opt = make_optimizer(0.01, params)
        opt_state = opt.init(params)
        batch = tiny_batch(jax.random.PRNGKey(1))
        grads = jax.grad(loss_fn)(params, model, batch, jax.random.PRNGKey(2))
        updates, _ = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        np.testing.assert_array_equal(new_params["decoder"]["ode"]["expert"]["kel"],
                                      params["decoder"]["ode"]["expert"]["kel"])
        assert not np.allclose(new_params["encoder"]["lin"]["w"], params["encoder"]["lin"]["w"])

    def test_train_expert_true(self):
        model = tiny_sim_model(latent=6)
        params = init_vi(jax.random.PRNGKey(0), model)
        labels = param_labels(params, train_expert=True)
        assert labels["decoder"]["ode"]["expert"]["kel"] == "train"


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        model = tiny_sim_model()
        params = init_vi(jax.random.PRNGKey(0), model)
        path = str(tmp_path) + "/"
        save_checkpoint(path, model.model_name, params, 7, 1.25)
        loaded, itr, best = load_checkpoint(path, model.model_name)
        assert itr == 7 and best == 1.25
        np.testing.assert_array_equal(loaded["encoder"]["lin"]["w"], params["encoder"]["lin"]["w"])

    def test_model_name_composition(self):
        model = tiny_sim_model()
        assert model.model_name == "VI_LSTMEncoder_ExpertDecoder.pkl"


class _FakeGenerator:
    """Minimal data-generator protocol for the training loop."""

    def __init__(self, key, T=5, B=24, obs=6):
        self.train_size = 16
        self.val_size = 8
        full = tiny_batch(key, T, B, obs)
        self.data = full

    def get_mini_batch(self, fold, batch_size, rng):
        idx = jnp.asarray(rng.choice(16, batch_size, replace=False))
        return {k: jnp.take(v, idx, axis=1) for k, v in self.data.items()}

    def get_split(self, fold, batch_size, chunk):
        lo = 16 if fold == "val" else 0
        return {k: v[:, lo + chunk * batch_size : lo + (chunk + 1) * batch_size] for k, v in self.data.items()}

    def _fold(self, fold):
        lo, hi = (16, 24) if fold == "val" else (0, 16)
        return {k: v[:, lo:hi] for k, v in self.data.items()}


class TestTrainingLoop:
    def test_loop_improves_and_checkpoints(self, tmp_path):
        model = tiny_sim_model()
        params = init_vi(jax.random.PRNGKey(0), model)
        gen = _FakeGenerator(jax.random.PRNGKey(1))
        path = str(tmp_path) + "/"
        params_out, best, wall = variational_training_loop(
            niters=8, data_generator=gen, model=model, params=params, batch_size=8,
            lr=0.01, test_freq=4, key=jax.random.PRNGKey(2), path=path, verbose=False,
        )
        assert np.isfinite(best)
        assert os.path.exists(path + model.model_name)

    def test_fused_loop_matches_host_loop(self, tmp_path):
        """The whole-restart device program (inference/fused.py) mirrors the
        host loop's batch-index and key-split streams — same trajectory,
        same best validation loss, same checkpointed parameters."""
        model = tiny_sim_model()
        params = init_vi(jax.random.PRNGKey(0), model)
        gen = _FakeGenerator(jax.random.PRNGKey(1))
        key = np.asarray(jax.random.PRNGKey(2))
        curves = {}
        out = {}
        for mode, fused in [("host", False), ("fused", True)]:
            path = str(tmp_path) + f"/{mode}_"
            curves[mode] = str(tmp_path) + f"/{mode}_curve.csv"
            out[mode] = variational_training_loop(
                niters=8, data_generator=gen, model=model, params=params,
                batch_size=8, lr=0.01, test_freq=4, key=key, path=path,
                verbose=False, curve_path=curves[mode], fused=fused,
            )
        p_host, best_host, _ = out["host"]
        p_fused, best_fused, _ = out["fused"]
        assert np.isclose(best_host, best_fused, rtol=1e-5)
        c_host = np.loadtxt(curves["host"], delimiter=",").reshape(-1, 3)
        c_fused = np.loadtxt(curves["fused"], delimiter=",").reshape(-1, 3)
        np.testing.assert_allclose(c_host, c_fused, rtol=2e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p_host), jax.tree_util.tree_leaves(p_fused)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    @pytest.mark.slow
    def test_fused_loop_flush_durability(self, tmp_path):
        """flush_every=K (VERDICT r4 #8): the fused program streams its
        best-so-far to a host sink once per validation window; every K-th
        improving window is checkpointed to disk mid-restart, so a killed
        process loses at most K windows. The callback payload is read-only,
        so the returned params/best must be bit-identical to flush-off."""
        from hybridode.inference import checkpoint as ckpt_mod
        from hybridode.inference import fused as fused_mod

        model = tiny_sim_model()
        params = init_vi(jax.random.PRNGKey(0), model)
        gen = _FakeGenerator(jax.random.PRNGKey(1))
        key = np.asarray(jax.random.PRNGKey(2))
        out = {}
        for mode, fe in [("off", None), ("on", 1)]:
            out[mode] = fused_mod.fused_training_loop(
                niters=8, data_generator=gen, model=model, params=params,
                batch_size=8, lr=0.01, test_freq=4, key=key,
                path=str(tmp_path) + f"/{mode}_", verbose=False, flush_every=fe)
        assert out["off"][1] == out["on"][1]
        for a, b in zip(jax.tree_util.tree_leaves(out["off"][0]),
                        jax.tree_util.tree_leaves(out["on"][0])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        sink = fused_mod._LAST_FLUSH_SINK
        assert sink is not None
        assert sink.calls == 2          # one callback per validation window
        assert sink.writes >= 1         # window 1 improves on best=1e9
        assert fused_mod._FLUSH_SINK is None  # uninstalled after the run
        # The mid-restart checkpoint is a loadable, consistent best.
        _, _, best = ckpt_mod.load_checkpoint(str(tmp_path) + "/on_", model.model_name)
        assert np.isclose(best, out["on"][1], rtol=1e-6)

    @pytest.mark.slow
    def test_fused_loop_matches_host_loop_val_fold_noshuffle(self, tmp_path):
        """The residual pipeline's configuration (shuffle=False,
        train_fold='val' — run_simulation_residual.py): the fused loop's
        deterministic chunk cycling must match the host loop's."""
        model = tiny_sim_model()
        params = init_vi(jax.random.PRNGKey(0), model)
        gen = _FakeGenerator(jax.random.PRNGKey(1))
        key = np.asarray(jax.random.PRNGKey(2))
        out = {}
        for mode, fused in [("host", False), ("fused", True)]:
            path = str(tmp_path) + f"/{mode}_"
            out[mode] = variational_training_loop(
                niters=6, data_generator=gen, model=model, params=params,
                batch_size=4, lr=0.01, test_freq=3, key=key, path=path,
                verbose=False, shuffle=False, train_fold="val", fused=fused,
            )
        _, best_host, _ = out["host"]
        _, best_fused, _ = out["fused"]
        assert np.isclose(best_host, best_fused, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(out["host"][0]),
                        jax.tree_util.tree_leaves(out["fused"][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    @pytest.mark.slow
    def test_fused_loop_matches_host_loop_remainder_iters(self, tmp_path):
        """niters NOT divisible by test_freq: the windowed program's trailing
        scan must run the post-validation iterations exactly like the host
        loop (they change final_params, never the checkpointed best)."""
        model = tiny_sim_model()
        params = init_vi(jax.random.PRNGKey(0), model)
        gen = _FakeGenerator(jax.random.PRNGKey(1))
        key = np.asarray(jax.random.PRNGKey(2))
        out = {}
        for mode, fused in [("host", False), ("fused", True)]:
            path = str(tmp_path) + f"/{mode}_"
            out[mode] = variational_training_loop(
                niters=7, data_generator=gen, model=model, params=params,
                batch_size=8, lr=0.01, test_freq=3, key=key, path=path,
                verbose=False, fused=fused,
            )
        assert np.isclose(out["host"][1], out["fused"][1], rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(out["host"][0]),
                        jax.tree_util.tree_leaves(out["fused"][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

        # The trailing scan actually ran: drive the raw program and check it
        # advanced past the last validation multiple (6) to iteration 7.
        from hybridode.inference.fused import (
            _cached_fused_program, _fold_geometry, _predraw_train_idx, _predraw_val_idx)
        from hybridode.inference.train import _HashableTree, param_labels
        from hybridode.utils.hostrng import host_randint

        labels = _HashableTree(param_labels(params, False))
        program = _cached_fused_program(model, 0.01, labels, "elbo", 5, 7, 3, 5, 1, 0)
        fold, fold_n, train_chunk, val_chunks, val_n = _fold_geometry(gen, 8, "train")
        rng = np.random.RandomState(host_randint(key, 0, 2**31 - 1))
        idx = _predraw_train_idx(rng, fold_n, train_chunk, 7, 8, True)
        vidx = _predraw_val_idx(val_n, 8, val_chunks)
        raw = program(params, key, fold, gen._fold("val"), idx, vidx, 1e9)
        assert int(raw["n_iters"]) == 7
        assert int(raw["n_vals"]) == 2  # validations at iters 3 and 6 only
        # final params moved past the iter-6 best checkpoint
        diffs = [float(np.abs(np.asarray(f) - np.asarray(b)).max())
                 for f, b in zip(jax.tree_util.tree_leaves(raw["final_params"]),
                                 jax.tree_util.tree_leaves(raw["best_params"]))]
        assert max(diffs) > 0

    def _run_sequential_experiment(self, model, gen, restart_keys, path, **kw):
        """The CLI's sequential restart chain (cli/run_simulation.py):
        init per restart, thread best_on_disk through the fused loop."""
        best = 1e9
        params = None
        for k_init, k_train in restart_keys:
            params = init_vi(k_init, model)
            params, best, _ = variational_training_loop(
                data_generator=gen, model=model, params=params, key=k_train,
                path=path, best_on_disk=best, verbose=False, fused=True, **kw)
        return params, best

    @pytest.mark.slow
    def test_fused_experiment_matches_sequential_restarts(self, tmp_path):
        """The batched multi-restart program (vmap of the whole-restart
        while_loop, fused_experiment_loop) selects the same checkpoint with
        the same best loss as the sequential restart chain — restart
        parallelism must not change results."""
        from hybridode.inference.fused import fused_experiment_loop
        from hybridode.utils.hostrng import host_key, host_split

        model = tiny_sim_model()
        gen = _FakeGenerator(jax.random.PRNGKey(1))
        key = host_key(7)
        restart_keys = []
        for _ in range(3):
            key, k_init, k_train = host_split(key, 3)
            restart_keys.append((k_init, k_train))
        kw = dict(niters=6, batch_size=8, lr=0.01, test_freq=3, early_stop=10)

        p_seq, best_seq = self._run_sequential_experiment(
            model, gen, restart_keys, str(tmp_path) + "/seq_", **kw)
        p_bat, best_bat, _ = fused_experiment_loop(
            data_generator=gen, model=model, restart_keys=restart_keys,
            path=str(tmp_path) + "/bat_", verbose=False, **kw)

        assert np.isclose(best_seq, best_bat, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_seq), jax.tree_util.tree_leaves(p_bat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    @pytest.mark.slow
    def test_fused_experiment_sharded_restarts(self, tmp_path):
        """--restart_mode=shard: the vmapped experiment shard_map'd over a
        'restart' mesh (2 of the 8 CPU devices) returns the same selection
        as the unsharded vmap program."""
        from hybridode.inference.fused import fused_experiment_loop
        from hybridode.utils.hostrng import host_key, host_split

        model = tiny_sim_model()
        gen = _FakeGenerator(jax.random.PRNGKey(1))
        key = host_key(11)
        restart_keys = []
        for _ in range(4):
            key, k_init, k_train = host_split(key, 3)
            restart_keys.append((k_init, k_train))
        kw = dict(niters=6, batch_size=8, lr=0.01, test_freq=3, early_stop=10)

        _, best_v, _ = fused_experiment_loop(
            data_generator=gen, model=model, restart_keys=restart_keys,
            path=str(tmp_path) + "/v_", verbose=False, **kw)
        p_s, best_s, _ = fused_experiment_loop(
            data_generator=gen, model=model, restart_keys=restart_keys,
            path=str(tmp_path) + "/s_", verbose=False, restart_devices=2, **kw)
        assert np.isclose(best_v, best_s, rtol=1e-5)
        assert os.path.exists(str(tmp_path) + "/s_" + model.model_name)

        # 2-D restart x data mesh (2x2 of the 8 CPU devices): each lane
        # data-parallel, lanes sharded. DP decorrelates per-shard MC noise
        # (fold_in on the data axis index), so the parity target is the
        # SEQUENTIAL fused-DP chain at dp_devices=2, not the plain vmap run.
        best_seq_dp = 1e9
        for k_init, k_train in restart_keys:
            p0 = init_vi(k_init, model)
            _, best_seq_dp, _ = variational_training_loop(
                data_generator=gen, model=model, params=p0, key=k_train,
                path=str(tmp_path) + "/sd_", best_on_disk=best_seq_dp,
                verbose=False, fused=True, dp_devices=2, **kw)
        _, best_2d, _ = fused_experiment_loop(
            data_generator=gen, model=model, restart_keys=restart_keys,
            path=str(tmp_path) + "/d_", verbose=False, restart_devices=2,
            dp_devices=2, **kw)
        assert np.isclose(best_seq_dp, best_2d, rtol=1e-5)

    def test_fused_loop_early_stop_and_nonfinite_gate(self, tmp_path):
        """Fused loop stops early (counter semantics) and survives a
        non-finite loss by aborting the restart like the host loop."""
        model = tiny_sim_model()
        params = init_vi(jax.random.PRNGKey(0), model)
        gen = _FakeGenerator(jax.random.PRNGKey(1))
        path = str(tmp_path) + "/"
        # lr=0 -> validation never improves after the first eval; early_stop=1
        # must cut the run at the second validation (2 curve rows, not 4).
        curve = str(tmp_path) + "/curve.csv"
        _, best, _ = variational_training_loop(
            niters=8, data_generator=gen, model=model, params=params,
            batch_size=8, lr=0.0, test_freq=2, early_stop=1, key=np.asarray(jax.random.PRNGKey(2)),
            path=path, verbose=False, fused=True, curve_path=curve,
        )
        assert np.isfinite(best)
        assert os.path.exists(path + model.model_name)
        rows = np.loadtxt(curve, delimiter=",").reshape(-1, 3)
        assert rows.shape[0] == 2 and rows[0, 0] == 2 and rows[1, 0] == 4
