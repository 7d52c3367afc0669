"""Multi-device DP tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridode.inference import VIModel, init_vi, loss_fn, make_optimizer
from hybridode.models.decoders import SimDecoderSpec
from hybridode.models.encoders import EncoderLSTMSpec
from hybridode.parallel import make_dp_eval_loss, make_dp_train_step, make_mesh, replicate, shard_batch


def tiny_model(elbo=False):
    obs, latent = 6, 4
    enc = EncoderLSTMSpec(obs + 1, 8, latent, normalize=True)
    dec = SimDecoderSpec(obs, latent, 1, t_max=4, step_size=1, roche=True, method="rk4", ode_step_size=0.5)
    return VIModel(kind="sim", encoder_spec=enc, decoder_spec=dec, elbo=elbo, prior="exponential", mc_size=4)


def tiny_batch(B=16, T=5, obs=6):
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    return {
        "measurements": jax.random.normal(k1, (T, B, obs)),
        "actions": jnp.zeros((T, B, 1)).at[2, :, 0].set(0.3),
        "masks": (jax.random.uniform(k2, (T, B, obs)) > 0.3).astype(jnp.float32),
        "latents": jnp.abs(jax.random.normal(k1, (T, B, 4))) * 0.01,
    }


class TestDP:
    def test_mesh_has_8_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8

    def test_dp_step_runs_and_updates(self):
        model = tiny_model(elbo=False)
        params = init_vi(jax.random.PRNGKey(0), model)
        mesh = make_mesh()
        optimizer = make_optimizer(0.01, params)
        opt_state = optimizer.init(params)

        p = replicate(params, mesh)
        s = replicate(opt_state, mesh)
        batch = shard_batch(tiny_batch(B=16), mesh)

        step = make_dp_train_step(model, optimizer, mesh)
        p2, s2, loss = step(p, s, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert not np.allclose(np.asarray(p2["encoder"]["lin"]["w"]), np.asarray(params["encoder"]["lin"]["w"]))

    def test_dp_loss_matches_single_device(self):
        """elbo=False is deterministic: the pmean'd DP loss must equal the
        single-device global-batch loss exactly (sum/B normalization)."""
        model = tiny_model(elbo=False)
        params = init_vi(jax.random.PRNGKey(0), model)
        batch = tiny_batch(B=16)

        single = float(loss_fn(params, model, batch, jax.random.PRNGKey(1)))

        mesh = make_mesh()
        eval_loss = make_dp_eval_loss(model, mesh)
        dp = float(eval_loss(replicate(params, mesh), shard_batch(batch, mesh), jax.random.PRNGKey(1)))
        np.testing.assert_allclose(dp, single, rtol=1e-5)

    def test_dp_grads_match_single_device(self):
        """DP psum-of-grads == single-device grads for the deterministic loss."""
        import optax

        model = tiny_model(elbo=False)
        params = init_vi(jax.random.PRNGKey(0), model)
        batch = tiny_batch(B=16)
        optimizer = make_optimizer(0.01, params)
        opt_state = optimizer.init(params)

        # single device step
        loss, grads = jax.value_and_grad(loss_fn)(params, model, batch, jax.random.PRNGKey(1))
        updates, _ = optimizer.update(grads, opt_state, params)
        p_single = optax.apply_updates(params, updates)

        # 8-device DP step
        mesh = make_mesh()
        step = make_dp_train_step(model, optimizer, mesh)
        p_dp, _, _ = step(replicate(params, mesh), replicate(opt_state, mesh),
                          shard_batch(batch, mesh), jax.random.PRNGKey(1))

        np.testing.assert_allclose(np.asarray(p_dp["encoder"]["lin"]["w"]),
                                   np.asarray(p_single["encoder"]["lin"]["w"]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(p_dp["decoder"]["output"]["w"]),
                                   np.asarray(p_single["decoder"]["output"]["w"]), atol=2e-6)


class TestDPTrainingLoop:
    def test_variational_training_loop_dp(self, tmp_path):
        """End-to-end DP training loop on the 8-device mesh: trains, validates,
        checkpoints, reloads — the CLI's --dp path."""
        from hybridode.inference import variational_training_loop

        model = tiny_model(elbo=False)
        params = init_vi(jax.random.PRNGKey(0), model)

        class DG:
            train_size = 16
            val_size = 16

            def get_mini_batch(self, fold, batch_size, rng):
                return tiny_batch(B=batch_size)

            def get_split(self, fold, batch_size, chunk):
                return tiny_batch(B=batch_size)

        p, best, wall = variational_training_loop(
            niters=4, data_generator=DG(), model=model, params=params,
            batch_size=16, lr=0.01, test_freq=2, key=jax.random.PRNGKey(1),
            path=str(tmp_path) + "/", early_stop=10, verbose=False, dp_devices=8,
        )
        assert np.isfinite(best)
        # params updated and reloaded from the best checkpoint
        assert not np.allclose(np.asarray(p["encoder"]["lin"]["w"]),
                               np.asarray(params["encoder"]["lin"]["w"]))

    def test_dp_loop_matches_single_device_loop(self, tmp_path):
        """Deterministic loss: DP loop and single-device loop produce the same
        best validation loss for the same batches."""
        from hybridode.inference import variational_training_loop

        model = tiny_model(elbo=False)
        params = init_vi(jax.random.PRNGKey(0), model)

        class DG:
            train_size = 16
            val_size = 16

            def get_mini_batch(self, fold, batch_size, rng):
                return tiny_batch(B=batch_size)

            def get_split(self, fold, batch_size, chunk):
                return tiny_batch(B=batch_size)

        kw = dict(niters=4, data_generator=DG(), model=model,
                  batch_size=16, lr=0.01, test_freq=2, key=jax.random.PRNGKey(1),
                  early_stop=10, verbose=False)
        _, best_dp, _ = variational_training_loop(
            params=params, path=str(tmp_path) + "/dp_", dp_devices=8, **kw)
        _, best_1, _ = variational_training_loop(
            params=params, path=str(tmp_path) + "/sd_", **kw)
        np.testing.assert_allclose(best_dp, best_1, rtol=1e-4)

    @pytest.mark.slow
    def test_fused_dp_loop_matches_host_dp_loop(self, tmp_path):
        """The whole-restart device program composed with DP (shard_map inside
        the while_loop, inference/fused.py) bit-mirrors the host-driven DP
        loop: same batch-index stream, same per-shard key folds, same pmean'd
        losses — identical curve, best loss, and checkpointed parameters."""
        from hybridode.inference import variational_training_loop

        model = tiny_model(elbo=True)
        params = init_vi(jax.random.PRNGKey(0), model)
        full = tiny_batch(B=24)

        class DG:
            train_size = 16
            val_size = 8

            def get_mini_batch(self, fold, batch_size, rng):
                idx = jnp.asarray(rng.choice(16, batch_size, replace=False))
                return {k: jnp.take(v, idx, axis=1) for k, v in full.items()}

            def get_split(self, fold, batch_size, chunk):
                lo = 16 if fold == "val" else 0
                return {k: v[:, lo + chunk * batch_size: lo + (chunk + 1) * batch_size]
                        for k, v in full.items()}

            def _fold(self, fold):
                lo, hi = (16, 24) if fold == "val" else (0, 16)
                return {k: v[:, lo:hi] for k, v in full.items()}

        key = np.asarray(jax.random.PRNGKey(2))
        curves, out = {}, {}
        for mode, fused in [("host", False), ("fused", True)]:
            path = str(tmp_path) + f"/{mode}_"
            curves[mode] = str(tmp_path) + f"/{mode}_curve.csv"
            out[mode] = variational_training_loop(
                niters=6, data_generator=DG(), model=model, params=params,
                batch_size=8, lr=0.01, test_freq=2, key=key, path=path,
                early_stop=10, verbose=False, dp_devices=8, fused=fused,
                curve_path=curves[mode])
        p_host, best_host, _ = out["host"]
        p_fused, best_fused, _ = out["fused"]
        assert np.isclose(best_host, best_fused, rtol=1e-5)
        c_host = np.loadtxt(curves["host"], delimiter=",").reshape(-1, 3)
        c_fused = np.loadtxt(curves["fused"], delimiter=",").reshape(-1, 3)
        np.testing.assert_allclose(c_host, c_fused, rtol=2e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p_host), jax.tree_util.tree_leaves(p_fused)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    @pytest.mark.slow
    def test_fused_dp_forecast_criterion_matches_host(self, tmp_path):
        """forecast validation under DP: the fused program psums the masked-MSE
        num/den terms — must match the host DP loop's global forecast loss."""
        from hybridode.inference import variational_training_loop

        model = tiny_model(elbo=False)
        params = init_vi(jax.random.PRNGKey(0), model)
        full = tiny_batch(B=24)

        class DG:
            train_size = 16
            val_size = 8

            def get_mini_batch(self, fold, batch_size, rng):
                idx = jnp.asarray(rng.choice(16, batch_size, replace=False))
                return {k: jnp.take(v, idx, axis=1) for k, v in full.items()}

            def get_split(self, fold, batch_size, chunk):
                lo = 16 if fold == "val" else 0
                return {k: v[:, lo + chunk * batch_size: lo + (chunk + 1) * batch_size]
                        for k, v in full.items()}

            def _fold(self, fold):
                lo, hi = (16, 24) if fold == "val" else (0, 16)
                return {k: v[:, lo:hi] for k, v in full.items()}

        key = np.asarray(jax.random.PRNGKey(2))
        out = {}
        for mode, fused in [("host", False), ("fused", True)]:
            out[mode] = variational_training_loop(
                niters=4, data_generator=DG(), model=model, params=params,
                batch_size=8, lr=0.01, test_freq=2, key=key,
                path=str(tmp_path) + f"/{mode}_", early_stop=10, verbose=False,
                dp_devices=8, fused=fused, val_criterion="forecast", val_t0=2)
        assert np.isclose(out["host"][1], out["fused"][1], rtol=1e-5)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        loss = jax.jit(fn)(*args)
        assert np.isfinite(float(loss))

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_spurious_aot_warning_filter(self):
        """Only the prefer-no-{scatter,gather} pseudo-feature loader errors are
        dropped; a genuine ISA mismatch (real feature named) passes through."""
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        spurious = ("E0818 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. "
                    "Target machine feature +prefer-no-scatter is not  supported "
                    "on the host machine.\n")
        real = ("E0818 cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. "
                "Target machine feature +avx512f is not  supported on the host "
                "machine.\n")
        other = "dryrun_multichip(8): loss=1.0 OK\n"
        out = ge._filter_spurious_aot_warnings(spurious + real + other)
        assert out == real + other


class TestShardedEval:
    def test_sharded_eval_matches_single_device(self):
        """(patients x MC) sharded _eval_chunk == single-device _eval_chunk:
        same key schedule, all_gather'd CRPS sample set, float tolerance."""
        from hybridode.eval.metrics import _eval_chunk
        from hybridode.parallel import make_mesh_2d, make_sharded_eval_chunk

        model = tiny_model(elbo=True)
        params = init_vi(jax.random.PRNGKey(0), model)
        batch = tiny_batch(B=16)
        t0, mc_itr, expert_dim = 2, 8, 4
        key = jax.random.PRNGKey(3)

        ref = _eval_chunk(params, model, batch, t0, mc_itr, expert_dim, key)

        mesh = make_mesh_2d(4, 2)
        chunk_fn = make_sharded_eval_chunk(model, mesh, t0, mc_itr, expert_dim)
        got = chunk_fn(params, batch, key)

        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-6)

    def test_sharded_eval_rejects_indivisible_mc(self):
        from hybridode.parallel import make_mesh_2d, make_sharded_eval_chunk

        model = tiny_model(elbo=True)
        mesh = make_mesh_2d(2, 4)
        try:
            make_sharded_eval_chunk(model, mesh, 2, 10, 4)
            assert False, "expected ValueError"
        except ValueError:
            pass

    def test_evaluate_sharded_csv_contract(self, capsys):
        """evaluate_sharded mirrors evaluate(): same chunking + CSV tail."""
        from hybridode.eval.metrics import evaluate
        from hybridode.parallel import evaluate_sharded, make_mesh_2d

        model = tiny_model(elbo=True)
        params = init_vi(jax.random.PRNGKey(0), model)

        class DG:
            test_size = 16
            expert_dim = 4

            def get_split(self, fold, batch_size, chunk):
                return tiny_batch(B=batch_size)

        ref = evaluate(params, model, DG(), batch_size=16, t0=2, mc_itr=8,
                       key=jax.random.PRNGKey(5), verbose=False)
        mesh = make_mesh_2d(4, 2)
        got = evaluate_sharded(params, model, DG(), batch_size=16, t0=2,
                               mesh=mesh, mc_itr=8, key=jax.random.PRNGKey(5), verbose=True)
        out = capsys.readouterr().out
        assert out.startswith("rmse_z0,") and "cprs_x," in out
        # indices 1/4 are bootstrap SEs (fresh resamples each call) — compare
        # the deterministic metrics only.
        for i in (0, 2, 3, 5):
            np.testing.assert_allclose(got[i], ref[i], rtol=2e-4, atol=2e-6)
