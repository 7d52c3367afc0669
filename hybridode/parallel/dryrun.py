"""Self-contained multi-chip DP dryrun on a forced-CPU virtual mesh.

Run as ``python -m hybridode.parallel.dryrun N`` — forces the CPU platform
with N virtual devices BEFORE any JAX backend initialization (the sandbox's
sitecustomize registers the axon TPU plugin in every process and presets
JAX_PLATFORMS; ``jax.config.update`` after import wins, exactly as
``tests/conftest.py`` proves). ``__graft_entry__.dryrun_multichip`` invokes
this in a clean subprocess so the driver's dryrun never touches libtpu.
"""

from __future__ import annotations

import os
import sys


def _force_cpu(n_devices: int) -> None:
    """Force the CPU platform with n virtual devices. Call before first JAX use."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
        os.environ["XLA_FLAGS"] = flags

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
    jax.config.update("jax_enable_x64", False)
    # Single-core sandbox: persistent cache amortizes the solver-scan compiles.
    # Keyed by host CPU features so an AOT blob compiled on a previous host
    # can never be loaded here (cross-host hits risk SIGILL — VERDICT r4 #6).
    from hybridode.utils.cache import host_keyed_cache_dir

    cache = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", host_keyed_cache_dir(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def flagship(max_steps: int = 256, rtol: float = 1e-7, atol: float = 1e-8, mc_size: int = 8):
    """Flagship model: hybrid LHM (expert PK/PD + neural remainder), dim-8."""
    import jax

    from hybridode.cli.common import build_sim_model
    from hybridode.config import dim8_config
    from hybridode.inference import init_vi

    model = build_sim_model("hybrid", dim8_config, elbo=True, max_steps=max_steps,
                            mc_size=mc_size, rtol=rtol, atol=atol)
    params = init_vi(jax.random.PRNGKey(0), model)
    return model, params


def fake_batch(model, B: int, T: int = 15, key=None):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(1) if key is None else key
    obs = model.decoder_spec.obs_dim
    latent = model.decoder_spec.latent_dim
    k1, k2 = jax.random.split(key)
    actions = jnp.zeros((T, B, 1)).at[3, :, 0].set(1.5)
    return {
        "measurements": jax.random.normal(k1, (T, B, obs)),
        "actions": actions,
        "masks": (jax.random.uniform(k2, (T, B, obs)) > 0.5).astype(jnp.float32),
        "latents": jnp.abs(jax.random.normal(k1, (T, B, latent))) * 0.01,
    }


def real_flagship(n_devices: int):
    """Tiny real-track model: RocheODEReal hybrid (learned dx1/dx2 + CT-GRU
    remainder) decoded with the fixed-step explicit_adams path — the
    reference's run_real regime (model.py:836-857 analog) on dryrun shapes."""
    import jax

    from hybridode.cli.common import build_real_model
    from hybridode.inference import init_vi

    model = build_real_model(
        "hybrid", obs_dim=6, action_dim=1, static_dim=3, t_max=12, step_size=1.0,
        encoder_output_dim=5, encoder_latent_ratio=1.0, ode_method="explicit_adams",
        ode_step_div=1, t0=4,
    )
    params = init_vi(jax.random.PRNGKey(10), model)
    return model, params


def fake_real_batch(model, B: int, T: int = 12, key=None):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(11) if key is None else key
    spec = model.decoder_spec
    k1, k2, k3 = jax.random.split(key, 3)
    actions = jnp.zeros((T, B, spec.action_dim)).at[2, :, 0].set(1.0)
    return {
        "measurements": 0.1 * jax.random.normal(k1, (T, B, spec.obs_dim)),
        "actions": actions,
        "masks": (jax.random.uniform(k2, (T, B, spec.obs_dim)) > 0.4).astype(jnp.float32),
        "statics": jnp.broadcast_to(
            jax.random.normal(k3, (1, B, spec.static_dim)), (T, B, spec.static_dim)
        ).astype(jnp.float32),
    }


def _dp_step(model, params, batch, mesh, seed):
    """Shared DP plumbing: replicate, shard, one jitted train step."""
    import jax
    import numpy as np

    from hybridode.inference import make_optimizer
    from hybridode.parallel import make_dp_train_step, replicate, shard_batch

    optimizer = make_optimizer(0.01, params)
    opt_state = optimizer.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    batch = shard_batch(batch, mesh)
    step = make_dp_train_step(model, optimizer, mesh)
    params, opt_state, loss = step(params, opt_state, batch, jax.random.PRNGKey(seed))
    jax.block_until_ready(loss)
    return float(loss)


def run(n_devices: int) -> float:
    """One full DP training step over an n-device mesh on tiny shapes.

    Batch axis sharded over the "data" mesh axis; params/opt-state
    replicated; gradients pmean'd inside shard_map (the workload's one
    meaningful collective — see SURVEY.md §2 parallelism statement).
    Assumes the platform/devices are already configured by the caller.
    """
    import jax
    import numpy as np

    from hybridode.inference import make_optimizer
    from hybridode.parallel import make_dp_train_step, make_mesh, replicate, shard_batch

    # Loose tolerances keep the step budget (and compile time) small while
    # still finishing the integration, so the finite-loss assert is real.
    # (max_steps budgets TRIAL steps incl. rejections: ~44 accepts + slack.)
    model, params = flagship(max_steps=192, rtol=1e-4, atol=1e-6)
    # Pin the posterior to the physical regime (z0 ~ 0.01, tiny variance):
    # with random heads the latents land at O(0.1-1), where the expert PK/PD
    # dynamics blow up over the 14-unit horizon and the loss overflows.
    enc = params["encoder"]
    enc["lin"] = {"w": enc["lin"]["w"] * 0.0, "b": enc["lin"]["b"] * 0.0 - 2.3}
    enc["log_var"] = {"w": enc["log_var"]["w"] * 0.0, "b": enc["log_var"]["b"] * 0.0 - 5.0}
    mesh = make_mesh(n_devices)

    optimizer = make_optimizer(0.01, params)
    opt_state = optimizer.init(params)

    params0 = params  # pinned host params, reused by the fused-DP section
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    # T must match the decoder's output grid (t_max + 1 = 15).
    batch = shard_batch(fake_batch(model, B=2 * n_devices, T=15), mesh)

    step = make_dp_train_step(model, optimizer, mesh)
    params, opt_state, loss = step(params, opt_state, batch, jax.random.PRNGKey(3))
    jax.block_until_ready(loss)
    loss = float(loss)
    assert np.isfinite(loss), "DP train step produced non-finite loss"

    # Second mesh topology: the 2-D (patients x MC-samples) evaluation layout
    # (parallel/eval.py) — exercises all_gather over the mc axis on top of
    # the dp sharding, and must agree with the single-device eval chunk.
    if n_devices % 2 == 0:
        from hybridode.eval.metrics import _eval_chunk
        from hybridode.parallel import make_mesh_2d, make_sharded_eval_chunk

        mesh2 = make_mesh_2d(n_devices // 2, 2)
        t0, mc_itr, expert_dim = 5, 4, 4
        params_host = jax.device_get(params)
        batch_host = {k: jax.device_get(v) for k, v in batch.items()}
        chunk_fn = make_sharded_eval_chunk(model, mesh2, t0, mc_itr, expert_dim)
        got = chunk_fn(params_host, batch_host, jax.random.PRNGKey(4))
        ref = _eval_chunk(params_host, model, batch_host, t0, mc_itr, expert_dim,
                          jax.random.PRNGKey(4))
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-6)
        print(f"dryrun 2D mesh ({n_devices // 2}x2 data x mc) eval parity OK")

    # Real-data track: DP train step on the fixed-step explicit_adams decoder
    # (reference model.py:836-857 analog — RocheODEReal + CT-GRU remainder,
    # rank-3 per-interval solve), same mesh/sharding as the sim step.
    model_r, params_r = real_flagship(n_devices)
    loss_r = _dp_step(model_r, params_r, fake_real_batch(model_r, B=2 * n_devices), mesh, seed=5)
    assert np.isfinite(loss_r), "real-track DP train step produced non-finite loss"
    print(f"dryrun real-track DP step: loss={loss_r:.4f} OK")

    # Flow model (LHM-NF): DP train step on the planar-flow posterior
    # (reference model.py:1299-1380 analog), plus 2-D sharded-eval parity.
    import jax.numpy as jnp

    from hybridode.cli.common import build_sim_model
    from hybridode.inference import init_vi

    model_f = build_sim_model("hybrid", _tiny_dim8(), elbo=True, max_steps=192,
                              rtol=1e-4, atol=1e-6, flow=True, num_flows=2, mc_size=2)
    params_f = init_vi(jax.random.PRNGKey(12), model_f)
    # Same posterior pinning as the sim step: point mu at the physical regime
    # (the flow encoder's mu head feeds exp(z-5), so 0-bias already lands at
    # e^-5 ~ 0.007; just shrink the variance head).
    encf = params_f["encoder"]
    if "log_var" in encf:
        encf["log_var"] = jax.tree_util.tree_map(jnp.zeros_like, encf["log_var"])
        encf["log_var"]["b"] = encf["log_var"]["b"] - 5.0
    batch_f = fake_batch(model_f, B=2 * n_devices, T=15)
    loss_f = _dp_step(model_f, params_f, batch_f, mesh, seed=6)
    assert np.isfinite(loss_f), "flow DP train step produced non-finite loss"
    print(f"dryrun flow DP step: loss={loss_f:.4f} OK")

    if n_devices % 2 == 0:
        from hybridode.eval.metrics import _eval_chunk
        from hybridode.parallel import make_mesh_2d, make_sharded_eval_chunk

        mesh2 = make_mesh_2d(n_devices // 2, 2)
        t0, mc_itr, expert_dim = 5, 4, 4
        params_host = jax.device_get(params_f)
        chunk_fn = make_sharded_eval_chunk(model_f, mesh2, t0, mc_itr, expert_dim)
        got = chunk_fn(params_host, batch_f, jax.random.PRNGKey(13))
        ref = _eval_chunk(params_host, model_f, batch_f, t0, mc_itr, expert_dim,
                          jax.random.PRNGKey(13))
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-6)
        print(f"dryrun 2D mesh flow eval parity OK")

    # Fused whole-restart program composed with DP (inference/fused.py with
    # dp_devices): the flagship multi-chip TRAINING path — the entire restart
    # (Adam steps, chunked validation, early stop, best-params tracking) as
    # one shard_map'd XLA program. Parity vs the host-driven DP loop on the
    # identical batch-index / key-split streams.
    import tempfile

    from hybridode.inference import variational_training_loop

    full = fake_batch(model, B=3 * n_devices, T=15, key=jax.random.PRNGKey(20))
    n_train, n_total = 2 * n_devices, 3 * n_devices

    class _DG:
        train_size = n_train
        val_size = n_devices

        def get_mini_batch(self, fold, batch_size, rng):
            import jax.numpy as jnp

            idx = jnp.asarray(rng.choice(n_train, batch_size, replace=False))
            return {k: jnp.take(v, idx, axis=1) for k, v in full.items()}

        def get_split(self, fold, batch_size, chunk):
            lo = n_train if fold == "val" else 0
            return {k: v[:, lo + chunk * batch_size: lo + (chunk + 1) * batch_size]
                    for k, v in full.items()}

        def _fold(self, fold):
            lo, hi = (n_train, n_total) if fold == "val" else (0, n_train)
            return {k: v[:, lo:hi] for k, v in full.items()}

    import numpy as _np

    key_loop = _np.asarray(jax.random.PRNGKey(21))
    best = {}
    with tempfile.TemporaryDirectory() as td:
        for mode, fused in [("host", False), ("fused", True)]:
            _, best[mode], _ = variational_training_loop(
                niters=4, data_generator=_DG(), model=model, params=params0,
                batch_size=n_devices, lr=0.01, test_freq=2, key=key_loop,
                path=td + f"/{mode}_", early_stop=10, verbose=False,
                dp_devices=n_devices, fused=fused)
    assert np.isfinite(best["fused"]), "fused-DP restart produced non-finite best loss"
    np.testing.assert_allclose(best["fused"], best["host"], rtol=1e-5)
    print(f"dryrun fused-DP whole-restart parity: best={best['fused']:.4f} OK")

    # Batched multi-restart experiment on a 2-D (restart x data) mesh
    # (--restart_mode=shard --dp): 2 restart lanes sharded over the first
    # mesh axis with ZERO cross-lane collectives, each lane data-parallel
    # over the second (grads/losses pmean'd within the lane); the
    # cross-restart argmin happens on the host. Parity vs the sequential
    # chain is covered by tests/test_inference.py::test_fused_experiment_*;
    # here the 2-D program must compile and run two finite lanes. The raw
    # program is driven directly (not via fused_experiment_loop) so every
    # lane reuses the PINNED params0 — random per-lane inits blow up the
    # expert dynamics on these shapes, exactly like the DP sections above.
    from hybridode.inference.fused import _cached_experiment_program
    from hybridode.inference.train import _HashableTree, param_labels
    from hybridode.utils.hostrng import host_key, host_split

    key_exp = host_key(22)
    lane_keys = []
    for _ in range(2):
        key_exp, _, k_train = host_split(key_exp, 3)
        lane_keys.append(_np.asarray(k_train))

    labels = _HashableTree(param_labels(params0, False))
    # Index widths below are n_devices wide; the "data" axis must divide
    # them, so odd device counts run restart-sharded only (dp_exp=1).
    dp_exp = n_devices // 2 if n_devices % 2 == 0 else 1
    program = _cached_experiment_program(
        model, 0.01, labels, "elbo", 5, 2, 1, 10, 2, 2, dp_exp)
    params_st = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), params0)
    dgx = _DG()
    lane_idx = _np.stack([_np.arange(n_devices), _np.arange(n_devices)])
    idx_st = _np.stack([lane_idx, lane_idx]).astype(_np.int32)
    val_idx = _np.stack([_np.arange(n_devices)]).astype(_np.int32)
    out = program(params_st, _np.stack(lane_keys), dgx._fold("train"),
                  dgx._fold("val"), idx_st, val_idx, 1e9)
    best_lanes = _np.asarray(out["best_od"])
    assert best_lanes.shape == (2,) and _np.isfinite(best_lanes).all(), best_lanes
    print(f"dryrun 2x{dp_exp} restart-x-data batched experiment: best={best_lanes.min():.4f} OK")
    return loss


def _tiny_dim8():
    """dim8 config shrunk to dryrun size (obs 10) — compile-time bounded."""
    import dataclasses

    from hybridode.config import dim8_config

    return dataclasses.replace(dim8_config, obs_dim=10)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    n_devices = int(argv[0]) if argv else 8
    _force_cpu(n_devices)

    import jax

    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) >= n_devices, (len(jax.devices()), n_devices)

    loss = run(n_devices)
    print(f"dryrun_multichip({n_devices}): loss={loss:.4f} OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
