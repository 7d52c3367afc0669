"""Simulation-study CLI: train/evaluate expert / neural / hybrid LHM models.

Flag-compatible re-design of experiments/run_simulation.py (reference):
n_restart loop with a shared on-disk best (run_simulation.py:95-145), frozen
expert parameters in the optimizer (125-131), then `evaluate` at t0.
"""

from __future__ import annotations

import argparse

import jax

from ..config import EvalConfig, OptimConfig
from ..data import SyntheticCohort
from ..eval import evaluate
from ..inference import VIModel, init_vi, load_checkpoint, variational_training_loop
from ..utils.hostrng import host_key, host_split
from . import common


def run(
    seed: int,
    elbo: bool,
    eval_only: bool,
    init_path: str | None,
    data_path: str,
    sample: int,
    data_config,
    model_method: str,
    path: str,
    optim_config: OptimConfig,
    eval_config: EvalConfig,
    encoder_output_dim=None,
    ablate: bool = False,
    arg_itr: int | None = None,
    val_criterion: str = "forecast",
    curve_path: str | None = None,
    events_path: str | None = None,
    dp_devices: int | None = None,
    eval_mesh: tuple[int, int] | None = None,
    lockstep: bool = False,
    restart_mode: str = "seq",
    restart_devices: int | None = None,
):
    common.enable_compile_cache()
    key = host_key(seed)

    dg = SyntheticCohort.load(data_path)
    if not eval_only:
        dg.set_train_size(sample)
    print("Training with {} samples".format(sample))

    model = common.build_sim_model(
        model_method,
        data_config,
        encoder_output_dim=encoder_output_dim,
        elbo=elbo,
        ode_method=optim_config.ode_method,
        ablate=ablate,
        lockstep=lockstep,
    )

    niters = optim_config.niters if arg_itr is None else arg_itr
    best_on_disk = 1e9
    params = None

    if restart_mode != "seq":
        if dp_devices and restart_mode != "shard":
            raise ValueError(
                "--restart_mode=vmap does not compose with --dp; use "
                "--restart_mode=shard with --dp for a 2-D restart x data mesh")
        if init_path is not None and not eval_only:
            raise ValueError(
                "--restart_mode=vmap/shard does not support --init warm starts; "
                "use the default --restart_mode=seq")

    if restart_mode != "seq" and not eval_only:
        # Batched multi-restart experiment: ALL restarts run as ONE device
        # program (vmap over the restart axis; "shard" additionally spreads
        # restarts across a device mesh — optionally 2-D with --dp). Key
        # chain is identical to the sequential loop below, draw for draw.
        key, params, best_on_disk = common.run_batched_experiment(
            key, model, dg, n_restart=optim_config.n_restart, niters=niters,
            batch_size=optim_config.batch_size, lr=optim_config.lr,
            test_freq=optim_config.test_freq, path=path,
            best_on_disk=best_on_disk, early_stop=optim_config.early_stop,
            shuffle=optim_config.shuffle, val_criterion=val_criterion,
            val_t0=eval_config.t0, curve_path=curve_path,
            events_path=events_path, restart_mode=restart_mode,
            restart_devices=restart_devices, dp_devices=dp_devices)
    else:
        for i in range(optim_config.n_restart):
            key, k_init, k_train = host_split(key, 3)
            params = init_vi(k_init, model)

            if eval_only:
                break

            if init_path is not None:
                params, _, _ = load_checkpoint(init_path, model.model_name)
                params = jax.tree_util.tree_map(jax.numpy.asarray, params)

            params, best_on_disk, _ = variational_training_loop(
                niters=niters,
                data_generator=dg,
                model=model,
                params=params,
                batch_size=optim_config.batch_size,
                lr=optim_config.lr,
                test_freq=optim_config.test_freq,
                key=k_train,
                path=path,
                best_on_disk=best_on_disk,
                early_stop=optim_config.early_stop,
                shuffle=optim_config.shuffle,
                val_criterion=val_criterion,
                val_t0=eval_config.t0,
                # Curve/event logs capture the LAST restart's trajectory (the
                # reference's exp_lhm.csv is a restart=1 run, Fig9.ipynb).
                curve_path=curve_path,
                events_path=events_path,
                dp_devices=dp_devices,
            )

    if eval_only:
        params, _, best_loss = load_checkpoint(path, model.model_name)
        params = jax.tree_util.tree_map(jax.numpy.asarray, params)
        print("Overall best loss: {:.6f}".format(best_loss))

    key, k_eval = host_split(key)
    if eval_mesh is not None:
        from ..parallel import evaluate_sharded, make_mesh_2d

        mesh = make_mesh_2d(*eval_mesh)
        evaluate_sharded(params, model, dg, optim_config.batch_size, eval_config.t0,
                         mesh=mesh, key=k_eval)
    else:
        evaluate(params, model, dg, optim_config.batch_size, eval_config.t0, key=k_eval)
    return params, model


def build_parser():
    parser = argparse.ArgumentParser("PKPD simulation")
    parser.add_argument("--method", choices=["expert", "neural", "hybrid"], default="hybrid", type=str)
    parser.add_argument("--device", choices=["0", "1", "c"], default="1", type=str)  # interface parity; ignored
    parser.add_argument("--seed", default=666, type=int)
    parser.add_argument("--sample", default=1000, type=int)
    parser.add_argument("--path", default=None, type=str)
    parser.add_argument("--restart", default=3, type=int)
    parser.add_argument("--arg_itr", default=None, type=int)
    parser.add_argument("--eval", default="n", type=str)
    parser.add_argument("--elbo", default="y", type=str)
    parser.add_argument("--init", default=None, type=str)
    parser.add_argument("--batch_size", default=50, type=int)
    parser.add_argument("--t0", default=5, type=int)
    parser.add_argument("--lr", default=0.01, type=float)
    parser.add_argument("--data_config", default=None, type=str)
    parser.add_argument("--encoder_output_dim", default=None, type=int)
    parser.add_argument("--data_path", default="data/datafile_dose_exp.pkl", type=str)
    parser.add_argument("--ablate", default=False, type=bool)
    # "forecast" selects checkpoints on the t0-forecast error (the test
    # figure of merit); "elbo" is the reference's full-sequence val loss.
    parser.add_argument("--val_criterion", choices=["forecast", "elbo"], default="forecast", type=str)
    # Structured observability (replaces stdout scraping for Fig9 curves):
    parser.add_argument("--curve_path", default=None, type=str,
                        help="write iter,val_loss,train_loss CSV (exp_lhm.csv format)")
    parser.add_argument("--events_path", default=None, type=str,
                        help="append JSONL training events")
    parser.add_argument("--step_control", choices=["per_sample", "lockstep"], default="per_sample",
                        type=str,
                        help="adaptive step controller granularity: per-sample (TPU-native "
                             "default) or lockstep (one controller per batch, torchdiffeq "
                             "semantics — for step-space parity A/Bs)")
    parser.add_argument("--dp", default=0, type=int,
                        help="data-parallel device count (0/1 = single device)")
    parser.add_argument("--restart_mode", choices=["seq", "vmap", "shard"], default="seq",
                        type=str,
                        help="seq: one fused program per restart (default); vmap: ALL "
                             "restarts batched into one device program; shard: vmap + "
                             "restarts spread over a device mesh (zero collectives)")
    parser.add_argument("--restart_devices", default=0, type=int,
                        help="device count for --restart_mode=shard (default n_restart)")
    parser.add_argument("--eval_mesh", default=None, type=str,
                        help="'DPxMC' (e.g. 4x2): evaluate on a 2-D patients-x-MC device mesh")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    data_config = common.resolve_data_config(args.data_config, args.sample)
    optim_config = OptimConfig(shuffle=False, n_restart=args.restart, batch_size=args.batch_size, lr=args.lr)
    run(
        seed=args.seed,
        elbo=args.elbo == "y",
        eval_only=args.eval == "y",
        init_path=args.init,
        data_path=args.data_path,
        sample=args.sample,
        data_config=data_config,
        model_method=args.method,
        path=args.path,
        optim_config=optim_config,
        eval_config=EvalConfig(t0=args.t0),
        encoder_output_dim=args.encoder_output_dim,
        ablate=args.ablate,
        arg_itr=args.arg_itr,
        val_criterion=args.val_criterion,
        curve_path=args.curve_path,
        events_path=args.events_path,
        dp_devices=args.dp if args.dp > 1 else None,
        eval_mesh=tuple(int(x) for x in args.eval_mesh.split("x")) if args.eval_mesh else None,
        lockstep=args.step_control == "lockstep",
        restart_mode=args.restart_mode,
        restart_devices=args.restart_devices or None,
    )


if __name__ == "__main__":
    main()
