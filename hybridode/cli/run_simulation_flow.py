"""Normalizing-flow posterior (LHM-NF) simulation CLI.

Re-design of experiments/run_simulation_flow.py: EncoderPlanarLSTM with
num_flows=4, VariationalInferenceFlow with mc_size=50, evaluate_flow.
"""

from __future__ import annotations

import argparse

import jax

from ..config import EvalConfig, OptimConfig
from ..data import SyntheticCohort
from ..eval import evaluate
from ..inference import init_vi, load_checkpoint, variational_training_loop
from ..utils.hostrng import host_key, host_split
from . import common


def run(seed, eval_only, data_path, sample, data_config, path, optim_config, eval_config,
        num_flows=4, mc_size=50, arg_itr=None, curve_path=None, events_path=None,
        val_criterion="forecast", restart_mode="seq", restart_devices=None):
    common.enable_compile_cache()
    key = host_key(seed)

    dg = SyntheticCohort.load(data_path)
    if not eval_only:
        dg.set_train_size(sample)
    print("Training with {} samples".format(sample))

    model = common.build_sim_model(
        "hybrid", data_config, elbo=True, ode_method=optim_config.ode_method,
        flow=True, num_flows=num_flows, mc_size=mc_size,
    )

    niters = optim_config.niters if arg_itr is None else arg_itr
    best_on_disk = 1e9
    params = None
    if restart_mode != "seq" and not eval_only:
        # Batched multi-restart experiment — same key chain as the
        # sequential loop below, draw for draw (common.run_batched_experiment).
        key, params, best_on_disk = common.run_batched_experiment(
            key, model, dg, n_restart=optim_config.n_restart, niters=niters,
            batch_size=optim_config.batch_size, lr=optim_config.lr,
            test_freq=optim_config.test_freq, path=path,
            best_on_disk=best_on_disk, early_stop=optim_config.early_stop,
            shuffle=optim_config.shuffle, val_criterion=val_criterion,
            val_t0=eval_config.t0, curve_path=curve_path,
            events_path=events_path, restart_mode=restart_mode,
            restart_devices=restart_devices)
    else:
        for _ in range(optim_config.n_restart):
            key, k_init, k_train = host_split(key, 3)
            params = init_vi(k_init, model)
            if eval_only:
                break
            params, best_on_disk, _ = variational_training_loop(
                niters=niters, data_generator=dg, model=model, params=params,
                batch_size=optim_config.batch_size, lr=optim_config.lr,
                test_freq=optim_config.test_freq, key=k_train, path=path,
                best_on_disk=best_on_disk, early_stop=optim_config.early_stop,
                shuffle=optim_config.shuffle,
                val_criterion=val_criterion, val_t0=eval_config.t0,
                curve_path=curve_path, events_path=events_path,
            )

    if eval_only:
        params, _, best_loss = load_checkpoint(path, model.model_name)
        params = jax.tree_util.tree_map(jax.numpy.asarray, params)
        print("Overall best loss: {:.6f}".format(best_loss))

    key, k_eval = host_split(key)
    evaluate(params, model, dg, optim_config.batch_size, eval_config.t0, key=k_eval)
    return params, model


def main(argv=None):
    parser = argparse.ArgumentParser("PKPD simulation with flow posterior")
    parser.add_argument("--device", choices=["0", "1", "c"], default="1", type=str)
    parser.add_argument("--seed", default=666, type=int)
    parser.add_argument("--sample", default=1000, type=int)
    parser.add_argument("--path", default=None, type=str)
    parser.add_argument("--restart", default=3, type=int)
    parser.add_argument("--arg_itr", default=None, type=int)
    parser.add_argument("--eval", default="n", type=str)
    parser.add_argument("--batch_size", default=50, type=int)
    parser.add_argument("--t0", default=5, type=int)
    parser.add_argument("--lr", default=0.01, type=float)
    parser.add_argument("--data_config", default=None, type=str)
    parser.add_argument("--data_path", default="data/datafile_dose_exp.pkl", type=str)
    parser.add_argument("--num_flows", default=4, type=int)
    parser.add_argument("--mc_size", default=50, type=int)
    parser.add_argument("--val_criterion", choices=["forecast", "elbo"], default="forecast", type=str,
                        help="model-selection rule: full-sequence val-ELBO (reference "
                             "training_utils.py:56-80) or t0-forecast RMSE")
    parser.add_argument("--curve_path", default=None, type=str,
                        help="write iter,val_loss,train_loss CSV (exp_flow.csv format)")
    parser.add_argument("--events_path", default=None, type=str,
                        help="append JSONL training events")
    parser.add_argument("--restart_mode", choices=["seq", "vmap", "shard"], default="seq",
                        type=str,
                        help="seq: one fused program per restart (default); vmap: ALL "
                             "restarts batched into one device program; shard: vmap + "
                             "restarts spread over a device mesh (zero collectives)")
    parser.add_argument("--restart_devices", default=0, type=int,
                        help="device count for --restart_mode=shard (default n_restart)")
    args = parser.parse_args(argv)

    data_config = common.resolve_data_config(args.data_config, args.sample)
    optim_config = OptimConfig(shuffle=False, n_restart=args.restart, batch_size=args.batch_size, lr=args.lr)
    run(args.seed, args.eval == "y", args.data_path, args.sample, data_config, args.path,
        optim_config, EvalConfig(t0=args.t0), args.num_flows, args.mc_size, args.arg_itr,
        curve_path=args.curve_path, events_path=args.events_path,
        val_criterion=args.val_criterion, restart_mode=args.restart_mode,
        restart_devices=args.restart_devices or None)


if __name__ == "__main__":
    main()
