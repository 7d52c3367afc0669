"""Residual hybrid: train a neural model on the expert model's residuals.

Re-design of experiments/run_simulation_residual.py: load the trained expert,
replace the val fold's measurements with residuals x - x_hat_expert
(111-121), train a fresh neural model on that fold (train_fold="val"), then
evaluate the expert+residual sum via evaluate_ensemble (165-171).
"""

from __future__ import annotations

import argparse
import pickle

import jax
import jax.numpy as jnp

from ..config import EvalConfig, OptimConfig
from ..data import SyntheticCohort
from ..eval import evaluate_ensemble, evaluate_ensemble_horizon
from ..inference import init_vi, variational_training_loop
from ..utils.hostrng import host_key, host_split
from . import common
from .run_simulation_ensemble import init_and_load, predict_mean


def run(seed, eval_only, data_path, sample, data_config, path, res_path, optim_config, eval_config,
        horizon=False, result_path=None, val_criterion="forecast"):
    common.enable_compile_cache()
    key = host_key(seed)
    batch_size = min(optim_config.batch_size, sample)

    dg = SyntheticCohort.load(data_path)
    print("Training with {} samples".format(sample))

    key, k_e = host_split(key)
    params_e, model_e = init_and_load("expert", data_config, optim_config, k_e, init_path=path)

    # Residualize the val fold (run_simulation_residual.py:111-121).
    x_hat = predict_mean(params_e, model_e, dg.data_val)
    residual = dg.data_val["measurements"] - x_hat
    dg.data_val = dict(dg.data_val)
    dg.data_val["measurements"] = residual
    n_sample = min(sample, residual.shape[1])
    dg.set_val_size(n_sample)

    best_on_disk = 1e9
    params = model = None
    for _ in range(optim_config.n_restart):
        key, k_init, k_train = host_split(key, 3)
        model = common.build_sim_model("neural", data_config, elbo=True, ode_method=optim_config.ode_method)
        params = init_vi(k_init, model)
        if eval_only:
            break
        params, best_on_disk, _ = variational_training_loop(
            niters=optim_config.niters, data_generator=dg, model=model, params=params,
            batch_size=batch_size, lr=optim_config.lr, test_freq=optim_config.test_freq,
            key=k_train, path=res_path, best_on_disk=best_on_disk,
            early_stop=optim_config.early_stop, shuffle=optim_config.shuffle, train_fold="val",
            val_criterion=val_criterion, val_t0=eval_config.t0,
        )
    print("Ensemble weights learned.")

    if not horizon:
        evaluate_ensemble(params_e, model_e, params, model, dg, batch_size, eval_config.t0)
    else:
        res = evaluate_ensemble_horizon(params_e, model_e, params, model, dg, batch_size, eval_config.t0)
        with open(result_path, "wb") as f:
            pickle.dump(res, f)


def main(argv=None):
    parser = argparse.ArgumentParser("PKPD simulation residual")
    parser.add_argument("--method", choices=["residual"], default="residual", type=str)
    parser.add_argument("--device", choices=["0", "1", "c"], default="1", type=str)
    parser.add_argument("--seed", default=666, type=int)
    parser.add_argument("--sample", default=1000, type=int)
    parser.add_argument("--path", default=None, type=str)
    parser.add_argument("--res_path", default=None, type=str)
    parser.add_argument("--t0", default=5, type=int)
    parser.add_argument("--restart", default=3, type=int)
    parser.add_argument("--eval", default="n", type=str)
    parser.add_argument("--data_path", default="data/datafile_dose_exp.pkl", type=str)
    parser.add_argument("--data_config", default=None, type=str)
    parser.add_argument("--lr", default=0.01, type=float)
    parser.add_argument("--horizon", default=False, type=bool)
    parser.add_argument("--result_path", default=None, type=str)
    parser.add_argument("--val_criterion", choices=["forecast", "elbo"], default="forecast", type=str,
                        help="checkpoint-selection criterion for the residual model; elbo is the "
                             "reference's rule (training_utils.py:56-80)")
    args = parser.parse_args(argv)

    res_path = args.res_path if args.res_path is not None else args.path + "res"
    data_config = common.resolve_data_config(args.data_config, args.sample)
    optim_config = OptimConfig(shuffle=False, n_restart=args.restart, lr=args.lr)
    run(args.seed, args.eval == "y", args.data_path, args.sample, data_config, args.path, res_path,
        optim_config, EvalConfig(t0=args.t0), args.horizon, args.result_path,
        val_criterion=args.val_criterion)


if __name__ == "__main__":
    main()
