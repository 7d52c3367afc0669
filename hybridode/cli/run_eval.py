"""Eval-only CLI: load a checkpoint, run the horizon evaluation, pickle it.

Re-design of experiments/run_eval.py (reference): asserts eval-only, loads
the best checkpoint, evaluate_horizon, dumps the result dict for Fig7.
"""

from __future__ import annotations

import argparse
import pickle

import jax
import jax.numpy as jnp

from ..config import EvalConfig, OptimConfig
from ..data import SyntheticCohort
from ..eval import evaluate_horizon
from ..inference import load_checkpoint
from ..utils.hostrng import host_key, host_split
from . import common


def run(seed, data_path, data_config, model_method, path, optim_config, eval_config,
        encoder_output_dim=None, result_path=None):
    common.enable_compile_cache()
    key = host_key(seed)

    dg = SyntheticCohort.load(data_path)
    model = common.build_sim_model(model_method, data_config, encoder_output_dim=encoder_output_dim,
                                   ode_method=optim_config.ode_method)
    params, _, best_loss = load_checkpoint(path, model.model_name)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    print("Overall best loss: {:.6f}".format(best_loss))

    res = evaluate_horizon(params, model, dg, optim_config.batch_size, eval_config.t0, key=key)
    if result_path is not None:
        with open(result_path, "wb") as f:
            pickle.dump(res, f)
    return res


def main(argv=None):
    parser = argparse.ArgumentParser("PKPD eval")
    parser.add_argument("--method", choices=["expert", "neural", "hybrid"], default="hybrid", type=str)
    parser.add_argument("--device", choices=["0", "1", "c"], default="1", type=str)
    parser.add_argument("--seed", default=666, type=int)
    parser.add_argument("--sample", default=1000, type=int)
    parser.add_argument("--path", default=None, type=str)
    parser.add_argument("--eval", default="y", type=str)
    parser.add_argument("--batch_size", default=50, type=int)
    parser.add_argument("--t0", default=5, type=int)
    parser.add_argument("--data_config", default=None, type=str)
    parser.add_argument("--encoder_output_dim", default=None, type=int)
    parser.add_argument("--data_path", default="data/datafile_dose_exp_test.pkl", type=str)
    parser.add_argument("--result_path", default=None, type=str)
    args = parser.parse_args(argv)

    assert args.eval == "y", "run_eval is eval-only (reference run_eval.py:152)"
    data_config = common.resolve_data_config(args.data_config, args.sample)
    optim_config = OptimConfig(batch_size=args.batch_size)
    run(args.seed, args.data_path, data_config, args.method, args.path, optim_config,
        EvalConfig(t0=args.t0), args.encoder_output_dim, args.result_path)


if __name__ == "__main__":
    main()
