"""Real-data (ICU cohort) CLI.

Re-design of experiments/run_real.py: DataGeneratorReal(2097, latent_dim=10,
data_type="5"), t0=24, fixed-step solvers, VariationalInferenceReal with
elbo=False (pure masked MSE), all decoder params trained, horizon RMSE at
t1 in {30, 36, 48, 96} printed as CSV lines (run_real.py:127-137).

The DDW arrays are license-restricted; pass --standin y to validate the
pipeline on synthetic stand-in arrays of the same shapes.
"""

from __future__ import annotations

import argparse
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..data import RealCohort, make_real_standin
from ..eval.metrics import bootstrap_rmse
from ..inference import init_vi, load_checkpoint, variational_training_loop
from ..inference.elbo import decode, encode
from ..utils.hostrng import host_key, host_split
from . import common


def horizon_report(x, x_hat, mask, t0):
    """Masked horizon RMSE at t1 in {30,36,48,96} (run_real.py:127-137)."""
    out = []
    for t1 in (t0 + 6, t0 + 12, t0 + 24, t0 + 24 * 3):
        num = np.sum(np.asarray((x[t0:t1] - x_hat[: t1 - t0]) ** 2 * mask[t0:t1]), axis=(0, 2))
        den = np.sum(np.asarray(mask[t0:t1]), axis=(0, 2))
        a = num / den
        a = a[~np.isnan(a)]
        rmse = float(np.sqrt(np.mean(a)))
        rmse_sd = bootstrap_rmse(a)
        print("rmse_x,{:.4f},{:.4f},{:.4f}".format(t1, rmse, rmse_sd))
        out.append((t1, rmse, rmse_sd))
    return out


def predict_test(params, model, data, t0):
    x, a, mask, s = data["measurements"], data["actions"], data["masks"], data["statics"]
    a_in = jnp.concatenate([a, s], axis=-1)
    mu, _ = encode(params, model, x[:t0], a_in[:t0], mask[:t0])
    x_hat, _ = decode(params, model, mu, data)
    return x_hat


def run(
    seed=666,
    train_sample_size=None,
    method="hybrid",
    ode_method="explicit_adams",
    niters=1500,
    ode_step_div=1,
    encoder_output_dim=20,
    encoder_latent_ratio=1.2,
    weight=False,
    eval_only=False,
    data_path="data/",
    standin=False,
    batch_size=100,
    val_size=100,
    test_size=1000,
    standin_kwargs=None,
    model_dir="model/",
    curve_path=None,
):
    common.enable_compile_cache()
    key = host_key(seed)

    if standin:
        make_real_standin(data_path, data_type="5", **(standin_kwargs or {}))
    dg = RealCohort(data_path=data_path, data_type="5", latent_dim=10, val_size=val_size, test_size=test_size)
    dg.split_sample()
    if train_sample_size is not None:
        dg.set_train_size(train_sample_size)

    t0 = 24
    model = common.build_real_model(
        method, dg.obs_dim, dg.action_dim, dg.static_dim, dg.t_max, dg.step_size,
        encoder_output_dim=encoder_output_dim, encoder_latent_ratio=encoder_latent_ratio,
        ode_method=ode_method, ode_step_div=ode_step_div, t0=t0, weight=weight,
    )

    path = model_dir if train_sample_size is None else model_dir + str(train_sample_size)

    key, k_init, k_train = host_split(key, 3)
    params = init_vi(k_init, model)
    if not eval_only:
        params, _, _ = variational_training_loop(
            niters=niters, data_generator=dg, model=model, params=params, batch_size=batch_size,
            lr=0.01, test_freq=100, key=k_train, path=path, best_on_disk=1e9,
            early_stop=10, shuffle=False, train_expert=True, curve_path=curve_path,
        )
    else:
        params, _, best_loss = load_checkpoint(path, model.model_name)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        print("Overall best loss: {:.6f}".format(best_loss))

    data = dg.data_test
    x_hat = predict_test(params, model, data, t0)
    eval_dict = {
        "x": np.asarray(data["measurements"]),
        "x_hat": np.asarray(x_hat),
        "mask": np.asarray(data["masks"]),
        "name": model.model_name,
        "model_path": path,
    }
    with open(path + model.model_name + "eval.pkl", "wb") as f:
        pickle.dump(eval_dict, f)

    horizon_report(np.asarray(data["measurements"]), np.asarray(x_hat), np.asarray(data["masks"]), t0)
    return params, model


def main(argv=None):
    parser = argparse.ArgumentParser("Real data")
    parser.add_argument("--method", choices=["neural", "hybrid", "tlstm", "gruode", "2nd", "expert"],
                        default="neural", type=str)
    parser.add_argument("--seed", default=666, type=int)
    parser.add_argument("--ode_method", default="explicit_adams", type=str)
    parser.add_argument("--ode_step_div", default=1, type=int)
    parser.add_argument("--encoder_output_dim", default=20, type=int)
    parser.add_argument("--encoder_latent_ratio", default=1.2, type=float)
    parser.add_argument("--weight", default="n", type=str)
    parser.add_argument("--niters", default=1500, type=int)
    parser.add_argument("--sample", default=None, type=int)
    parser.add_argument("--eval_only", default=False, type=bool)
    parser.add_argument("--data_path", default="data/", type=str)
    parser.add_argument("--standin", default="n", type=str)
    parser.add_argument("--curve_path", default=None, type=str,
                        help="write iter,val_loss,train_loss CSV for this run")
    args = parser.parse_args(argv)

    run(
        seed=args.seed, niters=args.niters, train_sample_size=args.sample, method=args.method,
        ode_method=args.ode_method, ode_step_div=args.ode_step_div,
        encoder_output_dim=args.encoder_output_dim, encoder_latent_ratio=args.encoder_latent_ratio,
        weight=args.weight == "y", eval_only=args.eval_only, data_path=args.data_path,
        standin=args.standin == "y", curve_path=args.curve_path,
    )


if __name__ == "__main__":
    main()
