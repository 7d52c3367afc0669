"""Weight-copy parity diagnostic for the real-track gruode cell (VERDICT r4 #5).

The gruode benchmark cell trails the reference code at both budgets
(ours 0.3030 vs ref 0.2723 at n=300/n=1500, VALIDATION.md). Because the
real-track gruode training is FULLY deterministic given the parameter init
(elbo=False so z=mu, shuffle=False so the batch stream is fixed slices,
no solver), any systematic gap must come from one of:

  (1) forward math        — encoder LSTM / GRU-ODE cell / output head,
  (2) loss math           — the t0-window masked MSE,
  (3) gradient/optimizer  — autodiff or Adam semantics,
  (4) init distributions  — the draws themselves (torch RNG vs ours).

This script eliminates (1)-(3) by construction: it builds the ACTUAL
reference modules (model.py EncoderLSTMReal + DecoderRealBenchmark(gruode)
+ VariationalInferenceReal, run_real.py:38-75 wiring, torch CPU via the
.ref_shim), copies the torch-drawn weights into our parameter tree, and
compares, on the same stand-in batch:

  * encoder (mu, log_var),
  * decoder x_hat,
  * the training loss,
  * every parameter's gradient (max |delta| per leaf),
  * N steps of Adam(lr=0.01) applied by both frameworks.

If all match to f32 tolerance, the only remaining degree of freedom is (4)
— the init draws — which the committed 6-seed sweep already shows flipping
per-seed orderings. Run: python experiments/gruode_parity.py
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, ".ref_shim"))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import jax.numpy as jnp
import numpy as np
import torch

from hybridode.cli.common import build_real_model
from hybridode.data import RealCohort
from hybridode.inference import loss_fn, make_optimizer


def t2n(t):
    # copy=True matters: t.detach().numpy() SHARES the torch buffer, and
    # jnp.asarray on CPU can zero-copy a contiguous numpy array — without the
    # copy, torch's in-place Adam step would silently mutate the "jax" params.
    return np.array(t.detach().numpy(), dtype=np.float32, copy=True)


def torch_params_to_tree(enc, dec):
    """Map the torch modules' tensors into our init_vi param-tree layout."""
    def lin(seq, i):
        return {"w": t2n(seq[i].weight).T, "b": t2n(seq[i].bias)}

    return {
        "encoder": {
            "lstm": {
                "w_ih": t2n(enc.lstm.weight_ih_l0).T,
                "w_hh": t2n(enc.lstm.weight_hh_l0).T,
                "b_ih": t2n(enc.lstm.bias_ih_l0),
                "b_hh": t2n(enc.lstm.bias_hh_l0),
            },
            "lin": [lin(enc.lin, 0), lin(enc.lin, 2)],
            "log_var": [lin(enc.log_var, 0), lin(enc.log_var, 2)],
        },
        "decoder": {
            "output": [lin(dec.output_function, 0), lin(dec.output_function, 2)],
            "lin_hz": {"w": t2n(dec.rnn.lin_hz.weight).T},
            "lin_hn": {"w": t2n(dec.rnn.lin_hn.weight).T},
        },
    }


def main():
    import model as refmodel  # the reference module, via sys.path

    # Same stand-in arrays both sides (data_real/ is the canonical
    # make_real_standin(seed=2021) output — do NOT regenerate here).
    dg = RealCohort(data_path=os.path.join(REPO, "data_real/"), data_type="5",
                    latent_dim=10, val_size=100, test_size=1000)
    dg.split_sample()
    batch = {k: np.asarray(v[:, :100]) for k, v in dg.data_train.items()}

    t0 = 24
    ours = build_real_model("gruode", dg.obs_dim, dg.action_dim, dg.static_dim,
                            dg.t_max, dg.step_size)

    # Reference wiring, run_real.py:38-75 (encoder_output_dim=20, ratio 1.2).
    torch.manual_seed(666)
    input_dim = dg.obs_dim + dg.action_dim + dg.static_dim + 1
    enc = refmodel.EncoderLSTMReal(input_dim, int(input_dim * 1.2), 20,
                                   output_all=False, reverse=False,
                                   device=torch.device("cpu"))
    dec = refmodel.DecoderRealBenchmark(
        dg.obs_dim, 20, dg.action_dim, dg.static_dim,
        int((dg.obs_dim + dg.action_dim + dg.static_dim) * 1.2),
        dg.t_max, dg.step_size, ode_type="gruode", t0=t0,
        device=torch.device("cpu"))
    vi = refmodel.VariationalInferenceReal(enc, dec, elbo=False, t0=t0, weight=False)

    params = jax.tree_util.tree_map(jnp.asarray, torch_params_to_tree(enc, dec))

    tb = {k: torch.tensor(v) for k, v in batch.items()}

    # --- forward parity -----------------------------------------------------
    with torch.no_grad():
        a_in = torch.cat([tb["actions"], tb["statics"]], dim=-1)
        mu_t, logvar_t = enc(tb["measurements"][:t0], a_in[:t0], tb["masks"][:t0])
        xhat_t, _ = dec(mu_t, tb["actions"], tb["statics"])

    from hybridode.inference.elbo import decode, encode
    a_in_j = jnp.concatenate([jnp.asarray(batch["actions"]), jnp.asarray(batch["statics"])], axis=-1)
    mu_j, logvar_j = encode(params, ours, jnp.asarray(batch["measurements"][:t0]),
                            a_in_j[:t0], jnp.asarray(batch["masks"][:t0]))
    xhat_j, _ = decode(params, ours, mu_j, {k: jnp.asarray(v) for k, v in batch.items()})

    def d(a, b):
        return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))

    print(f"mu       max|delta| = {d(mu_j, t2n(mu_t)):.3e}")
    print(f"log_var  max|delta| = {d(logvar_j, t2n(logvar_t)):.3e}")
    print(f"x_hat    max|delta| = {d(xhat_j, t2n(xhat_t)):.3e}   "
          f"(|x_hat| scale {float(np.abs(t2n(xhat_t)).max()):.3f})")

    # --- loss + grad parity ---------------------------------------------------
    loss_t = vi.loss(tb)
    vi.zero_grad() if hasattr(vi, "zero_grad") else None
    loss_t.backward()
    print(f"loss: torch {float(loss_t):.6f}", end="  ")

    key = jax.random.PRNGKey(0)  # unused: elbo=False path is deterministic
    loss_j, grads_j = jax.value_and_grad(loss_fn)(params, ours, {k: jnp.asarray(v) for k, v in batch.items()}, key)
    print(f"ours {float(loss_j):.6f}  delta {abs(float(loss_j) - float(loss_t)):.3e}")

    def torch_grads():
        def g(t):
            return t2n(t.grad) if t.grad is not None else np.zeros(t.shape, np.float32)

        def lin_g(seq, i):
            return {"w": g(seq[i].weight).T, "b": g(seq[i].bias)}

        return {
            "encoder": {
                "lstm": {"w_ih": g(enc.lstm.weight_ih_l0).T, "w_hh": g(enc.lstm.weight_hh_l0).T,
                         "b_ih": g(enc.lstm.bias_ih_l0), "b_hh": g(enc.lstm.bias_hh_l0)},
                "lin": [lin_g(enc.lin, 0), lin_g(enc.lin, 2)],
                "log_var": [lin_g(enc.log_var, 0), lin_g(enc.log_var, 2)],
            },
            "decoder": {
                "output": [lin_g(dec.output_function, 0), lin_g(dec.output_function, 2)],
                "lin_hz": {"w": g(dec.rnn.lin_hz.weight).T},
                "lin_hn": {"w": g(dec.rnn.lin_hn.weight).T},
            },
        }

    gt = torch_grads()
    flat_j, _ = jax.tree_util.tree_flatten_with_path(grads_j)
    flat_t, _ = jax.tree_util.tree_flatten_with_path(gt)
    worst = 0.0
    for (pj, vj), (pt, vt) in zip(sorted(flat_j, key=lambda kv: str(kv[0])),
                                  sorted(flat_t, key=lambda kv: str(kv[0]))):
        assert str(pj) == str(pt), (pj, pt)
        delta = d(vj, vt)
        scale = float(np.abs(np.asarray(vt)).max()) or 1.0
        worst = max(worst, delta / scale)
        print(f"  grad {jax.tree_util.keystr(pj):55s} max|delta| {delta:.3e}  (rel {delta / scale:.2e})")
    print(f"worst relative grad delta: {worst:.3e}")

    # --- N optimizer steps, both frameworks ----------------------------------
    n_steps = 10
    opt_t = torch.optim.Adam(list(enc.parameters()) + list(dec.parameters()), lr=0.01)
    optimizer = make_optimizer(0.01, params)
    opt_state = optimizer.init(params)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    p = params
    import optax

    for i in range(n_steps):
        opt_t.zero_grad()
        lt = vi.loss(tb)
        lt.backward()
        opt_t.step()

        lj, gj = jax.value_and_grad(loss_fn)(p, ours, jb, key)
        updates, opt_state = optimizer.update(gj, opt_state, p)
        p = optax.apply_updates(p, updates)
        print(f"step {i}: torch loss {float(lt):.6f}  ours {float(lj):.6f}  "
              f"delta {abs(float(lt) - float(lj)):.3e}")

    pt_after = torch_params_to_tree(enc, dec)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(p)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(pt_after)
    worst_p = 0.0
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda kv: str(kv[0])),
                                  sorted(flat_b, key=lambda kv: str(kv[0]))):
        delta = d(va, vb)
        scale = float(np.abs(np.asarray(vb)).max()) or 1.0
        worst_p = max(worst_p, delta / scale)
    print(f"after {n_steps} Adam steps: worst relative param delta {worst_p:.3e}")


def main_train(seed=666, niters=300):
    """The decisive cross-init experiment: run OUR trainer from the TORCH
    seed-`seed` init (weight-copied) under the exact real_budget.sh gruode
    protocol (sample=100, batch 100, lr 0.01, test_freq 100, early_stop 10,
    shuffle=False) and print rmse_x@t1=30.

    If the forward/loss/grad/optimizer parity above holds, this reproduces
    the ref-code run's trajectory from its own starting point — landing near
    the ref-code 0.2723 (vs ours-init 0.3030) proves the committed gap is
    init-draw luck, not an implementation deviation.
    """
    import shutil
    import tempfile

    import model as refmodel

    from hybridode.cli.run_real import horizon_report, predict_test
    from hybridode.inference import variational_training_loop

    dg = RealCohort(data_path=os.path.join(REPO, "data_real/"), data_type="5",
                    latent_dim=10, val_size=100, test_size=1000)
    dg.split_sample()
    dg.set_train_size(100)

    t0 = 24
    ours = build_real_model("gruode", dg.obs_dim, dg.action_dim, dg.static_dim,
                            dg.t_max, dg.step_size)

    torch.manual_seed(seed)
    input_dim = dg.obs_dim + dg.action_dim + dg.static_dim + 1
    enc = refmodel.EncoderLSTMReal(input_dim, int(input_dim * 1.2), 20,
                                   output_all=False, reverse=False,
                                   device=torch.device("cpu"))
    dec = refmodel.DecoderRealBenchmark(
        dg.obs_dim, 20, dg.action_dim, dg.static_dim,
        int((dg.obs_dim + dg.action_dim + dg.static_dim) * 1.2),
        dg.t_max, dg.step_size, ode_type="gruode", t0=t0,
        device=torch.device("cpu"))
    params = jax.tree_util.tree_map(jnp.asarray, torch_params_to_tree(enc, dec))

    tmp = tempfile.mkdtemp(prefix="gruode_xinit_")
    try:
        params, _, _ = variational_training_loop(
            niters=niters, data_generator=dg, model=ours, params=params,
            batch_size=100, lr=0.01, test_freq=100,
            key=jax.random.PRNGKey(0),  # unused: elbo=False, shuffle=False
            path=tmp + "/", best_on_disk=1e9, early_stop=10, shuffle=False,
            train_expert=True)
        data = dg.data_test
        x_hat = predict_test(params, ours, data, t0)
        rows = horizon_report(np.asarray(data["measurements"]), np.asarray(x_hat),
                              np.asarray(data["masks"]), t0)
        print(f"\ncross-init result (torch seed {seed} init, our trainer, "
              f"niters={niters}): rmse_x@t1=30 = {rows[0][1]:.4f}")
        print("reference-code run from the same init scored 0.2723; "
              "our-init run scored 0.3030 (results/real_budget/)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    if "--train" in sys.argv:
        main_train()
    else:
        main()
