"""Composed-encoder init-distribution comparison: ours vs the reference.

Round-3 verdict, 800-row variance item: per-layer init is torch-parity
tested, but nothing demonstrates the COMPOSED encoder output distribution
at init matches the reference's — if our restarts start from a wider (or
shifted) posterior-mean distribution, they explore different basins and the
ELBO selection rule then picks among more-diverse candidates, widening the
seed-to-seed spread.

Protocol: the hybrid sample-track encoder (input 21, hidden 40, output 6,
normalize=True — reference run_simulation.py:96-101 with obs_dim=20,
encoder_latent_ratio=2.0) evaluated on ONE fixed data batch (first 100
training patients of the seed-666 cohort) under K=200 fresh inits per side:

  * reference: /root/reference/model.py EncoderLSTM, torch.manual_seed(k)
  * ours:      hybridode EncoderLSTM, init_encoder_lstm(PRNGKey(k))

Reported per output head (mu after exp()/10, log_var after -5):
  - grand mean/SD over (inits x batch x dim) — the marginal distribution
  - SD ACROSS inits of the per-init batch-mean — the "restart diversity"
    that drives basin exploration

Writes results/init_dist.md.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".ref_shim"))
sys.path.insert(0, "/root/reference")

K = int(os.environ.get("INITDIST_K", "200"))
B = 100


def main():
    import torch

    import jax

    from hybridode.data import SyntheticCohort
    from hybridode.models.encoders import EncoderLSTMSpec, encoder_lstm_apply, init_encoder_lstm

    import model as ref_model  # /root/reference/model.py

    dg = SyntheticCohort.load("data/datafile_dose_exp.pkl")
    batch = dg.get_split("train", B, 0)
    x = np.asarray(batch["measurements"], np.float32)
    a = np.asarray(batch["actions"], np.float32)
    m = np.asarray(batch["masks"], np.float32)

    tx, ta, tm = (torch.tensor(v) for v in (x, a, m))
    device = torch.device("cpu")

    spec = EncoderLSTMSpec(21, 40, 6, normalize=True)
    apply_j = jax.jit(lambda p: encoder_lstm_apply(p, spec, x, a, m))

    mus = {"ref": [], "ours": []}
    lvs = {"ref": [], "ours": []}
    for k in range(K):
        torch.manual_seed(k)
        enc = ref_model.EncoderLSTM(21, 40, 6, normalize=True, device=device)
        with torch.no_grad():
            mu_t, lv_t = enc(tx, ta, tm)
        mus["ref"].append(mu_t.numpy())
        lvs["ref"].append(lv_t.numpy())

        p = init_encoder_lstm(jax.random.PRNGKey(k), spec)
        mu_j, lv_j = apply_j(p)
        mus["ours"].append(np.asarray(mu_j))
        lvs["ours"].append(np.asarray(lv_j))

    lines = [
        "## Composed-encoder init distribution: ours vs reference code",
        "",
        f"K={K} fresh inits/side, fixed first-{B}-patient batch of the seed-666",
        "cohort, hybrid sample-track encoder (21 -> LSTM 40 -> 6, normalize=True).",
        "`restart SD` = SD across inits of the per-init batch-mean — the spread",
        "that determines how differently two restarts begin.",
        "",
        "| head | side | grand mean | grand SD | restart SD |",
        "|---|---|---|---|---|",
    ]
    for name, store in (("mu (=exp(.)/10)", mus), ("log_var (-5)", lvs)):
        for side in ("ref", "ours"):
            arr = np.stack(store[side])  # (K, B, 6)
            per_init_mean = arr.mean(axis=(1, 2))  # (K,)
            lines.append(
                f"| {name} | {side} | {arr.mean():.5f} | {arr.std():.5f} | "
                f"{per_init_mean.std():.5f} |"
            )
    out = "\n".join(lines) + "\n"
    with open("results/init_dist.md", "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
