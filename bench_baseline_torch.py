"""Torch-CPU reference-equivalent baseline for bench.py's vs_baseline.

torchdiffeq is not installed in this image, so this harness re-creates the
reference's training regime in plain PyTorch with an independent dopri5
implementation (same Dormand-Prince tableau as hybridode.solvers.tableaus,
same rtol/atol/controller constants): hybrid LHM on a dim-8-shaped cohort,
backprop through the solver, Adam, batch 50 — i.e. what one reference epoch
(20 iterations of run_simulation.py --data_config dim8) costs on CPU.

Writes BASELINE_TORCH.json {"epoch_seconds": ...} next to this file.
Run once per machine: `python bench_baseline_torch.py [--iters 20]`.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import torch
import torch.nn as tnn

from hybridode.solvers import tableaus

DTYPE = torch.float32


def dopri5_torch(f, y0, ts, rtol=1e-7, atol=1e-8, max_steps=2000):
    """Minimal adaptive DOPRI5 with linear dense output at grid times."""
    A = torch.tensor(tableaus.DOPRI5_A, dtype=DTYPE)
    C = torch.tensor(tableaus.DOPRI5_C, dtype=DTYPE)
    B = torch.tensor(tableaus.DOPRI5_B, dtype=DTYPE)
    E = torch.tensor(tableaus.DOPRI5_E, dtype=DTYPE)

    t = ts[0]
    y = y0
    f0 = f(t, y)
    # simple initial step
    scale = atol + y0.abs() * rtol
    d0 = (y0 / scale).pow(2).mean().sqrt()
    d1 = (f0 / scale).pow(2).mean().sqrt()
    h = torch.clamp(0.01 * d0 / (d1 + 1e-30), 1e-6, 1.0)

    out = [y0]
    next_idx = 1
    t_final = ts[-1]
    prev_t, prev_y = t, y

    for _ in range(max_steps):
        if next_idx >= len(ts):
            break
        h = torch.minimum(h, t_final - t)
        ks = [f0]
        for i in range(1, 7):
            yi = y + h * sum(ks[j] * A[i, j] for j in range(i))
            ks.append(f(t + C[i] * h, yi))
        y1 = y + h * sum(ks[i] * B[i] for i in range(7))
        err = h * sum(ks[i] * E[i] for i in range(7))
        sc = atol + rtol * torch.maximum(y.abs(), y1.abs())
        norm = (err / sc).pow(2).mean().sqrt()
        if float(norm) <= 1.0:
            prev_t, prev_y = t, y
            t = t + h
            f0 = ks[6]
            # linear interp for crossed grid points (cheap; parity not needed
            # for a wall-clock baseline)
            while next_idx < len(ts) and ts[next_idx] <= t + 1e-9:
                theta = (ts[next_idx] - prev_t) / (t - prev_t + 1e-30)
                out.append(prev_y + theta * (y1 - prev_y))
                next_idx += 1
            y = y1
        factor = float(torch.clamp(0.9 * norm.pow(-0.2), 0.2, 10.0)) if float(norm) > 0 else 10.0
        h = h * factor
        if float(t) >= float(t_final):
            break
    while next_idx < len(ts):
        out.append(y)
        next_idx += 1
    return torch.stack(out)


class HybridField(tnn.Module):
    """Expert PK/PD + tanh-linear remainder, matching the hybrid LHM."""

    def __init__(self, latent_dim):
        super().__init__()
        self.latent_dim = latent_dim
        for name in ("HillCure", "HillPatho", "ec50", "emax", "k_dexa", "k_dci", "k_dcu",
                     "k_dp", "k_id", "k_if", "k_io", "k_im", "kel"):
            self.register_parameter(name, tnn.Parameter(torch.tensor(1.0 if name[0] == "k" or name[0] == "e" else 2.0)))
        self.ml = tnn.Sequential(tnn.Linear(latent_dim, latent_dim - 4), tnn.Tanh())
        self.times = None
        self.amounts = None

    def forward(self, t, y):
        D, IR, IM, D2 = y[:, 0], y[:, 1], y[:, 2], y[:, 3]
        active = (t >= self.times).to(DTYPE)
        dose = self.amounts * (torch.exp(self.kel * (self.times - t) * active) * active).sum(-1)
        d1 = D * self.k_dp - D * IM.abs().pow(self.HillCure) * self.k_dcu - D * IR * self.k_dci
        irh = IR.abs().pow(self.HillPatho)
        d2 = D * self.k_id - IR * self.k_io + D * IR * self.k_if + irh * self.emax / (self.ec50 + irh) \
            - D2 * IR * self.k_dexa
        d3 = IR * self.k_im
        d4 = self.kel * dose - self.kel * D2
        return torch.cat([torch.stack([d1, d2, d3, d4], -1), self.ml(y)], -1)


class Model(tnn.Module):
    def __init__(self, obs, latent):
        super().__init__()
        self.lstm = tnn.LSTM(obs + 1, obs * 2)
        self.mu = tnn.Linear(obs * 2, latent)
        self.lv = tnn.Linear(obs * 2, latent)
        self.field = HybridField(latent)
        self.head = tnn.Linear(latent, obs)

    def loss(self, x, a, mask, ts):
        y_in = torch.cat([x, a], -1) * torch.cat([mask, torch.ones_like(a)], -1)
        out, _ = self.lstm(torch.flip(y_in, [0]))
        h = out[-1]
        mu = torch.exp(self.mu(h)) / 10
        lv = self.lv(h) - 5
        z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)

        self.field.amounts = a[..., 0].max(0).values
        self.field.times = a[..., 0].argmax(0)[:, None].to(DTYPE)
        traj = dopri5_torch(self.field, z, ts)
        x_hat = self.head(traj)
        lik = ((x - x_hat) ** 2 * mask).sum() / x.shape[1]
        # Monte-Carlo KL against the Exponential(100) prior, 100 samples in a
        # Python loop — the reference's hybrid KL path (model.py:1198-1214).
        eps = torch.finfo(DTYPE).eps
        mc = []
        for _ in range(100):
            zk = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            zk = torch.where(zk <= 0, torch.full_like(zk, eps), zk)
            log_q = torch.distributions.Normal(mu, torch.exp(0.5 * lv)).log_prob(zk).sum(-1)
            log_p = (torch.log(torch.tensor(100.0)) - 100.0 * zk).sum(-1)
            mc.append(log_q - log_p)
        kld = torch.stack(mc, -1).mean()
        return lik + kld


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--batch", type=int, default=50)
    args = parser.parse_args()

    torch.manual_seed(0)
    np.random.seed(0)
    obs, latent, T = 40, 8, 15
    model = Model(obs, latent)
    ts = torch.arange(0.0, 15.0, dtype=DTYPE)

    x = torch.randn(T, 1000, obs)
    a = torch.zeros(T, 1000, 1)
    a[3, :, 0] = torch.rand(1000) * 10
    mask = (torch.rand(T, 1000, obs) > 0.5).to(DTYPE)

    opt = torch.optim.Adam(
        [p for n, p in model.named_parameters() if n.startswith(("lstm", "mu", "lv", "head", "field.ml"))],
        lr=0.01,
    )

    # warmup
    idx = np.random.choice(1000, args.batch, replace=False)
    loss = model.loss(x[:, idx], a[:, idx], mask[:, idx], ts)
    loss.backward()
    opt.step()

    t0 = time.time()
    for _ in range(args.iters):
        idx = np.random.choice(1000, args.batch, replace=False)
        opt.zero_grad()
        loss = model.loss(x[:, idx], a[:, idx], mask[:, idx], ts)
        loss.backward()
        opt.step()
    epoch_seconds = time.time() - t0

    out = {"epoch_seconds": epoch_seconds, "iters": args.iters, "batch": args.batch,
           "note": "torch-CPU hybrid LHM, dopri5 rtol=1e-7 atol=1e-8, backprop through solver"}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_TORCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
