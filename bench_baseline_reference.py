"""Torch-CPU baseline measured on the ACTUAL reference code.

torchdiffeq is not installed in this image, so a shim module implementing its
`odeint(func, y0, t, rtol, atol, method)` API (adaptive DOPRI5 in plain
torch, the same integrator bench_baseline_torch.py uses) is injected on
sys.path ahead of the import in /root/reference/model.py:10. Everything else
— DataGeneratorRoche (LSODA cohort), EncoderLSTM, RocheExpertDecoder,
VariationalInference (MC-KL 100), the frozen-expert optimizer split — is the
reference's own code executing unmodified.

Protocol matches bench.py: dim-8 hybrid LHM, one epoch = 20 Adam iterations
of batch 50, backprop through the solver. Writes BASELINE_TORCH.json.

Run on an otherwise-idle host: `python bench_baseline_reference.py`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"
SHIM_DIR = os.path.join(REPO, ".ref_shim")

_SHIM_SRC = '''
"""torchdiffeq stand-in: reference-API adaptive DOPRI5 in plain torch."""
import torch

_A = [
    [0, 0, 0, 0, 0, 0, 0],
    [1 / 5, 0, 0, 0, 0, 0, 0],
    [3 / 40, 9 / 40, 0, 0, 0, 0, 0],
    [44 / 45, -56 / 15, 32 / 9, 0, 0, 0, 0],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0, 0, 0],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656, 0, 0],
    [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0],
]
_C = [0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1, 1]
_B = [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0]
_E = [35 / 384 - 1951 / 21600, 0, 500 / 1113 - 22642 / 50085, 125 / 192 - 451 / 720,
      -2187 / 6784 - -12231 / 42400, 11 / 84 - 649 / 6300, -1 / 60]


def _rms(x):
    return x.pow(2).mean().sqrt()


def odeint(func, y0, t, rtol=1e-7, atol=1e-8, method="dopri5", options=None):
    if method != "dopri5":
        # fixed-step fallback (midpoint) for non-adaptive requests
        ys = [y0]
        y = y0
        for i in range(len(t) - 1):
            h = t[i + 1] - t[i]
            k1 = func(t[i], y)
            y = y + h * func(t[i] + h / 2, y + h / 2 * k1)
            ys.append(y)
        return torch.stack(ys)

    dtype = y0.dtype
    t = t.to(dtype)
    tt = t[0]
    y = y0
    f0 = func(tt, y)
    scale = atol + y0.abs() * rtol
    d0 = _rms(y0 / scale)
    d1 = _rms(f0 / scale)
    h = torch.clamp(0.01 * d0 / (d1 + 1e-30), 1e-6, 1.0)

    out = [y0]
    next_idx = 1
    t_final = t[-1]
    for _ in range(20000):
        if next_idx >= len(t):
            break
        h = torch.minimum(h, t_final - tt)
        ks = [f0]
        for i in range(1, 7):
            yi = y + h * sum(ks[j] * _A[i][j] for j in range(i) if _A[i][j] != 0)
            ks.append(func(tt + _C[i] * h, yi))
        y1 = y + h * sum(ks[i] * _B[i] for i in range(7) if _B[i] != 0)
        err = h * sum(ks[i] * _E[i] for i in range(7) if _E[i] != 0)
        sc = atol + rtol * torch.maximum(y.abs(), y1.abs())
        norm = _rms(err / sc)
        if float(norm) <= 1.0:
            t_new = tt + h
            while next_idx < len(t) and float(t[next_idx]) <= float(t_new) + 1e-9:
                theta = (t[next_idx] - tt) / (t_new - tt + 1e-30)
                out.append(y + theta * (y1 - y))
                next_idx += 1
            tt = t_new
            y = y1
            f0 = ks[6]
        factor = float(torch.clamp(0.9 * norm.pow(-0.2), 0.2, 10.0)) if float(norm) > 0 else 10.0
        h = h * factor
    while next_idx < len(t):
        out.append(y)
        next_idx += 1
    return torch.stack(out)
'''


def _install_shim():
    pkg = os.path.join(SHIM_DIR, "torchdiffeq")
    os.makedirs(pkg, exist_ok=True)
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write(_SHIM_SRC)
    sys.path.insert(0, SHIM_DIR)
    sys.path.insert(1, REFERENCE)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--batch", type=int, default=50)
    parser.add_argument("--out", type=str, default=os.path.join(REPO, "BASELINE_TORCH.json"))
    args = parser.parse_args()

    _install_shim()
    import numpy as np
    import torch
    import torch.optim as optim

    import dataloader  # reference
    import model  # reference
    import sim_config  # reference

    np.random.seed(666)
    torch.manual_seed(666)
    device = torch.device("cpu")

    # dim-8 cohort, 1000 usable train samples (generate_data_dim8.py regime,
    # sized like bench.py: n=1100, val/test 50 — train pool identical).
    data_config = sim_config.DataConfig(n_sample=1100)
    dg = dataloader.DataGeneratorRoche(
        data_config.n_sample, 40, data_config.t_max, data_config.step_size,
        sim_config.RochConfig(kel=1), 0.2, 10, 8, data_config.sparsity,
        p_remove=data_config.p_remove, output_sparsity=1 - 0.375, device=device,
        val_size=50, test_size=50,
    )
    t_gen0 = time.time()
    dg.generate_data()
    dg.split_sample()
    gen_seconds = time.time() - t_gen0

    # hybrid LHM construction, verbatim reference run_simulation.py:96-131.
    encoder = model.EncoderLSTM(40 + 1, int(40 * 2.0), 8, device=device, normalize=True)
    decoder = model.RocheExpertDecoder(40, 8, 1, data_config.t_max, data_config.step_size,
                                       roche=True, method="dopri5", device=device)
    vi = model.VariationalInference(encoder, decoder,
                                    prior_log_pdf=model.ExponentialPrior.log_density, elbo=True)
    params = (
        list(vi.encoder.parameters())
        + list(vi.decoder.output_function.parameters())
        + list(vi.decoder.ode.ml_net.parameters())
    )
    optimizer = optim.Adam(params, lr=0.01)

    # warmup iteration
    data = dg.get_mini_batch("train", args.batch)
    optimizer.zero_grad()
    loss = vi.loss(data)
    loss.backward()
    optimizer.step()

    t0 = time.time()
    for _ in range(args.iters):
        data = dg.get_mini_batch("train", args.batch)
        optimizer.zero_grad()
        loss = vi.loss(data)
        loss.backward()
        optimizer.step()
    epoch_seconds = time.time() - t0

    out = {
        "epoch_seconds": epoch_seconds,
        "iters": args.iters,
        "batch": args.batch,
        "datagen_seconds": round(gen_seconds, 2),
        "final_loss": float(loss),
        "note": "ACTUAL reference code (model.py/dataloader.py) on CPU, dim-8 hybrid LHM, "
                "dopri5 rtol=1e-7 atol=1e-8 via torchdiffeq-API shim, backprop through solver",
    }
    path = args.out
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
