"""Figure generation from experiment outputs — replaces Fig{3,6,7,9}.ipynb.

The reference parses `results/*.txt` (4-line CSV tails per run, in a fixed
method order) and horizon pickles in notebooks; this script does the same in
one CLI: `python experiments/figures.py --which fig3|fig6|fig7|fig9|all`.
Outputs PNG + tidy CSV under results/.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

# Runnable as `python experiments/figures.py` from the repo root: the script
# dir is on sys.path but the package root is not.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "results")

# Method order of the 4-line blocks appended by fig3.sh / run_dim.sh /
# run_noise_level.sh (same convention as the reference's Fig3.sh).
SIM_METHODS = ["neural", "expert", "hybrid", "residual", "ensemble2"]
NOISE_METHODS = ["neural", "expert", "hybrid", "flow"]
METRICS = ["rmse_z0", "rmse_x", "cprs_z0", "cprs_x"]


def parse_blocks(path, methods, groups):
    """Parse a results txt of len(groups)*len(methods) 4-line blocks into a
    tidy DataFrame (group, method, metric, value, sd)."""
    rows = []
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    idx = 0
    for group in groups:
        for method in methods:
            for _ in range(4):
                if idx >= len(lines):
                    break
                metric, value, sd = lines[idx].split(",")
                rows.append(dict(group=group, method=method, metric=metric,
                                 value=float(value), sd=float(sd)))
                idx += 1
    return pd.DataFrame(rows)


def _bar_panel(df, metric, title, out_png):
    sub = df[df.metric == metric]
    groups = sub.group.unique()
    methods = sub.method.unique()
    width = 0.8 / len(methods)
    fig, ax = plt.subplots(figsize=(6, 4))
    for i, m in enumerate(methods):
        d = sub[sub.method == m]
        xs = np.arange(len(groups)) + i * width
        ax.bar(xs, d.value, width=width, yerr=d.sd, label=m, capsize=2)
    ax.set_xticks(np.arange(len(groups)) + 0.4 - width / 2)
    ax.set_xticklabels(groups)
    ax.set_ylabel(metric)
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    plt.close(fig)


def fig3():
    path = os.path.join(RESULTS, "results_sample.txt")
    df = parse_blocks(path, SIM_METHODS, ["310", "400", "800"])
    df.to_csv(os.path.join(RESULTS, "fig3_tidy.csv"), index=False)
    _bar_panel(df, "rmse_x", "Test RMSE vs sample size", os.path.join(RESULTS, "fig3_rmse.png"))
    _bar_panel(df, "cprs_x", "Test CRPS vs sample size", os.path.join(RESULTS, "fig3_crps.png"))
    print("fig3 done")


def fig_dim():
    path = os.path.join(RESULTS, "results_dim.txt")
    df = parse_blocks(path, SIM_METHODS, ["dim8", "dim12"])
    df.to_csv(os.path.join(RESULTS, "figdim_tidy.csv"), index=False)
    _bar_panel(df, "rmse_x", "Test RMSE vs latent dim", os.path.join(RESULTS, "figdim_rmse.png"))
    print("fig_dim done")


def fig_noise():
    path = os.path.join(RESULTS, "results_noise.txt")
    df = parse_blocks(path, NOISE_METHODS, ["0.4", "0.8"])
    df.to_csv(os.path.join(RESULTS, "fignoise_tidy.csv"), index=False)
    _bar_panel(df, "rmse_x", "Test RMSE vs noise level", os.path.join(RESULTS, "fignoise_rmse.png"))
    print("fig_noise done")


def fig_noise_elbo():
    """Ours (mean±seed-SD, ELBO selection rule) vs the reference's committed
    noise-table values (results_noise.txt:2-46), all six method rows."""
    from summarize_parity import REF_NOISE, parse

    cells = parse(os.path.join(RESULTS, "results_noise_elbo.txt"), "noise")
    methods = ["neural", "expert", "hybrid", "flow", "ensemble2", "residual"]
    fig, axes = plt.subplots(1, 2, figsize=(9, 3.6), sharey=True)
    ours_c, ref_c = "#2563eb", "#9ca3af"  # blue vs neutral gray (CVD-safe pair)
    for ax, noise in zip(axes, ["0.4", "0.8"]):
        xs = np.arange(len(methods))
        means, sds, refs = [], [], []
        for m in methods:
            vals = [v["rmse_x"][0] for v in cells.get((m, noise), {}).values() if "rmse_x" in v]
            means.append(np.mean(vals) if vals else np.nan)
            sds.append(np.std(vals) if len(vals) > 1 else 0.0)
            refs.append(REF_NOISE.get((m, noise), np.nan))
        ax.bar(xs - 0.2, means, 0.36, yerr=sds, capsize=2, color=ours_c, label="ours (3 seeds)")
        ax.bar(xs + 0.2, refs, 0.36, color=ref_c, label="reference (committed)")
        ax.set_title(f"noise = {noise}", fontsize=10)
        ax.set_xticks(xs)
        ax.set_xticklabels(methods, rotation=30, ha="right", fontsize=8)
        ax.grid(axis="y", alpha=0.25, linewidth=0.5)
        ax.set_axisbelow(True)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
    axes[0].set_ylabel("test rmse_x")
    axes[0].legend(fontsize=8, frameon=False)
    fig.suptitle("Noise sweep under the reference's ELBO selection rule", fontsize=11)
    fig.tight_layout()
    out = os.path.join(RESULTS, "fignoise_elbo.png")
    fig.savefig(out, dpi=150)
    print(f"fig_noise_elbo done -> {out}")


def _t0_variance_ratios(test_pickle, t0s=(5, 10, 12)):
    """Per-window variance normalizers, reference Fig6.ipynb cell 2 verbatim:
    f_{t0} = mean_b [ sum_{t,d} (x - mean)^2 m / sum_{t,d} m ] over x[t0:],
    with mean = x.sum()/m.sum() (the notebook's own quirk: the numerator sums
    masked entries too), reported as ratios to the t0=5 value."""
    from hybridode.data import SyntheticCohort

    dg = SyntheticCohort.load(test_pickle)
    x_all = np.asarray(dg.measurements)
    m_all = np.asarray(dg.masks)
    f = {}
    for t0 in t0s:
        x, m = x_all[t0:], m_all[t0:]
        mean = x.sum() / m.sum()
        f[t0] = float(np.mean(np.sum((x - mean) ** 2 * m, axis=(0, 2)) / np.sum(m, axis=(0, 2))))
    return {t0: f[t0] / f[t0s[0]] for t0 in t0s}


def fig6():
    path = os.path.join(RESULTS, "results_t0.txt")
    df = parse_blocks(path, ["neural", "expert", "hybrid"], ["10", "12"])

    # Variance-normalized RMSE (reference Fig6.ipynb divides each window's
    # rmse and its SE by that window's variance ratio vs t0=5).
    test_pickle = os.path.join(os.path.dirname(RESULTS), "data", "datafile_dose_exp_test.pkl")
    if os.path.exists(test_pickle):
        ratios = _t0_variance_ratios(test_pickle)
        norm = df.group.map(lambda g: ratios[int(g)]).astype(float)
        is_x = df.metric.isin(["rmse_x", "cprs_x"])
        df["value_norm"] = np.where(is_x, df.value / norm, df.value)
        df["sd_norm"] = np.where(is_x, df.sd / norm, df.sd)
    else:
        print("fig6: test pickle missing, skipping variance normalization")
        df["value_norm"] = df.value
        df["sd_norm"] = df.sd

    df.to_csv(os.path.join(RESULTS, "fig6_tidy.csv"), index=False)
    _bar_panel(df, "rmse_x", "Test RMSE vs observation window t0", os.path.join(RESULTS, "fig6_rmse.png"))

    ndf = df.drop(columns=["value", "sd"]).rename(columns={"value_norm": "value", "sd_norm": "sd"})
    _bar_panel(ndf, "rmse_x", "Variance-normalized test RMSE vs observation window t0",
               os.path.join(RESULTS, "fig6_rmse_norm.png"))
    print("fig6 done")


def fig7():
    fig, ax = plt.subplots(figsize=(6, 4))
    for method in ["neural", "expert", "hybrid", "ensemble", "residual"]:
        p = os.path.join(RESULTS, f"horizon_{method}.pkl")
        if not os.path.exists(p):
            continue
        with open(p, "rb") as f:
            d = pickle.load(f)
        xs = np.arange(len(d["rmse_x"]))
        ax.plot(xs, d["rmse_x"], label=method)
        ax.fill_between(xs, d["rmse_x"] - d["rmse_x_sd"], d["rmse_x"] + d["rmse_x_sd"], alpha=0.2)
    ax.set_xlabel("forecast horizon (steps past t0)")
    ax.set_ylabel("rmse_x")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(RESULTS, "fig7_horizon.png"), dpi=150)
    plt.close(fig)
    print("fig7 done")


def fig9():
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, label in [("exp_lhm.csv", "LHM"), ("exp_flow.csv", "LHM-NF")]:
        p = os.path.join(RESULTS, name)
        if not os.path.exists(p):
            continue
        df = pd.read_csv(p, names=["iter", "val", "train"])
        ax.plot(df["iter"], df["val"], label=f"{label} val")
    ax.set_xlabel("iteration")
    ax.set_ylabel("neg-ELBO (validation)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(RESULTS, "fig9_curves.png"), dpi=150)
    plt.close(fig)
    print("fig9 done")


def fig_headtohead():
    """Real-track head-to-head scatter: each point is one (method, sample,
    horizon) cell from results/real_headtohead/summary.csv; x = the ACTUAL
    reference code's rmse_x on the stand-in arrays, y = ours, same protocol.
    Points under the diagonal = ours better."""
    path = os.path.join(RESULTS, "real_headtohead", "summary.csv")
    df = pd.read_csv(path)
    fig, ax = plt.subplots(figsize=(4.6, 4.4))
    lo = min(df.ours_rmse.min(), df.ref_rmse.min()) * 0.97
    hi = max(df.ours_rmse.max(), df.ref_rmse.max()) * 1.03
    ax.plot([lo, hi], [lo, hi], color="#9ca3af", linewidth=1, zorder=1)
    ax.scatter(df.ref_rmse, df.ours_rmse, s=26, color="#2563eb", alpha=0.8,
               edgecolors="white", linewidths=0.8, zorder=2)
    # Direct-label only the systematic outlier (the 2nd-order model).
    for _, r in df[df.method == "2nd"].groupby("sample").head(1).iterrows():
        ax.annotate("2nd", (r.ref_rmse, r.ours_rmse), textcoords="offset points",
                    xytext=(5, -3), fontsize=8, color="#374151")
    ax.set_xlabel("reference code rmse_x (torch CPU, via shim)")
    ax.set_ylabel("ours rmse_x (TPU)")
    ax.set_title("Real-track head-to-head, identical protocol\n"
                 "(6 methods x {100,500} samples x 4 horizons)", fontsize=10)
    ax.grid(alpha=0.25, linewidth=0.5)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    fig.tight_layout()
    out = os.path.join(RESULTS, "fig_headtohead.png")
    fig.savefig(out, dpi=150)
    print(f"fig_headtohead done -> {out}")


ALL = {"fig3": fig3, "dim": fig_dim, "noise": fig_noise, "noise_elbo": fig_noise_elbo,
       "fig6": fig6, "fig7": fig7, "fig9": fig9, "headtohead": fig_headtohead}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--which", default="all", choices=["all"] + list(ALL))
    args = parser.parse_args()
    todo = ALL.values() if args.which == "all" else [ALL[args.which]]
    for fn in todo:
        try:
            fn()
        except FileNotFoundError as e:
            print(f"skip ({e})")


if __name__ == "__main__":
    main()
