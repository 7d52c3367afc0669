"""Real-data ETL: long-format clinical records -> DDW-style model arrays.

Re-design of the reference's private real-data pipeline
(reference real_data/data_utils.py + run_preprocess.py regime): filter the
cohort by length-of-stay, bucket irregular timestamps to the hourly grid with
median aggregation, z-score per feature over observed entries, pivot doses to
a (T, B, 1) treatment array, and median-impute + z-score the static
covariates. `run_etl` writes the four pickles `RealCohort` loads
(array_xt{type}.pkl / array_xt_mask{type}.pkl / array_at{type}.pkl /
array_x_constant.pkl — dataloader.py:383-396 contract).

Everything is vectorized pandas/numpy groupbys — no per-patient Python loop.
The true DDW extract is license-restricted; the pipeline is validated on
synthetic long-format records (tests/test_etl.py).
"""

from __future__ import annotations

import os
import pickle
from typing import Iterable, Sequence

import numpy as np
import pandas as pd


def filter_los_cohort(df: pd.DataFrame, min_los: float = 72, max_los: float = 744) -> pd.DataFrame:
    """Keep patients whose length of stay (max recorded hour, a proxy for the
    admission->discharge delta) lies in the half-open window
    [min_los, max_los). Defaults match the reference's 3 <= LOS < 31 days
    cohort rule (real_data/temporal_feat.py:16-19) expressed in hours."""
    los = df.groupby("patient_id")["hour"].max()
    keep = los[(los >= min_los) & (los < max_los)].index
    return df[df["patient_id"].isin(keep)].copy()


def _patient_index(df: pd.DataFrame, patients: Iterable) -> tuple[list, pd.Series]:
    patients = sorted(patients)
    pos = pd.Series(np.arange(len(patients)), index=patients)
    return patients, pos


def build_temporal_arrays(
    df: pd.DataFrame,
    features: Sequence[str],
    t_max: int,
    patients: Iterable | None = None,
    normalize: bool = True,
) -> tuple[np.ndarray, np.ndarray, list]:
    """(x, mask, patients): hourly-bucketed, median-aggregated features.

    x[t, p, f] is the median of feature f's values recorded by patient p in
    hour bucket t (floor(hour)); mask marks observed buckets; x is z-scored
    per feature over observed entries and zero where unobserved.
    """
    if patients is None:
        patients = df["patient_id"].unique()
    patients, pos = _patient_index(df, patients)
    n, k = len(patients), len(features)
    x = np.zeros((t_max, n, k), np.float32)
    mask = np.zeros((t_max, n, k), np.float32)

    d = df[df["patient_id"].isin(patients)].copy()
    d["bucket"] = np.floor(d["hour"]).astype(int)
    d = d[(d["bucket"] >= 0) & (d["bucket"] < t_max)]
    fpos = {f: j for j, f in enumerate(features)}
    d = d[d["feature"].isin(fpos)]
    agg = d.groupby(["bucket", "patient_id", "feature"])["value"].median()

    if len(agg):
        ti = agg.index.get_level_values("bucket").to_numpy()
        pi = pos[agg.index.get_level_values("patient_id")].to_numpy()
        fi = np.array([fpos[f] for f in agg.index.get_level_values("feature")], dtype=np.intp)
        x[ti, pi, fi] = agg.to_numpy(np.float32)
        mask[ti, pi, fi] = 1.0

    if normalize:
        for j in range(k):
            obs = mask[:, :, j] > 0
            if obs.any():
                v = x[:, :, j][obs]
                x[:, :, j][obs] = (v - v.mean()) / max(float(v.std()), 1e-8)
    x[mask == 0] = 0.0
    return x, mask, patients


def build_static_array(
    df: pd.DataFrame,
    covariates: Sequence[str],
    patients: Sequence,
    normalize: bool = True,
) -> np.ndarray:
    """(n_patients, n_covariates) statics: median-imputed, optionally z-scored."""
    d = df.set_index("patient_id").reindex(patients)
    s = d[list(covariates)].to_numpy(np.float64)
    med = np.nanmedian(s, axis=0)
    med = np.where(np.isfinite(med), med, 0.0)
    idx = np.where(np.isnan(s))
    s[idx] = np.take(med, idx[1])
    if normalize:
        s = (s - s.mean(0)) / np.maximum(s.std(0), 1e-8)
    return s.astype(np.float32)


def build_treatment_array(
    df: pd.DataFrame,
    t_max: int,
    patients: Sequence,
) -> np.ndarray:
    """(t_max, n_patients, 1) dose array: doses summed within each hour bucket."""
    patients, pos = _patient_index(df, patients)
    a = np.zeros((t_max, len(patients), 1), np.float32)
    d = df[df["patient_id"].isin(patients)].copy()
    if len(d):
        d["bucket"] = np.floor(d["hour"]).astype(int)
        d = d[(d["bucket"] >= 0) & (d["bucket"] < t_max)]
        agg = d.groupby(["bucket", "patient_id"])["dose"].sum()
        ti = agg.index.get_level_values("bucket").to_numpy()
        pi = pos[agg.index.get_level_values("patient_id")].to_numpy()
        a[ti, pi, 0] = agg.to_numpy(np.float32)
    return a


def run_etl(
    temporal: pd.DataFrame,
    static: pd.DataFrame,
    treatment: pd.DataFrame,
    features: Sequence[str],
    covariates: Sequence[str],
    t_max: int,
    out_dir: str,
    data_type: str = "5",
    min_los: float = 72,
    max_los: float = 744,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, list]:
    """Full pipeline: LOS filter -> arrays -> the four RealCohort pickles."""
    kept = filter_los_cohort(temporal, min_los=min_los, max_los=max_los)
    x, mask, patients = build_temporal_arrays(kept, features, t_max)
    s = build_static_array(static, covariates, patients)
    a = build_treatment_array(treatment, t_max, patients)

    os.makedirs(out_dir, exist_ok=True)
    out = {
        f"array_xt{data_type}.pkl": x,
        f"array_xt_mask{data_type}.pkl": mask,
        f"array_at{data_type}.pkl": a,
        "array_x_constant.pkl": s,
    }
    for name, arr in out.items():
        with open(os.path.join(out_dir, name), "wb") as f:
            pickle.dump(arr, f)
    return x, a, mask, s, patients
