"""Seasonal decomposition + Savitzky-Golay smoothing (numpy kernels)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from data_pipeline_framework_spark.operators.timeseries import (
    seasonal_decompose,
    smooth,
)


def _series(spark, n=56, period=7, amp=10.0, slope=0.5, groups=("a",)):
    rows = []
    for g in groups:
        for i in range(n):
            seasonal = amp * math.sin(2 * math.pi * (i % period) / period)
            rows.append(
                (g, dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
                 100.0 + slope * i + seasonal)
            )
    return spark.createDataFrame(rows, ["key", "ts", "v"])


def test_seasonal_decompose_additive(spark):
    df = _series(spark, groups=("a", "b"))
    out = seasonal_decompose(df, "ts", "v", period=7, group_by=["key"])
    pdf = out.filter("key = 'a'").orderBy("ts").toPandas()
    assert {"v_trend", "v_seasonal", "v_residual"} <= set(pdf.columns)
    # edges have NaN trend (centered MA), interior does not
    assert pdf["v_trend"].isna().iloc[0] and pdf["v_trend"].isna().iloc[-1]
    mid = pdf.iloc[10]
    # trend of a linear+sinusoid series: MA over a full period kills the
    # sinusoid -> trend ~ linear component
    assert mid["v_trend"] == pytest.approx(100.0 + 0.5 * 10, abs=0.5)
    # seasonal repeats with the period and sums to ~0
    assert pdf["v_seasonal"].iloc[7] == pytest.approx(pdf["v_seasonal"].iloc[14])
    assert abs(pdf["v_seasonal"].iloc[:7].sum()) < 1e-6
    # reconstruction: trend + seasonal + residual == value (interior)
    interior = pdf.dropna()
    recon = interior["v_trend"] + interior["v_seasonal"] + interior["v_residual"]
    assert (recon - interior["v"]).abs().max() < 1e-9
    # residual is tiny for a perfectly seasonal series
    assert interior["v_residual"].abs().max() < 0.5


def test_seasonal_decompose_multiplicative(spark):
    rows = []
    for i in range(42):
        factor = 1.0 + 0.2 * math.sin(2 * math.pi * (i % 7) / 7)
        rows.append(
            (dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
             (50.0 + i) * factor)
        )
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = seasonal_decompose(df, "ts", "v", model="multiplicative", period=7)
    pdf = out.orderBy("ts").toPandas().dropna()
    # seasonal factors multiply to ~1 on average; reconstruction holds
    assert pdf["v_seasonal"].iloc[:7].mean() == pytest.approx(1.0, abs=0.01)
    recon = pdf["v_trend"] * pdf["v_seasonal"] * pdf["v_residual"]
    assert (recon - pdf["v"]).abs().max() < 1e-9

    with pytest.raises(ValueError, match="unknown model"):
        seasonal_decompose(df, "ts", "v", model="wat")


def test_savgol_smoothing(spark):
    # quadratic signal: a polyorder-2 savgol filter reproduces it EXACTLY
    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
         0.25 * i * i - 3.0 * i + 7.0)
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, ["ts", "v"])
    out = smooth(df, "v", method="savgol", window=7, ts_col="ts")
    pdf = out.orderBy("ts").toPandas()
    assert (pdf["v_smoothed"] - pdf["v"]).abs().max() < 1e-8


def test_savgol_denoises(spark):
    import random

    rng = random.Random(42)
    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
         float(i) + rng.uniform(-1, 1))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["ts", "v"])
    pdf = smooth(df, "v", method="savgol", window=11, ts_col="ts") \
        .orderBy("ts").toPandas()
    raw_err = (pdf["v"] - pdf.index.to_series().astype(float)).abs().mean()
    smooth_err = (pdf["v_smoothed"] - pdf.index.to_series().astype(float)).abs().mean()
    assert smooth_err < raw_err  # noise reduced
