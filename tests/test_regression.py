"""Semantics tests for the one-pass quality-regressor fit and the
crawl-revisit snapshot resolution (oracle parity is covered for both by
test_oracle_parity.py; these pin the algebra/semantics independently)."""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from oracle_utils import duck_con  # noqa: E402

from cpp_paddle_ocr_spark.operators.regression import (  # noqa: E402
    LABEL_SCALE,
    QUALITY_FIT_SQL,
    _sql_common,
    quality_fit,
    quality_fit_predict,
)
from cpp_paddle_ocr_spark.operators.relational import revisit_latest  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_cramer_matches_numpy_lstsq():
    """The generated Cramer expressions solve the same normal equations
    numpy does — checked on the real observation frame (DuckDB only; the
    algebra is engine-independent)."""
    con = duck_con(SF)
    obs = con.execute(
        f"WITH {_sql_common()} SELECT x1, x2, y FROM obs"
    ).fetchdf()
    fit = con.execute(QUALITY_FIT_SQL).fetchdf().iloc[0]
    X = np.column_stack(
        [np.ones(len(obs)), obs.x1.to_numpy(), obs.x2.to_numpy()]
    ).astype(np.float64)
    yv = obs.y.to_numpy().astype(np.float64)
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    beta_bits = beta / LABEL_SCALE
    assert abs(fit.intercept - beta_bits[0]) < 1e-5
    assert abs(fit.coef_ntok - beta_bits[1]) < 1e-5
    assert abs(fit.coef_nstop - beta_bits[2]) < 1e-5
    assert 0.0 <= fit.r2 <= 1.0
    con.close()


def test_fit_predict_residuals_center(spark):
    """OLS with an intercept has exactly-zero residual sum (up to the 6-dp
    output rounding), and predict covers every labeled doc."""
    df = spark.read.parquet(f"{SF}/documents.parquet")
    pred = quality_fit_predict(df).toPandas()
    n = quality_fit(df).toPandas().iloc[0]["n"]
    assert len(pred) == n
    assert abs(pred.resid.mean()) < 1e-3
    # teacher = pred + resid by construction (6-dp rounding slack)
    err = (pred.teacher_bits - pred.pred_bits - pred.resid).abs().max()
    assert err < 2e-6


def test_revisit_semantics(spark):
    """Hand-built fetch log: latest snapshot, fetch count, and
    change count (content churn vs refetch-identical) come out exactly."""
    import datetime as dt

    rows = [
        # url A (user 1, click): 3 fetches, content changes once
        (1, 1, dt.datetime(2024, 1, 1, 0, 0, 0), "click", 1.0, "v1"),
        (2, 1, dt.datetime(2024, 1, 2, 0, 0, 0), "click", 1.0, "v1"),
        (3, 1, dt.datetime(2024, 1, 3, 0, 0, 0), "click", 1.0, "v2"),
        # url B (user 2, view): 1 fetch
        (4, 2, dt.datetime(2024, 1, 1, 0, 0, 0), "view", 1.0, "x"),
        # url C: ts tie broken by event_id (6 is latest)
        (5, 3, dt.datetime(2024, 1, 5, 0, 0, 0), "view", 1.0, "a"),
        (6, 3, dt.datetime(2024, 1, 5, 0, 0, 0), "view", 1.0, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double, props string"
    )
    out = {r["url_key"]: r for r in revisit_latest(df).collect()}
    a = out["1:click"]
    assert (a["last_event_id"], a["n_fetches"], a["n_changes"]) == (3, 3, 1)
    b = out["2:view"]
    assert (b["last_event_id"], b["n_fetches"], b["n_changes"]) == (4, 1, 0)
    c = out["3:view"]
    assert (c["last_event_id"], c["n_fetches"], c["n_changes"]) == (6, 2, 1)
