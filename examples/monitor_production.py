"""Production monitoring report over the event stream — one run, one
page of numbers, every figure bit-deterministic.

The monitoring surface a data/ML platform reports daily, composed from
the engine's statistics operators:

  1. drift     — PSI of the value distribution, first vs second half
                 (feature_drift_psi's operator shape)
  2. trend     — per-series OLS slope of daily volume (daily_trend_ols)
  3. forecast  — seasonal-naive WAPE backtest: is last week still a
                 good predictor? (forecast_backtest_wape)
  4. rates     — per-type conversion proportions with Wilson 95%
                 intervals (conversion_wilson_ci)
  5. structure — chi-square independence of type × value-band
                 (chi2_independence)

Run:

    python examples/monitor_production.py \
        [--input /root/testdata/sf0.01/events.parquet]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01/events.parquet")
    args = ap.parse_args()

    from ffi_etl_spark.queries import QUERIES
    from ffi_etl_spark.session import get_session

    spark = get_session("monitor-production")
    sf_dir = os.path.dirname(args.input)

    print("== feature drift (PSI, first vs second time half) ==")
    QUERIES["feature_drift_psi"](spark, sf_dir).show(truncate=False)

    print("== daily volume trend (OLS slope per event type) ==")
    QUERIES["daily_trend_ols"](spark, sf_dir).orderBy("event_type").show(
        truncate=False
    )

    print("== seasonal-naive backtest (WAPE per event type) ==")
    QUERIES["forecast_backtest_wape"](spark, sf_dir).orderBy("event_type").show(
        truncate=False
    )

    print("== conversion rates with Wilson 95% intervals ==")
    QUERIES["conversion_wilson_ci"](spark, sf_dir).orderBy("event_type").show(
        truncate=False
    )

    print("== type x value-band independence (chi-square) ==")
    QUERIES["chi2_independence"](spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
