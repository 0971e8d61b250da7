"""Black-Scholes Greeks as pure Catalyst column expressions.

Reference: ``/root/reference/src/gapless_deribit_clickhouse/features/
greeks.py:43-170`` — py_vollib_vectorized (numba) computes delta/gamma/
vega/theta client-side, then a premium-adjusted delta for inverse
options (bs_delta − price/spot, Alexander et al. 2021,
arXiv:2107.12041), with vega/100 and theta/365.25 scaling and a
validity mask (T>0 & iv>0 & spot>0 & strike>0 -> else NaN).

Spark-first: the closed forms stay INSIDE whole-stage codegen — no UDF,
no Arrow crossing, no Python at all. The normal CDF uses the
Abramowitz–Stegun 26.2.17 rational approximation (|err| < 7.5e-8),
written as ONE SQL expression template shared verbatim with the DuckDB
oracle, so both engines evaluate the identical IEEE-754 formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INV_SQRT_2PI = "0.3989422804014327"  # 1/sqrt(2*pi)

# φ(x): standard normal PDF.
NORM_PDF_SQL = f"({INV_SQRT_2PI} * exp(-(({{x}}) * ({{x}})) / 2.0))"

# N(x): Abramowitz-Stegun 26.2.17, Horner form; identical text is
# executable by Spark SQL and DuckDB.
NORM_CDF_SQL = (
    "(CASE WHEN ({x}) >= 0 THEN "
    "1.0 - " + NORM_PDF_SQL.format(x="{x}") + " * "
    "((((( 1.330274429 * (1.0/(1.0+0.2316419*({x}))) - 1.821255978) * (1.0/(1.0+0.2316419*({x}))) "
    "+ 1.781477937) * (1.0/(1.0+0.2316419*({x}))) - 0.356563782) * (1.0/(1.0+0.2316419*({x}))) "
    "+ 0.319381530) * (1.0/(1.0+0.2316419*({x}))))"
    " ELSE "
    "1.0 - (CASE WHEN (-({x})) >= 0 THEN "
    "1.0 - " + NORM_PDF_SQL.format(x="(-({x}))") + " * "
    "((((( 1.330274429 * (1.0/(1.0+0.2316419*(-({x})))) - 1.821255978) * (1.0/(1.0+0.2316419*(-({x})))) "
    "+ 1.781477937) * (1.0/(1.0+0.2316419*(-({x})))) - 0.356563782) * (1.0/(1.0+0.2316419*(-({x})))) "
    "+ 0.319381530) * (1.0/(1.0+0.2316419*(-({x})))))"
    " ELSE NULL END) END)"
)


def norm_cdf_sql(x: str) -> str:
    return NORM_CDF_SQL.replace("{x}", f"({x})")


def norm_pdf_sql(x: str) -> str:
    return NORM_PDF_SQL.replace("{x}", f"({x})")


def greeks_sql_exprs(
    spot: str = "spot_price",
    strike: str = "strike",
    t_years: str = "t_years",
    iv: str = "iv",
    price: str = "price",
    option_type: str = "option_type",
    rate: float = 0.0,
) -> dict[str, str]:
    """SQL expression per greek, parameterized by input column names.

    ``t_years`` must already be the year fraction (seconds/31557600).
    All outputs are NULL when the validity mask fails (reference
    greeks.py:121-126).
    """
    r = repr(float(rate))
    mask = f"({t_years} > 0 AND {iv} > 0 AND {spot} > 0 AND {strike} > 0)"
    sqrt_t = f"sqrt({t_years})"
    d1 = (
        f"((ln({spot} / {strike}) + ({r} + ({iv} * {iv}) / 2.0) * {t_years})"
        f" / ({iv} * {sqrt_t}))"
    )
    d2 = f"({d1} - {iv} * {sqrt_t})"
    n_d1 = norm_cdf_sql(d1)
    n_d2 = norm_cdf_sql(d2)
    n_md2 = norm_cdf_sql(f"-{d2}")
    pdf_d1 = norm_pdf_sql(d1)
    is_call = f"(lower({option_type}) IN ('c', 'call'))"
    disc = f"exp(-({r}) * {t_years})"

    delta = f"(CASE WHEN {is_call} THEN {n_d1} ELSE {n_d1} - 1.0 END)"
    gamma = f"({pdf_d1} / ({spot} * {iv} * {sqrt_t}))"
    vega = f"({spot} * {pdf_d1} * {sqrt_t} / 100.0)"
    theta_core = f"(-({spot} * {pdf_d1} * {iv}) / (2.0 * {sqrt_t}))"
    theta = (
        f"((CASE WHEN {is_call} THEN {theta_core} - {r} * {strike} * {disc} * {n_d2}"
        f" ELSE {theta_core} + {r} * {strike} * {disc} * {n_md2} END) / 365.25)"
    )
    # inverse-option premium adjustment (reference greeks.py:159-165)
    adjusted_delta = f"({delta} - {price} / {spot})"

    def guard(expr: str) -> str:
        return f"(CASE WHEN {mask} THEN {expr} ELSE NULL END)"

    return {
        "delta": guard(delta),
        "gamma": guard(gamma),
        "vega": guard(vega),
        "theta": guard(theta),
        "adjusted_delta": guard(adjusted_delta),
    }


def with_greeks(
    df: DataFrame,
    spot_col: str = "spot_price",
    strike_col: str = "strike",
    ts_col: str = "timestamp",
    expiry_col: str = "expiry",
    iv_col: str = "iv",
    price_col: str = "price",
    option_type_col: str = "option_type",
    rate: float = 0.0,
    year_seconds: float = 365.25 * 24 * 3600.0,
) -> DataFrame:
    """Append delta/gamma/vega/theta/adjusted_delta columns — all
    whole-stage-codegen, no Python in the hot path."""
    t_years = (
        F.col(expiry_col).cast("timestamp").cast("double") - F.col(ts_col).cast("double")
    ) / year_seconds
    tmp = df.withColumn("__t_years", t_years)
    exprs = greeks_sql_exprs(
        spot=spot_col,
        strike=strike_col,
        t_years="__t_years",
        iv=iv_col,
        price=price_col,
        option_type=option_type_col,
        rate=rate,
    )
    for name, sql in exprs.items():
        tmp = tmp.withColumn(name, F.expr(sql))
    return tmp.withColumnRenamed("__t_years", "t_years")


def portfolio_greeks(
    df_with_greeks: DataFrame,
    amount_col: str = "amount",
    spot_col: str = "spot_price",
    approx_median: bool = False,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Position-weighted portfolio Greeks + dollar Greeks via median
    spot (reference greeks.py:173-238, np.median). Exact interpolated
    percentile by default (matches the reference); set
    ``approx_median=True`` at 100 TB — the exact percentile needs a
    per-group sort, percentile_approx is a single-pass sketch."""
    amt = F.col(amount_col)
    median = (
        F.percentile_approx(F.col(spot_col), 0.5)
        if approx_median
        else F.percentile(F.col(spot_col), F.lit(0.5))
    )
    grouped = df_with_greeks.groupBy(*group_cols) if group_cols else df_with_greeks
    return grouped.agg(
        F.sum(F.col("adjusted_delta") * amt).alias("portfolio_delta"),
        F.sum(F.col("gamma") * amt).alias("portfolio_gamma"),
        F.sum(F.col("vega") * amt).alias("portfolio_vega"),
        F.sum(F.col("theta") * amt).alias("portfolio_theta"),
        median.alias("median_spot"),
    )


def greeks_by_bucket(df_with_greeks: DataFrame, bucket_col: str) -> DataFrame:
    """Per-bucket greek stats (reference greeks.py:241-264)."""
    aggs = []
    for g in ("delta", "gamma", "vega", "theta", "adjusted_delta"):
        aggs += [
            F.avg(g).alias(f"{g}_mean"),
            F.stddev_pop(g).alias(f"{g}_std"),
            F.count(g).alias(f"{g}_count"),
        ]
    return df_with_greeks.groupBy(bucket_col).agg(*aggs)
