"""Materialized-view registry + refresh (SURVEY §2.6 A1-A5, §2.9 M3).

The 17 summary tables of the reference (schema/materialized_views.sql,
schema/row_count_views.sql; registry src/refresh_views.py:24-34),
re-expressed as DataFrame aggregations. `refresh` recomputes and
atomically overwrites the summary table — the Spark analog of
`REFRESH MATERIALIZED VIEW CONCURRENTLY` (readers of the old files are
unaffected until the swap).

Month is emitted as a 'yyyy-MM-01' string: the reference's
DATE_TRUNC-timestamp formatted per its TO_CHAR export convention,
portable across engines and timezones.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _month(ts_ms: str = "timestamp_ms"):
    return F.date_format(F.timestamp_millis(F.col(ts_ms)), "yyyy-MM-01").alias("month")


def _mwh_from_mw() -> F.Column:
    # F14 energy conversion (reference schema/materialized_views.sql:27;
    # docs/DATA_UNITS.md:37-49).
    return F.sum(
        F.col("generation_mw") * F.coalesce(F.col("resolution_minutes"), F.lit(60)) / 60.0
    ).alias("generation_mwh")


def _sum_mwh() -> F.Column:
    return F.sum("generation_mwh").alias("generation_mwh")


def _monthly(df: DataFrame, *dims: str, measure: F.Column) -> DataFrame:
    return df.groupBy(_month(), *dims).agg(measure).orderBy("month", *dims)


def _row_counts(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(_month())
        .agg(F.count(F.lit(1)).alias("row_count"))
        .orderBy("month")
    )


# view name → (source table, builder)
VIEW_BUILDERS: dict[str, tuple[str, Callable[[DataFrame], DataFrame]]] = {
    # ENTSOE (reference schema/materialized_views.sql:23-48)
    "mv_entsoe_monthly": (
        "entsoe_generation_data",
        lambda df: _monthly(df, "fuel_type", measure=_mwh_from_mw()),
    ),
    "mv_entsoe_plant_monthly": (
        "entsoe_generation_data",
        lambda df: _monthly(
            df, "plant_name", "country_code", "fuel_type", measure=_mwh_from_mw()
        ),
    ),
    # ONS (:55-80)
    "mv_ons_monthly": (
        "ons_generation_data",
        lambda df: _monthly(df, "fuel_type", measure=_sum_mwh()),
    ),
    "mv_ons_plant_monthly": (
        "ons_generation_data",
        lambda df: _monthly(
            df, "plant", "state", "state_name", "fuel_type", measure=_sum_mwh()
        ),
    ),
    # NPP (:88-109)
    "mv_npp_monthly": (
        "npp_generation",
        lambda df: _monthly(df, measure=_sum_mwh()),
    ),
    "mv_npp_plant_monthly": (
        "npp_generation",
        lambda df: _monthly(df, "plant", measure=_sum_mwh()),
    ),
    # OCCTO (:117-141)
    "mv_occto_monthly": (
        "occto_generation_data",
        lambda df: _monthly(df, "fuel_type", measure=_sum_mwh()),
    ),
    "mv_occto_plant_monthly": (
        "occto_generation_data",
        lambda df: _monthly(df, "plant", "area_name", "fuel_type", measure=_sum_mwh()),
    ),
    # CHILE (:149-176)
    "mv_chile_monthly": (
        "chile_generation_data",
        lambda df: _monthly(df, "fuel_type", measure=_sum_mwh()),
    ),
    "mv_chile_plant_monthly": (
        "chile_generation_data",
        lambda df: _monthly(
            df, "plant", "region", "comuna", "fuel_type", measure=_sum_mwh()
        ),
    ),
    # Row-count views ×7 (schema/row_count_views.sql:17-100)
    "mv_eia_row_counts": ("eia_generation_data", _row_counts),
    "mv_entsoe_row_counts": ("entsoe_generation_data", _row_counts),
    "mv_ons_row_counts": ("ons_generation_data", _row_counts),
    "mv_npp_row_counts": ("npp_generation", _row_counts),
    "mv_oe_row_counts": ("oe_generation_data", _row_counts),
    "mv_occto_row_counts": ("occto_generation_data", _row_counts),
    "mv_chile_row_counts": ("chile_generation_data", _row_counts),
}

# source → views to refresh after a load (reference src/refresh_views.py:24-34).
SOURCE_VIEWS: dict[str, list[str]] = {
    "eia": ["mv_eia_row_counts"],
    "entsoe": ["mv_entsoe_monthly", "mv_entsoe_plant_monthly", "mv_entsoe_row_counts"],
    "ons": ["mv_ons_monthly", "mv_ons_plant_monthly", "mv_ons_row_counts"],
    "npp": ["mv_npp_monthly", "mv_npp_plant_monthly", "mv_npp_row_counts"],
    "oe": ["mv_oe_row_counts"],
    "occto": ["mv_occto_monthly", "mv_occto_plant_monthly", "mv_occto_row_counts"],
    "chile": ["mv_chile_monthly", "mv_chile_plant_monthly", "mv_chile_row_counts"],
}

ALL_VIEWS = [v for views in SOURCE_VIEWS.values() for v in views]
