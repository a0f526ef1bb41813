"""Serving queries: one named function per reference REST endpoint /
Grafana panel, executed by Spark SQL over the warehouse views
(``covid.register_views``). The SQL is kept as close to the
reference's text as ANSI allows; PG-isms are rewritten:

- ``EXTRACT(YEAR/WEEK FROM d)`` → ``year(d)`` / ``weekofyear(d)``
  (same ISO week semantics as PG; the reference's (year, week) join
  key is kept verbatim, including its Dec-29..Jan-3 edge behavior —
  SURVEY §7.4 trap 1);
- ``DISTINCT ON`` → row_number window (SURVEY W5);
- ``x::DECIMAL`` → CAST;
- dynamic identifiers are resolved against closed allowlists, never
  interpolated (the reference's worldmap/graph/tables routes are
  injectable — SURVEY §2.10).

Broken-by-design reference endpoints (columns that never existed) are
implemented per their documented intent and noted on the function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# P9 allowlist — replaces f-string interpolation in ref
# app/routes/worldmap.py:12-16 and graph.py:10-14.
WORLDMAP_METRICS = {
    "cases": ("weekly_statistics", "week_new_reported_cases"),
    "deaths": ("weekly_statistics", "week_new_reported_deaths"),
    "vaccinated": ("daily_vaccine_statistics", "new_reported_shots"),
}


def total_cases(spark: SparkSession) -> DataFrame:
    """GET /total_cases (ref app/routes/data.py:93-96)."""
    return spark.sql(
        "SELECT SUM(week_new_reported_cases) AS total_weekly_cases FROM weekly_statistics"
    )


def total_deaths(spark: SparkSession) -> DataFrame:
    """GET /total_deaths (ref app/routes/data.py:103-106)."""
    return spark.sql(
        "SELECT SUM(week_new_reported_deaths) AS total_weekly_deaths FROM weekly_statistics"
    )


def total_vaccines(spark: SparkSession) -> DataFrame:
    """GET /total_vaccines (ref app/routes/data.py:98-101)."""
    return spark.sql(
        "SELECT SUM(new_reported_shots) AS total_reported_shots FROM daily_vaccine_statistics"
    )


_WEEKLY_JOINED = """
WITH weekly_vaccinations AS (
    SELECT country_short_code,
           year(day_of_report) AS year,
           weekofyear(day_of_report) AS week,
           SUM(new_reported_shots) AS total_weekly_vaccinations
    FROM daily_vaccine_statistics
    GROUP BY country_short_code, year(day_of_report), weekofyear(day_of_report)
)
SELECT ws.date_of_report AS date,
       c.country_name AS country,
       ws.week_new_reported_cases AS confirmed_cases,
       ws.week_new_reported_deaths AS deaths,
       wv.total_weekly_vaccinations AS vaccinations
FROM weekly_statistics ws
LEFT JOIN country c ON ws.country_short_code = c.country_short_code
LEFT JOIN weekly_vaccinations wv
  ON ws.country_short_code = wv.country_short_code
 AND year(ws.date_of_report) = wv.year
 AND weekofyear(ws.date_of_report) = wv.week
"""


def weekly_statistics_total(
    spark: SparkSession, page: int = 1, limit: int = 100
) -> DataFrame:
    """GET /weekly_statistics_total — paginated weekly join
    (ref app/routes/data.py:108-148). Deterministic page windows via
    the reference's ORDER BY country, date (+ code tiebreak)."""
    offset = (page - 1) * limit
    return spark.sql(
        _WEEKLY_JOINED
        + f"ORDER BY c.country_name, ws.date_of_report, ws.country_short_code "
        f"LIMIT {int(limit)} OFFSET {int(offset)}"
    )


def weekly_statistics_pagination(spark: SparkSession, limit: int = 100) -> DataFrame:
    """Pagination envelope (ref app/routes/data.py:114-121,172-178)."""
    return spark.sql(
        f"""
        SELECT COUNT(*) AS total_rows,
               CAST(CEIL(COUNT(*) / {float(limit)}) AS BIGINT) AS total_pages
        FROM weekly_statistics
        """
    )


def weekly_statistics_by_country(spark: SparkSession, country_code: str) -> DataFrame:
    """GET /weekly_statistics_by_country (ref app/routes/data.py:180-213).
    The parameter is bound through Spark's named-parameter API
    (:country_code), exactly like the reference's SQLAlchemy binding —
    never interpolated."""
    return spark.sql(
        _WEEKLY_JOINED + "WHERE ws.country_short_code = :country_code ORDER BY ws.date_of_report",
        args={"country_code": country_code},
    )


def covid_cases_evolution(spark: SparkSession) -> DataFrame:
    """GET /covid_cases_evolution (ref app/routes/data.py:216-235) —
    the disease join is a pure existence filter (semi-join, J5)."""
    return spark.sql(
        """
        SELECT ws.date_of_report AS date,
               SUM(ws.week_new_reported_cases) AS total_cases
        FROM weekly_statistics ws
        LEFT SEMI JOIN disease d ON ws.disease_id = d.id AND d.name = 'COVID-19'
        GROUP BY ws.date_of_report
        ORDER BY ws.date_of_report
        """
    )


def vaccinations_evolution(spark: SparkSession) -> DataFrame:
    """GET /vaccinations_evolution (ref app/routes/data.py:237-252)."""
    return spark.sql(
        """
        SELECT day_of_report AS date,
               SUM(new_reported_shots) AS total_daily_vaccinations
        FROM daily_vaccine_statistics
        GROUP BY day_of_report
        ORDER BY day_of_report
        """
    )


def top5_deaths(spark: SparkSession) -> DataFrame:
    """GET /top5_summary, deaths half (ref app/routes/data.py:270-286).
    Country-name tiebreak makes the LIMIT deterministic."""
    return spark.sql(
        """
        SELECT c.country_name, SUM(ws.week_new_reported_deaths) AS total_deaths
        FROM weekly_statistics ws
        JOIN country c ON ws.country_short_code = c.country_short_code
        GROUP BY c.country_name
        ORDER BY total_deaths DESC, c.country_name
        LIMIT 5
        """
    )


def top5_cases(spark: SparkSession) -> DataFrame:
    """GET /top5_summary, cases half (ref app/routes/data.py:288-300)."""
    return spark.sql(
        """
        SELECT c.country_name, SUM(ws.week_new_reported_cases) AS total_cases
        FROM weekly_statistics ws
        JOIN country c ON ws.country_short_code = c.country_short_code
        GROUP BY c.country_name
        ORDER BY total_cases DESC, c.country_name
        LIMIT 5
        """
    )


def country_covid_rates(spark: SparkSession) -> DataFrame:
    """GET /country_covid_rates (ref app/routes/data.py:330-366).

    Intent fix (SURVEY §2.10): the reference joins a `population`
    table no ETL ever creates; the worldometer CSV is ingested as that
    table (keyed by name — it carries no year, so the reference's
    DISTINCT-ON-latest-year collapses to the single row)."""
    return spark.sql(
        """
        WITH total_stats AS (
            SELECT ws.country_short_code,
                   SUM(ws.week_new_reported_cases) AS total_cases,
                   SUM(ws.week_new_reported_deaths) AS total_deaths
            FROM weekly_statistics ws
            LEFT SEMI JOIN disease d ON ws.disease_id = d.id AND d.name = 'COVID-19'
            GROUP BY ws.country_short_code
        )
        SELECT ts.country_short_code AS country_code,
               c.country_name,
               ts.total_cases,
               ts.total_deaths,
               p.population,
               ROUND(CAST(ts.total_cases AS DECIMAL(18,4)) / p.population * 100, 2)
                   AS case_rate_percent,
               ROUND(CAST(ts.total_deaths AS DECIMAL(18,4)) / p.population * 100, 4)
                   AS death_rate_percent
        FROM total_stats ts
        JOIN country c ON ts.country_short_code = c.country_short_code
        JOIN population p ON lower(trim(c.country_name)) = lower(trim(p.country))
        WHERE p.population > 0
        ORDER BY case_rate_percent DESC, country_code
        """
    )


def worldmap(spark: SparkSession, metric: str = "cases") -> DataFrame:
    """GET /worldmap (ref app/routes/worldmap.py:24-36).

    The reference sums columns that don't exist; documented intent
    (SURVEY §2.10) is per-country totals of the chosen metric. The
    metric name resolves through WORLDMAP_METRICS — never
    interpolated from user input."""
    table, column = WORLDMAP_METRICS[metric]
    code_col = "country_short_code"
    return spark.sql(
        f"""
        SELECT c.country_name AS country, SUM(t.{column}) AS value
        FROM {table} t
        JOIN country c ON t.{code_col} = c.country_short_code
        GROUP BY c.country_name
        """
    )


# --- Grafana panels (ref app/grafana/Dashboard.json) ---------------------


def grafana_yearly_cases_delta(spark: SparkSession) -> DataFrame:
    """Panel 'global yearly evolution' (ref Dashboard.json:448): CTE
    rollup + LAG over Year_ts + COALESCE'd delta + NULLIF-guarded
    growth ratio."""
    return spark.sql(
        """
        WITH yearly AS (
            SELECT Year, Year_ts, total_new_cases, total_new_deaths
            FROM covid_global_yearly_summary
        )
        SELECT Year, Year_ts, total_new_cases,
               COALESCE(total_new_cases - LAG(total_new_cases) OVER (ORDER BY Year_ts), 0)
                   AS cases_delta,
               CAST(total_new_deaths AS DOUBLE)
                   / NULLIF(CAST(total_new_cases AS DOUBLE), 0.0) * 100 AS cfr_percent
        FROM yearly
        ORDER BY Year_ts
        """
    )


def grafana_region_yearly_delta(spark: SparkSession) -> DataFrame:
    """Panels at ref Dashboard.json:559,885: per-region yearly deltas
    via LAG partitioned by region."""
    return spark.sql(
        """
        SELECT WHO_region, Year, Year_ts, total_cases,
               COALESCE(total_cases - LAG(total_cases)
                        OVER (PARTITION BY WHO_region ORDER BY Year_ts), 0) AS cases_delta
        FROM covid_region_yearly_summary
        ORDER BY WHO_region, Year_ts
        """
    )


def grafana_latest_year_region_summary(spark: SparkSession) -> DataFrame:
    """Panel at ref Dashboard.json:240/339: rows of the latest year
    (uncorrelated MAX scalar subquery), LIMIT 50."""
    return spark.sql(
        """
        SELECT WHO_region, Year, total_cases, total_deaths
        FROM covid_region_yearly_summary
        WHERE Year = (SELECT MAX(Year) FROM covid_region_yearly_summary)
        ORDER BY total_cases DESC, WHO_region
        LIMIT 50
        """
    )
