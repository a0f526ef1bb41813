"""Explicit source schemas for the pandemic-analytics ETL.

The reference reads CSVs header-only with no inferSchema — every
column arrives string and is cast ad hoc (ref app/etl.py:59-67).
Explicit StructTypes are stricter and faster: no inference pass, and
type errors surface at read time instead of mid-pipeline. Columns the
pipeline never touches stay strings.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*names: str) -> list[T.StructField]:
    return [T.StructField(n, T.StringType(), True) for n in names]


# ref app/data/data_covid/WHO-COVID-19-global-data.csv (8 cols)
WHO_COVID_SCHEMA = T.StructType(
    [
        T.StructField("Date_reported", T.StringType(), True),  # cast to date in clean step
        T.StructField("Country_code", T.StringType(), True),
        T.StructField("Country", T.StringType(), True),
        T.StructField("WHO_region", T.StringType(), True),
        T.StructField("New_cases", T.IntegerType(), True),
        T.StructField("Cumulative_cases", T.LongType(), True),
        T.StructField("New_deaths", T.IntegerType(), True),
        T.StructField("Cumulative_deaths", T.LongType(), True),
    ]
)

# ref app/data/data_covid/vaccination-data.csv (16 cols; only the used subset typed)
VACCINATION_SCHEMA = T.StructType(
    _s("COUNTRY", "ISO3", "WHO_REGION", "DATA_SOURCE", "DATE_UPDATED")
    + [
        T.StructField("TOTAL_VACCINATIONS", T.DoubleType(), True),
        T.StructField("PERSONS_VACCINATED_1PLUS_DOSE", T.DoubleType(), True),
        T.StructField("TOTAL_VACCINATIONS_PER100", T.DoubleType(), True),
        T.StructField("PERSONS_VACCINATED_1PLUS_DOSE_PER100", T.DoubleType(), True),
        T.StructField("PERSONS_LAST_DOSE", T.DoubleType(), True),
        T.StructField("PERSONS_LAST_DOSE_PER100", T.DoubleType(), True),
    ]
    + _s("VACCINES_USED", "FIRST_VACCINE_DATE", "NUMBER_VACCINES_TYPES_USED")
    + [
        T.StructField("PERSONS_BOOSTER_ADD_DOSE", T.DoubleType(), True),
        T.StructField("PERSONS_BOOSTER_ADD_DOSE_PER100", T.DoubleType(), True),
    ]
)

# ref app/data/data_covid/vaccination-metadata.csv
VACCINATION_METADATA_SCHEMA = T.StructType(
    _s(
        "ISO3",
        "PRODUCT_NAME",
        "VACCINE_NAME",
        "COMPANY_NAME",
        "AUTHORIZATION_DATE",
        "START_DATE",
        "END_DATE",
        "COMMENT",
        "DATA_SOURCE",
    )
)

# ref app/data/worldometer_coronavirus_summary_data.csv — the
# `population` source the reference joins but never ingests
# (SURVEY §2.10, ref app/routes/data.py:344-349)
WORLDOMETER_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), True),
        T.StructField("continent", T.StringType(), True),
        T.StructField("total_confirmed", T.LongType(), True),
        T.StructField("total_deaths", T.DoubleType(), True),
        T.StructField("total_recovered", T.DoubleType(), True),
        T.StructField("active_cases", T.DoubleType(), True),
        T.StructField("serious_or_critical", T.DoubleType(), True),
        T.StructField("total_cases_per_1m_population", T.DoubleType(), True),
        T.StructField("total_deaths_per_1m_population", T.DoubleType(), True),
        T.StructField("total_tests", T.DoubleType(), True),
        T.StructField("total_tests_per_1m_population", T.DoubleType(), True),
        T.StructField("population", T.LongType(), True),
    ]
)

# owid-covid-data.csv subset (ref app/routes/predict_france_with_model.py:25)
OWID_SCHEMA = T.StructType(
    [
        T.StructField("location", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("new_cases", T.DoubleType(), True),
        T.StructField("new_tests", T.DoubleType(), True),
        T.StructField("people_vaccinated", T.DoubleType(), True),
    ]
)
