"""Explicit schemas for every table the engine touches.

The reference's only schema system is fixed StructTypes plus
pandas-side coercion (``spark_data_processor.py:396-410``). Here the
StructTypes are authoritative and applied at read time — no pandas
staging, no schema inference on the hot path. ``year`` enters the TB
schema as *string* on purpose: the raw feeds carry junk years and the
cleaning layer casts with null-tolerance (see
``operators/cleaning.py``), mirroring the reference's
string-then-cast contract (``spark_data_processor.py:454-457``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-shaped TB tables (golden-parity family) -----------------

# ref: spark_data_processor.py:396-403
TB_RAW_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), True),
        T.StructField("iso3", T.StringType(), True),
        T.StructField("g_whoregion", T.StringType(), True),
        T.StructField("indicator", T.StringType(), True),
        T.StructField("year", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# ref: spark_data_processor.py:405-410 (population pre-coerced to int64
# on the pandas side at :354; we read it as double and round-cast in
# the cleaning layer instead, keeping ingestion single-pass)
POPULATION_RAW_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), True),
        T.StructField("iso3", T.StringType(), True),
        T.StructField("year", T.StringType(), True),
        T.StructField("population", T.DoubleType(), True),
    ]
)

# Whitelist of valid TB indicators — ref: spark_data_processor.py:472-475
VALID_INDICATORS = [
    "e_inc_num",
    "c_newinc",
    "e_mort_num",
    "e_prev_num",
    "e_inc_100k",
    "e_mort_100k",
    "e_prev_100k",
    "c_newinc_100k",
]

# indicator -> business-name mapping — ref: spark_data_processor.py:530-535
INDICATOR_RENAMES = {
    "e_inc_num": "total_cases",
    "c_newinc": "new_cases",
    "e_mort_num": "deaths",
    "e_prev_num": "prevalence",
}

REQUIRED_MEASURES = ["total_cases", "new_cases", "deaths", "prevalence"]

# ISO3 -> [lat, lon] serving dimension — ref: flask_api_server.py:306-317
# (hardcoded dict in the reference's serving layer; here a proper
# broadcast-join dimension table)
COUNTRY_COORDS = {
    "KHM": ("Cambodia", 12.5657, 104.9910),
    "IDN": ("Indonesia", -0.7893, 113.9213),
    "LAO": ("Laos", 19.8563, 102.4955),
    "MYS": ("Malaysia", 4.2105, 101.9758),
    "MMR": ("Myanmar", 21.9162, 95.9560),
    "PHL": ("Philippines", 12.8797, 121.7740),
    "SGP": ("Singapore", 1.3521, 103.8198),
    "THA": ("Thailand", 15.8700, 100.9925),
    "VNM": ("Vietnam", 14.0583, 108.2772),
    "TLS": ("Timor-Leste", -8.8742, 125.7275),
}

# --- driver testdata (TPC-H-ish) ---------------------------------------
# Parquet carries its own schema; these names are for documentation and
# CSV round-trip tests.

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
