"""Declared schemas: the reference's data model plus the driver star schema.

``users`` / ``watermarks`` mirror the reference DDL
(reference: ``seeds/001_schema.sql:2-17``, ``app/models.py:6-22``):
BIGSERIAL id, bounded strings, TIMESTAMPTZ (-> TimestampType under a UTC
session), soft-delete flag. All columns NOT NULL, schema declared (never
inferred) so plans are stable.
"""

from __future__ import annotations

from pyspark.sql import types as T

USERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("email", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
        T.StructField("is_deleted", T.BooleanType(), False),
    ]
)

# id SERIAL surrogate dropped: consumer_id is the key
# (unique constraint, reference: app/models.py:20).
WATERMARKS_SCHEMA = T.StructType(
    [
        T.StructField("consumer_id", T.StringType(), False),
        T.StructField("last_exported_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

# Fixed export projection, plain CSV contract
# (reference: app/services/exports.py:33).
EXPORT_COLUMNS = ["id", "name", "email", "created_at", "updated_at", "is_deleted"]
# Delta CSV adds the leading operation column
# (reference: app/services/exports.py:31).
DELTA_EXPORT_COLUMNS = ["operation", *EXPORT_COLUMNS]

# Driver-provided star-schema tables (TESTDATA.md).
STAR_TABLES = [
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

EMBEDDING_DIM = 64
