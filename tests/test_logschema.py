"""Dynamic log schema end-to-end: drifted batches -> merged schema ->
persist/reload -> unified read -> field_stats on a drifted field."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duo_spark.operators.logs import field_stats
from duo_spark.schemas import LOG_CORE_SCHEMA
from duo_spark.sources.logschema import LogSchemaRegistry, ingest_log_batch, merge_schemas, widen
from duo_spark.sources.store import PartitionedStore

BASE = 1_700_000_000_000_000

CORE = [f.name for f in LOG_CORE_SCHEMA.fields]


def _batch(spark, extra_fields, rows):
    schema = T.StructType(
        list(LOG_CORE_SCHEMA.fields)
        + [T.StructField(n, t, True) for n, t in extra_fields]
    )
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def store(spark, tmp_path):
    return PartitionedStore(spark, str(tmp_path / "store"), granularity="hour")


def test_widen_rules():
    assert widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.LongType(), T.LongType()) == T.LongType()
    assert widen(T.LongType(), T.StringType()) == T.StringType()
    assert widen(T.BooleanType(), T.LongType()) == T.StringType()


def test_merge_preserves_order_and_appends():
    base = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.StringType())])
    batch = T.StructType([T.StructField("c", T.LongType()), T.StructField("a", T.DoubleType())])
    merged = merge_schemas(base, batch)
    assert [f.name for f in merged.fields] == ["a", "b", "c"]
    assert merged["a"].dataType == T.DoubleType()
    assert all(f.nullable for f in merged.fields)


def test_drifted_batches_end_to_end(spark, store):
    """Two batches with different user fields (one with a type
    conflict) ingest, persist the merged schema, read back unified,
    and field_stats works on a drifted field through the store."""
    reg = LogSchemaRegistry(store)
    core = ("web-0", BASE, 1, 10, "INFO", "app", None, None, "m")
    b1 = _batch(
        spark,
        [("user_id", T.LongType()), ("region", T.StringType())],
        [core + (7, "eu"), core + (8, "us")],
    )
    b2 = _batch(
        spark,
        [("latency", T.DoubleType()), ("user_id", T.StringType())],
        [core + (1.5, "anon"), core + (2.5, "anon")],
    )
    ingest_log_batch(reg, b1)
    ingest_log_batch(reg, b2)
    # merged schema: core + first-seen order, user_id widened to string
    names = [f["name"] for f in reg.log_schema()]
    assert names == CORE + ["user_id", "region", "latency"]
    assert reg.schema["user_id"].dataType == T.StringType()
    # reload from the persisted JSON (schema.rs:48-72)
    reg2 = LogSchemaRegistry(store)
    assert reg2.schema == reg.schema
    # unified read: both batches, missing fields null, types merged
    back = store.read("log")
    assert back.count() == 4
    assert dict(back.dtypes)["user_id"] == "string"
    assert back.filter(F.col("region").isNull()).count() == 2
    # A2 on a drifted user field through the store
    stats = {r.value: r["count"] for r in field_stats(back, "user_id").collect()}
    assert stats == {"anon": 2, "7": 1, "8": 1}


def test_conform_casts_and_nulls(spark, store):
    reg = LogSchemaRegistry(store)
    b1 = _batch(spark, [("n", T.LongType())], [])
    reg.merge_batch(b1)
    b2 = _batch(spark, [("n", T.DoubleType())], [])
    reg.merge_batch(b2)
    conformed = reg.conform(b1)
    assert dict(conformed.dtypes)["n"] == "double"
    assert [f.name for f in conformed.schema.fields] == CORE + ["n"]


# lattice properties of the widening merge (hypothesis)
# ---------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from duo_spark.sources.logschema import merge_schemas, widen

_TYPES = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(), T.BooleanType(),
    T.DateType(), T.TimestampType(), T.ArrayType(T.LongType()),
]
_types = st.sampled_from(_TYPES)
_schemas = st.dictionaries(
    st.sampled_from([f"f{i}" for i in range(6)]), _types, max_size=6
).map(lambda d: T.StructType(
    [T.StructField(n, t, True) for n, t in sorted(d.items())]
))


@settings(max_examples=300, deadline=None)
@given(a=_types, b=_types, c=_types)
def test_widen_is_a_join_semilattice(a, b, c):
    """Commutative, idempotent, associative — the algebra that makes
    cross-batch merging order-insensitive (any batch arrival order
    converges to the same persisted schema)."""
    assert widen(a, a) == a
    assert widen(a, b) == widen(b, a)
    assert widen(widen(a, b), c) == widen(a, widen(b, c))
    # string is the lattice top
    assert widen(widen(a, b), T.StringType()) == T.StringType()


@settings(max_examples=200, deadline=None)
@given(base=_schemas, b1=_schemas, b2=_schemas)
def test_merge_schemas_order_insensitive_types(base, b1, b2):
    """Merging batches in either order yields the same field->type map
    (field ORDER is first-seen and may differ — the queryable content
    must not), the base field order survives as a prefix, and merging
    a schema into itself is the identity."""
    m12 = merge_schemas(merge_schemas(base, b1), b2)
    m21 = merge_schemas(merge_schemas(base, b2), b1)
    assert {f.name: f.dataType for f in m12.fields} == {
        f.name: f.dataType for f in m21.fields
    }
    base_names = [f.name for f in base.fields]
    assert [f.name for f in m12.fields][: len(base_names)] == base_names
    assert merge_schemas(base, base) == T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in base.fields]
    )
