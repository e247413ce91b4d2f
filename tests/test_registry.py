"""Registry contract sanity: every query runs at sf0.001 and returns rows
with the declared aliasing discipline; oracle strings are present where
claimed. (Full oracle parity = tools/parity.py, run separately — it's the
driver's gate, too slow for the unit loop.)"""

import os

import pytest

import __spark_entry__ as entrymod
from wms_data_pipeline_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(SF), reason="driver testdata not present"
)


@needs_testdata
def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@needs_testdata
@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF)
    assert df.count() >= 0
    assert len(df.columns) == len(set(df.columns)), "duplicate column names"
    # Registry outputs must be scalar columns only: the driver's
    # order-insensitive canonicalizer sorts rows with pandas, and an
    # array/map/struct column makes that sort raise "unhashable type"
    # (the round-5 sim_pq_encode driver failure). Catch the next
    # array-valued query here instead of in CORRECTNESS_r{N}.json.
    from pyspark.sql.types import ArrayType, MapType, StructType

    for field in df.schema.fields:
        assert not isinstance(field.dataType, (ArrayType, MapType, StructType)), (
            f"{name}.{field.name} is {field.dataType.simpleString()}: registry "
            "outputs must be scalar (pack/explode/aggregate it — see "
            "similarity.pack_codes)"
        )


def test_contract_shape():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(REGISTRY)
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_registry_binds_the_named_function():
    """A helper def accidentally placed between @query(...) and the query
    function steals the registration (the decorator binds to whatever def
    follows it — this silently swapped rel_copurchase_triangles for its
    edge-list helper in round 10 until the parity hash caught it). Pin the
    invariant: every registered fn is named after its registry key."""
    for name, spec in REGISTRY.items():
        assert spec.fn.__name__ == name, (
            f"registry entry {name!r} is bound to {spec.fn.__name__!r} — "
            "a helper def probably slid between @query and the query fn"
        )
