"""Canonicalizer defense: the driver's correctness gate sorts and
hashes result cells and dies on list/map/struct values (this bit
``text_inverted_index`` in round 3 and nearly ``emb_centroids`` in
round 4).  Assert — registry-wide — that every ``queries()`` entry
yields a scalar-only schema, so reintroducing a complex-typed output
column fails CI before it reaches the driver.

Construction is lazy: each callable builds its DataFrame (no collect),
which is enough to resolve the analyzed schema.  Queries whose
*construction* is inherently driver-iterative (they run collects while
building the plan) still return a plain DataFrame, so this stays cheap
at sf0.001.
"""

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _registry():
    return sorted(entry.queries().items())


@pytest.mark.parametrize("name,fn", _registry(), ids=[n for n, _ in _registry()])
def test_output_schema_is_scalar_only(spark, name, fn):
    df = fn(spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"{name} emits complex-typed column(s) {bad}; the driver's "
        "canonicalizer cannot hash list/map/struct cells — stringify "
        "with concat_ws/array_to_string on BOTH engines"
    )
