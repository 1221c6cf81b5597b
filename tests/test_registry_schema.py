"""Canonicalizer defense: the driver's correctness gate sorts and
hashes result cells and dies on list/map/struct values (this bit
``text_inverted_index`` in round 3 and nearly ``emb_centroids`` in
round 4).  Assert — registry-wide — that every ``queries()`` entry
yields a scalar-only schema, so reintroducing a complex-typed output
column fails CI before it reaches the driver.

Construction is MOSTLY lazy — a callable builds its DataFrame and the
analyzed schema resolves without executing the query.  A handful of
entries do real work at construction time (ADVICE r5): the executed
streaming twins run a full availableNow query, ``fmt_bucketed_join``
writes bucketed tables, and the iterative algorithms (bfgs, bahmani,
kmeans) run driver-side iterations while building the plan.  That is
acceptable at sf0.001 (the whole parametrized sweep stays in seconds),
and exercising those constructions here is itself useful coverage.
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
