"""Property-based algebra invariants (hypothesis) — the dual of the
example-based suites: random small matrices, structural identities that
must hold for ANY input, mirroring the reference's tolerance-gate style
(SURVEY §5) but quantified."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from mahout_samsara_book_spark.drm.drm import Drm

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

small_matrix = arrays(
    np.float64,
    st.tuples(st.integers(2, 10), st.integers(1, 6)),
    elements=st.floats(-100, 100, allow_nan=False, width=32),
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@given(mx=small_matrix)
@settings(**_SETTINGS)
def test_double_transpose_identity(sp, mx):
    d = Drm.from_numpy(sp, mx, num_partitions=2)
    assert np.allclose(d.t().t().collect(), mx, atol=1e-9)


@given(mx=small_matrix)
@settings(**_SETTINGS)
def test_transpose_matches_numpy(sp, mx):
    d = Drm.from_numpy(sp, mx, num_partitions=2)
    assert np.allclose(d.t().collect(), mx.T, atol=1e-9)


@given(mx=small_matrix)
@settings(**_SETTINGS)
def test_gram_equals_t_mmul(sp, mx):
    d = Drm.from_numpy(sp, mx, num_partitions=2)
    g = d.gram()
    assert np.allclose(g, mx.T @ mx, atol=1e-7)
    assert np.allclose(g, g.T, atol=0)  # symmetry is exact by construction


@given(mx=small_matrix, scalar=st.floats(-10, 10, allow_nan=False, width=16))
@settings(**_SETTINGS)
def test_scalar_ops_roundtrip(sp, mx, scalar):
    d = Drm.from_numpy(sp, mx)
    out = d.scalar_op("+", scalar).scalar_op("-", scalar).collect()
    assert np.allclose(out, mx, atol=1e-9)


@given(mx=small_matrix)
@settings(**_SETTINGS)
def test_rowsums_colsums_grand_total(sp, mx):
    d = Drm.from_numpy(sp, mx, num_partitions=2)
    rs = d.rowsums().toPandas()["row_sum"].to_numpy()
    assert np.isclose(rs.sum(), d.colsums().sum(), atol=1e-7)


@given(mx=small_matrix)
@settings(**_SETTINGS)
def test_rbind_slice_inverse(sp, mx):
    if mx.shape[0] < 4:
        return
    cut = mx.shape[0] // 2
    a = Drm.from_numpy(sp, mx[:cut])
    b = Drm.from_numpy(sp, mx[cut:])
    assert np.allclose(a.rbind(b).collect(), mx, atol=0)


@given(mx=small_matrix)
@settings(**_SETTINGS)
def test_coo_roundtrip_property(sp, mx):
    """to_coo → from_coo restores every non-empty row exactly (empty
    rows carry no COO geometry — the documented contract)."""
    d = Drm.from_numpy(sp, mx, num_partitions=2)
    back = Drm.from_coo(d.to_coo(), ncol=mx.shape[1])
    keys, out = back.collect_keys_matrix()
    nonempty = {i for i in range(mx.shape[0]) if np.any(mx[i] != 0)}
    assert set(keys.tolist()) == nonempty
    for k, row in zip(keys, out):
        assert np.allclose(row, mx[k], atol=0)


@given(
    mx=small_matrix,
    beta_seed=st.integers(0, 2**16),
)
@settings(**_SETTINGS)
def test_ssr_xy_matches_numpy_property(sp, mx, beta_seed):
    """ssr_xy ≡ ‖[1|X]β − y‖² for arbitrary data and beta (last column
    is y)."""
    if mx.shape[1] < 2:
        return
    from mahout_samsara_book_spark.algorithms.regression import ssr_xy

    rng = np.random.default_rng(beta_seed)
    beta = rng.normal(size=mx.shape[1])  # bias + (ncol-1) features
    d = Drm.from_numpy(sp, mx, num_partitions=2)
    got = ssr_xy(d, beta)
    x, y = mx[:, :-1], mx[:, -1]
    xb = np.hstack([np.ones((mx.shape[0], 1)), x])
    expect = float(np.sum((xb @ beta - y) ** 2))
    assert np.isclose(got, expect, rtol=1e-9, atol=1e-9)


@given(
    mx=small_matrix,
    labels_seed=st.integers(0, 2**16),
)
@settings(**_SETTINGS)
def test_group_sum_partition_invariance(sp, mx, labels_seed):
    """aggregate_rows_by_key totals are independent of partitioning and
    equal the pandas groupby."""
    rng = np.random.default_rng(labels_seed)
    labels = rng.integers(0, 3, mx.shape[0])

    def relabel(keys, block):
        return labels[keys], block

    for parts in (1, 3):
        d = Drm.from_numpy(sp, mx, num_partitions=parts).map_block(relabel)
        keys, out = d.aggregate_rows_by_key().collect_keys_matrix()
        for k, row in zip(keys, out):
            assert np.allclose(row, mx[labels == k].sum(axis=0), atol=1e-9)


# ------------------------------------------------------------------ #
# selection-layer properties (round 3): partition laws that must hold
# for ANY id set / weights / shard count
# ------------------------------------------------------------------ #

id_lists = st.lists(
    st.integers(0, 10_000_000), min_size=1, max_size=60, unique=True
)


@given(ids=id_lists, n_shards=st.integers(1, 9))
@settings(**_SETTINGS)
def test_shard_assign_partition_law(sp, ids, n_shards):
    """Sharding is a partition: every id appears exactly once, shards
    within range, positions dense per shard."""
    from mahout_samsara_book_spark.operators.selection import shard_assign

    df = sp.createDataFrame([(i,) for i in ids], "doc_id long")
    out = shard_assign(df, n_shards).toPandas()
    assert sorted(out.doc_id) == sorted(ids)
    assert out.shard.between(0, n_shards - 1).all()
    for _, g in out.groupby("shard"):
        assert sorted(g.pos) == list(range(len(g)))


@given(
    ids=id_lists,
    w=st.tuples(
        st.floats(0.05, 1, allow_nan=False),
        st.floats(0.05, 1, allow_nan=False),
        st.floats(0.05, 1, allow_nan=False),
    ),
)
@settings(**_SETTINGS)
def test_split_assign_total_function(sp, ids, w):
    """Any positive weight vector yields a total assignment into the
    declared names, regardless of normalization."""
    from mahout_samsara_book_spark.operators.selection import split_assign

    df = sp.createDataFrame([(i,) for i in ids], "doc_id long")
    out = split_assign(df, weights=w).toPandas()
    assert len(out) == len(ids)
    assert set(out.split) <= {"train", "val", "test"}


@given(
    # strictly positive: zero-token docs tie on (pack_id, pack_off),
    # making the shard-order reconstruction below ambiguous
    toks=st.lists(st.integers(1, 400), min_size=1, max_size=50),
    budget=st.integers(32, 512),
)
@settings(**_SETTINGS)
def test_pack_sequences_conservation(sp, toks, budget):
    """Token conservation: within each shard, pack_id/pack_off must
    equal the running token count's div/mod — i.e. offsets reconstruct
    the exclusive cumulative sum exactly."""
    from mahout_samsara_book_spark.operators.selection import pack_sequences

    df = sp.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tok long"
    )
    out = pack_sequences(df, "n_tok", budget, 3).toPandas()
    toks_by_id = dict(enumerate(toks))
    for _, g in out.groupby("shard"):
        # reconstruct shard order from (pack_id, pack_off) — cumsum is
        # strictly nondecreasing in shard order
        g = g.sort_values(["pack_id", "pack_off", "doc_id"]).reset_index(drop=True)
        cum = 0
        for _, row in g.iterrows():
            assert row.pack_id * budget + row.pack_off == cum
            cum += toks_by_id[row.doc_id]
