"""Property-based invariants for the round-3 late-batch operators:
random small inputs, brute-force reference implementations."""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mahout_samsara_book_spark.operators.graph import (
    kcore_peel,
    triangle_counts,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# random simple undirected graphs on ≤ 9 nodes as edge sets
edge_sets = st.sets(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).map(
        lambda p: (min(p), max(p))
    ).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=20,
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


def _brute_triangles(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per_node = {}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                per_node[n] = per_node.get(n, 0) + 1
    return per_node


@given(edges=edge_sets)
@settings(**_SETTINGS)
def test_triangle_counts_match_bruteforce(sp, edges):
    df = sp.createDataFrame(sorted(edges), "a long, b long")
    got = {r["node"]: r["tri"] for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(edges)


def _brute_kcore(edges, k, rounds):
    es = set(edges)
    for _ in range(rounds):
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        es = {(a, b) for a, b in es if a in keep and b in keep}
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


@given(edges=edge_sets, k=st.integers(1, 4))
@settings(**_SETTINGS)
def test_kcore_peel_matches_bruteforce(sp, edges, k):
    df = sp.createDataFrame(sorted(edges), "a long, b long")
    got = {r["node"]: r["deg"] for r in kcore_peel(df, k, rounds=3).collect()}
    assert got == _brute_kcore(edges, k, 3)


@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=60
    )
)
@settings(**_SETTINGS)
def test_sample_quantiles_whole_group_is_exact(sp, vals):
    from mahout_samsara_book_spark.operators.sketches import sample_quantiles

    rows = [("g", float(v), i) for i, v in enumerate(vals)]
    df = sp.createDataFrame(rows, "grp string, value double, key long")
    out = {
        r["q"]: r["est"]
        for r in sample_quantiles(
            df, "grp", "value", "key", quantiles=(0.0, 0.5, 1.0), k=128
        ).collect()
    }
    s = sorted(vals)
    n = len(s)
    assert out[0.0] == s[0]
    assert out[1.0] == s[n - 1]
    assert out[0.5] == s[(n - 1) // 2]


def _brute_skyline(rows):
    # strict-domination frontier with smallest-key canonical dedup of
    # coincident points (matches q_rel_skyline's tiebreak)
    out = []
    for k, p, d in rows:
        dominated = False
        for k2, p2, d2 in rows:
            if (k2, p2, d2) == (k, p, d):
                continue
            if p2 <= p and d2 <= d and (p2 < p or d2 < d):
                dominated = True
                break
            if p2 == p and d2 == d and k2 < k:
                dominated = True
                break
        if not dominated:
            out.append(k)
    return set(out)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=15,
        unique_by=lambda r: r[0],
    )
)
@settings(**_SETTINGS)
def test_skyline_matches_bruteforce(sp, rows):
    import datetime as dt
    import shutil
    import tempfile

    import __spark_entry__
    import entry_rel

    __spark_entry__.queries()  # initialize the sci helpers
    d = tempfile.mkdtemp()
    try:
        data = [
            (k, float(p), dt.date(2024, 1, 1) + dt.timedelta(days=day))
            for k, p, day in rows
        ]
        sp.createDataFrame(
            data, "o_orderkey long, o_totalprice double, o_orderdate date"
        ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
        out = entry_rel.q_rel_skyline(sp, d)
        got = {r["o_orderkey"] for r in out.collect()}
        assert got == _brute_skyline(rows)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tfidf_neighbors_bruteforce_parity(spark):
    """Full-output parity of the posting-list cosine top-k against a
    driver-side numpy brute force that replays the identical
    fixed-point quantization — every (doc, neighbor, cosine, rank) row
    must match exactly, including tie order. Seeded random corpus so
    shared-term structure is nontrivial."""
    import math
    import random

    import numpy as np

    from mahout_samsara_book_spark.functions.text import tfidf_neighbors

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 25))))
        for i in range(30)
    ]
    k, max_df = 4, 20
    out = tfidf_neighbors(
        spark.createDataFrame(docs, "doc_id long, text string"),
        k=k,
        max_df=max_df,
    ).collect()

    # brute force with the same quantization
    from collections import Counter, defaultdict

    tf = {i: Counter(t.split()) for i, t in docs}
    df = Counter()
    for c in tf.values():
        for term in c:
            df[term] += 1
    n = float(len(docs))
    w = defaultdict(dict)
    for i, c in tf.items():
        for term, f in c.items():
            if df[term] <= max_df:
                # replicate Spark: round(sqrt(tf)*(ln(n/(df+1))+1)*1e6) HALF_UP
                v = math.sqrt(f) * (math.log(n / (df[term] + 1.0)) + 1.0) * 1e6
                w[i][term] = math.floor(v + 0.5)
    ids = sorted(w)
    expect = {}
    for a in ids:
        scored = []
        s2a = sum(x * x for x in w[a].values())
        for b in ids:
            if a == b:
                continue
            num = sum(w[a][t] * w[b][t] for t in w[a].keys() & w[b].keys())
            if num == 0:
                continue
            s2b = sum(x * x for x in w[b].values())
            cos = min(num / (math.sqrt(s2a) * math.sqrt(s2b)), 1.0)
            scored.append((-cos, b))
        scored.sort()
        for rank, (negcos, b) in enumerate(scored[:k], 1):
            expect[(a, b)] = (-negcos, rank)
    got = {(r["doc_id"], r["neighbor"]): (r["cosine"], r["rank"]) for r in out}
    assert set(got) == set(expect)
    for key, (cos, rank) in expect.items():
        gcos, grank = got[key]
        assert grank == rank, (key, grank, rank)
        assert gcos == pytest.approx(cos, rel=1e-12), (key, gcos, cos)


# ------------------------------------------------------------------ #
# round-8: PNG codec property — random pixels, shapes, filter rows
# ------------------------------------------------------------------ #


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=st.data())
def test_png_defilter_random_roundtrip(data):
    """Encode random pixel stacks through every filter type and decode
    with the batch kernel: reconstruction must be bit-exact for any
    (w, h, filter assignment) — the uint8 wraparound math is the spec's
    mod-256, not an approximation."""
    import struct
    import zlib

    import numpy as np

    from mahout_samsara_book_spark.operators.multimodal import (
        _paeth_u8,
        _png_defilter,
        _png_parse,
        _PNG_SIG,
        _png_chunk,
    )

    w = data.draw(st.integers(min_value=1, max_value=9))
    h = data.draw(st.integers(min_value=1, max_value=7))
    n = data.draw(st.integers(min_value=1, max_value=5))
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    bpp, stride = 3, w * 3
    pixels = rng.randint(0, 256, size=(n, h, stride), dtype=np.int64)
    fts = rng.randint(0, 5, size=(n, h))

    # reference scalar ENCODER (independent of the library's)
    raws = []
    for i in range(n):
        out = bytearray()
        prior = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            raw = pixels[i, y]
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), raw[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prior[:-bpp]])
            ft = int(fts[i, y])
            if ft == 0:
                pred = np.zeros(stride, dtype=np.int64)
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = prior
            elif ft == 3:
                pred = (left + prior) // 2
            else:
                pred = _paeth_u8(
                    left.astype(np.uint8),
                    prior.astype(np.uint8),
                    ul.astype(np.uint8),
                ).astype(np.int64)
            out.append(ft)
            out.extend(((raw - pred) % 256).astype(np.uint8).tobytes())
            prior = raw
        raws.append(bytes(out))

    arr = np.frombuffer(b"".join(raws), dtype=np.uint8).reshape(n, -1)
    rec = _png_defilter(arr, w, h)
    assert np.array_equal(rec.astype(np.int64), pixels)

    # container round trip for one image: parse(chunked(raw)) == raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raws[0]))
        + _png_chunk(b"IEND", b"")
    )
    pw, ph, praw = _png_parse(blob)
    assert (pw, ph) == (w, h) and praw == raws[0]


def test_png_defilter_realistic_shape_roundtrip():
    """ADVICE r8: the hypothesis property above bounds shapes at
    9×7×5 to keep the example budget honest — this deterministic case
    covers a REALISTIC image size (160×120 RGB, a 4-image batch,
    ~230 KB of filtered bytes) through the same independent scalar
    encoder, so the batch kernels' shape-grouped stacking and
    uint8 wraparound are exercised at the row strides production
    images actually have."""
    import struct
    import zlib

    import numpy as np

    from mahout_samsara_book_spark.operators.multimodal import (
        _paeth_u8,
        _png_defilter,
        _png_parse,
        _PNG_SIG,
        _png_chunk,
    )

    w, h, n = 160, 120, 4
    rng = np.random.RandomState(1337)
    bpp, stride = 3, w * 3
    pixels = rng.randint(0, 256, size=(n, h, stride), dtype=np.int64)
    # cycle every filter type across rows so each appears ~h/5 times
    fts = (np.arange(h)[None, :] + np.arange(n)[:, None]) % 5

    raws = []
    for i in range(n):
        out = bytearray()
        prior = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            raw = pixels[i, y]
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), raw[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prior[:-bpp]])
            ft = int(fts[i, y])
            if ft == 0:
                pred = np.zeros(stride, dtype=np.int64)
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = prior
            elif ft == 3:
                pred = (left + prior) // 2
            else:
                pred = _paeth_u8(
                    left.astype(np.uint8),
                    prior.astype(np.uint8),
                    ul.astype(np.uint8),
                ).astype(np.int64)
            out.append(ft)
            out.extend(((raw - pred) % 256).astype(np.uint8).tobytes())
            prior = raw
        raws.append(bytes(out))

    arr = np.frombuffer(b"".join(raws), dtype=np.uint8).reshape(n, -1)
    rec = _png_defilter(arr, w, h)
    assert np.array_equal(rec.astype(np.int64), pixels)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raws[0]))
        + _png_chunk(b"IEND", b"")
    )
    pw, ph, praw = _png_parse(blob)
    assert (pw, ph) == (w, h) and praw == raws[0]


# ------------------------------------------------------------------ #
# round-9: asof_join vs pandas merge_asof (the reference impl)
# ------------------------------------------------------------------ #


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=st.data())
def test_asof_join_matches_merge_asof(data, spark):
    """Every (direction, tolerance) contract of asof_join — inclusive
    matches, equal-time tiebreaks (backward→greatest right id,
    forward→smallest), nearest's backward-on-tie, tolerance pruning,
    group isolation — agrees row-for-row with pandas merge_asof on
    collision-rich random timelines (times drawn from a small range so
    exact ties and equal distances actually occur).  merge_asof's tie
    behavior comes from its stable scan over the right side pre-sorted
    by (t, id), which IS this operator's documented contract."""
    import numpy as np
    import pandas as pd

    from mahout_samsara_book_spark.functions.relational import asof_join

    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    direction = data.draw(
        st.sampled_from(["backward", "forward", "nearest"])
    )
    tolerance = data.draw(st.one_of(st.none(), st.integers(0, 5)))
    n_l = data.draw(st.integers(1, 8))
    n_r = data.draw(st.integers(0, 8))
    lpd = pd.DataFrame(
        {
            "k": rng.randint(1, 4, n_l).astype("int64"),
            "t": rng.randint(0, 21, n_l).astype("int64"),
            "lid": np.arange(100, 100 + n_l, dtype="int64"),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.randint(1, 4, n_r).astype("int64"),
            "t": rng.randint(0, 21, n_r).astype("int64"),
            "rid": np.arange(n_r, dtype="int64"),
            "val": rng.rand(n_r),
        }
    )
    want = pd.merge_asof(
        lpd.sort_values(["t", "lid"]).reset_index(drop=True),
        rpd.sort_values(["t", "rid"]).reset_index(drop=True),
        on="t",
        by="k",
        direction=direction,
        tolerance=tolerance,
    )
    expect = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in want.itertuples()
    }
    left = spark.createDataFrame(lpd)
    right = (
        spark.createDataFrame(rpd)
        if n_r
        else spark.createDataFrame([], "k long, t long, rid long, val double")
    )
    got = {
        r["lid"]: (None if r["rid"] is None else int(r["rid"]))
        for r in asof_join(
            left, right, "k", "t", "t", ["rid", "val"], "rid",
            direction=direction, tolerance=tolerance,
        ).collect()
    }
    assert got == expect, (direction, tolerance, got, expect)
