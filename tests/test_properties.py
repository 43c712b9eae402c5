"""Hypothesis property tests for the algorithmic operators whose
contracts have cheap Python reference implementations: connected
components (vs union-find), winnowing's shared-substring guarantee,
and int8 quantization's error bound.

Example counts are kept small (each example runs real Spark jobs);
the value is randomized STRUCTURE — graphs, token sequences, vectors —
not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streaming_data_spark.operators import dedup, similarity

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {(n, min(ms)) for ms in comp.values() for n in ms}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_star_cc_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    nodes = sorted({x for e in edges for x in e})
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components_star(df).collect()
    }
    assert got == _uf_components(edges, nodes)


@given(
    prefix_a=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=6),
    prefix_b=st.lists(st.sampled_from("ijklmnop"), min_size=0, max_size=6),
    shared=st.lists(st.sampled_from("qrstuvwx"), min_size=8, max_size=14),
)
@settings(**_SETTINGS)
def test_winnowing_shared_run_guarantees_shared_fingerprint(
    spark, prefix_a, prefix_b, shared
):
    """The MOSS guarantee: two documents containing the same contiguous
    token run of length >= W + N - 1 (= 6 tokens here: every window of
    W=4 consecutive 3-gram hashes inside the run is identical in both
    docs) must share at least one winnowing fingerprint — regardless
    of what surrounds the run. This is the property that makes
    winnowing detect PARTIAL overlap that whole-doc Jaccard misses.
    Runs against the SHIPPED fingerprint kernel (winnow_fingerprints),
    not a private copy of it."""
    from streaming_data_spark.queries_ext12 import winnow_fingerprints

    doc_a = " ".join([*prefix_a, *shared])
    doc_b = " ".join([*prefix_b, *shared])
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    sets: dict[int, set] = {1: set(), 2: set()}
    for r in winnow_fingerprints(docs).collect():
        sets[r.doc_id].add(r.fp)
    assert sets[1] & sets[2], (doc_a, doc_b, sets)


@given(
    vec=st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(**_SETTINGS)
def test_quantize_error_bound_random_vectors(spark, vec):
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    row = similarity.quantize_int8(df).collect()[0]
    assert all(-127 <= q <= 127 for q in row.qvec)
    if row.scale == 0.0:
        assert all(q == 0 for q in row.qvec)
        return
    bound = row.scale / 2 * (1 + 1e-9)
    # float32 storage rounds the input; compare against the stored value
    stored = df.collect()[0].embedding
    for orig, q in zip(stored, row.qvec):
        assert abs(orig - q * row.scale) <= bound, (orig, q, row.scale)
