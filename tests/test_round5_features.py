"""Round-5 additions: NULL-safe + adaptive keep-first dedup, connected-
components convergence (label raises; large-star/small-star contraction),
identical-doc collapse guard for MinHash/SimHash banding, deterministic
IVF training sample, converter allowlist, exact-top-k memo invalidation."""

from __future__ import annotations

import itertools
import os
import random

import pandas as pd
import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from pysemantic_spark.operators import dedup

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# keep-first: NULL keys + adaptive strategy
# ---------------------------------------------------------------------------

def _null_key_df(spark):
    rows = [
        (1, 10), (1, 11),          # dup int key
        (None, 20), (None, 21),    # dup NULL key — the ADVICE regression
        (2, 30),                   # unique key
        (None, 19),                # NULL group, earliest order
    ]
    return spark.createDataFrame(rows, "k int, v int")


@pytest.mark.parametrize("strategy", ["split", "window"])
def test_keep_first_null_keys_dedup(spark, strategy):
    """NULL keys must group together (window/GROUP BY semantics) in BOTH
    plans — a plain equi anti-join would let every NULL-key row survive."""
    df = _null_key_df(spark)
    got = {
        tuple(r)
        for r in dedup.exact_dedup_keep_first(
            df, ["k"], ["v"], strategy=strategy
        ).collect()
    }
    # exactly one NULL-key survivor (the order_by-first one), one per int key
    assert got == {(None, 19), (1, 10), (2, 30)}


def test_keep_first_strategy_choice(spark):
    # every key duplicated ~100× → window; nearly all unique → split
    all_dup = spark.range(1000).select((F.col("id") % 10).alias("k"), "id")
    mostly_uniq = spark.range(1000).select(F.col("id").alias("k"), "id")
    assert dedup.keep_first_strategy(all_dup, ["k"]) == "window"
    assert dedup.keep_first_strategy(mostly_uniq, ["k"]) == "split"


def test_keep_first_auto_matches_naive_window_with_nulls(spark):
    df = _null_key_df(spark)
    w = Window.partitionBy("k").orderBy("v")
    exp = {
        tuple(r)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .collect()
    }
    got = {
        tuple(r)
        for r in dedup.exact_dedup_keep_first(df, ["k"], ["v"]).collect()
    }
    assert got == exp


def test_runner_clean_path_null_keys(spark):
    """The execute/validate clean path's dup-split must also be NULL-safe:
    duplicate NULL-key rows dedup to one survivor, not all survive."""
    from pysemantic_spark.operators.runner import validate
    from pysemantic_spark.spec import DatasetSpec

    df = spark.createDataFrame(
        [(1, 10), (1, 11), (None, 20), (None, 21), (2, 30)], "k int, v int"
    )
    spec = DatasetSpec(name="t", uniqueness=[["k"]], order_by=["v"])
    clean = validate(spark, df, spec).clean
    got = {(r["k"], r["v"]) for r in clean.collect()}
    assert got == {(1, 10), (2, 30), (None, 20)}


# ---------------------------------------------------------------------------
# connected components: convergence + star contraction
# ---------------------------------------------------------------------------

def _pairs(spark, edges):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges]
    )


def test_cc_label_raises_on_long_chain(spark):
    """min-label propagation advances one hop per round: a chain longer
    than max_iters must RAISE, never silently return wrong labels."""
    chain = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(_pairs(spark, chain), max_iters=5)


def test_cc_star_converges_on_long_chain(spark):
    """large-star/small-star is O(log n) rounds regardless of diameter —
    the same chain that breaks label propagation converges."""
    chain = [(i, i + 1) for i in range(40)]
    got = dedup.connected_components(
        _pairs(spark, chain), max_iters=12, algorithm="star"
    ).collect()
    assert len(got) == 41
    assert all(r["cluster_rep"] == 0 for r in got)


def test_cc_star_matches_label_on_random_graphs(spark):
    rng = random.Random(11)
    for _ in range(3):
        edges = list(
            {
                tuple(sorted(rng.sample(range(60), 2)))
                for _ in range(70)
            }
        )
        p = _pairs(spark, edges)
        lab = {
            r["node"]: r["cluster_rep"]
            for r in dedup.connected_components(p, max_iters=100).collect()
        }
        star = {
            r["node"]: r["cluster_rep"]
            for r in dedup.connected_components(
                p, max_iters=25, algorithm="star"
            ).collect()
        }
        assert lab == star


# ---------------------------------------------------------------------------
# identical-doc collapse guard (band-bucket skew)
# ---------------------------------------------------------------------------

def _docs(spark):
    """8 byte-identical docs + a near-dup + unrelated docs + 2 identical
    sub-shingle-length shorts (must never pair at n=3)."""
    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, body) for i in range(8)]
    rows.append((100, body.replace("kappa", "lambda")))
    rows.append((200, "one two three four five six seven eight nine ten"))
    rows.append((201, "cats chase mice across seven silent rooftops at night yes"))
    rows += [(300, "too short"), (301, "too short")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_collapse_identical_docs_reps(spark):
    df = _docs(spark)
    rep_df, members = dedup.collapse_identical_docs(df, "doc_id", "text")
    # 8 identical bodies → 1 rep; shorts → 1 rep; others 1 each
    assert rep_df.count() == 5
    m = {r["_id"]: r["_rep"] for r in members.collect()}
    assert len(m) == 13
    assert all(m[i] == 0 for i in range(8))
    assert m[300] == m[301] == 300


def _pairset(df_pairs, score_col):
    return {
        (r["id_a"], r["id_b"], round(r[score_col], 6))
        for r in df_pairs.collect()
    }


def test_minhash_collapse_matches_uncollapsed(spark):
    df = _docs(spark)
    kw = dict(n=3, num_hashes=32, bands=8, threshold=0.5)
    on = _pairset(
        dedup.minhash_lsh_pairs(df, "doc_id", "text", **kw), "jaccard"
    )
    off = _pairset(
        dedup.minhash_lsh_pairs(
            df, "doc_id", "text", collapse_identical=False, **kw
        ),
        "jaccard",
    )
    assert on == off
    # all 28 identical-group pairs present at jaccard 1.0
    for a, b in itertools.combinations(range(8), 2):
        assert (a, b, 1.0) in on
    # sub-shingle-length identical docs never pair
    assert not any(a == 300 or b == 300 for a, b, _ in on)


def test_simhash_collapse_matches_uncollapsed(spark):
    df = _docs(spark)
    on = _pairset(
        dedup.simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=3),
        "hamming",
    )
    off = _pairset(
        dedup.simhash_near_dup_pairs(
            df, "doc_id", "text", max_hamming=3, collapse_identical=False
        ),
        "hamming",
    )
    assert on == off
    for a, b in itertools.combinations(range(8), 2):
        assert (a, b, 0) in on
    # "too short" has tokens (2) → fingerprints exist; identical → hamming 0
    assert (300, 301, 0) in on


def test_collapse_candidate_volume_is_linear(spark):
    """m identical docs must contribute ONE representative to banding —
    the band self-join sees O(groups), not O(m), rows, so candidate rows
    inside any bucket grow O(reps²) with reps independent of m."""
    body = " ".join(f"tok{i}" for i in range(12))
    m = 50
    df = spark.createDataFrame(
        [(i, body) for i in range(m)] + [(999, "totally different words here now ok")],
        "doc_id long, text string",
    )
    rep_df, members = dedup.collapse_identical_docs(df, "doc_id", "text")
    assert rep_df.count() == 2          # 1 rep for the m clones + 1 other
    assert members.count() == m + 1
    # end-to-end: the full C(m,2) duplicate pair list is still recovered
    out = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.9
    )
    assert out.count() == m * (m - 1) // 2


@pytest.mark.parametrize("prefix_filter", [True, False])
def test_ngram_collapse_matches_uncollapsed(spark, prefix_filter):
    df = _docs(spark)
    kw = dict(n=3, threshold=0.5, prefix_filter=prefix_filter)
    on = _pairset(
        dedup.ngram_jaccard_pairs(df, "doc_id", "text", **kw), "jaccard"
    )
    off = _pairset(
        dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", collapse_identical=False, **kw
        ),
        "jaccard",
    )
    assert on == off
    for a, b in itertools.combinations(range(8), 2):
        assert (a, b, 1.0) in on
    assert not any(a == 300 or b == 300 for a, b, _ in on)


def test_ngram_collapse_survives_stop_cap(spark):
    """Identical docs whose every shingle is stop-capped previously could
    not pair in the counting path (documented lossy corner); the collapse
    guard recovers them exactly."""
    body = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(i, body) for i in range(5)], "doc_id long, text string"
    )
    got = _pairset(
        dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.9,
            max_shingle_freq=2, prefix_filter=False,
        ),
        "jaccard",
    )
    assert got == {
        (a, b, 1.0) for a, b in itertools.combinations(range(5), 2)
    }


# ---------------------------------------------------------------------------
# quarantine lifecycle: park → refresh baseline → requalify → resume
# ---------------------------------------------------------------------------

def test_quarantine_requalify_lifecycle(spark, tmp_path):
    import numpy as np

    from pysemantic_spark.operators.drift import save_drift_baseline
    from pysemantic_spark.sources.tableio import (
        ParquetManifestIO,
        requalify_buckets,
        run_resumable,
    )
    from pysemantic_spark.spec import DatasetSpec

    rng = np.random.default_rng(6)
    base = spark.createDataFrame(
        pd.DataFrame({"v": rng.normal(100, 10, 4000), "k": range(4000)})
    )
    shifted_pdf = pd.DataFrame(
        {"v": rng.normal(170, 10, 4000), "k": range(4000)}
    )
    shifted = spark.createDataFrame(shifted_pdf)
    bl = str(tmp_path / "bl.json")
    save_drift_baseline(base, ["v"], bl)
    spec = DatasetSpec.from_dict(
        "t",
        {
            "column_rules": {"v": {"min": 0.0}},
            "drift": {"columns": ["v"], "baseline": bl,
                      "on_drift": "quarantine"},
        },
    )
    io = ParquetManifestIO(str(tmp_path / "tbl"))
    io.write_bucketed(shifted, "k", 4)
    first = run_resumable(spark, io, spec, chunk_size=4)
    assert sorted(first["quarantined"]) == [0, 1, 2, 3]

    # naming a non-quarantined bucket is rejected
    with pytest.raises(ValueError, match="not quarantined"):
        requalify_buckets(io, [0, 99])

    # operator accepts the drift: refresh the baseline from the new data,
    # then requalify — CLI verb for two buckets, API for the rest
    save_drift_baseline(shifted, ["v"], bl)
    from pysemantic_spark.cli import main as cli_main

    assert cli_main(
        ["requalify", "--table", io.root, "--bucket", "0", "--bucket", "1"]
    ) == 0
    m = io.load_manifest()
    assert sorted(m.pending()) == [0, 1]
    assert sorted(m.quarantined()) == [2, 3]
    assert requalify_buckets(io) == [2, 3]          # rest, default=all

    # resume revalidates ALL requalified buckets against the new baseline
    second = run_resumable(spark, io, spec, chunk_size=4)
    assert sorted(second["processed"]) == [0, 1, 2, 3]
    assert second["quarantined"] == []
    m = io.load_manifest()
    assert all(e.status == "done" for e in m.entries.values())


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_corpus_strategy = st.lists(
    st.tuples(
        # doc body: 4-9 tokens from a tiny vocab (forces shared shingles)
        st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]),
            min_size=4,
            max_size=9,
        ),
        # clone multiplicity: how many byte-identical copies of this body
        st.integers(min_value=1, max_value=5),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus_strategy)
def test_collapse_guard_property_minhash(spark, corpus):
    """For ARBITRARY clone-heavy corpora, collapsed and uncollapsed
    MinHash mining yield the identical pair set with identical scores."""
    rows, nid = [], 0
    for body, mult in corpus:
        for _ in range(mult):
            rows.append((nid, " ".join(body)))
            nid += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(n=2, num_hashes=16, bands=8, threshold=0.4)
    on = _pairset(
        dedup.minhash_lsh_pairs(df, "doc_id", "text", **kw), "jaccard"
    )
    off = _pairset(
        dedup.minhash_lsh_pairs(
            df, "doc_id", "text", collapse_identical=False, **kw
        ),
        "jaccard",
    )
    assert on == off


# ---------------------------------------------------------------------------
# duplicate_clusters: cluster assignment without the O(m²) pair list
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("algorithm", ["label", "star"])
def test_duplicate_clusters_equals_pairlist_path(spark, algorithm):
    df = _docs(spark)  # 8 clones + near-dup + unrelated + 2 short clones
    kw = dict(n=3, threshold=0.5)
    exp = {
        (r["node"], r["cluster_rep"])
        for r in dedup.connected_components(
            dedup.ngram_jaccard_pairs(df, "doc_id", "text", **kw),
            max_iters=50,
        ).collect()
    }
    got = {
        (r["node"], r["cluster_rep"])
        for r in dedup.duplicate_clusters(
            df, "doc_id", "text", algorithm=algorithm, **kw
        ).collect()
    }
    assert got == exp
    # the 8-clone group + its near-dup form one cluster repped by doc 0
    assert {(i, 0) for i in range(8)} <= got
    assert (100, 0) in got
    # short clones never shingle → never cluster
    assert not any(n_ in (300, 301) for n_, _ in got)


def test_duplicate_clusters_clone_group_without_cross_pairs(spark):
    """A clone group with no near-dup partner still clusters (its members
    pair with each other in the uncollapsed view) — without any pair list
    being materialized."""
    body = " ".join(f"tok{i}" for i in range(12))
    df = spark.createDataFrame(
        [(i, body) for i in range(4)]
        + [(50, "completely different content on an unrelated topic entirely")],
        "doc_id long, text string",
    )
    got = {
        (r["node"], r["cluster_rep"])
        for r in dedup.duplicate_clusters(df, "doc_id", "text").collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0)}


# ---------------------------------------------------------------------------
# deterministic IVF training sample
# ---------------------------------------------------------------------------

def test_ivf_sample_fraction_repartition_invariance(spark):
    from pysemantic_spark.operators import similarity

    emb = (
        spark.read.parquet(f"{SF001}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(dim=64, k=5, n_centroids=4, n_probe=2, sample_fraction=1.0)
    base = sorted(
        tuple(r)
        for r in similarity.ivf_topk(emb, queries, **kw).collect()
    )
    shuffled = sorted(
        tuple(r)
        for r in similarity.ivf_topk(
            emb.repartition(7), queries, **kw
        ).collect()
    )
    assert base == shuffled


# ---------------------------------------------------------------------------
# converter allowlist
# ---------------------------------------------------------------------------

def test_converter_dotted_path_allowlist(monkeypatch):
    from pysemantic_spark.errors import ParserArgumentError
    from pysemantic_spark.sources import readers

    # package-internal paths resolve (default allowlist)
    fn = readers.resolve_converter(
        "pysemantic_spark.sources.readers:normalize_ws"
    )
    assert fn is readers.normalize_ws
    # arbitrary stdlib import paths are rejected
    with pytest.raises(ParserArgumentError, match="allowlist"):
        readers.resolve_converter("os:system")
    with pytest.raises(ParserArgumentError, match="allowlist"):
        readers.resolve_converter("subprocess:run")
    # explicit env opt-in unlocks a prefix
    monkeypatch.setenv("PYSEMANTIC_SPARK_CONVERTER_MODULES", "math")
    import math

    assert readers.resolve_converter("math:sqrt") is math.sqrt


# ---------------------------------------------------------------------------
# exact-top-k memo invalidation key
# ---------------------------------------------------------------------------

def test_source_fingerprint_tracks_mtime_and_size(tmp_path):
    import __spark_entry__ as entrymod

    p = tmp_path / "embeddings.parquet"
    p.mkdir()
    f = p / "part-0.parquet"
    f.write_bytes(b"aaaa")
    fp1 = entrymod._source_fingerprint(str(tmp_path), "embeddings")
    f.write_bytes(b"bbbbbb")
    os.utime(f, (1, 1))
    fp2 = entrymod._source_fingerprint(str(tmp_path), "embeddings")
    assert fp1 != fp2
