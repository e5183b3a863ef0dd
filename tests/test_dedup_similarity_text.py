"""Dedup family, similarity search, and text functions vs small oracles."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pysemantic_spark.functions import text as tx
from pysemantic_spark.operators import dedup, similarity

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),      # near-dup of 0
    (2, "completely different content about spark engines"),
    (3, "the quick brown fox jumps over the lazy dog"),      # exact dup of 0
    (4, "spark engines process completely different content"),
    (5, ""),                                                  # degenerate
    (6, "tiny"),
]


def _jaccard(a: str, b: str, n: int = 2) -> float:
    def sh(t):
        toks = t.split()
        return set(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B) if A | B else 0.0


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_exact_duplicates(spark, docs_df):
    got = dedup.exact_duplicates(docs_df, ["text"]).collect()
    assert len(got) == 1 and got[0]["dup_count"] == 2


def test_fingerprint_duplicates_whitespace_insensitive(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["A  b\tc", "a b c"]})
    )
    got = dedup.text_fingerprint_duplicates(df, "doc_id", "text").collect()
    assert len(got) == 1 and got[0]["ids"] == [1, 2]


def test_ngram_jaccard_matches_python_oracle(spark, docs_df):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs_df, "doc_id", "text", n=2, threshold=0.3
        ).collect()
    }
    exp = {}
    for (i, a), (j, b) in itertools.combinations(DOCS, 2):
        jc = _jaccard(a, b, 2)
        if jc >= 0.3:
            exp[(i, j)] = round(jc, 6)
    assert got == exp


def test_minhash_lsh_finds_near_dups(spark, docs_df):
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs_df, "doc_id", "text", n=2, num_hashes=64, bands=32, threshold=0.3
        ).collect()
    }
    assert (0, 3) in got  # exact dup always collides
    assert (0, 1) in got  # near dup (j≈0.78)
    assert all(_jaccard(DOCS[a][1], DOCS[b][1], 2) >= 0.3 for a, b in got)


def test_simhash_exact_dup_zero_hamming(spark, docs_df):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dup_pairs(
            docs_df, "doc_id", "text", max_hamming=10
        ).collect()
    }
    assert got.get((0, 3)) == 0
    assert (0, 2) not in got  # dissimilar docs far apart


def test_keep_first_deterministic(spark):
    pdf = pd.DataFrame(
        {"k": [1, 1, 2], "ord": [5, 3, 9], "v": ["late", "early", "solo"]}
    )
    df = spark.createDataFrame(pdf)
    got = dedup.exact_dedup_keep_first(df, ["k"], ["ord"]).orderBy("k").collect()
    assert [r["v"] for r in got] == ["early", "solo"]


# --- similarity -------------------------------------------------------------

@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 8)).astype(float)
    vecs[7] = vecs[0] * 2.0           # same direction as 0 → cosine 1
    vecs[9] = -vecs[0]                # opposite
    pdf = pd.DataFrame(
        {"vec_id": range(50), "embedding": [list(map(float, v)) for v in vecs]}
    )
    return spark.createDataFrame(pdf), vecs


def test_cosine_topk_exact(spark, emb_df):
    df, vecs = emb_df
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.cosine_topk(df, queries, k=3).collect()
    # oracle: numpy cosine
    q = vecs[0]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = sorted(range(50), key=lambda i: (-round(cos[i], 6), i))[:3]
    assert [r["vec_id"] for r in got] == order
    assert got[0]["cos_sim"] == 1.0 and {r["vec_id"] for r in got} >= {0, 7}


def test_lsh_topk_subset_of_bucket(spark, emb_df):
    df, vecs = emb_df
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.lsh_bucketed_topk(df, queries, dim=8, k=5, n_planes=4).collect()
    assert 0 in {r["vec_id"] for r in got}  # identical vector same bucket
    assert all(r["cos_sim"] <= 1.000001 for r in got)


def test_lsh_topk_multiprobe_recall_dominates_single(spark, emb_df):
    """Multi-probe candidates are a superset of the exact-bucket ones, so
    for every query each rank's cos_sim is >= the single-probe result; and
    against the exact brute-force top-k the multi-probe recall must be at
    least the single-probe recall."""
    df, _ = emb_df
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def sims(n_probe_bits):
        rows = similarity.lsh_bucketed_topk(
            df, queries, dim=8, k=5, n_planes=4, n_probe_bits=n_probe_bits
        ).collect()
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(r["cos_sim"])
        return {q: sorted(v, reverse=True) for q, v in out.items()}

    single, multi = sims(0), sims(1)
    for q, m in multi.items():
        s_ = single.get(q, [])
        assert len(m) >= len(s_)
        for rank, sim in enumerate(s_):
            assert m[rank] >= sim - 1e-9, (q, rank)


def test_embedding_near_dup_pairs(spark, emb_df):
    df, _ = emb_df
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.embedding_near_dup_pairs(
            df, dim=8, threshold=0.999, n_planes=4
        ).collect()
    }
    assert got.get((0, 7)) == 1.0
    assert (0, 9) not in got


def test_embedding_near_dup_multi_table_recall(spark):
    """Multi-table LSH must recover the recall a single sign-LSH table
    loses at moderate thresholds: at cos 0.5 one 6-plane table collides
    with p = (2/3)^6 ≈ 0.088, while 24 tables give 1-(1-p)^24 ≈ 0.89.
    Built per-pair: 120 planted pairs at ~55-60 deg (cos ~0.52-0.57)."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    n_pairs, dim = 120, 16
    for i in range(n_pairs):
        a = rng.standard_normal(dim)
        a /= np.linalg.norm(a)
        # rotate by an angle giving cos in (0.52, 0.57): still >= 0.5
        o = rng.standard_normal(dim)
        o -= o.dot(a) * a
        o /= np.linalg.norm(o)
        theta = np.arccos(rng.uniform(0.52, 0.57))
        b = np.cos(theta) * a + np.sin(theta) * o
        rows.append((2 * i, [float(x) for x in 10 * a]))
        rows.append((2 * i + 1, [float(x) for x in 10 * b]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def recall(n_tables):
        got = similarity.embedding_near_dup_pairs(
            df, dim=dim, threshold=0.5, n_planes=6, n_tables=n_tables
        ).collect()
        planted = {(r["id_a"], r["id_b"]) for r in got
                   if r["id_b"] == r["id_a"] + 1 and r["id_a"] % 2 == 0}
        return len(planted) / n_pairs

    r1, r24 = recall(1), recall(24)
    assert r1 < 0.35          # single table demonstrably lossy here
    assert r24 > 0.75         # multi-table recovers (E ~ 0.89)
    assert r24 > r1 + 0.3


# --- text functions ----------------------------------------------------------

def test_text_functions(spark):
    pdf = pd.DataFrame(
        {
            "t": [
                "the cat and the dog",
                "",
                "  spaced   out  ",
                "¡¡¡???",
            ]
        }
    )
    df = spark.createDataFrame(pdf)
    got = df.select(
        tx.token_count("t").alias("n"),
        tx.distinct_token_count("t").alias("d"),
        F.round(tx.punct_ratio("t"), 4).alias("p"),
        tx.lang_id("t").alias("lang"),
        tx.fingerprint("t").alias("fp"),
    ).collect()
    assert [r["n"] for r in got] == [5, 0, 2, 1]
    assert [r["d"] for r in got] == [4, 0, 2, 1]
    assert got[0]["lang"] == "en"
    assert got[1]["lang"] == "und"
    assert got[3]["p"] == 1.0
    import hashlib

    assert got[0]["fp"] == hashlib.md5(b"the cat and the dog").hexdigest()
    assert got[2]["fp"] == hashlib.md5(b"spaced out").hexdigest()


def test_quality_score_ordering(spark):
    pdf = pd.DataFrame(
        {
            "t": [
                "the quick brown fox is a fine and healthy animal of the forest",
                "!!!! ???? @@@@ ####",
            ]
        }
    )
    df = spark.createDataFrame(pdf)
    got = [r[0] for r in df.select(tx.quality_score("t")).collect()]
    assert got[0] > got[1]
    assert 0.0 <= got[1] <= got[0] <= 1.0


def test_ivf_topk_finds_identical_vector(spark, emb_df):
    df, vecs = emb_df
    queries = df.filter(F.col("vec_id").isin(0, 5)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.ivf_topk(df, queries, dim=8, k=3, n_centroids=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cos_sim"]))
    # each query's own vector is in its cluster → rank 1 with cos 1.0
    assert by_q[0][0] == (0, 1.0)
    assert by_q[5][0] == (5, 1.0)
    # vec 7 = 2*vec0 has identical direction → same cluster region, found
    assert any(v == 7 for v, _ in by_q[0])


def test_cosine_pairs_exact_matches_numpy(spark, emb_df):
    """Blocked-GEMM all-pairs equals the O(n^2) numpy oracle exactly —
    same pair set, same cosines (to 6dp), across block-boundary splits."""
    df, vecs = emb_df
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    g = vn @ vn.T
    for thr in (0.5, 0.9):
        exact = {
            (i, j): round(float(g[i, j]), 6)
            for i in range(len(vecs))
            for j in range(i + 1, len(vecs))
            if g[i, j] >= thr
        }
        for n_blocks in (1, 7):
            got = {
                (r["id_a"], r["id_b"]): r["cos_sim"]
                for r in similarity.cosine_pairs_exact(
                    df, threshold=thr, n_blocks=n_blocks
                ).collect()
            }
            assert got.keys() == exact.keys(), (thr, n_blocks)
            for k_, v in got.items():
                assert v == pytest.approx(exact[k_], abs=2e-6)


def test_cosine_arrow_matches_interpreted(spark, emb_df):
    df, vecs = emb_df
    pairs = df.alias("a").crossJoin(df.alias("b")).filter(
        F.col("a.vec_id") < F.col("b.vec_id")
    ).limit(200)
    got = pairs.select(
        similarity.cosine_arrow(F.col("a.embedding"), F.col("b.embedding")).alias("ca"),
        similarity.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("ci"),
    ).collect()
    assert len(got) == 200
    for r in got:
        assert r["ca"] == pytest.approx(r["ci"], abs=1e-9)


def test_near_dup_multiprobe_recall_dominates(spark):
    """1-bit multi-probe candidates per table are a strict superset of the
    exact-bucket candidates, so recall at equal tables can only rise."""
    rng = np.random.default_rng(11)
    rows = []
    n_pairs, dim = 80, 16
    for i in range(n_pairs):
        a = rng.standard_normal(dim); a /= np.linalg.norm(a)
        o = rng.standard_normal(dim); o -= o.dot(a) * a; o /= np.linalg.norm(o)
        theta = np.arccos(rng.uniform(0.52, 0.57))
        b = np.cos(theta) * a + np.sin(theta) * o
        rows.append((2 * i, [float(x) for x in a]))
        rows.append((2 * i + 1, [float(x) for x in b]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def recall(n_probe_bits, n_tables):
        got = similarity.embedding_near_dup_pairs(
            df, dim=dim, threshold=0.5, n_planes=8,
            n_tables=n_tables, n_probe_bits=n_probe_bits,
        ).collect()
        planted = {(r["id_a"], r["id_b"]) for r in got
                   if r["id_b"] == r["id_a"] + 1 and r["id_a"] % 2 == 0}
        return len(planted) / n_pairs

    r0, r1 = recall(0, 6), recall(1, 6)
    assert r1 >= r0
    assert r1 > 0.5  # p = q^8 + 8 q^7 (1-q) ~ 0.25/table at cos .52 -> E[r1@6] ~ .82


def test_lsh_topk_multi_table_recall_dominates_single(spark, emb_df):
    """n_tables=L candidates ⊇ table-0 candidates (table 0 uses the same
    seed), so per-rank cos_sim can only improve."""
    df, _ = emb_df
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def sims(n_tables):
        rows = similarity.lsh_bucketed_topk(
            df, queries, dim=8, k=5, n_planes=4, n_probe_bits=1,
            n_tables=n_tables,
        ).collect()
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(r["cos_sim"])
        return {q: sorted(v, reverse=True) for q, v in out.items()}

    single, multi = sims(1), sims(8)
    for q, m in multi.items():
        s_ = single.get(q, [])
        assert len(m) >= len(s_)
        for rank, sim in enumerate(s_):
            assert m[rank] >= sim - 1e-9, (q, rank)


def test_ivf_nprobe_recall_dominates(spark, emb_df):
    """n_probe=3 candidate clusters ⊇ n_probe=1's nearest cluster, so each
    rank's cos_sim can only improve; self-vector is always found."""
    df, _ = emb_df
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def sims(n_probe):
        rows = similarity.ivf_topk(
            df, queries, dim=8, k=5, n_centroids=4, n_probe=n_probe
        ).collect()
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(r["cos_sim"])
        return {q: sorted(v, reverse=True) for q, v in out.items()}

    p1, p3 = sims(1), sims(3)
    for q, m in p3.items():
        s_ = p1.get(q, [])
        assert len(m) >= len(s_)
        for rank, sim in enumerate(s_):
            assert m[rank] >= sim - 1e-9, (q, rank)
        assert m[0] == pytest.approx(1.0)  # self always in own cluster


def test_simhash_banding_exhaustive_at_radius(spark):
    """n_bands = max_hamming+1 makes banding exhaustive by pigeonhole: the
    banded pair set must EQUAL the brute-force hamming-<=r pair set of the
    fingerprints (round-2 VERDICT #7)."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                f"alpha beta gamma delta {i % 5} epsilon zeta eta theta"
                for i in range(40)
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    r = 8
    fps = {
        row["_id"]: row["simhash"]
        for row in dedup.simhash_fingerprints(
            df, "doc_id", "text", n_bands=r + 1
        ).collect()
    }
    mask = (1 << 64) - 1  # fingerprints are signed 64-bit longs
    exact = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin((fps[a] ^ fps[b]) & mask).count("1") <= r
    }
    got = {
        (row["id_a"], row["id_b"])
        for row in dedup.simhash_near_dup_pairs(
            df, "doc_id", "text", max_hamming=r
        ).collect()
    }
    assert got == exact and len(exact) > 0


def test_simhash_portable_hash_matches_duckdb(spark):
    """The portable 60-bit md5 token hash must be byte-identical in DuckDB
    (the cross-engine verification contract of portable_hash=True)."""
    import duckdb

    texts = ["hello world", "wörld ünïcode", "a b c d e"]
    pdf = pd.DataFrame({"doc_id": range(3), "text": texts})
    spark_fps = {
        r["_id"]: r["simhash"]
        for r in dedup.simhash_fingerprints(
            spark.createDataFrame(pdf), "doc_id", "text", portable_hash=True
        ).collect()
    }
    votes = ", ".join(
        f"sum(case when (hv >> {i}) & 1 = 1 then 1 else -1 end) as v{i}"
        for i in range(60)
    )
    fp = " + ".join(
        f"(case when v{i} > 0 then (1::BIGINT << {i}) else 0 end)"
        for i in range(60)
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    duck_fps = dict(
        con.execute(
            f"""WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(trim(text), '\\s+')) AS t
                FROM docs WHERE trim(text) <> ''),
            h AS (SELECT doc_id, ('0x' || substr(md5(t),1,15))::BIGINT hv FROM tok),
            v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
            SELECT doc_id, {fp} FROM v"""
        ).fetchall()
    )
    assert spark_fps == duck_fps
