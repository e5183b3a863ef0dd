"""F4 activity fixture parity (datetime dtype, regex, df-level dedup, nrows)
+ a hypothesis property: for arbitrary rule sets, the fused Spark runner's
survivors equal the pandas oracle's survivors."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pysemantic_spark.fixtures import activity_pdf, pandas_oracle
from pysemantic_spark.operators.runner import validate
from pysemantic_spark.spec import DatasetSpec


def test_activity_datetime_and_dedup(spark, tmp_path):
    pdf = activity_pdf(500)
    pdf_with_dups = pd.concat([pdf, pdf.head(20)], ignore_index=True)
    csv = tmp_path / "activity.tsv"
    pdf_with_dups.to_csv(csv, sep="\t", index=False)
    spec = DatasetSpec.from_dict(
        "activity",
        {
            "path": str(csv),
            "format": "tsv",
            "dtypes": {
                "sequence_name": "str", "tag": "str", "date": "datetime",
                "x": "float", "y": "float", "z": "float", "activity": "str",
            },
            "drop_duplicates": True,
            "column_rules": {
                "sequence_name": {"regex": "^[A-E]0[0-9]$"},
                "date": {"min": "2026-01-01 00:00:00"},
            },
        },
    )
    from pysemantic_spark.sources.readers import load_dataset

    df = load_dataset(spark, spec)
    assert dict(df.dtypes)["date"] == "timestamp"
    res = validate(spark, df, spec)
    # df-level dedup removed the 20 re-appended rows before rule evaluation
    assert res.flagged.count() == 500
    counts = {r["check_name"]: r["n_violations"] for r in res.check_counts.collect()}
    assert counts["regex:sequence_name"] == 0
    assert counts["min:date"] == 0
    # nrows limit honored at scan
    spec_n = DatasetSpec.from_dict("a2", {"path": str(csv), "format": "tsv", "nrows": 50})
    assert load_dataset(spark, spec_n).count() == 50


_rule_strategy = st.fixed_dictionaries(
    {},
    optional={
        "min": st.integers(min_value=-5, max_value=5),
        "max": st.integers(min_value=6, max_value=20),
        "is_drop_na": st.booleans(),
        "exclude": st.lists(
            st.integers(min_value=-5, max_value=20), min_size=1, max_size=3
        ),
    },
)

_STR_VALUES = ["alpha", "beta", "gamma", "Delta-9", "x y", ""]
_str_rule_strategy = st.fixed_dictionaries(
    {},
    optional={
        "is_drop_na": st.booleans(),
        "regex": st.sampled_from(["^a", "a", "[a-z]+$", "^$", "delta", "-"]),
        "unique_values": st.lists(
            st.sampled_from(_STR_VALUES), min_size=1, max_size=4, unique=True
        ),
        "exclude": st.lists(
            st.sampled_from(_STR_VALUES), min_size=1, max_size=2, unique=True
        ),
    },
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rules=_rule_strategy,
    values=st.lists(
        st.one_of(st.none(), st.integers(min_value=-10, max_value=25)),
        min_size=5,
        max_size=40,
    ),
)
def test_fused_runner_equals_pandas_oracle(spark, rules, values):
    pdf = pd.DataFrame({"k": range(len(values)), "v": pd.array(values, dtype="Int64")})
    spec = DatasetSpec.from_dict("p", {"column_rules": {"v": rules}})
    res = validate(spark, spark.createDataFrame(pdf), spec)
    got = sorted(r["k"] for r in res.clean.select("k").collect())
    oracle = pandas_oracle(pdf, spec, {})
    exp = sorted(oracle["clean"]["k"].tolist())
    assert got == exp


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rules=_str_rule_strategy,
    values=st.lists(
        st.one_of(st.none(), st.sampled_from(_STR_VALUES)), min_size=4, max_size=30
    ),
)
def test_string_rules_equal_pandas_oracle(spark, rules, values):
    """regex / levels / exclude / null over arbitrary string data match the
    pandas re-statement (rlike ≡ re.search semantics)."""
    pdf = pd.DataFrame({"k": range(len(values)), "s": pd.array(values, dtype="object")})
    spec = DatasetSpec.from_dict("p", {"column_rules": {"s": rules}})
    res = validate(spark, spark.createDataFrame(pdf), spec)
    got = sorted(r["k"] for r in res.clean.select("k").collect())
    exp = sorted(pandas_oracle(pdf, spec, {})["clean"]["k"].tolist())
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=60),
    dim=st.integers(min_value=2, max_value=24),
    n_blocks=st.integers(min_value=1, max_value=9),
    thr=st.floats(min_value=-0.5, max_value=0.99),
    seed=st.integers(min_value=0, max_value=2**20),
)
def test_cosine_pairs_exact_property(spark, n, dim, n_blocks, thr, seed):
    """Blocked-GEMM all-pairs equals the numpy O(n^2) oracle for ANY
    (n, dim, block count, threshold): same pair set, same round-6 cosines.
    The operator thresholds the ROUND-6 value (round-4 boundary-robustness
    change), so the oracle applies the identical rounding."""
    import numpy as np
    import pandas as pd

    from pysemantic_spark.operators import similarity

    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(n), "embedding": [list(map(float, v)) for v in vecs]}
        )
    )
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    g = vn @ vn.T
    exact = {
        (i, j): float(np.round(g[i, j], 6))
        for i in range(n)
        for j in range(i + 1, n)
        if np.round(g[i, j], 6) >= thr
    }
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.cosine_pairs_exact(
            df, threshold=thr, n_blocks=n_blocks
        ).collect()
    }
    assert got.keys() == exact.keys()
    for k_, v in got.items():
        assert v == exact[k_]


@settings(max_examples=6, deadline=None)
@given(
    n_docs=st.integers(min_value=4, max_value=25),
    vocab=st.integers(min_value=8, max_value=40),
    doc_len=st.integers(min_value=4, max_value=25),
    thr=st.floats(min_value=0.2, max_value=0.95),
    seed=st.integers(min_value=0, max_value=2**20),
)
def test_ngram_prefix_path_equals_counting_path(
    spark, n_docs, vocab, doc_len, thr, seed
):
    """The PPJoin prefix path (prefix index + length + positional filters +
    array-intersect verify) and the counting path (full inverted-index
    aggregation) are independent exact plans — for ANY corpus shape and
    threshold they must emit the identical pair set with identical round-6
    jaccards. Mixed doc lengths specifically exercise the length filter;
    planted near-dups exercise the positional filter at the boundary."""
    import random as _random

    import pandas as pd

    from pysemantic_spark.operators import dedup
    from pysemantic_spark.operators.cache import tracked_intermediates

    rng = _random.Random(seed)
    docs = []
    for i in range(n_docs):
        L = rng.randint(2, doc_len)
        toks = [f"w{rng.randrange(vocab)}" for _ in range(L)]
        docs.append((i, " ".join(toks)))
        if rng.random() < 0.4:  # near-dup with a small edit (often size±1)
            mut = list(toks)
            if rng.random() < 0.5 and len(mut) > 2:
                mut.pop(rng.randrange(len(mut)))
            else:
                mut.append(f"w{rng.randrange(vocab)}")
            docs.append((1000 + i, " ".join(mut)))
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    with tracked_intermediates():
        prefix = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", n=2, threshold=thr, prefix_filter=True
            ).collect()
        }
        counting = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", n=2, threshold=thr, prefix_filter=False
            ).collect()
        }
    assert prefix == counting
