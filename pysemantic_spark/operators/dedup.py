"""Deduplication operators for training-data pipelines.

Four families, all shuffle-conscious:

- exact:        hash-groupBy on the dedup key (or md5 fingerprint of text).
- ngram-jaccard: candidate pairs via a shared-shingle self-join (documents
                with no common shingle never meet — no crossJoin), exact
                Jaccard on the candidates.
- MinHash+LSH:  shingle → K minhashes (xxhash64 with per-hash seed mix) →
                band buckets → pairs within buckets → exact-Jaccard verify.
- SimHash:      64-bit token-hash bit-vote fingerprint; near-dup = small
                Hamming distance, candidates via 16-bit band join.

Scale notes (100 TB / 10^9 docs):
- The shingle self-join shuffles on the shingle; ultra-common shingles are
  skew bombs → `max_shingle_freq` drops the top of the DF (standard
  "stop-shingle" trick, same as dropping stopwords in an inverted index).
- MinHash signatures are 8*K bytes/doc — the band join shuffles signatures,
  not text. Exact-verify joins text back only for candidate pairs (a tiny
  fraction), so full text crosses the wire O(candidates), not O(pairs).
"""

from __future__ import annotations

import hashlib
import logging
import re
import warnings

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pysemantic_spark.functions.text import fingerprint, tokens
from pysemantic_spark.operators.cache import materialize as _materialize  # noqa: F401
from pysemantic_spark.operators.cache import release_intermediates  # noqa: F401

_LOG = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# Arrow-vectorized tokenize/shingle/fingerprint projections (round 7).
#
# The JVM expression path for shingling (`_shingles`: split + sequence +
# transform(concat_ws(slice)) + array_distinct) is built from higher-order
# functions, which do NOT whole-stage-codegen — every element is produced
# through the interpreted expression evaluator. Measured at sf1.0 (50k docs,
# 2.6M shingles, 32 cores): 3.1 s for the fused shingle+fingerprint
# projection vs 0.7 s for the same computation done per Arrow batch in
# Python (guide §4.2: hand whole batches to native/vectorized code instead
# of interpreted per-element evaluation). Output is BYTE-IDENTICAL — the
# Python functions below replicate Spark's exact semantics:
#   - F.trim strips SPACES (0x20) only (not Java String.trim's ≤0x20 set)
#   - Java regex \s == Python re.ASCII \s ([ \t\n\x0B\f\r])
#   - split keeps leading/trailing empty tokens (Pattern.split, limit -1);
#     the empty-after-trim string maps to [] via the tokens() when-branch
#   - md5 of the UTF-8 bytes == Spark md5(cast(string as binary))
#   - array_distinct keeps first-occurrence order == dict.fromkeys
# (equivalence: test_arrow_text_kernels_match_jvm + the miners' oracles).
# ---------------------------------------------------------------------------

_JAVA_WS = re.compile(r"\s+", re.ASCII)


def _py_tokens(s: str | None) -> list[str] | None:
    """Exact Python mirror of :func:`pysemantic_spark.functions.text.tokens`."""
    if s is None:
        return None
    st = s.strip(" ")
    if st == "":
        return []
    return _JAVA_WS.split(st)


def _py_shingles(toks: list[str], n: int, joined: str) -> list[str]:
    """Distinct word n-grams as substrings of the space-joined token stream
    (one slice per gram — no per-gram join). ``joined`` must be
    ``" ".join(toks)``."""
    if n == 1:
        return list(dict.fromkeys(toks))
    if len(toks) < n:
        return []
    offs, pos = [], 0
    for tk in toks:
        offs.append(pos)
        pos += len(tk) + 1
    return list(
        dict.fromkeys(
            joined[offs[i] : offs[i + n - 1] + len(toks[i + n - 1])]
            for i in range(len(toks) - n + 1)
        )
    )


_SH_TFP_UDFS: dict[int, object] = {}


def _sh_tfp_arrow(n: int):
    """pandas_udf: text → struct(sh: array<string>, tfp: string) — the
    shingle array and the token-stream md5 in ONE Arrow-batched pass."""
    if n not in _SH_TFP_UDFS:

        @F.pandas_udf("sh array<string>, tfp string")
        def _udf(texts: pd.Series) -> pd.DataFrame:
            shs, fps = [], []
            for s in texts:
                toks = _py_tokens(s)
                if toks is None:
                    # tokens(NULL) is NULL; concat_ws skips the NULL array
                    # (tfp = md5("")). The n≥2 when-chain in _shingles
                    # yields [] on NULL, but the n==1 path is a bare
                    # array_distinct(tok) — NULL in, NULL out.
                    shs.append(None if n == 1 else [])
                    fps.append(hashlib.md5(b"").hexdigest())
                    continue
                joined = " ".join(toks)
                fps.append(hashlib.md5(joined.encode("utf-8")).hexdigest())
                shs.append(_py_shingles(toks, n, joined))
            return pd.DataFrame({"sh": shs, "tfp": fps})

        _SH_TFP_UDFS[n] = _udf
    return _SH_TFP_UDFS[n]


_TOK_TFP_UDF: list = []


def _tok_tfp_arrow(col):
    """pandas_udf: text → struct(tok: array<string>, tfp: string).
    (Created lazily — pandas_udf DDL return types need an active session.)"""
    if not _TOK_TFP_UDF:

        @F.pandas_udf("tok array<string>, tfp string")
        def _udf(texts: pd.Series) -> pd.DataFrame:
            toks_out, fps = [], []
            for s in texts:
                toks = _py_tokens(s)
                toks_out.append(toks)
                joined = " ".join(toks) if toks is not None else ""
                fps.append(hashlib.md5(joined.encode("utf-8")).hexdigest())
            return pd.DataFrame({"tok": toks_out, "tfp": fps})

        _TOK_TFP_UDF.append(_udf)
    return _TOK_TFP_UDF[0](col)


def _shingles_arrow(text_col: str, n: int) -> "F.Column":
    """Arrow-vectorized drop-in for :func:`_shingles` (same arrays)."""
    return _sh_tfp_arrow(n)(F.col(text_col))["sh"]


def exact_duplicates(df: DataFrame, cols: list[str]) -> DataFrame:
    """Groups occurring more than once. Returns cols + dup_count.
    One hash-shuffle on the key; partial agg map-side."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def split_by_dup_keys(
    df: DataFrame, dup_keys: DataFrame, cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """NULL-safe (dup_part, uniq_part) split of ``df`` against a dup-key
    frame. Plain ``on=cols`` equi-joins never match NULL keys, so rows
    whose key columns are NULL would ALL fall into the anti branch and
    survive dedup — silently diverging from window / GROUP BY semantics,
    which group NULL keys together. ``eqNullSafe`` (<=>) keeps the joins
    hash-plannable (Catalyst extracts null-safe equality as an equi-join
    key via coalesce wrapping) while matching NULL = NULL."""
    dk = dup_keys.select(*[F.col(c).alias(f"__dk_{c}") for c in cols])
    cond = None
    for c in cols:
        eq = F.col(c).eqNullSafe(F.col(f"__dk_{c}"))
        cond = eq if cond is None else cond & eq
    return df.join(dk, cond, "left_semi"), df.join(dk, cond, "left_anti")


def keep_first_strategy(
    df: DataFrame,
    cols: list[str],
    split_threshold: float = 0.7,
    n_rows: int | None = None,
    distinct_keys: int | None = None,
) -> str:
    """Pick the keep-first physical plan from one cheap agg: count + an
    approx_count_distinct sketch of the key struct (both map-side
    combinable — a single scan with a tiny shuffle). distinct_keys/rows
    near 1 means almost every row is unique → the dup-split avoids
    shuffling them through the window exchange; near 0 means most rows
    ARE duplicated → the split degenerates (empty anti branch) and pays a
    groupBy + two joins ON TOP of the same full window, measured 10×
    slower than the plain window on an all-duplicate table.

    ``n_rows``/``distinct_keys`` (round-6): feed the decision from stats
    you already have — a resume-manifest row count, table metadata, a
    prior agg — and the extra scan is skipped entirely. At 10¹² rows the
    sizing pass is a whole extra pass over the table; the caller usually
    knows both numbers (approximately is fine — only the ratio vs
    ``split_threshold`` matters)."""
    if n_rows is None or distinct_keys is None:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(F.struct(*cols)).alias("k"),
        ).first()
        n_rows, distinct_keys = row["n"], row["k"]
    return (
        "split"
        if n_rows == 0 or distinct_keys / n_rows >= split_threshold
        else "window"
    )


# Slack subtracted inside every ceil()-based PPJoin prune bound before
# rounding: double arithmetic can land an ulp above a true integer
# (0.2/1.2*18 = 3.0000000000000004), and ceil of that over-tightens an
# "exact" filter into dropping threshold-boundary pairs. 1e-7 is orders of
# magnitude above accumulated double error at any realistic shingle-set
# size and orders below 1, so it can only relax a bound that float error
# had spuriously tightened — extra candidates are removed by the exact
# verify stage.
_EXACT_EPS = 1e-7

def exact_dedup_keep_first(
    df: DataFrame,
    cols: list[str],
    order_by: list[str],
    strategy: str = "auto",
    split_threshold: float = 0.7,
    n_rows: int | None = None,
    distinct_keys: int | None = None,
) -> DataFrame:
    """Keep the first row per key under a deterministic order.

    Three physical plans; ``strategy="auto"`` picks between the first two
    adaptively from the measured (or caller-supplied ``n_rows``/
    ``distinct_keys`` — no extra scan then) distinct-key fraction
    (:func:`keep_first_strategy`):

    - ``"split"`` — semi/anti dup-split (same pattern as the runner's
      clean path, runner.py execute): only keys that actually occur more
      than once enter the window shuffle; unique-key rows (the
      overwhelming majority of any real table) pass through a NULL-safe
      anti-join untouched. At 10^12 rows with <1% duplicate keys a naive
      full-table row_number() would shuffle ~100× more volume — full
      text bodies included — through the window exchange.
    - ``"window"`` — plain row_number() over the whole table: right when
      most keys ARE duplicated, where the split's anti branch is empty
      and its groupBy + joins are pure overhead on top of the same
      window.
    - ``"agg_min"`` (opt-in, round-6) — ``min_by(struct(all columns),
      struct(order_by))`` per key: a plain hash aggregation with FULL
      map-side combine and no sort, so a mega-key (one conversation
      holding 10% of rows — the north_rule skew case) reduces to one
      partial row per map task instead of one reducer sorting 10% of the
      table; measured ~5× faster than the window plan on exactly that
      shape (bench.py skew extras). Equals the window plan whenever
      ``order_by`` is a NON-NULL total order within each key (ties and
      NULL order keys are nondeterministic in BOTH plans; min_by
      additionally ignores rows whose whole order struct is NULL-fielded
      differently than a sort would — don't use it with nullable order
      columns). Column order is preserved.

    NULL keys group together in all plans (window partitioning and
    GROUP BY treat NULLs as one group; the split uses
    :func:`split_by_dup_keys`'s null-safe joins), so duplicate NULL-key
    rows dedup to one survivor either way."""
    if strategy == "auto":
        strategy = keep_first_strategy(
            df, cols, split_threshold, n_rows=n_rows, distinct_keys=distinct_keys
        )
    if strategy not in ("split", "window", "agg_min"):
        raise ValueError(f"unknown keep-first strategy {strategy!r}")
    if strategy == "agg_min":
        payload = F.struct(*[F.col(c) for c in df.columns])
        ordk = F.struct(*[F.col(c) for c in order_by])
        return (
            df.groupBy(*cols)
            .agg(F.min_by(payload, ordk).alias("_row"))
            .select("_row.*")
        )
    w = Window.partitionBy(*cols).orderBy(*[F.col(c) for c in order_by])
    if strategy == "window":
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    dup_keys = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select(*cols)
    )
    dup_part, uniq_part = split_by_dup_keys(df, dup_keys, cols)
    dup_kept = (
        dup_part.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return uniq_part.unionByName(dup_kept)


def text_fingerprint_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact near-whitespace dedup: md5(normalized text) groups > 1.
    Returns fingerprint, dup_count, doc_ids (sorted array)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def _shingles(text_col: str, n: int) -> "F.Column":
    """Distinct word n-gram shingles of the whitespace-token stream."""
    tok = tokens(text_col)
    if n == 1:
        return F.array_distinct(tok)
    idx = F.sequence(F.lit(0), F.size(tok) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n))
    )
    return F.when(F.size(tok) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_prefix_index(
    inv: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """AllPairs/PPJoin prefix index (Bayardo et al. 2007, exact-recall).

    Under ANY global total order on shingles, two sets with
    Jaccard ≥ t MUST share at least one shingle among each set's first
    ``|x| − ⌈t·|x|⌉ + 1`` shingles — so only those prefix shingles need
    to enter the inverted index for candidate generation. We order by
    ascending document frequency (rarest first, ties by shingle string):
    correct for any order, and frequency-ascending pushes the ubiquitous
    shingles OUT of every prefix, which is what stops candidate growth
    at low thresholds — the skewiest join keys simply never appear.

    ``inv`` = (_id, shingle) exploded rows; ``sizes`` = (_id, _size) FULL
    distinct-shingle counts (prefix length must use the full set size
    even if the caller pre-filtered ``inv``). Returns each doc's prefix
    as (_id, shingle, _rn, _size) — rank and full size ride along so the
    candidate join can apply the PPJoin positional filter."""
    freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
    ranked = (
        inv.join(freq, "shingle")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_id").orderBy("_f", "shingle")
            ),
        )
    )
    # _EXACT_EPS inside the ceil: t·|x| computed in doubles can land an
    # ulp ABOVE its true integer value (0.2*15 = 3.0000000000000004), which
    # would shorten the prefix below the exact-recall bound and silently
    # drop boundary pairs. Subtracting the epsilon can only lengthen the
    # prefix (looser, still exact); it is far above double error (~1e-10
    # at realistic set sizes) and far below any legitimate non-integer gap
    # the filter should respect.
    plen = (
        F.col("_size")
        - F.ceil(F.lit(float(threshold)) * F.col("_size") - F.lit(_EXACT_EPS))
        + 1
    )
    return (
        ranked.join(sizes, "_id")
        .filter(F.col("_rn") <= plen)
        .select("_id", "shingle", "_rn", "_size")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_freq: int | None = None,
    prefix_filter: bool | None = None,
    collapse_identical: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.

    ``collapse_identical`` (default on) pre-collapses identical token
    streams to one representative and expands pairs back afterwards —
    the same lossless band/index skew guard as the MinHash/SimHash
    miners (:func:`collapse_identical_docs`): m byte-identical docs
    share EVERY (prefix) shingle, so uncollapsed they are O(m²)
    candidate pairs on every shared index key; collapsed they are one
    rep. For identical docs whose every common shingle exceeds a
    ``max_shingle_freq`` stop-cap this is strictly MORE complete than
    uncollapsed mining (the cap could previously drop such a pair — the
    documented lossy corner of the counting path); intra-group pairs
    carry jaccard 1.0 by construction.

    Two exact plans, chosen by the threshold (``prefix_filter=None``,
    the default, picks automatically; True/False force):

    - **Prefix path** (selective thresholds, auto when t ≥ 0.35 —
      AllPairs/PPJoin): only each doc's first ⌈(1−t)·|g|⌉+1 shingles in
      global rarity order enter the index (:func:`ngram_prefix_index`,
      exact-recall by construction) → distinct candidate pairs → exact
      verify via ``array_intersect`` on the full shingle arrays. The
      most frequent shingles — the quadratic join keys — never enter
      any prefix, so candidates stop scaling with the common-shingle
      tail. Per-candidate verify costs O(|g|), which is why this path
      needs a selective threshold: few candidates, each verified once.
    - **Counting path** (low thresholds): full-index self-join counts
      shared shingles per pair in one shuffle aggregation (no per-pair
      array work), then Jaccard from the counts. At t ≈ 0.1 the prefix
      keeps ~90% of the index AND candidates are plentiful — measured
      3× slower than counting at sf0.1 — so counting wins below the
      crossover; its skew guard is the ``max_shingle_freq`` stop-cap
      (documented LOSSY: pairs whose every common shingle is capped are
      missed; the prefix path needs no cap to be exact).

    No crossJoin in either plan."""
    if collapse_identical:
        sh_full, groups, clones, small = _fused_shingle_collapse(
            df, id_col, text_col, n
        )
        if not clones:  # no clones anywhere: mine everything, no expansion
            return _ngram_pairs_on_shingles(
                sh_full.drop("_tfp"), threshold, max_shingle_freq, prefix_filter
            )
        rep_pairs = _ngram_pairs_on_shingles(
            _rep_rows(sh_full, groups),
            threshold,
            max_shingle_freq,
            prefix_filter,
        )
        members_multi, mined = _multi_members_and_mined(sh_full, groups)
        return _expand_pairs_multi(
            rep_pairs, members_multi, mined, "jaccard", 1.0, small
        )
    sh = _materialize(
        df.select(F.col(id_col).alias("_id"), _shingles_arrow(text_col, n).alias("_sh"))
        .withColumn("_size", F.size("_sh"))
    )
    return _ngram_pairs_on_shingles(sh, threshold, max_shingle_freq, prefix_filter)


def _ngram_pairs_on_shingles(
    sh: DataFrame,
    threshold: float,
    max_shingle_freq: int | None = None,
    prefix_filter: bool | None = None,
) -> DataFrame:
    """The two exact mining plans of :func:`ngram_jaccard_pairs`, over a
    prepared (materialized) ``(_id, _sh, _size)`` shingle frame — shared
    by the collapse-on path (which feeds it the representative rows of
    the fused shingle+fingerprint scan) and the collapse-off path."""
    if prefix_filter is None:
        prefix_filter = threshold >= 0.35
    sizes = sh.select("_id", "_size")
    inv = sh.select("_id", F.explode("_sh").alias("shingle"))
    if max_shingle_freq is not None:
        freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
        inv = inv.join(
            F.broadcast(freq.filter(F.col("_f") > max_shingle_freq).select("shingle")),
            "shingle",
            "left_anti",
        )
    if prefix_filter:
        # materialized: the self-join references the index TWICE — without
        # persist the whole index construction (frequency agg + rarity
        # row_number window) is computed once per side (round-7 plan audit:
        # two full Window+SortMergeJoin subtrees in the before-plan)
        #
        # The self-join key is xxhash64(shingle), not the shingle string
        # (round 7): the join compares/shuffles 8-byte longs instead of
        # ~20-byte strings. A hash collision can only ADD a candidate pair,
        # and every candidate is exact-verified below, so the output set is
        # unchanged.
        pref = _materialize(
            ngram_prefix_index(inv, sizes, threshold).select(
                "_id", F.xxhash64("shingle").alias("_shk"), "_rn", "_size"
            )
        )
        a, b = pref.alias("a"), pref.alias("b")
        t = F.lit(float(threshold))
        # PPJoin pruning at candidate generation, both EXACT for J ≥ t:
        # length filter — J ≥ t ⟹ t·|x| ≤ |y| ≤ |x|/t; positional
        # filter — at the first common prefix shingle (positions i, j in
        # rarity order) every one of the α required common shingles ranks
        # no earlier in either doc, so 1 + min(|x|−i, |y|−j) ≥
        # α = ⌈t/(1+t)·(|x|+|y|)⌉ must hold there; a qualifying pair
        # always survives at that occurrence, so keeping pairs with ≥1
        # surviving occurrence loses nothing.
        # all three prune bounds subtract _EXACT_EPS inside the ceil: the
        # float product can land an ulp above its true integer value
        # (measured: 0.2/1.2·18 = 3.0000000000000004 → ceil 4, pruning a
        # true boundary pair with overlap 3 and jaccard exactly 0.2); the
        # epsilon only ever LOOSENS pruning, and the exact array_intersect
        # verify below removes any extra candidates it admits.
        alpha = F.ceil(
            t / (t + F.lit(1.0)) * (F.col("a._size") + F.col("b._size"))
            - F.lit(_EXACT_EPS)
        )
        cand = (
            a.join(b, on="_shk")
            .filter(F.col("a._id") < F.col("b._id"))
            .filter(
                (
                    F.col("b._size")
                    >= F.ceil(t * F.col("a._size") - F.lit(_EXACT_EPS))
                )
                & (
                    F.col("a._size")
                    >= F.ceil(t * F.col("b._size") - F.lit(_EXACT_EPS))
                )
            )
            .filter(
                F.lit(1)
                + F.least(
                    F.col("a._size") - F.col("a._rn"),
                    F.col("b._size") - F.col("b._rn"),
                )
                >= alpha
            )
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        )
        # Verification in two stages (round 7). The exact per-candidate
        # string array_intersect was the measured wall (~15 s of the 21 s
        # query at sf1.0: 17M candidates × a hash-set build over ~53
        # strings each). Stage 1 — a LOOSENED EXACT pre-filter on 64-bit
        # hashed shingle arrays: longs intersect ~4× cheaper than strings
        # and halve the attach-join payload. Hash collisions distort the
        # hashed intersection in two ways, both handled: a cross-doc
        # collision can only INFLATE it (extra survivors, removed by stage
        # 2); two TRUE common shingles colliding can DEFLATE it — but only
        # by as many slots as collide within a doc's own array, which is
        # exactly `_size − size(array_distinct(hashed))` per doc, so adding
        # both docs' collision counts to the hashed intersection restores a
        # provable upper bound on the true overlap. A qualifying pair
        # (true overlap ≥ α) therefore always passes. Stage 2 — the exact
        # string verify, now over the handful of survivors. The candidate
        # stream is no longer distinct()ed first (one fewer full exchange);
        # the post-filter distinct dedups the tiny survivor set instead.
        hsets = _materialize(
            sh.select(
                "_id",
                F.size("_sh").alias("_hsz"),
                F.transform("_sh", lambda s: F.xxhash64(s)).alias("_shh"),
            ).withColumn(
                "_hdup", F.col("_hsz") - F.size(F.array_distinct("_shh"))
            )
        )
        # (join strategy left to the planner here: a forced shuffle_hash
        # was measured ~1.5× SLOWER than the default on this occurrence-
        # stream attach — unlike the minhash verify below, where it wins)
        ha = hsets.select(
            F.col("_id").alias("id_a"),
            F.col("_shh").alias("hh_a"),
            F.col("_hsz").alias("sz_a"),
            F.col("_hdup").alias("dup_a"),
        )
        hb = hsets.select(
            F.col("_id").alias("id_b"),
            F.col("_shh").alias("hh_b"),
            F.col("_hsz").alias("sz_b"),
            F.col("_hdup").alias("dup_b"),
        )
        alpha_pair = F.ceil(
            t / (t + F.lit(1.0)) * (F.col("sz_a") + F.col("sz_b"))
            - F.lit(_EXACT_EPS)
        )
        survivors = (
            cand.join(ha, "id_a")
            .join(hb, "id_b")
            .filter(
                F.size(F.array_intersect("hh_a", "hh_b"))
                + F.col("dup_a")
                + F.col("dup_b")
                >= alpha_pair
            )
            .select("id_a", "id_b")
            .distinct()
        )
        shingle_sets = sh.select("_id", "_sh")
        return (
            survivors.join(
                shingle_sets.withColumnsRenamed({"_id": "id_a", "_sh": "sh_a"}), "id_a"
            )
            .join(
                shingle_sets.withColumnsRenamed({"_id": "id_b", "_sh": "sh_b"}), "id_b"
            )
            .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn(
                "_j",
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
            )
            .filter(F.col("_j") >= threshold)
            .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
        )
    a, b = inv.alias("a"), inv.alias("b")
    pairs = (
        a.join(b, on="shingle")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnsRenamed({"_id": "id_a", "_size": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"_id": "id_b", "_size": "size_b"}), "id_b")
        .withColumn(
            "_j",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("_j") >= threshold)
        .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
    )


def token_stream_key(text_col: str) -> "F.Column":
    """md5 of the space-joined whitespace-token stream. Tokens contain no
    whitespace (they're split on it), so the joined string — and the key —
    is an INJECTIVE function of the token sequence: equal keys ⟺ equal
    token streams ⟺ equal shingle sets, minhash signatures, AND simhash
    fingerprints. NOT :func:`fingerprint` (that lowercases; minhash/
    simhash are case-sensitive)."""
    return F.md5(F.concat_ws(" ", tokens(text_col)))


def collapse_identical_docs(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Band-bucket skew guard for pair mining: collapse docs with
    identical token streams to ONE representative (min id) each.

    m byte-identical documents (dead-common at crawl scale: boilerplate,
    mirrored pages, retry dupes) land in the SAME band bucket of EVERY
    MinHash/SimHash band, generating O(m²) candidate pairs per band
    before any verification — the first thing that falls over at 10⁹
    docs. Mining representatives makes that O(reps²) where all m
    identical docs contribute 1 rep; the dropped pairs are recovered
    EXACTLY afterwards by :func:`expand_collapsed_pairs` (identical token
    streams ⟹ jaccard 1.0 / hamming 0 with each other, and the same
    score as their rep against everything else), so the guard is
    lossless, not a capped truncation.

    Returns (rep_df, members): ``rep_df`` = the representative rows of
    ``df`` (original columns), ``members`` = (_id, _rep) for every doc."""
    keyed = _materialize(
        df.select(F.col(id_col), F.col(text_col)).withColumn(
            "_tfp", token_stream_key(text_col)
        )
    )
    reps = keyed.groupBy("_tfp").agg(F.min(id_col).alias("_rep"))
    members = keyed.join(reps, "_tfp").select(
        F.col(id_col).alias("_id"), "_rep"
    )
    rep_df = keyed.drop("_tfp").join(
        reps.select(F.col("_rep").alias(id_col)), id_col, "left_semi"
    )
    return rep_df, members


def expand_collapsed_pairs(
    rep_pairs: DataFrame,
    members: DataFrame,
    mined_reps: DataFrame,
    score_col: str | None,
    identical_score,
) -> DataFrame:
    """Expand representative-level pairs back to all-document pairs.

    - cross-group: each (rep_a, rep_b, score) pair expands to every
      (member_a, member_b) with the SAME score (identical token streams
      score identically against any third doc).
    - intra-group: all pairs within a multi-member group, scored
      ``identical_score`` (jaccard 1.0 / hamming 0) — but only for
      groups whose rep is in ``mined_reps`` (reps that actually produced
      a signature/fingerprint row; empty-token or sub-shingle-length
      docs never mine and must not pair, matching uncollapsed
      behavior).

    Output ids re-canonicalized to id_a < id_b."""
    score = [F.col(score_col)] if score_col else []
    ma = members.select(F.col("_rep").alias("id_a"), F.col("_id").alias("_a"))
    mb = members.select(F.col("_rep").alias("id_b"), F.col("_id").alias("_b"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("_a", "_b").alias("id_a"),
            F.greatest("_a", "_b").alias("id_b"),
            *score,
        )
    )
    mm = members.join(
        mined_reps.select(F.col(mined_reps.columns[0]).alias("_rep")),
        "_rep",
        "left_semi",
    )
    iscore = (
        [F.lit(identical_score).alias(score_col)] if score_col else []
    )
    intra = (
        mm.select("_rep", F.col("_id").alias("_a"))
        .join(mm.select("_rep", F.col("_id").alias("_b")), "_rep")
        .filter(F.col("_a") < F.col("_b"))
        .select(
            F.col("_a").alias("id_a"), F.col("_b").alias("id_b"), *iscore
        )
    )
    return cross.unionByName(intra)


# clone-map rows below this measured size broadcast in the expansion
# joins: ~16 MB serialized at the cap for LONG ids (two 8-byte values per
# row), far under executor memory, and the alternative is 4-6
# tiny-but-scheduled shuffle stages per miner call. NOTE the estimate
# assumes fixed-width ids: with long STRING doc ids the map can be an
# order of magnitude larger (row count is the cap, not bytes) — still
# bounded (~100-byte ids ≈ 200 MB worst case), but size the cap down if
# ids are fat strings and executors are small (round-6 ADVICE).
_BROADCAST_MEMBERS = 1_000_000


def _fused_shingle_collapse(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> tuple[DataFrame, DataFrame, bool, bool]:
    """Collapse-guard bookkeeping FUSED into the miner's shingle scan
    (round-6, second pass at the round-5 VERDICT's guard-overhead item):
    one projection computes the shingle array AND the token-stream
    fingerprint — text is scanned once, and the guard's sizing action
    doubles as the warm-up of the (expensive, interpreted higher-order)
    shingle cache the mining plan reads anyway, so the guard no longer
    pays a separate text pass. The clone-eligibility predicate
    (``size(shingles) > 0``) later reads the cached ``_size`` instead of
    recomputing shingles over the representatives.

    Returns (sh_full, groups, clones?, broadcastable?): ``sh_full`` =
    cached (_id, _sh, _size, _tfp) for every doc; ``groups`` = cached
    (_tfp, _rep, _gs); the flags come from the single sizing action
    (broadcastable? = measured clone-member count under the cap)."""
    # ONE Arrow-batched pass computes shingles + the collapse key (struct
    # selected once so the UDF runs once; see the Arrow-kernel note above)
    sh_full = _materialize(
        df.select(
            F.col(id_col).alias("_id"),
            _sh_tfp_arrow(n)(F.col(text_col)).alias("_st"),
        ).select(
            "_id",
            F.col("_st.sh").alias("_sh"),
            F.col("_st.tfp").alias("_tfp"),
        ).withColumn("_size", F.size("_sh"))
    )
    groups = _materialize(
        sh_full.groupBy("_tfp").agg(
            F.min("_id").alias("_rep"), F.count(F.lit(1)).alias("_gs")
        )
    )
    row = (
        groups.filter(F.col("_gs") > 1)
        .agg(
            F.count(F.lit(1)).alias("g"),
            F.coalesce(F.sum("_gs"), F.lit(0)).alias("m"),
        )
        .first()
    )
    return sh_full, groups, row["g"] > 0, row["m"] <= _BROADCAST_MEMBERS


def _fused_token_collapse(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, bool, bool]:
    """Token-stream twin of :func:`_fused_shingle_collapse` for miners
    that consume TOKENS rather than shingles (SimHash): one projection
    tokenizes once and derives both the token array and its stream
    fingerprint (md5 of the space-joined stream — identical key to
    :func:`token_stream_key`, computed from the array so the text is
    never re-tokenized). Returns (tokf, groups, clones?, broadcastable?)
    with ``tokf`` = cached (_id, _tok, _size, _tfp)."""
    tokf = _materialize(
        df.select(
            F.col(id_col).alias("_id"),
            _tok_tfp_arrow(F.col(text_col)).alias("_st"),
        ).select(
            "_id",
            F.col("_st.tok").alias("_tok"),
            F.col("_st.tfp").alias("_tfp"),
        ).withColumn("_size", F.size("_tok"))
    )
    groups = _materialize(
        tokf.groupBy("_tfp").agg(
            F.min("_id").alias("_rep"), F.count(F.lit(1)).alias("_gs")
        )
    )
    row = (
        groups.filter(F.col("_gs") > 1)
        .agg(
            F.count(F.lit(1)).alias("g"),
            F.coalesce(F.sum("_gs"), F.lit(0)).alias("m"),
        )
        .first()
    )
    return tokf, groups, row["g"] > 0, row["m"] <= _BROADCAST_MEMBERS


def _rep_rows(sh_full: DataFrame, groups: DataFrame) -> DataFrame:
    """Representative rows of a fused (shingle or token) frame (one per distinct
    token stream) — the collapsed mining input. A semi join against the
    cached group reps; materialized so the mining plan's several
    references (sizes, inverted index, verify arrays) share one copy."""
    return _materialize(
        sh_full.join(
            groups.select(F.col("_rep").alias("_id")), "_id", "left_semi"
        ).drop("_tfp")
    )


def _multi_members_and_mined(
    sh_full: DataFrame, groups: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(members_multi, mined) for pair expansion, from the cached fused
    frames only: members of multi-member groups, and the multi-group
    representatives that actually mine (cached ``_size > 0`` — no
    shingle recomputation)."""
    multi = groups.filter(F.col("_gs") > 1)
    members_multi = (
        sh_full.select("_id", "_tfp")
        .join(multi.select("_tfp", "_rep"), "_tfp")
        .select("_id", "_rep")
    )
    mined = multi.select(F.col("_rep").alias("_id")).join(
        sh_full.filter(F.col("_size") > 0).select("_id"), "_id", "left_semi"
    )
    return members_multi, mined


def _maybe_broadcast(df: DataFrame, small: bool) -> DataFrame:
    return F.broadcast(df) if small else df


def _expand_pairs_multi(
    rep_pairs: DataFrame,
    members_multi: DataFrame,
    mined_multi: DataFrame,
    score_col: str | None,
    identical_score,
    small: bool = False,
) -> DataFrame:
    """Expand representative pairs using the multi-member groups only —
    row-identical to :func:`expand_collapsed_pairs` (property of the left
    joins: a singleton rep has no ``members_multi`` row, so coalesce keeps
    the rep id — exactly the identity row the full membership map carried).
    Join traffic is O(pairs + clone members) instead of O(pairs × n);
    with ``small`` (clone-member count measured under the broadcast cap by
    the fused collapse sizing action) the clone-map sides broadcast and the
    pair stream never exchanges."""
    score = [F.col(score_col)] if score_col else []
    ma = members_multi.select(F.col("_rep").alias("id_a"), F.col("_id").alias("_a"))
    mb = members_multi.select(F.col("_rep").alias("id_b"), F.col("_id").alias("_b"))
    ca = F.coalesce(F.col("_a"), F.col("id_a"))
    cb = F.coalesce(F.col("_b"), F.col("id_b"))
    cross = (
        rep_pairs.join(_maybe_broadcast(ma, small), "id_a", "left")
        .join(_maybe_broadcast(mb, small), "id_b", "left")
        .select(
            F.least(ca, cb).alias("id_a"),
            F.greatest(ca, cb).alias("id_b"),
            *score,
        )
    )
    mm = members_multi.join(
        _maybe_broadcast(
            mined_multi.select(F.col(mined_multi.columns[0]).alias("_rep")), small
        ),
        "_rep",
        "left_semi",
    )
    iscore = [F.lit(identical_score).alias(score_col)] if score_col else []
    intra = (
        mm.select("_rep", F.col("_id").alias("_a"))
        .join(_maybe_broadcast(mm.select("_rep", F.col("_id").alias("_b")), small), "_rep")
        .filter(F.col("_a") < F.col("_b"))
        .select(F.col("_a").alias("id_a"), F.col("_b").alias("id_b"), *iscore)
    )
    return cross.unionByName(intra)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """K-minhash signature per doc: min over shingles of xxhash64(seed‖shingle).

    Pure JVM exprs — one explode + one groupBy(id) with K min-aggs (all
    map-side combinable). Returns (_id, sig: array<bigint>)."""
    inv = _materialize(
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(_shingles_arrow(text_col, n)).alias("shingle"),
        )
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = inv.groupBy("_id").agg(*mins)
    return sig.select(
        "_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    verify: bool = True,
    collapse_identical: bool = True,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band-bucket candidates, optional exact
    Jaccard verification (join text back only for candidates).

    Returns (id_a, id_b[, jaccard]). With bands=16/num_hashes=64 (r=4),
    collision prob at j=0.7 ≈ 0.98 — tune bands per target threshold.

    ``collapse_identical`` (default on) pre-collapses identical token
    streams to one representative before banding and expands the pairs
    back afterwards — the lossless band-bucket skew guard
    (:func:`collapse_identical_docs`): m byte-identical docs cost O(m)
    candidate rows instead of O(m²)-per-band. Round 6: the collapse key
    rides the miner's own shingle scan (:func:`_fused_shingle_collapse`)
    so the guard costs no extra text pass; the fused frame also serves
    the exact-Jaccard verify arrays, removing the OFF path's separate
    verify scan."""
    if collapse_identical:
        sh_full, groups, clones, small = _fused_shingle_collapse(
            df, id_col, text_col, n
        )
        if not clones:
            return _minhash_pairs_on_shingles(
                sh_full.drop("_tfp"), num_hashes, bands, threshold, verify
            )
        rep_pairs = _minhash_pairs_on_shingles(
            _rep_rows(sh_full, groups), num_hashes, bands, threshold, verify
        )
        # clone-group reps that produce a signature: ≥1 shingle (docs
        # shorter than the shingle length never enter the index and must
        # not pair) — read from the cached _size, never recomputed
        members_multi, mined = _multi_members_and_mined(sh_full, groups)
        return _expand_pairs_multi(
            rep_pairs, members_multi, mined,
            "jaccard" if verify else None, 1.0, small,
        )
    sh = _materialize(
        df.select(F.col(id_col).alias("_id"), _shingles_arrow(text_col, n).alias("_sh"))
        .withColumn("_size", F.size("_sh"))
    )
    return _minhash_pairs_on_shingles(sh, num_hashes, bands, threshold, verify)


def _minhash_pairs_on_shingles(
    sh: DataFrame, num_hashes: int, bands: int, threshold: float, verify: bool
) -> DataFrame:
    """Banding + candidate join + optional exact verify over a prepared
    (materialized) ``(_id, _sh[, _size])`` shingle frame — one shingle
    computation feeds the signatures AND the verify arrays (the pre-fusion
    plan scanned text twice: once for signatures, once for verify)."""
    rows_per_band = num_hashes // bands
    inv = sh.select("_id", F.explode("_sh").alias("shingle"))
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = _materialize(
        inv.groupBy("_id")
        .agg(*mins)
        .select(
            "_id",
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("_id", *band_cols)
    bucketed = banded.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    a, b_ = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(b_, on=["band", "bucket"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    if not verify:
        return cand
    # shuffle_hash for the same reason as the prefix path's attach joins:
    # build on the doc-bounded shingle side, stream the candidate pairs —
    # no sort of the candidate stream (measured 4.3 s → 2.6 s at sf1.0)
    out = (
        cand.join(
            sh.withColumnsRenamed({"_id": "id_a", "_sh": "sh_a"}).hint(
                "shuffle_hash"
            ),
            "id_a",
        )
        .join(
            sh.withColumnsRenamed({"_id": "id_b", "_sh": "sh_b"}).hint(
                "shuffle_hash"
            ),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def _band_widths(n_bits: int, n_bands: int) -> list[int]:
    """Split n_bits into n_bands near-equal contiguous widths."""
    base, extra = divmod(n_bits, n_bands)
    return [base + (1 if b < extra else 0) for b in range(n_bands)]


def _word_hash(w: int, portable_hash: bool) -> "F.Column":
    """Per-token hash for fingerprint word ``w``.

    Portable mode carves disjoint 60-bit words out of the md5 hex digest
    (32 hex digits → at most 2 words), reproducible bit-for-bit in any
    engine with md5 (DuckDB: ``('0x'||substr(md5(t),1+15*w,15))::BIGINT``).
    Scale mode uses seeded xxhash64 — unlimited words, faster per token."""
    if portable_hash:
        if w > 1:
            raise ValueError("portable_hash supports at most 2 words (md5 is 128 bits)")
        return F.conv(F.substring(F.md5("t"), 1 + 15 * w, 15), 16, 10).cast("long")
    return F.xxhash64(F.lit(f"simhash-word-{w}"), F.col("t"))


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bands: int = 4,
    portable_hash: bool = False,
    n_words: int = 1,
) -> DataFrame:
    """SimHash per doc: per-token hash, bit-vote, sign → bits.

    Explode tokens → for each bit position sum(±1) → assemble the long.
    n_bits conditional-sum aggs, all map-side combinable. Returns
    (_id, simhash, band0..band{n_bands-1}: near-equal contiguous bit
    chunks for Hamming-candidate joins).

    ``portable_hash=False`` (scale default): 64-bit xxhash64 per token,
    seeded per word.
    ``portable_hash=True``: 60-bit token-hash words carved from md5 hex —
    byte-identical in any engine with md5 (DuckDB:
    ``('0x' || substr(md5(t),1,15))::BIGINT``), so fingerprints, hamming
    distances, and the near-dup pair set are externally verifiable
    bit-for-bit. md5 costs more per token than xxhash64; use it when
    cross-engine verification matters more than raw hash throughput.

    ``n_words`` widens the fingerprint to ``n_words`` independent words
    (n_words × 64 bits, or × 60 portable) so EXHAUSTIVE banding at a
    large Hamming radius keeps wide bands: at radius 8, a single 64-bit
    word forces 9 bands of ~7 bits (~100 buckets/band → the band
    self-joins degenerate toward all-pairs at 10⁹ docs — the round-3
    scale-killer); two words give 9 bands of ~14 bits (~16k buckets).
    The radius scales with width (same bit-flip rate per edited token),
    so compare radii as a FRACTION of n_bits across widths. Bands are
    assigned to words round-robin and split within each word, remaining
    disjoint and covering all bits — the pigeonhole exhaustiveness
    argument in :func:`simhash_near_dup_pairs` is width-independent.
    Emits a computed-width warning when any band is narrower than 12
    bits (candidate-explosion risk at corpus scale).

    Output: (_id, simhash[, simhash1..simhash{W-1}], band0..band{B-1}).
    Word 0 keeps the name ``simhash`` so single-word callers (and the
    portable DuckDB oracle) are unchanged."""
    tok = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("t")
    )
    return _simhash_fps_on_tok(tok, n_bands, portable_hash, n_words)


def _band_layout(
    n_bands: int, portable_hash: bool, n_words: int
) -> tuple[int, list[str], list[int]]:
    """(word_bits, word_names, bands_per_word) of a fingerprint layout,
    emitting the narrow-band warning — shared by the JVM agg path and the
    Arrow fingerprint path so both warn identically."""
    word_bits = 60 if portable_hash else 64
    word_names = ["simhash"] + [f"simhash{w}" for w in range(1, n_words)]
    # distribute bands over words (near-equal counts), widths within word
    bands_per_word = _band_widths(n_bands, n_words) if n_words > 1 else [n_bands]
    min_width = min(
        w
        for nb in bands_per_word
        if nb > 0
        for w in _band_widths(word_bits, nb)
    )
    if min_width < 12:
        warnings.warn(
            f"simhash banding: narrowest band is {min_width} bits "
            f"(<12) — ~{1 << min_width} buckets/band makes band self-joins "
            f"near-quadratic at large corpus sizes; widen the fingerprint "
            f"(n_words) or lower the radius/bands",
            stacklevel=3,
        )
    return word_bits, word_names, bands_per_word


def _attach_band_cols(
    out: DataFrame,
    word_names: list[str],
    bands_per_word: list[int],
    word_bits: int,
) -> DataFrame:
    """Append band0..band{B-1} columns (contiguous bit chunks per word)."""
    band_id = 0
    for w, nb in enumerate(bands_per_word):
        offset = 0
        for width in _band_widths(word_bits, nb) if nb > 0 else []:
            out = out.withColumn(
                f"band{band_id}",
                F.shiftrightunsigned(F.col(word_names[w]), offset).bitwiseAND(
                    F.lit((1 << width) - 1)
                ),
            )
            offset += width
            band_id += 1
    return out


_SIMHASH_WORD_UDFS: dict[int, object] = {}


def _simhash_words_udf(n_words: int):
    """pandas_udf: token array → array<long> of PORTABLE simhash words.

    Exact mirror of the JVM bit-vote aggregation for ``portable_hash=True``
    (word w's token hash = int of md5 hex digits [15w, 15w+15) — identical
    to ``conv(substring(md5(t), 1+15w, 15), 16, 10)``; bit i set iff
    strictly more tokens have bit i set than clear), but computed per Arrow
    batch: md5 via hashlib (bit-identical), the 60-bit vote tally as one
    (n_tokens × 60) numpy popcount per word. Replaces the exploded-token
    shuffle + 60·W conditional-sum aggregation with a scan-riding
    projection — the token stream never leaves its scan task (guide §4.2;
    measured ~4× on the sf1.0 portable miners)."""
    if n_words not in _SIMHASH_WORD_UDFS:
        import numpy as np

        shifts = np.arange(60, dtype=np.uint64)

        @F.pandas_udf("array<long>")
        def _udf(tok_lists: pd.Series) -> pd.Series:
            out = []
            for toks in tok_lists:
                hexes = [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in toks
                ]
                n = len(hexes)
                words = []
                for w in range(n_words):
                    lo = 15 * w
                    vals = np.array(
                        [int(h[lo : lo + 15], 16) for h in hexes],
                        dtype=np.uint64,
                    )
                    ones = ((vals[:, None] >> shifts) & np.uint64(1)).sum(
                        axis=0, dtype=np.int64
                    )
                    # vote > 0  ⟺  ones*2 > n (votes are ones - (n - ones))
                    bits = (2 * ones > n).astype(np.uint64)
                    words.append(int((bits << shifts).sum()))
                out.append(words)
            return pd.Series(out)

        _SIMHASH_WORD_UDFS[n_words] = _udf
    return _SIMHASH_WORD_UDFS[n_words]


def _simhash_words_arrow(tokf: DataFrame, n_words: int) -> DataFrame:
    """Portable-hash fingerprint WORDS (no band columns) from a
    ``(_id, _tok)`` token-array frame via the Arrow kernel."""
    word_names = ["simhash"] + [f"simhash{w}" for w in range(1, n_words)]
    words = tokf.filter(F.size("_tok") > 0).select(
        "_id", _simhash_words_udf(n_words)(F.col("_tok")).alias("_w")
    )
    return words.select(
        "_id",
        *[F.col("_w")[w].alias(word_names[w]) for w in range(n_words)],
    )


def _simhash_fps_arrow(
    tokf: DataFrame, n_bands: int, n_words: int
) -> DataFrame:
    """Portable-hash fingerprint frame from a ``(_id, _tok)`` token-array
    frame via the Arrow kernel — same schema and values as
    :func:`_simhash_fps_on_tok` over the exploded tokens (docs with no
    tokens produce no row there — the explode drops them — so they are
    filtered here)."""
    word_bits, word_names, bands_per_word = _band_layout(n_bands, True, n_words)
    out = _simhash_words_arrow(tokf, n_words)
    return _attach_band_cols(out, word_names, bands_per_word, word_bits)


def _simhash_fps_on_tok(
    tok: DataFrame, n_bands: int, portable_hash: bool, n_words: int
) -> DataFrame:
    """Bit-vote + band assembly of :func:`simhash_fingerprints`, over an
    already-exploded ``(_id, t)`` token frame — shared by the fused
    collapse path (tokens come from the cached token array, text is not
    re-tokenized) and the direct text path."""
    word_bits, word_names, bands_per_word = _band_layout(
        n_bands, portable_hash, n_words
    )
    out = _simhash_words_on_tok(tok, portable_hash, n_words)
    return _attach_band_cols(out, word_names, bands_per_word, word_bits)


def _simhash_words_on_tok(
    tok: DataFrame, portable_hash: bool, n_words: int
) -> DataFrame:
    """Bit-vote fingerprint WORDS (no band columns, no layout warning) over
    an exploded ``(_id, t)`` token frame."""
    word_bits = 60 if portable_hash else 64
    word_names = ["simhash"] + [f"simhash{w}" for w in range(1, n_words)]
    for w in range(n_words):
        tok = tok.withColumn(f"h{w}", _word_hash(w, portable_hash))
    one = F.lit(1).cast("long")
    votes = [
        F.sum(
            F.when(
                F.col(f"h{w}").bitwiseAND(F.shiftleft(one, i)) != 0, 1
            ).otherwise(-1)
        ).alias(f"v{w}_{i}")
        for w in range(n_words)
        for i in range(word_bits)
    ]
    agg = tok.groupBy("_id").agg(*votes)
    fps = []
    for w in range(n_words):
        fp = F.lit(0).cast("long")
        for i in range(word_bits):
            # bits are disjoint → OR assembles the word without overflow
            fp = fp.bitwiseOR(
                F.when(F.col(f"v{w}_{i}") > 0, F.shiftleft(one, i)).otherwise(
                    F.lit(0).cast("long")
                )
            )
        fps.append(fp.alias(word_names[w]))
    return agg.select("_id", *fps)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int | None = None,
    portable_hash: bool = False,
    n_words: int = 1,
    collapse_identical: bool = True,
) -> DataFrame:
    """Near-dup pairs with Hamming(fingerprint) ≤ max_hamming.

    Candidates via band equality, then exact popcount filter. Returns
    (id_a, id_b, hamming). Multi-word fingerprints (``n_words``) compute
    hamming as the sum of per-word popcounts; see
    :func:`simhash_fingerprints` for why wide fingerprints are the
    scale-safe way to run large radii (band width ≥ 12 bits keeps band
    self-joins sub-quadratic; a warning fires otherwise).

    ``n_bands`` defaults to ``max_hamming + 1``, which makes the banding
    EXHAUSTIVE by pigeonhole: a pair within Hamming ≤ r differs in at most
    r of the n_bands > r disjoint bands, so at least one band matches —
    the output then EQUALS the exact hamming-≤r pair set of the
    fingerprints (not a recall-lossy approximation). Fewer bands trade
    completeness for fewer candidate collisions; the round-1 default
    (4 × 16-bit bands) is exhaustive only up to r=3.

    ``collapse_identical`` (default on): identical token streams mine as
    one representative, pairs expanded back exactly afterwards (hamming 0
    within a group; a member inherits its rep's hamming to everything
    else) — see :func:`collapse_identical_docs` for the band-bucket skew
    rationale. Round 6: the collapse key rides the miner's own
    tokenization (:func:`_fused_token_collapse`), so the guard costs no
    extra text pass and the ≥1-token eligibility predicate reads the
    cached token count."""
    if n_bands is None:
        n_bands = max_hamming + 1
    if collapse_identical:
        tokf, groups, clones, small = _fused_token_collapse(df, id_col, text_col)
        mk = lambda frame: _simhash_pairs_on_tokens(  # noqa: E731
            frame, max_hamming, n_bands, portable_hash, n_words
        )
        if not clones:
            return mk(tokf.drop("_tfp"))
        rep_pairs = mk(_rep_rows(tokf, groups))
        # clone-group reps that produce a fingerprint: ≥1 token (empty
        # docs never enter the bit-vote agg and must not pair)
        members_multi, mined = _multi_members_and_mined(tokf, groups)
        return _expand_pairs_multi(
            rep_pairs, members_multi, mined, "hamming", 0, small
        )
    tokf = _materialize(
        df.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_tok"))
    )
    return _simhash_pairs_on_tokens(
        tokf, max_hamming, n_bands, portable_hash, n_words
    )


def _chunk_layout(
    word_bits: int, n_words: int, max_hamming: int
) -> tuple[int, int, list[tuple[int, int, int]]] | None:
    """Pigeonhole QUERY-EXPANSION layout for the exact hamming-≤r join
    (used when exhaustive banding would need sub-12-bit bands): the
    fingerprint's n_words·word_bits bits are covered by ``m`` disjoint
    chunks with m = ⌊r/3⌋+1 (so 3m > r and k = ⌊r/m⌋ ≤ 2); by pigeonhole
    a pair within hamming ≤ r agrees within ≤ k bits on SOME chunk, so
    expanding one side by all ≤k-bit flips of each chunk and equi-joining
    on (chunk idx, value) is EXACT-recall. Returns (m, k, chunks) with
    chunks = [(word idx, bit offset, width)], or None when the layout is
    unusable (chunks too wide for a bounded expansion, or r < 3)."""
    if max_hamming < 3:
        return None
    m = max(max_hamming // 3 + 1, n_words)
    k = max_hamming // m
    chunks: list[tuple[int, int, int]] = []
    per_word = _band_widths(m, n_words) if n_words > 1 else [m]
    for w, nc in enumerate(per_word):
        off = 0
        for width in _band_widths(word_bits, nc) if nc > 0 else []:
            chunks.append((w, off, width))
            off += width
    # expansion size per chunk is C(width,0..k) — cap it so the probe-side
    # blowup stays bounded (~250 rows/chunk at 20 bits, k=2)
    if any(width > 30 or width < k + 1 for _, _, width in chunks):
        return None
    return m, k, chunks


def _simhash_pairs_on_tokens(
    tokf: DataFrame,
    max_hamming: int,
    n_bands: int,
    portable_hash: bool,
    n_words: int,
) -> DataFrame:
    """Candidate generation + exact popcount filter of
    :func:`simhash_near_dup_pairs`, over a prepared (materialized)
    ``(_id, _tok, ...)`` token-array frame.

    Portable mode fingerprints via the Arrow kernel
    (:func:`_simhash_words_arrow`): same words bit-for-bit, but the token
    stream never explodes into a 60·W-column shuffle agg. The xxhash64
    mode keeps the JVM agg (no Python md5 twin exists for Spark's
    xxhash64 protocol).

    Two exact candidate schemes (round 7):

    - **Band join** — exhaustive n_bands = r+1 banding (or the caller's
      explicit recall-lossy n_bands): candidates = pairs equal in ≥1
      band. With narrow bands this degenerates: at 60 bits / r=8 the
      9 bands are 6-7 bits wide (≤128 buckets) and the measured candidate
      stream at 50k docs was 9.1×10⁸ pairs — the join spends its whole
      wall time PRODUCING rows that the popcount immediately discards.
    - **Pigeonhole query expansion** (:func:`_chunk_layout`) — used
      automatically when banding is exhaustive AND its narrowest band
      would be <12 bits: cover the fingerprint with m = ⌊r/3⌋+1 chunks
      (20 bits each at 60/r=8), so a qualifying pair agrees within
      k = ⌊r/m⌋ ≤ 2 bits on some chunk; one side explodes to its
      1+w+C(w,2) ≤k-bit chunk flips (211/chunk at 20 bits) and
      equi-joins the other side's exact chunk values. Wider keys cut the
      measured candidate stream 3.9× (9.1×10⁸ → 2.3×10⁸) and the probe
      side is a pure projection of the cached fingerprint frame, so the
      only exchange left is the tiny survivor distinct. The planner
      broadcasts the exact side at bench scale (3 rows/doc); at corpus
      scales past the broadcast bound the same plan becomes a shuffle
      join on (chunk, value) and keeps the candidate reduction.

    Both schemes are EXACT (the output is the full hamming-≤r pair set),
    so they are interchangeable only in the exhaustive case — a caller
    forcing a recall-lossy n_bands keeps the band join, whose output the
    banding itself defines."""
    word_bits = 60 if portable_hash else 64
    layout = None
    if n_bands == max_hamming + 1:
        per_word = _band_widths(n_bands, n_words) if n_words > 1 else [n_bands]
        min_band_w = min(
            bw
            for nb in per_word
            if nb > 0
            for bw in _band_widths(word_bits, nb)
        )
        if min_band_w < 12:
            layout = _chunk_layout(word_bits, n_words, max_hamming)
    word_names = ["simhash"] + [f"simhash{w}" for w in range(1, n_words)]
    if layout is not None:
        if portable_hash:
            fps = _materialize(_simhash_words_arrow(tokf, n_words))
        else:
            fps = _materialize(
                _simhash_words_on_tok(
                    tokf.select("_id", F.explode("_tok").alias("t")),
                    portable_hash,
                    n_words,
                )
            )
        # MEASURED broadcast decision (same discipline as
        # _BROADCAST_MEMBERS): the count() rides the just-persisted frame
        # — the first action would materialize it anyway. The exact side
        # is m rows/doc of ~32 bytes; under the cap it broadcasts and the
        # probe side becomes a pure scan→explode→probe pipeline with NO
        # exchange (the static planner can't see this through the
        # Generate, and AQE still leaves the probe-side shuffle files).
        # Past the cap the join falls back to the planner's shuffle
        # strategy, which keeps the candidate reduction.
        small = fps.count() * len(layout[2]) <= 2_000_000
        return _simhash_pairs_expansion(
            fps, word_names, max_hamming, layout, small
        )
    if portable_hash:
        fps = _materialize(_simhash_fps_arrow(tokf, n_bands, n_words))
    else:
        fps = _materialize(
            _simhash_fps_on_tok(
                tokf.select("_id", F.explode("_tok").alias("t")),
                n_bands=n_bands,
                portable_hash=portable_hash,
                n_words=n_words,
            )
        )
    # ONE self-join on exploded (band index, band value) keys — not
    # n_bands separate self-joins unioned (round-7: the unioned plan paid
    # 2×n_bands exchanges + a union before the distinct; the exploded join
    # shuffles the same rows once and keeps the identical candidate set,
    # since (bidx, bval) equality ⟺ equality in that band)
    bucketed = fps.select(
        "_id",
        *word_names,
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(n_bands)])
        ).alias("bidx", "bval"),
    )
    a, c = bucketed.alias("a"), bucketed.alias("b")
    cands = (
        a.join(c, on=["bidx", "bval"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            *[F.col(f"a.{wn}").alias(f"sha_{w}") for w, wn in enumerate(word_names)],
            *[F.col(f"b.{wn}").alias(f"shb_{w}") for w, wn in enumerate(word_names)],
        )
    )
    hamming = None
    for w in range(n_words):
        h = F.bit_count(F.col(f"sha_{w}").bitwiseXOR(F.col(f"shb_{w}")))
        hamming = h if hamming is None else hamming + h
    # popcount-filter BEFORE the distinct (round 7): the narrow exhaustive
    # bands make the raw candidate stream O(Σ bucket²) rows — ~10⁸ at 50k
    # docs with 60-bit/9-band fingerprints — and `distinct()` first paid a
    # full exchange of all of them (32-byte rows, multi-GB). The hamming
    # filter is a pure per-row function of (sha, shb), which are constants
    # per doc pair, so filter∘distinct ≡ distinct∘filter — row-identical —
    # but the filter runs inside the join's whole-stage-codegen pipeline
    # and only TRUE near-dups (a ~10⁴× smaller set) reach the exchange.
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def _simhash_pairs_expansion(
    fps: DataFrame,
    word_names: list[str],
    max_hamming: int,
    layout: tuple[int, int, list[tuple[int, int, int]]],
    small: bool = False,
) -> DataFrame:
    """Pigeonhole query-expansion candidate join over a materialized
    ``(_id, simhash[, simhash1..])`` fingerprint frame — see
    :func:`_simhash_pairs_on_tokens` for the scheme and its exactness
    argument. One side carries every ≤k-bit flip of each chunk (a pure
    projection+explode of the cached frame — no shuffle); the other
    carries the exact chunk values; survivors of the in-join popcount
    filter are the only rows that ever reach an exchange."""
    from itertools import combinations

    _, k, chunks = layout
    chunk_vals = [
        F.shiftrightunsigned(F.col(word_names[w]), off).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        for (w, off, width) in chunks
    ]
    # One probe branch per chunk, unioned: each branch explodes a LITERAL
    # flip array (constant-folded to a single array object) and XORs the
    # chunk value AFTER the explode. Building one array of 633 xor-structs
    # per row instead blew the whole-stage-codegen method limit and
    # de-codegen'd the entire probe stage — explode, join, popcount and
    # the distinct's partial aggregate all ran interpreted, measured ~10×
    # slower than this shape on the same candidate volume.
    sha_cols = [
        F.col(wn).alias(f"sha_{w}") for w, wn in enumerate(word_names)
    ]
    probe = None
    for ci, ((_, _, width), cv) in enumerate(zip(chunks, chunk_vals)):
        flips = [0]
        if k >= 1:
            flips += [1 << p for p in range(width)]
        if k >= 2:
            flips += [
                (1 << p) | (1 << q) for p, q in combinations(range(width), 2)
            ]
        branch = fps.select(
            F.col("_id").alias("id_a"),
            *sha_cols,
            F.lit(ci).alias("ci"),
            cv.alias("_cv0"),
            F.explode(F.array(*[F.lit(int(f)) for f in flips])).alias("_f"),
        ).select(
            "id_a",
            *[f"sha_{w}" for w in range(len(word_names))],
            "ci",
            F.col("_cv0").bitwiseXOR(F.col("_f")).alias("cv"),
        )
        probe = branch if probe is None else probe.unionByName(branch)
    exact = fps.select(
        F.col("_id").alias("id_b"),
        *[F.col(wn).alias(f"shb_{w}") for w, wn in enumerate(word_names)],
        F.posexplode(F.array(*chunk_vals)).alias("ci", "cv"),
    )
    cands = probe.join(_maybe_broadcast(exact, small), on=["ci", "cv"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    hamming = None
    for w in range(len(word_names)):
        h = F.bit_count(F.col(f"sha_{w}").bitwiseXOR(F.col(f"shb_{w}")))
        hamming = h if hamming is None else hamming + h
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def duplicate_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    algorithm: str = "star",
    max_iters: int = 25,
    **ngram_kw,
) -> DataFrame:
    """Document → duplicate-cluster assignment WITHOUT materializing the
    all-pairs list: the composition a 10⁹-doc dedup actually wants.

    ``pairs → connected_components`` is exact but its input is the pair
    LIST, and a group of m byte-identical documents contributes
    m(m−1)/2 intra-group pairs — at crawl scale a million-clone
    boilerplate group alone is 5×10¹¹ edge rows before clustering even
    starts. This operator never builds them: identical token streams
    collapse to one representative (:func:`collapse_identical_docs`),
    ngram-Jaccard pairs are mined among REPRESENTATIVES only, connected
    components run on that rep graph, and members inherit their rep's
    cluster with one join. Since each rep is the MINIMUM id of its
    group, the rep-graph cluster minimum equals the full-graph cluster
    minimum, so the output is row-identical to
    ``connected_components(ngram_jaccard_pairs(df, ...))`` — including
    membership semantics: docs in a multi-member identical group belong
    to a cluster even when their rep has no cross-group pair (they pair
    with each other), docs too short to produce a shingle never cluster,
    and singleton docs with no qualifying pair are absent.

    Returns (node, cluster_rep). Property-tested equal to the pair-list
    path on mixed clone/near-dup corpora."""
    unknown = set(ngram_kw) - {"max_shingle_freq", "prefix_filter"}
    if unknown:
        raise TypeError(f"duplicate_clusters: unknown ngram kwargs {unknown}")
    sh_full, groups, clones, small = _fused_shingle_collapse(
        df, id_col, text_col, n
    )
    mine = lambda sh: _ngram_pairs_on_shingles(  # noqa: E731
        sh,
        threshold,
        ngram_kw.get("max_shingle_freq"),
        ngram_kw.get("prefix_filter"),
    )
    if not clones:  # no clones: the full graph IS the rep graph
        return connected_components(
            mine(sh_full.drop("_tfp")), algorithm=algorithm, max_iters=max_iters
        )
    rep_pairs = mine(_rep_rows(sh_full, groups))
    rep_labels = connected_components(
        rep_pairs, algorithm=algorithm, max_iters=max_iters
    )
    # multi-member groups cluster even with no cross-group pair — but only
    # if the group produces shingles (sub-shingle-length docs never pair);
    # the predicate reads the cached _size of the clone-group reps only
    members_multi, mined = _multi_members_and_mined(sh_full, groups)
    labels_rep = rep_labels.select(F.col("node").alias("_rep"), "cluster_rep")
    mm = members_multi.join(
        _maybe_broadcast(
            mined.select(F.col(mined.columns[0]).alias("_rep")), small
        ),
        "_rep",
        "left_semi",
    )
    multi_out = mm.join(labels_rep, "_rep", "left").select(
        F.col("_id").alias("node"),
        F.coalesce(F.col("cluster_rep"), F.col("_rep")).alias("cluster_rep"),
    )
    # singleton reps keep their label rows as-is; multi-group reps are
    # replaced by the expansion above (which includes the rep itself,
    # since members_multi carries the (_id=rep, _rep=rep) row)
    single_out = rep_labels.join(
        _maybe_broadcast(
            members_multi.select(F.col("_rep").alias("node")).distinct(), small
        ),
        "node",
        "left_anti",
    )
    return single_out.unionByName(multi_out)


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al. 2014, "Connected Components
    in MapReduce and Beyond"): for each node u with m = min(Γ(u) ∪ {u}),
    connect every STRICTLY LARGER neighbor to m. Input/output edges are
    canonical big→small rows (u > v), so the symmetric neighbor view is
    rebuilt here. Emitted rows keep u > v (v > u ≥ m ⟹ v > m)."""
    sym = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least(F.col("_mn"), F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: for each node u, connect all of u's SMALLER
    neighbors (and u itself) to their minimum. The canonical big→small
    edge list IS the smaller-neighbor adjacency (each undirected edge is
    stored exactly once as (big, small)), so no symmetric view is
    needed. Output rows keep u > v."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    nbr = (
        edges.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    own = mins.select("u", F.col("m").alias("v"))
    return nbr.unionByName(own).distinct()


def _star_forest_probe(edges: DataFrame) -> tuple[bool, int]:
    """EXACT star-forest test in ONE aggregation job, no joins: a
    canonical (u > v) edge set is a star forest ⟺ every u appears in
    exactly one row AND no v ever appears as a u (count(edges) ==
    countDistinct(u) and the u-set and v-set are disjoint, i.e.
    countDistinct(u ∪ v) == countDistinct(u) + countDistinct(v)). Both
    conditions come from one agg over the stacked (node, side) frame.
    This is the fixpoint test AND the invariant: a star forest is
    provably a fixpoint of the large∘small round, each star's center is
    its component minimum by canonicality (all edges point at the
    smaller endpoint), and the rounds preserve connectivity — so
    stopping at the FIRST star-forest state is exact, needs no extra
    confirmation round, and cannot be spoofed by a hash collision (the
    round-5 signature-equality test could, with probability 2⁻⁶⁴ —
    round-5 ADVICE).

    Returns (is_star_forest, edge_count) — the edge count rides the same
    agg for free and drives the local-finish decision."""
    stacked = edges.select(F.col("u").alias("n"), F.lit(1).alias("s")).unionAll(
        edges.select(F.col("v").alias("n"), F.lit(0).alias("s"))
    )
    r = stacked.agg(
        F.count(F.when(F.col("s") == 1, 1)).alias("ne"),
        F.count_distinct(F.when(F.col("s") == 1, F.col("n"))).alias("du"),
        F.count_distinct(F.when(F.col("s") == 0, F.col("n"))).alias("dv"),
        F.count_distinct("n").alias("dall"),
    ).first()
    return (
        r["ne"] == r["du"] and r["dall"] == r["du"] + r["dv"],
        int(r["ne"]),
    )


def _is_star_forest(edges: DataFrame) -> bool:
    return _star_forest_probe(edges)[0]


# Edge count at or below which the contraction FINISHES LOCALLY (Kiveris
# et al. 2014 §Optimizations: once the shrinking graph fits on one
# machine, finish it there instead of paying log-n more distributed
# rounds). 1M canonical (long, long) edges ≈ 16 MB — driver-trivial. The
# decision is MEASURED: the per-round shape-test agg already counts the
# edges, so the fallback costs nothing when it doesn't fire. Set to 0 to
# force fully-distributed rounds (the property tests exercise both).
_LOCAL_FINISH_EDGES = 1_000_000


def _local_star_finish(edges: DataFrame) -> DataFrame:
    """Finish the contraction on the driver: min-root union-find over a
    measured-small edge list, emitting the same star forest the
    distributed rounds converge to — (u, v=component minimum) for every
    non-minimum node, exactly (root = min id because unions always attach
    the larger root under the smaller one). Deterministic: output depends
    only on the edge SET."""
    spark = edges.sparkSession
    pdf = edges.select("u", "v").toPandas()
    us, vs = pdf["u"].tolist(), pdf["v"].tolist()  # native py objs
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(us, vs):
        ru, rv = find(u), find(v)
        if ru != rv:
            hi, lo = (ru, rv) if rv < ru else (rv, ru)
            parent[hi] = lo
    rows = sorted(
        (n, find(n)) for n in set(us).union(vs) if find(n) != n
    )
    return spark.createDataFrame(rows, schema=edges.select("u", "v").schema)


def _star_contraction(edges0: DataFrame, max_iters: int) -> DataFrame:
    """Alternating large-star/small-star contraction: converges to per-
    component stars centered on the component minimum in O(log n) rounds
    REGARDLESS of graph diameter (the provable fix for chain-shaped dup
    graphs, where min-label propagation needs O(diameter) rounds).

    Termination: the EXACT star-forest shape test (:func:`_is_star_forest`)
    runs once per round — it fires on the first star-forest state, one
    full round EARLIER than the round-5 signature-equality test (which
    needed an identity round to observe "nothing changed"), and it IS the
    correctness invariant, so the 2⁻⁶⁴ signature-collision hole is closed
    structurally rather than asserted after the fact. Rounds are
    lineage-TRUNCATED, not merely persisted: persist leaves the
    compounding plan for Catalyst to re-analyze every round, which grows
    driver compile time superlinearly with round count. The checkpoint is
    LAZY and the shape-test agg is the materializing action, so each
    round runs ONE Spark job, not two (round-5 VERDICT: per-round fixed
    job latency dominated the sf0.1 wall time — eager localCheckpoint +
    a separate agg paid the scheduler floor twice per round)."""
    edges = edges0.localCheckpoint(eager=False)
    for _ in range(max_iters + 1):
        # the shape test is the first action over the lazy checkpoint: one
        # job materializes the round AND decides termination; its agg also
        # measures the live edge count for the local-finish decision
        star, ne = _star_forest_probe(edges)
        if star:
            # star forest: every row is (node, its component's minimum)
            return edges
        if ne <= _LOCAL_FINISH_EDGES:
            # the graph (now) fits on one machine: finish there instead of
            # paying the scheduler floor for O(log n) more tiny rounds
            # (Kiveris et al. 2014's own local-finish optimization). At
            # crawl scale the first rounds shrink the graph geometrically,
            # so this absorbs the long tail of small rounds; at bench
            # scale it fires immediately.
            return _local_star_finish(edges)
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
    raise RuntimeError(
        f"star contraction did not reach a star forest in {max_iters} "
        f"rounds — this should not happen (O(log n) bound); raise max_iters"
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Duplicate-cluster assignment from a near-dup pair list: connected
    components. Returns (node, cluster_rep) for every node appearing in
    ``pairs``; cluster_rep = the smallest node id reachable through the
    pair graph, so each cluster has one canonical representative (the
    training-data dedup contract: keep the representative, drop the
    rest).

    ``algorithm="label"`` — min-label propagation: one edge⋈labels join
    + a min-agg per node per round (~|E| shuffled rows keyed by node, no
    driver-side graph). Labels advance ONE hop per round, so rounds ≈
    component diameter: 3-5 on near-cliquish dup clusters, but O(n) on
    adversarial chains. If ``max_iters`` is exhausted before the
    fixpoint this RAISES (labels would be silently wrong otherwise) and
    names the fix: the star algorithm.

    ``algorithm="star"`` — alternating large-star/small-star contraction
    (Kiveris et al. 2014): O(log n) rounds regardless of diameter, same
    per-round join shape. The scale-safe choice when cluster shapes are
    unknown (crawl shingle chains, boilerplate drift).

    Both truncate lineage per round (LAZY localCheckpoint, materialized
    by the round's own convergence action — one job per round) so each
    round's plan — and Catalyst's per-round analysis cost — stays ONE
    round deep instead of compounding."""
    if algorithm not in ("label", "star"):
        raise ValueError(f"unknown connected-components algorithm {algorithm!r}")
    if algorithm == "star":
        # persist the two-column pair projection ONCE (symmetric with the
        # label path's edge materialization below): edges0, the node set,
        # and every caller-side branch over the result would otherwise
        # each re-run the full upstream mining DAG — measured 3× mining
        # evaluations per duplicate_clusters call at sf0.1
        pairs_uv = _materialize(
            pairs.select(F.col(id_a).alias("_pa"), F.col(id_b).alias("_pb"))
        )
        edges0 = (
            pairs_uv.select(
                F.greatest(F.col("_pa"), F.col("_pb")).alias("u"),
                F.least(F.col("_pa"), F.col("_pb")).alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        stars = _star_contraction(edges0, max_iters)
        nodes = (
            pairs_uv.select(F.col("_pa").alias("node"))
            .unionByName(pairs_uv.select(F.col("_pb").alias("node")))
            .distinct()
        )
        return nodes.join(
            stars.select(F.col("u").alias("node"), F.col("v").alias("_rep")),
            "node",
            "left",
        ).select(
            "node", F.coalesce(F.col("_rep"), F.col("node")).alias("cluster_rep")
        )
    edges = _materialize(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).unionByName(
            pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v"))
        )
    )
    labels = (
        edges.select("u").distinct().withColumn("label", F.col("u"))
        .localCheckpoint(eager=False)
    )
    changed = 0
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("u").alias("v"), F.col("label").alias("vlabel")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlabel").alias("nmin"))
        )
        # LAZY checkpoint (plan truncated immediately); the changed-count
        # below is the materializing action — one job per round, not two
        # (same fusion as _star_contraction, round 6)
        new_labels = labels.join(neighbor_min, "u", "left").select(
            "u",
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
        ).localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components(algorithm='label') did not converge in "
            f"{max_iters} rounds ({changed} labels still changing) — the "
            f"component diameter exceeds max_iters; use algorithm='star' "
            f"(O(log n) rounds) or raise max_iters"
        )
    return labels.select(F.col("u").alias("node"), F.col("label").alias("cluster_rep"))
