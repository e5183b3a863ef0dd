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

import logging
import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pysemantic_spark.functions.text import fingerprint, tokens
from pysemantic_spark.operators.cache import materialize as _materialize  # noqa: F401
from pysemantic_spark.operators.cache import release_intermediates  # noqa: F401

_LOG = logging.getLogger(__name__)


def exact_duplicates(df: DataFrame, cols: list[str]) -> DataFrame:
    """Groups occurring more than once. Returns cols + dup_count.
    One hash-shuffle on the key; partial agg map-side."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def exact_dedup_keep_first(
    df: DataFrame, cols: list[str], order_by: list[str]
) -> DataFrame:
    """Keep the first row per key under a deterministic order.

    Semi/anti dup-split (same pattern as the runner's clean path,
    runner.py execute): only keys that actually occur more than once enter
    the window shuffle; unique-key rows (the overwhelming majority of any
    real table) pass through a plain anti-join untouched. A naive
    row_number() over the whole table would shuffle EVERY row — including
    full text bodies — through the window exchange; at 10^12 rows with
    <1% duplicate keys that is ~100× more shuffle volume than needed."""
    dup_keys = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select(*cols)
    )
    uniq_part = df.join(dup_keys, on=cols, how="left_anti")
    dup_part = df.join(dup_keys, on=cols, how="left_semi")
    w = Window.partitionBy(*cols).orderBy(*[F.col(c) for c in order_by])
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
    plen = F.col("_size") - F.ceil(F.lit(float(threshold)) * F.col("_size")) + 1
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
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.

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
    if prefix_filter is None:
        prefix_filter = threshold >= 0.35
    sh = _materialize(
        df.select(F.col(id_col).alias("_id"), _shingles(text_col, n).alias("_sh"))
        .withColumn("_size", F.size("_sh"))
    )
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
        pref = ngram_prefix_index(inv, sizes, threshold)
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
        alpha = F.ceil(
            t / (t + F.lit(1.0)) * (F.col("a._size") + F.col("b._size"))
        )
        cand = (
            a.join(b, on="shingle")
            .filter(F.col("a._id") < F.col("b._id"))
            .filter(
                (F.col("b._size") >= F.ceil(t * F.col("a._size")))
                & (F.col("a._size") >= F.ceil(t * F.col("b._size")))
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
            .distinct()
        )
        shingle_sets = sh.select("_id", "_sh")
        return (
            cand.join(
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


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """K-minhash signature per doc: min over shingles of xxhash64(seed‖shingle).

    Pure JVM exprs — one explode + one groupBy(id) with K min-aggs (all
    map-side combinable). Returns (_id, sig: array<bigint>)."""
    inv = _materialize(
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(_shingles(text_col, n)).alias("shingle"),
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
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band-bucket candidates, optional exact
    Jaccard verification (join text back only for candidates).

    Returns (id_a, id_b[, jaccard]). With bands=16/num_hashes=64 (r=4),
    collision prob at j=0.7 ≈ 0.98 — tune bands per target threshold."""
    rows_per_band = num_hashes // bands
    sig = _materialize(minhash_signatures(df, id_col, text_col, n, num_hashes))
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
    sh = _materialize(
        df.select(F.col(id_col).alias("_id"), _shingles(text_col, n).alias("_sh"))
    )
    out = (
        cand.join(sh.withColumnsRenamed({"_id": "id_a", "_sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"_id": "id_b", "_sh": "sh_b"}), "id_b")
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
            stacklevel=2,
        )
    tok = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("t")
    )
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
    out = agg.select("_id", *fps)
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


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int | None = None,
    portable_hash: bool = False,
    n_words: int = 1,
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
    (4 × 16-bit bands) is exhaustive only up to r=3."""
    if n_bands is None:
        n_bands = max_hamming + 1
    fps = _materialize(
        simhash_fingerprints(
            df,
            id_col,
            text_col,
            n_bands=n_bands,
            portable_hash=portable_hash,
            n_words=n_words,
        )
    )
    word_names = ["simhash"] + [f"simhash{w}" for w in range(1, n_words)]
    cands = None
    for b in range(n_bands):
        a, c = fps.alias("a"), fps.alias("b")
        p = (
            a.join(c, F.col(f"a.band{b}") == F.col(f"b.band{b}"))
            .filter(F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                *[F.col(f"a.{wn}").alias(f"sha_{w}") for w, wn in enumerate(word_names)],
                *[F.col(f"b.{wn}").alias(f"shb_{w}") for w, wn in enumerate(word_names)],
            )
        )
        cands = p if cands is None else cands.unionByName(p)
    hamming = None
    for w in range(n_words):
        h = F.bit_count(F.col(f"sha_{w}").bitwiseXOR(F.col(f"shb_{w}")))
        hamming = h if hamming is None else hamming + h
    return (
        cands.distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Duplicate-cluster assignment from a near-dup pair list: connected
    components via min-label propagation. Returns (node, cluster_rep)
    for every node appearing in ``pairs``; cluster_rep = the smallest
    node id reachable through the pair graph, so each cluster has one
    canonical representative (the training-data dedup contract: keep the
    representative, drop the rest).

    Plan per round: one join of the edge list against the current labels
    + a min-agg per node, i.e. ~|E| shuffled rows keyed by node — no
    driver-side graph. Labels are re-materialized (persist + previous
    round released) each round so the lineage stays ONE round deep
    instead of compounding; convergence is detected with a changed-label
    count. Near-dup clusters are short-diameter by construction (a dup
    cluster is near-cliquish), so rounds ≈ 3-5 in practice; the
    ``max_iters`` bound guards adversarial chain graphs, where the known
    upgrade is the O(log n)-round large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond") on
    the same join shape.
    """
    from pysemantic_spark.operators.cache import materialize

    edges = _materialize(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).unionByName(
            pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v"))
        )
    )
    labels = materialize(
        edges.select("u").distinct().withColumn("label", F.col("u"))
    )
    labels.count()
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
        new_labels = materialize(
            labels.join(neighbor_min, "u", "left").select(
                "u",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("cluster_rep"))
