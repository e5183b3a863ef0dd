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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from pysemantic_spark.functions.text import fingerprint, tokens


def _materialize(df: DataFrame) -> DataFrame:
    """Persist an intermediate that multiple plan branches consume.

    Shingle/signature frames feed self-joins, frequency counts, and size
    lookups; without materialization Catalyst re-evaluates the (interpreted,
    higher-order) shingle expressions once PER BRANCH — measured 8-20
    recomputations per doc in the physical plan. At cluster scale the same
    role is played by writing the shingle index to a table; in-memory/disk
    persist is the single-job equivalent."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


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
    """Keep the first row per key under a deterministic order."""
    w = Window.partitionBy(*cols).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


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


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.

    Plan: explode distinct shingles → [optional stop-shingle filter] →
    self-join on shingle (shuffle key = shingle) → count shared shingles
    per pair → |A∩B| / (|A|+|B|−|A∩B|). No crossJoin anywhere.
    """
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
    a = inv.alias("a")
    b = inv.alias("b")
    pairs = (
        a.join(b, on="shingle")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnsRenamed({"_id": "id_a", "_size": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"_id": "id_b", "_size": "size_b"}), "id_b")
        .withColumn(
            "_j",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("_j") >= threshold)
        .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
    )
    return out


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


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bands: int = 4,
    portable_hash: bool = False,
) -> DataFrame:
    """SimHash per doc: per-token hash, bit-vote, sign → bits.

    Explode tokens → for each bit position sum(±1) → assemble the long.
    n_bits conditional-sum aggs, all map-side combinable. Returns
    (_id, simhash, band0..band{n_bands-1}: near-equal contiguous bit
    chunks for Hamming-candidate joins).

    ``portable_hash=False`` (scale default): 64-bit xxhash64 per token.
    ``portable_hash=True``: 60-bit token hash from the top 15 hex digits of
    md5 — byte-identical in any engine with md5 (DuckDB:
    ``('0x' || substr(md5(t),1,15))::BIGINT``), so fingerprints, hamming
    distances, and the near-dup pair set are externally verifiable
    bit-for-bit. md5 costs more per token than xxhash64; use it when
    cross-engine verification matters more than raw hash throughput."""
    if portable_hash:
        n_bits = 60
        hash_col = F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
    else:
        n_bits = 64
        hash_col = F.xxhash64("t")
    tok = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("t")
    ).withColumn("h", hash_col)
    one = F.lit(1).cast("long")
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.shiftleft(one, i)) != 0, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(n_bits)
    ]
    agg = tok.groupBy("_id").agg(*votes)
    fp = F.lit(0).cast("long")
    for i in range(n_bits):
        # bits are disjoint → OR assembles the fingerprint without overflow
        fp = fp.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.shiftleft(one, i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = agg.select("_id", fp.alias("simhash"))
    offset = 0
    for b, width in enumerate(_band_widths(n_bits, n_bands)):
        out = out.withColumn(
            f"band{b}",
            F.shiftrightunsigned(F.col("simhash"), offset).bitwiseAND(
                F.lit((1 << width) - 1)
            ),
        )
        offset += width
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int | None = None,
    portable_hash: bool = False,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Candidates via band equality, then exact popcount filter. Returns
    (id_a, id_b, hamming).

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
            df, id_col, text_col, n_bands=n_bands, portable_hash=portable_hash
        )
    )
    cands = None
    for b in range(n_bands):
        a, c = fps.alias("a"), fps.alias("b")
        p = (
            a.join(c, F.col(f"a.band{b}") == F.col(f"b.band{b}"))
            .filter(F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"),
            )
        )
        cands = p if cands is None else cands.unionByName(p)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
