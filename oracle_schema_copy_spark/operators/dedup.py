"""Deduplication operators over a (id, text) corpus.

Five strategies, cheapest to most general:
- exact           : hash-groupBy on the raw text
- normalized      : hash-groupBy on normalize(text) (case/punct-insensitive)
- ngram_jaccard   : exact Jaccard over n-word shingles (quadratic in the
                    candidate space — the *verifier*, not the scale path)
- minhash_lsh     : banded MinHash signatures -> candidate pairs -> exact
                    Jaccard verify (the scale path: near-linear)
- simhash         : 60-bit SimHash + banded Hamming candidates

Scale notes: exact/normalized are one shuffle on a 64-bit digest (never on
the full text). MinHash computes signatures in one pass (explode shingles
-> min per permutation), then shuffles only (band, band-signature) keys;
skewed buckets (boilerplate) are capped with a bucket-size guard. All
hashing is md5-derived so the DuckDB oracles can reproduce it exactly;
xxhash64 would be ~3x faster JVM-side and is the drop-in for production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oracle_schema_copy_spark.functions.text import normalize, shingles, token_hash
from oracle_schema_copy_spark.operators import spread

# MinHash permutation parameters h_i(x) = (a_i * x + b_i) mod P, fixed so
# Spark and the SQL oracle agree. P = 2^31-1 and 28-bit base hashes keep
# a_i * h(x) < 2^63 (no int64 overflow in either engine).
MINHASH_P = 2_147_483_647
MINHASH_HEX_DIGITS = 7  # 28-bit md5-derived base hash
MINHASH_PERMS: list[tuple[int, int]] = [
    ((2 * i + 1) * 2_654_435_761 % MINHASH_P, ((i * i + i + 41) * 40_503) % MINHASH_P)
    for i in range(16)
]
SIMHASH_BITS = 60


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One surviving row (min id) per distinct text value. The shuffle key
    is sha2(text), not the text itself — constant-width at any scale."""
    h = F.sha2(F.col(text_col), 256).alias("__h")
    return (
        df.select(F.col(id_col), h)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def normalized_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup over normalized text (case/punctuation-insensitive)."""
    h = F.sha2(normalize(F.col(text_col)), 256).alias("__h")
    return (
        df.select(F.col(id_col), h)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    # filter on token count, not size(shingle_set): predicate pushdown
    # re-evaluates the filter expression below the projection, and the
    # token-count test is ~n× cheaper than re-deriving the shingle array
    return (
        spread(df)
        .filter(F.size(F.split(F.col(text_col), " ")) >= n)
        .select(F.col(id_col), shingles(F.col(text_col), n).alias("shingle_set"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Exact near-dup pairs by n-gram shingle Jaccard >= threshold.

    explode -> groupBy(shingle) collecting doc ids -> emit ordered id
    pairs locally per shingle -> count common -> |A∪B| arithmetic.
    One shuffle on the shingle + one on the id pair; a self-join on the
    exploded table would shuffle-and-sort the postings twice for the same
    pair stream. Shingles seen in a single document (the long tail) are
    dropped before any pair exists. Quadratic only in documents *sharing
    a shingle* — use minhash_lsh_pairs to pre-filter at scale.
    """
    sets = shingle_sets(df, id_col, text_col, n)
    sizes = sets.select(F.col(id_col), F.size("shingle_set").alias("n_sh"))
    ex = sets.select(F.col(id_col), F.explode("shingle_set").alias("sh"))
    postings = (
        ex.groupBy("sh")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    # ordered pairs (ids[i], ids[j]) for i < j, generated inside each posting
    pair_arrays = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    common = (
        postings.select(F.explode(pair_arrays).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _minhash_sig_cols(shingle_set: Column) -> list[Column]:
    """16 MinHash values: min over the shingle set of (a*h(s)+b) mod P."""
    hashes = F.transform(shingle_set, lambda s: token_hash(s, MINHASH_HEX_DIGITS))
    out = []
    for i, (a, b) in enumerate(MINHASH_PERMS):
        perm = F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P))
        out.append(F.array_min(perm).alias(f"mh{i}"))
    return out


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    sets = shingle_sets(df, id_col, text_col, n)
    return sets.select(F.col(id_col), *_minhash_sig_cols(F.col("shingle_set")))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    bands: int = 8,
    threshold: float = 0.2,
    max_bucket: int = 1000,
) -> DataFrame:
    """Banded-MinHash candidate pairs, verified by exact shingle Jaccard.

    16 permutations / 8 bands x 2 rows: collision probability at jaccard j
    is 1-(1-j^2)^8 (~0.28 at j=0.2, ~0.97 at j=0.6) — candidates below the
    threshold are discarded by the verify step, which only runs on the
    (tiny) candidate set. ``max_bucket`` guards against a degenerate band
    bucket (e.g. boilerplate) exploding the pair join.
    """
    rows_per_band = len(MINHASH_PERMS) // bands
    sig = minhash_signatures(df, id_col, text_col, n)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            *[F.col(f"mh{bi * rows_per_band + r}").alias(f"r{r}") for r in range(rows_per_band)],
        )
        for bi in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bucket")
    )
    # posting list per band-bucket; the size guard drops pathological
    # buckets (boilerplate) before any pair is generated
    postings = (
        buckets.groupBy("bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pair_arrays = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cands = (
        postings.select(F.explode(pair_arrays).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold)
    return cands.join(exact, ["id_a", "id_b"]).select("id_a", "id_b", "jaccard")


def simhash(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """60-bit SimHash over distinct n-word shingles (md5-derived bits).

    bit b of the signature = majority vote of bit b across shingle hashes.
    Shingles (not tokens) are the unit: with a small shared vocabulary,
    token sets converge across documents and token-SimHash degenerates.
    Computed as 60 conditional sums in one aggregation — a single pass,
    no explode shuffle (the shingle set stays an array column).
    """
    hashes = F.transform(F.col("shingle_set"), lambda t: token_hash(t, 15))  # 60 bits

    # N.B. the bit index must be bound via a closure factory, not a lambda
    # default arg — pyspark passes one lambda-variable per parameter, so a
    # 3-arg lambda would receive a Column as ``bit``
    def vote(bit: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    votes = [
        F.aggregate(hashes, F.lit(0).cast("long"), vote(b)) for b in range(SIMHASH_BITS)
    ]
    sig = None
    for b, v in enumerate(votes):
        term = F.when(v > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return shingle_sets(df, id_col, text_col, n).select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, *, max_hamming: int = 12
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found via 4
    banded 15-bit prefixes (a pair within distance 3 shares >= 1 band;
    larger distances are still usually caught — verify step is exact)."""
    sig = simhash(df, id_col, text_col)
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("simhash"), i * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("key"),
        )
        for i in range(4)
    ]
    buckets = sig.select(F.col(id_col), F.col("simhash"), F.explode(F.array(*bands)).alias("b"))
    # posting list per band bucket, each entry carrying its signature;
    # ordered pairs are emitted locally (struct sort orders by id first)
    postings = (
        buckets.groupBy("b")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash")))
            ).alias("items")
        )
        .where(F.size("items") > 1)
    )
    pair_arrays = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    F.bit_count(x["simhash"].bitwiseXOR(y["simhash"]))
                    .cast("long")
                    .alias("hamming"),
                ),
            ),
        )
    )
    return (
        postings.select(F.explode(pair_arrays).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"), F.col("p.hamming").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_cosine_pairs(
    emb: DataFrame, id_col: str, vec_col: str, *, threshold: float = 0.45
) -> DataFrame:
    """Embedding near-dup pairs: all pairs with dot-product similarity
    above threshold (embeddings are pre-normalized, so dot == cosine).

    Brute-force O(n^2) — correct baseline and the oracle-checkable path;
    at scale use similarity.lsh_bucket_candidates to prune the pair space.
    """
    from oracle_schema_copy_spark.functions.vectors import dot

    a, b = spread(emb).alias("a"), emb.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
