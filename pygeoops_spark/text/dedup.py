"""Deduplication operators: exact, prefix-fingerprint, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale notes (the design target is ~10^12 docs):
  * exact dedup groups by xxhash64(text) first so the shuffle carries
    8-byte keys, not document bodies; the survivor id is min(id) per
    group (hash collisions at 64 bit are ~n^2/2^65 — negligible, and
    the exact variant regroups by full text within hash groups).
  * shingle explodes produce (doc, shingle) pairs — the join/group keys
    are hashes, map-side combined before shuffling.
  * MinHash signatures are computed in ONE groupBy with k min()
    aggregations (map-side partial aggregation; no per-doc Python).
    LSH bands then bucket-join candidates; exact Jaccard verifies.
  * SimHash: 64-bit signature via per-bit weighted sums in one groupBy;
    banding on 16-bit chunks finds candidates within Hamming distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic affine hash family for MinHash: h_j(x) = (a_j*x+b_j) % P
MERSENNE_P = (1 << 61) - 1


def _hash_family(k: int) -> list[tuple[int, int]]:
    # fixed multiplicative-congruential constants (seedless, reproducible)
    params = []
    a, b = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    for j in range(k):
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (b * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        params.append((a | 1, b))
    return params


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: keep_id = min(id), dup_count.

    Two-stage: hash-group (8-byte shuffle keys) then exact text group
    within each hash bucket.
    """
    h = df.select(F.col(id_col), F.col(text_col), F.xxhash64(text_col).alias("_h"))
    return (
        h.groupBy("_h", text_col)
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
        .select("keep_id", "dup_count")
    )


def prefix_fingerprint_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", prefix_len: int = 40
) -> DataFrame:
    """Group docs sharing a text prefix (cheap near-dup heuristic).
    Output: keep_id, dup_count per prefix group."""
    return (
        df.groupBy(F.substring(F.col(text_col), 1, prefix_len).alias("_p"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
        .select("keep_id", "dup_count")
    )


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array<string> (pure SQL)."""
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))
    )


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) exploded pairs + per-doc shingle count."""
    s = df.select(F.col(id_col), word_shingles(text_col, n).alias("_shingles"))
    s = s.withColumn("_n_sh", F.size("_shingles"))
    return s.select(id_col, "_n_sh", F.explode("_shingles").alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    Distributed set-similarity join: explode shingles, self-join on the
    shingle (hashes as keys at scale), count the intersection, compute
    |A ∩ B| / (|A| + |B| - |A ∩ B|). Output: id_a < id_b, jaccard.
    """
    # join on the shingle's 8-byte hash, not the string: the shuffle
    # carries longs (64-bit collisions are ~n^2/2^65 — negligible, and
    # a collision only inflates `common` for one pair by 1)
    sh = shingle_table(df, id_col, text_col, n).withColumn(
        "_sh", F.xxhash64("shingle")
    )
    # scale-essential prefilter: shingles occurring once can never form
    # a pair — drop them before the self-join (at web scale the unique
    # tail is the overwhelming majority of shingles)
    repeated = (
        sh.groupBy("_sh").count().where(F.col("count") > 1).select("_sh")
    )
    sh = sh.join(repeated, "_sh", "left_semi")
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_n_sh").alias("na"), "_sh")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_n_sh").alias("nb"), "_sh")
    common = (
        a.join(b, "_sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    # threshold on the UNROUNDED value (oracle does the same); round
    # only the reported column
    return (
        common.where(jac >= threshold)
        .withColumn("jaccard", F.round(jac, 6))
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3, k: int = 32
) -> DataFrame:
    """k-permutation MinHash signature per doc, one groupBy (map-side
    combined). Signature element j = min over shingles of h_j(xxhash64)."""
    sh = shingle_table(df, id_col, text_col, n)
    # ANSI-safe arithmetic: keep x and a below 2^31 so x*a + b < 2^63
    # (the driver session may run with spark.sql.ansi.enabled=true,
    # where silent long wraparound becomes a runtime error)
    m31 = (1 << 31) - 1
    x = F.pmod(F.xxhash64("shingle"), F.lit(m31))
    aggs = [
        F.min(x * F.lit(a % m31) + F.lit(b % m31)).alias(f"mh_{j}")
        for j, (a, b) in enumerate(_hash_family(k))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via LSH banding, verified with exact
    Jaccard on the candidates only (two shuffles: signature groupBy and
    band bucket-join; verification joins shingles just for candidates).
    """
    rows_per_band = k // bands
    sig = minhash_signatures(df, id_col, text_col, n, k).cache()
    band_cols = [
        F.hash(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        id_col,
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("b"), F.col(f"band_{b}").alias("v")) for b in range(bands)])
        ).alias("band"),
    ).select(id_col, "band.b", "band.v")
    cands = (
        stacked.alias("l")
        .join(stacked.alias("r"), ["b", "v"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    # verify candidates with exact jaccard (hashed shingles as keys)
    sh = shingle_table(df, id_col, text_col, n).withColumn("_sh", F.xxhash64("shingle"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_n_sh").alias("na"), "_sh")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_n_sh").alias("nb"), "_sh")
    common = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "_sh"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.where(jac >= threshold)
        .withColumn("jaccard", F.round(jac, 6))
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """SimHash over words: bit b of the signature is set when the sum of
    (+1/-1) contributions of word-hash bit b is positive. One explode +
    one groupBy with `bits` conditional sums (map-side combined)."""
    w = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_w")
    ).withColumn("_h", F.xxhash64("_w"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = w.groupBy(id_col).agg(*aggs)
    # disjoint bit contributions => plain addition assembles the word
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(
            F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """Pairs within Hamming distance via 16-bit-chunk banding (pigeonhole:
    distance<=3 guarantees a shared chunk; larger distances are found
    with high probability). Output: id_a, id_b, hamming."""
    sig = simhash_signatures(df, id_col, text_col).cache()
    chunks = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("v"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select(id_col, "simhash", "ch.c", "ch.v")
    cand = (
        chunks.alias("l")
        .join(chunks.alias("r"), ["c", "v"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"l.simhash").alias("sig_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"r.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_keep_first(
    df: DataFrame, key: F.Column, id_col: str = "doc_id"
) -> DataFrame:
    """Generic survivor selection: first id per key (window, one shuffle)."""
    w = Window.partitionBy(key).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
