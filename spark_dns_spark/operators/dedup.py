"""Deduplication operators for large-scale training-data pipelines.

Four tiers, in order of cost at 100 TB:

1. **Exact** (:func:`exact_dedup`) — hash-groupBy on content digest; one
   shuffle, AQE-splittable.
2. **MinHash + LSH** (:func:`minhash_signature`, :func:`lsh_candidates`)
   — the scale path for near-dup: map-only signature (no explode), one
   shuffle on band keys, candidate verification joins only bucket-mates.
   Never all-pairs.
3. **SimHash** (:func:`simhash64`) — bitwise fingerprint; hamming-ball
   candidates via band bucketing.

All hashing uses :func:`portable_hash60` (md5-prefix parsed base-16) so
the DuckDB oracle reproduces signatures bit-for-bit — determinism that
also makes reruns/backfills idempotent at cluster scale.

Everything stays in built-in Catalyst expressions (higher-order array
functions) — whole-stage codegen, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import portable_hash60


def word_shingles(tokens: Column | str, n: int = 5) -> Column:
    """Word n-gram shingles over an already-materialized token-array
    column (``F.split(text, ' ').alias('t')`` in a prior projection).

    Map-only (no explode): a per-row array built with higher-order
    functions; docs shorter than ``n`` tokens get an empty array.

    The input MUST be a plain column reference, not an inline
    ``F.split(...)`` expression: higher-order functions are interpreted
    (not codegen'd), so an inline split would be re-evaluated on every
    ``element_at`` call — O(tokens × n) split passes per row.  Same
    contract as :func:`word_shingles_sql`'s ``toks_expr``.
    """
    toks = F.col(tokens) if isinstance(tokens, str) else tokens
    k = F.size(toks) - (n - 1)  # number of shingles
    gen = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(k >= 1, gen).otherwise(F.array().cast("array<string>"))


def word_shingles_sql(toks_expr: str, n: int = 5) -> str:
    """DuckDB rendering of :func:`word_shingles` (1-based list indexing).

    ``toks_expr`` must name an already-materialized token-list column
    (e.g. a CTE column ``t``), not an inline expression."""
    joined = " || ' ' || ".join(f"{toks_expr}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks_expr})-{n - 1}), "
        f"i -> {joined}) "
        f"ELSE [] END"
    )


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact dedup: canonical row = min id per content digest.

    One hash shuffle on the digest; the digest (not the content) is the
    shuffle key, so wide text/binary never moves twice.
    """
    return (
        df.withColumn("__digest", F.md5(F.col(content_col)))
        .groupBy("__digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .drop("__digest")
    )


#: Affine-reseeding modulus — smallest prime above 2^32.  Base hashes
#: are 32-bit and multipliers are < 2^30, so ``h*a + b`` peaks around
#: 2.3e18 < int64 max in both engines (DuckDB raises on overflow).
MINHASH_P = 4_294_967_311


def _affine_consts(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_k, b_k) per hash function, md5-derived so both
    engines bake the same literals; a_k is odd and < 2^29."""
    import hashlib

    out = []
    for k in range(num_hashes):
        a = (int(hashlib.md5(f"a{k}".encode()).hexdigest()[:7], 16) * 2 + 1)
        b = int(hashlib.md5(f"b{k}".encode()).hexdigest()[:8], 16) % MINHASH_P
        out.append((a, b))
    return out


def shingle_hashes(shingles: Column) -> Column:
    """Distinct 32-bit hashes of a shingle array — ONE md5 per shingle;
    the K minhash functions are affine reseeds of this value
    (:func:`minhash_signature`).  Also the Jaccard-verification set:
    Jaccard over identical hashes equals Jaccard over shingles up to
    32-bit collisions, and both engines hash identically so the
    comparison is still bit-exact."""
    from spark_dns_spark.functions.dnsfn import portable_hash32

    return F.array_distinct(F.transform(shingles, portable_hash32))


def minhash_signature(hashes: Column, num_hashes: int = 12) -> list[Column]:
    """K min-hash values via affine reseeding of precomputed 32-bit
    shingle hashes: ``min((h*a_k + b_k) mod P)``.  Map-only — no
    explode, no shuffle, and K× cheaper than K independent md5 passes
    (the md5 runs once, in :func:`shingle_hashes`)."""
    # NB: the per-seed lambda must take exactly ONE parameter —
    # F.transform treats a two-parameter lambda (incl. a default like
    # `k=k`) as the (element, index) form and passes the array index.
    if isinstance(hashes, str):
        # one F.expr per signature value (single py4j round-trip each)
        # instead of ~10 gateway calls of Column/lambda construction —
        # same parsed expression tree, pure integer math either way.
        return [
            F.expr(
                f"array_min(transform({hashes}, "
                f"h -> (h * {a} + {b}) % {MINHASH_P})) AS mh{k}"
            )
            for k, (a, b) in enumerate(_affine_consts(num_hashes))
        ]

    def _seeded(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)

    out = []
    for k, (a, b) in enumerate(_affine_consts(num_hashes)):
        out.append(F.array_min(F.transform(hashes, _seeded(a, b))).alias(f"mh{k}"))
    return out


def minhash_signature_sql(hashes_expr: str, num_hashes: int = 12) -> list[str]:
    return [
        f"list_aggregate(list_transform({hashes_expr}, "
        f"h -> (h * {a} + {b}) % {MINHASH_P}), 'min') AS mh{k}"
        for k, (a, b) in enumerate(_affine_consts(num_hashes))
    ]


def band_keys(num_hashes: int = 12, rows_per_band: int = 2) -> list[Column]:
    """LSH banding: concatenate ``rows_per_band`` signature values per
    band.  b=6, r=2 catches Jaccard≈0.5 pairs with ~82% probability."""
    cols = []
    for b in range(0, num_hashes, rows_per_band):
        key = F.concat_ws(
            ",", *[F.col(f"mh{b + r}").cast("string") for r in range(rows_per_band)]
        )
        cols.append(key.alias(f"band{b // rows_per_band}"))
    return cols


def lsh_candidates(sig_df: DataFrame, id_col: str, num_bands: int) -> DataFrame:
    """Candidate pairs = docs sharing ≥1 band bucket.

    One explode (num_bands rows per doc) + one self-join on the band
    bucket — the shuffle is on ``(band_idx, band_key)``, whose
    cardinality ≈ corpus size × bands; hot buckets (boilerplate text)
    are the skew risk, mitigated by AQE skew-join (session default).
    """
    bands = F.array(*[F.col(f"band{b}") for b in range(num_bands)])
    exploded = sig_df.select(
        F.col(id_col), F.posexplode(bands).alias("band_idx", "band_key")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two shingle arrays (verification step)."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db))
    union = F.size(da) + F.size(db) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def simhash64(token_hashes: Column, bits: int = 60) -> Column:
    """SimHash: per bit position, majority vote of token-hash bits;
    assemble the winning bits into one integer.  Map-only.

    ``token_hashes`` is an ``array<long>`` of (distinct) token hashes.
    Ties (vote sum == 0, incl. empty docs) resolve to bit 0 in both
    engines.
    """
    def bit_term(j: int) -> Column:
        votes = F.aggregate(
            F.transform(
                token_hashes,
                lambda h: F.when(
                    F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        return F.when(votes > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + bit_term(j)
    return out


def simhash_agg(
    df, id_col: str = "doc_id", hashes_col: str = "hs", bits: int = 60
):
    """(id, simhash) via explode + codegen'd per-bit vote sums.

    Semantically identical to :func:`simhash64` (bit j set iff strictly
    more ones than zeros; ties → 0) but executes as ONE whole-stage-
    codegen hash aggregate over exploded token hashes instead of
    ``bits`` interpreted higher-order array traversals per row — ~10x
    faster, and the right 100 TB shape anyway: partial aggregation
    combines map-side, so the shuffle carries 61 longs per document
    regardless of document width.
    """
    ex = df.select(id_col, F.explode(hashes_col).alias("_h"))
    # ONE aggregate expression string (single py4j round-trip — the
    # per-Column form costs ~800 gateway calls ≈ 1.5 s of driver-side
    # plan build): 60 sum aggregates + count(*) compose arithmetically
    # in one projection, compiling to the same partial-agg hash
    # aggregate.  votes = ones - (n - ones) > 0  ⟺  2*ones > n.
    terms = " + ".join(
        f"CASE WHEN 2 * sum(shiftright(_h, {j}) & 1) > count(*) "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(bits)
    )
    return ex.groupBy(id_col).agg(F.expr(f"{terms} AS simhash"))


def simhash64_sql(token_hashes_expr: str, bits: int = 60) -> str:
    return (
        "list_aggregate(list_transform(generate_series(0, {b}), j -> "
        "CASE WHEN list_aggregate(list_transform({th}, h -> "
        "CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0 "
        "THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END), 'sum')"
    ).format(b=bits - 1, th=token_hashes_expr)


def hamming60(a: Column, b: Column) -> Column:
    """Hamming distance between two 60-bit hashes."""
    return F.bit_count(a.bitwiseXOR(b))
