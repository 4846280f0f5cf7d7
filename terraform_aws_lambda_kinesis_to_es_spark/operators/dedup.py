"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of each op at 100 TB):

* **exact**: hash-groupBy on a content digest — one shuffle keyed by the
  digest; no row ever compares against more than its own group.
* **minhash+LSH**: signatures are computed *row-locally* with higher-order
  functions (zero shuffle), then band keys explode and the only shuffle is
  the band-bucket self-join — candidates, never all pairs. Verification
  joins shingle sets back by doc id (hash join on ids).
* **simhash**: 60-bit signature computed row-locally from pre-hashed token
  arrays — literally shuffle-free; banding the signature gives the
  candidate join, same shape as minhash.
* **n-gram Jaccard**: exact similarity on candidate pairs via
  array_intersect/array_union sizes — JVM-side set ops, no Python.

Nothing in this module uses a UDF; everything is Catalyst expressions, so
whole-stage codegen covers the signature computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_es_spark.functions.hashing import (
    N_PERM,
    hash60,
    perm_hash,
)
from terraform_aws_lambda_kinesis_to_es_spark.operators.text import tokens, word_ngrams

LSH_BANDS = 32
LSH_ROWS = 2  # N_PERM == LSH_BANDS * LSH_ROWS


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate clustering on a content digest. Returns one row per
    distinct content: (keep_id = min id, n_dups)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_key"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Distinct word-n-gram shingle set per document (row-local)."""
    return df.withColumn(
        "shingles", F.array_distinct(word_ngrams(tokens(F.lower(F.col(text_col))), n))
    )


def with_minhash_signature(df: DataFrame, shingle_col: str = "shingles") -> DataFrame:
    """64-permutation MinHash signature, computed row-locally: one pass to
    hash each shingle, then an array_min per permutation. No shuffle."""
    hashed = F.transform(F.col(shingle_col), lambda s: hash60(s))
    df = df.withColumn("shingle_hashes", hashed)

    def _perm(i: int):
        # factory closure: HOF lambdas must have exactly the lambda-variable
        # arity (a default arg would become a spurious lambda variable)
        return lambda h: perm_hash(h, i)

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingle_hashes"), _perm(i)))
            for i in range(N_PERM)
        ]
    )
    return df.withColumn("mh", sig).drop("shingle_hashes")


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band the signature (LSH_BANDS bands x LSH_ROWS rows) and self-join on
    (band, band_key): the only shuffle of the pipeline, keyed so that only
    probable near-duplicates meet. Returns distinct (id_a < id_b) pairs."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.concat_ws(
                    "_", *[F.col("mh")[j * LSH_ROWS + r] for r in range(LSH_ROWS)]
                ).alias("bkey"),
            )
            for j in range(LSH_BANDS)
        ]
    )
    exploded = (
        sig_df.select(F.col(id_col), F.explode(bands).alias("b"))
        .select(id_col, F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays (JVM set ops)."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def verify_pairs_jaccard(
    pairs: DataFrame, shingle_df: DataFrame, id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """Join shingle sets back onto candidate pairs and keep exact Jaccard
    >= threshold. Two hash joins on ids; at scale the shingle side is the
    big relation and the pair side is small — Spark broadcasts the pairs."""
    sa = shingle_df.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingle_df.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), F.col("jaccard")
        )
    )


def minhash_dedup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> signature (row-local)
    -> band self-join (one keyed shuffle) -> exact-Jaccard verification."""
    shingled = with_shingles(df, text_col)
    sig = with_minhash_signature(shingled)
    cands = lsh_candidate_pairs(sig, id_col)
    return verify_pairs_jaccard(cands, shingled.select(id_col, "shingles"), id_col, threshold)


SIMHASH_BITS = 60


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document, computed entirely row-locally:
    tokens are hashed once into an array, then each bit's +/-1 weight sum
    folds over that array. Zero shuffle — the scan is the only stage."""
    hashed = F.transform(tokens(F.lower(F.col(text_col))), lambda t: hash60(t))
    df = df.withColumn("_th", hashed)

    def _bit_weight(i: int):
        return lambda acc, h: acc + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)

    bit_terms = []
    for i in range(SIMHASH_BITS):
        weight = F.aggregate(F.col("_th"), F.lit(0).cast("bigint"), _bit_weight(i))
        bit_terms.append(F.when(weight > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    simhash = bit_terms[0]
    for t in bit_terms[1:]:
        simhash = simhash + t
    return df.withColumn("simhash", simhash.cast("bigint")).drop("_th")


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    sim_df: DataFrame, id_col: str = "doc_id", max_distance: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 60-bit signature into 4 15-bit
    blocks (pigeonhole: distance <= 3 guarantees one identical block),
    self-join per block, verify exact Hamming distance. Same
    candidate-join shape as MinHash LSH — one keyed shuffle."""
    n_blocks = 4
    block_bits = SIMHASH_BITS // n_blocks
    mask = (1 << block_bits) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(j).alias("blk"),
                (F.shiftright(F.col("simhash"), j * block_bits).bitwiseAND(F.lit(mask))).alias("bval"),
            )
            for j in range(n_blocks)
        ]
    )
    exploded = sim_df.select(id_col, "simhash", F.explode(blocks).alias("b")).select(
        id_col, "simhash", F.col("b.blk").alias("blk"), F.col("b.bval").alias("bval")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )
