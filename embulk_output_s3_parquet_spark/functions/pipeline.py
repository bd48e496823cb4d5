"""End-to-end training-data cleaning pipeline: the composition the task
brief's operators exist for.

    raw documents
      -> exact dedup (sha256 keep-first)
      -> near-dup removal (MinHash-LSH candidates -> exact Jaccard verify,
         keep the lowest id of each duplicate cluster)
      -> quality gate (composite score threshold)
      -> annotate lang guess + token count + fingerprint

Everything is DataFrame-native (one window, two hash-joins on
(doc, shingle)/(band, bucket) keys, no cross joins, no Python UDFs), so the
same plan runs at 100 TB: shuffle volume is bounded by shingles and
candidate pairs, never doc^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import keep_first_dedup, minhash_lsh_candidates, ngram_jaccard_pairs
from .text import fingerprint, lang_id, quality_score, token_count


def near_dup_losers(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact_verify: bool = True,
) -> DataFrame:
    """Ids to DROP: for every verified near-dup pair keep the lower id.

    LSH proposes candidates (cheap at scale); pairs are then verified with
    exact Jaccard so the filter threshold is exact, not probabilistic.
    With exact_verify=False the LSH candidates are trusted as-is (faster,
    recall/precision set by the band count)."""
    if exact_verify:
        pairs = ngram_jaccard_pairs(df, threshold=threshold, k=k, text_col=text_col, id_col=id_col)
    else:
        pairs = minhash_lsh_candidates(df, k=k, text_col=text_col, id_col=id_col)
    return pairs.select(F.col("id_b").alias(id_col)).distinct()


def clean_documents(
    df: DataFrame,
    min_quality: float = 0.4,
    near_dup_threshold: float = 0.8,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full cleaning pass; returns surviving docs + analysis columns."""
    exact = keep_first_dedup(df, text_col=text_col, id_col=id_col)
    losers = near_dup_losers(
        exact, threshold=near_dup_threshold, k=k, text_col=text_col, id_col=id_col
    )
    survivors = exact.join(losers, id_col, "left_anti")
    t = F.col(text_col)
    return (
        survivors.withColumn("quality", quality_score(t))
        .filter(F.col("quality") >= min_quality)
        .withColumn("lang_guess", lang_id(t))
        .withColumn("n_tokens", token_count(t))
        .withColumn("fp", fingerprint(t))
    )
