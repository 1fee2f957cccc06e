"""Benchmark decontamination: flag corpus documents that share any n-token
shingle with a benchmark / evaluation set.

The standard training-data hygiene pass (GPT-3 appendix C / PaLM §8 style):
before training, any document overlapping an eval benchmark by a long-enough
n-gram is flagged (and usually dropped) so eval scores measure generalization,
not memorization.

Plan shape (scale-first):
  corpus:     scan -> row-local shingle arrays -> explode (no shuffle yet)
  benchmark:  same -> distinct shingles (shuffle over the *benchmark*, which
              is tiny relative to the corpus) -> broadcast
  flag:       broadcast semi-join on a 64-bit shingle hash -> groupBy(doc_id)
The only corpus-sized shuffle is the final count keyed by doc_id; the join
itself is map-side. Shingles travel as xxhash64 longs, not strings — at
100 TB the exploded corpus stream is 8 bytes/shingle instead of ~50.
A 64-bit collision adds a false positive with probability ~n_bench/2^64 per
shingle — negligible for any real benchmark; pass ``hash_shingles=False``
for exact string matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import ngram_col, tokens


def shingle_set(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> DataFrame:
    """(id, shingle) pairs, distinct per document — row-local shingling then
    one explode; no shuffle."""
    grams = F.array_distinct(ngram_col(tokens(F.col(text_col)), n))
    return df.select(F.col(id_col), F.explode(grams).alias("shingle"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    hash_shingles: bool = True,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per corpus document: how many distinct n-token shingles it shares with
    ``benchmark``, and whether it is contaminated at all.

    Returns ``(id_col, n_shared_shingles bigint, contaminated boolean)`` with
    one row per corpus document (zero-filled for clean docs).

    ``broadcast_benchmark`` should stay True whenever the benchmark's
    distinct-shingle set fits in executor memory (the normal case — eval sets
    are MBs against a TB-scale corpus); set False to fall back to a shuffle
    join for a benchmark that is itself huge.
    """
    key = (
        (lambda c: F.xxhash64(c)) if hash_shingles else (lambda c: c)
    )
    corpus_sh = shingle_set(corpus, text_col, id_col, n).select(
        F.col(id_col), key(F.col("shingle")).alias("k")
    )
    bench_sh = (
        shingle_set(benchmark, text_col, id_col, n)
        .select(key(F.col("shingle")).alias("k"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    counts = (
        corpus_sh.join(bench_sh, "k", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared_shingles"))
    )
    return (
        corpus.select(id_col)
        .join(counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shared_shingles"), F.lit(0).cast("long")).alias(
                "n_shared_shingles"
            ),
            (F.coalesce(F.col("n_shared_shingles"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    dim: int | None = None,
    n_planes: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose cosine
    to ANY benchmark vector reaches ``threshold`` — the semantic sibling
    of :func:`decontaminate` (paraphrased eval leakage that shares no
    8-gram still lands next to the benchmark in embedding space).

    Returns ``(id_col, max_cosine double, contaminated boolean)``, one
    row per corpus vector (``max_cosine`` over the whole benchmark).

    Plan shape (scale-first): both sides normalize row-locally; the
    benchmark (eval sets are thousands of vectors against a TB-scale
    corpus) broadcasts, so the |corpus|x|bench| cosine fold is one
    map-side nested-loop join with ZERO corpus shuffle, and the per-id
    max is a partial aggregate (map-side combined). Exact by default.
    ``n_planes`` switches to the d07-style hyperplane-LSH prefilter
    (requires ``dim``): only bucket-colliding pairs pay the exact
    cosine — work drops ~2^planes-fold; recall becomes approximate and
    clean rows surface with ``max_cosine = NULL`` (never compared)."""
    from .similarity import _as_double, _norm, lsh_bucket

    def prep(df: DataFrame, side: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(f"{side}_id"),
            _as_double(F.col(vec_col)).alias(f"{side}_v"),
        ).withColumn(f"{side}_n", _norm(F.col(f"{side}_v")))
        if n_planes:
            if dim is None:
                raise ValueError("dim is required for the LSH prefilter")
            out = out.withColumn(
                "bucket", lsh_bucket(F.col(f"{side}_v"), dim, n_planes)
            )
        return out

    c, b = prep(corpus, "c"), prep(benchmark, "b")
    dot = F.aggregate(
        F.zip_with(F.col("c_v"), F.col("b_v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("c_n") * F.col("b_n")), 6)
    if n_planes:
        joined = c.join(F.broadcast(b), "bucket")
    else:
        joined = c.join(F.broadcast(b))
    scores = (
        joined.select(F.col("c_id"), cos.alias("cos"))
        .groupBy("c_id")
        .agg(F.max("cos").alias("max_cosine"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(scores.withColumnRenamed("c_id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.col("max_cosine"),
            F.coalesce(
                F.col("max_cosine") >= F.lit(threshold), F.lit(False)
            ).alias("contaminated"),
        )
    )
