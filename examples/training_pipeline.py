"""End-to-end training-data curation pipeline on the lakehouse.

The combined story the engine exists for: raw documents land in an IceTable
(MVCC commits, schema union), a curation pass runs entirely as DataFrame
operators — language ID, quality scoring, exact dedup, MinHash near-dedup
with quality-aware best-of-cluster survivor selection, a Gopher-style
repetition screen, a PII screen, benchmark decontamination, mixture
rebalancing to a target language mix, deterministic train/val/test
assignment, and context-window chunking — and the survivors are
committed to a curated table whose snapshot is the training set. Every step
is a pipeline operator with a DuckDB oracle elsewhere in the repo; this
file wires them together as executable documentation.

Run: python examples/training_pipeline.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from icedb_spark import IceTable, PartitionField, PartitionSpec
from icedb_spark.operators import (
    assign_splits,
    chunk_documents,
    decontaminate,
    exact_duplicates,
    language_id,
    minhash_lsh_pairs,
    mixture_sample,
    pick_canonical,
    pii_stats,
    repetition_stats,
    text_quality,
    token_stats,
)
from icedb_spark.session import get_spark
from icedb_spark.testdata import load_table


def main() -> None:
    spark = get_spark("icedb-spark-training-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. raw ingestion: documents land in a lakehouse table ------------
    raw = IceTable(
        spark,
        tempfile.mkdtemp(prefix="raw-docs-"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("src", "coalesce(source, 'unknown')")]
        ),
        sort_order=["doc_id"],
    )
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    # plant exact duplicates to give dedup something to do
    dups = docs.where(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    raw.insert(df=docs.unionByName(dups))
    corpus = raw.read()
    print(f"raw corpus: {corpus.count()} docs, partitions:",
          sorted({m.partition() for m in raw.snapshot().alive_files()}))

    # --- 2. curation: quality + language + dedup, all JVM-side -----------
    quality = text_quality(corpus).select("doc_id", "quality_score")
    lang = language_id(corpus).select("doc_id", "lang_pred")
    toks = token_stats(corpus).select("doc_id", "n_tokens")

    scored = (
        corpus.join(quality, "doc_id")
        .join(lang, "doc_id")
        .join(toks, "doc_id")
    )
    kept = scored.where(
        (F.col("quality_score") >= 0.5)
        & (F.col("n_tokens") >= 10)
        & (F.col("lang_pred") != "und")
    )
    print(f"after quality/language filters: {kept.count()} docs")

    # exact dedup: drop every non-keeper member of each duplicate group
    groups = exact_duplicates(kept, id_col="doc_id", cols=["text"])
    losers = groups.select(
        F.explode("member_ids").alias("doc_id"), F.col("keeper_id")
    ).where(F.col("doc_id") != F.col("keeper_id")).select("doc_id")
    kept = kept.join(losers, "doc_id", "left_anti")
    print(f"after exact dedup: {kept.count()} docs "
          f"({groups.count()} duplicate groups collapsed)")

    # near-dedup with quality-aware survivor selection: MinHash pairs →
    # transitive clusters → keep each cluster's HIGHEST-quality member
    # (pick_canonical), not an arbitrary one
    near = minhash_lsh_pairs(kept, threshold=0.8)
    canon = pick_canonical(near, quality.select("doc_id", "quality_score"))
    near_losers = canon.where(~F.col("is_keeper")).select("doc_id")
    kept = kept.join(near_losers, "doc_id", "left_anti")
    print(f"after MinHash near-dedup (best-of-cluster kept): "
          f"{kept.count()} docs")

    # containment screen: the ASYMMETRIC measure — a short doc quoted
    # inside a long one scores ~1 here while its Jaccard stays tiny, so
    # this catches excerpt/boilerplate-wrapper duplication MinHash
    # passes; drop the contained (shorter) side
    from icedb_spark.operators import containment_pairs

    contained = (
        containment_pairs(kept, threshold=0.95)
        .select(F.col("id_a").alias("doc_id"))
        .distinct()
    )
    kept = kept.join(contained, "doc_id", "left_anti")
    print(f"after containment (excerpt) dedup: {kept.count()} docs")

    # perplexity screen: a corpus-fit trigram LM flags encoding noise /
    # non-text (high ppl); the model is alphabet-bounded -> broadcastable
    from icedb_spark.operators import ngram_perplexity

    ppl = ngram_perplexity(kept)
    cut = ppl.agg(F.expr("percentile(ppl, 0.95)")).collect()[0][0]
    noisy = ppl.where(F.col("ppl") > cut).select("doc_id")
    kept = kept.join(noisy, "doc_id", "left_anti")
    print(f"after perplexity screen (ppl > {cut:.1f}): {kept.count()} docs")

    # repetition screen: drop degenerate boilerplate (Gopher-style)
    rep = repetition_stats(kept).where(
        (F.col("dup_2gram_frac") > 0.9) | (F.col("top_2gram_frac") > 0.5)
    ).select("doc_id")
    kept = kept.join(rep, "doc_id", "left_anti")
    print(f"after repetition screen: {kept.count()} docs")

    # PII screen: route flagged docs away from the training set
    flagged = pii_stats(kept).where(F.col("has_pii")).select("doc_id")
    kept = kept.join(flagged, "doc_id", "left_anti")
    print(f"after PII screen: {kept.count()} docs")

    # decontamination: remove anything sharing a 4-token shingle with the
    # (stand-in) eval benchmark
    bench = docs.where(F.col("doc_id") % 37 == 0)
    contaminated = decontaminate(kept, bench, n=4).where(
        F.col("contaminated")
    ).select("doc_id")
    kept = kept.join(contaminated, "doc_id", "left_anti")
    print(f"after decontamination: {kept.count()} docs")

    # SEMANTIC dedup (SemDeDup): paraphrases and re-encodings share no
    # shingle, so MinHash above cannot see them — cluster the embedding
    # space and drop near-identical vectors within each cell (the member
    # farther from its centroid survives, preserving diversity). The
    # embeddings table stands in for the corpus's document embeddings.
    from icedb_spark.operators import semdedup

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    sem = semdedup(emb, dim=64, n_clusters=16, iters=2, threshold=0.97)
    sem_losers = sem.where(~F.col("kept")).select(
        F.col("vec_id").alias("doc_id")
    )
    kept = kept.join(sem_losers, "doc_id", "left_anti")
    print(f"after semantic (embedding) dedup: {kept.count()} docs")

    # mixture rebalance: the largest subset matching a 3:1:1:1:1 language
    # target (the data-mixing step; binding language kept whole)
    kept = mixture_sample(
        kept,
        {"en": 3.0, "es": 1.0, "fr": 1.0, "de": 1.0, "zh": 1.0},
        strata_col="lang_pred", key_col="doc_id",
    )
    print(f"after mixture rebalance: {kept.count()} docs")

    # temperature rebalance option: alpha-sampling toward uniform is the
    # one-liner alternative when no explicit mixture is mandated
    # (kept = alpha_sample(kept, 0.7, "lang_pred", "doc_id"))

    # deterministic train/val/test assignment (hash-stable across runs)
    kept = assign_splits(
        kept, {"train": 0.9, "val": 0.05, "test": 0.05}, key_col="doc_id"
    )

    # --- 3. curated output: a second lakehouse table ----------------------
    curated = IceTable(
        spark,
        tempfile.mkdtemp(prefix="curated-docs-"),
        partition_spec=PartitionSpec(
            fields=[PartitionField("lang", "lang_pred")]
        ),
        sort_order=["quality_score"],
    )
    curated.insert(df=kept.select(
        "doc_id", "text", "lang_pred", "quality_score", "n_tokens", "split"
    ))
    print("curated table partitions:",
          sorted({m.partition() for m in curated.snapshot().alive_files()}))
    curated.sql(
        "select lang_pred, split, count(*) as docs, "
        "round(avg(quality_score), 3) as avg_quality, "
        "sum(n_tokens) as total_tokens "
        "from ice group by lang_pred, split order by docs desc"
    ).show()

    # context-window prep: overlapping character chunks of the train split
    chunks = chunk_documents(
        curated.read().where("split = 'train'"), size=512, overlap=64
    )
    print("train chunks:", chunks.count())

    # --- 4. real token budgets: BPE-train, encode, pack -------------------
    # packing budgets in SUBWORDS, not whitespace tokens: train a small
    # deterministic BPE vocab on the curated corpus, encode every doc,
    # and hand the true n_subwords to the concat-then-chunk packer
    from icedb_spark.operators import apply_bpe, bpe_train, pack_sequences

    train_docs = curated.read().where("split = 'train'")
    _, merges = bpe_train(train_docs, num_merges=16, min_pair_count=2)
    budgets = apply_bpe(train_docs, merges).select(
        "doc_id", F.col("n_subwords").alias("n_sub")
    )
    packed = pack_sequences(
        train_docs.join(budgets, "doc_id"),
        token_budget=2048,
        n_shards=4,
        tokens_col="n_sub",
    )
    packed.groupBy("shard").agg(
        F.count("*").alias("docs"),
        (F.max("seq_idx") + 1).alias("sequences"),
    ).orderBy("shard").show()

    # --- 5. the actual token stream: tokenize + id mapping -----------------
    # what a trainer consumes: one row per subword with its document
    # position, mapped to dense integer ids through the vocab the merge
    # table induces (broadcast join; OOV chars -> -1)
    from icedb_spark.operators import bpe_tokenize, subword_ids

    ids = subword_ids(bpe_tokenize(train_docs, merges), merges)
    print("token stream sample (doc_id, pos, subword, token_id):")
    ids.orderBy("doc_id", "pos").show(8, truncate=False)

    # --- 6. the other tokenizer family: WordPiece --------------------------
    # BERT-style greedy longest-match with ## continuations, now with an
    # IN-ENGINE TRAINED vocabulary (frequency recipe: full char coverage
    # + the top-scoring heads/continuations); the vocab broadcasts as a
    # hash set, so a 30-100k-piece production vocabulary costs the same
    # plan as this corpus-sized one
    from icedb_spark.operators import wordpiece_encode, wordpiece_train

    _, wp_vocab = wordpiece_train(train_docs, num_pieces=64, max_piece_len=3)
    wp = wordpiece_encode(train_docs, wp_vocab)
    print("wordpiece stream sample (doc_id, pos, piece):")
    wp.orderBy("doc_id", "pos").show(8, truncate=False)

    # --- 7. the third tokenizer family: Unigram-LM (SentencePiece) --------
    # exact Viterbi over scored pieces — the global optimum greedy walks
    # miss; the scores come from the IN-ENGINE EM TRAINER (substring
    # seed, Viterbi E-steps with usage re-estimation, inventory pruning;
    # integer log2-frequency scores, so runs reproduce bit-exactly)
    from icedb_spark.operators import unigram_encode, unigram_train

    _, uni_scores = unigram_train(
        train_docs, seed_pieces=96, keep_per_iter=(64, 48), max_piece_len=3
    )
    uni = unigram_encode(train_docs, uni_scores)
    print("unigram stream sample (doc_id, pos, piece):")
    uni.orderBy("doc_id", "pos").show(8, truncate=False)

    # --- 8. assembling the MIX: budgets in tokens, draws by weight --------
    # the mix spec is in TOKENS per source; fill each language's budget
    # deterministically, then draw a quality-weighted extra slice —
    # both reproducible on any engine (hash-derived randomness)
    from icedb_spark.operators import token_budget_sample, weighted_sample

    mix = token_budget_sample(
        curated.read(),
        {"en": 4_000, "de": 1_500, "zh": 1_500},
        strata_col="lang_pred",
        token_col="n_tokens",
        key_col="doc_id",
        default_budget=800,
    )
    mix.groupBy("lang_pred").agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("lang_pred").show()
    extra = weighted_sample(
        curated.read(), 50, weight_col="n_tokens", key_col="doc_id"
    )
    print("length-weighted extra slice:", extra.count(), "docs")


if __name__ == "__main__":
    main()
