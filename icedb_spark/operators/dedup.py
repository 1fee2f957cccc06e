"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-duplicates.

Scale design (the point of these at 100 TB):

* **exact**: one hash-groupBy on a digest of the compared columns — map-side
  partial aggregation, a single shuffle keyed by digest.
* **MinHash+LSH**: shingle explode → per-doc signature (one shuffle, partial
  min pushed map-side) → band-bucket self-join (shuffle join keyed by
  ``(band, band_hash)``; bucket sizes are bounded by construction) → exact
  Jaccard verification only on candidates. Never O(n²).
* **SimHash**: per-doc sketch in one aggregation, band blocking for
  candidate pairs (15-bit bands at scale: 32 768 bucket values/band),
  popcount verification.
* **n-gram Jaccard**: exact pairwise measure gated by a LOSSLESS prefix
  filter (rarest-first global shingle order) — stop-shingles never become
  blocking keys, so the exact variant survives skewed corpora too.
* **embedding cosine**: brute-force verify here;
  :func:`icedb_spark.operators.similarity.cosine_topk_lsh` is the scale path.

All hashes are md5-derived (:mod:`icedb_spark.operators.hashing`) so any
engine can reproduce the exact outputs.

Caching contract: the multi-reference pipelines (``minhash_lsh_pairs``,
``ngram_jaccard_pairs``) ``persist()`` small intermediates (signatures,
exploded shingles, candidate pairs) and return LAZY DataFrames, so the
caches stay registered for the application. Long-lived drivers running many
corpora should materialize the result and then
``spark.catalog.clearCache()`` (or unpersist selectively) between corpora.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash60
from .text import tokens

BAND_SEED = 1_000
SIMHASH_SEED = 777

# MinHash permutations: one md5 base hash per shingle, then cheap affine
# permutations h_j = (a_j·h + b_j) mod p over a 31-bit prime (the standard
# universal-hash family). 16× fewer digests than hashing per permutation,
# and the constants are md5-derived so any engine reproduces them.
MINHASH_PRIME = 2_147_483_647


def minhash_perm_constants(num_perm: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for j in range(num_perm):
        a = int(hashlib.md5(f"minhash:a:{j}".encode()).hexdigest()[:8], 16) % (
            MINHASH_PRIME - 1
        ) + 1
        b = int(hashlib.md5(f"minhash:b:{j}".encode()).hexdigest()[:8], 16) % (
            MINHASH_PRIME
        )
        out.append((a, b))
    return out


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct token k-gram shingles of normalized text; documents shorter
    than ``k`` tokens contribute their whole normalized text as one shingle."""
    toks = tokens(text)
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", cols: list[str] | None = None
) -> DataFrame:
    """Exact duplicate groups by digest of the compared columns.

    Returns one row per duplicate *group* (count > 1): the digest, group
    size, the canonical keeper (min id) and the sorted member ids.
    """
    cols = cols or ["text"]
    # coalesce each column distinctly: concat_ws SKIPS nulls, so without a
    # sentinel ('x', NULL) and (NULL, 'x') would collide into one digest
    # and non-duplicates would be reported (and dropped) as duplicates
    digest = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x01<NULL>"))
                for c in cols
            ],
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), digest.alias("digest"))
        .groupBy("digest")
        .agg(
            F.count("*").alias("group_size"),
            F.min("id").alias("keeper_id"),
            F.sort_array(F.collect_list("id")).alias("member_ids"),
        )
        .where(F.col("group_size") > 1)
    )


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: ``mh0..mh{P-1}`` columns.

    ZERO-shuffle formulation: the md5 base hash is computed once per shingle
    into an int array (one projection), then each permutation is an affine
    transform + ``array_min`` over that array — all row-local, no explode,
    no exchange. The earlier explode→groupBy version shipped P longs per doc
    through a shuffle; this one keeps the whole signature stage inside one
    WholeStageCodegen span (measured ~2× on the LSH pipeline).

    One output row per input row: callers with duplicate ids must dedupe
    upstream (the explode→groupBy variant instead unioned shingles of
    duplicate ids — with unique ids the two are value-identical).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            shingles(F.col(text_col), shingle_k),
            lambda s: F.pmod(hash60(s, 0), F.lit(MINHASH_PRIME)),
        ).alias("__h"),
    )
    # Optimization r13 (guide §4.2; the simhash/trainer pattern): the P
    # affine-permutation mins are pure int64 arithmetic over the
    # md5-derived base hashes (a·h + b ≤ 2^62 — no overflow; pmod of
    # non-negatives = %), so one Arrow pass computes all signatures
    # row-locally — replacing P array-transform+array_min HOF trees
    # whose Catalyst analysis dominated construction. The md5 base hash
    # stays JVM-side (exactness anchor). Irregular rows fall back to a
    # per-row loop replicating array_min's null-skipping.
    consts = minhash_perm_constants(num_perm)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = ", ".join(
        [f"id {id_type}"] + [f"mh{j} long" for j in range(num_perm)]
    )

    def _sigs(batches):
        import numpy as np
        import pyarrow as pa_

        A = np.array([a for a, _ in consts], dtype=np.int64)
        B = np.array([b for _, b in consts], dtype=np.int64)
        for bt in batches:
            ids = bt.column(0)
            hc = bt.column(1)
            n = len(ids)
            if n == 0:
                continue
            regular = hc.null_count == 0 and hc.values.null_count == 0
            mhs: list
            if regular:
                offs = hc.offsets.to_numpy()
                lens = offs[1:] - offs[:-1]
                regular = bool((lens > 0).all())
            if regular:
                vals = hc.values.to_numpy()
                vals = vals[offs[0]:offs[-1]]
                starts = (offs[:-1] - offs[0]).astype(np.int64)
                mhs = [
                    np.minimum.reduceat((A[j] * vals + B[j]) % MINHASH_PRIME,
                                        starts)
                    for j in range(num_perm)
                ]
            else:
                rows = hc.to_pylist()
                cols = [[] for _ in range(num_perm)]
                for hv in rows:
                    hs = [x for x in (hv or []) if x is not None]
                    for j in range(num_perm):
                        cols[j].append(
                            min((A[j] * x + B[j]) % MINHASH_PRIME
                                for x in hs) if hs else None
                        )
                mhs = [pa_.array(c, pa_.int64()) for c in cols]
            yield pa_.record_batch(
                [ids] + [pa_.array(np.asarray(m), pa_.int64())
                         if not isinstance(m, pa_.Array) else m
                         for m in mhs],
                names=["id"] + [f"mh{j}" for j in range(num_perm)],
            )

    return base.mapInArrow(_sigs, out_schema)


def _band_hashes(sig: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(id, band, band_hash) — one row per band per document."""
    rows = num_perm // bands
    band_cols = []
    for b in range(bands):
        concat = F.concat_ws(
            ",", *[F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        )
        band_cols.append(
            F.struct(F.lit(b).alias("band"), hash60(concat, BAND_SEED + b).alias("bh"))
        )
    return sig.select(
        "id", F.explode(F.array(*band_cols)).alias("e")
    ).select("id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    persist_signatures: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact Jaccard.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold,
    rounded to 6 decimals (deterministic across engines).

    ``persist_signatures`` caches the signature table so the band self-join
    doesn't recompute the shingle explode + min-agg for each side — the
    signatures are P longs per document, negligible next to the corpus.
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    # NOTE(measured): carrying the shingle sets through the signature
    # aggregation (collect_set) to avoid recomputing them for the verify
    # joins is SLOWER — the signature shuffle then hauls the sets instead of
    # P longs per document. Recomputing shingles JVM-side from the (columnar,
    # already-cached) text is cheaper than shuffling them, locally and at
    # scale.
    sig = minhash_signature(df, id_col, text_col, num_perm, shingle_k)
    if persist_signatures:
        from pyspark import StorageLevel

        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    bh = _band_hashes(sig, num_perm, bands)
    cand = (
        bh.alias("a")
        .join(bh.alias("b"), on=[F.col("a.band") == F.col("b.band"),
                                 F.col("a.bh") == F.col("b.bh"),
                                 F.col("a.id") < F.col("b.id")])
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # measured: with splittable/parallel input the candidate-id prefilter
    # (see _jaccard_verify) wins here too — shingle re-derivation drops from
    # O(corpus)x2 to O(candidates), ~2.9x on the cold path at sf0.1. (Under
    # a serial single-split scan the semi-join barrier used to dominate;
    # that regime is gone now that callers feed multi-split input.)
    return _jaccard_verify(df, cand, id_col, text_col, shingle_k, threshold)


def _jaccard_verify(
    df: DataFrame,
    cand: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    threshold: float,
    prefilter: bool = True,
) -> DataFrame:
    """Exact Jaccard over candidate pairs only.

    With ``prefilter``, shingle arrays are computed AFTER a semi-join down
    to the docs that appear in some candidate pair — at scale candidates are
    a vanishing fraction of the corpus, so the shingle re-derivation is
    O(candidates), not O(corpus), per verify side. The candidate table is
    persisted because it is referenced three times. The prefiltered shingle
    table is NOT persisted: an r12 experiment that held it MEMORY_AND_DISK
    for the two pair-side joins was value-neutral for the operator itself
    (within host noise at bench scale) but, because operator-internal
    persists outlive the caller's action (the documented contract leaves
    cache lifetime to callers), the leaked blocks accumulated across a
    multi-query session and slowed EVERY later query — a measured 16.5 s
    → 27 s full-bench regression. Reverted; the per-side recomputation is
    the cheaper steady-state.
    """
    sets_src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__txt"))
    if prefilter:
        from pyspark import StorageLevel

        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
        cand_ids = (
            cand.select(F.col("id_a").alias("id"))
            .union(cand.select(F.col("id_b").alias("id")))
            .distinct()
        )
        # candidate ids are a vanishing fraction of the corpus (8 bytes
        # each) — broadcast the semi-join so the corpus text is never
        # shuffled/sorted just to be prefiltered (guide §3.1; the
        # pre-AQE plan showed SortMergeJoin LeftSemi here)
        sets_src = sets_src.join(F.broadcast(cand_ids), "id", "left_semi")
    sets = sets_src.select("id", shingles(F.col("__txt"), shingle_k).alias("sh"))
    # join strategy left to the planner DELIBERATELY (guide §3.1, decided
    # by r12 measurement, not omission): an experiment that pinned
    # F.broadcast(sets) on both pair sides — paired with a persist of
    # `sets` — regressed the full bench 16.5 s → 26-27 s session-wide: at
    # bench scale candidates are NOT a vanishing fraction, so the pin
    # force-broadcast near-corpus-size shingle-array relations twice per
    # call and the blocks lingered in the driver heap across the session.
    # The un-hinted planner picks the same broadcast only when its size
    # estimate says the side is genuinely small, which is the right call
    # at every scale.
    return (
        cand.join(
            sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"),
            "id_a",
        )
        .join(
            sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicates via PREFIX FILTERING.

    Blocker: shingles get a global rarest-first total order (document
    frequency, then value); each document blocks only on its prefix of
    length ``|d| − ⌈t·|d|⌉ + 1`` under that order. The classic prefix-filter
    lemma (PPJoin) makes this LOSSLESS — any pair with Jaccard ≥ t shares a
    prefix shingle — while stop-shingles (high df) sort to the END of every
    document and never become blocking keys, so the candidate join cannot
    blow up on common shingles the way a naive shared-shingle blocker does.

    Cost shape at scale: one df-count aggregation (shuffle by shingle), one
    per-document window (shuffle by id), then a self-join whose per-key
    width is bounded by prefix membership instead of raw shingle frequency.
    Exactness is oracle-checked (d03): the output pair set is identical to
    the naive blocker's.

    Optimization r12 (guide §2.3 / §8 — decide with small rows): every
    blocking stage keys on ``xxhash64(shingle)`` (8 bytes) instead of the
    shingle string, so the df-count shuffle, the ranking window sort and
    the candidate equi-join move/compare longs, not text. Losslessness is
    preserved: the prefix lemma holds under ANY global total order on the
    key universe (if A∩B misses A's first ``|A|−⌈t·|A|⌉+1`` keys, then
    ``|A∩B| ≤ ⌈t·|A|⌉−1`` < the bound), equal shingles always share a
    hash, and a hash collision can only MERGE two keys — adding candidate
    pairs, never losing one — while the exact string-set verification
    that follows discards any extra candidate. Output identical.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("shingle"),
    ).select("id", F.xxhash64("shingle").alias("sh"))
    # persist the exploded (id, shingle-hash) table: it is referenced by
    # the df-count agg, the ranking window AND both self-join sides — one
    # materialization instead of four shingle-explode re-derivations. At
    # scale this is the same O(corpus tokens) relation the blocker must
    # shuffle anyway, at 8 bytes per shingle instead of the string.
    ex = ex.persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = ex.groupBy("sh").agg(F.count("*").alias("df"))
    ranked = (
        ex.join(dfreq, "sh")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("id").orderBy("df", "sh")),
        )
        .withColumn("ds", F.count("*").over(Window.partitionBy("id")))
    )
    # the -1e-9 guards float fuzz in t·|d|: an over-ceil would SHRINK the
    # prefix and break the lossless guarantee; an under-ceil only keeps one
    # extra shingle (harmless)
    prefix = ranked.where(
        F.col("rn")
        <= F.col("ds") - F.ceil(F.lit(threshold) * F.col("ds") - 1e-9) + 1
    ).select("id", "sh", "ds")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col("a.id") < F.col("b.id"),
                # PPJoin length filter, also lossless: J >= t forces
                # min(|A|,|B|)/max(|A|,|B|) >= t (|A∩B| <= min, |A∪B| >= max)
                F.least(F.col("a.ds"), F.col("b.ds"))
                >= F.lit(threshold) * F.greatest(F.col("a.ds"), F.col("b.ds"))
                - 1e-9,
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _jaccard_verify(df, cand, id_col, text_col, shingle_k, threshold)


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram CONTAINMENT near-duplicates — the ASYMMETRIC measure
    ``C(A→B) = |A∩B| / |A|``: a short document quoted or excerpted
    inside a long one scores near 1 even though its Jaccard is tiny
    (the union is dominated by B), so containment catches
    quote/subset/boilerplate-wrapper duplication that
    :func:`ngram_jaccard_pairs` structurally cannot. Output is DIRECTED
    ``(id_a, id_b, containment)`` — "id_a is contained in id_b";
    mutually-equal documents appear in both directions, by definition.

    Same lossless prefix-filter shape as the Jaccard join, adapted to
    the asymmetric bound: if ``|A∩B| >= ceil(t·|A|)`` then A's
    RAREST-FIRST prefix of length ``|A| − ceil(t·|A|) + 1`` must
    intersect B (fewer shared shingles than the bound would otherwise
    fit outside the prefix) — so only A-prefix shingles become blocking
    keys, while the B side posts all of its shingles. There is no
    length filter (B may be arbitrarily long — that's the point), so
    the candidate width on a shingle is ``prefix_count × df``;
    rarest-first ordering keeps stop-shingles out of every prefix,
    which is what bounds the join at corpus scale. Exact containment is
    then verified on the candidates only (semi-join-pruned shingle
    re-derivation, O(candidates) not O(corpus)).

    Optimization r12 (guide §2.3 / §8): blocking keys are
    ``xxhash64(shingle)`` longs, not shingle strings — same lossless
    argument as :func:`ngram_jaccard_pairs` (the prefix lemma holds for
    any total order on keys; collisions only merge keys, which can only
    ADD candidates; the exact string-set verification below removes any
    extra). The B side posts all of its shingles, so at corpus scale
    this shrinks the widest relation of the operator ~3-5x.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("shingle"),
    ).select("id", F.xxhash64("shingle").alias("sh"))
    ex = ex.persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = ex.groupBy("sh").agg(F.count("*").alias("df"))
    ranked = (
        ex.join(dfreq, "sh")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df", "sh")
            ),
        )
        .withColumn("ds", F.count("*").over(Window.partitionBy("id")))
    )
    # -1e-9: an over-ceil would shrink the prefix and break losslessness
    prefix = ranked.where(
        F.col("rn")
        <= F.col("ds") - F.ceil(F.lit(threshold) * F.col("ds") - 1e-9) + 1
    ).select("id", "sh")
    cand = (
        prefix.alias("a")
        .join(
            ex.alias("b"),
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col("a.id") != F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sets = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__txt"))
        # broadcast the tiny candidate-id set — never shuffle the corpus
        # text for the prefilter (guide §3.1)
        .join(F.broadcast(cand_ids), "id", "left_semi")
        .select("id", shingles(F.col("__txt"), shingle_k).alias("sh"))
        # NOT persisted for the two pair-side joins: the r12 experiment
        # that cached this leaked blocks past the caller's action and
        # slowed the whole session (see _jaccard_verify's docstring)
    )
    # join strategy left to the planner deliberately — a pinned
    # F.broadcast(sets) on both pair sides was tried and reverted in r12
    # (near-corpus-size broadcasts at bench scale, session-wide heap
    # cost; see _jaccard_verify's in-code note for the measurements)
    return (
        cand.join(
            sets.withColumnRenamed("id", "id_a")
            .withColumnRenamed("sh", "sh_a"),
            "id_a",
        )
        .join(
            sets.withColumnRenamed("id", "id_b")
            .withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size("sh_a"),
                6,
            ).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash sketch over token occurrences.

    Bit ``b`` of the sketch is 1 iff the sum over tokens of ±1 (by bit ``b``
    of the token hash) is positive. One explode + one aggregation.
    """
    # hash each token ONCE in a projection below the aggregate: embedding
    # hash60 inside every per-bit sum makes Catalyst evaluate the md5 32x
    # per token row (no CSE across aggregate functions — seen in the r12
    # before-plan), so the partial aggregate was paying 32 md5s per token.
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("id", hash60(F.col("tok"), SIMHASH_SEED).alias("__h"))
    # Optimization r13 (guide §4.2; the §2-trainer pattern): the former
    # 32-sum aggregate plus the 32-term assembly chain cost ~0.6 s of
    # Catalyst ANALYSIS per construction. The per-bit ±1 sums are pure
    # integer counts — order-independent — so a numpy pass emits
    # per-(batch, id) partials (n tokens, per-bit one-counts) and a tiny
    # two-stage JVM merge closes them: s_b = 2·ones_b − n, bit set iff
    # s_b > 0, EXACTLY the former arithmetic (a null token hash counted
    # −1 on every bit before, i.e. zero ones and one n — reproduced).
    id_type = df.schema[id_col].dataType.simpleString()

    def _partials(batches):
        import numpy as np
        import pyarrow as pa_

        shifts = np.arange(bits, dtype=np.int64)
        for b in batches:
            ids_col = b.column(0)
            h_col = b.column(1)
            nrows = len(ids_col)
            if nrows == 0:
                continue
            ids = ids_col.to_pylist()
            if h_col.null_count == 0:
                H = h_col.to_numpy()
                B = ((H[:, None] >> shifts[None, :]) & 1).astype(np.int64)
            else:
                hl = h_col.to_pylist()
                B = np.zeros((nrows, bits), dtype=np.int64)
                for i, hv in enumerate(hl):
                    if hv is not None:
                        B[i] = (int(hv) >> shifts) & 1
            groups: dict = {}
            for i, g in enumerate(ids):
                groups.setdefault(g, []).append(i)
            out_ids, out_n, out_ones = [], [], []
            for g, idx in groups.items():
                out_ids.append(g)
                out_n.append(len(idx))
                out_ones.append([int(x) for x in B[idx].sum(axis=0)])
            yield pa_.record_batch(
                [
                    pa_.array(out_ids, ids_col.type),
                    pa_.array(out_n, pa_.int64()),
                    pa_.array(out_ones, pa_.list_(pa_.int64())),
                ],
                names=["id", "n", "ones"],
            )

    parts = ex.mapInArrow(
        _partials, f"id {id_type}, n long, ones array<long>"
    )
    per_bit = (
        parts.select(
            "id", "n", F.posexplode("ones").alias("b", "ones")
        )
        .groupBy("id", "b")
        .agg(F.sum("n").alias("n"), F.sum("ones").alias("ones"))
    )
    contrib = F.when(
        2 * F.col("ones") - F.col("n") > 0,
        F.pow(F.lit(2.0), F.col("b")).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return per_bit.groupBy("id").agg(F.sum(contrib).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    band_bits: int = 8,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: band blocking (pigeonhole: a pair
    within hamming ≤ bands−1 shares at least one unchanged band), verified
    with an exact popcount.

    SCALE: ``band_bits`` sets the bucket-value space per band — 8-bit bands
    give only 256 buckets (within-bucket self-join goes quadratic at corpus
    scale); the scale configuration is ``bits=60, band_bits=15`` (4 bands ×
    32 768 values, 128× narrower buckets; 60 because the md5-derived hash
    is 60-bit — a 64-bit sketch would carry 4 degenerate always-zero bits).
    Recall guarantee needs ``bits // band_bits > max_hamming`` (pigeonhole);
    configs that violate it raise unless ``allow_partial_recall`` makes the
    probabilistic-recall tradeoff explicit — silent recall loss is exactly
    the failure mode band blocking is supposed to prevent.
    """
    if bits // band_bits <= max_hamming and not allow_partial_recall:
        raise ValueError(
            f"need bits//band_bits > max_hamming bands for full recall "
            f"(got {bits // band_bits} bands, max_hamming={max_hamming}); "
            f"pass allow_partial_recall=True to accept probabilistic recall"
        )
    sk = simhash(df, id_col, text_col, bits)
    return hamming_pairs(
        sk, "id", "simhash", bits, max_hamming, band_bits,
        allow_partial_recall=allow_partial_recall,
    )


def hamming_pairs(
    sketches: DataFrame,
    id_col: str,
    sketch_col: str,
    bits: int,
    max_hamming: int = 3,
    band_bits: int = 8,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Generic near-dup pair search over ANY packed-integer sketch column
    (SimHash, perceptual aHash, ...): band blocking (pigeonhole — a pair
    within hamming ≤ bands−1 shares at least one unchanged band), then an
    exact popcount verify. The same recall guarantee/raise contract as
    :func:`simhash_pairs` (which delegates here).

    Output: ``(id_a, id_b, hamming)`` with ``id_a < id_b``.
    """
    n_bands = bits // band_bits
    if n_bands <= max_hamming and not allow_partial_recall:
        raise ValueError(
            f"need bits//band_bits > max_hamming bands for full recall "
            f"(got {n_bands} bands, max_hamming={max_hamming}); pass "
            f"allow_partial_recall=True to accept probabilistic recall"
        )
    sk = sketches.select(
        F.col(id_col).alias("id"), F.col(sketch_col).alias("_sk")
    )
    mask = (1 << band_bits) - 1
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("_sk"), b * band_bits)
            .bitwiseAND(F.lit(mask))
            .alias("bv"),
        )
        for b in range(n_bands)
    ]
    bands = sk.select(
        "id", "_sk", F.explode(F.array(*band_cols)).alias("e")
    ).select("id", "_sk", F.col("e.band").alias("band"), F.col("e.bv").alias("bv"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), on=[F.col("a.band") == F.col("b.band"),
                                    F.col("a.bv") == F.col("b.bv"),
                                    F.col("a.id") < F.col("b.id")])
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a._sk").alias("sh_a"),
            F.col("b._sk").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def auto_n_planes(n_vectors: int, target_bucket: int = 64) -> int:
    """Hyperplane count that keeps the EXPECTED bucket width near
    ``target_bucket`` vectors: ``ceil(log2(n / target))`` clamped to
    [4, 24]. At 10⁹ vectors that is 24 planes (~16M buckets); the bucketed
    self-join stays ~n·target instead of n²."""
    import math

    return max(4, min(24, math.ceil(math.log2(max(2, n_vectors / target_bucket)))))


def lsh_bucket_stats(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    n_planes: int = 6,
) -> DataFrame:
    """Bucket-size histogram for the hyperplane LSH — capacity planning and
    drop accounting for ``max_bucket`` caps (what a silent cap would hide)."""
    from .similarity import lsh_view

    return (
        lsh_view(
            df, vec_col, vec_col, dim, n_planes, "__id", with_vec=False
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


def embedding_dup_pairs_lsh(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int | None = 6,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-duplicates at scale: candidates limited to pairs whose
    vectors share a random-hyperplane LSH bucket, then exact cosine verify.

    Work is ~n²/2^planes instead of n² (one bucketed self-join); recall is
    approximate — near-identical vectors almost always land in the same
    bucket, but pairs straddling a hyperplane are missed. The md5-derived
    hyperplanes (shared with :mod:`.similarity`) keep the bucketing
    deterministic and oracle-reproducible.

    ``n_planes=None`` auto-scales the plane count with the corpus size
    (:func:`auto_n_planes`) so the operator cannot silently go quadratic as
    the corpus grows. ``max_bucket`` hard-caps bucket width: vectors in
    oversized buckets are EXCLUDED from pairing (bounded worst case, lost
    recall on those buckets) — account for drops with
    :func:`lsh_bucket_stats`.
    """
    from .similarity import lsh_view

    if n_planes is None:
        n_planes = auto_n_planes(df.count())
    # one-pass vectorized (id, v, n, bucket) view — bit-equal to the
    # former _as_double + lsh_bucket + _norm folds (see lsh_view)
    v = lsh_view(
        df, id_col, vec_col, dim, n_planes, "id",
        vec_alias="v", norm_alias="n",
    )
    if max_bucket is not None:
        ok = (
            v.groupBy("bucket")
            .agg(F.count("*").alias("__bn"))
            .where(F.col("__bn") <= max_bucket)
        )
        # no broadcast hint: the ok-bucket list is O(n / target_bucket) rows
        # — at the 10^9-vector design point that's millions of buckets, and
        # a forced broadcast would build that relation on the driver
        # regardless of autoBroadcastJoinThreshold. Unhinted, Catalyst/AQE
        # still broadcasts when the list is actually small and falls back
        # to a shuffle join when it isn't.
        v = v.join(ok.select("bucket"), "bucket", "left_semi")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        v.alias("a")
        .join(
            v.alias("b"),
            on=[
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot / (F.col("a.n") * F.col("b.n")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicates: pairs with cosine ≥ threshold.

    Brute-force O(n²) verify — exact, for moderate corpora and correctness
    oracles. The scale path is LSH bucketing
    (:func:`icedb_spark.operators.similarity.cosine_topk_lsh`) which turns
    this into a bucketed join."""
    from .similarity import _as_double, _norm

    # norms precomputed per row: the O(n²) pair loop folds only the dot
    v = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("n", _norm(F.col("v")))
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        v.alias("a")
        .join(v.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot / (F.col("a.n") * F.col("b.n")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semdedup_cell_stats(
    corpus: DataFrame,
    dim: int,
    n_clusters: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cell-size histogram for :func:`semdedup` — capacity planning and
    drop accounting for ``max_cell`` caps (what a silent cap would
    hide), the sibling of :func:`lsh_bucket_stats`. Same deterministic
    codebook, so sizes match what ``semdedup`` will see."""
    from .similarity import _dot, _norm, _train_codebook, _training_view

    v = _training_view(corpus, id_col, vec_col)
    cents = _train_codebook(v, dim, n_clusters, iters)
    vn = v.withColumn("n", _norm(F.col("dv")))
    cn = cents.withColumn("cn", _norm(F.col("cv")))
    sim = F.round(
        _dot(F.col("dv"), F.col("cv")) / (F.col("n") * F.col("cn")), 6
    )
    return (
        vn.crossJoin(F.broadcast(cn))
        .select("id", "cid", sim.alias("csim"))
        .groupBy("id")
        .agg(
            F.max_by(
                F.col("cid"), F.struct(F.col("csim"), -F.col("cid"))
            ).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
    )


def semdedup(
    corpus: DataFrame,
    dim: int,
    n_clusters: int = 16,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = None,
) -> DataFrame:
    """Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with an in-engine
    k-means codebook, then WITHIN each cluster drop every vector that is
    near-identical (cosine >= ``threshold``) to a kept cluster-mate —
    catching paraphrases and re-encodings that share no n-gram, which
    MinHash/SimHash (:func:`minhash_lsh_pairs`, :func:`simhash_pairs`)
    are blind to.

    Survivor rule (deterministic, oracle-reproducible): among a
    near-identical pair, the vector FARTHER from its cluster centroid
    (LOWER centroid-cosine) survives — SemDeDup's own choice ("we keep
    the one with the lowest cosine similarity to the centroid": edge
    examples preserve diversity, the near-centroid copy is the
    redundant one). Ties break toward the smaller id surviving. A
    vector is dropped iff SOME cluster-mate with pairwise cosine >=
    threshold sits strictly farther from the centroid (or equally far
    with a smaller id), so the rule needs no iteration and no
    transitive closure.

    Scale shape: codebook training is O(iters * N * C) broadcast
    map-side work (:func:`..similarity._train_codebook`); the pairwise
    stage is an EQUI-join on the cluster id — candidate volume is
    sum(|cell|^2) ~ N^2/C, tuned by ``n_clusters`` exactly like the
    paper (production: C ~ sqrt(N) keeps cells ~sqrt(N)); no global
    cross join ever. ``max_cell`` hard-caps the worst case (r6 —
    VERDICT r5 #5): members of cells WIDER than it are excluded from
    pairing and all marked ``kept`` (one dominant k-means mode can no
    longer go quadratic; lost dedup recall on those cells only) —
    account for drops with :func:`semdedup_cell_stats`, or raise
    ``n_clusters`` until cells fit, exactly like d07's ``max_bucket``.
    Returns one row per input vector:
    ``(vec_id, cell, cent_cosine, kept)``.
    """
    from .similarity import _dot, _norm, _train_codebook, _training_view

    v = _training_view(corpus, id_col, vec_col)
    cents = _train_codebook(v, dim, n_clusters, iters)
    vn = v.withColumn("n", _norm(F.col("dv")))
    cn = cents.withColumn("cn", _norm(F.col("cv")))
    sim = F.round(
        _dot(F.col("dv"), F.col("cv")) / (F.col("n") * F.col("cn")), 6
    )
    # group key is the 8-byte id alone (dv/n are functionally dependent ->
    # first() is deterministic): the agg hashes longs instead of
    # deep-comparing 64-element arrays and the exchange carries the vector
    # as an agg buffer, not a group key (guide §2.3)
    assigned = (
        vn.crossJoin(F.broadcast(cn))
        .select("id", "dv", "n", "cid", sim.alias("csim"))
        .groupBy("id")
        .agg(
            F.max_by(
                F.struct(F.col("cid"), F.col("csim")),
                F.struct(F.col("csim"), -F.col("cid")),
            ).alias("best"),
            F.first("dv").alias("dv"),
            F.first("n").alias("n"),
        )
        .select(
            "id", "dv", "n",
            F.col("best.cid").alias("cell"),
            F.col("best.csim").alias("cent_cos"),
        )
    )
    # Optimization r13 (guide §2.4 — share the partitioning, compute with
    # fewer passes): the r12 shape referenced `assigned` FOUR times (the
    # ok-cell histogram, both semi-joined pair sides, and the final
    # kept-flag join) with zero ReusedExchange — four executions of the
    # corpus-wide crossJoin+argmax per action, plus a distinct and a
    # second join by id. This shape computes the identical result with
    # TWO references: a LEFT self-join on the cell (a-side = every
    # vector; b-side = cell-mates, cap-filtered) aggregated per a.id —
    # `kept` is simply "no cell-mate dominates me", and vectors with no
    # (eligible) cell-mate get a null b-side and stay kept. The
    # ``max_cell`` cap filters the b-side by a count window OVER THE
    # SAME cell partitioning the join needs (no extra exchange, linear
    # buffering per cell), so members of over-cap cells find no b rows
    # and are all kept — semantics identical to the r12 semi-join
    # (oracle-checked: d11 at sf0.001/0.01/0.1 plus collect-compare).
    # An r12 experiment persisted `assigned` instead: ~8-13% off this
    # operator in isolation, but the block outlives the caller's action
    # and the session-wide leak cost far more — see _jaccard_verify's
    # docstring. Recomputing twice, not caching, remains the contract.
    a = assigned.select(
        F.col("id").alias("a_id"), F.col("dv").alias("a_dv"),
        F.col("n").alias("a_n"), F.col("cell").alias("a_cell"),
        F.col("cent_cos").alias("a_cent"),
    )
    bsrc = assigned
    if max_cell is not None:
        from pyspark.sql import Window

        w_cell = Window.partitionBy("cell")
        bsrc = (
            assigned.withColumn("__w", F.count(F.lit(1)).over(w_cell))
            .where(F.col("__w") <= max_cell)
            .drop("__w")
        )
    b = bsrc.select(
        F.col("id").alias("b_id"), F.col("dv").alias("b_dv"),
        F.col("n").alias("b_n"), F.col("cell").alias("b_cell"),
        F.col("cent_cos").alias("b_cent"),
    )
    pair_cos = F.round(
        _dot(F.col("a_dv"), F.col("b_dv")) / (F.col("a_n") * F.col("b_n")),
        6,
    )
    # a is DOMINATED by b when they are near-identical and b sits
    # strictly FARTHER from the centroid (lower cent_cos; id tiebreak)
    # — the survivor is the edge example, per the paper
    dominates = (
        (pair_cos >= F.lit(threshold))
        & (
            (F.col("b_cent") < F.col("a_cent"))
            | (
                (F.col("b_cent") == F.col("a_cent"))
                & (F.col("b_id") < F.col("a_id"))
            )
        )
    )
    return (
        a.join(
            b,
            (F.col("a_cell") == F.col("b_cell"))
            & (F.col("a_id") != F.col("b_id")),
            "left",
        )
        .groupBy("a_id")
        .agg(
            F.first("a_cell").alias("cell"),
            F.first("a_cent").alias("cent_cos"),
            F.max(dominates).alias("__dom"),
        )
        .select(
            F.col("a_id").alias(id_col),
            F.col("cell"),
            F.round(F.col("cent_cos"), 6).alias("cent_cosine"),
            F.coalesce(~F.col("__dom"), F.lit(True)).alias("kept"),
        )
    )


# --------------------------------------------------- exact-substring dedup

SPAN_SEED = 4_242


def _batch_span_positions(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """One row per k-token shingle position of ``df``: ``(id, pos,
    dig)`` with ``pos`` 1-based — the shared explode behind the
    substring-dedup family's batch side (docs shorter than k tokens
    contribute nothing)."""
    toks = tokens(F.col(text_col))
    digs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: hash60(F.concat_ws(" ", F.slice(toks, i, k)), SPAN_SEED),
    )
    return (
        df.where(F.size(tokens(F.col(text_col))) >= k)
        .select(F.col(id_col).alias("id"), F.posexplode(digs))
        .select(
            "id", (F.col("pos") + 1).alias("pos"), F.col("col").alias("dig")
        )
    )


def _span_positions(
    df: DataFrame,
    k: int,
    text_col: str,
    id_col: str,
    min_count: int,
    min_docs: int,
    exclude_first: bool,
) -> DataFrame:
    """(id, pos) of every k-token shingle whose digest repeats in the
    corpus — the shared core of :func:`duplicated_spans` /
    :func:`drop_duplicated_spans`. One explode bounded by the corpus
    token count, one digest-keyed shuffle, one join back."""
    pos = _batch_span_positions(df, k, text_col, id_col)
    if exclude_first:
        # keep-first semantics (Lee et al. 2022 drop all-but-one copy):
        # each digest's canonical occurrence — smallest (id, pos) — is
        # NOT marked for removal. Shaped as ONE partial-aggregatable
        # groupBy (min-struct + counts) joined back, NOT a per-digest
        # window: a boilerplate span repeated millions of times would
        # otherwise funnel its whole occurrence list through a single
        # window partition.
        keep = (
            pos.groupBy("dig")
            .agg(
                F.min(F.struct("id", "pos")).alias("first"),
                F.count("*").alias("c"),
                F.count_distinct("id").alias("nd"),
            )
            .where((F.col("c") >= min_count) & (F.col("nd") >= min_docs))
            .select("dig", "first")
        )
        return (
            pos.join(keep, "dig")
            .where(F.struct("id", "pos") != F.col("first"))
            .select("id", "pos")
        )
    dup = (
        pos.groupBy("dig")
        .agg(
            F.count("*").alias("c"),
            F.count_distinct("id").alias("nd"),
        )
        .where((F.col("c") >= min_count) & (F.col("nd") >= min_docs))
        .select("dig")
    )
    return pos.join(dup, "dig").select("id", "pos")


def _merge_islands(matched: DataFrame, k: int) -> DataFrame:
    """Maximal spans from matched shingle positions: positions whose gap
    exceeds ``k`` start a new island (a gap ≤ k means the two k-token
    windows overlap or touch). Per-doc windows — state bounded by the
    doc's token count."""
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    return (
        matched.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("new_island").over(w))
        .groupBy("id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
            F.count("*").alias("n_shingles"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
            "n_shingles",
        )
    )


def duplicated_spans(
    df: DataFrame,
    k: int = 50,
    min_count: int = 2,
    min_docs: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    exclude_first: bool = False,
) -> DataFrame:
    """Exact-substring duplicate spans (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" family,
    fixed-``k`` variant): maximal token spans covered by ``k``-token
    shingles that occur at least ``min_count`` times across the corpus
    (``min_docs`` ≥ 2 restricts to cross-document repeats). Invisible to
    doc-level MinHash (d02) and whole-line dedup (t11): a 50-token span
    shared between two otherwise-different documents is exactly what
    this catches. Reference analog: none.

    Scale shape (no suffix array needed for fixed k): one shingle-digest
    explode bounded by the corpus token count, one digest-keyed
    shuffle to find repeats, one join back, and per-doc island merges
    whose window state is bounded by each doc's token count. Shingle
    digests are :func:`hash60` (md5-derived) so any engine reproduces
    the pipeline bit-exactly.

    ``exclude_first=True`` switches to keep-first removal semantics:
    each digest's canonical occurrence (smallest ``(id, pos)``) never
    enters a span — the returned spans are precisely what
    :func:`drop_duplicated_spans` removes.

    Returns one row per maximal span: ``(doc_id, span_start, span_end,
    span_tokens, n_shingles)``; positions are 1-based token indexes
    over :func:`icedb_spark.operators.text.tokens`, ends inclusive.
    """
    matched = _span_positions(
        df, k, text_col, id_col, min_count, min_docs, exclude_first
    )
    return _merge_islands(matched, k).select(
        F.col("id").alias(id_col),
        "span_start",
        "span_end",
        "span_tokens",
        "n_shingles",
    )


def drop_duplicated_spans(
    df: DataFrame,
    k: int = 50,
    min_count: int = 2,
    min_docs: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply exact-substring dedup with keep-first semantics: every doc
    comes back with duplicated spans (beyond each shingle's canonical
    first occurrence) removed from its normalized token stream, plus
    per-doc accounting — ``dropped_spans``, ``dropped_tokens``,
    ``kept_tokens`` — so the curation pipeline can audit exactly how
    much text the operator shed (the drop-accounting contract the
    engine's other capped operators follow).

    ``clean_text`` is rebuilt from the LOWERCASED whitespace tokens
    (the same normalization every text operator here uses); callers
    needing original casing should treat the span rows from
    :func:`duplicated_spans` as offsets into their own tokenization.
    """
    spans = _merge_islands(
        _span_positions(
            df, k, text_col, id_col, min_count, min_docs, True
        ),
        k,
    ).select(
        F.col("id").alias(id_col),
        "span_start",
        "span_end",
        "span_tokens",
        "n_shingles",
    )
    return apply_span_removal(df, spans, text_col=text_col, id_col=id_col)


def apply_span_removal(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove arbitrary token spans from each document and account for
    the drops — the application half of the span family, shared by
    batch-global :func:`drop_duplicated_spans` and usable directly on
    :func:`duplicated_spans_against_index` output for INCREMENTAL
    cleaning. ``spans`` carries ``(id_col, span_start, span_end)``
    rows (1-based inclusive token indexes over the normalized
    tokenization); overlapping spans are fine (a token inside any span
    is dropped; ``dropped_tokens`` counts distinct dropped tokens).
    Returns ``(id, dropped_spans, dropped_tokens, kept_tokens,
    clean_text)`` with clean_text rebuilt from the LOWERCASED
    whitespace tokens."""
    per_doc = (
        spans.select(
            F.col(id_col).alias("id"),
            F.struct("span_start", "span_end").alias("sp"),
        )
        .groupBy("id")
        .agg(
            F.sort_array(F.collect_list("sp")).alias("spans"),
            F.count("*").alias("dropped_spans"),
        )
    )
    toks = tokens(F.col(text_col))
    tok_structs = F.transform(
        F.col("tks"),
        lambda x, i: F.struct(x.alias("t"), (i + 1).alias("p")),
    )
    out = (
        df.select(F.col(id_col).alias("id"), toks.alias("tks"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.size("tks").alias("n_tokens"),
            F.coalesce("dropped_spans", F.lit(0)).alias("dropped_spans"),
            F.when(F.col("spans").isNull(), tok_structs)
            .otherwise(
                # keep tokens outside every span: per-token exists()
                # over the doc's span list (bounded by spans per doc)
                F.filter(
                    tok_structs,
                    lambda s: ~F.exists(
                        F.col("spans"),
                        lambda sp: (s["p"] >= sp["span_start"])
                        & (s["p"] <= sp["span_end"]),
                    ),
                ),
            )
            .alias("kept"),
        )
    )
    return out.select(
        F.col("id").alias(id_col),
        "dropped_spans",
        (F.col("n_tokens") - F.size("kept")).cast("long").alias(
            "dropped_tokens"
        ),
        F.size("kept").alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.col("kept"),
                lambda e: e["t"],
            ),
            " ",
        ).alias("clean_text"),
    )


# ---------------------------------------------- dedup against an index

def minhash_index_rows(
    df: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """A corpus's MinHash signatures in the INDEX-TABLE layout: one row
    per (doc, band) — ``(doc_id, band, bh, sig)`` with the full
    ``num_perm``-long signature carried on every band row, so an
    incoming batch's band join needs no second hop to fetch signatures.
    Persist these into an icedb table (partitioned by ``band``) to make
    corpus dedup INCREMENTAL: new batches join against the index
    instead of recomputing corpus-wide (VERDICT r6 #4). Storage cost is
    ``bands × num_perm`` longs per document — negligible next to text.
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    sig = minhash_signature(df, id_col, text_col, num_perm, shingle_k)
    rows = num_perm // bands
    band_structs = []
    for b in range(bands):
        concat = F.concat_ws(
            ",",
            *[F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)],
        )
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                hash60(concat, BAND_SEED + b).alias("bh"),
            )
        )
    # bands and the signature ride ONE projection + explode — no self-join
    # back to the signature table (zero shuffles end to end: the signature
    # itself is the zero-shuffle array-min formulation)
    return sig.select(
        F.col("id").alias(id_col),
        F.array(*[F.col(f"mh{j}") for j in range(num_perm)]).alias("sig"),
        F.explode(F.array(*band_structs)).alias("e"),
    ).select(id_col, F.col("e.band").alias("band"), F.col("e.bh").alias("bh"), "sig")


def dedup_against_index(
    batch: DataFrame,
    index_rows: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_band_rows: bool = True,
    _band_rows: Optional[DataFrame] = None,
) -> DataFrame:
    """Incremental ingestion dedup: mark each batch document that is a
    MinHash near-duplicate of (a) any already-indexed document or (b) a
    smaller-id document in the same batch. ``index_rows`` is the
    persisted signature table in :func:`minhash_index_rows` layout;
    batch ids must be disjoint from indexed ids.

    ``_band_rows``: the batch's own :func:`minhash_index_rows` output,
    when the caller already computed it (the ``*_table`` wrapper and the
    streaming ingest gate both need it for their pruning probe set) —
    passing it through means the batch signatures run ONCE per call
    instead of twice, and the caller owns its persistence.

    Duplicate rule (deterministic, order-free, so batch-vs-index equals
    a full-corpus recompute over the union): d is a duplicate iff some
    mate m — indexed, or in-batch with ``m.id < d.id`` — shares a band
    bucket with d and the signature-estimated Jaccard (fraction of
    equal minhash positions, the standard unbiased estimator) is ≥
    ``threshold``. The mate rule uses ALL smaller-id docs, not just
    kept ones, exactly because the index stores every ingested doc's
    signature — that is what makes the incremental result equal the
    batch-restricted full recompute.

    Scale shape: the batch side is tiny next to the index; the one
    expensive move is the equi-join on ``(band, bh)`` — a single
    shuffle of index band rows (16+4·8 bytes/doc, not documents). No
    corpus-wide re-signature, no all-pairs. When ``index_rows`` comes
    from a persisted IceTable, DON'T pass ``table.read()`` whole: the
    batch can only collide with rows sharing its own buckets, so
    collect the batch's distinct ``bh`` set (bounded by batch_docs ×
    bands) and pass ``table.read(column_in={"bh": bhs})`` — with
    ``bloom_columns=["bh"]`` on the index table the scan then touches
    only files that may hold a batch bucket instead of the whole
    index. Sound because pruning is hint-not-filter and this join is
    exact on (band, bh); :func:`icedb_spark.streaming.ingest.
    stream_insert_near_dedup` does this per micro-batch.

    Returns one row per batch doc: ``(doc_id, is_dup, dup_of,
    est_jaccard)`` — ``dup_of`` the smallest qualifying mate id and
    ``est_jaccard`` its estimate (both null for kept docs). Append the
    batch's own :func:`minhash_index_rows` to the index table after
    the commit to keep the cycle going.
    """
    br = (
        _band_rows
        if _band_rows is not None
        else minhash_index_rows(
            batch, num_perm, bands, shingle_k, text_col, id_col
        )
    ).select(F.col(id_col).alias("id"), "band", "bh", "sig")
    if persist_band_rows and _band_rows is None:
        # br is referenced twice (own-batch mates + the join's probe
        # side). Pass False from per-batch loops that already persist
        # the batch upstream — a long-lived stream would otherwise
        # accumulate one registered cache per micro-batch (the module
        # caching contract's clearCache escape hatch is too blunt for
        # a stream sharing the session with other users).
        from pyspark import StorageLevel

        br = br.persist(StorageLevel.MEMORY_AND_DISK)
    mates = index_rows.select(
        F.col(id_col).alias("mid"),
        "band",
        "bh",
        F.col("sig").alias("msig"),
        F.lit(True).alias("indexed"),
    ).unionByName(
        br.select(
            F.col("id").alias("mid"),
            "band",
            "bh",
            F.col("sig").alias("msig"),
            F.lit(False).alias("indexed"),
        )
    )
    cand = (
        br.join(mates, ["band", "bh"])
        .where(F.col("indexed") | (F.col("mid") < F.col("id")))
        .select("id", "mid", "sig", "msig")
        .distinct()
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig", "msig", lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(float(num_perm))
    )
    dups = (
        cand.withColumn("est", est)
        .where(F.col("est") >= threshold)
        .groupBy("id")
        .agg(
            F.min("mid").alias("dup_of"),
            F.min_by("est", "mid").alias("est_jaccard"),
        )
    )
    return (
        batch.select(F.col(id_col).alias("id"))
        .join(dups, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            F.round("est_jaccard", 6).alias("est_jaccard"),
        )
    )


def dedup_against_index_table(
    batch: DataFrame,
    index_table,
    threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_pruning_keys: int = 20_000,
    persist_band_rows: bool = True,
) -> DataFrame:
    """:func:`dedup_against_index` with the PRUNED index read built in —
    the easy path does the right thing: collect the batch's distinct
    ``bh`` set (bounded by batch_docs × bands) and read the persisted
    signature IceTable through ``column_in={"bh": ...}`` Bloom/zone-map
    file skipping, falling back to a full scan past
    ``max_pruning_keys``. Create the index table with
    ``bloom_columns=["bh"]`` sized for IN-list probing (see
    :func:`icedb_spark.streaming.ingest.stream_insert_near_dedup`) or
    nothing prunes. An empty or never-written index short-circuits to
    the in-batch rule. Verdict semantics identical to passing
    ``index_table.read()`` whole."""
    br = minhash_index_rows(
        batch, num_perm, bands, shingle_k, text_col, id_col
    )
    if persist_band_rows:
        # ONE batch-signature computation per call: the probe-set collect
        # below and the wrapped dedup both read this cached plan (the
        # passthrough hands ownership of the cache to this wrapper)
        from pyspark import StorageLevel

        br = br.persist(StorageLevel.MEMORY_AND_DISK)
    if index_table.snapshot().alive_files():
        bhs = sorted(
            r["bh"]
            for r in br.select("bh")
            .distinct()
            .limit(max_pruning_keys + 1)
            .collect()
        )
        if not bhs:
            idx = br.limit(0)
        elif len(bhs) <= max_pruning_keys:
            idx = index_table.read(column_in={"bh": bhs})
        else:
            idx = index_table.read()
    else:
        idx = br.limit(0)
    return dedup_against_index(
        batch, idx, threshold, num_perm, bands, shingle_k,
        text_col, id_col, persist_band_rows, _band_rows=br,
    )


def substring_index_rows(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """A corpus's DISTINCT k-token shingle digests — the persistable
    index for INCREMENTAL exact-substring dedup (one ``dig`` long per
    distinct k-gram; the d13 pattern applied to the d12 family).
    Presence is the whole signal: an incoming batch position whose
    digest exists in the index has an earlier occurrence by the
    ids-increase-across-batches contract, so it is marked for removal
    under keep-first semantics without the index storing counts or
    positions. Cross-batch re-inserts of the same digest are harmless
    duplicates. One explode bounded by corpus token count, one
    distinct."""
    toks = tokens(F.col(text_col))
    digs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: hash60(F.concat_ws(" ", F.slice(toks, i, k)), SPAN_SEED),
    )
    return (
        df.where(F.size(tokens(F.col(text_col))) >= k)
        .select(F.explode(digs).alias("dig"))
        .distinct()
    )


def duplicated_spans_against_index(
    batch: DataFrame,
    index_rows: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_positions: bool = True,
    _positions: Optional[DataFrame] = None,
) -> DataFrame:
    """Incremental exact-substring dedup: maximal spans of ``batch``
    covered by k-token shingles that either (a) exist in the persisted
    digest index — their keeper was ingested earlier — or (b) repeat
    within the batch itself, keep-first (each new digest's smallest
    ``(id, pos)`` batch occurrence is exempt). With the index holding
    every previously seen digest and batch ids above indexed ids, the
    result equals :func:`duplicated_spans` with ``exclude_first=True``
    over the full corpus, restricted to batch documents — append
    :func:`substring_index_rows` of the batch afterwards to continue
    the cycle.

    Scale shape: the batch side explodes its own token count; the one
    expensive move is a semi-join against the digest index keyed on
    ``dig`` (8 bytes/distinct k-gram, no text, no positions). Output
    schema matches :func:`duplicated_spans`.

    ``persist_positions``: the batch's position explode is referenced
    twice (index semi-join + batch-internal keep-first) and is cached
    by default. Pass ``False`` from per-batch loops in a long-lived
    session — the cache is corpus-token-count-sized and Spark never
    auto-evicts disk-backed blocks, so a stream that keeps the default
    accumulates one registered cache per batch (same contract as
    :func:`dedup_against_index`'s ``persist_band_rows``); recomputing
    the explode twice is cheap at micro-batch sizes.

    ``_positions``: the batch's :func:`_batch_span_positions` explode when
    the caller already built it (the ``*_table`` wrapper derives its
    pruning probe set from the same plan) — passed through so the
    explode is computed/cached once per call, owned by the caller.
    """
    pos = (
        _positions
        if _positions is not None
        else _batch_span_positions(batch, k, text_col, id_col)
    )
    if persist_positions and _positions is None:
        from pyspark import StorageLevel

        pos = pos.persist(StorageLevel.MEMORY_AND_DISK)
    idx = index_rows.select(F.col("dig")).distinct()
    hit_index = pos.join(idx, "dig", "left_semi").select("id", "pos")
    # batch-internal keep-first, restricted to digests NOT in the index
    # (an indexed digest already marks every batch occurrence above)
    fresh = pos.join(idx, "dig", "left_anti")
    keep = (
        fresh.groupBy("dig")
        .agg(F.min(F.struct("id", "pos")).alias("first"), F.count("*").alias("c"))
        .where(F.col("c") >= 2)
        .select("dig", "first")
    )
    hit_batch = (
        fresh.join(keep, "dig")
        .where(F.struct("id", "pos") != F.col("first"))
        .select("id", "pos")
    )
    matched = hit_index.unionByName(hit_batch).distinct()
    return _merge_islands(matched, k).select(
        F.col("id").alias(id_col),
        "span_start",
        "span_end",
        "span_tokens",
        "n_shingles",
    )


def duplicated_spans_against_index_table(
    batch: DataFrame,
    index_table,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_pruning_keys: int = 20_000,
    persist_positions: bool = True,
) -> DataFrame:
    """:func:`duplicated_spans_against_index` with the pruned index
    read built in. The batch's distinct k-gram digests are its probe
    set — but unlike the MinHash family's band buckets they number
    ~one per batch TOKEN, so only small batches fit an IN-list:
    below ``max_pruning_keys`` distinct digests the digest-index scan
    prunes through ``column_in={"dig": ...}`` (give the index table
    ``bloom_columns=["dig"]`` sized for IN-list probing); above it the
    full scan is the honest plan — hashed digests spread uniformly, so
    a big batch legitimately touches the whole digest space. An empty
    or never-written index short-circuits to the in-batch keep-first
    rule. A batch with NO k-token shingles (every doc shorter than k)
    can match nothing and short-circuits to the empty index — never a
    full scan."""
    pos = _batch_span_positions(batch, k, text_col, id_col)
    if persist_positions:
        # one explode per call: probe-set collect + wrapped dedup share
        # this cached plan (passthrough hands cache ownership here)
        from pyspark import StorageLevel

        pos = pos.persist(StorageLevel.MEMORY_AND_DISK)
    empty = pos.select("dig").limit(0)
    if index_table.snapshot().alive_files():
        digs = [
            r["dig"]
            for r in pos.select("dig")
            .distinct()
            .limit(max_pruning_keys + 1)
            .collect()
        ]
        if not digs:
            idx = empty
        elif len(digs) <= max_pruning_keys:
            idx = index_table.read(column_in={"dig": sorted(digs)})
        else:
            idx = index_table.read()
    else:
        idx = empty
    return duplicated_spans_against_index(
        batch, idx, k, text_col, id_col, persist_positions, _positions=pos
    )


def embedding_dedup_against_index_table(
    batch: DataFrame,
    index_table,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pruning_keys: int = 20_000,
    persist_batch_rows: bool = True,
) -> DataFrame:
    """:func:`embedding_dedup_against_index` with the pruned index read
    built in: the batch's distinct LSH buckets (at most one per batch
    vector) prune the index scan through ``column_in={"bucket": ...}``
    — give the index table ``sort_order=["bucket"]`` +
    ``bloom_columns=["bucket"]`` so zone maps and Blooms have
    something to skip on. Same hint-not-filter soundness as the
    MinHash family: the bucket equi-join afterwards is exact. An empty
    batch short-circuits to the empty index; the batch's bucketed rows
    compute ONCE per call (probe-set collect + wrapped dedup share the
    cached plan via passthrough)."""
    br = embedding_index_rows(batch, dim, n_planes, id_col, vec_col)
    if persist_batch_rows:
        from pyspark import StorageLevel

        br = br.persist(StorageLevel.MEMORY_AND_DISK)
    if index_table.snapshot().alive_files():
        buckets = sorted(
            r["bucket"]
            for r in br.select("bucket")
            .distinct()
            .limit(max_pruning_keys + 1)
            .collect()
        )
        if not buckets:
            idx = br.limit(0)
        elif len(buckets) <= max_pruning_keys:
            idx = index_table.read(column_in={"bucket": buckets})
        else:
            idx = index_table.read()
    else:
        idx = br.limit(0)
    return embedding_dedup_against_index(
        batch, idx, dim, threshold, n_planes, id_col, vec_col,
        persist_batch_rows, _batch_rows=br,
    )


def embedding_index_rows(
    df: DataFrame,
    dim: int,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """An embedding corpus's rows in the INDEX-TABLE layout for
    incremental near-dup gating (the d13 pattern for the embedding
    family): ``(vec_id, bucket, v, n)`` — the md5-derived hyperplane
    LSH bucket plus the double vector and its precomputed norm, so a
    batch's bucket join verifies exact cosine without re-reading the
    original corpus. Persist into an icedb table partitioned by
    ``pmod(bucket, N)``."""
    from .similarity import lsh_view

    return lsh_view(
        df, id_col, vec_col, dim, n_planes, id_col,
        vec_alias="v", norm_alias="n",
    ).select(id_col, "bucket", "v", "n")


def embedding_dedup_against_index(
    batch: DataFrame,
    index_rows: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist_batch_rows: bool = True,
    _batch_rows: Optional[DataFrame] = None,
) -> DataFrame:
    """Incremental embedding near-dup: mark each batch vector whose
    exact cosine against some mate — indexed, or in-batch with a
    smaller id — sharing its LSH bucket reaches ``threshold``
    (6-dp-rounded, the family's cross-engine convention). Same
    order-free mate rule as :func:`dedup_against_index`, so
    batch-vs-index equals the full-corpus
    :func:`embedding_dup_pairs_lsh` recompute on the union restricted
    to batch ids; batch ids must be disjoint from indexed ids. Scale
    shape: ONE bucket-keyed equi-join; candidate volume ~n·bucket
    width, never all-pairs; no corpus re-hash per batch.

    Returns ``(vec_id, is_dup, dup_of, cosine)`` — ``dup_of`` the
    smallest qualifying mate, ``cosine`` its rounded similarity (null
    for kept vectors). Append the batch's own
    :func:`embedding_index_rows` to the index afterwards.

    ``persist_batch_rows``: the batch's bucketed rows are referenced
    twice (own-batch mates + the join's probe side) and cached by
    default; pass ``False`` from per-batch loops in a long-lived
    session to avoid accumulating one never-evicted cache per batch
    (same contract as :func:`dedup_against_index`'s
    ``persist_band_rows``). ``_batch_rows`` passes a precomputed
    :func:`embedding_index_rows` through (the ``*_table`` wrapper's
    probe set) so the batch side runs once per call, caller-owned.
    """
    br = (
        _batch_rows
        if _batch_rows is not None
        else embedding_index_rows(batch, dim, n_planes, id_col, vec_col)
    ).select(F.col(id_col).alias("id"), "bucket", "v", "n")
    if persist_batch_rows and _batch_rows is None:
        from pyspark import StorageLevel

        br = br.persist(StorageLevel.MEMORY_AND_DISK)
    mates = index_rows.select(
        F.col(id_col).alias("mid"),
        "bucket",
        F.col("v").alias("mv"),
        F.col("n").alias("mn"),
        F.lit(True).alias("indexed"),
    ).unionByName(
        br.select(
            F.col("id").alias("mid"),
            "bucket",
            F.col("v").alias("mv"),
            F.col("n").alias("mn"),
            F.lit(False).alias("indexed"),
        )
    )
    dot = F.aggregate(
        F.zip_with("v", "mv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dups = (
        br.join(mates, "bucket")
        .where(F.col("indexed") | (F.col("mid") < F.col("id")))
        .withColumn("cos", F.round(dot / (F.col("n") * F.col("mn")), 6))
        .where(F.col("cos") >= threshold)
        .groupBy("id")
        .agg(
            F.min("mid").alias("dup_of"),
            F.min_by("cos", "mid").alias("cosine"),
        )
    )
    return (
        batch.select(F.col(id_col).alias("id"))
        .join(dups, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            "cosine",
        )
    )
