"""DuckDB oracle SQL builders for the hash-based operators.

Every operator in :mod:`icedb_spark.operators` uses md5-derived hashing
(:mod:`icedb_spark.operators.hashing`), so its exact output is expressible in
portable SQL. These builders generate that SQL programmatically (the MinHash /
SimHash oracles are long but mechanical). They are used by
``__spark_entry__.oracle_sql`` and by tests.
"""

from __future__ import annotations

from .operators.hashing import hash60_sql
from .operators.text import EN_STOPWORDS, LANG_MARKERS

TOKENS = r"regexp_split_to_array(trim(lower(text)), '\s+')"


def shingles_sql(k: int = 3) -> str:
    """Distinct token k-gram shingles (mirrors operators.dedup.shingles)."""
    return (
        f"case when len(tokens) >= {k} then "
        f"list_distinct(list_transform(range(1, len(tokens) - {k - 2}), "
        f"i -> array_to_string(tokens[i:i+{k - 1}], ' '))) "
        f"else [array_to_string(tokens, ' ')] end"
    )


def minhash_pairs_sql(
    num_perm: int = 16, bands: int = 4, shingle_k: int = 3,
    threshold: float = 0.5, table: str = "documents",
) -> str:
    from .operators.dedup import MINHASH_PRIME, minhash_perm_constants

    rows = num_perm // bands
    base = f"({hash60_sql('shingle', 0)} % {MINHASH_PRIME})"
    mh_cols = ",\n    ".join(
        f"min(({a} * {base} + {b}) % {MINHASH_PRIME}) as mh{j}"
        for j, (a, b) in enumerate(minhash_perm_constants(num_perm))
    )
    band_selects = []
    for b in range(bands):
        concat = " || ',' || ".join(
            f"mh{b * rows + r}::varchar" for r in range(rows)
        )
        band_selects.append(
            f"select doc_id, {b} as band, {hash60_sql(f'({concat})', 1000 + b)} as bh from sigs"
        )
    bands_sql = "\n  union all\n  ".join(band_selects)
    return f"""
with toks as (
  select doc_id, {TOKENS} as tokens from {table}
), sh as (
  select doc_id, {shingles_sql(shingle_k)} as shingles from toks
), ex as (
  select doc_id, unnest(shingles) as shingle from sh
), sigs as (
  select doc_id,
    {mh_cols}
  from ex group by doc_id
), bands as (
  {bands_sql}
), cand as (
  select distinct a.doc_id as id_a, b.doc_id as id_b
  from bands a join bands b on a.band = b.band and a.bh = b.bh and a.doc_id < b.doc_id
)
select c.id_a, c.id_b,
  round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        / len(list_distinct(sa.shingles || sb.shingles)), 6) as jaccard
from cand c
join sh sa on sa.doc_id = c.id_a
join sh sb on sb.doc_id = c.id_b
where round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        / len(list_distinct(sa.shingles || sb.shingles)), 6) >= {threshold}
"""


def ngram_jaccard_pairs_sql(
    shingle_k: int = 3, threshold: float = 0.5, table: str = "documents"
) -> str:
    return f"""
with toks as (
  select doc_id, {TOKENS} as tokens from {table}
), sh as (
  select doc_id, {shingles_sql(shingle_k)} as shingles from toks
), ex as (
  select doc_id, unnest(shingles) as shingle from sh
), cand as (
  select distinct a.doc_id as id_a, b.doc_id as id_b
  from ex a join ex b on a.shingle = b.shingle and a.doc_id < b.doc_id
)
select c.id_a, c.id_b,
  round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        / len(list_distinct(sa.shingles || sb.shingles)), 6) as jaccard
from cand c
join sh sa on sa.doc_id = c.id_a
join sh sb on sb.doc_id = c.id_b
where round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        / len(list_distinct(sa.shingles || sb.shingles)), 6) >= {threshold}
"""


def containment_pairs_sql(
    shingle_k: int = 3, threshold: float = 0.9, mod: int = 10, rem: int = 3,
    table: str = "documents",
) -> str:
    """Oracle for d16 (asymmetric containment near-dup): rebuilds the
    SAME corpus the entry builds — the doc_id slice plus each third
    document's 60 %-prefix excerpt under a shifted id (identical
    greatest(3, ceil(0.6·n)) closed form) — then computes exact
    |A∩B|/|A| over the NAIVE shared-shingle blocker, so the entry's
    lossless prefix filter must be invisible in the output."""
    return f"""
with base as (
  select doc_id, text from {table} where doc_id % {mod} = {rem}
),
corpus as (
  select doc_id, text from base
  union all
  select doc_id + 2000000,
    array_to_string(
      list_slice({TOKENS}, 1,
        cast(greatest(3, ceil(0.6 * len({TOKENS}))) as int)), ' ')
  from base where doc_id % 3 = 0
),
toks as (
  select doc_id, {TOKENS} as tokens from corpus
), sh as (
  select doc_id, {shingles_sql(shingle_k)} as shingles from toks
), ex as (
  select doc_id, unnest(shingles) as shingle from sh
), cand as (
  select distinct a.doc_id as id_a, b.doc_id as id_b
  from ex a join ex b on a.shingle = b.shingle and a.doc_id != b.doc_id
)
select c.id_a, c.id_b,
  round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        / len(sa.shingles), 6) as containment
from cand c
join sh sa on sa.doc_id = c.id_a
join sh sb on sb.doc_id = c.id_b
where round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        / len(sa.shingles), 6) >= {threshold}
order by id_a, id_b
"""


def simhash_sql(bits: int = 32, seed: int = 777, table: str = "documents") -> str:
    bit_sums = ",\n    ".join(
        f"sum(case when (h >> {b}) & 1 = 1 then 1 else -1 end) as s{b}"
        for b in range(bits)
    )
    assemble = " + ".join(
        f"(case when s{b} > 0 then cast({1 << b} as bigint) else 0 end)"
        for b in range(bits)
    )
    return f"""
with toks as (
  select doc_id, unnest({TOKENS}) as tok from {table}
), hs as (
  select doc_id, {hash60_sql('tok', seed)} as h from toks
), bits as (
  select doc_id,
    {bit_sums}
  from hs group by doc_id
)
select doc_id, {assemble} as simhash from bits
"""


def simhash_pairs_sql(
    bits: int = 32,
    max_hamming: int = 3,
    seed: int = 777,
    table: str = "documents",
    band_bits: int = 8,
) -> str:
    """Replicates ``operators.dedup.simhash_pairs``: band blocking over
    the SimHash sketch, exact popcount verification."""
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    bands_values = ", ".join(f"({b})" for b in range(n_bands))
    return f"""
with sk as ({simhash_sql(bits, seed, table)}),
bands as (
  select doc_id, simhash, b.band,
    (simhash >> (b.band * {band_bits})) & {mask} as bv
  from sk, (values {bands_values}) as b(band)
),
cand as (
  select distinct a.doc_id as id_a, b.doc_id as id_b,
    a.simhash as sh_a, b.simhash as sh_b
  from bands a join bands b
    on a.band = b.band and a.bv = b.bv and a.doc_id < b.doc_id
)
select id_a, id_b,
  cast(bit_count(xor(sh_a, sh_b)) as integer) as hamming
from cand
where bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""


def exact_dup_groups_sql(table: str = "documents") -> str:
    """Matches ``__spark_entry__.d01_exact_dedup``: corpus = documents plus
    every third document re-planted under doc_id + 1e6."""
    return f"""
with corpus as (
  select doc_id, text from {table}
  union all
  select doc_id + 1000000 as doc_id, text from {table} where doc_id % 3 = 0
)
select md5(text) as digest,
  count(*) as group_size,
  min(doc_id) as keeper_id,
  array_to_string(list_sort(list(doc_id)), ',') as member_ids
from corpus
group by md5(text)
having count(*) > 1
"""


def cosine_topk_sql(k: int = 5, query_mod: int = 50, table: str = "embeddings") -> str:
    return f"""
with q as (
  select vec_id as query_id, cast(embedding as double[]) as qv
  from {table} where vec_id % {query_mod} = 0
), c as (
  select vec_id as neighbor_id, cast(embedding as double[]) as cv from {table}
), scored as (
  select query_id, neighbor_id,
    round(list_cosine_similarity(cv, qv), 6) as cosine
  from c, q where query_id <> neighbor_id
), ranked as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id order by cosine desc, neighbor_id asc) as integer) as rank
  from scored
)
select query_id, neighbor_id, cosine, rank from ranked where rank <= {k}
"""


def embedding_dups_sql(threshold: float, table: str = "embeddings") -> str:
    return f"""
with v as (select vec_id, cast(embedding as double[]) as dv from {table})
select a.vec_id as id_a, b.vec_id as id_b,
  round(list_cosine_similarity(a.dv, b.dv), 6) as cosine
from v a join v b on a.vec_id < b.vec_id
where round(list_cosine_similarity(a.dv, b.dv), 6) >= {threshold}
"""


def semantic_decontam_sql(
    threshold: float, bench_mod: int = 29, table: str = "embeddings"
) -> str:
    """Oracle for ``operators.decontam.semantic_decontaminate`` (exact
    mode): per corpus vector, the max round-6 cosine against the whole
    benchmark slice, and the threshold flag."""
    return f"""
with c as (
  select vec_id, cast(embedding as double[]) as dv
  from {table} where vec_id % {bench_mod} <> 0
), b as (
  select cast(embedding as double[]) as dv
  from {table} where vec_id % {bench_mod} = 0
), s as (
  select c.vec_id,
    max(round(list_cosine_similarity(c.dv, b.dv), 6)) as max_cosine
  from c cross join b group by c.vec_id
)
select vec_id, max_cosine, max_cosine >= {threshold} as contaminated from s
"""


def cosine_topk_lsh_sql(
    k: int = 5,
    query_mod: int = 50,
    dim: int = 64,
    n_planes: int = 6,
    table: str = "embeddings",
) -> str:
    """Replicates ``operators.similarity.cosine_topk_lsh`` bit-for-bit: the
    hyperplanes are md5-derived ±1 sign vectors, so each bucket bit is the
    sign of a left-fold dot product — emitted here with the plane literals
    baked in, in the same fold order Spark's ``aggregate`` uses (products of
    ±1.0 are exact, so both engines sum identical doubles)."""
    from .operators.similarity import _hyperplane

    def plane_dot(p: int) -> str:
        lit = "[" + ", ".join(
            "1.0" if x > 0 else "-1.0" for x in _hyperplane(dim, p)
        ) + "]"
        return (
            f"list_reduce(list_prepend(cast(0.0 as double), "
            f"list_transform(range(1, {dim + 1}), i -> dv[i] * ({lit}::double[])[i])), "
            f"(acc, x) -> acc + x)"
        )

    bucket = " + ".join(
        f"(case when {plane_dot(p)} >= 0 then {1 << p} else 0 end)"
        for p in range(n_planes)
    )
    return f"""
with v as (
  select vec_id, cast(embedding as double[]) as dv from {table}
), b as (
  select vec_id, dv, {bucket} as bucket from v
), q as (
  select vec_id as query_id, dv as qv, bucket from b where vec_id % {query_mod} = 0
), c as (
  select vec_id as neighbor_id, dv as cv, bucket from b
), scored as (
  select query_id, neighbor_id,
    round(list_cosine_similarity(cv, qv), 6) as cosine
  from c join q using (bucket) where query_id <> neighbor_id
), ranked as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id order by cosine desc, neighbor_id asc) as integer) as rank
  from scored
)
select query_id, neighbor_id, cosine, rank from ranked where rank <= {k}
"""


def embedding_dups_lsh_sql(
    threshold: float,
    dim: int = 64,
    n_planes: int = 6,
    table: str = "embeddings",
) -> str:
    """Replicates ``operators.dedup.embedding_dup_pairs_lsh`` — same
    hyperplane bucket fold as :func:`cosine_topk_lsh_sql`."""
    from .operators.similarity import _hyperplane

    def plane_dot(p: int) -> str:
        lit = "[" + ", ".join(
            "1.0" if x > 0 else "-1.0" for x in _hyperplane(dim, p)
        ) + "]"
        return (
            f"list_reduce(list_prepend(cast(0.0 as double), "
            f"list_transform(range(1, {dim + 1}), i -> dv[i] * ({lit}::double[])[i])), "
            f"(acc, x) -> acc + x)"
        )

    bucket = " + ".join(
        f"(case when {plane_dot(p)} >= 0 then {1 << p} else 0 end)"
        for p in range(n_planes)
    )
    return f"""
with v as (
  select vec_id, cast(embedding as double[]) as dv from {table}
), b as (
  select vec_id, dv, {bucket} as bucket from v
)
select a.vec_id as id_a, b.vec_id as id_b,
  round(list_cosine_similarity(a.dv, b.dv), 6) as cosine
from b a join b b on a.bucket = b.bucket and a.vec_id < b.vec_id
where round(list_cosine_similarity(a.dv, b.dv), 6) >= {threshold}
"""


def cosine_topk_multiprobe_sql(
    k: int = 5,
    query_mod: int = 50,
    dim: int = 64,
    n_planes: int = 6,
    n_probe: int = 3,
    table: str = "embeddings",
) -> str:
    """Replicates ``operators.similarity.cosine_topk_multiprobe``
    bit-for-bit: same md5-derived plane dots as
    :func:`cosine_topk_lsh_sql`, plus the probe set — the query's own
    bucket and the ``n_probe`` sign-flip buckets of its smallest-|margin|
    planes (margin rounded to 6 decimals, plane-index tiebreak, identical
    to the Spark side's struct sort)."""
    from .operators.similarity import _hyperplane

    def plane_dot(p: int) -> str:
        lit = "[" + ", ".join(
            "1.0" if x > 0 else "-1.0" for x in _hyperplane(dim, p)
        ) + "]"
        return (
            f"list_reduce(list_prepend(cast(0.0 as double), "
            f"list_transform(range(1, {dim + 1}), i -> dv[i] * ({lit}::double[])[i])), "
            f"(acc, x) -> acc + x)"
        )

    dcols = ", ".join(f"{plane_dot(p)} as d{p}" for p in range(n_planes))
    base = " + ".join(
        f"(case when d{p} >= 0 then {1 << p} else 0 end)" for p in range(n_planes)
    )
    margins = ", ".join(
        f"struct_pack(m := round(abs(d{p}), 6), p := {p})" for p in range(n_planes)
    )
    return f"""
with v as (
  select vec_id, cast(embedding as double[]) as dv from {table}
), qd as (
  select vec_id as query_id, dv as qv, {dcols} from v where vec_id % {query_mod} = 0
), qp as (
  select query_id, qv, ({base}) as base,
    list_sort([{margins}]) as margins
  from qd
), probes as (
  select query_id, qv,
    unnest(list_distinct(list_concat(
      list_prepend(base,
        list_transform(margins[1:{n_probe}], s -> xor(base, (1 << s.p)))),
      case when {n_probe} >= 2
        then [xor(xor(base, (1 << margins[1].p)), (1 << margins[2].p))]
        else [] end)))
      as bucket
  from qp
), cd as (
  select vec_id as neighbor_id, dv as cv, {dcols} from v
), c as (
  select neighbor_id, cv, ({base}) as bucket from cd
), scored as (
  select query_id, neighbor_id,
    round(list_cosine_similarity(cv, qv), 6) as cosine
  from c join probes using (bucket) where query_id <> neighbor_id
), ranked as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id order by cosine desc, neighbor_id asc) as integer) as rank
  from scored
)
select query_id, neighbor_id, cosine, rank from ranked where rank <= {k}
"""


def _kmeans_ctes(
    v_cte: str, n_centroids: int, dim: int, iters: int
) -> tuple[list[str], str]:
    """The deterministic in-engine k-means as unrolled CTE pairs
    (assign_i, cents_i) over a ``v(id, dv)`` source CTE. Returns
    (cte_list, final_codebook_cte_name). Training grid mirrors the Spark
    side exactly: ti = exact bigint milli-units, tv = ti/1000.0;
    centroid refinement divides an exact integer sum so the 4-decimal
    round sees an identical double on both engines (round(avg(double))
    diverges at summation-order noise near .00005 boundaries — observed
    at sf0.1)."""
    ctes = [
        v_cte
        + f""", vr as (
  select id, dv,
    list_transform(dv, x -> cast(round(x * 1000) as bigint)) as ti,
    list_transform(dv, x -> cast(round(x * 1000) as bigint) / 1000.0) as tv
  from v
), c0 as (
  select id as cid, tv as cv from vr order by id limit {n_centroids}
)"""
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(f"""a{i} as (
  select id, ti, tv, cell from (
    select vr.id, vr.ti, vr.tv, c.cid as cell,
      row_number() over (partition by vr.id
        order by round(list_cosine_similarity(vr.tv, c.cv), 6) desc, c.cid asc) as rn
    from vr, {prev} c
  ) where rn = 1
), c{i} as (
  -- 4-decimal rounded mean in PURE INTEGER arithmetic (matches the
  -- Spark side): float round(sum/(1000n), 4) lands exactly on decimal
  -- half-cases where engines' rounding modes disagree
  select cell as cid, list(mv order by idx) as cv from (
    select cell, r.i as idx,
      (case when sum(ti[r.i]) >= 0 then 1 else -1 end)
        * ((20 * abs(sum(ti[r.i])) + count(*)) // (2 * count(*)))
        / 10000.0 as mv
    from a{i}, range(1, {dim + 1}) r(i)
    group by cell, r.i
  ) group by cell
)""")
        prev = f"c{i}"
    return ctes, prev


def semdedup_sql(
    k_unused: int = 0,
    n_clusters: int = 16,
    iters: int = 2,
    threshold: float = 0.95,
    dim: int = 64,
    clone_mod: int = 20,
    clone_off: int = 3,
    table: str = "embeddings",
) -> str:
    """Replicates ``__spark_entry__.d11_semdedup``: the corpus is the
    embeddings table with DETERMINISTIC semantic clones planted (every
    ``vec_id % clone_mod == clone_off`` vector is replaced by a scaled +
    integer-grid-perturbed copy of the vector ``clone_off`` ids below
    it — high cosine to its base, no shared n-grams to find), then the
    SemDeDup rule: k-means cells, and within a cell a vector is dropped
    iff a near-identical mate (round(cosine,6) >= threshold) sits
    strictly FARTHER from the centroid (lower centroid-cosine; id
    tiebreak toward the smaller id surviving) — the edge example is
    the survivor, per the paper."""
    v_cte = f"""base as (
  select vec_id as id, cast(embedding as double[]) as bv from {table}
), v as (
  select b.id, list(val order by i) as dv from (
    select b.id, r.i as i,
      case when b.id % {clone_mod} = {clone_off} and o.id is not null
        then round(o.bv[r.i + 1] * 0.97
                   + ((b.id * 17 + r.i) % 7 - 3) / 1000.0, 3)
        else round(b.bv[r.i + 1], 3) end as val
    from base b
    left join base o on b.id - {clone_off} = o.id, range(0, {dim}) r(i)
  ) b group by b.id
)"""
    ctes, prev = _kmeans_ctes(v_cte, n_clusters, dim, iters)
    return f"""
with {', '.join(ctes)}, assign as (
  select id, dv, cell, cent_cos from (
    select v.id, v.dv, c.cid as cell,
      round(list_cosine_similarity(v.dv, c.cv), 6) as cent_cos,
      row_number() over (partition by v.id
        order by round(list_cosine_similarity(v.dv, c.cv), 6) desc, c.cid asc) as rn
    from v, {prev} c
  ) where rn = 1
), dominated as (
  select distinct a.id
  from assign a join assign b on a.cell = b.cell and a.id <> b.id
  where round(list_cosine_similarity(a.dv, b.dv), 6) >= {threshold}
    and (b.cent_cos < a.cent_cos
         or (b.cent_cos = a.cent_cos and b.id < a.id))
)
select a.id as vec_id, a.cell, round(a.cent_cos, 6) as cent_cosine,
  (d.id is null) as kept
from assign a left join dominated d on a.id = d.id
"""


def semantic_coverage_sample_sql(
    per_cell: int = 5,
    n_clusters: int = 16,
    iters: int = 2,
    dim: int = 64,
    clustered: bool = True,
    spread: float = 0.15,
    table: str = "embeddings",
) -> str:
    """Replicates ``operators.sampling.semantic_coverage_sample`` over
    the derived clustered corpus: k-means cells (shared unrolled CTEs),
    assignment by round(cosine,6) with centroid-id tiebreak, then the
    ``per_cell`` prototypes per cell (centroid-cosine desc, id asc)."""
    if clustered:
        v_cte = f"""v as (
  select id, list(val order by i) as dv from (
    select e.vec_id as id, r.i as i,
      round(((((e.vec_id // 7) % {n_clusters}) * 31 + r.i * 17) % 13 - 6) / 6.0
            + {spread} * cast(e.embedding[r.i + 1] as double), 3) as val
    from {table} e, range(0, {dim}) r(i)
  ) group by id
)"""
    else:
        v_cte = f"""v as (
  select vec_id as id, cast(embedding as double[]) as dv from {table}
)"""
    ctes, prev = _kmeans_ctes(v_cte, n_clusters, dim, iters)
    return f"""
with {', '.join(ctes)}, assign as (
  select id, cell, cent_cos from (
    select v.id, c.cid as cell,
      round(list_cosine_similarity(v.dv, c.cv), 6) as cent_cos,
      row_number() over (partition by v.id
        order by round(list_cosine_similarity(v.dv, c.cv), 6) desc, c.cid asc) as rn
    from v, {prev} c
  ) where rn = 1
)
select id as vec_id, cell, round(cent_cos, 6) as cent_cosine,
  cast(cell_rank as integer) as cell_rank
from (
  select id, cell, cent_cos,
    row_number() over (partition by cell
      order by cent_cos desc, id asc) as cell_rank
  from assign
) where cell_rank <= {per_cell}
"""


def cosine_topk_ivf_trained_sql(
    k: int = 5,
    query_mod: int = 50,
    n_centroids: int = 64,
    nprobe: int = 8,
    dim: int = 64,
    iters: int = 2,
    table: str = "embeddings",
    clustered: bool = False,
    n_clusters: int = 16,
    spread: float = 0.15,
) -> str:
    """Replicates ``operators.similarity.cosine_topk_ivf_trained``: the
    Lloyd iterations are UNROLLED as CTE pairs (assign_i, cents_i).
    Cross-engine float determinism comes from the same rounding ladder as
    the Spark side: training vectors rounded to 3 decimals, refined
    centroid components to 4, cosines to 6 with id tiebreaks — at those
    precisions summation-order differences sit ~1e-12 below the rounding
    step, so both engines materialize identical codebooks.

    ``clustered=True`` replaces the corpus with the derived
    mixture-of-Gaussians table (``testdata.load_clustered_embeddings``):
    cluster ``(id // 7) % n_clusters``, exact-rational centers
    ``((c*31 + i*17) % 13 - 6) / 6``, component
    ``round(center + spread * original, 3)`` — identical IEEE arithmetic
    on both engines."""
    if clustered:
        v_cte = f"""v as (
  select id, list(val order by i) as dv from (
    select e.vec_id as id, r.i as i,
      round(((((e.vec_id // 7) % {n_clusters}) * 31 + r.i * 17) % 13 - 6) / 6.0
            + {spread} * cast(e.embedding[r.i + 1] as double), 3) as val
    from {table} e, range(0, {dim}) r(i)
  ) group by id
)"""
    else:
        v_cte = f"""v as (
  select vec_id as id, cast(embedding as double[]) as dv from {table}
)"""
    ctes, prev = _kmeans_ctes(v_cte, n_centroids, dim, iters)
    return f"""
with {', '.join(ctes)}, assign as (
  select id, dv, cell from (
    select vr.id, vr.dv, c.cid as cell,
      row_number() over (partition by vr.id
        order by round(list_cosine_similarity(vr.dv, c.cv), 6) desc, c.cid asc) as rn
    from vr, {prev} c
  ) where rn = 1
), q as (
  select id as query_id, dv as qv from v where id % {query_mod} = 0
), probes as (
  select query_id, qv, cell from (
    select q.query_id, q.qv, c.cid as cell,
      row_number() over (partition by q.query_id
        order by round(list_cosine_similarity(q.qv, c.cv), 6) desc, c.cid asc) as rn
    from q, {prev} c
  ) where rn <= {nprobe}
), scored as (
  select p.query_id, a.id as neighbor_id,
    round(list_cosine_similarity(a.dv, p.qv), 6) as cosine
  from assign a join probes p on a.cell = p.cell
  where p.query_id <> a.id
), ranked as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id order by cosine desc, neighbor_id asc) as integer) as rank
  from scored
)
select query_id, neighbor_id, cosine, rank from ranked where rank <= {k}
"""


def cosine_topk_ivf_sql(
    k: int = 5,
    query_mod: int = 50,
    n_centroids: int = 16,
    nprobe: int = 4,
    table: str = "embeddings",
) -> str:
    """Replicates ``operators.similarity.cosine_topk_ivf``: codebook = the
    ``n_centroids`` lowest-id vectors; cell assignment and probe ranking use
    round(cosine, 6) with centroid-id tiebreak, so the partitioning is
    engine-reproducible."""
    return f"""
with v as (
  select vec_id as id, cast(embedding as double[]) as dv from {table}
), cents as (
  select id as cid, dv as cv from v order by id limit {n_centroids}
), assign as (
  select id, dv, cell from (
    select v.id, v.dv, c.cid as cell,
      row_number() over (partition by v.id
        order by round(list_cosine_similarity(v.dv, c.cv), 6) desc, c.cid asc) as rn
    from v, cents c
  ) where rn = 1
), q as (
  select id as query_id, dv as qv from v where id % {query_mod} = 0
), probes as (
  select query_id, qv, cell from (
    select q.query_id, q.qv, c.cid as cell,
      row_number() over (partition by q.query_id
        order by round(list_cosine_similarity(q.qv, c.cv), 6) desc, c.cid asc) as rn
    from q, cents c
  ) where rn <= {nprobe}
), scored as (
  select p.query_id, a.id as neighbor_id,
    round(list_cosine_similarity(a.dv, p.qv), 6) as cosine
  from assign a join probes p on a.cell = p.cell
  where p.query_id <> a.id
), ranked as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id order by cosine desc, neighbor_id asc) as integer) as rank
  from scored
)
select query_id, neighbor_id, cosine, rank from ranked where rank <= {k}
"""


_HEX = "strpos('0123456789abcdef', substr(md5(text), {pos}, 1)) - 1"


def cosine_topk_ivf_incremental_sql(
    k: int = 5,
    query_mod: int = 25,
    n_centroids: int = 16,
    nprobe: int = 3,
    batch_mod: int = 2,
    table: str = "embeddings",
) -> str:
    """Replicates ``__spark_entry__.s11_ann_index_append``: the corpus
    arrives in two batches (batch A = ``id % batch_mod = 0``, batch B =
    the rest), the codebook is FROZEN on batch A (its ``n_centroids``
    lowest-id vectors — exactly what an incremental deployment does:
    train once, assign forever), and the SAME query set searches the
    index after each commit. Phase ``'A'`` ranks against batch A's
    inverted lists only; phase ``'AB'`` against the union — the closed
    form of "append-only index maintenance equals full recompute"."""
    return f"""
with v as (
  select vec_id as id, cast(embedding as double[]) as dv from {table}
), va as (
  select id, dv from v where id % {batch_mod} = 0
), cents as (
  select id as cid, dv as cv from va order by id limit {n_centroids}
), assign_a as (
  select id, dv, cell from (
    select va.id, va.dv, c.cid as cell,
      row_number() over (partition by va.id
        order by round(list_cosine_similarity(va.dv, c.cv), 6) desc, c.cid asc) as rn
    from va, cents c
  ) where rn = 1
), assign_ab as (
  select id, dv, cell from (
    select v.id, v.dv, c.cid as cell,
      row_number() over (partition by v.id
        order by round(list_cosine_similarity(v.dv, c.cv), 6) desc, c.cid asc) as rn
    from v, cents c
  ) where rn = 1
), q as (
  select id as query_id, dv as qv from v where id % {query_mod} = 0
), probes as (
  select query_id, qv, cell from (
    select q.query_id, q.qv, c.cid as cell,
      row_number() over (partition by q.query_id
        order by round(list_cosine_similarity(q.qv, c.cv), 6) desc, c.cid asc) as rn
    from q, cents c
  ) where rn <= {nprobe}
), ranked_a as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id
                            order by cosine desc, neighbor_id asc) as integer) as rank
  from (
    select p.query_id, a.id as neighbor_id,
      round(list_cosine_similarity(a.dv, p.qv), 6) as cosine
    from assign_a a join probes p on a.cell = p.cell
    where p.query_id <> a.id
  )
), ranked_ab as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id
                            order by cosine desc, neighbor_id asc) as integer) as rank
  from (
    select p.query_id, a.id as neighbor_id,
      round(list_cosine_similarity(a.dv, p.qv), 6) as cosine
    from assign_ab a join probes p on a.cell = p.cell
    where p.query_id <> a.id
  )
)
select 'A' as phase, query_id, neighbor_id, cosine, rank
from ranked_a where rank <= {k}
union all
select 'AB' as phase, query_id, neighbor_id, cosine, rank
from ranked_ab where rank <= {k}
"""


def media_features_sql(dim: int = 8, table: str = "documents") -> str:
    """Oracle for ``__spark_entry__.m01_media_features``: the fake feature is
    md5-digest bytes / 255 stored as float32 — reproduced from the hex string
    with an explicit float32 round-trip and the same left-fold sum order."""
    byte_i = (
        f"((({_HEX.format(pos='2*(i % 16)+1')}) * 16 "
        f"+ ({_HEX.format(pos='2*(i % 16)+2')})) / 255.0)"
    )
    return f"""
select doc_id as media_id,
  cast(octet_length(encode(text)) as bigint) as n_bytes,
  md5(text) as content_md5,
  round(list_reduce(list_prepend(cast(0.0 as double),
    list_transform(range(0, {dim}), i -> cast(cast({byte_i} as float) as double))),
    (acc, x) -> acc + x), 6) as feature_sum
from {table}
"""


def frame_sample_sql(every_ms: int = 1_000, dur_mod: int = 7, table: str = "documents") -> str:
    """Oracle for ``__spark_entry__.m02_frame_sample``: duration is the
    deterministic ``(doc_id % dur_mod + 1) * every_ms``, one row per sampled
    frame timestamp."""
    return f"""
with f as (
  select doc_id as media_id,
    unnest(range(0, doc_id % {dur_mod} + 1)) as fi
  from {table}
)
select media_id, cast(fi as integer) as frame_idx,
  cast(fi * {every_ms} as integer) as frame_ts_ms
from f
"""


def token_stats_sql(table: str = "documents") -> str:
    return f"""
with toks as (select doc_id, text, {TOKENS} as tks from {table})
select doc_id,
  cast(length(text) as bigint) as n_chars,
  cast(len(tks) as bigint) as n_tokens,
  cast(ceil(length(text) / 4.0) as bigint) as n_tokens_bpe,
  cast(len(list_distinct(tks)) as bigint) as n_unique_tokens
from toks
"""


def _sql_strlist(words: list[str]) -> str:
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + "]"


def text_quality_sql(table: str = "documents") -> str:
    stop = _sql_strlist(EN_STOPWORDS)
    return f"""
with base as (
  select doc_id, text, {TOKENS} as tks,
    length(text) as n_chars,
    len({TOKENS}) as n_tokens,
    length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) as n_punct,
    len(list_filter({TOKENS}, t -> list_contains({stop}, t))) as n_stop,
    len(list_distinct({TOKENS})) as n_uniq,
    cast(list_sum(list_transform({TOKENS}, t -> cast(length(t) as bigint))) as bigint) as tok_chars
  from {table}
)
select doc_id,
  cast(n_chars as bigint) as n_chars,
  cast(n_tokens as bigint) as n_tokens,
  round(n_punct / n_chars, 6) as punct_ratio,
  round(n_stop / n_tokens, 6) as stopword_ratio,
  round(n_uniq / n_tokens, 6) as unique_ratio,
  round(tok_chars / n_tokens, 6) as mean_token_len,
  round(
    least(n_tokens / 100.0, 1.0) * 0.25
    + (1 - least(n_punct / n_chars * 5, 1.0)) * 0.25
    + least(n_stop / n_tokens * 5, 1.0) * 0.25
    + least(n_uniq / n_tokens, 1.0) * 0.25, 6) as quality_score
from base
"""


def language_id_sql(table: str = "documents") -> str:
    langs = sorted(LANG_MARKERS)
    hits = ",\n    ".join(
        f"cast(len(list_intersect(tks, {_sql_strlist(LANG_MARKERS[lang])})) as integer) as hits_{lang}"
        for lang in langs
    )
    gmax = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    first_argmax = " ".join(
        f"when hits_{lang} = {gmax} then '{lang}'" for lang in langs
    )
    return f"""
with toks as (
  select doc_id, list_distinct({TOKENS}) as tks from {table}
), scores as (
  select doc_id,
    {hits}
  from toks
)
select doc_id,
  case when {gmax} = 0 then 'und' else (case {first_argmax} end) end as lang_pred,
  {gmax} as marker_hits
from scores
"""


def fingerprint_sql(table: str = "documents") -> str:
    return f"""
with norm as (
  select doc_id, array_to_string({TOKENS}, ' ') as n from {table}
)
select doc_id,
  md5(n) as fingerprint_md5,
  list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(string_split(n, ''), c -> cast(ord(c) as bigint))),
    (acc, c) -> (acc * 31 + c) % 1000000007) as fingerprint_rolling
from norm
"""


def repetition_sql(table: str = "documents") -> str:
    """Mirrors operators.text.repetition_stats: per-doc duplicate-token and
    duplicate/top 2-,3-shingle fractions via unnest + group counts (the
    Spark side computes the same numbers row-locally)."""

    def gram_ctes(n: int) -> str:
        return f"""
g{n} as (
  select doc_id,
    unnest(list_transform(generate_series(1, len(tks) - {n - 1}),
                          i -> array_to_string(tks[i:i+{n - 1}], ' '))) as g
  from toks where len(tks) >= {n}
), c{n} as (
  select doc_id, g, count(*) as c from g{n} group by doc_id, g
), a{n} as (
  select doc_id, sum(c) as total, max(c) as top, sum(c) - count(*) as dups
  from c{n} group by doc_id
)"""

    return f"""
with toks as (select doc_id, {TOKENS} as tks from {table}),
base as (
  select doc_id, len(tks) as n_tok, len(list_distinct(tks)) as n_uniq from toks
),{gram_ctes(2)},{gram_ctes(3)}
select b.doc_id,
  cast(b.n_tok as bigint) as n_tokens,
  round((b.n_tok - b.n_uniq) / b.n_tok, 6) as dup_token_frac,
  -- NULL text propagates NULL (matching the Spark side); a short-but-
  -- present doc with no shingles zero-fills via the coalesce
  round(case when b.n_tok is null then null
        else coalesce(a2.dups / a2.total, 0.0) end, 6) as dup_2gram_frac,
  round(case when b.n_tok is null then null
        else coalesce(a2.top / a2.total, 0.0) end, 6) as top_2gram_frac,
  round(case when b.n_tok is null then null
        else coalesce(a3.dups / a3.total, 0.0) end, 6) as dup_3gram_frac,
  round(case when b.n_tok is null then null
        else coalesce(a3.top / a3.total, 0.0) end, 6) as top_3gram_frac
from base b
left join a2 using (doc_id)
left join a3 using (doc_id)
"""


def pii_sql(table: str = "documents", cte: str = "") -> str:
    """Mirrors operators.text.pii_stats (RE2 and Java agree on these ASCII
    patterns by construction). ``cte`` optionally prepends a named CTE the
    caller uses to derive ``table`` (e.g. the gate entry's PII injection)."""
    from .operators.text import PII_PATTERNS

    counts = ",\n  ".join(
        f"cast(len(regexp_extract_all(text, '{p}')) as bigint) as n_{k}"
        for k, p in PII_PATTERNS.items()
    )
    total = " + ".join(f"n_{k}" for k in PII_PATTERNS)
    prelude = f"{cte}," if cte else ""
    return f"""
with {prelude}counts as (
  select doc_id,
  {counts}
  from {table}
)
select doc_id, {', '.join('n_' + k for k in PII_PATTERNS)},
  cast({total} as bigint) as n_pii,
  ({total}) > 0 as has_pii
from counts
"""


def decontaminate_sql(
    table: str = "documents",
    bench_filter: str = "doc_id % 37 = 0",
    corpus_filter: str = "doc_id % 37 != 0",
    n: int = 4,
) -> str:
    """Mirrors operators.decontam.decontaminate: distinct shared n-token
    shingles per corpus doc against the benchmark's shingle set.

    The filters are applied against the full-width ``{table}`` rows inside
    dedicated CTEs (never prefixed with an alias), so any boolean
    expression parses — including ones that don't begin with a bare column
    name, e.g. ``not (doc_id % 2 = 0)``."""
    return f"""
with bench_docs as (select doc_id from {table} where ({bench_filter})),
corpus_docs as (select doc_id from {table} where ({corpus_filter})),
toks as (select doc_id, {TOKENS} as tks from {table}),
sh as (
  select doc_id,
    unnest(list_distinct(list_transform(generate_series(1, len(tks) - {n - 1}),
                         i -> array_to_string(tks[i:i+{n - 1}], ' ')))) as shingle
  from toks
),
bench as (select distinct shingle from sh join bench_docs using (doc_id)),
hits as (
  select s.doc_id, cast(count(*) as bigint) as n_shared
  from sh s join bench using (shingle)
  join corpus_docs using (doc_id)
  group by s.doc_id
)
select c.doc_id,
  cast(coalesce(h.n_shared, 0) as bigint) as n_shared_shingles,
  coalesce(h.n_shared, 0) > 0 as contaminated
from corpus_docs c
left join hits h using (doc_id)
"""


def pack_sequences_sql(
    token_budget: int = 2048, n_shards: int = 8, table: str = "documents"
) -> str:
    """Mirrors operators.packing.pack_sequences (concat-then-chunk packing
    metadata over md5-ordered shards)."""
    from .operators.packing import PACK_SEED

    shard = hash60_sql("doc_id", PACK_SEED)
    order = hash60_sql("doc_id", PACK_SEED + 1)
    return f"""
with base as (
  select doc_id,
    cast(len({TOKENS}) as bigint) as n_tokens,
    cast({shard} % {n_shards} as integer) as shard,
    {order} as h
  from {table}
)
select doc_id, n_tokens, shard,
  cast(floor((sum(n_tokens) over w - n_tokens) / {token_budget}) as bigint)
    as seq_idx,
  cast((sum(n_tokens) over w - n_tokens) % {token_budget} as bigint)
    as seq_offset
from base
window w as (partition by shard order by h, doc_id
             rows between unbounded preceding and current row)
"""


def vocab_topk_sql(k: int = 100, table: str = "documents") -> str:
    """Mirrors operators.text.vocab_topk."""
    return f"""
select token, cast(count(*) as bigint) as freq
from (select unnest({TOKENS}) as token from {table})
group by token
order by freq desc, token
limit {k}
"""


# ------------------------------------------------------------------ sampling


def _fraction_expr(key_expr: str, seed: int) -> str:
    from .operators.sampling import fraction_sql

    return fraction_sql(key_expr, seed)


def hash_sample_sql(
    rate: float, seed: int = 0, table: str = "documents",
    key_expr: str = "cast(doc_id as varchar)",
) -> str:
    """Mirror of operators.sampling.hash_sample (same md5 fraction, same
    IEEE double division, so the member set matches bit-exactly)."""
    return (
        f"select doc_id, lang, n_chars from {table} "
        f"where {_fraction_expr(key_expr, seed)} < {rate!r}"
    )


def stratified_sample_sql(
    rates: dict[str, float], default_rate: float, seed: int = 0,
    table: str = "documents", strata_col: str = "lang",
    key_expr: str = "cast(doc_id as varchar)",
) -> str:
    """Mirror of operators.sampling.stratified_sample: the CASE folds the
    rate map exactly like the Spark when/otherwise chain (last-listed
    stratum wins ties, NULL falls to default). Output is the per-stratum
    survivor count."""
    cases = " ".join(
        f"when {strata_col} = '{s}' then {r!r}" for s, r in rates.items()
    )
    return f"""
select {strata_col} as stratum, count(*) as cnt from {table}
where {_fraction_expr(key_expr, seed)} < (case {cases} else {default_rate!r} end)
group by 1
"""


def assign_splits_sql(
    weights: dict[str, float], seed: int = 0, table: str = "documents",
    key_expr: str = "cast(doc_id as varchar)",
) -> str:
    """Mirror of operators.sampling.assign_splits: cumulative-interval CASE
    in the same insertion order. Output is the per-split count."""
    names = list(weights)
    acc = 0.0
    whens = []
    frac = _fraction_expr(key_expr, seed)
    for name in names[:-1]:
        acc += weights[name]
        whens.append(f"when {frac} < {acc!r} then '{name}'")
    case = " ".join(whens)
    return f"""
select (case {case} else '{names[-1]}' end) as split, count(*) as cnt
from {table} group by 1
"""


def weighted_sample_sql(
    k: int = 200, seed: int = 11, table: str = "documents",
) -> str:
    """Mirror of operators.sampling.weighted_sample over the documents
    table, weighted by n_chars: the identical Efraimidis–Spirtakis
    exponential-race priority over the identical hash60 — see
    sampling.weighted_sample_sql for the float-determinism argument."""
    from .operators.sampling import weighted_sample_sql as _ws

    return _ws(
        k,
        "n_chars",
        "cast(doc_id as varchar)",
        seed=seed,
        table=table,
        cols="doc_id, lang, n_chars",
    )


def token_budget_sql(table: str = "documents") -> str:
    """Mirror of operators.sampling.token_budget_sample for sm11: the
    identical hash order, ROWS frame, strict pre-total cut, and budget
    CASE over the language strata."""
    from .operators.sampling import token_budget_sample_sql as _tb

    return _tb(
        {"en": 20_000, "de": 8_000, "es": 8_000, "fr": 8_000},
        strata_expr="lang",
        token_expr="n_chars",
        key_expr="cast(doc_id as varchar)",
        default_budget=5_000,
        seed=3,
        table=table,
        cols="doc_id, lang, n_chars",
    )


def top_k_sample_sql(
    k: int, seed: int = 0, table: str = "documents",
    key_expr: str = "cast(doc_id as varchar)",
) -> str:
    """Mirror of operators.sampling.top_k_sample: k smallest key hashes,
    hash-then-key total order."""
    from .operators.hashing import hash60_sql

    h = hash60_sql(key_expr, seed)
    return (
        f"select doc_id, lang from {table} "
        f"order by {h}, doc_id limit {k}"
    )


def dedup_clusters_sql(pairs_sql: str) -> str:
    """Mirror of operators.graph.dedup_clusters over a pair query.

    ``pairs_sql`` is any query emitting ``id_a``/``id_b`` (extra columns
    ignored). Connected components via a recursive reachability walk: a
    node's cluster id is the MINIMUM id among all nodes it can reach —
    the same canonical label the Spark hash-to-min iteration produces.
    The recursive UNION (set semantics) bounds the walk: each (node,
    reachable-label) pair enters the working set once, so the CTE is
    O(sum of component sizes squared) — fine at oracle scale, while the
    Spark side is the log-rounds scale path.
    """
    return f"""
with recursive pairs as (
{pairs_sql}
), edges as (
  select id_a as u, id_b as v from pairs
  union
  select id_b as u, id_a as v from pairs
), walk(u, lbl) as (
  select u, u from edges
  union
  select e.v, w.lbl from walk w join edges e on e.u = w.u
), comp as (
  select u as doc_id, min(lbl) as cluster_id from walk group by u
), sizes as (
  select cluster_id, count(*) as cluster_size from comp group by cluster_id
)
select c.doc_id, c.cluster_id, s.cluster_size,
  c.doc_id = c.cluster_id as is_keeper
from comp c join sizes s using (cluster_id)
"""


def pick_canonical_sql(pairs_sql: str, quality_sql: str | None = None) -> str:
    """Mirror of operators.graph.pick_canonical: per transitive dup cluster
    keep the highest-quality member (ties → lowest doc_id). Reuses the
    recursive-CTE components oracle and the text-quality oracle."""
    q = quality_sql or text_quality_sql()
    return f"""
with clusters as (
  select doc_id, cluster_id, cluster_size from ({dedup_clusters_sql(pairs_sql)})
), q as ({q}),
scored as (
  select c.doc_id, c.cluster_id, c.cluster_size, q.quality_score as score
  from clusters c join q using (doc_id)
)
select doc_id, cluster_id, cluster_size, score,
  row_number() over (partition by cluster_id
                     order by score desc, doc_id) = 1 as is_keeper
from scored
"""


def chunk_documents_sql(
    size: int = 512, overlap: int = 64, table: str = "documents"
) -> str:
    """Mirror of operators.text.chunk_documents: chunk i covers characters
    [i*step, i*step+size), step = size - overlap, at least one chunk per
    document (NULL text = one empty chunk)."""
    step = size - overlap
    return f"""
with base as (select doc_id, coalesce(text, '') as t from {table}),
nn as (
  select doc_id, t,
    greatest(1, cast(ceil((length(t) - {overlap}) / {step}.0) as bigint)) as nc
  from base
), ex as (
  select doc_id, t, unnest(range(0, nc)) as chunk_idx from nn
)
select doc_id, cast(chunk_idx as int) as chunk_idx,
  cast(length(substr(t, cast(chunk_idx * {step} + 1 as bigint), {size}))
       as int) as chunk_len,
  md5(substr(t, cast(chunk_idx * {step} + 1 as bigint), {size})) as chunk_hash
from ex
"""


def mixture_sample_sql(
    weights: dict[str, float], seed: int = 0, table: str = "documents",
    strata_col: str = "lang", key_expr: str = "cast(doc_id as varchar)",
) -> str:
    """Mirror of operators.sampling.mixture_sample: acceptance rates are
    derived IN SQL with the same IEEE double arithmetic ((w*t)/n with
    t = min(n/w), no normalization — min and the two-op rate are
    order-independent), so the member set matches bit-exactly."""
    vals = ", ".join(f"('{g}', {float(w)!r})" for g, w in weights.items())
    return f"""
with w(stratum, wt) as (values {vals}),
c as (
  select {strata_col} as stratum, count(*) as n from {table}
  where {strata_col} in (select stratum from w) group by 1
),
p as (select w.stratum, w.wt, c.n from w join c using (stratum) where c.n > 0),
t as (select min(n / wt) as t from p),
r as (select stratum, (wt * (select t from t)) / n as rate from p)
select d.doc_id, d.{strata_col} from {table} d
join r on d.{strata_col} = r.stratum
where {_fraction_expr(key_expr, seed)} < r.rate
"""


def line_dedup_sql(table: str = "documents", text_expr: str = "text") -> str:
    """Mirrors operators.text.line_dedup: split on newline, drop blank
    lines, keep each distinct line's first (doc_id, position) occurrence
    corpus-wide, summarize per doc. ``text_expr`` lets the gate entry build
    a multi-line corpus from the single-line test documents."""
    return f"""
with base as (select doc_id, {text_expr} as t from {table}),
parts as (select doc_id, string_split(coalesce(t, ''), chr(10)) as ps from base),
lines as (
  select doc_id, unnest(generate_series(1, len(ps))) as i, ps from parts
),
nonblank as (
  select doc_id, i - 1 as line_idx, md5(trim(ps[i])) as line_hash
  from lines where len(trim(ps[i])) > 0
),
flagged as (
  select doc_id, line_idx, line_hash,
    row_number() over (partition by line_hash order by doc_id, line_idx) = 1 as keep
  from nonblank
),
perdoc as (
  select doc_id,
    count(*) as n_lines,
    count(*) filter (keep) as n_kept,
    md5(string_agg(line_hash, chr(10) order by line_idx) filter (keep)) as kept_hash
  from flagged group by doc_id
)
select b.doc_id,
  cast(coalesce(p.n_lines, 0) as bigint) as n_lines,
  cast(coalesce(p.n_kept, 0) as bigint) as n_kept,
  cast(coalesce(p.n_lines, 0) - coalesce(p.n_kept, 0) as bigint) as n_dropped,
  p.kept_hash
from (select distinct doc_id from base) b
left join perdoc p using (doc_id)
"""


def shuffle_shard_sql(
    n_shards: int,
    seed: int = 0,
    key: str = "doc_id",
    table: str = "documents",
) -> str:
    """Mirrors operators.sampling.shuffle_shard on the documents table."""
    h = hash60_sql(key, seed)
    return f"""
with h as (select {key}, {h} as hh from {table})
select {key},
  cast(hh % {n_shards} as integer) as shard,
  cast(row_number() over (partition by hh % {n_shards}
                          order by hh asc, {key} asc) - 1 as bigint) as pos
from h
"""


def cosine_topk_ivfpq_sql(
    dim: int,
    k: int = 5,
    query_mod: int = 50,
    n_centroids: int = 16,
    nprobe: int = 4,
    m_sub: int = 8,
    k_sub: int = 16,
    rerank: int = 0,
    table: str = "embeddings",
) -> str:
    """Replicates ``operators.similarity.cosine_topk_ivfpq``: deterministic
    coarse + sub-codebooks (lowest-id vectors), round(.,6)+id-tiebroken
    argmins, ADC scoring ``sum_s dot(q_s, c_code) / (|q|*|recon|)``."""
    dsub = dim // m_sub
    slice_ = "list_transform(generate_series(1, {d}), i -> {v}[s * {d} + i])"
    sv = slice_.format(d=dsub, v="dv")
    qsv_qual = (
        "list_transform(generate_series(1, {d}), i -> qv[qs.s * {d} + i])"
        .format(d=dsub)
    )
    final = "ranked"
    rerank_ctes = ""
    if rerank:
        final = "reranked"
        rerank_ctes = f""", exact as (
  select r.query_id, r.neighbor_id,
    round(list_cosine_similarity(nv.dv, q.qv), 6) as cosine
  from ranked r
  join v nv on nv.id = r.neighbor_id
  join q on q.query_id = r.query_id
  where r.rank <= {rerank}
), reranked as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id
                            order by cosine desc, neighbor_id asc) as integer) as rank
  from exact
)"""
    return f"""
with v as (
  select vec_id as id, cast(embedding as double[]) as dv from {table}
), cents as (
  select id as cid, dv as cv from v order by id limit {n_centroids}
), assign as (
  select id, cell from (
    select v.id, c.cid as cell,
      row_number() over (partition by v.id
        order by round(list_cosine_similarity(v.dv, c.cv), 6) desc, c.cid asc) as rn
    from v, cents c
  ) where rn = 1
), train as (
  select row_number() over (order by id) - 1 as j, dv
  from (select * from v order by id limit {k_sub})
), subcents as (
  select s, j, {slice_.format(d=dsub, v="dv")} as scv,
    list_inner_product({slice_.format(d=dsub, v="dv")},
                       {slice_.format(d=dsub, v="dv")}) as c2
  from (select j, dv, unnest(generate_series(0, {m_sub - 1})) as s from train)
), sub as (
  select id, s, {sv} as sv
  from (select id, dv, unnest(generate_series(0, {m_sub - 1})) as s from v)
), codes as (
  select id, s, code, c2c from (
    select sub.id, sub.s, sc.j as code, sc.c2 as c2c,
      row_number() over (partition by sub.id, sub.s
        order by round(list_inner_product(sv, sv)
                       - 2 * list_inner_product(sv, sc.scv) + sc.c2, 6) asc,
                 sc.j asc) as rn
    from sub join subcents sc on sub.s = sc.s
  ) where rn = 1
), q as (
  select id as query_id, dv as qv,
    sqrt(list_inner_product(dv, dv)) as qn
  from v where id % {query_mod} = 0
), probes as (
  select query_id, qn, cell from (
    select q.query_id, q.qn, c.cid as cell,
      row_number() over (partition by q.query_id
        order by round(list_cosine_similarity(q.qv, c.cv), 6) desc, c.cid asc) as rn
    from q, cents c
  ) where rn <= {nprobe}
), adc as (
  select query_id, s, j, list_inner_product(qsv, scv) as pdot from (
    select query_id, s2.s as s, s2.j as j, {qsv_qual} as qsv, s2.scv as scv
    from (select query_id, qv, unnest(generate_series(0, {m_sub - 1})) as s
          from q) qs
    join subcents s2 on qs.s = s2.s
  )
), scored as (
  select p.query_id, a.id as neighbor_id,
    round(sum(t.pdot) / (any_value(p.qn) * sqrt(sum(c.c2c))), 6) as cosine
  from assign a
  join codes c on a.id = c.id
  join probes p on a.cell = p.cell
  join adc t on t.query_id = p.query_id and t.s = c.s and t.j = c.code
  where p.query_id <> a.id
  group by p.query_id, a.id
), ranked as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id
                            order by cosine desc, neighbor_id asc) as integer) as rank
  from scored
){rerank_ctes}
select query_id, neighbor_id, cosine, rank from {final} where rank <= {k}
"""


def ngram_perplexity_sql(k: float = 0.5, table: str = "documents") -> str:
    """Mirrors operators.text.ngram_perplexity with the model fit on the
    same corpus: add-k-smoothed char-trigram conditional, position-based
    counts, V = distinct continuation chars."""
    return f"""
with base as (
  select doc_id,
    lower(regexp_replace(trim(coalesce(text, '')), '\\s+', ' ', 'g')) as t
  from {table}
),
tri as (
  select doc_id, substr(t, i, 3) as g, substr(t, i, 2) as p
  from (select doc_id, t, unnest(generate_series(1, len(t) - 2)) as i
        from base where len(t) >= 3)
),
c3 as (select g, count(*) as c from tri group by g),
c2 as (select p, count(*) as c from tri group by p),
v as (select count(distinct substr(g, 3, 1)) as v from tri),
scored as (
  select doc_id, count(*) as n_ngrams,
    avg(-ln((c3.c + {k}) / (c2.c + {k} * v.v))) as s
  from tri join c3 using (g) join c2 using (p) cross join v
  group by doc_id
)
select b.doc_id,
  cast(coalesce(n_ngrams, 0) as bigint) as n_ngrams,
  round(s, 6) as avg_neg_logp,
  round(exp(s), 4) as ppl
from base b left join scored using (doc_id)
"""


def url_stats_sql(table: str = "documents", cte: str = "") -> str:
    """Mirrors operators.text.url_stats. ``cte`` optionally prepends the
    gate entry's URL-splicing CTE that derives ``table``."""
    from .operators.text import URL_PATTERN

    prelude = f"{cte}," if cte else ""
    return f"""
with {prelude}doms as (
  select doc_id,
    list_transform(
      regexp_extract_all(coalesce(text, ''), '{URL_PATTERN}', 1),
      d -> lower(d)) as ds
  from {table}
)
select doc_id,
  cast(len(ds) as bigint) as n_urls,
  cast(len(list_distinct(ds)) as bigint) as n_unique_domains,
  ds[1] as first_domain
from doms
"""


def quality_filter_sql(keep_frac: float, table: str = "documents") -> str:
    """Mirrors operators.sampling.quality_filter: exact quantile over the
    rounded quality score via per-score counts + cumulative sum."""
    return f"""
with q as ({text_quality_sql(table)}),
scored as (select doc_id, quality_score from q),
counts as (select quality_score, count(*) as c from scored group by quality_score),
n as (select count(*) as n from scored),
cum as (
  select quality_score,
    sum(c) over (order by quality_score desc
                 rows between unbounded preceding and current row) as cum
  from counts
),
thr as (
  select max(quality_score) as thr from cum, n
  where cum >= ceil({keep_frac} * n.n)
)
select doc_id, quality_score from scored, thr
where quality_score >= thr.thr
"""


def perceptual_hash_sql(bits: int = 60, table: str = "documents") -> str:
    """Mirrors operators.multimodal.perceptual_hash on utf-8 document
    bodies: pixels = md5 digest bytes repeated, bit i set iff
    ``pixel_i * bits > sum(pixels)`` (exact integer arithmetic), packed
    big-endian."""
    byte_i = (
        f"(({_HEX.format(pos='2*(i % 16)+1')}) * 16 "
        f"+ ({_HEX.format(pos='2*(i % 16)+2')}))"
    )
    return f"""
with px as (
  select doc_id as media_id,
    list_transform(range(0, {bits}), i -> {byte_i}) as ps
  from {table}
)
select media_id,
  cast(list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(ps, p -> cast(case when p * {bits} > list_sum(ps)
                                        then 1 else 0 end as bigint))),
    (acc, b) -> acc * 2 + b) as bigint) as phash
from px
"""


def alpha_sample_sql(
    alpha: float, seed: int = 0, table: str = "documents",
    strata_col: str = "lang", key_expr: str = "cast(doc_id as varchar)",
) -> str:
    """Mirror of operators.sampling.alpha_sample: weights = n^alpha from
    the same counts, then mixture_sample's (w*t)/n rate arithmetic."""
    return f"""
with c as (
  select {strata_col} as stratum, count(*) as n from {table}
  where {strata_col} is not null group by 1
),
w as (select stratum, pow(n, {float(alpha)!r}) as wt, n from c),
t as (select min(n / wt) as t from w),
r as (select stratum, (wt * (select t from t)) / n as rate from w)
select d.doc_id, d.{strata_col} from {table} d
join r on d.{strata_col} = r.stratum
where {_fraction_expr(key_expr, seed)} < r.rate
"""


def phash_pairs_sql(
    bits: int = 60,
    band_bits: int = 12,
    max_hamming: int = 4,
    clone_mod: int = 5,
    table: str = "documents",
) -> str:
    """Mirrors the m06 gate entry: md5-derived synthetic pixel arrays
    (decorrelated per doc), perturbed clones, the pure-arithmetic aHash,
    and the band-blocked + exact-popcount pair search."""
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    return f"""
with base as (
  select doc_id as media_id,
    list_transform(range(0, {bits}),
      i -> ({_HEX.format(pos='2*(i % 16)+1')}) * 16
           + ({_HEX.format(pos='2*(i % 16)+2')})) as ps
  from {table}
),
clones as (
  select media_id + 1000000 as media_id,
    list_transform(range(0, {bits}),
      i -> case when i = 0 and ps[1] < 255 then ps[1] + 1
                else ps[i + 1] end) as ps
  from base where media_id % {clone_mod} = 0
),
media as (select * from base union all select * from clones),
hashed as (
  select media_id,
    cast(list_reduce(
      list_prepend(cast(0 as bigint),
        list_transform(ps, p -> cast(case when p * {bits} > list_sum(ps)
                                          then 1 else 0 end as bigint))),
      (acc, b) -> acc * 2 + b) as bigint) as phash
  from media
),
bands as (
  select media_id, phash, b,
    (phash >> (b * {band_bits})) & {mask} as bv
  from hashed, unnest(generate_series(0, {n_bands - 1})) as u(b)
),
cand as (
  select distinct a.media_id as id_a, b.media_id as id_b,
    a.phash as pa, b.phash as pb
  from bands a join bands b
    on a.b = b.b and a.bv = b.bv and a.media_id < b.media_id
)
select id_a, id_b,
  cast(bit_count(xor(pa, pb)) as integer) as hamming
from cand where bit_count(xor(pa, pb)) <= {max_hamming}
"""


def bm25_sql(
    query: str = "fast table merge scan",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    table: str = "documents",
) -> str:
    """Okapi BM25 top-k, mirroring operators.text.bm25_score: same
    tokenizer (TOKENS), same RSJ plus-one idf, same association order in
    every float expression, avgdl derived as one exact long sum divided
    once, and the per-doc sum taken in ASCENDING TERM ORDER on both
    sides (``sum(c order by term)`` here, a sorted-array fold in Spark)
    — so both engines compute bit-identical doubles up to the ln() libm
    ULP, absorbed by the 6 dp round."""
    terms = sorted({t for t in query.strip().lower().split() if t})
    qlist = _sql_strlist(terms)
    return f"""
with base as (
  select doc_id as id, {TOKENS} as tks,
         cast(len({TOKENS}) as bigint) as dl
  from {table}
),
stats as (
  select count(*) as n, cast(sum(dl) as double) / count(*) as avgdl
  from base
),
matched as (
  select id, dl,
         unnest(list_filter(tks, x -> list_contains({qlist}, x))) as term
  from base
),
tf as (
  select id, dl, term, count(*) as tf from matched group by 1, 2, 3
),
idf as (
  select term,
    ln(1.0 + ((select n from stats) - count(distinct id) + 0.5)
             / (count(distinct id) + 0.5)) as idf
  from tf group by term
),
contrib as (
  select tf.id,
    tf.term,
    idf.idf * (tf.tf * ({k1} + 1.0))
      / (tf.tf + {k1} * ((1.0 - {b})
         + {b} * tf.dl / (select avgdl from stats))) as c
  from tf join idf using (term)
)
select id as doc_id, round(sum(c order by term), 6) as bm25,
  cast(count(distinct term) as integer) as n_terms_hit
from contrib
group by id
order by bm25 desc, doc_id asc
limit {top_k}
"""


# planted exact-substring spans for the d12 gate entry: the synthetic
# documents are word-soup with no natural >=8-token repeats, so the entry
# splices these phrases in deterministically (mirrored verbatim between
# the Spark entry and this oracle, same pattern as the PII injection)
SPAN_PHRASE_A = (
    "shared duplicated span alpha bravo charlie delta echo foxtrot "
    "golf hotel india"
)
SPAN_PHRASE_B = "repeated block kilo lima mike november oscar papa quebec romeo"
SPAN_BRIDGE = "bridge filler words between copies"


def substring_corpus_sql(table: str = "documents") -> str:
    """The planted-span corpus as a CTE body: docs ≡ 3 (mod 13) share
    phrase A (cross-document repeats), docs ≡ 5 (mod 29) carry phrase B
    twice (within-document repeat)."""
    return f"""
select doc_id,
  text
  || case when doc_id % 13 = 3 then ' ' || '{SPAN_PHRASE_A}' else '' end
  || case when doc_id % 29 = 5
       then ' ' || '{SPAN_PHRASE_B}' || ' ' || '{SPAN_BRIDGE}'
            || ' ' || '{SPAN_PHRASE_B}'
       else '' end as text
from {table}
"""


def substring_dedup_sql(k: int = 8, table: str = "documents") -> str:
    """Exact-substring dedup accounting, mirroring
    operators.dedup.duplicated_spans(exclude_first=True) over the
    planted corpus: same tokenizer, same hash60 shingle digests, same
    keep-first exclusion (row_number over (id, pos) per digest), same
    gap>k island merge — all integer/window logic, so both engines are
    bit-exact."""
    from .operators.dedup import SPAN_SEED

    dig = hash60_sql(f"array_to_string(tks[pos:pos+{k - 1}], ' ')", SPAN_SEED)
    return f"""
with corpus as ({substring_corpus_sql(table)}),
base as (
  select doc_id as id, {TOKENS} as tks from corpus
),
pos as (
  select id, pos, {dig} as dig
  from (
    select id, tks, unnest(generate_series(1, len(tks) - {k - 1})) as pos
    from base where len(tks) >= {k}
  )
),
ranked as (
  select id, pos,
    row_number() over (partition by dig order by id, pos) as rk,
    count(*) over (partition by dig) as c
  from pos
),
matched as (select id, pos from ranked where c >= 2 and rk > 1),
islands as (
  select id, pos,
    case when lag(pos) over w is null or pos - lag(pos) over w > {k}
         then 1 else 0 end as ni
  from matched
  window w as (partition by id order by pos)
),
numbered as (
  select id, pos,
    sum(ni) over (partition by id order by pos
                  rows between unbounded preceding and current row)
      as island
  from islands
),
spans as (
  select id, min(pos) as s, max(pos) + {k - 1} as e
  from numbered group by id, island
)
select id as doc_id,
  cast(count(*) as integer) as n_spans,
  cast(sum(e - s + 1) as bigint) as dup_tokens,
  cast(min(s) as integer) as first_start,
  cast(max(e) as integer) as last_end
from spans
group by id
order by doc_id
"""


def dedup_against_index_sql(
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    table: str = "documents",
) -> str:
    """Full-corpus recompute of the incremental dedup
    (operators.dedup.dedup_against_index): the odd-id batch (with its
    planted duplicates) is deduped against the even-id indexed corpus
    PLUS smaller-id batch mates, over signatures computed from scratch
    on the union — the equality of this oracle with the Spark side's
    index-join result IS the batch-vs-index ≡ full-recompute claim."""
    from .operators.dedup import MINHASH_PRIME, minhash_perm_constants

    rows = num_perm // bands
    base = f"({hash60_sql('shingle', 0)} % {MINHASH_PRIME})"
    mh_cols = ",\n    ".join(
        f"min(({a} * {base} + {b}) % {MINHASH_PRIME}) as mh{j}"
        for j, (a, b) in enumerate(minhash_perm_constants(num_perm))
    )
    band_selects = []
    for b in range(bands):
        concat = " || ',' || ".join(
            f"mh{b * rows + r}::varchar" for r in range(rows)
        )
        band_selects.append(
            f"select doc_id, {b} as band, "
            f"{hash60_sql(f'({concat})', 1000 + b)} as bh from sigs"
        )
    bands_sql = "\n  union all\n  ".join(band_selects)
    est = " + ".join(
        f"(case when sa.mh{j} = sb.mh{j} then 1 else 0 end)"
        for j in range(num_perm)
    )
    return f"""
with src as (select doc_id, text from {table}),
batch as (
  select b.doc_id,
    case when b.doc_id % 11 = 3 and p1.text is not null then p1.text
         when b.doc_id % 23 = 7 and p2.text is not null then p2.text
         else b.text end as text
  from src b
  left join src p1 on p1.doc_id = b.doc_id - 1
  left join src p2 on p2.doc_id = b.doc_id - 2
  where b.doc_id % 2 = 1
),
corpus as (
  select doc_id, text, true as indexed from src where doc_id % 2 = 0
  union all
  select doc_id, text, false as indexed from batch
),
toks as (select doc_id, indexed, {TOKENS} as tokens from corpus),
sh as (select doc_id, indexed, {shingles_sql(shingle_k)} as shingles from toks),
ex as (select doc_id, indexed, unnest(shingles) as shingle from sh),
sigs as (
  select doc_id, any_value(indexed) as indexed,
    {mh_cols}
  from ex group by doc_id
),
bands as (
  {bands_sql}
),
cand as (
  select distinct a.doc_id as id, b.doc_id as mid
  from bands a
  join sigs ia on ia.doc_id = a.doc_id and not ia.indexed
  join bands b on a.band = b.band and a.bh = b.bh
  join sigs ib on ib.doc_id = b.doc_id
  where ib.indexed or b.doc_id < a.doc_id
),
est as (
  select c.id, c.mid, ({est}) / {float(num_perm)} as e
  from cand c
  join sigs sa on sa.doc_id = c.id
  join sigs sb on sb.doc_id = c.mid
),
dups as (
  select id, min(mid) as dup_of, arg_min(e, mid) as est_j
  from est where e >= {threshold} group by id
)
select b.doc_id,
  d.dup_of is not null as is_dup,
  d.dup_of,
  round(d.est_j, 6) as est_jaccard
from batch b left join dups d on d.id = b.doc_id
order by b.doc_id
"""


def _bpe_layer_parts(
    num_merges: int,
    max_words: int,
    max_word_len: int,
    table: str,
) -> list:
    """Shared CTE layers for the BPE oracles: w0 holds EVERY distinct
    word (with count and its sentinel-led char sequence) plus a
    ``trainable`` flag for the capped/length-filtered training set —
    pair counts sum only trainable rows, but every word's sequence is
    rewritten each round, so the same layers serve both the merge-table
    gate (t16) and the full-vocabulary encoding gate (t17). Rewrites
    use the same list_reduce fold as the engine's F.aggregate."""
    S = "chr(31)"
    parts = [f"""w0 as materialized (
  select word, cnt,
    word in (
      select word from (
        select word, count(*) as cnt
        from (select unnest({TOKENS}) as word from {table})
        where length(word) > 0 and length(word) <= {max_word_len}
        group by word
        order by cnt desc, word asc
        limit {max_words}
      )
    ) as trainable,
    {S} || array_to_string(
      list_transform(range(1, length(word) + 1),
                     i -> substring(word, i, 1)), {S}) as seq
  from (
    select word, count(*) as cnt
    from (select unnest({TOKENS}) as word from {table})
    where length(word) > 0
    group by word
  )
)"""]
    for i in range(num_merges):
        parts.append(f"""e{i} as (
  select cnt, syms, unnest(generate_series(2, len(syms) - 1)) as j
  from (select cnt, string_split(seq, {S}) as syms
        from w{i} where trainable)
  where len(syms) >= 3
)""")
        parts.append(
            f"p{i} as (select syms[j] as l, syms[j+1] as r, "
            f"sum(cnt) as c from e{i} group by 1, 2)"
        )
        parts.append(f"""b{i} as materialized (
  select l, r, c from p{i} order by c desc, l asc, r asc limit 1
)""")
        parts.append(f"""w{i + 1} as materialized (
  select word, cnt, trainable,
    list_reduce(string_split(seq, {S}),
      (acc, x) -> case when ends_with(acc, {S} || b.l) and x = b.r
                       then acc || x
                       else acc || {S} || x end) as seq
  from w{i}, b{i} b
)""")
    return parts


def bpe_merges_sql(
    num_merges: int = 12,
    max_words: int = 100_000,
    max_word_len: int = 32,
    table: str = "documents",
) -> str:
    """Layer-by-layer recompute of operators.text.bpe_train's merge
    table: same word-frequency cap (count desc, word asc), same
    sentinel-LED string representation, same TRUE left-greedy fold
    (DuckDB ``list_reduce`` over ``string_split`` — the leading ''
    split cell seeds the accumulator, gluing a matched pair by
    appending without a separator), same (count desc, left asc, right
    asc) argmax tie-break. Every layer is MATERIALIZED so the chain
    stays linear in ``num_merges`` despite the per-layer cross join of
    the one-row argmax."""
    parts = _bpe_layer_parts(num_merges, max_words, max_word_len, table)
    unions = "\n  union all\n  ".join(
        f"select {i} as rank, l as \"left\", r as \"right\", "
        f"cast(c as bigint) as pair_count from b{i}"
        for i in range(num_merges)
    )
    return (
        "with " + ",\n".join(parts)
        + f"\nselect * from (\n  {unions}\n) order by rank\n"
    )


def bpe_encode_sql(
    num_merges: int = 12,
    max_words: int = 100_000,
    max_word_len: int = 32,
    table: str = "documents",
) -> str:
    """Oracle for apply_bpe over the trained merges (t17): the final
    rewritten word table w{M} holds every distinct word's fully-merged
    sequence (training counted only the capped/filtered set; REWRITES
    ran over the whole vocabulary, mirroring apply_bpe encoding words
    the trainer never saw), so per-doc subword budgets are one
    explode-join-aggregate."""
    S = "chr(31)"
    parts = _bpe_layer_parts(num_merges, max_words, max_word_len, table)
    parts.append(f"""wenc as (
  select word, len(string_split(seq, {S})) - 1 as n_sub
  from w{num_merges}
)""")
    parts.append(f"""docwords as (
  select doc_id, unnest({TOKENS}) as word from {table}
)""")
    return (
        "with " + ",\n".join(parts)
        + f"""
select d.doc_id,
  cast(count(*) as integer) as n_words,
  cast(sum(coalesce(w.n_sub, 0)) as bigint) as n_subwords,
  round(sum(coalesce(w.n_sub, 0)) * 1.0 / count(*), 6)
    as subwords_per_word
from docwords d
left join wenc w on w.word = d.word
group by d.doc_id
order by d.doc_id
"""
    )


def bmp_phash_sql(
    bits: int = 60, w: int = 8, h: int = 8, table: str = "documents"
) -> str:
    """Oracle for m07 (REAL pixel decode): the entry synthesizes a
    w×h 24-bit BMP per doc whose gray value at image index i is md5
    byte i%16 (stored bottom-up, BGR, as the format demands), decodes
    it with the pure-Python BMP decoder, pools w·h→bits integer bucket
    means, and aHashes. This closed form recomputes the IMAGE-side
    pixels straight from the md5 hex — so any error in the Spark side's
    row-order / byte-order / padding handling, the decoder, or the
    pooling breaks the hash match."""
    n = w * h
    return f"""
with base as (
  select doc_id as media_id,
    list_transform(range(0, {n}),
      i -> ({_HEX.format(pos='2*(i % 16)+1')}) * 16
           + ({_HEX.format(pos='2*(i % 16)+2')})) as ps
  from {table}
),
pooled as (
  select media_id,
    list_transform(range(0, {bits}), j ->
      list_sum(ps[(j*{n})//{bits} + 1 : ((j+1)*{n})//{bits}])
      // (((j+1)*{n})//{bits} - (j*{n})//{bits})) as pp
  from base
)
select media_id,
  cast(list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(pp, p -> cast(case when p * {bits} > list_sum(pp)
                                        then 1 else 0 end as bigint))),
    (acc, b) -> acc * 2 + b) as bigint) as phash
from pooled
order by media_id
"""


def bpe_encode_fixed_sql(
    alphabet: str = "abcdefghijklmnopqrstuvwxyz0123456789",
    table: str = "documents",
) -> str:
    """Oracle for apply_bpe at a PRODUCTION-SCALE merge count (t19):
    the fixed vocabulary is every ordered single-char pair of
    ``alphabet`` in lexicographic rank order (len² merges — 1296 for
    the default 36-char alphabet), constructed identically on both
    engines, so the gate exercises the greedy mapInPandas encoder far
    beyond the fold path's expression-tree ceiling without needing a
    thousand training layers in SQL. Encoding is ONE nested fold per
    distinct word: the outer ``list_reduce`` walks the merge list
    (each merge packed as ``l || chr(30) || r``; the word's sentinel
    sequence is prepended as the fold seed), the inner one is the same
    left-greedy symbol fold every BPE oracle here uses. A ``contains``
    guard skips merges whose (l, r) adjacency cannot occur in the
    current sequence — sound because the sentinel only ever marks
    symbol boundaries, so pattern absence proves the fold is identity
    — which keeps the oracle linear in (distinct words × merges)
    string scans instead of folds."""
    S = "chr(31)"
    M = "chr(30)"
    a = f"'{alphabet}'"
    return f"""
with alpha as (
  select unnest(list_transform(
    range(1, length({a}) + 1), i -> substring({a}, i, 1))) as ch
),
mlist as (
  select list(a.ch || {M} || b.ch order by a.ch asc, b.ch asc) as ms
  from alpha a, alpha b
),
w0 as materialized (
  select word,
    {S} || array_to_string(
      list_transform(range(1, length(word) + 1),
                     i -> substring(word, i, 1)), {S}) as seq
  from (select distinct unnest({TOKENS}) as word from {table})
  where length(word) > 0
),
wenc as materialized (
  select word,
    len(string_split(
      list_reduce(
        list_prepend(seq, ms),
        (acc, m) -> case
          when not contains(acc,
                 {S} || split_part(m, {M}, 1)
                     || {S} || split_part(m, {M}, 2))
          then acc
          else list_reduce(string_split(acc, {S}),
            (a2, x) -> case
              when ends_with(a2, {S} || split_part(m, {M}, 1))
                   and x = split_part(m, {M}, 2)
              then a2 || x
              else a2 || {S} || x end)
        end),
      {S})) - 1 as n_sub
  from w0, mlist
),
docwords as (
  select doc_id, unnest({TOKENS}) as word from {table}
)
select d.doc_id,
  cast(count(*) as integer) as n_words,
  cast(sum(coalesce(w.n_sub, 0)) as bigint) as n_subwords,
  round(sum(coalesce(w.n_sub, 0)) * 1.0 / count(*), 6)
    as subwords_per_word
from docwords d
left join wenc w on w.word = d.word
group by d.doc_id
order by d.doc_id
"""


def bpe_tokenize_fixed_sql(
    alphabet: str = "abcdefghijklmnopqrstuvwxyz0123456789",
    mod: int = 10,
    rem: int = 3,
    table: str = "documents",
) -> str:
    """Oracle for bpe_tokenize (t20): per-doc SUBWORD SEQUENCES under
    the t19 fixed merge table — the actual tokenization output, one row
    per subword with its 1-based document position. Same nested-fold
    encode as :func:`bpe_encode_fixed_sql` but keeping the folded
    sequence; token and symbol order reconstruct via generate_series
    subscripts and a row_number over (word position, symbol position).
    Restricted to ``doc_id % mod = rem`` so the gate stays row-bounded
    (it is per-subword output)."""
    S = "chr(31)"
    M = "chr(30)"
    a = f"'{alphabet}'"
    return f"""
with alpha as (
  select unnest(list_transform(
    range(1, length({a}) + 1), i -> substring({a}, i, 1))) as ch
),
mlist as (
  select list(a.ch || {M} || b.ch order by a.ch asc, b.ch asc) as ms
  from alpha a, alpha b
),
src as (
  select doc_id, {TOKENS} as tks from {table} where doc_id % {mod} = {rem}
),
w0 as materialized (
  select word,
    {S} || array_to_string(
      list_transform(range(1, length(word) + 1),
                     i -> substring(word, i, 1)), {S}) as seq
  from (select distinct unnest(tks) as word from src)
  where length(word) > 0
),
wseq as materialized (
  select word,
    list_filter(string_split(
      list_reduce(
        list_prepend(seq, ms),
        (acc, m) -> case
          when not contains(acc,
                 {S} || split_part(m, {M}, 1)
                     || {S} || split_part(m, {M}, 2))
          then acc
          else list_reduce(string_split(acc, {S}),
            (a2, x) -> case
              when ends_with(a2, {S} || split_part(m, {M}, 1))
                   and x = split_part(m, {M}, 2)
              then a2 || x
              else a2 || {S} || x end)
        end),
      {S}), x -> length(x) > 0) as syms
  from w0, mlist
),
doctoks as (
  select doc_id, tks, unnest(generate_series(1, len(tks))) as ord from src
),
dw as (select doc_id, ord, tks[ord] as word from doctoks),
persub as (
  select doc_id, word_ord, syms,
    unnest(generate_series(1, len(syms))) as sord
  from (
    select d.doc_id, d.ord as word_ord, w.syms
    from dw d join wseq w on w.word = d.word
  )
)
select doc_id,
  cast(row_number() over (partition by doc_id order by word_ord, sord)
       as int) as pos,
  syms[sord] as subword
from persub
order by doc_id, pos
"""


def png_phash_sql(
    bits: int = 60, w: int = 8, h: int = 8, table: str = "documents"
) -> str:
    """Oracle for m08 (REAL PNG decode, VERDICT r8 #4): the entry
    synthesizes a w×h 8-bit RGB PNG per doc — real zlib stream (stored
    deflate block + adler32), real per-row filters cycling
    None/Sub/Up — whose RGB bytes at pixel index i are md5 bytes
    (3i, 3i+1, 3i+2) mod 16. The Spark side walks chunks, inflates,
    unfilters, takes the BT.601 integer luma, pools w·h→bits bucket
    means and aHashes; this closed form recomputes the LUMA straight
    from the md5 hex, so any error in the chunk walk, the zlib
    plumbing, the unfilter recurrences, the channel order, or the
    pooling breaks the hash match."""
    n = w * h

    def V(expr: str) -> str:
        hi = _HEX.format(pos=f"2*(({expr}) % 16)+1")
        lo = _HEX.format(pos=f"2*(({expr}) % 16)+2")
        return f"(({hi}) * 16 + ({lo}))"

    luma = (
        f"(299 * {V('3*i')} + 587 * {V('3*i+1')} + 114 * {V('3*i+2')})"
        " // 1000"
    )
    return f"""
with base as (
  select doc_id as media_id,
    list_transform(range(0, {n}), i -> {luma}) as ps
  from {table}
),
pooled as (
  select media_id,
    list_transform(range(0, {bits}), j ->
      list_sum(ps[(j*{n})//{bits} + 1 : ((j+1)*{n})//{bits}])
      // (((j+1)*{n})//{bits} - (j*{n})//{bits})) as pp
  from base
)
select media_id,
  cast(list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(pp, p -> cast(case when p * {bits} > list_sum(pp)
                                        then 1 else 0 end as bigint))),
    (acc, b) -> acc * 2 + b) as bigint) as phash
from pooled
order by media_id
"""


def jpeg_phash_sql(bits: int = 60, table: str = "documents") -> str:
    """Oracle for m18 (REAL baseline JPEG pixel decode, VERDICT r10
    #7): the entry encodes per-doc JPEGs of CONSTANT 8×8 blocks with DC
    quant 8 — the one shape where the lossy pipeline is exact
    (F(0,0) = 8·(c−128) quantizes losslessly, so Huffman → dequant →
    IDCT → level shift must return exactly c). Even docs: 24×16
    grayscale, six blocks of md5 bytes 0..5, restart interval 3. Odd
    docs: 16×16 color 4:2:0 — four Y blocks of md5 bytes 0..3, Cb=128,
    Cr=178, whose JFIF inverse transform shifts every pixel by an
    integer-exact amount: R = min(255, Y+70), G = max(0, Y−36), B = Y
    (1.402·50 = 70.1 and 0.714136·50 = 35.7068 round to fixed offsets
    for EVERY Y — no float tie anywhere), then BT.601 luma. Any error
    in DC prediction, restart handling, zigzag, dequantization, MCU
    interleave, chroma upsampling, or the color transform breaks the
    hash."""
    def V(expr: str) -> str:
        hi = _HEX.format(pos=f"2*(({expr}) % 16)+1")
        lo = _HEX.format(pos=f"2*(({expr}) % 16)+2")
        return f"(({hi}) * 16 + ({lo}))"

    gray = V("3*(i//192) + (i%24)//8")
    ycol = V("2*(i//128) + (i%16)//8")
    color = (
        f"(299 * least(255, {ycol} + 70)"
        f" + 587 * greatest(0, {ycol} - 36)"
        f" + 114 * {ycol}) // 1000"
    )

    def arm(pred: str, n: int, luma: str) -> str:
        return f"""
  select doc_id as media_id,
    list_transform(range(0, {n}), i -> {luma}) as ps,
    {n} as n
  from {table} where {pred}"""

    return f"""
with base as ({arm('doc_id % 2 = 0', 384, gray)}
  union all{arm('doc_id % 2 <> 0', 256, color)}
),
pooled as (
  select media_id,
    list_transform(range(0, {bits}), j ->
      list_sum(ps[(j*n)//{bits} + 1 : ((j+1)*n)//{bits}])
      // (((j+1)*n)//{bits} - (j*n)//{bits})) as pp
  from base
)
select media_id,
  cast(list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(pp, p -> cast(case when p * {bits} > list_sum(pp)
                                        then 1 else 0 end as bigint))),
    (acc, b) -> acc * 2 + b) as bigint) as phash
from pooled
order by media_id
"""


def tiff_phash_sql(
    bits: int = 60, w: int = 8, h: int = 8, table: str = "documents"
) -> str:
    """Oracle for m14 (REAL TIFF decode): the entry synthesizes a w×h
    8-bit RGB baseline TIFF per doc — byte order ALTERNATING II/MM by
    doc parity, four 2-row strips stored PHYSICALLY PERMUTED with junk
    padding between them (so the StripOffsets table, not contiguity,
    is the only correct read path) — whose RGB byte at raster index j
    is md5 byte ((j + row) % 16), i.e. channel c of pixel i is md5
    byte ((3i + c + i//w) % 16); the per-row skew makes every strip's
    bytes DISTINCT, so a permutation or offset error changes pixels.
    This closed form recomputes the BT.601 luma straight from the md5
    hex — byte-order, IFD-walk, inline-vs-offset, strip-gather, and
    pooling errors all break the hash match."""
    n = w * h

    def V(expr: str) -> str:
        hi = _HEX.format(pos=f"2*(({expr}) % 16)+1")
        lo = _HEX.format(pos=f"2*(({expr}) % 16)+2")
        return f"(({hi}) * 16 + ({lo}))"

    luma = (
        f"(299 * {V(f'3*i + i//{w}')} + 587 * {V(f'3*i+1 + i//{w}')}"
        f" + 114 * {V(f'3*i+2 + i//{w}')}) // 1000"
    )
    return f"""
with base as (
  select doc_id as media_id,
    list_transform(range(0, {n}), i -> {luma}) as ps
  from {table}
),
pooled as (
  select media_id,
    list_transform(range(0, {bits}), j ->
      list_sum(ps[(j*{n})//{bits} + 1 : ((j+1)*{n})//{bits}])
      // (((j+1)*{n})//{bits} - (j*{n})//{bits})) as pp
  from base
)
select media_id,
  cast(list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(pp, p -> cast(case when p * {bits} > list_sum(pp)
                                        then 1 else 0 end as bigint))),
    (acc, b) -> acc * 2 + b) as bigint) as phash
from pooled
order by media_id
"""


def gray_md5_phash_sql(
    bits: int = 60, w: int = 8, h: int = 8, table: str = "documents"
) -> str:
    """Oracle for m16 (REAL Adam7-interlaced PNG decode): the entry
    synthesizes a w×h 8-bit GRAYSCALE interlaced PNG whose pixel at
    raster index i is md5 byte i%16, scanlines split across the seven
    Adam7 passes with Up filters inside multi-row passes — so the
    deinterlace placement AND the per-pass unfilter recurrence are both
    load-bearing. Grayscale luma IS the sample byte, so this closed
    form is the pooled aHash over md5 bytes directly; a pass-boundary,
    placement, or filter error scrambles pixels and breaks the hash."""
    n = w * h

    def V(expr: str) -> str:
        hi = _HEX.format(pos=f"2*(({expr}) % 16)+1")
        lo = _HEX.format(pos=f"2*(({expr}) % 16)+2")
        return f"(({hi}) * 16 + ({lo}))"

    return f"""
with base as (
  select doc_id as media_id,
    list_transform(range(0, {n}), i -> {V('i')}) as ps
  from {table}
),
pooled as (
  select media_id,
    list_transform(range(0, {bits}), j ->
      list_sum(ps[(j*{n})//{bits} + 1 : ((j+1)*{n})//{bits}])
      // (((j+1)*{n})//{bits} - (j*{n})//{bits})) as pp
  from base
)
select media_id,
  cast(list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(pp, p -> cast(case when p * {bits} > list_sum(pp)
                                        then 1 else 0 end as bigint))),
    (acc, b) -> acc * 2 + b) as bigint) as phash
from pooled
order by media_id
"""


def png16_phash_sql(bits: int = 60, table: str = "documents") -> str:
    """Oracle for m17 (REAL 16-bit PNG decode with per-doc bit-depth
    variation): the entry synthesizes 8×8 GRAYSCALE PNGs — 8-bit for
    doc_id % 3 == 0, 16-BIT otherwise — whose raster byte j is md5
    byte ((j + j//R) % 16) with R the row's byte width (8 or 16). For
    the 8-bit arm pixel i's gray IS raster byte i (= md5 byte
    ((i + i//8) % 16)); for the 16-bit arm pixel i's big-endian pair
    sits at raster bytes 2i and 2i+1 (both rows of 16 bytes, so the
    skew term is i//8 for both) and depth-scales
    ``(256*hi + lo) * 255 // 65535``. A wrong filter distance (Sub at
    1 byte instead of 2), a little-endian sample read, or a float
    rescale breaks the hash; the pooling is the shared 64→bits aHash."""
    n = 64

    def V(expr: str) -> str:
        hi = _HEX.format(pos=f"2*(({expr}) % 16)+1")
        lo = _HEX.format(pos=f"2*(({expr}) % 16)+2")
        return f"(({hi}) * 16 + ({lo}))"

    gray8 = V("i + i//8")
    gray16 = (
        f"(({V('2*i + i//8')}) * 256 + ({V('2*i + 1 + i//8')}))"
        " * 255 // 65535"
    )
    return f"""
with base as (
  select doc_id as media_id,
    list_transform(range(0, {n}), i ->
      case when doc_id % 3 = 0 then {gray8} else {gray16} end) as ps
  from {table}
),
pooled as (
  select media_id,
    list_transform(range(0, {bits}), j ->
      list_sum(ps[(j*{n})//{bits} + 1 : ((j+1)*{n})//{bits}])
      // (((j+1)*{n})//{bits} - (j*{n})//{bits})) as pp
  from base
)
select media_id,
  cast(list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(pp, p -> cast(case when p * {bits} > list_sum(pp)
                                        then 1 else 0 end as bigint))),
    (acc, b) -> acc * 2 + b) as bigint) as phash
from pooled
order by media_id
"""


def gif_phash_sql(
    bits: int = 60, w: int = 8, h: int = 8, table: str = "documents"
) -> str:
    """Oracle for m09 (REAL GIF decode): the entry synthesizes a w×h
    GIF89a whose palette index at pixel i is md5 byte i%16 and whose
    256-entry palette maps index v to ((3v+7)%256, (5v+11)%256,
    (7v+13)%256) — so this closed form recomputes the post-palette
    BT.601 luma straight from the md5 hex. Any error in the LZW bit
    unpacking, the clear/end handling, the palette offsets, or the
    pooling breaks the hash match."""
    n = w * h

    def V(expr: str) -> str:
        hi = _HEX.format(pos=f"2*(({expr}) % 16)+1")
        lo = _HEX.format(pos=f"2*(({expr}) % 16)+2")
        return f"(({hi}) * 16 + ({lo}))"

    luma = (
        f"(299 * ((3 * {V('i')} + 7) % 256)"
        f" + 587 * ((5 * {V('i')} + 11) % 256)"
        f" + 114 * ((7 * {V('i')} + 13) % 256)) // 1000"
    )
    return f"""
with base as (
  select doc_id as media_id,
    list_transform(range(0, {n}), i -> {luma}) as ps
  from {table}
),
pooled as (
  select media_id,
    list_transform(range(0, {bits}), j ->
      list_sum(ps[(j*{n})//{bits} + 1 : ((j+1)*{n})//{bits}])
      // (((j+1)*{n})//{bits} - (j*{n})//{bits})) as pp
  from base
)
select media_id,
  cast(list_reduce(
    list_prepend(cast(0 as bigint),
      list_transform(pp, p -> cast(case when p * {bits} > list_sum(pp)
                                        then 1 else 0 end as bigint))),
    (acc, b) -> acc * 2 + b) as bigint) as phash
from pooled
order by media_id
"""


def bpe_encode_fixed3_sql(
    alphabet: str = "abcdefghijklmnopqrstuvwxyz0123456789",
    table: str = "documents",
) -> str:
    """Oracle for apply_bpe at REAL production vocab size (t23,
    VERDICT r8 #2): the fixed table is
    :func:`icedb_spark.operators.text.bpe_alphabet_merges3` — layer 1
    every single-char pair of ``alphabet`` (1296 merges, the t19
    table), layer 2 every ``(two-char product, char)`` pair (46 656
    more) — 47 952 merges total, replayed in rank order.

    The SQL replays layer 1 in full (the t19 nested fold), then
    exploits the table's structure to stay tractable: under rank-order
    replay a layer-2 rule can only fire where its ``(2-char, 1-char)``
    adjacency ALREADY exists in the post-layer-1 symbol sequence —
    layer-2 merges produce 3-char symbols that no rule consumes, so
    merging removes adjacencies and never creates a new qualifying
    pair (no new 2-char symbol can appear). Hence folding each word's
    OWN ≤ len(word) initially-adjacent layer-2 pairs, lexicographically
    (= rank) ordered and deduplicated, is bit-equal to folding all
    46 656 — while the Spark side's pair-indexed encoder really does
    carry the full table. Rules whose adjacency was consumed by an
    earlier rule no-op in both replays."""
    S = "chr(31)"
    M = "chr(30)"
    a = f"'{alphabet}'"

    def fold(rules: str, seed: str) -> str:
        return f"""list_reduce(
        list_prepend({seed}, {rules}),
        (acc, m) -> case
          when not contains(acc,
                 {S} || split_part(m, {M}, 1)
                     || {S} || split_part(m, {M}, 2))
          then acc
          else list_reduce(string_split(acc, {S}),
            (a2, x) -> case
              when ends_with(a2, {S} || split_part(m, {M}, 1))
                   and x = split_part(m, {M}, 2)
              then a2 || x
              else a2 || {S} || x end)
        end)"""

    pairs2 = f"""list_sort(list_distinct(list_filter(
          list_transform(range(1, len(syms)),
                         i -> syms[i] || {M} || syms[i + 1]),
          p -> length(split_part(p, {M}, 1)) = 2
               and length(split_part(p, {M}, 2)) = 1
               and contains({a}, split_part(p, {M}, 2)))))"""
    return f"""
with alpha as (
  select unnest(list_transform(
    range(1, length({a}) + 1), i -> substring({a}, i, 1))) as ch
),
mlist as (
  select list(a.ch || {M} || b.ch order by a.ch asc, b.ch asc) as ms
  from alpha a, alpha b
),
w0 as materialized (
  select word,
    {S} || array_to_string(
      list_transform(range(1, length(word) + 1),
                     i -> substring(word, i, 1)), {S}) as seq
  from (select distinct unnest({TOKENS}) as word from {table})
  where length(word) > 0
),
w1 as materialized (
  select word, {fold("ms", "seq")} as seq
  from w0, mlist
),
w1s as (
  select word, seq,
    list_filter(string_split(seq, {S}), x -> length(x) > 0) as syms
  from w1
),
wenc as materialized (
  select word,
    len(string_split({fold(pairs2, "seq")}, {S})) - 1 as n_sub
  from w1s
),
docwords as (
  select doc_id, unnest({TOKENS}) as word from {table}
)
select d.doc_id,
  cast(count(*) as integer) as n_words,
  cast(sum(coalesce(w.n_sub, 0)) as bigint) as n_subwords,
  round(sum(coalesce(w.n_sub, 0)) * 1.0 / count(*), 6)
    as subwords_per_word
from docwords d
left join wenc w on w.word = d.word
group by d.doc_id
order by d.doc_id
"""


def bpe_token_ids_fixed_sql(
    alphabet: str = "abcdefghijklmnopqrstuvwxyz0123456789",
    mod: int = 10,
    rem: int = 3,
    table: str = "documents",
) -> str:
    """Oracle for subword_ids over bpe_tokenize (t21): the dense id
    vocabulary a merge table induces — alphabet chars first (ids 0..),
    then merge products in rank order, first occurrence wins on
    collisions (min(ord) + a dense row_number renumber reproduces
    Python dict-insertion semantics exactly) — left-joined onto the
    t20 token stream, OOV → -1."""
    S = "chr(31)"  # noqa: F841 — symmetry with the sibling builders
    a = f"'{alphabet}'"
    inner = bpe_tokenize_fixed_sql(alphabet, mod, rem, table)
    return f"""
with toks as ({inner}),
valpha as (
  select substring({a}, i, 1) as subword, i as ord
  from (select unnest(range(1, length({a}) + 1)) as i)
),
vprod as (
  select a.subword || b.subword as subword,
         1000000 + row_number()
           over (order by a.subword asc, b.subword asc) as ord
  from valpha a, valpha b
),
vocab as (
  select subword,
    cast(row_number() over (order by ord) - 1 as int) as token_id
  from (
    select subword, min(ord) as ord
    from (select subword, ord from valpha
          union all select subword, ord from vprod)
    group by subword
  )
)
select t.doc_id, t.pos, coalesce(v.token_id, -1) as token_id
from toks t
left join vocab v using (subword)
order by doc_id, pos
"""


def packed_token_stream_sql(
    alphabet: str = "abcdefghijklmnopqrstuvwxyz0123456789",
    token_budget: int = 256,
    n_shards: int = 4,
    mod: int = 10,
    rem: int = 3,
    table: str = "documents",
) -> str:
    """Oracle for t22 — the literal trainer input: every token id with
    its (shard, sequence, position-in-sequence) placement under
    concat-then-chunk packing. Composes the t21 id stream with the t18
    packing window (per-doc n_tokens = the id stream's own per-doc
    count; zero-token docs shift no cumulative sums, so their absence
    from the window is placement-neutral) and the global-offset
    arithmetic ``g = seq_idx·budget + seq_offset + pos − 1``."""
    from .operators.packing import PACK_SEED

    ids_sql = bpe_token_ids_fixed_sql(alphabet, mod, rem, table)
    shard = hash60_sql("doc_id", PACK_SEED)
    order = hash60_sql("doc_id", PACK_SEED + 1)
    g = f"(p.seq_idx * {token_budget} + p.seq_offset + i.pos - 1)"
    return f"""
with ids as ({ids_sql}),
docsub as (
  select doc_id, cast(count(*) as bigint) as n_tokens
  from ids group by doc_id
),
base as (
  select doc_id, n_tokens,
    cast({shard} % {n_shards} as integer) as shard,
    {order} as h
  from docsub
),
placed as (
  select doc_id, shard,
    cast(floor((sum(n_tokens) over w - n_tokens) / {token_budget})
         as bigint) as seq_idx,
    cast((sum(n_tokens) over w - n_tokens) % {token_budget}
         as bigint) as seq_offset
  from base
  window w as (partition by shard order by h, doc_id
               rows between unbounded preceding and current row)
)
select i.doc_id, i.pos, p.shard,
  cast(floor({g} / {token_budget}) as bigint) as seq,
  cast({g} % {token_budget} as bigint) as seq_pos,
  i.token_id
from ids i join placed p using (doc_id)
order by doc_id, pos
"""


def stream_near_dedup_sql(
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    table: str = "documents",
) -> str:
    """Oracle for the st10 streaming near-dedup gate: the final corpus
    table equals a BATCH-ORDERED full recompute — doc d survives iff no
    mate with smaller (batch, id) order shares a band bucket at
    signature-estimated Jaccard >= threshold. Batch 1 = even ids
    (plain), batch 2 = odd ids with the d13 plants; the index
    accumulates every seen signature, so the rule needs no notion of
    'kept' mates."""
    from .operators.dedup import MINHASH_PRIME, minhash_perm_constants

    rows = num_perm // bands
    base = f"({hash60_sql('shingle', 0)} % {MINHASH_PRIME})"
    mh_cols = ",\n    ".join(
        f"min(({a} * {base} + {b}) % {MINHASH_PRIME}) as mh{j}"
        for j, (a, b) in enumerate(minhash_perm_constants(num_perm))
    )
    band_selects = []
    for b in range(bands):
        concat = " || ',' || ".join(
            f"mh{b * rows + r}::varchar" for r in range(rows)
        )
        band_selects.append(
            f"select doc_id, {b} as band, "
            f"{hash60_sql(f'({concat})', 1000 + b)} as bh from sigs"
        )
    bands_sql = "\n  union all\n  ".join(band_selects)
    est = " + ".join(
        f"(case when sa.mh{j} = sb.mh{j} then 1 else 0 end)"
        for j in range(num_perm)
    )
    return f"""
with src as (select doc_id, text from {table}),
batch2 as (
  select b.doc_id,
    case when b.doc_id % 11 = 3 and p1.text is not null then p1.text
         when b.doc_id % 23 = 7 and p2.text is not null then p2.text
         else b.text end as text
  from src b
  left join src p1 on p1.doc_id = b.doc_id - 1
  left join src p2 on p2.doc_id = b.doc_id - 2
  where b.doc_id % 2 = 1
),
corpus as (
  select doc_id, text, 0 as bno from src where doc_id % 2 = 0
  union all
  select doc_id, text, 1 as bno from batch2
),
toks as (select doc_id, bno, {TOKENS} as tokens from corpus),
sh as (select doc_id, bno, {shingles_sql(shingle_k)} as shingles from toks),
ex as (select doc_id, bno, unnest(shingles) as shingle from sh),
sigs as (
  select doc_id, any_value(bno) as bno,
    {mh_cols}
  from ex group by doc_id
),
bands as (
  {bands_sql}
),
cand as (
  select distinct a.doc_id as id, b.doc_id as mid
  from bands a
  join sigs sa on sa.doc_id = a.doc_id
  join bands b on a.band = b.band and a.bh = b.bh
  join sigs sb on sb.doc_id = b.doc_id
  where (sb.bno < sa.bno)
     or (sb.bno = sa.bno and b.doc_id < a.doc_id)
),
dup as (
  select distinct c.id
  from cand c
  join sigs sa on sa.doc_id = c.id
  join sigs sb on sb.doc_id = c.mid
  where ({est}) / {float(num_perm)} >= {threshold}
)
select doc_id from corpus
where doc_id not in (select id from dup)
order by doc_id
"""


def bpe_packing_sql(
    num_merges: int = 12,
    token_budget: int = 256,
    n_shards: int = 4,
    max_words: int = 100_000,
    max_word_len: int = 32,
    table: str = "documents",
) -> str:
    """Oracle for the t18 composition gate: sequence packing whose token
    budget is the REAL trained-BPE subword count (t08 packs whitespace
    tokens; this is the production budget) — the bpe_encode layers feed
    per-doc n_subwords into the t08 packing window."""
    from .operators.packing import PACK_SEED

    S = "chr(31)"
    parts = _bpe_layer_parts(num_merges, max_words, max_word_len, table)
    parts.append(f"""wenc as (
  select word, len(string_split(seq, {S})) - 1 as n_sub
  from w{num_merges}
)""")
    parts.append(f"""docsub as (
  select d.doc_id, cast(sum(coalesce(w.n_sub, 0)) as bigint) as n_tokens
  from (select doc_id, unnest({TOKENS}) as word from {table}) d
  left join wenc w on w.word = d.word
  group by d.doc_id
)""")
    shard = hash60_sql("doc_id", PACK_SEED)
    order = hash60_sql("doc_id", PACK_SEED + 1)
    parts.append(f"""base as (
  select doc_id, n_tokens,
    cast({shard} % {n_shards} as integer) as shard,
    {order} as h
  from docsub
)""")
    return (
        "with " + ",\n".join(parts)
        + f"""
select doc_id, n_tokens, shard,
  cast(floor((sum(n_tokens) over w - n_tokens) / {token_budget}) as bigint)
    as seq_idx,
  cast((sum(n_tokens) over w - n_tokens) % {token_budget} as bigint)
    as seq_offset
from base
window w as (partition by shard order by h, doc_id
             rows between unbounded preceding and current row)
"""
    )


def substring_index_dedup_sql(k: int = 8, table: str = "documents") -> str:
    """Oracle for d14 (incremental exact-substring dedup): from-scratch
    recompute over the planted corpus — an ODD-doc (batch) position is
    marked iff its digest occurs among EVEN docs (the index side), or
    it is a fresh digest repeating within the odds with a smaller
    (id, pos) keeper. Equality with the Spark index-join result is the
    incremental ≡ full claim for the span family."""
    from .operators.dedup import SPAN_SEED

    dig = hash60_sql(f"array_to_string(tks[pos:pos+{k - 1}], ' ')", SPAN_SEED)
    return f"""
with corpus as ({substring_corpus_sql(table)}),
base as (
  select doc_id as id, doc_id % 2 as odd, {TOKENS} as tks from corpus
),
pos as (
  select id, odd, pos, {dig} as dig
  from (
    select id, odd, tks,
      unnest(generate_series(1, len(tks) - {k - 1})) as pos
    from base where len(tks) >= {k}
  )
),
idx as (select distinct dig from pos where odd = 0),
bpos as (select id, pos, dig from pos where odd = 1),
hit_index as (
  select id, pos from bpos where dig in (select dig from idx)
),
fresh as (
  select id, pos, dig from bpos where dig not in (select dig from idx)
),
keepers as (
  select dig, min(row(id, pos)) as first, count(*) as c
  from fresh group by dig having count(*) >= 2
),
hit_batch as (
  select f.id, f.pos
  from fresh f join keepers x on f.dig = x.dig
  where row(f.id, f.pos) <> x.first
),
matched as (
  select distinct id, pos from (
    select * from hit_index union all select * from hit_batch
  )
),
islands as (
  select id, pos,
    case when lag(pos) over w is null or pos - lag(pos) over w > {k}
         then 1 else 0 end as ni
  from matched
  window w as (partition by id order by pos)
),
numbered as (
  select id, pos,
    sum(ni) over (partition by id order by pos
                  rows between unbounded preceding and current row)
      as island
  from islands
),
spans as (
  select id, min(pos) as s, max(pos) + {k - 1} as e
  from numbered group by id, island
)
select id as doc_id,
  cast(count(*) as integer) as n_spans,
  cast(sum(e - s + 1) as bigint) as dup_tokens,
  cast(min(s) as integer) as first_start,
  cast(max(e) as integer) as last_end
from spans
group by id
order by doc_id
"""


def embedding_dedup_index_sql(
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    table: str = "embeddings",
) -> str:
    """Full-corpus recompute of the incremental embedding near-dup
    (operators.dedup.embedding_dedup_against_index): odd-id batch
    (with planted exact vector copies) deduped against the even-id
    indexed corpus plus smaller-id batch mates — same md5 hyperplane
    buckets, same 6-dp rounded cosine, same order-free mate rule."""
    from .operators.similarity import _hyperplane

    def plane_dot(p: int) -> str:
        lit = "[" + ", ".join(
            "1.0" if x > 0 else "-1.0" for x in _hyperplane(dim, p)
        ) + "]"
        return (
            f"list_reduce(list_prepend(cast(0.0 as double), "
            f"list_transform(range(1, {dim + 1}), "
            f"i -> dv[i] * ({lit}::double[])[i])), "
            f"(acc, x) -> acc + x)"
        )

    bucket = " + ".join(
        f"(case when {plane_dot(p)} >= 0 then {1 << p} else 0 end)"
        for p in range(n_planes)
    )
    return f"""
with src as (
  select vec_id, cast(embedding as double[]) as dv from {table}
),
batch as (
  select b.vec_id,
    case when b.vec_id % 11 = 3 and p1.dv is not null then p1.dv
         when b.vec_id % 23 = 7 and p2.dv is not null then p2.dv
         else b.dv end as dv
  from src b
  left join src p1 on p1.vec_id = b.vec_id - 1
  left join src p2 on p2.vec_id = b.vec_id - 2
  where b.vec_id % 2 = 1
),
corpus as (
  select vec_id, dv, true as indexed from src where vec_id % 2 = 0
  union all
  select vec_id, dv, false as indexed from batch
),
bk as (
  select vec_id, dv, indexed, {bucket} as bucket from corpus
),
cand as (
  select a.vec_id as id, b.vec_id as mid,
    round(list_cosine_similarity(a.dv, b.dv), 6) as cos
  from bk a
  join bk b on a.bucket = b.bucket
  where not a.indexed and (b.indexed or b.vec_id < a.vec_id)
),
dups as (
  select id, min(mid) as dup_of, arg_min(cos, mid) as cosine
  from cand where cos >= {threshold} group by id
)
select b.vec_id,
  d.dup_of is not null as is_dup,
  d.dup_of,
  d.cosine
from batch b left join dups d on d.id = b.vec_id
order by b.vec_id
"""


def wav_features_sql(table: str = "documents") -> str:
    """Oracle for m10 (REAL WAV PCM decode): the entry synthesizes a
    16-bit mono 8 kHz WAV per doc with n = 8 + doc_id % 9 frames whose
    sample i's little-endian bytes are md5 bytes (i % 16, (i+7) % 16),
    decodes it with the pure-Python PCM decoder, and emits exact
    integer waveform features. This closed form recomputes the SIGNED
    samples straight from the md5 hex — any error in the Spark side's
    chunk-size fields, byte order, sign convention, or the feature
    arithmetic breaks the match."""
    u = (
        f"(({_HEX.format(pos='2*((i+7)%16)+1')}) * 16"
        f" + ({_HEX.format(pos='2*((i+7)%16)+2')})) * 256"
        f" + ({_HEX.format(pos='2*(i%16)+1')}) * 16"
        f" + ({_HEX.format(pos='2*(i%16)+2')})"
    )
    return f"""
with base as (
  select doc_id as media_id,
    list_transform(range(0, 8 + doc_id % 9), i ->
      case when {u} >= 32768 then {u} - 65536 else {u} end) as ss
  from {table}
)
select media_id,
  cast(len(ss) as bigint) as n_samples,
  cast(8000 as bigint) as sample_rate,
  cast(len(ss) * 1000 // 8000 as bigint) as duration_ms,
  cast(coalesce(list_max(list_transform(ss, s -> abs(s))), 0) as bigint)
    as peak,
  cast(coalesce(list_sum(list_transform(ss, s -> s * s)), 0) as bigint)
    as sum_sq,
  cast(coalesce(list_sum(list_transform(range(1, len(ss)), i ->
    case when (ss[i] < 0) != (ss[i+1] < 0) then 1 else 0 end)), 0) as bigint)
    as zero_crossings
from base
order by media_id
"""


def jpeg_exif_sql(table: str = "documents") -> str:
    """Oracle for m11 (REAL EXIF decode): the entry synthesizes a JPEG
    APP1/Exif TIFF per doc — byte order by doc parity, Orientation =
    md5 byte 0 mod 8 + 1, ImageDescription = md5 hex chars 1-3 stored
    inline, Make = md5 hex chars 5-12 stored through the >4-byte OFFSET
    indirection — and parses it with the pure-Python EXIF walker. The
    closed form recomputes all three tag values from the md5 hex; a
    wrong endian branch, IFD layout, offset base, or NUL handling on
    the Spark side breaks the match."""
    b0 = f"({_HEX.format(pos='1')}) * 16 + ({_HEX.format(pos='2')})"
    return f"""
select doc_id as media_id,
  case when doc_id % 2 = 0 then 'II' else 'MM' end as byte_order,
  cast(({b0}) % 8 + 1 as bigint) as orientation,
  substring(md5(text), 1, 3) as description,
  substring(md5(text), 5, 8) as make
from {table}
order by media_id
"""


def wordpiece_fixed_sql(
    mod: int = 10, rem: int = 3, table: str = "documents"
) -> str:
    """Oracle for t24 (WordPiece tokenization): rebuilds the SAME
    corpus-derived vocabulary the entry builds — all corpus characters
    (head + ``##`` continuation) plus the 2-/3-char combinations whose
    md5-prefix hash (first 4 hex digits, mod 3 / mod 7) selects them,
    head and continuation selected independently — then segments every
    distinct word with a join-built longest-match table walked by a
    recursive CTE (greedy longest-match-first, the BERT rule), and
    reconstructs per-document piece positions exactly like the BPE
    tokenize oracle. Single-char coverage makes the walk total (no
    UNK), so the recursive CTE is bounded by corpus characters."""

    def h4(e: str) -> str:
        d = (
            "(strpos('0123456789abcdef', substring(md5({e}), {k}, 1)) - 1)"
        )
        return (
            "(" + d.format(e=e, k=1) + " * 4096 + "
            + d.format(e=e, k=2) + " * 256 + "
            + d.format(e=e, k=3) + " * 16 + "
            + d.format(e=e, k=4) + ")"
        )

    return f"""
with recursive src as (
  select doc_id, {TOKENS} as tks from {table} where doc_id % {mod} = {rem}
),
wnz as materialized (
  select distinct unnest(tks) as word from src
),
words as (select word from wnz where length(word) > 0),
chars as materialized (
  select distinct unnest(list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1))) as c
  from words
),
v2h as materialized (
  select a.c || b.c as p from chars a, chars b
  where {h4('a.c || b.c')} % 3 = 0
),
v2c as materialized (
  select a.c || b.c as p from chars a, chars b
  where {h4("'##' || a.c || b.c")} % 3 = 0
),
v3h as materialized (
  select a.c || b.c || d.c as p from chars a, chars b, chars d
  where {h4('a.c || b.c || d.c')} % 7 = 0
),
v3c as materialized (
  select a.c || b.c || d.c as p from chars a, chars b, chars d
  where {h4("'##' || a.c || b.c || d.c")} % 7 = 0
),
pos as (
  select word, unnest(generate_series(1, length(word))) as i from words
),
cand as (
  select word, i, 3 as L from pos
  where i + 2 <= length(word) and (
    (i = 1 and substring(word, i, 3) in (select p from v3h)) or
    (i > 1 and substring(word, i, 3) in (select p from v3c)))
  union all
  select word, i, 2 as L from pos
  where i + 1 <= length(word) and (
    (i = 1 and substring(word, i, 2) in (select p from v2h)) or
    (i > 1 and substring(word, i, 2) in (select p from v2c)))
  union all
  select word, i, 1 as L from pos
),
lmax as materialized (
  select word, i, max(L) as L from cand group by word, i
),
walk(word, i, ord) as (
  select word, 1, 1 from words
  union all
  select w.word, w.i + l.L, w.ord + 1
  from walk w join lmax l on l.word = w.word and l.i = w.i
  where w.i + l.L <= length(w.word)
),
wpieces as materialized (
  select w.word, w.ord,
    case when w.i = 1 then substring(w.word, w.i, l.L)
         else '##' || substring(w.word, w.i, l.L) end as piece
  from walk w join lmax l on l.word = w.word and l.i = w.i
),
doctoks as (
  select doc_id, tks, unnest(generate_series(1, len(tks))) as word_ord
  from src
),
dw as (select doc_id, word_ord, tks[word_ord] as word from doctoks),
persub as (
  select d.doc_id, d.word_ord, p.ord as sord, p.piece
  from dw d join wpieces p on p.word = d.word
)
select doc_id,
  cast(row_number() over (partition by doc_id order by word_ord, sord)
       as int) as pos,
  piece
from persub
order by doc_id, pos
"""


def wordpiece_trained_sql(
    mod: int = 10,
    rem: int = 3,
    num_pieces: int = 200,
    max_piece_len: int = 3,
    max_words: int = 100_000,
    max_word_len: int = 32,
    table: str = "documents",
) -> str:
    """Oracle for t28 (in-engine WordPiece TRAINING + encode): re-derives
    ``operators.text.wordpiece_train``'s vocabulary from corpus
    frequencies — the capped (count desc, word asc) distinct-word
    table, every substring candidate up to ``max_piece_len`` chars
    marked head (position 1) or ``##`` continuation (later positions)
    and weighted by word count per occurrence, ALL single-char pieces
    kept (coverage), the top ``num_pieces`` multi-char pieces by
    (freq desc, piece asc) — then segments every distinct word with
    the same greedy longest-match walk as the t24 oracle, membership
    now coming from the TRAINED vocab table. A mis-weighted candidate,
    a wrong cap ordering, or an off-by-one at the selection cut moves
    some piece across the rank-``num_pieces`` line and shifts
    segmentations, breaking the hash.

    Segmentation walks the SAME filtered word table training saw — the
    t28 entry asserts the corpus makes every training filter vacuous
    (no '#' words, none past ``max_word_len``, distinct words under
    the cap), so that table IS the corpus vocabulary and full
    single-char coverage keeps the greedy walk total (no UNK arm
    needed here)."""
    ls = ", ".join(f"({L})" for L in range(2, max_piece_len + 1))
    mark = (
        "case when i = 1 then substring(word, i, L)"
        " else '##' || substring(word, i, L) end"
    )
    return f"""
with recursive src as (
  select doc_id, {TOKENS} as tks from {table} where doc_id % {mod} = {rem}
),
words as materialized (
  select word, cnt from (
    select word, count(*) as cnt from (
      select unnest(tks) as word from src
    ) where length(word) > 0 and length(word) <= {max_word_len}
      and word not like '%#%'
    group by word
  ) order by cnt desc, word asc limit {max_words}
),
allpos as (
  select word, cnt, unnest(generate_series(1, length(word))) as i
  from words
),
cand as materialized (
  select {mark} as piece, sum(cnt) as freq
  from allpos, (values (1), {ls}) ls(L)
  where i + L - 1 <= length(word)
  group by piece
),
vocab as materialized (
  select piece from cand
  where (piece not like '##%' and length(piece) = 1)
     or (piece like '##%' and length(piece) = 3)
  union all
  select piece from (
    select piece from cand
    where not ((piece not like '##%' and length(piece) = 1)
               or (piece like '##%' and length(piece) = 3))
    order by freq desc, piece asc limit {num_pieces}
  )
),
pos as (
  select word, unnest(generate_series(1, length(word))) as i
  from (select word from words)
),
candm as (
  select word, i, L from pos, (values {ls}) ls(L)
  where i + L - 1 <= length(word)
    and ({mark}) in (select piece from vocab)
  union all
  select word, i, 1 as L from pos
),
lmax as materialized (
  select word, i, max(L) as L from candm group by word, i
),
walk(word, i, ord) as (
  select word, 1, 1 from (select word from words)
  union all
  select w.word, w.i + l.L, w.ord + 1
  from walk w join lmax l on l.word = w.word and l.i = w.i
  where w.i + l.L <= length(w.word)
),
wpieces as materialized (
  select w.word, w.ord,
    case when w.i = 1 then substring(w.word, w.i, l.L)
         else '##' || substring(w.word, w.i, l.L) end as piece
  from walk w join lmax l on l.word = w.word and l.i = w.i
),
doctoks as (
  select doc_id, tks, unnest(generate_series(1, len(tks))) as word_ord
  from src
),
dw as (select doc_id, word_ord, tks[word_ord] as word from doctoks),
persub as (
  select d.doc_id, d.word_ord, p.ord as sord, p.piece
  from dw d join wpieces p on p.word = d.word
)
select doc_id,
  cast(row_number() over (partition by doc_id order by word_ord, sord)
       as int) as pos,
  piece
from persub
order by doc_id, pos
"""


def unigram_fixed_sql(
    mod: int = 10, rem: int = 3, table: str = "documents"
) -> str:
    """Oracle for t26 (Unigram-LM / SentencePiece tokenization): rebuilds
    the SAME corpus-derived scored vocabulary the entry builds — every
    corpus character plus the 2-/3-char combinations whose md5-prefix
    hash (``'u:' || piece``, first 4 hex digits, mod 3 / mod 7) selects
    them, each piece scored ``-8 + (first-3-hex-digits % 7)`` (negative
    integers, like log-probs, so FEWER pieces usually but not always
    win) — then segments every distinct word by EXACT Viterbi, not a
    greedy walk: a recursive CTE enumerates every reachable
    (suffix-position, total-score) state (bounded: scores are small
    integers over words the corpus keeps short), ``max`` per position
    recovers the DP table g, and a second recursive walk follows the
    locally-optimal edges forward choosing the LONGEST piece per
    position — the entry's documented tie-break. Integer scores make
    the optimum engine-exact; a wrong DP transition, score, selection,
    or tie order shifts some word's segmentation and breaks the hash."""

    def h4(e: str) -> str:
        d = (
            "(strpos('0123456789abcdef', substring(md5({e}), {k}, 1)) - 1)"
        )
        return (
            "(" + d.format(e=e, k=1) + " * 4096 + "
            + d.format(e=e, k=2) + " * 256 + "
            + d.format(e=e, k=3) + " * 16 + "
            + d.format(e=e, k=4) + ")"
        )

    def h4d3(e: str) -> str:  # the first THREE hex digits (h4 >> 4)
        d = (
            "(strpos('0123456789abcdef', substring(md5({e}), {k}, 1)) - 1)"
        )
        return (
            "(" + d.format(e=e, k=1) + " * 256 + "
            + d.format(e=e, k=2) + " * 16 + "
            + d.format(e=e, k=3) + ")"
        )

    return f"""
with recursive src as (
  select doc_id, {TOKENS} as tks from {table} where doc_id % {mod} = {rem}
),
wnz as materialized (
  select distinct unnest(tks) as word from src
),
words as (select word from wnz where length(word) > 0),
chars as materialized (
  select distinct unnest(list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1))) as c
  from words
),
vp as (
  select c as p from chars
  union all
  select a.c || b.c from chars a, chars b
  where {h4("'u:' || a.c || b.c")} % 3 = 0
  union all
  select a.c || b.c || d.c from chars a, chars b, chars d
  where {h4("'u:' || a.c || b.c || d.c")} % 7 = 0
),
vocab as materialized (
  select p, -8 + ({h4d3("'u:' || p")} % 7) as s from vp
),
pos as (
  select word, unnest(generate_series(1, length(word))) as i from words
),
cand as materialized (
  select c.word, c.i, c.L, v.s
  from (
    select word, i, L, substring(word, i, L) as sub
    from pos, (values (1), (2), (3)) ls(L)
    where i + L - 1 <= length(word)
  ) c join vocab v on v.p = c.sub
),
rst(word, i, s) as (
  select word, length(word) + 1, 0 from words
  union
  select c.word, c.i, c.s + r.s
  from rst r join cand c on c.word = r.word and c.i + c.L = r.i
),
g as materialized (
  select word, i, max(s) as g from rst group by word, i
),
opt as materialized (
  select c.word, c.i, max(c.L) as L
  from cand c
  join g gc on gc.word = c.word and gc.i = c.i
  join g gn on gn.word = c.word and gn.i = c.i + c.L
  where c.s + gn.g = gc.g
  group by c.word, c.i
),
walk(word, i, ord) as (
  select word, 1, 1 from words
  union all
  select w.word, w.i + o.L, w.ord + 1
  from walk w join opt o on o.word = w.word and o.i = w.i
  where w.i + o.L <= length(w.word)
),
upieces as materialized (
  select w.word, w.ord, substring(w.word, w.i, o.L) as piece
  from walk w join opt o on o.word = w.word and o.i = w.i
),
doctoks as (
  select doc_id, tks, unnest(generate_series(1, len(tks))) as word_ord
  from src
),
dw as (select doc_id, word_ord, tks[word_ord] as word from doctoks),
persub as (
  select d.doc_id, d.word_ord, p.ord as sord, p.piece
  from dw d join upieces p on p.word = d.word
)
select doc_id,
  cast(row_number() over (partition by doc_id order by word_ord, sord)
       as int) as pos,
  piece
from persub
order by doc_id, pos
"""


def unigram_trained_sql(
    mod: int = 10,
    rem: int = 3,
    seed_pieces: int = 240,
    keep_per_iter: "tuple[int, ...]" = (160, 120),
    max_piece_len: int = 3,
    max_words: int = 100_000,
    max_word_len: int = 32,
    shift: int = 64,
    table: str = "documents",
) -> str:
    """Oracle for t29 (in-engine Unigram-LM EM TRAINING + encode):
    replays ``operators.text._unigram_em_local`` end to end in SQL —
    the substring-seeded vocabulary, then one full Viterbi E-step per
    ``keep_per_iter`` entry (the t26 recursive-CTE DP machinery,
    instantiated once per iteration) with word-count-weighted usage
    re-estimation and a prune to the top ``keep_per_iter[k]``
    multi-char pieces by (usage desc, piece asc), the corpus alphabet
    surviving every round at a usage floor of 1 — and finally encodes
    every document under the last iteration's scores. Scores are the
    exact integer ``length(bin(usage)) - 1 - shift`` (= bit_length-1,
    floor-log2), so every DP optimum, tie, cut line, and usage count
    is engine-exact; a wrong E-step transition, re-estimation weight,
    floor, or prune boundary shifts some round's vocabulary and breaks
    the hash. The t29 entry asserts the corpus keeps the word cap and
    length filter vacuous (same contract as t28)."""
    ls = ", ".join(f"({L})" for L in range(1, max_piece_len + 1))

    def viterbi_block(k: str, sc: str, words_src: str) -> str:
        """One Viterbi DP over every word of ``words_src`` under score
        table ``sc`` (piece, s): cand/rst/g/opt/walk CTEs suffixed k."""
        return f"""
cand{k} as materialized (
  select c.word, c.i, c.L, v.s
  from (
    select word, i, L, substring(word, i, L) as sub
    from pos, (values {ls}) ls{k}(L)
    where i + L - 1 <= length(word)
  ) c join {sc} v on v.piece = c.sub
),
rst{k}(word, i, s) as (
  select word, length(word) + 1, 0 from {words_src}
  union
  select c.word, c.i, c.s + r.s
  from rst{k} r join cand{k} c on c.word = r.word and c.i + c.L = r.i
),
g{k} as materialized (
  select word, i, max(s) as g from rst{k} group by word, i
),
opt{k} as materialized (
  select c.word, c.i, max(c.L) as L
  from cand{k} c
  join g{k} gc on gc.word = c.word and gc.i = c.i
  join g{k} gn on gn.word = c.word and gn.i = c.i + c.L
  where c.s + gn.g = gc.g
  group by c.word, c.i
),
walk{k}(word, i, ord) as (
  select word, 1, 1 from {words_src}
  union all
  select w.word, w.i + o.L, w.ord + 1
  from walk{k} w join opt{k} o on o.word = w.word and o.i = w.i
  where w.i + o.L <= length(w.word)
)"""

    blocks = []
    prev_sc = "sc0"
    for n, keep_n in enumerate(keep_per_iter, start=1):
        blocks.append(viterbi_block(f"e{n}", prev_sc, "wordsonly"))
        blocks.append(f"""
usage{n} as materialized (
  select substring(w.word, w.i, o.L) as piece, sum(wc.cnt) as u
  from walke{n} w
  join opte{n} o on o.word = w.word and o.i = w.i
  join words wc on wc.word = w.word
  group by piece
),
vocab{n} as materialized (
  select c as piece, greatest(coalesce(u.u, 0), 1) as u
  from chars left join usage{n} u on u.piece = c
  union all
  select piece, u from (
    select piece, u from usage{n} where length(piece) > 1 and u > 0
    order by u desc, piece asc limit {keep_n}
  )
),
sc{n} as materialized (
  select piece, length(bin(u)) - 1 - {shift} as s from vocab{n}
)""")
        prev_sc = f"sc{n}"
    blocks.append(viterbi_block("f", prev_sc, "wordsonly"))
    iter_sql = ",".join(blocks)
    return f"""
with recursive src as (
  select doc_id, {TOKENS} as tks from {table} where doc_id % {mod} = {rem}
),
words as materialized (
  select word, cnt from (
    select word, count(*) as cnt from (
      select unnest(tks) as word from src
    ) where length(word) > 0 and length(word) <= {max_word_len}
    group by word
  ) order by cnt desc, word asc limit {max_words}
),
wordsonly as (select word from words),
chars as materialized (
  select distinct unnest(list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1))) as c
  from wordsonly
),
pos as (
  select word, unnest(generate_series(1, length(word))) as i
  from wordsonly
),
seedu as materialized (
  select substring(word, i, L) as piece, sum(cnt) as u
  from (
    select word, cnt, unnest(generate_series(1, length(word))) as i
    from words
  ), (values {ls}) ls0(L)
  where i + L - 1 <= length(word)
  group by piece
),
vocab0 as materialized (
  select c as piece, greatest(coalesce(s.u, 0), 1) as u
  from chars left join seedu s on s.piece = c and length(s.piece) = 1
  union all
  select piece, u from (
    select piece, u from seedu where length(piece) > 1 and u > 0
    order by u desc, piece asc limit {seed_pieces}
  )
),
sc0 as materialized (
  select piece, length(bin(u)) - 1 - {shift} as s from vocab0
),{iter_sql},
upieces as materialized (
  select w.word, w.ord, substring(w.word, w.i, o.L) as piece
  from walkf w join optf o on o.word = w.word and o.i = w.i
),
doctoks as (
  select doc_id, tks, unnest(generate_series(1, len(tks))) as word_ord
  from src
),
dw as (select doc_id, word_ord, tks[word_ord] as word from doctoks),
persub as (
  select d.doc_id, d.word_ord, p.ord as sord, p.piece
  from dw d join upieces p on p.word = d.word
)
select doc_id,
  cast(row_number() over (partition by doc_id order by word_ord, sord)
       as int) as pos,
  piece
from persub
order by doc_id, pos
"""


def mp3_meta_sql(table: str = "documents") -> str:
    """Oracle for m12 (REAL MP3 metadata decode): the entry synthesizes
    an ID3v2.3-tagged MPEG1 Layer III shell per doc — title = md5 hex
    chars 1..(4 + doc_id % 5), artist = chars 7..12, 128 kbps CBR with
    a (104 + doc_id % 50)-byte audio section — and parses it with the
    pure-Python ID3/frame-header walker. This closed form recomputes
    all five fields; a wrong syncsafe shift, frame walk, text encoding,
    bitrate table, or the CBR estimate breaks the match."""
    return f"""
select doc_id as media_id,
  substring(md5(text), 1, 4 + doc_id % 5) as title,
  substring(md5(text), 7, 6) as artist,
  cast(128 as bigint) as bitrate_kbps,
  cast(44100 as bigint) as sample_rate,
  cast((104 + doc_id % 50) * 8 // 128 as bigint) as est_duration_ms
from {table}
order by media_id
"""


def mp4_keyframes_sql(table: str = "documents") -> str:
    """Oracle for m13 (REAL MP4 sample-table decode): the entry
    synthesizes an ISO-BMFF shell per doc whose stts holds two runs —
    (a = 3 + doc_id % 3 samples of delta d1 = 40 + 20·(doc_id % 4),
    then 4 samples of delta 200, timescale 1000) — and whose stss marks
    every odd sample of the n = a + 4 total as a keyframe. This closed
    form recomputes each keyframe's start time (sum of deltas before
    it); any error in the Spark side's box-size arithmetic, the
    run-length expansion, or the ms conversion breaks every row."""
    return f"""
with p as (
  select doc_id as media_id,
    3 + doc_id % 3 as a,
    40 + 20 * (doc_id % 4) as d1
  from {table}
),
kf as (
  select media_id, a, d1,
    unnest(generate_series(1, (a + 5) // 2)) as i
  from p
)
select media_id,
  cast(2 * i - 1 as int) as kf_sample,
  cast(case when 2 * i - 1 <= a then (2 * i - 2) * d1
            else a * d1 + (2 * i - 2 - a) * 200 end as bigint) as kf_time_ms
from kf
order by media_id, kf_sample
"""


def cosine_topk_ivfpq_trained_sql(
    dim: int,
    k: int = 5,
    query_mod: int = 25,
    n_centroids: int = 16,
    nprobe: int = 4,
    m_sub: int = 8,
    k_sub: int = 16,
    rerank: int = 0,
    iters: int = 2,
    table: str = "embeddings",
) -> str:
    """Oracle for ``__spark_entry__.s13_ann_index_trained_pq`` — the
    COMPLETE production ANN closed form: the coarse codebook is the
    TRAINED k-means result (the same unrolled Lloyd CTE pairs as
    :func:`cosine_topk_ivf_trained_sql`), the PQ sub-codebooks stay the
    deterministic lowest-id policy of :func:`cosine_topk_ivfpq_sql`,
    and scoring is ADC over the packed byte codes with an optional
    exact rerank. Equality against the Spark side IS the claim that
    train -> persist (coarse + sub-codebooks + byte codes) ->
    prune-read -> ADC -> rerank equals recompute-everything."""
    dsub = dim // m_sub
    slice_ = "list_transform(generate_series(1, {d}), i -> {v}[s * {d} + i])"
    sv = slice_.format(d=dsub, v="dv")
    qsv_qual = (
        "list_transform(generate_series(1, {d}), i -> qv[qs.s * {d} + i])"
        .format(d=dsub)
    )
    final = "ranked"
    rerank_ctes = ""
    if rerank:
        final = "reranked"
        rerank_ctes = f""", exact as (
  select r.query_id, r.neighbor_id,
    round(list_cosine_similarity(nv.dv, q.qv), 6) as cosine
  from ranked r
  join v nv on nv.id = r.neighbor_id
  join q on q.query_id = r.query_id
  where r.rank <= {rerank}
), reranked as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id
                            order by cosine desc, neighbor_id asc) as integer) as rank
  from exact
)"""
    v_cte = f"""v as (
  select vec_id as id, cast(embedding as double[]) as dv from {table}
)"""
    ctes, prev = _kmeans_ctes(v_cte, n_centroids, dim, iters)
    return f"""
with {', '.join(ctes)}, assign as (
  select id, cell from (
    select v.id, c.cid as cell,
      row_number() over (partition by v.id
        order by round(list_cosine_similarity(v.dv, c.cv), 6) desc, c.cid asc) as rn
    from v, {prev} c
  ) where rn = 1
), train as (
  select row_number() over (order by id) - 1 as j, dv
  from (select * from v order by id limit {k_sub})
), subcents as (
  select s, j, {slice_.format(d=dsub, v="dv")} as scv,
    list_inner_product({slice_.format(d=dsub, v="dv")},
                       {slice_.format(d=dsub, v="dv")}) as c2
  from (select j, dv, unnest(generate_series(0, {m_sub - 1})) as s from train)
), sub as (
  select id, s, {sv} as sv
  from (select id, dv, unnest(generate_series(0, {m_sub - 1})) as s from v)
), codes as (
  select id, s, code, c2c from (
    select sub.id, sub.s, sc.j as code, sc.c2 as c2c,
      row_number() over (partition by sub.id, sub.s
        order by round(list_inner_product(sv, sv)
                       - 2 * list_inner_product(sv, sc.scv) + sc.c2, 6) asc,
                 sc.j asc) as rn
    from sub join subcents sc on sub.s = sc.s
  ) where rn = 1
), q as (
  select id as query_id, dv as qv,
    sqrt(list_inner_product(dv, dv)) as qn
  from v where id % {query_mod} = 0
), probes as (
  select query_id, qn, cell from (
    select q.query_id, q.qn, c.cid as cell,
      row_number() over (partition by q.query_id
        order by round(list_cosine_similarity(q.qv, c.cv), 6) desc, c.cid asc) as rn
    from q, {prev} c
  ) where rn <= {nprobe}
), adc as (
  select query_id, s, j, list_inner_product(qsv, scv) as pdot from (
    select query_id, s2.s as s, s2.j as j, {qsv_qual} as qsv, s2.scv as scv
    from (select query_id, qv, unnest(generate_series(0, {m_sub - 1})) as s
          from q) qs
    join subcents s2 on qs.s = s2.s
  )
), scored as (
  select p.query_id, a.id as neighbor_id,
    round(sum(t.pdot) / (any_value(p.qn) * sqrt(sum(c.c2c))), 6) as cosine
  from assign a
  join codes c on a.id = c.id
  join probes p on a.cell = p.cell
  join adc t on t.query_id = p.query_id and t.s = c.s and t.j = c.code
  where p.query_id <> a.id
  group by p.query_id, a.id
), ranked as (
  select query_id, neighbor_id, cosine,
    cast(row_number() over (partition by query_id
                            order by cosine desc, neighbor_id asc) as integer) as rank
  from scored
){rerank_ctes}
select query_id, neighbor_id, cosine, rank from {final} where rank <= {k}
"""


def ann_recall_floor_sql(
    k: int = 5,
    query_mod: int = 25,
    n_centroids: int = 16,
    nprobe: int = 2,
    dim: int = 64,
    iters: int = 2,
    n_clusters: int = 16,
    spread: float = 0.15,
    table: str = "embeddings",
) -> str:
    """Oracle for ``__spark_entry__.s14_ann_recall_floor`` — per-query
    recall@k of the TRAINED persisted ANN path against the exact
    brute-force baseline, both over the derived clustered corpus
    (``testdata.load_clustered_embeddings``'s closed form). Everything
    is deterministic, so recall is an EXACT per-query integer
    (hits in 0..k), not a tolerance: the driver hash pins the s10
    recall claim permanently."""
    v_cte = f"""v as (
  select id, list(val order by i) as dv from (
    select e.vec_id as id, r.i as i,
      round(((((e.vec_id // 7) % {n_clusters}) * 31 + r.i * 17) % 13 - 6) / 6.0
            + {spread} * cast(e.embedding[r.i + 1] as double), 3) as val
    from {table} e, range(0, {dim}) r(i)
  ) group by id
)"""
    ctes, prev = _kmeans_ctes(v_cte, n_centroids, dim, iters)
    return f"""
with {', '.join(ctes)}, assign as (
  select id, dv, cell from (
    select v.id, v.dv, c.cid as cell,
      row_number() over (partition by v.id
        order by round(list_cosine_similarity(v.dv, c.cv), 6) desc, c.cid asc) as rn
    from v, {prev} c
  ) where rn = 1
), q as (
  select id as query_id, dv as qv from v where id % {query_mod} = 0
), probes as (
  select query_id, qv, cell from (
    select q.query_id, q.qv, c.cid as cell,
      row_number() over (partition by q.query_id
        order by round(list_cosine_similarity(q.qv, c.cv), 6) desc, c.cid asc) as rn
    from q, {prev} c
  ) where rn <= {nprobe}
), approx as (
  select query_id, neighbor_id from (
    select query_id, neighbor_id,
      row_number() over (partition by query_id
                         order by cosine desc, neighbor_id asc) as rank
    from (
      select p.query_id, a.id as neighbor_id,
        round(list_cosine_similarity(a.dv, p.qv), 6) as cosine
      from assign a join probes p on a.cell = p.cell
      where p.query_id <> a.id
    )
  ) where rank <= {k}
), exact as (
  select query_id, neighbor_id from (
    select q.query_id, c.id as neighbor_id,
      row_number() over (partition by q.query_id
        order by round(list_cosine_similarity(c.dv, q.qv), 6) desc,
                 c.id asc) as rank
    from v c, q where q.query_id <> c.id
  ) where rank <= {k}
)
select e.query_id,
  cast(count(a.neighbor_id) as bigint) as hits,
  round(count(a.neighbor_id) / {k}.0, 2) as recall
from exact e
left join approx a
  on a.query_id = e.query_id and a.neighbor_id = e.neighbor_id
group by e.query_id
order by e.query_id
"""


def subbyte_formats_sql(bits: int = 60, table: str = "documents") -> str:
    """Oracle for ``__spark_entry__.m19_subbyte_formats`` — the r11
    format completions closed-form from the md5 hex. Image arms
    (doc_id % 4 in 0..2) recompute the decoded gray raster and pool it
    to the aHash exactly like the other m-gates: sub-8-bit PNG grays
    are the spec's exact ``q * {255,85,17}`` scaling of the top
    ``depth`` bits of each md5 byte (depth-4 routes nibbles through the
    16-entry PLTE instead), PackBits TIFF and palette BMP recompute the
    row-skewed md5 raster (BMP through its BGRA table). The WAV arm
    (doc_id % 4 = 3) recomputes all six audio_features integers from
    the synthesized samples: float32 ``round((c-128)*32767/128)`` with
    odd ``c`` (no .5 ties anywhere, so round-half-away == banker's),
    signed 24-bit channel-0, and sign-by-parity 32-bit PCM."""
    def V(expr: str) -> str:
        hi = _HEX.format(pos=f"2*(({expr}) % 16)+1")
        lo = _HEX.format(pos=f"2*(({expr}) % 16)+2")
        return f"(({hi}) * 16 + ({lo}))"

    b_i = V("i % 16")
    b_skew = V("i + i // 8")
    pal16 = (
        f"(299 * ((17 * ({b_i} // 16)) % 256)"
        f" + 587 * ((29 * ({b_i} // 16)) % 256)"
        f" + 114 * ((43 * ({b_i} // 16)) % 256)) // 1000"
    )
    bmp_pal = (
        f"(299 * ((13 * {b_skew}) % 256)"
        f" + 587 * ((11 * {b_skew}) % 256)"
        f" + 114 * ((7 * {b_skew}) % 256)) // 1000"
    )
    luma = f"""case
      when doc_id % 4 = 0 and (doc_id // 4) % 3 = 0
        then ({b_i} // 128) * 255
      when doc_id % 4 = 0 and (doc_id // 4) % 3 = 1
        then ({b_i} // 64) * 85
      when doc_id % 4 = 0 then {pal16}
      when doc_id % 4 = 1 then {b_skew}
      else {bmp_pal} end"""
    # WAV samples; list_transform index i is 0-based via range(0, n)
    c_odd = f"({b_i} + 1 - ({b_i} % 2))"
    s_float = f"cast(round(({c_odd} - 128) * 32767 / 128.0) as bigint)"
    b24_0, b24_1, b24_2 = V("3 * i"), V("3 * i + 1"), V("3 * i + 2")
    s_24 = (
        f"({b24_0} + 256 * {b24_1} + 65536 * {b24_2}"
        f" - 16777216 * (case when {b24_2} >= 128 then 1 else 0 end))"
    )
    b32_0, b32_1, b32_2 = V("i"), V("i + 5"), V("i + 11")
    s_32 = (
        f"({b32_0} + 256 * {b32_1} + 65536 * {b32_2}"
        f" - 16777216 * ({b32_2} % 2))"
    )
    return f"""
with img as (
  select doc_id as media_id,
    list_transform(range(0, 64), i -> {luma}) as ps
  from {table} where doc_id % 4 < 3
),
pooled as (
  select media_id,
    list_transform(range(0, {bits}), j ->
      list_sum(ps[(j*64)//{bits} + 1 : ((j+1)*64)//{bits}])
      // (((j+1)*64)//{bits} - (j*64)//{bits})) as pp
  from img
),
ph as (
  select media_id, 'phash' as metric,
    cast(list_reduce(
      list_prepend(cast(0 as bigint),
        list_transform(pp, p -> cast(case when p * {bits} > list_sum(pp)
                                          then 1 else 0 end as bigint))),
      (acc, b) -> acc * 2 + b) as bigint) as value
  from pooled
),
wav as (
  select doc_id as media_id,
    8 + doc_id % 5 as n,
    case (doc_id // 4) % 3 when 0 then 8000 when 1 then 44100
         else 22050 end as rate,
    list_transform(range(0, 8 + doc_id % 5), i ->
      case (doc_id // 4) % 3
        when 0 then {s_float}
        when 1 then {s_24}
        else {s_32} end) as s
  from {table} where doc_id % 4 = 3
),
feats as (
  select media_id, 'n_samples' as metric, cast(n as bigint) as value from wav
  union all
  select media_id, 'sample_rate', cast(rate as bigint) from wav
  union all
  select media_id, 'duration_ms', cast(n * 1000 // rate as bigint) from wav
  union all
  select media_id, 'peak',
    cast(list_max(list_transform(s, x -> abs(x))) as bigint) from wav
  union all
  select media_id, 'sum_sq',
    cast(list_sum(list_transform(s, x -> x * x)) as bigint) from wav
  union all
  select media_id, 'zero_crossings',
    cast(len(list_filter(range(2, n + 1),
         i -> (s[i-1] < 0) <> (s[i] < 0))) as bigint) from wav
)
select media_id, metric, value from (
  select * from ph union all select * from feats
) order by media_id, metric
"""
