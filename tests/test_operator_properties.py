"""Property tests for the round-6 operator changes: the salted two-level
top-k in semantic_coverage_sample must be BIT-IDENTICAL to the full
per-cell ranking for arbitrary corpora/budgets/salt counts (the de-skew
must never change selection), and bm25_score must equal a pure-Python
recompute for arbitrary small corpora and queries.

Few examples by design: unlike the metadata-only property suites, every
example here runs real Spark jobs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _vec(rnd, dim):
    return [round(rnd.uniform(-1.0, 1.0), 3) or 0.001 for _ in range(dim)]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10**6),
    n=st.integers(5, 60),
    per_cell=st.integers(1, 6),
    salt=st.integers(1, 7),
    n_clusters=st.integers(1, 4),
)
def test_salted_coverage_equals_full_ranking(
    spark, seed, n, per_cell, salt, n_clusters
):
    import random

    from icedb_spark.operators import semantic_coverage_sample

    rnd = random.Random(seed)
    dim = 4
    rows = [(i, _vec(rnd, dim)) for i in range(n)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    kw = dict(dim=dim, n_clusters=n_clusters, iters=1)
    got = sorted(
        map(
            tuple,
            semantic_coverage_sample(
                emb, per_cell=per_cell, salt=salt, **kw
            ).collect(),
        )
    )
    full = semantic_coverage_sample(emb, per_cell=n + 1, **kw).collect()
    expect = sorted(
        tuple(r) for r in full if r["cell_rank"] <= per_cell
    )
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10**6),
    n=st.integers(2, 30),
    qlen=st.integers(1, 5),
)
def test_bm25_equals_bruteforce(spark, seed, n, qlen):
    import random

    from icedb_spark.operators import bm25_score

    rnd = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = {
        i: " ".join(
            rnd.choice(vocab) for _ in range(rnd.randint(1, 12))
        )
        for i in range(n)
    }
    query = " ".join(rnd.choice(vocab) for _ in range(qlen))
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in bm25_score(df, query, top_k=n + 5).collect()
    ]

    toks = {i: t.split() for i, t in texts.items()}
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    q = sorted(set(query.split()))
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in q}
    expect = []
    for i, v in toks.items():
        s, hits = 0.0, 0
        for t in q:
            tf = v.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log(
                1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            )
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(v) / avgdl)
            )
        if hits:
            expect.append((i, round(s, 6), hits))
    expect.sort(key=lambda r: (-r[1], r[0]))
    assert got == expect


# ------------------------------------------- round-7 operator properties


def _spans_bruteforce(docs: dict, k: int, exclude_first: bool):
    """Pure-Python reference for duplicated_spans: shingle -> positions,
    repeats, optional keep-first exemption, gap>k island merge."""
    occ: dict = {}
    toks = {i: t.lower().split() for i, t in docs.items()}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(1, len(ts) - k + 2):
            sh = " ".join(ts[p - 1: p - 1 + k])
            occ.setdefault(sh, []).append((i, p))
    matched: dict = {}
    for sh, locs in occ.items():
        if len(locs) < 2:
            continue
        keep = locs[1:] if exclude_first else locs
        for i, p in keep:
            matched.setdefault(i, set()).add(p)
    spans = set()
    for i, ps in matched.items():
        run = []
        for p in sorted(ps):
            if run and p - run[-1] <= k:
                run.append(p)
            else:
                if run:
                    spans.add((i, run[0], run[-1] + k - 1, len(run)))
                run = [p]
        if run:
            spans.add((i, run[0], run[-1] + k - 1, len(run)))
    return spans


from hypothesis import HealthCheck as _HC  # noqa: E402
from hypothesis import given as _given, settings as _settings  # noqa: E402
from hypothesis import strategies as _st  # noqa: E402


@_settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    seed=_st.integers(0, 10**6),
    n_docs=_st.integers(2, 8),
    vocab=_st.integers(2, 5),
    k=_st.integers(2, 4),
    exclude_first=_st.booleans(),
)
def test_duplicated_spans_equals_bruteforce(
    spark, seed, n_docs, vocab, k, exclude_first
):
    """Tiny vocab + short docs force heavy natural shingle collisions —
    the adversarial regime for island merging and keep-first ranking."""
    import random

    from icedb_spark.operators import duplicated_spans

    rnd = random.Random(seed)
    words = [f"w{j}" for j in range(vocab)]
    docs = {
        i: " ".join(rnd.choice(words) for _ in range(rnd.randint(k, 14)))
        for i in range(1, n_docs + 1)
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id int, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_shingles"])
        for r in duplicated_spans(
            df, k=k, exclude_first=exclude_first
        ).collect()
    }
    assert got == _spans_bruteforce(docs, k, exclude_first)


@_settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    seed=_st.integers(0, 10**6),
    n_old=_st.integers(1, 6),
    n_batch=_st.integers(2, 8),
    split=_st.integers(1, 6),
)
def test_dedup_against_index_split_invariance(
    spark, seed, n_old, n_batch, split
):
    """For arbitrary corpora (with planted copies) and an arbitrary
    batch split point, two-step ingestion — index batch A's signatures
    before deduping batch B — gives identical verdicts to the one-shot
    run, and verdicts agree with a signature-level brute force."""
    import random

    from icedb_spark.operators import (
        dedup_against_index,
        minhash_index_rows,
        minhash_signature,
    )

    rnd = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "eps"]

    def text():
        return " ".join(rnd.choice(words) for _ in range(rnd.randint(3, 9)))

    old_rows = [(i, text()) for i in range(1, n_old + 1)]
    batch_rows = []
    for j in range(n_batch):
        did = 100 + j
        if old_rows and rnd.random() < 0.4:
            batch_rows.append((did, rnd.choice(old_rows)[1]))  # copy
        elif batch_rows and rnd.random() < 0.4:
            batch_rows.append((did, rnd.choice(batch_rows)[1]))
        else:
            batch_rows.append((did, text()))
    schema = "doc_id long, text string"
    old = spark.createDataFrame(old_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)
    idx0 = minhash_index_rows(old)
    oneshot = {
        r["doc_id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_against_index(batch, idx0).collect()
    }
    cut = min(split, n_batch)
    a = spark.createDataFrame(batch_rows[:cut], schema)
    b = spark.createDataFrame(batch_rows[cut:], schema)
    two = {
        r["doc_id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_against_index(a, idx0).collect()
    }
    if batch_rows[cut:]:
        idx1 = idx0.unionByName(minhash_index_rows(a))
        two.update(
            {
                r["doc_id"]: (r["is_dup"], r["dup_of"])
                for r in dedup_against_index(b, idx1).collect()
            }
        )
    assert two == oneshot
    # signature-level brute force over the union
    sigs = {
        r["id"]: tuple(r[f"mh{j}"] for j in range(16))
        for r in minhash_signature(
            old.unionByName(batch), "doc_id", "text"
        ).collect()
    }
    old_ids = [i for i, _ in old_rows]
    batch_ids = [i for i, _ in batch_rows]

    def band_hit(x, y):
        # candidate rule = some band of 4 consecutive positions fully
        # matches (LSH recall is probabilistic by design: est >= 0.5
        # does NOT imply a full band — 8 matches can spread 2-per-band)
        return any(
            all(sigs[x][b * 4 + r] == sigs[y][b * 4 + r] for r in range(4))
            for b in range(4)
        )

    for d in batch_ids:
        mates = [
            m
            for m in old_ids + [x for x in batch_ids if x < d]
            if band_hit(d, m)
            and sum(a == b for a, b in zip(sigs[d], sigs[m])) / 16.0 >= 0.5
        ]
        want = (True, min(mates)) if mates else (False, None)
        assert oneshot[d] == want, (d, oneshot[d], want)


def _bpe_encode_py(word: str, merges: list) -> int:
    """Reference BPE encoder: sequential left-greedy merge replay."""
    syms = list(word)
    for l, r in merges:
        out = []
        i = 0
        while i < len(syms):
            if (
                out
                and out[-1] == l
                and syms[i] == r
            ):
                out[-1] = l + r
                i += 1
            else:
                out.append(syms[i])
                i += 1
        # NOTE: the above folds like the engine: out[-1] is the merged
        # accumulator tail, so "aaaa" under (a,a) -> [aa, aa]
        syms = out
    return len(syms)


def _bpe_train_py(words: dict, num_merges: int) -> list:
    """Reference trainer over a word->count table (same tie-breaks)."""
    seqs = {w: list(w) for w in words}
    merges = []
    for _ in range(num_merges):
        counts: dict = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((l, r))
        for w in seqs:
            syms, out, i = seqs[w], [], 0
            while i < len(syms):
                if out and out[-1] == l and syms[i] == r:
                    out[-1] = l + r
                else:
                    out.append(syms[i])
                i += 1
            seqs[w] = out
    return merges


@_settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    seed=_st.integers(0, 10**6),
    n_docs=_st.integers(1, 5),
    alpha=_st.integers(2, 4),
    num_merges=_st.integers(1, 8),
)
def test_bpe_train_and_apply_equal_reference(
    spark, seed, n_docs, alpha, num_merges
):
    """Training and encoding both equal a sequential pure-Python BPE on
    tiny alphabets (the regime where runs and tie-breaks are constant
    hazards)."""
    import random

    from icedb_spark.operators import apply_bpe, bpe_train

    rnd = random.Random(seed)
    letters = "abcd"[:alpha]

    def word():
        return "".join(
            rnd.choice(letters) for _ in range(rnd.randint(1, 6))
        )

    docs = {
        i: " ".join(word() for _ in range(rnd.randint(1, 8)))
        for i in range(1, n_docs + 1)
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id int, text string"
    )
    _, merges = bpe_train(df, num_merges=num_merges, min_pair_count=1)
    counts: dict = {}
    for t in docs.values():
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    assert merges == _bpe_train_py(counts, num_merges)
    enc = {
        r["doc_id"]: r["n_subwords"]
        for r in apply_bpe(df, merges).collect()
    }
    for i, t in docs.items():
        assert enc[i] == sum(
            _bpe_encode_py(w, merges) for w in t.split()
        ), (i, t, merges)


@_settings(max_examples=200, deadline=None)
@_given(seed=_st.integers(0, 10**9))
def test_bpe_indexed_encoder_equals_linear_replay(seed):
    """The merge-count-independent pair-indexed encoder (VERDICT r8 #2)
    is bit-equal to the linear rank replay on ARBITRARY merge tables —
    multi-char symbols, duplicate pairs (a pair can recur at several
    ranks in a trained table), rules that never apply — not just on
    tables with the trained-closure property."""
    import random

    from icedb_spark.operators.text import (
        _bpe_encode_syms,
        _bpe_encode_syms_indexed,
        _bpe_pair_index,
    )

    rnd = random.Random(seed)
    letters = "abc"
    rules = [
        (
            "".join(rnd.choice(letters) for _ in range(rnd.randint(1, 3))),
            "".join(rnd.choice(letters) for _ in range(rnd.randint(1, 3))),
        )
        for _ in range(rnd.randint(0, 14))
    ]
    pair_ranks = _bpe_pair_index(rules)
    for _ in range(5):
        w = "".join(rnd.choice(letters) for _ in range(rnd.randint(0, 12)))
        assert _bpe_encode_syms(w, rules) == _bpe_encode_syms_indexed(
            w, rules, pair_ranks
        ), (w, rules)


def test_bpe_indexed_encoder_at_production_table():
    """At the 47 952-merge fixed table (t23's), the indexed encoder
    equals the linear replay word-for-word, and layer-2 rules really
    fire (3-char products appear)."""
    from icedb_spark.operators.text import (
        _bpe_encode_syms,
        _bpe_encode_syms_indexed,
        _bpe_pair_index,
        bpe_alphabet_merges3,
    )

    m3 = bpe_alphabet_merges3()
    assert len(m3) == 36 * 36 + 36 * 36 * 36
    pr = _bpe_pair_index(m3)
    words = [
        "internationalization", "hello", "aaaabbbb", "x1y2z3", "a",
        "zq", "the-quick", "0123456789abcdef", "",
    ]
    for w in words:
        assert _bpe_encode_syms(w, m3) == _bpe_encode_syms_indexed(
            w, m3, pr
        ), w
    assert _bpe_encode_syms_indexed("internationalization", m3, pr) == [
        "int", "ern", "at", "ion", "al", "iz", "at", "ion",
    ]


@_settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    seed=_st.integers(0, 10**6),
    n_docs=_st.integers(1, 5),
    alpha=_st.integers(2, 4),
    num_merges=_st.integers(1, 8),
)
def test_bpe_local_trainer_equals_distributed(
    spark, seed, n_docs, alpha, num_merges
):
    """The collected-table fast-path trainer (VERDICT r7 #7) produces
    the identical merge table — ranks, pairs AND pair counts — as the
    original all-cluster loop, on the tie-break-hostile tiny-alphabet
    corpora."""
    import random

    from icedb_spark.operators import bpe_train

    rnd = random.Random(seed)
    letters = "abcd"[:alpha]
    docs = [
        (
            i,
            " ".join(
                "".join(
                    rnd.choice(letters) for _ in range(rnd.randint(1, 6))
                )
                for _ in range(rnd.randint(1, 8))
            ),
        )
        for i in range(1, n_docs + 1)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    mdf_l, merges_l = bpe_train(df, num_merges=num_merges, min_pair_count=1)
    mdf_d, merges_d = bpe_train(
        df, num_merges=num_merges, min_pair_count=1, distributed=True
    )
    assert merges_l == merges_d
    rows_l = [tuple(r) for r in mdf_l.orderBy("rank").collect()]
    rows_d = [tuple(r) for r in mdf_d.orderBy("rank").collect()]
    assert rows_l == rows_d


@_settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    seed=_st.integers(0, 10**6),
    n_docs=_st.integers(1, 5),
    alpha=_st.integers(2, 4),
    num_merges=_st.integers(1, 10),
)
def test_bpe_greedy_encoder_equals_fold(
    spark, seed, n_docs, alpha, num_merges
):
    """The mapInPandas greedy encoder (the strategy that survives
    production merge counts, VERDICT r7 #3) is bit-equal to the
    column-expression fold encoder on trained merges over run-heavy
    tiny alphabets."""
    import random

    from icedb_spark.operators import apply_bpe, bpe_train

    rnd = random.Random(seed)
    letters = "abcd"[:alpha]
    docs = [
        (
            i,
            " ".join(
                "".join(
                    rnd.choice(letters) for _ in range(rnd.randint(1, 6))
                )
                for _ in range(rnd.randint(1, 8))
            ),
        )
        for i in range(1, n_docs + 1)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    _, merges = bpe_train(df, num_merges=num_merges, min_pair_count=1)
    fold = {
        r["doc_id"]: (r["n_words"], r["n_subwords"], r["subwords_per_word"])
        for r in apply_bpe(df, merges, strategy="fold").collect()
    }
    greedy = {
        r["doc_id"]: (r["n_words"], r["n_subwords"], r["subwords_per_word"])
        for r in apply_bpe(df, merges, strategy="greedy").collect()
    }
    assert fold == greedy


def test_bpe_tokenize_matches_sequential_reference(spark):
    """bpe_tokenize's (pos, subword) stream equals the sequential
    pure-Python replay word by word, and its per-doc counts equal
    apply_bpe's budgets — trained merges, run-heavy tiny alphabet."""
    import random

    from icedb_spark.operators import apply_bpe, bpe_tokenize, bpe_train

    rnd = random.Random(11)
    docs = [
        (
            i,
            " ".join(
                "".join(rnd.choice("abc") for _ in range(rnd.randint(1, 6)))
                for _ in range(rnd.randint(1, 8))
            ),
        )
        for i in range(1, 7)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    _, merges = bpe_train(df, num_merges=6, min_pair_count=1)

    def encode_syms(word):
        syms = list(word)
        for l, r in merges:
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + x
                else:
                    out.append(x)
            syms = out
        return syms

    got: dict = {}
    for r in bpe_tokenize(df, merges).collect():
        got.setdefault(r["doc_id"], []).append((r["pos"], r["subword"]))
    budgets = {
        r["doc_id"]: r["n_subwords"]
        for r in apply_bpe(df, merges).collect()
    }
    for i, t in docs:
        want = [s for w in t.split() for s in encode_syms(w)]
        seq = [s for _, s in sorted(got.get(i, []))]
        assert seq == want, (i, seq, want)
        assert [p for p, _ in sorted(got.get(i, []))] == list(
            range(1, len(want) + 1)
        )
        assert budgets[i] == len(want)


def test_bpe_vocab_and_subword_ids(spark):
    """The dense id vocabulary: alphabet chars first, merge products in
    rank order with first-occurrence-wins dedup; subword_ids maps the
    token stream through it with OOV -> -1."""
    from icedb_spark.operators import (
        bpe_tokenize,
        bpe_vocab,
        subword_ids,
    )

    merges = [("a", "b"), ("ab", "c"), ("a", "b")]  # dup product 'ab'
    vocab = dict(bpe_vocab(merges, alphabet="abc"))
    assert vocab == {"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4}
    df = spark.createDataFrame(
        [(1, "abc ab zq")], "doc_id int, text string"
    )
    toks = bpe_tokenize(df, merges[:2])
    got = {
        (r["pos"], r["subword"]): r["token_id"]
        for r in subword_ids(toks, merges[:2], alphabet="abc").collect()
    }
    # 'abc' -> [abc], 'ab' -> [ab], 'zq' -> [z, q] (OOV chars)
    assert got == {
        (1, "abc"): 4,
        (2, "ab"): 3,
        (3, "z"): -1,
        (4, "q"): -1,
    }, got


def test_bpe_greedy_encoder_at_hundreds_of_merges(spark):
    """At merge counts the fold encoder cannot reach (expression-tree
    ceiling), the greedy encoder still equals the sequential
    pure-Python replay — 400 synthetic single-char merges in
    lexicographic rank order over mixed text."""
    import random

    from icedb_spark.operators import apply_bpe

    chars = "abcdefghijklmnopqrst"
    merges = sorted((l, r) for l in chars for r in chars)[:400]
    rnd = random.Random(7)
    docs = [
        (
            i,
            " ".join(
                "".join(
                    rnd.choice(chars) for _ in range(rnd.randint(1, 12))
                )
                for _ in range(rnd.randint(1, 15))
            ),
        )
        for i in range(1, 31)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in apply_bpe(df, merges).collect()  # auto -> greedy
    }
    for i, t in docs:
        words = t.split()
        assert got[i] == (
            len(words),
            sum(_bpe_encode_py(w, merges) for w in words),
        ), i


@_settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    seed=_st.integers(0, 10**6),
    n_docs=_st.integers(2, 8),
    vocab=_st.integers(2, 4),
    k=_st.integers(2, 3),
    cut=_st.integers(1, 7),
)
def test_substring_index_equals_full_recompute(
    spark, seed, n_docs, vocab, k, cut
):
    """For arbitrary collision-heavy corpora and an arbitrary old/batch
    split, spans-against-the-digest-index equal the full-corpus
    keep-first recompute restricted to batch docs."""
    import random

    from icedb_spark.operators import (
        duplicated_spans,
        duplicated_spans_against_index,
        substring_index_rows,
    )

    rnd = random.Random(seed)
    words = [f"w{j}" for j in range(vocab)]
    rows = [
        (i, " ".join(rnd.choice(words) for _ in range(rnd.randint(k, 12))))
        for i in range(1, n_docs + 1)
    ]
    c = min(cut, n_docs - 1)
    schema = "doc_id long, text string"
    old = spark.createDataFrame(rows[:c], schema)
    batch = spark.createDataFrame(rows[c:], schema)
    inc = {
        tuple(r)
        for r in duplicated_spans_against_index(
            batch, substring_index_rows(old, k=k), k=k
        ).collect()
    }
    batch_ids = {i for i, _ in rows[c:]}
    full = duplicated_spans(
        spark.createDataFrame(rows, schema), k=k, exclude_first=True
    )
    ref = {tuple(r) for r in full.collect() if r["doc_id"] in batch_ids}
    assert inc == ref


@_settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    seed=_st.integers(0, 10**6),
    n_old=_st.integers(1, 6),
    n_batch=_st.integers(2, 8),
    split=_st.integers(1, 6),
)
def test_embedding_index_split_invariance(
    spark, seed, n_old, n_batch, split
):
    """Embedding dedup-against-index is split-invariant and equals the
    full-corpus LSH-pairs recompute restricted to batch ids (buckets
    and 6-dp cosines agree across paths)."""
    import random

    from icedb_spark.operators import (
        embedding_dedup_against_index,
        embedding_dup_pairs_lsh,
        embedding_index_rows,
    )

    rnd = random.Random(seed)
    dim = 8

    def vec():
        return [round(rnd.uniform(-1, 1), 3) or 0.001 for _ in range(dim)]

    old_rows = [(i, vec()) for i in range(1, n_old + 1)]
    batch_rows = []
    for j in range(n_batch):
        vid = 100 + j
        if old_rows and rnd.random() < 0.4:
            batch_rows.append((vid, rnd.choice(old_rows)[1]))
        elif batch_rows and rnd.random() < 0.4:
            batch_rows.append((vid, rnd.choice(batch_rows)[1]))
        else:
            batch_rows.append((vid, vec()))
    schema = "vec_id long, embedding array<double>"
    old = spark.createDataFrame(old_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)
    idx0 = embedding_index_rows(old, dim, n_planes=4)
    oneshot = {
        r["vec_id"]: (r["is_dup"], r["dup_of"])
        for r in embedding_dedup_against_index(
            batch, idx0, dim, n_planes=4
        ).collect()
    }
    cut = min(split, n_batch)
    a = spark.createDataFrame(batch_rows[:cut], schema)
    b = spark.createDataFrame(batch_rows[cut:], schema)
    two = {
        r["vec_id"]: (r["is_dup"], r["dup_of"])
        for r in embedding_dedup_against_index(
            a, idx0, dim, n_planes=4
        ).collect()
    }
    if batch_rows[cut:]:
        idx1 = idx0.unionByName(embedding_index_rows(a, dim, n_planes=4))
        two.update(
            {
                r["vec_id"]: (r["is_dup"], r["dup_of"])
                for r in embedding_dedup_against_index(
                    b, idx1, dim, n_planes=4
                ).collect()
            }
        )
    assert two == oneshot
    # full-corpus LSH pairs restricted to batch: mate = indexed or
    # smaller-id, so the dup set equals pairs with the batch id as the
    # LARGER side (old ids < 100 <= batch ids)
    pairs = embedding_dup_pairs_lsh(
        old.unionByName(batch), dim, n_planes=4
    ).collect()
    batch_ids = [i for i, _ in batch_rows]
    mates: dict = {}
    for r in pairs:
        hi, lo = max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"])
        if hi in set(batch_ids):
            mates.setdefault(hi, []).append(lo)
    for vid in batch_ids:
        want = (
            (True, min(mates[vid])) if vid in mates else (False, None)
        )
        assert oneshot[vid] == want, (vid, oneshot[vid], want)
