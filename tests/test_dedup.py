"""Dedup correctness at sf0.001: MinHash-LSH survivors vs brute force
(SURVEY §2.2 D2 'engine test vs brute-force Jaccard on sf0.001'),
SimHash properties, exact dedup."""

import pytest

import itertools

from pyspark.sql import functions as F

from cdc2vec_spark.operators import dedup


def _brute_force_pairs(spark, sf_dir, threshold):
    """Driver-side brute force over the derived corpus (sf0.001 only)."""
    corpus = dedup.shingle(dedup.neardup_corpus(spark, sf_dir))
    rows = corpus.select("doc_id", "shingles").collect()
    docs = {r["doc_id"]: frozenset(r["shingles"]) for r in rows}
    out = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        sa, sb = docs[a], docs[b]
        if not sa and not sb:
            continue
        jac = len(sa & sb) / len(sa | sb)
        # keep unrounded; Spark rounds HALF_UP, python rounds half-even
        if round(jac, 4) >= threshold - 1e-9:
            out[(a, b)] = jac
    return out


def test_minhash_lsh_vs_brute_force(spark, sf_dir):
    brute = _brute_force_pairs(spark, sf_dir, 0.5)
    corpus = dedup.shingle(dedup.neardup_corpus(spark, sf_dir))
    got = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in dedup.minhash_neardup(corpus, threshold=0.5).collect()
    }
    # precision is exact (verify join): every survivor is a true pair
    for pair, jac in got.items():
        assert pair in brute and abs(brute[pair] - jac) < 1e-4
    # recall: every high-similarity pair must be found (16 bands × 4 rows
    # → P(miss | jac=0.8) < 1e-4)
    high = {p for p, j in brute.items() if j >= 0.8}
    assert high and high <= set(got)
    # overall recall sanity on the 0.5 band
    assert len(got) >= 0.6 * len(brute)


def test_simhash_neardup_finds_truncated_copies(spark, sf_dir):
    corpus = dedup.neardup_corpus(spark, sf_dir)
    pairs = dedup.simhash_neardup(corpus, max_hamming=6)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # truncated copies (doc_id, doc_id+1e6) are near-identical token sets →
    # most must fall within hamming 6
    n_docs = corpus.count() // 2
    copies = {(i, i + 1000000) for i in range(n_docs)}
    hit = len(found & copies)
    assert hit >= 0.5 * n_docs
    # determinism
    found2 = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert found == found2


def test_exact_dedup_keeps_one_per_text(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], "id long, text string"
    )
    out = dedup.exact_dedup(df)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_shingle_hashes_edge_cases(spark):
    """None text → [], short text (<n tokens) → [], hashes sorted/distinct."""
    df = spark.createDataFrame(
        [(1, None), (2, "one two"), (3, "a b c d a b c d"), (4, "x y z")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["sh"] for r in dedup.shingle_hashes(df).collect()}
    assert rows[1] == [] and rows[2] == []
    assert rows[3] == sorted(set(rows[3]))  # distinct + sorted
    assert len(rows[3]) == 4  # 6 grams, 2 repeats of the a-b-c / b-c-d pattern
    assert len(rows[4]) == 1


def test_minhash_and_jaccard_empty_corpus(spark):
    """No doc has >= 3 tokens → every stage yields empty, no crash."""
    df = spark.createDataFrame(
        [(1, "hi", "s"), (2, "yo", "s")], "doc_id long, text string, source string"
    )
    assert dedup.minhash_neardup(df, 0.5, cache=False).count() == 0
    assert dedup.jaccard_pairs(df, "source", "doc_id", 0.5).count() == 0


def test_connected_components_vs_union_find(spark):
    """Spark label propagation ≡ classic union-find on a multi-cluster,
    chain-shaped edge set (chains force >1 propagation round)."""
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (4, 5)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()}

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert got == want
    assert got[5] == 1 and got[22] == 20  # chains collapsed to min id


@pytest.mark.slow
def test_keep_canonical_on_derived_corpus(spark, sf_dir):
    """End-to-end: corpus + its minhash pairs → one survivor per cluster;
    every truncated copy (doc_id+1M) whose pair was found is dropped."""
    corpus = dedup.neardup_corpus(spark, sf_dir)
    pairs = dedup.minhash_neardup(corpus, threshold=0.5, cache=False)
    kept = dedup.keep_canonical(corpus, pairs)
    n_before, n_after = corpus.count(), kept.count()
    from pyspark.sql import functions as F

    comp = dedup.connected_components(pairs)
    n_losers = comp.where(F.col("id") != F.col("comp")).count()
    assert n_losers > 0
    assert n_after == n_before - n_losers  # exactly the non-canonical members dropped
    # id_b of any pair is always a loser (comp = min id <= id_a < id_b)
    assert kept.join(pairs, kept.doc_id == pairs.id_b, "inner").count() == 0


def test_connected_components_long_chain(spark):
    """A 60-node path (diameter 60 >> rounds) must still collapse to one
    component — pointer jumping compresses chains exponentially."""
    edges = [(i, i + 1) for i in range(60)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in dedup.connected_components(pairs, max_iter=12).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 61


def _boilerplate_corpus(spark, n_docs=1000):
    """n_docs documents, each = 6 unique tokens + a shared boilerplate
    sentence (the web-corpus license-header pattern): every doc pair
    shares the boilerplate shingles, so the uncapped inverted index goes
    quadratic (~n²/2 candidate pairs). Two planted true near-dups
    (9000/9001, 9002/9003) share most of their UNIQUE content and must
    survive any cap."""
    rows = []
    boiler = "all rights reserved licensed under the apache license version two point zero"
    for i in range(n_docs):
        rows.append((i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f {boiler}"))
    # 16 shared unique tokens + 1 differing: over the retained
    # (non-stop) shingle space that is 14 shared / 3 unique-per-doc
    # 3-grams → Jaccard 14/20 = 0.7
    na = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi omicron pi"
    nb = "rho sigma tau upsilon phi chi psi omega aleph bet gimel dalet he waw zayin het"
    rows.append((9000, f"{na} one {boiler}"))
    rows.append((9001, f"{na} two {boiler}"))
    rows.append((9002, f"{nb} three {boiler}"))
    rows.append((9003, f"{nb} four {boiler}"))
    return spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "source", F.lit("web")
    )


def test_jaccard_max_df_bounds_boilerplate(spark):
    """VERDICT r07 ask #4 (exact path): with max_df set, a 1000-doc
    boilerplate shingle no longer drives the candidate set quadratic,
    and recall on the true near-dup pairs is unchanged."""
    corpus = _boilerplate_corpus(spark)
    # threshold→0 turns the output into the full candidate set (every
    # pair sharing ≥1 retained shingle), making the blowup observable
    capped_all = dedup.jaccard_pairs(
        corpus, "source", "doc_id", 0.0001, max_df=50
    )
    n_capped = capped_all.count()
    # uncapped, the boilerplate shingles pair every doc with every other:
    # ~1004·1003/2 ≈ 503k candidates. Capped, only genuinely-overlapping
    # pairs remain — bounded far below quadratic.
    assert n_capped < 1000, n_capped
    # recall: both planted near-dup pairs survive the cap with high
    # similarity over the retained (non-stop) shingle space
    got = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in dedup.jaccard_pairs(
            corpus, "source", "doc_id", 0.5, max_df=50
        ).collect()
    }
    assert (9000, 9001) in got and (9002, 9003) in got
    assert got[(9000, 9001)] >= 0.5 and got[(9002, 9003)] >= 0.5
    # sanity on the uncapped quadratic count (the hazard being guarded)
    n_uncapped = dedup.jaccard_pairs(corpus, "source", "doc_id", 0.0001).count()
    assert n_uncapped > 500000, n_uncapped


def test_jaccard_sizes_broadcast_gate_is_layout_only(spark, monkeypatch):
    """Round 15: the per-doc sizes broadcast hint is gated on the
    materialized postings count (ADVICE r14 — never an unconditional
    O(corpus) broadcast). The gate decides join STRATEGY only: forcing
    it off (bound 0 → AQE/shuffle path, the 100 TB arm) must produce
    the exact same pair set and jaccard values as the default-on arm."""
    corpus = _boilerplate_corpus(spark, n_docs=120)
    want = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in dedup.jaccard_pairs(
            corpus, "source", "doc_id", 0.5, max_df=50
        ).collect()
    }
    assert want, "fixture must produce at least the planted pairs"
    monkeypatch.setattr(dedup, "_BROADCAST_SIZES_MAX_POSTINGS", 0)
    got = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in dedup.jaccard_pairs(
            corpus, "source", "doc_id", 0.5, max_df=50
        ).collect()
    }
    assert got == want


@pytest.mark.slow
def test_lsh_max_bucket_bounds_duplicate_cluster(spark):
    """VERDICT r07 ask #4 (LSH path): a 1000-copy exact-duplicate
    cluster collides in EVERY band; max_bucket drops those oversized
    buckets so candidates stay bounded, while true near-dup pairs (small
    buckets) keep colliding."""
    rows = [(i, "the same boilerplate document repeated verbatim in every copy of the corpus") for i in range(1000)]
    rows.append((9000, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"))
    rows.append((9001, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam nu"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(dedup.shingle_hashes(corpus))
    uncapped = dedup.lsh_candidate_pairs(sigs).count()
    assert uncapped > 490000, uncapped  # the quadratic hazard: ~1000²/2
    capped = dedup.lsh_candidate_pairs(sigs, max_bucket=20)
    n_capped = capped.count()
    assert n_capped < 1000, n_capped
    cand = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (9000, 9001) in cand  # true near-dup pair still surfaces
    # end-to-end: verify-join output under the cap keeps the true pair
    out = dedup.minhash_neardup(corpus, threshold=0.5, max_bucket=20)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (9000, 9001) in got


def test_d2_canonical_entries_capped_and_oracle_mirrored(spark, sf_dir):
    """Round 9: the hot-bucket caps are DEFAULT-ON in the canonical
    entries. d2_blocked_jaccard must hash-match its df-capped mirrored
    oracle at two SFs, and the capped d2_minhash_lsh must keep exact
    precision and high-band recall vs brute force."""
    from oracle_check import compare_one, duckdb_conn

    con = duckdb_conn(sf_dir)
    problems = compare_one(
        spark, con, "d2_blocked_jaccard", dedup.d2_blocked_jaccard,
        dedup.ORACLES["d2_blocked_jaccard"], sf_dir,
    )
    assert not problems, problems

    brute = _brute_force_pairs(spark, sf_dir, 0.5)
    got = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in dedup.d2_minhash_lsh(spark, sf_dir).collect()
    }
    for pair, jac in got.items():  # precision exact under the cap
        assert pair in brute and abs(brute[pair] - jac) < 1e-4
    high = {p for p, j in brute.items() if j >= 0.8}
    assert high and high <= set(got)  # the cap must not cost true dups
    assert len(got) >= 0.6 * len(brute)


def test_d9_keep_exact_matches_duckdb_oracle(spark):
    """Round-10 addition: the survivor-selection anchor — exact
    blocked-Jaccard pairs → connected components → keep-min-id — vs the
    recursive-CTE reachability-closure oracle, at two SFs. Hash-checks
    connected_components' label semantics, not just the pair set."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators.dedup import _D9_EXACT_ORACLE, d9_keep_exact
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d9_keep_exact", d9_keep_exact, _D9_EXACT_ORACLE, sf
        )
        assert not problems, (sf, problems)


def test_d40_incremental_dedup_matches_duckdb_oracle(spark):
    """Round-10 addition: new-vs-corpus asymmetric dedup vs the
    identical corpus-df-capped Jaccard + best-match oracle, at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators.dedup import (
        _D40_ORACLE,
        d40_incremental_dedup,
    )
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d40_incremental_dedup", d40_incremental_dedup,
            _D40_ORACLE, sf,
        )
        assert not problems, (sf, problems)


def test_incremental_dedup_semantics(spark):
    """Hand-built case: a verbatim copy resolves to its origin with
    jac 1.0; a disjoint doc is unique; the best match (not just any
    match) wins; every new doc gets exactly one verdict row."""
    from cdc2vec_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven"),
         (3, "alpha beta gamma delta nine ten")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),   # = doc 1
         (11, "totally unrelated words here now yes"),  # unique
         (12, "alpha beta gamma delta nine ten extra")],  # closest to 3
        "doc_id long, text string",
    )
    rows = {r["new_id"]: r for r in incremental_dedup(new, corpus, threshold=0.3).collect()}
    assert len(rows) == 3
    assert rows[10]["is_dup"] and rows[10]["dup_of"] == 1 and rows[10]["jac"] == 1.0
    assert not rows[11]["is_dup"] and rows[11]["dup_of"] is None
    assert rows[12]["is_dup"] and rows[12]["dup_of"] == 3


@pytest.mark.slow
def test_incremental_dedup_randomized_matches_python_reference(spark):
    """Fixed-seed fuzz: random small corpora (dups, near-dups, short
    docs below the shingle width, ties) — incremental_dedup must equal
    a brute-force python Jaccard + best-match reference (caps off)."""
    import random

    from cdc2vec_spark.operators.dedup import incremental_dedup

    def grams(text):
        toks = text.split(" ")
        if len(toks) < 3:
            return set()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    vocab = ["a", "b", "c", "d", "e"]
    for seed in (5, 17):
        rng = random.Random(seed)

        def doc():
            return " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 12)))

        corpus = [(i, doc()) for i in range(12)]
        new = [(100 + i, doc()) for i in range(8)]
        new.append((200, corpus[0][1]))           # verbatim corpus copy
        new.append((201, "x"))                    # below shingle width

        want = {}
        for nid, nt in new:
            ng = grams(nt)
            best = None
            for oid, ot in corpus:
                og = grams(ot)
                union = len(ng) + len(og) - len(ng & og)
                if union == 0 or not (ng & og):
                    continue
                jac = round(len(ng & og) / union, 4)
                if jac >= 0.5 and (best is None or (-jac, oid) < (-best[1], best[0])):
                    best = (oid, jac)
            want[nid] = best

        cdf = spark.createDataFrame(corpus, "doc_id long, text string")
        ndf = spark.createDataFrame(new, "doc_id long, text string")
        got = {
            r["new_id"]: (r["dup_of"], r["jac"]) if r["is_dup"] else None
            for r in incremental_dedup(ndf, cdf, threshold=0.5, max_df=None).collect()
        }
        assert set(got) == {nid for nid, _ in new}
        assert got == want, (seed, {k: (got.get(k), want.get(k)) for k in want if got.get(k) != want.get(k)})


def test_d46_dedup_clusters_matches_duckdb_oracle(spark):
    """Round-10 addition: the duplicate-cluster size histogram vs the
    recursive-CTE labels aggregated identically, at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators.dedup import _D46_ORACLE, d46_dedup_clusters
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d46_dedup_clusters", d46_dedup_clusters, _D46_ORACLE, sf
        )
        assert not problems, (sf, problems)


def test_cluster_size_histogram_hand_built(spark):
    """Chain of 3 + pair + 2 singletons: histogram {1:2, 2:1, 3:1}, and
    the total mass equals the corpus size."""
    corpus = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r["cluster_size"]: r["n_clusters"]
        for r in dedup.cluster_size_histogram(corpus, pairs).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1}
    assert sum(size * n for size, n in got.items()) == 7


def test_d48_cluster_split_matches_duckdb_oracle(spark):
    """Round-10 addition: near-dup-aware split vs the recursive-CTE
    labels + md5-prefix rule, at two SFs."""
    from oracle_check import compare_one, duckdb_conn

    from cdc2vec_spark.operators.dedup import _D48_ORACLE, d48_cluster_split
    from tests.conftest import SF0001, SF001

    for sf in (SF0001, SF001):
        con = duckdb_conn(sf)
        problems = compare_one(
            spark, con, "d48_cluster_split", d48_cluster_split, _D48_ORACLE, sf
        )
        assert not problems, (sf, problems)


def test_cluster_split_no_leakage(spark):
    """THE invariant the operator exists for: no pair of near-dups may
    straddle the split; every cluster member shares its rep's split."""
    corpus = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 30)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (7, 8), (8, 9), (9, 10), (12, 13)],
        "id_a long, id_b long",
    )
    out = {r["doc_id"]: r for r in dedup.cluster_split(corpus, pairs).collect()}
    for a, b in [(1, 2), (2, 3), (4, 5), (7, 8), (8, 9), (9, 10), (12, 13)]:
        assert out[a]["split"] == out[b]["split"], (a, b)
        assert out[a]["group_key"] == out[b]["group_key"]
    # clustered docs carry the min-id representative; singletons themselves
    assert out[3]["group_key"] == 1 and out[10]["group_key"] == 7
    assert out[20]["group_key"] == 20
    assert set(out) == set(range(1, 30))


def test_cluster_split_append_stable(spark):
    """Adding unrelated docs must not move existing assignments (the
    md5 rule keys on the cluster rep, not on corpus statistics)."""
    corpus1 = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 10)], "doc_id long, text string"
    )
    corpus2 = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 20)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    a = {r["doc_id"]: r["split"] for r in dedup.cluster_split(corpus1, pairs).collect()}
    b = {r["doc_id"]: r["split"] for r in dedup.cluster_split(corpus2, pairs).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_aqe_pin_nested_and_concurrent_restore(spark):
    """Round 14 (ADVICE r13 #2): the scoped AQE pin is lock-guarded and
    nest-safe — overlapping pinned sections serialize, nesting restores
    the OUTERMOST saved value, and the session conf always ends where it
    started even when two threads race."""
    import threading

    from cdc2vec_spark.operators.dedup import _aqe_pinned_off

    key = "spark.sql.adaptive.enabled"
    saved = spark.conf.get(key)
    spark.conf.set(key, "true")
    try:
        # nesting: inner exit must NOT restore early
        with _aqe_pinned_off(spark):
            assert spark.conf.get(key) == "false"
            with _aqe_pinned_off(spark):
                assert spark.conf.get(key) == "false"
            assert spark.conf.get(key) == "false"
        assert spark.conf.get(key) == "true"

        # two racing threads: each sees AQE off inside its own scope and
        # the final state is the original value, never a stale "false"
        errs = []

        def work():
            try:
                for _ in range(25):
                    with _aqe_pinned_off(spark):
                        assert spark.conf.get(key) == "false"
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=work) for _ in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, saved)


def test_gram_hash_memo_pure_and_capped():
    """Round 14 (guide §4.5): the per-worker gram→hash memo is a pure
    cache — cold, warm and past-cap paths must return bit-identical
    sorted hashes, and the dict must never grow past its cap."""
    saved_memo = dict(dedup._GRAM_HASH_MEMO)
    saved_cap = dedup._GRAM_HASH_MEMO_CAP
    text = "a b c a b c d e f a b"
    try:
        dedup._GRAM_HASH_MEMO.clear()
        cold = dedup._gram_hashes(text, 3)
        assert cold and cold == sorted(cold) and len(set(cold)) == len(cold)
        warm = dedup._gram_hashes(text, 3)  # every gram is a memo hit
        assert warm == cold
        # past-cap degradation: values identical, no inserts ever happen
        dedup._GRAM_HASH_MEMO.clear()
        dedup._GRAM_HASH_MEMO_CAP = 0
        assert dedup._gram_hashes(text, 3) == cold
        assert dedup._GRAM_HASH_MEMO == {}
        # boundary: cap reached mid-document → partial insert, same values
        dedup._GRAM_HASH_MEMO_CAP = 2
        assert dedup._gram_hashes(text, 3) == cold
        assert len(dedup._GRAM_HASH_MEMO) == 2
    finally:
        dedup._GRAM_HASH_MEMO_CAP = saved_cap
        dedup._GRAM_HASH_MEMO.clear()
        dedup._GRAM_HASH_MEMO.update(saved_memo)
