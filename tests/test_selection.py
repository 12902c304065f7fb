"""Semantics tests for the data-selection tier (operators/selection.py)
on tiny hand-built frames — the catalog queries cover the oracle
parity; these pin the operator-level contracts."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ndvi_etl_pipeline_spark.operators import selection as SEL


def _bucket_py(word: str, n: int = 64) -> int:
    h = hashlib.md5(word.encode()).hexdigest()
    return (int(h[0], 16) * 16 + int(h[1], 16)) % n


def test_soft_dedup_weights_sum_to_distinct_count(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in SEL.soft_dedup_weights(docs).collect()}
    assert rows[1].cluster_size == 2 and rows[1].weight == 0.5
    assert rows[2].weight == 0.5
    assert rows[3].cluster_size == 1 and rows[3].weight == 1.0
    assert sum(r.weight for r in rows.values()) == 2.0  # == n_distinct


def test_soft_dedup_normalizes_case_and_whitespace(spark):
    docs = spark.createDataFrame(
        [(1, "Alpha Beta"), (2, "  alpha beta  ")], "doc_id bigint, text string"
    )
    rows = SEL.soft_dedup_weights(docs).collect()
    assert all(r.cluster_size == 2 for r in rows)


def test_duplicated_window_stats_finds_planted_run(spark):
    shared = " ".join(f"t{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 one two three"),
            (2, "pre amble " + shared + " tail"),
            (3, " ".join(f"z{i}" for i in range(12))),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in SEL.duplicated_window_stats(docs, window=8).collect()}
    # only the two docs sharing the 8-token run appear (the clean doc
    # has windows but none duplicated, so it is filtered out)
    assert set(out) == {1, 2}
    assert out[1].n_dup_windows == 1 and out[2].n_dup_windows == 1
    assert 0 < out[1].dup_frac <= 1.0


def test_duplicated_token_coverage_unions_overlapping_windows(spark):
    # docs 1 and 2 share a 9-token run → two overlapping dup windows
    # per doc covering 9 distinct positions, not 16
    shared = " ".join(f"t{i}" for i in range(9))
    docs = spark.createDataFrame(
        [(1, shared + " u1 u2 u3"), (2, "p0 " + shared + " q9")],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r
        for r in SEL.duplicated_token_coverage(docs, window=8).collect()
    }
    assert out[1].n_covered == 9 and out[2].n_covered == 9
    assert out[1].n_tokens == 12
    assert out[1].keep_frac == 0.25  # 3 of 12 tokens survive


def test_duplicated_token_coverage_disjoint_and_adjacent_runs(spark):
    """Round-10 sweep edge cases: two dup runs separated by a gap
    larger than the window (disjoint intervals: coverage adds w per
    run) and back-to-back runs (gap == w: still w each, no double
    count). Doc 1 and 2 share run A (tokens a0..a7) and run B
    (b0..b7); doc 1 has 4 unique tokens between them, doc 3 has them
    back-to-back."""
    run_a = " ".join(f"a{i}" for i in range(8))
    run_b = " ".join(f"b{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, f"{run_a} u1 u2 u3 u4 {run_b}"),
            (2, f"{run_a} v1 v2 v3 v4 {run_b}"),
            (3, f"{run_a} {run_b} w1"),
            (4, f"{run_a} {run_b} w2"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r
        for r in SEL.duplicated_token_coverage(docs, window=8).collect()
    }
    # docs 1/2: exactly windows at i=1 (run A) and i=13 (run B) are
    # duplicated -> 8 + 8 = 16 covered of 20 tokens
    assert out[1].n_covered == 16 and out[1].n_tokens == 20
    assert out[1].keep_frac == 0.2
    # docs 3/4 share their full 16-token prefix: windows i=1..9 all
    # duplicated, covering positions 1..16 of 17
    assert out[3].n_covered == 16 and out[3].n_tokens == 17
    assert out[3].keep_frac == round(1.0 - 16 / 17, 4)


def test_duplicated_window_stats_short_docs_have_no_windows(spark):
    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, "only three tokens")],
        "doc_id bigint, text string",
    )
    assert SEL.duplicated_window_stats(docs, window=8).count() == 0


def test_semdedup_removes_exact_duplicate_vector(spark):
    # centroid 0 at e1, centroid 1 at e2; vecs 10/11 identical near e1,
    # vec 12 orthogonal near e2 → one removal in cluster 0, none in 1
    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    emb = spark.createDataFrame(
        [(0, e1), (1, e2), (10, e1), (11, e1), (12, e2)],
        "vec_id bigint, embedding array<double>",
    )
    cents = emb.filter(F.col("vec_id") < 2)
    out = {r.centroid_id: r for r in
           SEL.semdedup_cluster_stats(emb, cents, tau=0.9).collect()}
    assert out[0].n == 3 and out[0].n_removed == 2  # 10 and 11 dup vs 0
    assert out[0].n_kept == 1
    assert out[1].n == 2 and out[1].n_removed == 1  # 12 dup vs 1
    assert sum(r.n for r in out.values()) == 5


def test_dsir_upweights_target_tokens(spark):
    a, b = "alphaword", "betaword"
    assert _bucket_py(a) != _bucket_py(b), "pick non-colliding test tokens"
    rows = [(i, " ".join([a] * 10), "tgt") for i in range(5)]
    rows += [(10 + i, " ".join([b] * 10), "raw") for i in range(5)]
    rows += [(20, " ".join([a] * 10), "raw"), (21, " ".join([b] * 10), "raw")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    w = {
        r.doc_id: r.dsir_logweight
        for r in SEL.dsir_logweights(docs, F.col("source") == "tgt").collect()
    }
    # the all-target-token doc must outscore the never-in-target doc
    assert w[20] > w[21]
    assert w[20] > 0 > w[21]


def test_naive_bayes_separates_disjoint_vocabularies(spark):
    a, b = "englishword", "germanwort"
    assert _bucket_py(a) != _bucket_py(b)
    rows = [(i * 5 + 1, " ".join([a] * 6), "en") for i in range(4)]
    rows += [(i * 5 + 2, " ".join([b] * 6), "de") for i in range(4)]
    rows += [(100, " ".join([a] * 6), "en"), (105, " ".join([b] * 6), "de")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {
        r.doc_id: r
        for r in SEL.naive_bayes_scores(
            docs,
            label_pred=F.col("lang") == "en",
            test_pred=F.col("doc_id") % 5 == 0,
        ).collect()
    }
    assert set(out) == {100, 105}  # only the test split is scored
    assert out[100].actual == 1 and out[100].score > 0
    assert out[105].actual == 0 and out[105].score < 0


def test_trigram_xent_prefers_in_distribution_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en", True),
            (2, "the quick brown fox jumps over the lazy dog", "en", False),
            (3, "zzqxj vvkpw qqjzx wwxqz jjqvv", "en", False),
        ],
        "doc_id bigint, text string, lang string, is_tgt boolean",
    )
    out = {
        r.doc_id: r.xent_nats
        for r in SEL.trigram_xent(docs, F.col("is_tgt")).collect()
    }
    assert out[2] < out[3]  # in-distribution text scores lower xent
    assert out[1] == out[2]  # same text, same score, target or not


def test_semdedup_np_equals_native_path(spark, sf_dir):
    """The per-cluster numpy census must match the relational
    self-join path exactly on real data."""
    from pyspark.sql import functions as F

    from ndvi_etl_pipeline_spark.sources.testdata import load_table

    e = load_table(spark, "embeddings", sf_dir)
    cents = e.filter(F.col("vec_id") < 8)
    a = sorted(map(tuple, SEL.semdedup_cluster_stats(e, cents, tau=0.30).collect()))
    b = sorted(
        map(tuple, SEL.semdedup_cluster_stats_np(e, cents, tau=0.30).collect())
    )
    assert a == b and len(a) > 0


def test_hard_negatives_np_equals_native_path(spark, sf_dir):
    """The Arrow/numpy hard-negative kernel must match the native
    zip_with/aggregate path bit for bit (the brute_force_topk_np
    equality discipline)."""
    from pyspark.sql import functions as F

    from ndvi_etl_pipeline_spark.sources.testdata import load_table

    e = load_table(spark, "embeddings", sf_dir)
    corpus = e.filter(F.col("vec_id") >= 10)
    queries = e.filter(F.col("vec_id") < 10)
    a = sorted(
        map(tuple, SEL.hard_negatives(corpus, queries, k=5).collect())
    )
    b = sorted(
        map(tuple, SEL.hard_negatives_np(corpus, queries, k=5).collect())
    )
    assert a == b and len(a) > 0


def test_token_bucket_matches_reference_hash(spark):
    words = ["alpha", "beta", "gamma", "Ψ-unicode"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: r.b
        for r in df.select("w", SEL.token_bucket("w").alias("b")).collect()
    }
    for w in words:
        assert got[w] == _bucket_py(w)


@settings(max_examples=8, deadline=None)
@given(
    n_docs=st.integers(min_value=2, max_value=12),
    doc_len=st.integers(min_value=8, max_value=30),
    vocab=st.integers(min_value=2, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_exact_substring_census_and_coverage_agree(
    spark, n_docs, doc_len, vocab, seed
):
    """On any corpus (tiny vocab forces window collisions), the
    duplication census and the removal coverage must agree: same doc
    set, and for every flagged doc the interval-union coverage is
    bounded by [max(window, n_dup_windows), min(n_tokens,
    n_dup_windows * window)] — k distinct starts cover at least k
    positions (the starts themselves) and at most k·w."""
    import numpy as np

    W = 8
    rng = np.random.RandomState(seed)
    rows = [
        (i, " ".join(f"w{rng.randint(vocab)}" for _ in range(doc_len)))
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    census = {
        r.doc_id: r for r in SEL.duplicated_window_stats(docs, window=W).collect()
    }
    cover = {
        r.doc_id: r for r in SEL.duplicated_token_coverage(docs, window=W).collect()
    }
    assert set(census) == set(cover)
    for did, c in census.items():
        v = cover[did]
        assert v.n_tokens == doc_len
        assert c.n_windows == doc_len - W + 1
        k = c.n_dup_windows
        assert max(W, k) <= v.n_covered <= min(v.n_tokens, k * W)
        assert v.keep_frac == round(1.0 - v.n_covered / v.n_tokens, 4)


def test_bpe_merges_tiny_corpus_trajectory(spark):
    # corpus: 'aaab' x3, 'ab' x1 → round 1 pair counts (overlapping
    # positions both count, the classic get_stats semantics):
    # (a,a): 2 per 'aaab' x3 = 6; (a,b): 3+1 = 4; (b,</w>): 3+1 = 4
    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "aaab ab")], "doc_id bigint, text string"
    )
    m = SEL.bpe_merges(docs, n_merges=2).collect()
    assert (m[0].lhs, m[0].rhs, m[0].pair_count) == ("a", "a", 6)
    # round 2 vocab: aaab=[aa,a,b,</w>] cnt3, ab=[a,b,</w>] cnt1 →
    # (aa,a)=3, (a,b)=4, (b,</w>)=4 → tie broken lhs ASC → (a,b)
    assert (m[1].lhs, m[1].rhs, m[1].pair_count) == ("a", "b", 4)


def test_bpe_fold_is_greedy_left_to_right(spark):
    # 'aaaa' under merge (a,a) must become [aa,aa], not [aa,a,a]
    docs = spark.createDataFrame([(1, "aaaa aaaa aa")], "doc_id bigint, text string")
    m = SEL.bpe_merges(docs, n_merges=2).collect()
    assert (m[0].lhs, m[0].rhs) == ("a", "a")
    # after round 1: aaaa→[aa,aa,</w>] (x2 occurrences), aa→[aa,</w>]
    # round 2 pairs: (aa,aa):2, (aa,</w>):3 → argmax (aa,</w>)
    assert (m[1].lhs, m[1].rhs, m[1].pair_count) == ("aa", "</w>", 3)


def test_bpe_token_stats_fertility(spark):
    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id bigint, text string")
    # 0 merges impossible via n_merges>=1; with 1 merge the top pair
    # (a,b) c=2 merges ab→[ab,</w>]: doc = 2*2 + 3 = 7 bpe tokens / 3 words
    r = SEL.bpe_token_stats(docs, n_merges=1).collect()[0]
    assert r.n_words == 3
    assert r.n_bpe_tokens == 2 * 2 + 3
    assert abs(r.fertility - round(7 / 3, 6)) < 1e-9


def test_gopher_repetition_stats_hand_computed(spark):
    # doc: 'x y x y z' (9 chars). 2-grams: 'x y'(2), 'y x'(1), 'y z'(1)
    # top2 = 2*3/9; dup-ns all 0 (no n>=5 grams repeat; doc has 4..1 grams)
    docs = spark.createDataFrame([(1, "x y x y z")], "doc_id bigint, text string")
    r = SEL.gopher_repetition_stats(docs).collect()[0]
    assert r.total_chars == 9
    assert abs(r.top2_frac - round(6 / 9, 6)) < 1e-9
    assert r.dup5_frac == 0.0 and r.dup10_frac == 0.0
    # 5-token doc has one 5-gram (count 1, not duplicated)


def test_dup_segment_stats_within_doc_only(spark):
    # doc1: segments [a b][a b] duplicated; doc2: same segment once —
    # cross-doc repeats must NOT count
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c d")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in SEL.dup_segment_stats(docs, seg_len=2).collect()}
    assert rows[1].n_segments == 2 and rows[1].dup_segments == 2
    assert rows[1].dup_seg_frac == 1.0
    assert rows[2].dup_segments == 0 and rows[2].dup_seg_frac == 0.0


def test_unigram_em_matches_hand_trajectory(spark):
    """Unigram Viterbi-EM on a corpus small enough to trace by hand:
    the dominant word segments as one piece once the seed puts it in
    the vocab, EM counts are word-frequency-weighted, and every
    single char stays alive via add-one smoothing."""
    from ndvi_etl_pipeline_spark.operators.selection import (
        unigram_em_pieces,
        unigram_words,
    )

    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab ab"), (2, "aaab ab ab b")],
        "doc_id int, text string",
    )
    words = unigram_words(docs)  # aaab×4, ab×3 (len-1 'b' excluded)
    got = {r.piece: (r.em_cnt, r.logp) for r in
           unigram_em_pieces(words, vocab_size=6, n_iters=2).collect()}
    # seed: chars {a, b} + top-4 multi by (cnt desc, piece asc)
    assert set(got) == {"a", "b", "aa", "aaa", "aaab", "ab"}
    # Viterbi with count-seeded probs segments aaab -> [aaab], ab -> [ab]
    assert got["aaab"][0] == 4 and got["ab"][0] == 3
    assert got["a"][0] == 0 and got["b"][0] == 0  # smoothed, not dropped
    # logp reflects add-one smoothing over em totals: ln(c+1)-ln(tot+|V|)
    import math
    tot, V = 4 + 3, 6
    assert got["aaab"][1] == float(f"{math.log(5) - math.log(tot + V):.9f}")


def test_unigram_token_stats_char_fallback(spark):
    """Serving: trained words use their Viterbi piece count; words
    outside the 2..max_word_len training band count 1 piece/char."""
    from ndvi_etl_pipeline_spark.operators.selection import unigram_token_stats

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab x"), (2, "supercalifragilistic ab")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in unigram_token_stats(docs, vocab_size=6).collect()}
    # doc 1: aaab=1 piece ×2, ab=1, x untrained (len 1) -> 1 char
    assert (got[1].n_words, got[1].n_unigram_pieces) == (4, 4)
    # doc 2: 20-char word exceeds max_word_len=12 -> 20 char pieces
    assert (got[2].n_words, got[2].n_unigram_pieces) == (2, 21)
    assert got[2].fertility == 10.5
