"""Unigram-LM tokenizer training (VERDICT r14 #8): the Spark trainer
checked against an INDEPENDENT pure-Python replay and hand-computable
Viterbi semantics — costs are integer micro-nats, so agreement is
exact equality, never tolerance."""

import pytest
from pyspark.sql import functions as F


def test_viterbi_segment_semantics(spark):
    """Hand-checkable DP rules: minimum total cost wins; ties prefer
    the LONGER last piece; missing multi-char pieces fall back to
    single chars; an unsegmentable word (missing char) raises."""
    from data_engineering_bootcamp_spark.operators.unigram import (
        viterbi_segment,
    )

    wf = spark.createDataFrame(
        [("abab", 3), ("ab", 1)], "token string, freq long"
    )
    # 'ab' costs less than a+b (10 < 7+7): 'abab' -> 'ab ab'
    costs = {"a": 7, "b": 7, "ab": 10, "aba": 30}
    got = {r.token: r.seg for r in viterbi_segment(wf, costs).collect()}
    assert got == {"abab": "ab ab", "ab": "ab"}

    # tie: 'ab' == a+b exactly -> longer piece wins
    costs_tie = {"a": 5, "b": 5, "ab": 10}
    got_tie = {
        r.token: r.seg for r in viterbi_segment(wf, costs_tie).collect()
    }
    assert got_tie == {"abab": "ab ab", "ab": "ab"}

    # cheaper singles: 'ab' more expensive than a+b -> chars win
    costs_ch = {"a": 3, "b": 3, "ab": 10}
    got_ch = {
        r.token: r.seg for r in viterbi_segment(wf, costs_ch).collect()
    }
    assert got_ch == {"abab": "a b a b", "ab": "a b"}

    # unsegmentable: 'c' missing from the vocab
    bad = spark.createDataFrame([("ac", 1)], "token string, freq long")
    with pytest.raises(Exception, match="not segmentable"):
        viterbi_segment(bad, {"a": 1}).collect()


def test_unigram_train_matches_python_replay(spark, sf_dir):
    """The full catalog-entry recipe replayed in pure Python from the
    same word table: substring candidates, seed selection, micro-nat
    costs, two Viterbi E-steps, the prune, Laplace re-costing, usage
    shares — exact equality on every output cell."""
    from data_engineering_bootcamp_spark.operators.unigram import (
        unigram_train,
        unigram_train_python,
    )
    from data_engineering_bootcamp_spark.plans.catalog_rank import (
        _tokens,
    )
    from data_engineering_bootcamp_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        _tokens(docs)
        .groupBy(F.col("term").alias("token"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .where((F.length("token") >= 2) & F.col("token").rlike("^[a-z]+$"))
    )
    words = [(r.token, r.freq) for r in wf.collect()]
    want = unigram_train_python(
        words, seed_k=120, vocab_k=96, max_piece_len=4
    )
    got = {
        r.piece: (r.usage, r.share_ppm, r.cost_micro)
        for r in unigram_train(
            wf, seed_k=120, vocab_k=96, max_piece_len=4, lmax=16
        ).collect()
    }
    assert got == want
    # sanity on the fixture: multi-char pieces actually win usage
    assert any(len(p) >= 2 and got[p][0] > 0 for p in got)
    # shares are an exact ppm partition of total usage
    tot = sum(v[0] for v in got.values())
    assert sum(v[1] for v in got.values()) <= 1_000_000
    assert all(
        v[1] == v[0] * 1_000_000 // tot for v in got.values()
    )


def test_unigram_train_guards(spark):
    from data_engineering_bootcamp_spark.operators.unigram import (
        unigram_train,
    )

    empty = spark.createDataFrame([], "token string, freq long")
    with pytest.raises(ValueError, match="empty word table"):
        unigram_train(empty)
    long_word = spark.createDataFrame(
        [("a" * 30, 1)], "token string, freq long"
    )
    with pytest.raises(ValueError, match="exceeds the"):
        unigram_train(long_word, lmax=16)


def test_unigram_encode_matches_replay(spark, sf_dir):
    """The encode twin: segmentations must equal the pure-Python
    Viterbi under the replayed post-prune cost table, and n_pieces
    must count the pieces."""
    from data_engineering_bootcamp_spark.operators.unigram import (
        unigram_encode,
        unigram_train_python,
        viterbi_segment,
    )
    from data_engineering_bootcamp_spark.plans.catalog_rank import (
        _tokens,
    )
    from data_engineering_bootcamp_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        _tokens(docs)
        .groupBy(F.col("term").alias("token"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .where((F.length("token") >= 2) & F.col("token").rlike("^[a-z]+$"))
    )
    words = [(r.token, r.freq) for r in wf.collect()]
    model = unigram_train_python(words)  # {piece: (u, share, cost)}
    cost1 = {p: v[2] for p, v in model.items()}
    want = {
        r.token: r.seg
        for r in viterbi_segment(wf, cost1).collect()
    }
    got = {r.token: (r.encoded, r.n_pieces) for r in
           unigram_encode(wf).collect()}
    assert {t: g[0] for t, g in got.items()} == want
    assert all(g[1] == g[0].count(" ") + 1 for g in got.values())
    # every emitted piece is in the kept vocab
    kept = set(cost1)
    assert all(p in kept for g in got.values() for p in g[0].split(" "))
