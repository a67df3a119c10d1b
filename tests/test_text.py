

"""Gopher-style quality rule battery (operators/text.gopher_signals)."""


def test_gopher_signals_rules(spark):
    from anndb_spark.operators.text import gopher_signals

    rows = [
        # 6 words, all alpha, stopwords 'the','of', mean len ok
        (1, "the quick brown fox of doom"),
        # symbol-heavy: '#' per word ratio > 0.1
        (2, "the # # # # of # # code"),
        # numeric words: alpha fraction low
        (3, "the 1 2 3 4 5 6 7 8 of"),
        # one-letter words: mean word length < 3
        (4, "the a b c d e f g h of"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["id"]: r
        for r in gopher_signals(df, min_words=5, max_words=100).collect()
    }
    assert out[1]["passes_gopher"]
    assert not out[2]["passes_gopher"] and out[2]["symbol_word_ratio"] > 0.1
    assert not out[3]["passes_gopher"] and out[3]["alpha_word_frac"] < 0.8
    assert not out[4]["passes_gopher"] and out[4]["mean_word_len"] < 3.0
    assert out[1]["n_stopwords"] == 2

    # word-count bounds
    few = gopher_signals(df, min_words=7).collect()
    assert not any(r["passes_gopher"] for r in few if r["id"] == 1)


def test_unigram_logprob_determinism_and_ranking(spark):
    from anndb_spark.operators.text import unigram_logprob

    rows = [(i, "the common words appear here " * 3) for i in range(20)]
    rows.append((99, "zxqv jkwp mmntr qqrsk altogether rare"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["id"]: r for r in unigram_logprob(df).collect()}
    # the outlier document is less corpus-typical than any common doc
    assert all(
        out[99]["mean_logprob"] < out[i]["mean_logprob"] for i in range(20)
    )
    # bit-identical under a different partitioning (pinned fold order)
    out2 = {
        r["id"]: r
        for r in unigram_logprob(df.repartition(13, "text")).collect()
    }
    assert all(
        out[k]["sum_logprob"] == out2[k]["sum_logprob"] for k in out
    )
