"""Unit tests for the training-data hygiene operators: repetition signals,
decontamination, PII scrub, mixture sampling."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from quantms_utils_spark.operators.text import (
    decontaminate,
    mixture_sample,
    pii_counts,
    pii_redact,
    repetition_signals,
    word_ngrams,
    normalized_tokens,
)


def test_repetition_signals_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one word repeated 4x
            (2, "a b c d"),          # all distinct
            (3, "x"),                # single word: no 2-grams
            (4, "  "),               # blank: zeroed signals (round 9)
            (5, None),               # NULL text: zeroed signals too
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_signals(df, "doc_id", "text").collect()
    }
    # round 9: "for each document" means EVERY document — blank/NULL-text
    # docs emit zeroed rows instead of silently vanishing (the family's
    # remove_duplicate_spans already emits a row per doc)
    assert set(rows) == {1, 2, 3, 4, 5}
    for blank in (4, 5):
        assert rows[blank]["n_words"] == 0
        assert rows[blank]["dup_word_frac"] == 0.0
        assert rows[blank]["top_word_frac"] == 0.0
        assert rows[blank]["dup_ngram_frac"] == 0.0
    assert rows[1]["n_words"] == 4
    assert rows[1]["dup_word_frac"] == 0.75
    assert rows[1]["top_word_frac"] == 1.0
    # "a a" 2-gram occurs 3 times, 1 distinct -> (3-1)/3
    assert rows[1]["dup_ngram_frac"] == round(2 / 3, 4)
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["top_word_frac"] == 0.25
    assert rows[2]["dup_ngram_frac"] == 0.0
    # single-token doc: gram side is null -> 0.0, not null/NaN
    assert rows[3]["dup_ngram_frac"] == 0.0


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",)], "t string")
    out = df.select(
        word_ngrams(normalized_tokens(F.col("t")), 3).alias("g")
    ).collect()[0]["g"]
    assert out == []


def test_decontaminate_flags_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words entirely here now"),
            (3, "hi"),  # shorter than n tokens -> zero overlap, still output
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in decontaminate(train, bench, "doc_id", "text", ngram_n=5).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1]["contaminated"] and rows[1]["n_overlap"] == 1
    assert not rows[2]["contaminated"] and rows[2]["n_overlap"] == 0
    assert not rows[3]["contaminated"]


def test_decontaminate_broadcasts_benchmark(spark):
    train = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([(2, "a b c d e")], "doc_id long, text string")
    plan = decontaminate(train, bench, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_pii_redact_and_counts(spark):
    df = spark.createDataFrame(
        [("mail bob@x.org or 555-123-4567 at 10.0.0.1 end",)], "t string"
    )
    c = pii_counts(F.col("t"))
    row = df.select(
        c["n_emails"].alias("e"),
        c["n_phones"].alias("p"),
        c["n_ipv4"].alias("i"),
        pii_redact(F.col("t")).alias("red"),
    ).collect()[0]
    assert (row["e"], row["p"], row["i"]) == (1, 1, 1)
    assert row["red"] == "mail <EMAIL> or <PHONE> at <IP> end"


def test_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([("no pii here at all",)], "t string")
    row = df.select(pii_redact(F.col("t")).alias("red")).collect()[0]
    assert row["red"] == "no pii here at all"


def test_mixture_sample_respects_budget_and_determinism(spark):
    rows = [(i, f"g{i % 2}", "w " * 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mixture_sample(df, "source", "doc_id", "text", tokens_per_group=200)
    pdf = out.toPandas()
    # rate = 200 / (100 docs * 10 tokens) = 0.2 -> roughly 20 docs per group
    assert set(pdf["keep_rate"].round(6)) == {0.2}
    per_group = pdf.groupby("source").size()
    assert all(5 <= n <= 40 for n in per_group)
    # deterministic: second run keeps the identical doc set
    pdf2 = out.toPandas()
    assert sorted(pdf["doc_id"]) == sorted(pdf2["doc_id"])


def test_mixture_sample_keeps_all_under_budget(spark):
    df = spark.createDataFrame(
        [(1, "g", "a b c"), (2, "g", "d e")], "doc_id long, source string, text string"
    )
    out = mixture_sample(df, "source", "doc_id", "text", tokens_per_group=1000)
    assert out.count() == 2
    assert out.select("keep_rate").distinct().collect()[0][0] == 1.0


def test_pack_sequences_fills_bins_contiguously(spark):
    from quantms_utils_spark.operators.text import pack_sequences

    rows = [(i, "g", " ".join(["w"] * 10)) for i in range(10)]  # 10 tokens each
    rows.append((99, "g", "   "))  # blank doc: 0 tokens, never spans
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, "source", "doc_id", "text", seq_len=32).collect()}
    # doc i starts at offset 10*i; bins of 32 tokens
    for i in range(10):
        assert out[i]["offset"] == 10 * i
        assert out[i]["bin"] == (10 * i) // 32
    # doc 3 occupies tokens 30..39 -> crosses the 32-token boundary
    assert out[3]["spans_boundary"] is True
    assert out[0]["spans_boundary"] is False
    assert out[99]["doc_tokens"] == 0 and out[99]["spans_boundary"] is False


# --- sliding-window chunking -------------------------------------------------


def test_chunk_documents_windows(spark):
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
            Row(doc_id=2, text="a b c"),
            Row(doc_id=3, text="   "),
        ]
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=4, overlap=1
        ).collect()
    }
    # 10 tokens, stride 3 → starts 1, 4, 7; last window covers the tail
    assert {k for k in rows} == {(1, 1), (1, 2), (1, 3), (2, 1)}
    assert rows[(1, 1)]["chunk_text"] == "t1 t2 t3 t4"
    assert rows[(1, 2)]["chunk_text"] == "t4 t5 t6 t7"
    assert rows[(1, 3)]["chunk_text"] == "t7 t8 t9 t10"
    assert rows[(1, 3)]["n_tokens"] == 4
    assert rows[(2, 1)]["chunk_text"] == "a b c"
    assert rows[(2, 1)]["n_tokens"] == 3


def test_chunk_documents_exact_multiple_no_runt(spark):
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import chunk_documents

    # n == chunk → exactly one window, no empty trailing chunk
    df = spark.createDataFrame([Row(doc_id=1, text="a b c d")])
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=2)
    assert out.count() == 1


def test_chunk_documents_overlap_validation(spark):
    import pytest
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import chunk_documents

    df = spark.createDataFrame([Row(doc_id=1, text="a")])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


# --- BPE merge induction -----------------------------------------------------


def test_bpe_merges_classic_corpus(spark):
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import bpe_merges

    # Sennrich et al. running example: es → est → lo → low
    corpus = spark.createDataFrame(
        [
            Row(
                text=" ".join(
                    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
                )
            )
        ]
    )
    got = [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in bpe_merges(corpus, "text", n_merges=4).collect()
    ]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
    ]


def test_merge_pair_fold_left_to_right_nonoverlapping(spark):
    from pyspark.sql import functions as F
    from quantms_utils_spark.operators.text import merge_pair_fold

    def fold(word, l, r):
        return spark.range(1).select(
            merge_pair_fold(F.split(F.lit(word), ""), F.lit(l), F.lit(r)).alias(
                "m"
            )
        ).collect()[0]["m"]

    assert fold("aaa", "a", "a") == ["aa", "a"]
    assert fold("aaaa", "a", "a") == ["aa", "aa"]
    assert fold("aab", "a", "b") == ["a", "ab"]
    assert fold("x", "a", "b") == ["x"]


def test_bpe_apply_known_merges(spark):
    from pyspark.sql import Row, functions as F
    from quantms_utils_spark.operators.text import bpe_apply

    df = spark.createDataFrame([Row(text="newest widest low")])
    out = df.select(
        bpe_apply(F.col("text"), [("e", "s"), ("es", "t")]).alias("enc")
    ).collect()[0]["enc"]
    assert out == [
        ["n", "e", "w", "est"],
        ["w", "i", "d", "est"],
        ["l", "o", "w"],
    ]


def test_bpe_apply_char_count_invariant(spark):
    from pyspark.sql import Row, functions as F
    from quantms_utils_spark.operators.text import bpe_apply

    df = spark.createDataFrame(
        [Row(text="low lower newest"), Row(text="   "), Row(text="a")]
    )
    enc = bpe_apply(F.col("text"), [("l", "o"), ("lo", "w")])
    chars = F.aggregate(
        enc,
        F.lit(0),
        lambda acc, w: acc + F.aggregate(w, F.lit(0), lambda a, s: a + F.length(s)),
    )
    got = [r[0] for r in df.select(chars).collect()]
    assert got == [len("lowlowernewest"), 0, 1]


def test_bpe_batched_matches_sequential_on_disjoint_corpus(spark):
    """When the frequent pairs are symbol-disjoint, batched induction must
    reproduce sequential BPE exactly — same merges, same frequencies —
    in a fraction of the aggregation rounds."""
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import bpe_merges

    corpus = spark.createDataFrame(
        [Row(text=" ".join(["ab"] * 9 + ["cd"] * 8 + ["ef"] * 7 + ["gh"] * 6))]
    )
    seq = [tuple(r) for r in bpe_merges(corpus, "text", n_merges=4).collect()]
    rounds: list[int] = []
    bat = [
        tuple(r)
        for r in bpe_merges(
            corpus, "text", n_merges=4, batch_size=4, _rounds_out=rounds
        ).collect()
    ]
    assert bat == seq
    assert rounds[0] <= 2  # one accepting round (+ one empty probe at most)


def test_bpe_batched_skips_conflicting_pairs(spark):
    """Sennrich corpus: (e,s) and (s,t) share a symbol, so one round must
    not take both — (es,t) only appears after the round that merged es.
    The sequential merges all emerge (with exact frequencies), interleaved
    with extra disjoint picks, in far fewer rounds than merges."""
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import bpe_merges

    corpus = spark.createDataFrame(
        [Row(text=" ".join(
            ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        ))]
    )
    rounds: list[int] = []
    got = [
        (r["left"], r["right"], r["pair_freq"])
        for r in bpe_merges(
            corpus, "text", n_merges=6, batch_size=4, _rounds_out=rounds
        ).collect()
    ]
    # the four sequential merges are all present with their true counts
    assert {("e", "s", 9), ("es", "t", 9), ("l", "o", 7), ("lo", "w", 7)} <= set(got)
    # round 1 cannot contain both halves of a chain: es must precede est
    assert got.index(("e", "s", 9)) < got.index(("es", "t", 9))
    assert got.index(("l", "o", 7)) < got.index(("lo", "w", 7))
    assert rounds[0] == 2  # 6 merges in 2 aggregation rounds


def test_bpe_100_merges_in_few_rounds(spark):
    """The scale contract from the round-2 review: 100 merges in ~10
    aggregation rounds, not 100."""
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import bpe_merges

    # 120 two-character words over disjoint CJK symbols (case-stable, no
    # shared characters), frequencies descending -> every round fills its
    # full batch of 16 disjoint merges
    words = []
    for i in range(120):
        w = chr(0x4E00 + 2 * i) + chr(0x4E01 + 2 * i)
        words.extend([w] * (200 - i))
    corpus = spark.createDataFrame([Row(text=" ".join(words))])
    rounds: list[int] = []
    got = bpe_merges(
        corpus, "text", n_merges=100, batch_size=16, _rounds_out=rounds
    ).collect()
    assert len(got) == 100
    assert rounds[0] <= 10  # ceil(100/16) = 7 accepting rounds
    assert [r["round"] for r in got] == list(range(1, 101))


def test_bpe_vocabulary_table(spark):
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import bpe_merges, bpe_vocabulary

    corpus = spark.createDataFrame(
        [Row(text=" ".join(
            ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        ))]
    )
    merges = [(r["left"], r["right"])
              for r in bpe_merges(corpus, "text", n_merges=4).collect()]
    vocab = {r["symbol"]: r["n_occurrences"]
             for r in bpe_vocabulary(corpus, "text", merges).collect()}
    # after es→est→lo→low: "low"→[low], "lower"→[low,e,r],
    # "newest"→[n,e,w,est], "widest"→[w,i,d,est]
    assert vocab["low"] == 7   # 5 + 2
    assert vocab["est"] == 9   # 6 + 3
    assert vocab["e"] == 8     # lower(2) + newest(6)
    assert vocab["w"] == 9     # newest(6) + widest(3)
    assert "es" not in vocab   # fully absorbed into est


def test_duplicate_spans_cross_document(spark):
    """Doc 1 and 2 share one 3-gram ('a b c'); doc 3 is all-unique; doc 4
    is too short for any span."""
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import duplicate_spans

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d"),      # grams: 'a b c', 'b c d'
            Row(doc_id=2, text="x a b c"),      # grams: 'x a b', 'a b c'
            Row(doc_id=3, text="p q r s"),      # all unique
            Row(doc_id=4, text="t u"),          # under n -> no row
        ]
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_dup_ngrams"], r["dup_fraction"])
        for r in duplicate_spans(df, "doc_id", "text", n=3).collect()
    }
    assert got == {
        1: (2, 1, 0.5),
        2: (2, 1, 0.5),
        3: (2, 0, 0.0),
    }


def test_duplicate_spans_within_doc_repeat_not_cross(spark):
    """A gram repeated only WITHIN one document is not a cross-doc dup."""
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import duplicate_spans

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b"),  # 'a b a','b a b','a b a','b a b'
            Row(doc_id=2, text="c d e f"),
        ]
    )
    got = {
        r["doc_id"]: r["n_dup_ngrams"]
        for r in duplicate_spans(df, "doc_id", "text", n=3).collect()
    }
    assert got == {1: 0, 2: 0}


def test_bigram_logprob_values(spark):
    """Hand-checked on a 2-doc corpus: repeated bigrams score lower
    (more probable) than one-off bigrams."""
    import math

    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [Row(doc_id=1, text="aaa"), Row(doc_id=2, text="ab")]
    )
    # corpus bigrams: doc1: 'aa' x2; doc2: 'ab' x1
    # c('aa')=2, c('ab')=1, prefix 'a' count = 3
    # doc1: avg -ln(2/3); doc2: -ln(1/3)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_neg_logprob"])
        for r in bigram_logprob(df, "doc_id", "text").collect()
    }
    assert got[1][0] == 2
    assert got[1][1] == pytest.approx(-math.log(2 / 3), abs=1e-6)
    assert got[2][1] == pytest.approx(-math.log(1 / 3), abs=1e-6)


def test_bigram_logprob_fluent_vs_gibberish(spark):
    """In a corpus of mostly-English, the repeated-pattern doc scores more
    probable than the unique-gibberish doc."""
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import bigram_logprob

    rows = [Row(doc_id=i, text="the cat sat on the mat") for i in range(10)]
    rows.append(Row(doc_id=99, text="zq xv jw qk vz"))
    df = spark.createDataFrame(rows)
    got = {
        r["doc_id"]: r["avg_neg_logprob"]
        for r in bigram_logprob(df, "doc_id", "text").collect()
    }
    assert got[0] < got[99]


def test_remove_duplicate_spans_cuts_shared_grams(spark):
    """Docs 1 and 2 share the 3-gram 'a b c': those token positions are
    cut from both; unique tails survive; doc 3 untouched; doc 4 blank."""
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import remove_duplicate_spans

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c tail one"),
            Row(doc_id=2, text="intro a b c"),
            Row(doc_id=3, text="p q r s"),
            Row(doc_id=4, text="   "),
        ]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_tokens_kept"], r["cleaned_text"])
        for r in remove_duplicate_spans(df, "doc_id", "text", n=3).collect()
    }
    assert got[1] == (5, 2, "tail one")
    assert got[2] == (4, 1, "intro")
    assert got[3] == (4, 4, "p q r s")
    assert got[4] == (0, 0, "")


def test_remove_duplicate_spans_overlapping_grams_union(spark):
    """Two overlapping dup grams cover the union of their positions."""
    from pyspark.sql import Row
    from quantms_utils_spark.operators.text import remove_duplicate_spans

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="x a b c d y"),   # 'a b c' and 'b c d' shared
            Row(doc_id=2, text="a b c d"),
        ]
    )
    got = {
        r["doc_id"]: r["cleaned_text"]
        for r in remove_duplicate_spans(df, "doc_id", "text", n=3).collect()
    }
    assert got[1] == "x y"
    assert got[2] == ""


def test_unicode_nfc_composes_and_strips_controls(spark):
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.text import unicode_nfc

    rows = [
        ("café",),        # combining acute -> composed é
        ("a\x00b\x07c",),       # control chars stripped
        ("keep\nnewline\ttab",),  # \n and \t survive
        (None,),
    ]
    df = spark.createDataFrame(rows, "t string")
    got = [r[0] for r in df.select(unicode_nfc(F.col("t"))).collect()]
    assert got[0] == "caf\u00e9"
    assert got[1] == "abc"
    assert got[2] == "keep\nnewline\ttab"
    assert got[3] is None


def test_bpe_1000_merges_under_100_rounds(spark):
    """Round-4 scale contract: n_merges=1000 at batch_size=16 completes
    in <= 100 driver rounds (measured 63 with the precise instance-
    sharing conflict rule; the old any-shared-symbol rule took 81) and
    under a wall bound. The corpus is 1.8k random word types — rounds,
    not data volume, dominate, which is exactly the property the bound
    pins."""
    import random
    import time

    from quantms_utils_spark.operators.text import bpe_merges

    rng = random.Random(3)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    words = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randrange(6, 14)))
            for _ in range(30)
        )
        for _ in range(60)
    ]
    df = spark.createDataFrame([(w,) for w in words], "text string")
    rounds: list[int] = []
    t0 = time.time()
    m = bpe_merges(df, "text", n_merges=1000, batch_size=16, _rounds_out=rounds)
    got = m.collect()
    wall = time.time() - t0
    assert len(got) == 1000
    assert rounds[0] <= 100, rounds
    # generous wall: ~77s alone, but suite runs share the host with
    # other JVMs (observed 3x stretch under a concurrent 200-query
    # sweep); the ROUNDS bound above is the real scale contract, the
    # wall only catches order-of-magnitude blowups
    assert wall < 600, f"wall {wall:.0f}s"
    # merge list is internally consistent: every non-initial symbol used
    # as a side was produced by an earlier merge
    produced = set()
    for r in sorted(got, key=lambda r: r["round"]):
        for side in (r["left"], r["right"]):
            assert len(side) == 1 or side in produced, side
        produced.add(r["merged"])


def test_bpe_deep_vocab_batch_growth(spark):
    """Round-5 deep-vocabulary contract: with geometric batch growth
    (batch_size=16 -> max_batch_size=256) the same 1000 merges land in a
    small fraction of the flat-16 rounds (measured ~63 flat vs <=25
    grown on this corpus), each round applying its whole batch as ONE
    map-lookup fold. Every emitted merge must still be internally
    consistent: unique merge rank, merged == left+right, positive
    frequency."""
    import random

    from quantms_utils_spark.operators.text import bpe_merges

    rng = random.Random(3)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    words = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randrange(6, 14)))
            for _ in range(30)
        )
        for _ in range(60)
    ]
    df = spark.createDataFrame([(w,) for w in words], "text string")
    rounds: list[int] = []
    got = bpe_merges(
        df, "text", n_merges=1000, batch_size=16, max_batch_size=256,
        _rounds_out=rounds,
    ).collect()
    assert len(got) == 1000
    assert rounds[0] <= 25, rounds
    assert [r["round"] for r in got] == list(range(1, 1001))
    assert all(r["merged"] == r["left"] + r["right"] for r in got)
    assert all(r["pair_freq"] > 0 for r in got)


def test_bpe_growth_matches_sequential_on_disjoint_corpus(spark):
    """Batch growth must not change results when the corpus pairs are
    symbol-disjoint: same merges, same frequencies as sequential."""
    from pyspark.sql import Row

    from quantms_utils_spark.operators.text import bpe_merges

    corpus = spark.createDataFrame(
        [Row(text=" ".join(["ab"] * 9 + ["cd"] * 8 + ["ef"] * 7 + ["gh"] * 6))]
    )
    seq = [tuple(r) for r in bpe_merges(corpus, "text", n_merges=4).collect()]
    grown = [
        tuple(r)
        for r in bpe_merges(
            corpus, "text", n_merges=4, batch_size=2, max_batch_size=8
        ).collect()
    ]
    assert grown == seq


def test_bpe_encode_arrow_matches_fold_chain(spark):
    """The Arrow-batched deep-vocab encoder must reproduce the Catalyst
    fold chain exactly on a learned merge list (best-rank iterative ==
    in-order passes for any well-formed list: a rule referencing a
    merged symbol always ranks after the rule that created it)."""
    from pyspark.sql import Row

    from quantms_utils_spark.operators.text import (
        bpe_apply,
        bpe_encode_arrow,
        bpe_merges,
    )

    corpus = spark.createDataFrame(
        [Row(text=" ".join(
            ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        ))]
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe_merges(corpus, "text", n_merges=6, batch_size=4).collect()
    ]
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the lowest newest widest low"),
            Row(doc_id=2, text="LOWER  lower\tnew"),
            Row(doc_id=3, text=None),
            Row(doc_id=4, text="   "),
        ]
    )
    fold = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", bpe_apply(F.col("text"), merges).alias("s")
        ).collect()
    }
    arrow = {
        r["doc_id"]: r["symbols"]
        for r in bpe_encode_arrow(docs, "text", merges).select(
            "doc_id", "symbols"
        ).collect()
    }
    # null text: fold yields None (transform of null), arrow yields []
    for k in fold:
        if fold[k] is None:
            assert arrow[k] == []
        else:
            assert arrow[k] == fold[k], k


def test_bpe_encode_arrow_deep_vocab_wall(spark):
    """1000-rule encode must complete in one map pass — the fold chain
    stops being plannable two orders of magnitude earlier."""
    import random
    import time

    from pyspark.sql import Row

    from quantms_utils_spark.operators.text import bpe_encode_arrow

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    # synthetic well-formed merge list: chain merges over random 2-char
    # seeds (each rule's left side may be a previously merged symbol)
    merges, symbols = [], [c for c in alpha]
    for _ in range(1000):
        l = rng.choice(symbols)
        r = rng.choice(alpha)
        if (l, r) in merges:
            continue
        merges.append((l, r))
        symbols.append(l + r)
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(
                "".join(rng.choice(alpha) for _ in range(rng.randrange(3, 12)))
                for _ in range(40)
            ))
            for i in range(200)
        ]
    )
    t0 = time.time()
    out = bpe_encode_arrow(docs, "text", merges)
    n = out.select(F.sum(F.size(F.flatten("symbols")))).collect()[0][0]
    wall = time.time() - t0
    assert n > 0
    assert wall < 120, wall


import os


@pytest.mark.skipif(
    os.environ.get("RUN_SCALE_TESTS") != "1",
    reason="stress tier: set RUN_SCALE_TESTS=1",
)
def test_bpe_5000_merges_stress(spark):
    """Deep-vocab stress contract: 5000 merges over a 60k-word synthetic
    corpus with batch growth 16→512 in ≤25 aggregation rounds (measured
    15, ~35 s) — the 30k-vocab extrapolation is ~65 rounds, retiring the
    r4 'still ~1.9k sequential rounds' gap."""
    import random
    import time

    from quantms_utils_spark.operators.text import bpe_merges

    rng = random.Random(5)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    words = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randrange(5, 15)))
            for _ in range(200)
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame([(w,) for w in words], "text string")
    rounds: list[int] = []
    t0 = time.time()
    m = bpe_merges(
        df, "text", n_merges=5000, batch_size=16, max_batch_size=512,
        _rounds_out=rounds,
    )
    assert m.count() == 5000
    assert rounds[0] <= 25, rounds
    assert time.time() - t0 < 300


def test_ws_token_count_edge_whitespace(spark):
    """Round-9 (review finding): edge tabs/newlines must not inflate the
    count (Spark trim strips only spaces, so the old trim-then-split form
    counted '\\thello\\n' as 3 and tab-only text as 2)."""
    from quantms_utils_spark.operators.text import ws_token_count

    df = spark.createDataFrame(
        [(" hello  world ",), ("\thello\n",), ("",), ("\t",), ("a\nb",)],
        "t string",
    )
    got = [r[0] for r in df.select(ws_token_count(F.col("t"))).collect()]
    assert got == [2, 1, 0, 0, 2]


def test_bpe_encode_arrow_in_order_on_dual_derivation(spark):
    """Round-9 (review finding): when the merge list derives one string
    two ways (ab+c and a+bc), the Arrow encoder must follow the fold
    chain's IN-ORDER semantics — a plain best-rank loop re-applies an
    earlier rule to symbols a later rule created and diverges."""
    from quantms_utils_spark.operators.text import bpe_apply, bpe_encode_arrow

    merges = [("b", "c"), ("a", "b"), ("ab", "c"), ("abc", "d"), ("a", "bc")]
    df = spark.createDataFrame([("abcd",)], "text string")
    arrow = bpe_encode_arrow(df, "text", merges).collect()
    fold = df.select(bpe_apply(F.col("text"), merges).alias("symbols")).collect()
    assert arrow[0]["symbols"] == fold[0]["symbols"] == [["abc", "d"]]


def test_bpe_encode_arrow_ascii_whitespace_boundaries(spark):
    """Round-9 (review finding): NBSP is NOT a word boundary for Java \\s
    (normalized_tokens), so the Python-side encoder must not split on it
    either."""
    from quantms_utils_spark.operators.text import (
        bpe_encode_arrow,
        normalized_tokens,
    )

    df = spark.createDataFrame([("foo bar baz",)], "text string")
    n_words_catalyst = df.select(
        F.size(normalized_tokens(F.col("text"))).alias("n")
    ).collect()[0]["n"]
    enc = bpe_encode_arrow(df, "text", [("b", "a")]).collect()[0]["symbols"]
    assert len(enc) == n_words_catalyst == 2  # 'foo\xa0bar' stays one word


def test_bpe_merges_excludes_nul_tokens(spark):
    """Round-9 (review finding): the NUL byte is merge_pairs_fold's
    reserved map-key separator and survives normalized_tokens — tokens
    carrying it are excluded from induction instead of aliasing two
    different pairs onto one map key (DUPLICATED_MAP_KEY mid-round)."""
    from quantms_utils_spark.operators.text import bpe_merges

    df = spark.createDataFrame(
        [("aa aa aa",), ("a\x00b a\x00b a\x00b a\x00b",)], "text string"
    )
    got = bpe_merges(df, "text", n_merges=1).collect()
    assert [(r["left"], r["right"]) for r in got] == [("a", "a")]
