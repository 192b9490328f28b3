"""Labeled-sample format parity with the reference's parser semantics
(/root/reference/src/Htm/Utils.hs:28-63) — including the 12 literal
sample lines (FIXTURES.md §2)."""

from pyspark.sql import functions as F

from simhash_spark.operators.labeled import (
    accuracy,
    argmax_col,
    label_dictionary,
    parse_labeled_lines,
    read_labeled_file,
    topk_scores,
)

REF_TRAIN = "/root/reference/sample/train_data.txt"


def _lines_df(spark, lines):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(lines)], "line_id long, value string"
    )


def test_reference_sample_file_parses(spark):
    df = read_labeled_file(spark, REF_TRAIN)
    rows = df.orderBy("line_id").collect()
    assert [(r.label, r.msg) for r in rows][:2] == [
        ("label1", "some data 1"),
        ("label1", "some data 2"),
    ]
    assert len(rows) == 6


def test_first_comma_split_and_invalid_filter(spark):
    lines = [
        "lab, msg with, extra commas",   # split on FIRST comma only
        "  spaced , padded msg  ",       # both sides trimmed
        "nolabelcomma",                  # no comma -> empty msg -> dropped
        ", empty label",                 # dropped
        "emptymsg,",                     # dropped
        "emptymsg,   ",                  # whitespace msg -> dropped
        "",                              # dropped
    ]
    got = [(r.label, r.msg) for r in parse_labeled_lines(_lines_df(spark, lines)).orderBy("line_id").collect()]
    assert got == [
        ("lab", "msg with, extra commas"),
        ("spaced", "padded msg"),
    ]


def test_label_dictionary_first_seen_order(spark):
    lines = ["b, one", "a, two", "b, three", "c, four", "a, five"]
    samples = parse_labeled_lines(_lines_df(spark, lines))
    d = {r.label: r.idx for r in label_dictionary(samples).collect()}
    assert d == {"b": 0, "a": 1, "c": 2}


def test_argmax_ties_first_and_accuracy(spark):
    df = spark.createDataFrame(
        [
            (0, [0.1, 0.7, 0.2], 1),
            (1, [0.5, 0.5, 0.0], 0),   # tie -> first index
            (2, [0.0, 0.1, 0.9], 0),   # wrong prediction
        ],
        "id long, scores array<double>, label int",
    )
    scored = df.withColumn("pred", argmax_col("scores"))
    got = {r.id: r.pred for r in scored.collect()}
    assert got == {0: 1, 1: 0, 2: 2}
    assert abs(accuracy(scored) - 2 / 3) < 1e-9


def test_topk_scores(spark):
    rows = [(f"l{i}", float(i % 7)) for i in range(25)]
    df = spark.createDataFrame(rows, "label string, score double")
    top = topk_scores(df, k=10).collect()
    assert len(top) == 10
    assert top[0].score == 6.0
    scores = [r.score for r in top]
    assert scores == sorted(scores, reverse=True)


def test_serving_reply_json(spark):
    import json

    from simhash_spark.operators.labeled import serving_reply

    df = spark.createDataFrame(
        [("cat", 0.9), ("dog", 0.1)], "label string, score double"
    )
    reply = serving_reply(topk_scores(df, k=10))
    parsed = json.loads(reply)
    assert parsed == [{"label": "cat", "score": 0.9}, {"label": "dog", "score": 0.1}]
