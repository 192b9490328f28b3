"""Labeled-sample operators — the reference's native input format and
scoring semantics, re-expressed as DataFrame ops.

Reference parity map (SURVEY.md §2.1):
  S1 readLineAndDo  (/root/reference/src/Htm/Utils.hs:44-54) -> spark.read.text + parse
  P1 splitLabelAndMsg (/root/reference/src/Htm/Utils.hs:38-41) -> first-comma split + trim
  F1 invalid-line filter (/root/reference/src/Htm/Utils.hs:51) -> empty label/msg dropped
  D1 getLabelIdx    (/root/reference/src/Htm/Utils.hs:28-35) -> first-seen label dim table
  A1 countSample    (/root/reference/src/Htm/Model.hs:38-44) -> df.count()
  A2 accuracy       (/root/reference/src/Htm/Model.hs:58-69) -> avg(pred == label)
  A3 argmax         (/root/reference/src/Htm/Utils.hs:57-63) -> array_position(max)
  O1/O2 score sort + take 10 (/root/reference/src/Htm/Model.hs:31-35,
       /root/reference/src/Htm/Runner.hs:53-56) -> orderBy desc + limit
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def read_labeled_file(spark: SparkSession, path: str) -> DataFrame:
    """S1: stream a labeled-sample file -> (line_id, label, msg), invalid
    lines dropped. line_id preserves file order (for D1 first-seen)."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_id"), F.col("value")
    )
    return parse_labeled_lines(lines)


def parse_labeled_lines(lines: DataFrame) -> DataFrame:
    """P1 + F1 over (line_id, value): label = trim(text before FIRST
    comma), msg = trim(rest); rows with empty label or msg are dropped
    (exact semantics of splitLabelAndMsg + the `unless` guard)."""
    label = F.trim(F.substring_index(F.col("value"), ",", 1))
    # everything AFTER the first comma (empty if no comma at all)
    msg = F.when(
        F.instr(F.col("value"), ",") > 0,
        F.trim(F.expr("substring(value, instr(value, ',') + 1)")),
    ).otherwise(F.lit(""))
    return (
        lines.select("line_id", label.alias("label"), msg.alias("msg"))
        .filter((F.length("label") > 0) & (F.length("msg") > 0))
    )


def label_dictionary(samples: DataFrame) -> DataFrame:
    """D1: (label, idx) in FIRST-SEEN order — the reference appends a new
    label on first sight, so idx == rank of the label's first line."""
    firsts = samples.groupBy("label").agg(F.min("line_id").alias("first_line"))
    w = W.orderBy("first_line")
    return firsts.select(
        "label", (F.row_number().over(w) - 1).cast("int").alias("idx")
    )


def accuracy(scored: DataFrame, truth_col: str = "label", pred_col: str = "pred") -> float:
    """A2: fraction of rows where argmax prediction equals the label."""
    row = scored.agg(
        F.avg((F.col(pred_col) == F.col(truth_col)).cast("double")).alias("acc")
    ).collect()[0]
    return float(row["acc"]) if row["acc"] is not None else 0.0


def argmax_col(arr_col) -> F.Column:
    """A3: index of the max of an array<double> (ties -> FIRST index,
    matching the reference's left fold; 0-based like the C++ side)."""
    arr = F.col(arr_col) if isinstance(arr_col, str) else arr_col
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def topk_scores(scored: DataFrame, k: int = 10) -> DataFrame:
    """O1+O2: (label, score) sorted by score desc, top k — the serving
    reply shape (reference sorts zip(labels, scores) desc, take 10)."""
    return scored.orderBy(F.desc("score"), F.asc("label")).limit(k)


def serving_reply(topk: DataFrame) -> str:
    """K3: encode the top-k (label, score) rows as one JSON array string —
    the reference's job-server reply (`workDone_ $ toStrict $ encode ret`,
    /root/reference/src/SimHash.hs:50)."""
    row = topk.agg(
        F.to_json(F.collect_list(F.struct("label", "score"))).alias("reply")
    ).collect()[0]
    return row["reply"] or "[]"
