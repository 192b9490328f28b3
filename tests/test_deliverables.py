"""Pipeline deliverable queries: dedup_survivors keep/drop accounting and
benchmark decontamination — planted-fixture semantics beyond the
sf0.001 oracle-parity sweep (test_oracle_parity covers value parity)."""

import pandas as pd
import pytest


def test_decontam_planted_pair(spark, tmp_path):
    import __spark_entry__ as E

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "The quick brown fox jumps over the lazy dog today",
                "completely unrelated text that shares nothing at all here",
                "we note  THE QUICK brown fox jumps over the lazy dog too",
                "short text",
                "the quick brown fox jumps over the lazy dog today",
            ],
            "lang": ["en"] * 5,
            "source": ["src0", "src3", "src3", "src3", "src1"],
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")
    out = {
        (r["corpus_doc_id"], r["bench_doc_id"]): r["n_shared_grams"]
        for r in E.q_decontam_ngram_hits(spark, str(tmp_path)).collect()
    }
    # doc 3 shares exactly two distinct 8-grams with bench docs 1 and 5
    # (normalization folds the case/whitespace differences); docs 2 and 4
    # (no shared gram / under 8 tokens) never appear; doc 5 is a bench
    # doc (src1), so it shows up as a TARGET but never on the corpus side.
    assert out == {(3, 1): 2, (3, 5): 2}


def test_decontam_benchmark_side_is_broadcast(spark, tmp_path):
    import __spark_entry__ as E

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c d e f g h i", "a b c d e f g h j"],
            "lang": ["en"] * 2,
            "source": ["src0", "src3"],
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")
    plan = E.q_decontam_ngram_hits(spark, str(tmp_path))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dedup_survivors_accounting(spark):
    """Survivors partition the corpus: every doc counted once, kept ids
    are exactly the cluster labels, dropped volume = total non-kept
    chars."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    surv = E.q_dedup_survivors(spark, sf).collect()
    clusters = {
        r["clip_id"]: r["cluster_id"]
        for r in E.q_doc_dup_clusters(spark, sf).collect()
    }
    assert sum(r["n_members"] for r in surv) == len(clusters)
    assert {str(r["kept_doc_id"]) for r in surv} == set(clusters.values())
    n_chars = {
        str(r["doc_id"]): r["n_chars"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    expect_dropped = sum(
        n_chars[doc] for doc, lbl in clusters.items() if doc != lbl
    )
    assert sum(r["dropped_chars"] for r in surv) == expect_dropped
    # at least one real multi-member cluster exists in the synth corpus
    assert any(r["n_members"] > 1 for r in surv)
