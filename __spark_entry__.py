"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship three-detector dedup pipeline on the
sf0.001 ``documents`` table. ``queries()`` exposes each implemented
operator from SURVEY.md §2.3 (plus the training-data-pipeline ops) as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one. Column names/aliases are kept
identical on both sides (the driver hash-compares values under sorted
column names).

Float determinism policy: aggregates of money-like doubles are returned
as BIGINT minor units on BOTH sides (cents for 2-dp columns, 1e-4 units
for 4-dp columns): each row value is scaled + round()ed to an exact
integer BEFORE summing, so the sums are integer arithmetic and
hash-identical across engines regardless of DECIMAL canonical form.
Similarity queries return IDs/ranks chosen by thresholds far from any
pair's value, never raw floats, except int-ratio floats (jaccard) whose
division is IEEE-identical in both engines.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from simhash_spark.util import release_persisted, track_persisted


def _track(df: DataFrame, src: DataFrame) -> DataFrame:
    """Carry ``src``'s track_persisted deps onto a derived frame."""
    df._persisted_deps = getattr(src, "_persisted_deps", [])
    return df


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _norm(col):
    """JVM-side normalization shared with the oracle: lower+trim+ws-collapse."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


_NORM_SQL = "regexp_replace(trim(lower({c})), '\\s+', ' ', 'g')"


def _tokens(col):
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


_TOKENS_SQL = "list_filter(string_split({n}, ' '), t -> t != '')"

_STOP = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "du", "est"],
}


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ---------------------------------------------------------------------------
# entry — flagship query
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full three-detector near-dup pipeline over sf0.001
    documents (doc text as transcript proxy) -> cluster assignments."""
    return q_doc_dup_clusters(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# oracle-checked queries
# ---------------------------------------------------------------------------

def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("sum_qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("sum_base_price_c"),
            F.sum(
                F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000).cast("bigint")
            ).alias("sum_disc_price_c4"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_docs_per_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("source", "doc_id", "n_chars", "rnk")
    )


def q_customer_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # r6 (guide §2.3 "aggregate before you shuffle"): pre-aggregate
    # lineitem to one (orderkey, revenue) row BEFORE the join — the join
    # then moves |orders| rows instead of |lineitem|, and because
    # o_orderkey is unique in orders, countDistinct(o_orderkey) becomes a
    # plain count(*) (no distinct expand). Integer cents sum per row
    # first, then per order, then per customer — associative bigint
    # addition, value-identical to the single-level aggregation.
    per_order = (
        li.select(
            "l_orderkey",
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 10000
            ).cast("bigint").alias("rev"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("rev").alias("rev"))
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.sum("rev").alias("revenue_c4"),
            F.count("*").alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 3)
    )


def q_orders_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select("o_orderstatus", "o_orderpriority", "n")
    )


def q_doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(_norm(F.col("text"))).alias("fingerprint"),
        F.length(_norm(F.col("text"))).cast("long").alias("norm_len"),
    )


def q_exact_dedup_groups(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.md5(_norm(F.col("text"))).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_dups") >= 2)
    )


def q_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = _tokens(_norm(F.col("text")))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.array_max(F.transform(toks, lambda t: F.length(t))).cast("long").alias("max_token_len"),
    )


def q_lang_guess(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(_tokens(_norm(F.col("text"))))
    df = d.select("doc_id", "lang", toks.alias("toks"))
    for lg, words in _STOP.items():
        df = df.withColumn(
            f"hits_{lg}",
            F.size(F.array_intersect(F.col("toks"), F.array(*[F.lit(w) for w in words]))).cast("long"),
        )
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in _STOP])
    guess = (
        F.when((best == 0), F.lit("und"))
        .when(F.col("hits_en") == best, "en")
        .when(F.col("hits_es") == best, "es")
        .when(F.col("hits_de") == best, "de")
        .otherwise("fr")
    )
    return df.select(
        "doc_id", "lang", *[f"hits_{lg}" for lg in _STOP], guess.alias("lang_guess")
    )


def q_quality_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    norm = _norm(F.col("text"))
    toks = _tokens(norm)
    en_stop = F.array(*[F.lit(w) for w in _STOP["en"]])
    return d.select(
        "doc_id",
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.regexp_count(norm, F.lit(r"[.,!?;:]")).cast("long").alias("n_punct"),
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.array_intersect(F.array_distinct(toks), en_stop)).cast("long").alias("n_stopwords"),
    ).withColumn(
        "stop_ratio",
        F.round(F.col("n_stopwords").cast("double") / F.col("n_words").cast("double"), 6),
    )


def q_jaccard_neardup_pairs(spark, sf_dir):
    """Token-set near-dup pairs (jaccard >= 0.8 within a language).

    Spark plan: canonical PPJoin PREFIX FILTERING (Xiao et al., WWW'08) —
    BOTH sides index only their (|X| - ceil(t|X|) + 1)-prefix under one
    global token order; if J(A,B) >= t the two prefixes must share a
    token (lossless), and |t|A|| <= |B| <= |A|/t bounds partner set
    sizes (length filter). Candidates come from the prefix-vs-prefix
    equi-join (plain sort-merge + AQE — NO broadcast of the unbounded
    token dimension), then the EXACT jaccard verifies, so the naive
    O(n^2) DuckDB oracle validates the result set verbatim."""
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(_tokens(_norm(F.col("text"))))
    # repartition BEFORE tokenizing: locally the scan is 1-2 file splits
    # and the regexp tokenization is this query's CPU floor — it would
    # otherwise run (repeatedly, once per branch) at scan parallelism
    # (measured 2 tasks x ~20 s at sf0.1).
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = (
        d.repartition(n_part)
        .select("doc_id", "lang", toks.alias("toks"))
        .filter(F.size("toks") > 0)
    )
    # PERSIST the tokenized base (r6): the regexp tokenization is this
    # query's CPU floor and base feeds two branches (the token-df
    # aggregation and the exploded df-join) — uncached, each branch
    # re-tokenizes the corpus.
    base = base.persist()
    # canonical order = global document-frequency ASCENDING (rarest first):
    # the prefix theorem holds for ANY fixed total order, but rare-token
    # prefixes make the candidate join selective.
    tok_df = (
        base.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    # project BEFORE the tok exchange (r6, guide §2.3): the exploded frame
    # used to carry the FULL toks array on every exploded token row — the
    # (tok) df-join and the (doc_id) groupBy each shuffled O(tokens x
    # array) bytes. The rarity-sorted collect_list is a PERMUTATION of the
    # distinct token set, so it serves as the pair-verify array too
    # (array_intersect/size are order-independent — bit-identical jaccard)
    # and first(toks) disappears along with the array payload.
    exploded = base.select("doc_id", "lang", F.explode("toks").alias("tok")).join(
        tok_df, "tok"
    )
    prefix_len = F.floor(F.size("toks") * F.lit(1.0 - 0.8)).cast("int") + F.lit(1)
    # PERSIST ordered (r6): the prefix self-join reads it twice (sides a
    # and b) and the jaccard verify re-attaches both token arrays —
    # uncached, the whole df-join + groupBy pipeline above ran once per
    # consumer.
    ordered = (
        exploded.groupBy("doc_id", "lang")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))), lambda s: s["tok"]
            ).alias("toks"),
        )
        .withColumn("pref", F.slice("toks", 1, prefix_len))
        .select("doc_id", "lang", "toks", "pref")
        .persist()
    )
    # prefix index carries IDS AND SIZES ONLY (guide §2.3 / §8: decide
    # with small rows, attach heavy payloads once): the candidate join
    # used to ship both full token arrays through the (lang, tok)
    # shuffle; the arrays are re-joined per DEDUPED candidate instead.
    # The join key is xxhash64(tok) — an 8-byte key instead of the token
    # string (narrower shuffle, long comparisons). A hash collision can
    # only ADD a spurious candidate, which the EXACT jaccard filter
    # below rejects — the result set is unchanged.
    pref = ordered.select(
        "doc_id",
        "lang",
        F.size("toks").alias("sz"),
        F.explode("pref").alias("ptok"),
    ).select("doc_id", "lang", "sz", F.xxhash64("ptok").alias("tok"))
    a_pref = pref.select(
        F.col("doc_id").alias("a"), "lang", F.col("sz").alias("sz_a"), "tok"
    )
    # index side is prefix-filtered too — index size ~ 0.2x total tokens
    # instead of every token of every document.
    b_pref = pref.select(
        F.col("doc_id").alias("b"), "lang", F.col("sz").alias("sz_b"), "tok"
    )
    cand = (
        a_pref.join(b_pref, ["lang", "tok"])
        .where(
            (F.col("a") < F.col("b"))
            # length filter: J>=t forces t|A| <= |B| <= |A|/t
            & (F.col("sz_b").cast("double") >= F.col("sz_a").cast("double") * 0.8)
            & (F.col("sz_a").cast("double") >= F.col("sz_b").cast("double") * 0.8)
        )
        .select("a", "b", "lang")
        .dropDuplicates(["a", "b"])
    )
    j = cand.join(
        ordered.select(F.col("doc_id").alias("a"), F.col("toks").alias("toks_a")), "a"
    ).join(
        ordered.select(F.col("doc_id").alias("b"), F.col("toks").alias("toks_b")), "b"
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    # |A u B| = |A| + |B| - |A n B| exactly (both arrays are distinct by
    # construction) — saves the second O(|A|+|B|) array pass per pair;
    # same integers, bit-identical jaccard.
    union = (F.size("toks_a") + F.size("toks_b")).cast("double") - inter
    out = (
        j.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= 0.8)
        .select("a", "b", "lang", "jaccard")
    )
    return track_persisted(out, [base, ordered])


def q_substring_pairs(spark, sf_dir):
    """Verbatim-containment pairs (shorter side >= 64 chars).

    Spark plan: LOSSLESS prefix-gram inverted index — if na is contained
    in nb, then na's first 16 chars occur at some offset of nb, so an
    equi-join of a's prefix-16-gram against ALL 16-grams of b (generated
    JVM-side with sequence+substring, no UDF) finds every true pair;
    contains() then verifies. Result set identical to the naive O(n^2)
    DuckDB oracle cross join."""
    d = _t(spark, sf_dir, "documents")
    base = d.select("doc_id", _norm(F.col("text")).alias("nt"))
    # r6 (guide §8 "decide with small rows, move big rows once" + §2.3
    # project-before-exchange): the EXPLODED side of the gram join now
    # carries (doc_id, gram) ONLY. The old shape put the full normalized
    # text on every exploded gram row — O(corpus chars x text length)
    # bytes — and the planner, estimating the exploded side small,
    # BROADCAST it: an unbounded broadcast of the whole exploded corpus
    # (a scale hazard on top of the byte blow-up). The long text (nb) is
    # re-attached ONCE per deduped candidate pair instead, and the
    # contains() verify runs per pair instead of per shared gram. The a
    # side keeps na in place: it is one row per (>= 64-char) document —
    # the same weight as the base table itself.
    a = base.filter(F.length("nt") >= 64).select(
        F.col("doc_id").alias("a"),
        F.col("nt").alias("na"),
        F.substring("nt", 1, 16).alias("gram"),
    )
    # explicit repartition: the documents scan is a single small file
    # locally (1-2 splits), and the explode below is the query's CPU
    # floor — without this the whole CPU-dense stage runs at the scan's
    # parallelism (measured 2 tasks x ~19 s at sf0.1; at cluster scale
    # many file splits make this a no-op cost-wise).
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # len_b rides the exploded side as an 8-byte column so the length
    # filter still prunes candidates BEFORE the dedupe shuffle (the old
    # plan applied it pre-dedupe via the full text).
    b = base.repartition(n_part).select(
        F.col("doc_id").alias("b"),
        F.length("nt").alias("len_b"),
        F.explode(
            F.expr("transform(sequence(1, greatest(length(nt) - 15, 0)), i -> substring(nt, i, 16))")
        ).alias("gram"),
    )
    cand = (
        a.join(b, "gram")
        .where((F.col("a") != F.col("b")) & (F.length("na") < F.col("len_b")))
        .select("a", "na", "b")
        .dropDuplicates(["a", "b"])
    )
    # verbatim-containment verify per DEDUPED candidate (na/nb are
    # functions of a/b, so filtering after the dedupe keeps the result
    # set identical to filtering before it).
    return (
        cand.join(base.select(F.col("doc_id").alias("b"), F.col("nt").alias("nb")), "b")
        .where(F.col("nb").contains(F.col("na")))
        .select("a", "b")
    )


def q_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    ed = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    q = ed.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qemb"))
    dot = F.aggregate(
        F.zip_with("emb", "qemb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    sim = dot / (nrm(F.col("emb")) * nrm(F.col("qemb")))
    scored = (
        ed.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .withColumn("sim", sim)
    )
    # TakeOrdered: parallel per-partition partial top-k, NOT a global
    # single-partition window over every scored row. The row_number
    # window below runs on the already-reduced 20-row result only.
    top = scored.select("vec_id", "sim").orderBy(F.desc("sim"), F.asc("vec_id")).limit(20)
    w = W.orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("vec_id", "rnk")
    )


def q_cosine_neardup_pairs(spark, sf_dir):
    """Exact cosine >= 0.45 pairs via blocked GEMM (operators/ann.py):
    no row-level CartesianProduct — B*(B+1)/2 bounded-memory matmul
    tiles over cogrouped rows (no block ever packed into one row), B
    auto-sized from the table's count; identical result set to the
    naive O(n^2) DuckDB oracle."""
    from simhash_spark.operators.ann import cosine_pairs_blocked

    e = _t(spark, sf_dir, "embeddings")
    return cosine_pairs_blocked(e, threshold=0.45).select("a", "b")


def q_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_value_c"),
        )
    )


def q_events_incremental(spark, sf_dir):
    """Incremental-batch semantics: aggregate only rows past a watermark
    (max(event_id)/2) — the batch-over-new-snapshot pattern."""
    ev = _t(spark, sf_dir, "events")
    wm = ev.agg(F.floor(F.max("event_id") / 2).cast("long").alias("wm"))
    return (
        ev.join(F.broadcast(wm))
        .filter(F.col("event_id") > F.col("wm"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.min("event_id").alias("first_id"))
    )


def q_streaming_events_hourly(spark, sf_dir):
    """ORACLE-CHECKED Structured Streaming: event-time hourly windows
    with a 1-hour late-data watermark over the events table, drained
    with trigger(availableNow). Append mode emits a window exactly once
    when the watermark (max seen ts - 1h) passes its end, so the emitted
    set is precisely the windows with end <= max(ts) - 1h — which is
    what the DuckDB oracle computes relationally."""
    import uuid

    from simhash_spark.streaming.windowed import windowed_event_counts

    # the file stream source requires a DIRECTORY; stage the single
    # events.parquet file behind a symlink (testdata stays untouched).
    stage = _PIPE_CKPTS.setdefault(
        ("events-stream", sf_dir), tempfile.mkdtemp(prefix="stream-ev-src-")
    )
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)

    name = "stream_ev_" + uuid.uuid4().hex[:8]
    wc = windowed_event_counts(
        spark,
        stage,
        window="1 hour",
        watermark="1 hour",
        schema="event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    q = (
        wc.select(
            F.unix_timestamp("window_start").alias("hour_epoch"),
            "event_type",
            "n",
            "total_value_c",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream-ev-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def q_user_sessions(spark, sf_dir):
    """Sessionization: gap > 1800 s starts a new session (window lag +
    running sum)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("sess_start", new_sess).withColumn(
        "sess_id", F.sum("sess_start").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id").agg(
        F.max("sess_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def q_doc_setops(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    big = d.filter(F.col("n_chars") > 400).select("doc_id")
    en = d.filter(F.col("lang") == "en").select("doc_id")
    src0 = d.filter(F.col("source") == "src0").select("doc_id")
    return big.union(src0).distinct().exceptAll(en.distinct()).select("doc_id")


# ---------------------------------------------------------------------------
# Spark-only queries (no SQL oracle -> driver does rows-only check)
# ---------------------------------------------------------------------------

_PIPE_CKPTS: dict[str, str] = {}


def _copy_stage_parquet(store, stage: str, dest: str) -> None:
    """File-level copy of a committed stage's parquet data dir to a side
    path (r6): for audit parquets that are the stage VERBATIM, a
    filesystem copy replaces the scan + rewrite job pair while producing
    the same parquet content for the DuckDB oracle."""
    m = store.read_manifest(stage)
    shutil.rmtree(dest, ignore_errors=True)
    shutil.copytree(m["data_dir"], dest)


def _shared_pipeline(spark, sf_dir):
    """One checkpointed pipeline per (process, sf_dir): the three
    pipeline-backed queries (doc_dup_clusters, verified_dup_pairs,
    verified_jaccard_pairs) share committed stages — the 2nd and 3rd
    call resume instead of recomputing (the engine's idempotent-resume
    contract doing real work in the correctness gate)."""
    from simhash_spark.config import EngineConfig
    from simhash_spark.plans.pipeline import DedupPipeline

    ckpt = _PIPE_CKPTS.setdefault(sf_dir, tempfile.mkdtemp(prefix="simhash-entry-"))
    pipe = DedupPipeline(spark, ckpt, EngineConfig())
    pipe.run(_docs_as_clips(spark, sf_dir))
    return pipe


def _docs_as_clips(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("string").alias("clip_id"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(16000).alias("sr_hz"),
        F.lit(1000).alias("dur_ms"),
        F.lit("pcm_s16le").alias("codec"),
        F.col("text").alias("transcript"),
    )


def q_simhash_signatures(spark, sf_dir):
    """ORACLE-CHECKED structure of the SimHash encoder output (the
    64-bit VALUES have no relational recomputation — they stay pinned
    by golden vectors + property tests, tests/test_signatures_spark.py,
    tests/test_properties.py — but the encoder CONTRACT does): exactly
    one signature per document, every doc_id a real documents row, the
    materialized norm_text equal to a relational re-derivation of the
    normalization (lower+trim+ws-collapse; asserted on ASCII rows,
    where casefold/NFC are identity), and the encoder a FUNCTION of
    norm_text — identical normalized text never maps to two different
    signatures (catches per-partition seed drift / nondeterminism).
    The (doc_id, norm_text, simhash) triple is materialized to a side
    parquet; DuckDB re-asserts the contract over the same file, and any
    structural break drops all rows and fails the gate's hash compare."""
    from simhash_spark.functions.signatures import normalize_udf, simhash64_udf

    d = _t(spark, sf_dir, "documents")
    audit = d.select(
        "doc_id", normalize_udf(F.col("text")).alias("norm_text")
    ).select("doc_id", "norm_text", simhash64_udf("norm_text").alias("simhash"))
    audit.write.mode("overwrite").parquet(_SIG_AUDIT_PATH)
    return spark.read.parquet(_SIG_AUDIT_PATH).select("doc_id", "simhash")


def q_minhash_bands(spark, sf_dir):
    """ORACLE-CHECKED structure of the MinHash banding output (VERDICT r3
    #4b): the band-hash VALUES have no relational recomputation, but the
    banding CONTRACT does — exactly BANDS=32 rows per document, band_id a
    permutation of 0..31, every doc_id a real documents row, no document
    missing. The exploded band table is materialized to a side parquet;
    DuckDB re-asserts the contract over the same file (a structural break
    — dropped doc, duplicated band, range escape — drops rows and fails
    the hash compare). Value-level banding semantics stay pinned by the
    golden vectors + pigeonhole pytest (tests/test_signatures_spark.py,
    tests/test_lsh_cc.py)."""
    from simhash_spark.functions.signatures import minhash_bands_udf, normalize_udf

    d = _t(spark, sf_dir, "documents")
    bands = d.select(
        "doc_id",
        F.posexplode(minhash_bands_udf(normalize_udf(F.col("text")))).alias(
            "band_id", "band_hash"
        ),
    )
    bands.write.mode("overwrite").parquet(_BANDS_AUDIT_PATH)
    return spark.read.parquet(_BANDS_AUDIT_PATH)


def q_doc_dup_clusters(spark, sf_dir):
    """Flagship: full pipeline (simhash + minhash LSH + substring grams ->
    candidates -> verify -> connected components) on documents.

    ORACLE-CHECKED (round 4): the iterative min-label-propagation loop
    (operators/cc.py) has no single-query SQL equivalent in Spark, but
    DuckDB's recursive CTEs compute the same fixpoint: the verified edge
    list and the node universe are materialized to side parquets, and
    the oracle re-derives every component as min(reachable id) via a
    transitive-closure walk over the SAME edges. A wrong label anywhere
    (dropped edge, premature convergence, bad singleton fallback) makes
    the hash compare fail. Closure size is O(sum component^2) — fine at
    gate scale, which is why the ENGINE uses the iterative loop instead."""
    pipe = _shared_pipeline(spark, sf_dir)
    pipe.store.read("verified_pairs").select("a", "b").distinct().write.mode(
        "overwrite"
    ).parquet(_CC_EDGES_PATH)
    # the nodes audit is the committed clusters stage verbatim — copy the
    # stage's parquet at FILE level instead of a Spark scan + rewrite of
    # identical rows (r6; same idiom as the overlap audit copy).
    _copy_stage_parquet(pipe.store, "clusters", _CC_NODES_PATH)
    return spark.read.parquet(_CC_NODES_PATH).orderBy("clip_id")


def q_verified_dup_pairs(spark, sf_dir):
    """Verified near-dup pairs on documents (pre-clustering view).

    ORACLE-CHECKED (round 4): every verified pair is re-judged
    relationally — the pair table is materialized WITH both normalized
    texts and both simhash signatures, and DuckDB re-applies the
    method-specific verify rule (config.py / SURVEY.md §2.2) over the
    same file: exact => identical text; hamming => popcount(xor) <= 3;
    jaccard => distinct char-5-shingle jaccard >= 0.8 recomputed from
    raw substrings (no hashing); substring => the >= 64-char shorter
    side verbatim-contained in the longer. A pair the engine verified
    under the wrong rule drops from the oracle side and fails the
    compare. (Completeness — pairs that SHOULD verify — is audited by
    verified_jaccard_pairs, the cluster-recall query.)"""
    pipe = _shared_pipeline(spark, sf_dir)
    vp = pipe.store.read("verified_pairs").select("a", "b", "det", "method")
    prof = pipe.store.read("profile")
    audit = vp.join(
        prof.select(
            F.col("clip_id").alias("a"),
            F.col("norm_text").alias("norm_a"),
            F.col("simhash").alias("sig_a"),
        ),
        "a",
    ).join(
        prof.select(
            F.col("clip_id").alias("b"),
            F.col("norm_text").alias("norm_b"),
            F.col("simhash").alias("sig_b"),
        ),
        "b",
    )
    audit.write.mode("overwrite").parquet(_VERIFY_AUDIT_PATH)
    return spark.read.parquet(_VERIFY_AUDIT_PATH).select("a", "b", "det", "method")


# side parquet the side-table oracles read: a Spark query materializes an
# audit table here BEFORE the gate runs the DuckDB SQL (the gate collects
# the Spark result first), so both engines apply the same rule to the same
# rows. Per-PROCESS path (pid-suffixed, VERDICT r3 #7): two concurrent
# gate runs each get their own directory, and oracle_sql() interpolates
# the same per-process value the queries wrote.
_SIDE_DIR = os.path.join(tempfile.gettempdir(), f"simhash-oracle-side-{os.getpid()}")
_HAMMING_AUDIT_PATH = os.path.join(_SIDE_DIR, "hamming_audit.parquet")
_OVERLAP_AUDIT_PATH = os.path.join(_SIDE_DIR, "overlap_audit.parquet")
_BANDS_AUDIT_PATH = os.path.join(_SIDE_DIR, "bands_audit.parquet")
_SIG_AUDIT_PATH = os.path.join(_SIDE_DIR, "sig_audit.parquet")
_AUDIO_FEAT_AUDIT_PATH = os.path.join(_SIDE_DIR, "audio_feat_audit.parquet")
_VERIFY_AUDIT_PATH = os.path.join(_SIDE_DIR, "verify_audit.parquet")
_CC_NODES_PATH = os.path.join(_SIDE_DIR, "cc_nodes.parquet")
_CC_EDGES_PATH = os.path.join(_SIDE_DIR, "cc_edges.parquet")
_AUDIO_FP_AUDIT_PATH = os.path.join(_SIDE_DIR, "audio_fp_audit.parquet")
_SRP_CAND_PATH = os.path.join(_SIDE_DIR, "srp_candidates.parquet")
_CLS_AUDIT_DIR = os.path.join(_SIDE_DIR, "classifier_audit")
_IVF_CAND_PATH = os.path.join(_SIDE_DIR, "ivf_candidates.parquet")
_SURV_EDGES_PATH = os.path.join(_SIDE_DIR, "surv_edges.parquet")
_SURV_NODES_PATH = os.path.join(_SIDE_DIR, "surv_nodes.parquet")
_SPECTRAL_AUDIT_PATH = os.path.join(_SIDE_DIR, "spectral_audit.parquet")
_DECONTAM_SPAN_PATH = os.path.join(_SIDE_DIR, "decontam_span_audit.parquet")


def q_verified_hamming_pairs(spark, sf_dir):
    """ORACLE-CHECKED hamming verify tier (VERDICT r2 #7): signatures
    can't be recomputed relationally, but the TIER RULE can — materialize
    the pipeline's candidate pairs with both simhash signatures to a side
    parquet, apply bit_count(sig_a XOR sig_b) <= VERIFY_HAMMING_MAX
    JVM-side, and let DuckDB re-apply the identical rule over the same
    file. A disagreement in the xor/popcount/threshold logic (or a pair
    the pipeline's verify tier would mis-route) shows up as a row or
    value mismatch."""
    from simhash_spark import config as C

    pipe = _shared_pipeline(spark, sf_dir)
    # candidate_pairs is the cid-keyed interior table (a/b = int64
    # xxhash64 ids); the signature join runs on profile.cid and the
    # audit parquet carries the same cid ids on both engines' sides.
    pairs = pipe.store.read("candidate_pairs").select("a", "b")
    sigs = pipe.store.read("profile").select("cid", "simhash")
    joined = (
        pairs.join(
            sigs.select(F.col("cid").alias("a"), F.col("simhash").alias("sig_a")), "a"
        )
        .join(
            sigs.select(F.col("cid").alias("b"), F.col("simhash").alias("sig_b")), "b"
        )
        .select("a", "b", "sig_a", "sig_b")
    )
    joined.write.mode("overwrite").parquet(_HAMMING_AUDIT_PATH)
    side = spark.read.parquet(_HAMMING_AUDIT_PATH)
    return (
        side.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
        )
        .filter(F.col("hamming") <= C.VERIFY_HAMMING_MAX)
        .select("a", "b", "hamming")
    )


def q_verified_jaccard_pairs(spark, sf_dir):
    """ORACLE-CHECKED view of the three-detector pipeline: all document
    pairs with char-5-shingle jaccard >= 0.8. Candidates come from the
    pipeline's dup CLUSTERS (LSH recall >= 0.99 guarantees every true
    pair is intra-cluster; at j=0.8 a minhash band hit is near-certain:
    1-(1-0.8^4)^32 ~ 1-5e-8); the jaccard that decides membership is then
    recomputed JVM-side with the exact formula the DuckDB oracle uses
    (sequence+substring shingles, array_intersect — no hashing), so the
    result sets and values match verbatim. A miss in the LSH pipeline
    shows up here as a missing row — this query IS the recall audit."""
    pipe = _shared_pipeline(spark, sf_dir)
    pairs = pipe.dup_pairs_from_clusters()  # (a, b) string ids, a < b

    d = _t(spark, sf_dir, "documents")
    norm = d.select(
        F.col("doc_id").cast("string").alias("id"), _norm(F.col("text")).alias("nt")
    ).filter(F.length("nt") > 0)
    sh = F.array_distinct(
        F.when(F.length("nt") <= 5, F.array(F.col("nt"))).otherwise(
            F.expr("transform(sequence(1, length(nt) - 4), i -> substring(nt, i, 5))")
        )
    )
    base = norm.select("id", sh.alias("s"))
    j = (
        pairs.join(base.select(F.col("id").alias("a"), F.col("s").alias("sa")), "a")
        .join(base.select(F.col("id").alias("b"), F.col("s").alias("sb")), "b")
    )
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = (F.size("sa") + F.size("sb")).cast("double") - inter
    return (
        j.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= 0.8)
        .select("a", "b", "jaccard")
    )


_SPAN_CACHE: dict[str, str] = {}


def _overlap_spans(spark, sf_dir) -> DataFrame:
    """The overlap detector's spans for sf_dir, computed ONCE per
    process: the two overlap-backed gate queries (overlap_span_pairs,
    decontam_span_hits) share the detector run the way the
    pipeline-backed queries share _shared_pipeline, instead of running
    the fingerprint-index + suffix-array confirm twice on identical
    input. bench.py pops this cache before each timed overlap run so
    the benchmark still measures the full detector."""
    path = _SPAN_CACHE.get(sf_dir)
    if path is None:
        import hashlib

        from simhash_spark.operators.overlap import overlap_span_pairs
        from simhash_spark.util import flush_deferred_metrics

        d = _t(spark, sf_dir, "documents")
        # keep_norms: the detector already joined both normalized texts
        # for the confirm kernel — carrying them into the cache saves
        # both downstream gate queries a fresh normalize pass over the
        # corpus plus two joins (r6). Cache file named per DATASET
        # (md5 of sf_dir), not per cache size: after bench.py pops an
        # entry, a recompute can no longer overwrite a file another
        # cached sf_dir still points at (ADVICE r5 #1).
        spans = overlap_span_pairs(d, keep_norms=True)
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        path = os.path.join(_SIDE_DIR, f"spans-{tag}.parquet")
        spans.write.mode("overwrite").parquet(path)
        flush_deferred_metrics(spans)
        release_persisted(spans)
        _SPAN_CACHE[sf_dir] = path
    return spark.read.parquet(path)


def q_overlap_span_pairs(spark, sf_dir):
    """ORACLE-CHECKED suffix-array detector leg (north rule + VERDICT r3
    #4a): pairs of documents sharing a verbatim >= 64-char run, LOCALIZED
    — (overlap_len, off_a, off_b) into the normalized texts via per-pair
    suffix-array + Kasai LCP on gram-index candidates
    (simhash_spark/suffix.py). DuckDB has no longest-common-substring,
    but the span CLAIM is relational: both normalized texts are
    materialized next to each span in a side parquet, and the oracle
    re-asserts substr(norm_a, off_a+1, len) == substr(norm_b, off_b+1,
    len) AND len >= 64 over the same file — a wrong offset/length drops
    the row and fails the compare. MAXIMALITY (longest) stays pinned by
    the difflib-oracled kernel pytest (tests/test_suffix.py)."""
    # the span cache already carries both normalized texts (the detector
    # joined them for its confirm kernel — keep_norms in _overlap_spans),
    # so the audit parquet is a straight copy: no corpus re-normalize,
    # no joins (r6; the oracle re-asserts the span claim over norm_a/
    # norm_b exactly as before). The copy is FILE-level (r6 2nd pass):
    # re-writing the identical rows through Spark cost a scan + write
    # job pair per run; the cache dir IS the parquet content the audit
    # path must hold.
    _overlap_spans(spark, sf_dir)
    shutil.rmtree(_OVERLAP_AUDIT_PATH, ignore_errors=True)
    shutil.copytree(_SPAN_CACHE[sf_dir], _OVERLAP_AUDIT_PATH)
    return spark.read.parquet(_OVERLAP_AUDIT_PATH).select(
        "a", "b", "overlap_len", "off_a", "off_b"
    )


def q_audio_features(spark, sf_dir):
    """Multimodal: synthetic WAV clips -> real numpy acoustic features
    via mapInPandas (sf_dir unused: clips are generated deterministically).

    ORACLE-CHECKED at the VALUE level: the WAV decode has no SQL
    equivalent (pinned by tests/test_audio.py golden decode tests), but
    the feature MATH does — the decoded int16 PCM is materialized next
    to the claimed features in a side parquet, and DuckDB re-derives
    n_samples = len(samples), rms = sqrt(mean((s/32768)^2)) and
    zcr = mean(sign-bit flips between adjacent samples) from the same
    samples (exact integer inputs; /32768 is a power-of-two division, so
    both engines see bit-identical terms and only the float summation
    order differs — orders of magnitude below the 6-dp rounding both
    sides apply). A wrong normalization constant, off-by-one framing, or
    a zcr sign-convention drift fails the hash compare. sr_hz rides
    along as decoded (structural passthrough)."""
    from simhash_spark.functions.audio import audio_features
    from simhash_spark.sources.synth import make_clips

    clips_pd, _ = make_clips(200, seed=42, dur_ms_range=(300, 800))
    df = spark.createDataFrame(clips_pd[["clip_id", "bytes"]])
    feats = audio_features(df, keep_samples=True)
    feats.select(
        "clip_id", "sr_hz", "n_samples", "rms", "zcr", "samples"
    ).write.mode("overwrite").parquet(_AUDIO_FEAT_AUDIT_PATH)
    return spark.read.parquet(_AUDIO_FEAT_AUDIT_PATH).select(
        "clip_id",
        "sr_hz",
        "n_samples",
        F.round("rms", 6).alias("rms"),
        F.round("zcr", 6).alias("zcr"),
    )



def q_audio_dup_pairs(spark, sf_dir):
    """ORACLE-CHECKED audio-PAYLOAD dedup (Haitsma-Kalker perceptual
    fingerprint, functions/audio.py): finds re-gained + re-noised copies
    whose BYTES differ (exact hashing misses them). Deterministic synth
    corpus with 3 planted perturbed copies; sf_dir unused (audio lives
    off-table). The fingerprint kernel (STFT band energies) has no SQL
    equivalent, but the MATCH RULE does: the candidate pairs are
    materialized WITH both clips' full fingerprint sequences to a side
    parquet, the BER verify (xor + bit_count over aligned frames,
    ber < 0.25) runs JVM-side, and DuckDB re-applies the identical rule
    over the same file — a disagreement in the alignment/popcount/
    threshold logic fails the compare."""
    import numpy as np

    from simhash_spark.functions.audio import audio_dup_candidates, ber_verify
    from simhash_spark.sources.synth import decode_wav, make_clips, wav_bytes

    rng = np.random.default_rng(4)
    clips_pd, _ = make_clips(60, seed=4, dur_ms_range=(700, 1500))
    rows = [
        (cid, bytes(raw)) for cid, raw in zip(clips_pd["clip_id"], clips_pd["bytes"])
    ]
    for i in range(3):
        sr, s = decode_wav(rows[i][1])
        pert = (s * 0.82 + rng.normal(0, 60, len(s))).clip(-32768, 32767)
        rows.append((f"pert-{i}", wav_bytes(pert.astype(np.int16), sr)))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    cand = audio_dup_candidates(df)
    cand.write.mode("overwrite").parquet(_AUDIO_FP_AUDIT_PATH)
    release_persisted(cand)
    side = spark.read.parquet(_AUDIO_FP_AUDIT_PATH)
    return ber_verify(side).select("a", "b", "ber")


def q_token_count_regex(spark, sf_dir):
    """BPE-ish regex token counting: word runs and single punctuation
    marks counted separately (both engines use the same RE2/Java-safe
    pattern)."""
    d = _t(spark, sf_dir, "documents")
    norm = _norm(F.col("text"))
    return d.select(
        "doc_id",
        F.regexp_count(norm, F.lit("[a-z0-9]+")).cast("long").alias("n_word_tokens"),
        F.regexp_count(norm, F.lit("[^a-z0-9 ]")).cast("long").alias("n_sym_tokens"),
    )


def q_classifier_train_eval(spark, sf_dir):
    """Learned classification path (reference v2-train analog, E2-E5+L1):
    distributed local-SGD softmax over pooled SDR features. The task is
    the architecture's in-distribution one — classify near-dup variants
    back to their template family (the reference classifies messages by
    similarity to trained exemplars): deterministic synth corpus, family
    labels from the generator's truth pairs, first ~70%% of each family
    trains, the held-out variants test. One row of train/test accuracy
    per iteration (the reference's per-iter stats shape); sf_dir unused.

    ORACLE-CHECKED at the VALUE level: the SGD updates themselves are
    the ML loop (no SQL equivalent), but every NUMBER this query reports
    is a pure function of facts the run materializes (`fit(audit_sink=)`)
    — the encoded corpora (split, ex_id, y, active col list) and every
    epoch-boundary weight snapshot (snap k = weights after k averaged
    updates, bias as col = -1). DuckDB re-derives, from those parquets
    alone, each example's logit per label (SUM of its cols' weights +
    bias — softmax is monotone, so argmax over logits IS the engine's
    prediction, ties -> lowest label index exactly like np.argmax),
    iteration it's train accuracy against snap it-1 (the engine scores
    train vs epoch-START weights) and test accuracy against snap it,
    plus both corpus counts. A wrong argmax, a mis-scored iteration
    boundary, an aggregation bug, or stats that drift from the model
    that was actually learned all fail the hash compare."""
    from simhash_spark.ml import SimHashClassifier, V2Opts
    from simhash_spark.sources.synth import make_clips

    clips, truth = make_clips(3000, seed=11)
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in truth.itertuples(index=False):
        ra, rb = find(r.a), find(r.b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    fams: dict = {}
    for cid in clips["clip_id"]:
        if cid in parent:
            fams.setdefault(find(cid), []).append(cid)
    texts = dict(zip(clips["clip_id"], clips["transcript"]))
    rows_tr, rows_te = [], []
    line = 0
    for k in sorted(fams):
        mem = sorted(fams[k])
        if len(mem) < 3:
            continue
        cut = max(2, int(0.7 * len(mem)))
        for i, cid in enumerate(mem):
            (rows_tr if i < cut else rows_te).append((line, k, texts[cid]))
            line += 1
    schema = "line_id long, label string, msg string"
    train = spark.createDataFrame(rows_tr, schema)
    valid = spark.createDataFrame(rows_te, schema)
    m = SimHashClassifier(V2Opts())
    hist = m.fit(spark, train, valid, iters=5, audit_sink=_CLS_AUDIT_DIR)
    return spark.createDataFrame(
        [
            (
                h["iteration"],
                h["train_count"],
                h["test_count"],
                h["train_accuracy"],
                h["test_accuracy"],
            )
            for h in hist
        ],
        "iteration int, train_count long, test_count long, "
        "train_accuracy double, test_accuracy double",
    )


def q_srp_ann_topk(spark, sf_dir):
    """ORACLE-CHECKED LSH-bucketed (sign-random-projection) ANN top-k —
    the scale path next to the brute-force cosine_topk. Bucket width is
    sized to the corpus (2^n_bits ~ n/32) and multiprobe-1 probes the
    n_bits one-bit-off buckets per table: recall@10 = 1.0 vs brute force
    at sf0.001/sf0.01 (pytest-gated >= 0.9, tests/test_ann.py). The SRP
    hash kernel has no SQL equivalent, but the RERANK RULE does: the
    deduped bucket-probe candidate set is materialized to a side
    parquet, Spark reranks it by exact cosine (top-10, ties -> vec_id
    asc), and DuckDB reranks the SAME candidate set from the embeddings
    table with the identical formula — a wrong cosine or rank order
    fails the compare."""
    from simhash_spark.operators.ann import srp_candidates, srp_rerank_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # dim=None: planes are regenerated deterministically inside the UDF
    # from the batch's own width — no driver action before planning.
    cand = srp_candidates(e, q, n_bits=4, n_tables=16, multiprobe=1)
    cand.write.mode("overwrite").parquet(_SRP_CAND_PATH)
    side = spark.read.parquet(_SRP_CAND_PATH)
    return srp_rerank_topk(side, e, q, k=10).select("query_id", "vec_id", "rnk")


def q_ivf_ann_topk(spark, sf_dir):
    """ORACLE-CHECKED IVF (inverted-file) ANN top-k — the data-adapted
    scale path next to srp_ann_topk's hash-based one. A spherical
    k-means codebook (bounded seeded sample, the FAISS IVF training
    discipline) assigns every vector to one cell; queries probe their
    nprobe nearest cells; exact cosine reranks. The k-means kernel has
    no SQL equivalent, but — same side-parquet idiom as srp_ann_topk —
    the deduped cell-probe candidate set is materialized and DuckDB
    reranks the SAME candidates with the identical cosine/top-10 rule,
    so a wrong similarity or rank order fails the compare. Recall vs
    brute force is pytest-gated in tests/test_ann.py."""
    from simhash_spark.operators.ann import (
        ivf_candidates,
        ivf_train_centroids,
        srp_rerank_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = ivf_train_centroids(e, n_cells=16)
    cand = ivf_candidates(e, q, cents, nprobe=4)
    cand.write.mode("overwrite").parquet(_IVF_CAND_PATH)
    side = spark.read.parquet(_IVF_CAND_PATH)
    return srp_rerank_topk(side, e, q, k=10).select("query_id", "vec_id", "rnk")


def q_dedup_survivors(spark, sf_dir):
    """The dedup DELIVERABLE: one kept (canonical) document per duplicate
    cluster plus the reduction accounting — what a training-data pipeline
    actually materializes after near-dup detection. Canonical member =
    the cluster label itself (min clip_id, the CC fixpoint's label rule),
    so keep/drop is a pure function of the cluster table; dropped_chars
    totals the text volume the dedup removes.

    ORACLE-CHECKED: same recursive-CTE fixpoint oracle as
    doc_dup_clusters (side-parquet edges + nodes re-walked to components
    in DuckDB), extended with the keep-min rule and a documents join —
    a wrong cluster label, a mis-picked canonical, or a drop-accounting
    error all change rows/values and fail the hash compare."""
    pipe = _shared_pipeline(spark, sf_dir)
    pipe.store.read("verified_pairs").select("a", "b").distinct().write.mode(
        "overwrite"
    ).parquet(_SURV_EDGES_PATH)
    # file-level copy of the committed clusters stage (see
    # q_doc_dup_clusters — identical rows, no Spark rewrite).
    _copy_stage_parquet(pipe.store, "clusters", _SURV_NODES_PATH)
    cl = spark.read.parquet(_SURV_NODES_PATH)
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("clip_id"), "n_chars"
    )
    return (
        cl.join(d, "clip_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(
                F.when(
                    F.col("clip_id") != F.col("cluster_id"), F.col("n_chars")
                ).otherwise(F.lit(0))
            ).alias("dropped_chars"),
        )
        .select(
            F.col("cluster_id").cast("long").alias("kept_doc_id"),
            "n_members",
            "dropped_chars",
        )
    )


def q_decontam_ngram_hits(spark, sf_dir):
    """Benchmark decontamination — the standard 8-token-gram overlap
    check an LLM training pipeline runs against its eval suites: treat
    sources 'src0'..'src2' as the held-out benchmark, every other source
    as training corpus, and report (corpus_doc, bench_doc, n shared
    distinct 8-grams) for every contaminated pair. Spark plan: JVM-side
    tokenize + slide (transform over sequence — no UDF), explode the
    per-doc DISTINCT gram set, broadcast the benchmark side (eval
    suites are tiny next to a 10^12-doc corpus), hash-join on gram.
    Same shape at 100 TB: the gram join is the substring detector's
    equi-join with the dim side broadcast."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens(_norm(F.col("text")))
    # r6: PERSIST the per-doc distinct-gram arrays — the bench and corpus
    # branches both derive from this frame, and uncached each branch
    # re-ran the regexp tokenization + gram assembly over the whole
    # corpus. The cache holds one array row per doc (pre-explode).
    g_arrays = (
        d.select("doc_id", "source", toks.alias("toks"))
        .filter(F.size("toks") >= 8)
        .select(
            "doc_id",
            "source",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 7),
                    lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, 8)),
                )
            ).alias("grams"),
        )
        .persist()
    )
    bench_srcs = ["src0", "src1", "src2"]
    bench = g_arrays.filter(F.col("source").isin(bench_srcs)).select(
        F.col("doc_id").alias("bench_doc_id"), F.explode("grams").alias("gram")
    )
    corpus = g_arrays.filter(~F.col("source").isin(bench_srcs)).select(
        F.col("doc_id").alias("corpus_doc_id"), F.explode("grams").alias("gram")
    )
    # eval suites are dim-sized next to a training corpus, so the
    # exploded bench grams broadcast by default; a deployment whose
    # suite is too large for executor broadcast memory flips the env
    # knob and gets a shuffle hash join on gram instead (ADVICE r5 #4).
    if os.environ.get("SPARK_GRAFT_DECONTAM_BROADCAST", "1") != "0":
        bench = F.broadcast(bench)
    out = (
        corpus.join(bench, "gram")
        .groupBy("corpus_doc_id", "bench_doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
    )
    return track_persisted(out, [g_arrays])


def q_audio_spectral(spark, sf_dir):
    """Multimodal: FFT spectral shape features (centroid / 85% rolloff /
    flatness / dominant band) over synthetic WAV clips via mapInPandas
    (sf_dir unused: clips are generated deterministically).

    ORACLE-CHECKED at the VALUE level — same idiom as audio_features:
    the rFFT itself has no SQL equivalent (pinned by a naive-DFT golden
    test in tests/test_audio.py), but every FEATURE is a pure function
    of the materialized band-power vector, and DuckDB re-derives all
    four from the same doubles (band centers are exact binary fractions
    — (2k+1)·sr/256 — so both engines compute them exactly; the kernel
    derives tot and the rolloff threshold from the SEQUENTIAL cumsum,
    the same left fold as DuckDB's list_sum, so the discrete rolloff
    band pick is bit-identical across engines — no knife-edge; the
    remaining continuous sums differ only in association order, orders
    of magnitude below the 4/6-dp rounding both sides apply). A wrong
    band-center convention, rolloff cumsum off-by-one, or flatness
    floor drift fails the hash compare."""
    from simhash_spark.functions.audio import spectral_features
    from simhash_spark.sources.synth import make_clips

    clips_pd, _ = make_clips(200, seed=11, dur_ms_range=(300, 800))
    df = spark.createDataFrame(clips_pd[["clip_id", "bytes"]])
    feats = spectral_features(df, keep_bands=True)
    feats.write.mode("overwrite").parquet(_SPECTRAL_AUDIT_PATH)
    side = spark.read.parquet(_SPECTRAL_AUDIT_PATH)
    return side.select(
        "clip_id",
        "sr_hz",
        F.round("spec_centroid_hz", 4).alias("spec_centroid_hz"),
        F.round("rolloff85_hz", 4).alias("rolloff85_hz"),
        F.round("flatness", 6).alias("flatness"),
        "dominant_band",
    )


_DECONTAM_BENCH_SRCS = ("src0", "src1", "src2")


def q_decontam_span_hits(spark, sf_dir):
    """Span-LEVEL benchmark decontamination — the second half of the
    decontamination story next to decontam_ngram_hits' token-gram
    check: for corpus docs sharing a verbatim >= 64-char run with a
    held-out benchmark doc (sources 'src0'..'src2'), report the
    contaminated span LOCALIZED (length + offset in each side's
    normalized text), oriented corpus -> benchmark. Built on the
    suffix-array overlap detector (operators/overlap.py), i.e. the
    exact winnowed-fingerprint index + SA confirm.

    ORACLE-CHECKED: spans, BOTH normalized texts, and BOTH sources are
    materialized to a side parquet; DuckDB re-asserts the span claim
    (substr equality + length bar), re-validates each side's source
    against the documents table, and re-derives the orientation rule
    over the same rows — a wrong offset, a mislabeled source, or a
    flipped orientation fails the hash compare."""
    d = _t(spark, sf_dir, "documents")
    # norm_a/norm_b ride the span cache (keep_norms — r6); only the
    # source columns still need the documents table, and that join ships
    # (id, source) rows, not texts.
    spans = _overlap_spans(spark, sf_dir)
    meta = d.select(F.col("doc_id").alias("id"), "source")
    audit = (
        spans.join(
            meta.select(F.col("id").alias("a"), F.col("source").alias("src_a")),
            "a",
        ).join(
            meta.select(F.col("id").alias("b"), F.col("source").alias("src_b")),
            "b",
        )
    )
    audit.write.mode("overwrite").parquet(_DECONTAM_SPAN_PATH)
    side = spark.read.parquet(_DECONTAM_SPAN_PATH)
    bench = list(_DECONTAM_BENCH_SRCS)
    a_bench = F.col("src_a").isin(bench) & ~F.col("src_b").isin(bench)
    b_bench = F.col("src_b").isin(bench) & ~F.col("src_a").isin(bench)
    return side.filter(a_bench | b_bench).select(
        F.when(b_bench, F.col("a")).otherwise(F.col("b")).alias("corpus_doc_id"),
        F.when(b_bench, F.col("b")).otherwise(F.col("a")).alias("bench_doc_id"),
        "overlap_len",
        F.when(b_bench, F.col("off_a")).otherwise(F.col("off_b")).alias("corpus_off"),
        F.when(b_bench, F.col("off_b")).otherwise(F.col("off_a")).alias("bench_off"),
    )


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tpch_q1": q_tpch_q1,
        "top_docs_per_source": q_top_docs_per_source,
        "customer_revenue": q_customer_revenue,
        "orders_rollup": q_orders_rollup,
        "doc_fingerprint": q_doc_fingerprint,
        "exact_dedup_groups": q_exact_dedup_groups,
        "token_stats": q_token_stats,
        "lang_guess": q_lang_guess,
        "quality_score": q_quality_score,
        "jaccard_neardup_pairs": q_jaccard_neardup_pairs,
        "substring_pairs": q_substring_pairs,
        "cosine_topk": q_cosine_topk,
        "cosine_neardup_pairs": q_cosine_neardup_pairs,
        "events_hourly": q_events_hourly,
        "streaming_events_hourly": q_streaming_events_hourly,
        "events_incremental": q_events_incremental,
        "user_sessions": q_user_sessions,
        "doc_setops": q_doc_setops,
        "token_count_regex": q_token_count_regex,
        "verified_jaccard_pairs": q_verified_jaccard_pairs,
        "minhash_bands": q_minhash_bands,
        "verified_hamming_pairs": q_verified_hamming_pairs,
        "overlap_span_pairs": q_overlap_span_pairs,
        "doc_dup_clusters": q_doc_dup_clusters,
        "verified_dup_pairs": q_verified_dup_pairs,
        "simhash_signatures": q_simhash_signatures,
        "audio_features": q_audio_features,
        "audio_dup_pairs": q_audio_dup_pairs,
        "srp_ann_topk": q_srp_ann_topk,
        "ivf_ann_topk": q_ivf_ann_topk,
        # oracle-checked: DuckDB re-derives per-iter accuracy from the
        # side-parquet weight snapshots (oracle_sql below)
        "classifier_train_eval": q_classifier_train_eval,
        "dedup_survivors": q_dedup_survivors,
        "decontam_ngram_hits": q_decontam_ngram_hits,
        "decontam_span_hits": q_decontam_span_hits,
        "audio_spectral_features": q_audio_spectral,
    }


def oracle_sql() -> dict[str, str]:
    norm = _NORM_SQL.format(c="text")
    toks = _TOKENS_SQL.format(n=norm)
    dtoks = f"list_distinct({toks})"
    lang_hits = ", ".join(
        f"len(list_intersect({dtoks}, {_sql_list(ws)}))::BIGINT AS hits_{lg}"
        for lg, ws in _STOP.items()
    )
    best = "greatest(hits_en, hits_es, hits_de, hits_fr)"
    return {
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
                   CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_c4,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_docs_per_source": """
            SELECT source, doc_id, n_chars, rnk FROM (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rnk
              FROM documents) WHERE rnk <= 3
        """,
        "customer_revenue": """
            SELECT c_custkey,
                   CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c4,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey HAVING count(DISTINCT o_orderkey) >= 3
        """,
        "orders_rollup": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "doc_fingerprint": f"""
            SELECT doc_id, md5({norm}) AS fingerprint,
                   length({norm})::BIGINT AS norm_len
            FROM documents
        """,
        "exact_dedup_groups": f"""
            SELECT md5({norm}) AS fingerprint, count(*) AS n_dups,
                   min(doc_id) AS keep_doc_id
            FROM documents GROUP BY 1 HAVING count(*) >= 2
        """,
        "token_stats": f"""
            SELECT doc_id,
                   len({toks})::BIGINT AS n_tokens,
                   len({dtoks})::BIGINT AS n_distinct_tokens,
                   list_max(list_transform({toks}, t -> length(t)))::BIGINT AS max_token_len
            FROM documents
        """,
        "lang_guess": f"""
            SELECT doc_id, lang, hits_en, hits_es, hits_de, hits_fr,
                   CASE WHEN {best} = 0 THEN 'und'
                        WHEN hits_en = {best} THEN 'en'
                        WHEN hits_es = {best} THEN 'es'
                        WHEN hits_de = {best} THEN 'de'
                        ELSE 'fr' END AS lang_guess
            FROM (SELECT doc_id, lang, {lang_hits} FROM documents)
        """,
        "quality_score": f"""
            SELECT *, round(n_stopwords::DOUBLE / n_words::DOUBLE, 6) AS stop_ratio
            FROM (
              SELECT doc_id,
                     length({norm})::BIGINT AS n_chars_norm,
                     len(regexp_extract_all({norm}, '[.,!?;:]'))::BIGINT AS n_punct,
                     len({toks})::BIGINT AS n_words,
                     len(list_intersect({dtoks}, {_sql_list(_STOP["en"])}))::BIGINT AS n_stopwords
              FROM documents)
        """,
        "jaccard_neardup_pairs": f"""
            WITH base AS (SELECT doc_id, lang, {dtoks} AS toks FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b, a.lang AS lang,
                   round(len(list_intersect(a.toks, b.toks))::DOUBLE
                         / len(list_distinct(list_concat(a.toks, b.toks)))::DOUBLE, 6) AS jaccard
            FROM base a JOIN base b ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE round(len(list_intersect(a.toks, b.toks))::DOUBLE
                        / len(list_distinct(list_concat(a.toks, b.toks)))::DOUBLE, 6) >= 0.8
        """,
        "substring_pairs": f"""
            WITH base AS (SELECT doc_id, {norm} AS nt FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM base a, base b
            WHERE a.doc_id != b.doc_id AND length(a.nt) >= 64
              AND length(a.nt) < length(b.nt) AND contains(b.nt, a.nt)
        """,
        "cosine_topk": """
            WITH ed AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb FROM embeddings),
                 q AS (SELECT emb AS qemb FROM ed WHERE vec_id = 0),
                 scored AS (
                   SELECT vec_id,
                          list_dot_product(emb, qemb)
                          / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qemb, qemb))) AS sim
                   FROM ed, q WHERE vec_id != 0)
            SELECT vec_id, rnk FROM (
              SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rnk FROM scored)
            WHERE rnk <= 20
        """,
        "cosine_neardup_pairs": """
            WITH ed AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb FROM embeddings)
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM ed a, ed b
            WHERE a.vec_id < b.vec_id
              AND list_dot_product(a.emb, b.emb)
                  / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) >= 0.45
        """,
        "events_hourly": """
            SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c
            FROM events GROUP BY 1, 2
        """,
        "streaming_events_hourly": """
            SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c
            FROM events
            GROUP BY 1, 2
            HAVING epoch(date_trunc('hour', min(ts)))::BIGINT + 3600
                   <= (SELECT epoch(max(ts))::BIGINT - 3600 FROM events)
        """,
        "events_incremental": """
            SELECT event_type, count(*) AS n, min(event_id) AS first_id
            FROM events
            WHERE event_id > (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) FROM events)
            GROUP BY event_type
        """,
        "user_sessions": """
            WITH g AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS sess_start
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id,
                     sum(sess_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
              FROM g)
            SELECT user_id, max(sess_id)::BIGINT AS n_sessions, count(*) AS n_events
            FROM s GROUP BY user_id
        """,
        "token_count_regex": f"""
            SELECT doc_id,
                   len(regexp_extract_all({norm}, '[a-z0-9]+'))::BIGINT AS n_word_tokens,
                   len(regexp_extract_all({norm}, '[^a-z0-9 ]'))::BIGINT AS n_sym_tokens
            FROM documents
        """,
        "doc_setops": """
            (SELECT doc_id FROM documents WHERE n_chars > 400
             UNION
             SELECT doc_id FROM documents WHERE source = 'src0')
            EXCEPT
            SELECT DISTINCT doc_id FROM documents WHERE lang = 'en'
        """,
        "verified_hamming_pairs": f"""
            SELECT a, b,
                   bit_count(xor(sig_a, sig_b))::INTEGER AS hamming
            FROM read_parquet('{_HAMMING_AUDIT_PATH}/*.parquet')
            WHERE bit_count(xor(sig_a, sig_b)) <= 3
        """,
        "audio_features": f"""
            SELECT clip_id, sr_hz,
                   len(samples)::BIGINT AS n_samples,
                   round(CASE WHEN len(samples) = 0 THEN 0.0
                              ELSE sqrt(list_sum(list_transform(samples,
                                     v -> (v / 32768.0) * (v / 32768.0)))
                                   / len(samples)) END, 6) AS rms,
                   round(CASE WHEN len(samples) <= 1 THEN 0.0
                              ELSE len(list_filter(range(2, len(samples) + 1),
                                     i -> (samples[i] < 0) != (samples[i - 1] < 0)
                                   ))::DOUBLE / (len(samples) - 1) END, 6) AS zcr
            FROM read_parquet('{_AUDIO_FEAT_AUDIT_PATH}/*.parquet')
        """,
        "simhash_signatures": f"""
            WITH s AS (SELECT * FROM read_parquet('{_SIG_AUDIT_PATH}/*.parquet')),
                 fn AS (
                   -- the encoder must be a FUNCTION of norm_text
                   SELECT norm_text FROM s GROUP BY norm_text
                   HAVING count(DISTINCT simhash) = 1),
                 cover AS (
                   SELECT (SELECT count(*) FROM s) = (SELECT count(*) FROM documents)
                      AND (SELECT count(*) FROM s JOIN documents USING (doc_id))
                          = (SELECT count(*) FROM documents)
                      AND (SELECT count(DISTINCT norm_text) FROM s)
                          = (SELECT count(*) FROM fn)
                      -- norm_text re-derived relationally (ASCII rows,
                      -- where casefold/NFC are identity with lower)
                      AND (SELECT count(*) FROM s JOIN documents USING (doc_id)
                           WHERE coalesce(text, '') = regexp_replace(
                                   coalesce(text, ''), '[^\\x00-\\x7F]', '', 'g')
                             AND s.norm_text != {_NORM_SQL.format(c="coalesce(text, '')")}
                          ) = 0 AS ok)
            SELECT s.doc_id, s.simhash FROM s, cover WHERE cover.ok
        """,
        "classifier_train_eval": f"""
            WITH ex AS (SELECT *
                        FROM read_parquet('{_CLS_AUDIT_DIR}/examples/*.parquet')),
                 wt AS (SELECT *
                        FROM read_parquet('{_CLS_AUDIT_DIR}/weights/*.parquet')),
                 -- iteration it scores train vs snap it-1 (epoch start)
                 -- and test vs snap it (epoch end)
                 need AS (
                   SELECT it, 'train' AS split, it - 1 AS snap
                   FROM generate_series(1, 5) t(it)
                   UNION ALL
                   SELECT it, 'test' AS split, it AS snap
                   FROM generate_series(1, 5) t(it)),
                 -- logit per (iteration, example, label): sum of the
                 -- example's active-column weights (multiplicity kept
                 -- by the exploded rows) + bias (col = -1); softmax is
                 -- monotone so argmax over logits is the prediction
                 sc AS (
                   SELECT n.it, n.split, n.snap, e.ex_id,
                          any_value(e.y) AS y, w.lab, sum(w.w) AS s
                   FROM need n
                   JOIN ex e ON e.split = n.split
                   JOIN wt w ON w.snap = n.snap AND w.col = e.col
                   GROUP BY n.it, n.split, n.snap, e.ex_id, w.lab),
                 pred AS (
                   SELECT sc.it, sc.split, sc.ex_id, any_value(sc.y) AS y,
                          (array_agg(sc.lab
                             ORDER BY sc.s + b.w DESC, sc.lab ASC))[1] AS p
                   FROM sc JOIN wt b
                     ON b.snap = sc.snap AND b.lab = sc.lab AND b.col = -1
                   GROUP BY sc.it, sc.split, sc.ex_id),
                 acc AS (
                   SELECT it, split, count(*) AS n,
                          round(avg(CASE WHEN p = y THEN 1.0 ELSE 0.0 END),
                                6) AS a
                   FROM pred GROUP BY it, split)
            SELECT t.it::INTEGER AS iteration,
                   tr.n::BIGINT AS train_count,
                   coalesce(te.n, 0)::BIGINT AS test_count,
                   tr.a AS train_accuracy,
                   te.a AS test_accuracy
            FROM generate_series(1, 5) t(it)
            LEFT JOIN acc tr ON tr.it = t.it AND tr.split = 'train'
            LEFT JOIN acc te ON te.it = t.it AND te.split = 'test'
        """,
        "minhash_bands": f"""
            WITH b AS (SELECT * FROM read_parquet('{_BANDS_AUDIT_PATH}/*.parquet')),
                 ok AS (
                   SELECT doc_id FROM b GROUP BY doc_id
                   HAVING count(*) = 32 AND count(DISTINCT band_id) = 32
                      AND min(band_id) = 0 AND max(band_id) = 31),
                 cover AS (
                   -- TRUE iff the band table covers exactly the documents ids
                   SELECT (SELECT count(*) FROM ok) = (SELECT count(*) FROM documents)
                      AND (SELECT count(*) FROM ok JOIN documents USING (doc_id))
                          = (SELECT count(*) FROM documents) AS full_cover)
            SELECT b.doc_id, b.band_id, b.band_hash
            FROM b JOIN ok USING (doc_id), cover
            WHERE cover.full_cover
        """,
        "verified_dup_pairs": f"""
            WITH s AS (
              SELECT a, b, det, method, norm_a, norm_b, sig_a, sig_b,
                     list_distinct(
                       CASE WHEN length(norm_a) = 0 THEN []
                            WHEN length(norm_a) <= 5 THEN [norm_a]
                            ELSE list_transform(range(1, length(norm_a) - 3),
                                                i -> substr(norm_a, i, 5)) END) AS sa,
                     list_distinct(
                       CASE WHEN length(norm_b) = 0 THEN []
                            WHEN length(norm_b) <= 5 THEN [norm_b]
                            ELSE list_transform(range(1, length(norm_b) - 3),
                                                i -> substr(norm_b, i, 5)) END) AS sb
              FROM read_parquet('{_VERIFY_AUDIT_PATH}/*.parquet')),
            j AS (SELECT *, len(list_intersect(sa, sb)) AS i FROM s)
            SELECT a, b, det, method FROM j
            WHERE (method = 'exact' AND norm_a = norm_b)
               OR (method = 'hamming' AND bit_count(xor(sig_a, sig_b)) <= 3)
               OR (method = 'jaccard' AND
                   (CASE WHEN len(sa) = 0 AND len(sb) = 0 THEN 1.0
                         WHEN len(sa) = 0 OR len(sb) = 0 THEN 0.0
                         ELSE i::DOUBLE / (len(sa) + len(sb) - i)::DOUBLE
                    END) >= 0.8)
               OR (method = 'substring' AND
                   (CASE WHEN length(norm_a) <= length(norm_b)
                         THEN length(norm_a) >= 64 AND contains(norm_b, norm_a)
                         ELSE length(norm_b) >= 64 AND contains(norm_a, norm_b)
                    END))
        """,
        "doc_dup_clusters": f"""
            WITH RECURSIVE und AS (
              SELECT a, b FROM read_parquet('{_CC_EDGES_PATH}/*.parquet')
              UNION
              SELECT b AS a, a AS b FROM read_parquet('{_CC_EDGES_PATH}/*.parquet')),
            walk(node, lbl) AS (
              SELECT clip_id, clip_id FROM read_parquet('{_CC_NODES_PATH}/*.parquet')
              UNION
              SELECT und.b, walk.lbl FROM walk JOIN und ON und.a = walk.node)
            SELECT node AS clip_id, min(lbl) AS cluster_id
            FROM walk GROUP BY node
        """,
        "overlap_span_pairs": f"""
            SELECT a, b, overlap_len, off_a, off_b
            FROM read_parquet('{_OVERLAP_AUDIT_PATH}/*.parquet')
            WHERE overlap_len >= 64
              AND substr(norm_a, off_a::INTEGER + 1, overlap_len::INTEGER)
                  = substr(norm_b, off_b::INTEGER + 1, overlap_len::INTEGER)
        """,
        "verified_jaccard_pairs": f"""
            WITH base AS (
              SELECT CAST(doc_id AS VARCHAR) AS id, {norm} AS nt FROM documents
              WHERE length({norm}) > 0),
            sh AS (
              SELECT id, list_distinct(
                CASE WHEN length(nt) <= 5 THEN [nt]
                     ELSE list_transform(range(1, length(nt) - 3),
                                         i -> substr(nt, i, 5)) END) AS s
              FROM base)
            SELECT a, b, jaccard FROM (
              SELECT a.id AS a, b.id AS b,
                     round(len(list_intersect(a.s, b.s))::DOUBLE
                           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE,
                           6) AS jaccard
              FROM sh a JOIN sh b ON a.id < b.id)
            WHERE jaccard >= 0.8
        """,
        # BER match rule over the side-parquet fingerprint pairs (the
        # HK STFT kernel has no SQL equivalent; the xor/popcount/
        # threshold rule does — same idiom as verified_hamming_pairs).
        "audio_dup_pairs": f"""
            WITH scored AS (
              SELECT a, b,
                     least(len(fps_a), len(fps_b)) AS n_cmp,
                     list_sum(list_transform(
                       range(1, least(len(fps_a), len(fps_b)) + 1),
                       i -> bit_count(xor(fps_a[i], fps_b[i])))) AS bad_bits
              FROM read_parquet('{_AUDIO_FP_AUDIT_PATH}/*.parquet'))
            SELECT a, b,
                   round(bad_bits::DOUBLE / (n_cmp * 16)::DOUBLE, 6) AS ber
            FROM scored
            WHERE bad_bits::DOUBLE / (n_cmp * 16)::DOUBLE < 0.25
        """,
        # Exact-cosine rerank of the side-parquet SRP candidate set (the
        # SRP hash kernel has no SQL equivalent; given the candidate set
        # the top-k rule does). Queries are embeddings vec_id < 3, same
        # as q_srp_ann_topk.
        "srp_ann_topk": f"""
            WITH ed AS (SELECT vec_id,
                               list_transform(embedding, x -> x::DOUBLE) AS emb
                        FROM embeddings),
                 cand AS (SELECT query_id, vec_id
                          FROM read_parquet('{_SRP_CAND_PATH}/*.parquet')),
                 q AS (SELECT vec_id AS query_id, emb AS qemb FROM ed
                       WHERE vec_id < 3),
                 scored AS (
                   SELECT c.query_id, c.vec_id,
                          list_dot_product(v.emb, q.qemb)
                          / (sqrt(list_dot_product(v.emb, v.emb))
                             * sqrt(list_dot_product(q.qemb, q.qemb))) AS sim
                   FROM cand c JOIN ed v ON c.vec_id = v.vec_id
                   JOIN q ON c.query_id = q.query_id)
            SELECT query_id, vec_id, rnk FROM (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id ASC) AS rnk
              FROM scored)
            WHERE rnk <= 10
        """,
        # IVF rerank oracle: identical rule to srp_ann_topk, over the
        # IVF cell-probe candidate side parquet.
        "ivf_ann_topk": f"""
            WITH ed AS (SELECT vec_id,
                               list_transform(embedding, x -> x::DOUBLE) AS emb
                        FROM embeddings),
                 cand AS (SELECT query_id, vec_id
                          FROM read_parquet('{_IVF_CAND_PATH}/*.parquet')),
                 q AS (SELECT vec_id AS query_id, emb AS qemb FROM ed
                       WHERE vec_id < 3),
                 scored AS (
                   SELECT c.query_id, c.vec_id,
                          list_dot_product(v.emb, q.qemb)
                          / (sqrt(list_dot_product(v.emb, v.emb))
                             * sqrt(list_dot_product(q.qemb, q.qemb))) AS sim
                   FROM cand c JOIN ed v ON c.vec_id = v.vec_id
                   JOIN q ON c.query_id = q.query_id)
            SELECT query_id, vec_id, rnk FROM (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id ASC) AS rnk
              FROM scored)
            WHERE rnk <= 10
        """,
        # same fixpoint walk as doc_dup_clusters, extended with the
        # keep-min canonical rule + the documents join for the
        # dropped-volume accounting
        "dedup_survivors": f"""
            WITH RECURSIVE und AS (
              SELECT a, b FROM read_parquet('{_SURV_EDGES_PATH}/*.parquet')
              UNION
              SELECT b AS a, a AS b FROM read_parquet('{_SURV_EDGES_PATH}/*.parquet')),
            walk(node, lbl) AS (
              SELECT clip_id, clip_id FROM read_parquet('{_SURV_NODES_PATH}/*.parquet')
              UNION
              SELECT und.b, walk.lbl FROM walk JOIN und ON und.a = walk.node),
            comp AS (SELECT node, min(lbl) AS cluster_id FROM walk GROUP BY node)
            SELECT CAST(comp.cluster_id AS BIGINT) AS kept_doc_id,
                   count(*)::BIGINT AS n_members,
                   CAST(sum(CASE WHEN comp.node <> comp.cluster_id
                                 THEN d.n_chars ELSE 0 END) AS BIGINT)
                     AS dropped_chars
            FROM comp JOIN documents d ON d.doc_id = CAST(comp.node AS BIGINT)
            GROUP BY comp.cluster_id
        """,
        "decontam_ngram_hits": f"""
            WITH tk AS (SELECT doc_id, source, {toks} AS toks FROM documents),
            g AS (
              SELECT doc_id, source,
                     unnest(list_distinct(list_transform(
                       range(1, len(toks) - 6),
                       i -> array_to_string(toks[i:i+7], ' ')))) AS gram
              FROM tk WHERE len(toks) >= 8)
            SELECT c.doc_id AS corpus_doc_id, b.doc_id AS bench_doc_id,
                   count(*)::BIGINT AS n_shared_grams
            FROM g c JOIN g b ON c.gram = b.gram
            WHERE c.source NOT IN ('src0', 'src1', 'src2')
              AND b.source IN ('src0', 'src1', 'src2')
            GROUP BY c.doc_id, b.doc_id
        """,
        # span claim re-asserted, sources re-validated against documents,
        # orientation re-derived — all over the same side parquet
        "decontam_span_hits": f"""
            WITH s AS (
              SELECT p.*,
                     (p.src_a IN ('src0','src1','src2')
                      AND p.src_b NOT IN ('src0','src1','src2')) AS a_bench,
                     (p.src_b IN ('src0','src1','src2')
                      AND p.src_a NOT IN ('src0','src1','src2')) AS b_bench
              FROM read_parquet('{_DECONTAM_SPAN_PATH}/*.parquet') p
              JOIN documents da ON da.doc_id = p.a AND da.source = p.src_a
              JOIN documents db ON db.doc_id = p.b AND db.source = p.src_b
              WHERE p.overlap_len >= 64
                AND substr(p.norm_a, p.off_a::INTEGER + 1, p.overlap_len::INTEGER)
                    = substr(p.norm_b, p.off_b::INTEGER + 1, p.overlap_len::INTEGER))
            SELECT CASE WHEN b_bench THEN a ELSE b END AS corpus_doc_id,
                   CASE WHEN b_bench THEN b ELSE a END AS bench_doc_id,
                   overlap_len,
                   CASE WHEN b_bench THEN off_a ELSE off_b END AS corpus_off,
                   CASE WHEN b_bench THEN off_b ELSE off_a END AS bench_off
            FROM s WHERE a_bench OR b_bench
        """,
        # every feature re-derived from the materialized band-power
        # doubles; band centers (2k+1)*sr/256 are exact binary fractions
        # so both engines agree bit-for-bit on them
        "audio_spectral_features": f"""
            WITH t AS (SELECT clip_id, sr_hz, bands, list_sum(bands) AS tot
                       FROM read_parquet('{_SPECTRAL_AUDIT_PATH}/*.parquet'))
            SELECT clip_id, sr_hz,
                   round(CASE WHEN tot IS NULL OR tot = 0 THEN 0.0
                         ELSE list_sum(list_transform(range(1, 65),
                                k -> ((k - 0.5) * (sr_hz / 2.0) / 64) * bands[k]))
                              / tot END, 4) AS spec_centroid_hz,
                   round(CASE WHEN tot IS NULL OR tot = 0 THEN 0.0
                         ELSE (list_filter(range(1, 65),
                                 i -> list_sum(bands[1:i]) >= 0.85 * tot)[1]
                               - 0.5) * (sr_hz / 2.0) / 64 END, 4) AS rolloff85_hz,
                   round(CASE WHEN tot IS NULL OR tot = 0 THEN 0.0
                         ELSE exp(list_sum(list_transform(bands,
                                v -> ln(v + 1e-12))) / 64)
                              / (tot / 64 + 1e-12) END, 6) AS flatness,
                   (CASE WHEN tot IS NULL OR tot = 0 THEN 1
                         ELSE list_position(bands, list_max(bands)) END - 1
                   )::BIGINT AS dominant_band
            FROM t
        """,
    }
