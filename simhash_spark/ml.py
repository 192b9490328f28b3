"""Learned classification path — Spark-first analog of the reference's
``v2-train`` / ``v2-test`` / ``v2-infer`` pipeline.

Reference parity map (SURVEY.md §2.1 E2-E5, L1, S4, K1, K2):

  E2 encoder opts    /root/reference/src/Htm/SimHashDocumentEncoder.hsc:40-52
                     (size, sparsity, tokenSimilarity) -> V2Opts
  E3 SpatialPooler   /root/reference/src/Htm/V2.hs:97-108 (SP.compute over
                     column_size columns) -> analog: FIXED seeded
                     random-projection pooler (an untrained SP): every
                     column owns a random receptive field over the encoder
                     bits, column overlap = active inputs in field, top
                     2% columns by overlap win. Boosting/permanence
                     learning is intentionally omitted (documented
                     simplification — the fixed pooler is a pure LSH
                     expansion, deterministic and shardable).
  E4/E5 classifier   Clsr.learn / Clsr.infer (SDRClassifier = online
                     softmax regression over active columns; Numenta
                     docs, public) -> softmax regression trained by
                     DISTRIBUTED LOCAL SGD with parameter averaging
                     (iterative parameter mixing, Mann et al./McDonald et
                     al., public): each epoch every partition runs the
                     same per-sample online update the serving path uses,
                     starting from the broadcast weights; the driver
                     averages the per-partition deltas (weighted by row
                     count) and re-broadcasts the (column_size x
                     n_labels) matrix. One scan per epoch, no shuffle.
  L1 train loop      trainAndValid /root/reference/src/Htm/Model.hs:105-128
                     (iterate, per-iter stats)
  S4 YAML opts       getV2Opts /root/reference/src/Htm/V2.hs:111-116 —
                     ``<model>.opts.yml``, DEFAULTS ON PARSE FAILURE
  K1 atomic save     saveV2 /root/reference/src/Htm/V2.hs:88-94 (write
                     ``<file>.1`` then rename)
  K2 stats sink      saveStatsToFile -> ``<model>.stats.json`` per iter

Scale notes: the weight matrix is column_size x n_labels (1600 x L) —
broadcastable at any corpus size; each training epoch is one full scan
with map-side gradient partials (no shuffle); encoding is an Arrow
pandas UDF over the corpus. Nothing here collects rows to the driver.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simhash_spark import reference as R

#: Pooler constants (model semantics, pinned like config.py's signature
#: constants; changing them invalidates saved models).
POOL_SPARSITY = 0.02          # fraction of columns active per sample
POOL_POTENTIAL = 0.5          # fraction of encoder bits in each column's field
POOL_SEED = 0x5EED_C015       # receptive-field RNG seed
_MODEL_VERSION = 1


# ---------------------------------------------------------------------------
# S4 — YAML options source (defaults on parse failure)
# ---------------------------------------------------------------------------


@dataclass
class V2Opts:
    """Reference defaults (/root/reference/src/Htm/V2.hs:54-62,
    README.md:104-111)."""

    column_size: int = 1600
    size: int = 600
    sparsity: float = 0.2
    token_similarity: bool = True

    @property
    def active_bits(self) -> int:
        return max(1, int(self.size * self.sparsity))

    @property
    def active_cols(self) -> int:
        return max(1, int(round(self.column_size * POOL_SPARSITY)))

    def to_dict(self) -> dict:
        return {
            "column_size": self.column_size,
            "size": self.size,
            "sparsity": self.sparsity,
            "token_similarity": self.token_similarity,
        }


def load_v2_opts(path: str) -> V2Opts:
    """Read ``<model>.opts.yml``; ANY failure (missing file, bad syntax,
    wrong types) returns the defaults — exact getV2Opts semantics
    (``decodeFileEither`` Left -> ``pure v2Opts``). The expected shape::

        column_size: 1600
        encoder:
          size: 600
          sparsity: 0.2
          token_similarity: true
    """
    try:
        flat: dict[str, str] = {}
        section = None
        with open(path) as f:
            for raw in f:
                line = raw.rstrip("\n")
                if not line.strip() or line.lstrip().startswith("#"):
                    continue
                key, _, val = line.partition(":")
                if not _:
                    raise ValueError(f"not key: value — {line!r}")
                indented = line[0] in " \t"
                key, val = key.strip(), val.strip()
                if val == "":
                    section = key
                    continue
                flat[f"{section}.{key}" if indented and section else key] = val

        def _get(name, cast, default):
            if name not in flat:
                return default
            v = flat[name]
            if cast is bool:
                if v.lower() in ("true", "yes", "on"):
                    return True
                if v.lower() in ("false", "no", "off"):
                    return False
                raise ValueError(v)
            return cast(v)

        d = V2Opts()
        return V2Opts(
            column_size=_get("column_size", int, d.column_size),
            size=_get("encoder.size", int, d.size),
            sparsity=_get("encoder.sparsity", float, d.sparsity),
            token_similarity=_get("encoder.token_similarity", bool, d.token_similarity),
        )
    except Exception:
        return V2Opts()


# ---------------------------------------------------------------------------
# E2+E3 — encoder + pooler numpy kernels (shared by the Spark UDFs and the
# single-item serving path: zero drift)
# ---------------------------------------------------------------------------


def _encode_bits(texts: list, opts: V2Opts) -> list[np.ndarray]:
    """Parameterized variant of reference.sdr_encode: per text, the
    sorted indices of the top ``active_bits`` encoder bits by
    feature-weight vote. token_similarity=False drops char shingles
    (token-level features only), mirroring the reference toggle."""
    n_words = (opts.size + 63) // 64
    out = []
    for t in texts:
        nt = R.normalize_text(t)
        feats: dict[str, int] = {}
        for tok in R.tokenize(nt):
            feats[tok] = feats.get(tok, 0) + 1
        if opts.token_similarity:
            from simhash_spark import config as C

            for sh in R.char_shingles(nt, C.CHAR_SHINGLE_K):
                feats[sh] = feats.get(sh, 0) + 1
        votes = np.zeros(opts.size, dtype=np.int64)
        if feats:
            names = list(feats.keys())
            weights = np.asarray(list(feats.values()), dtype=np.int64)
            hs = R.hash64_batch(names)
            words = np.empty((len(hs), n_words), dtype=np.uint64)
            cur = hs.copy()
            for w in range(n_words):
                words[:, w] = cur
                cur = R._mix64(cur + np.uint64(w + 1))
            shifts = np.arange(64, dtype=np.uint64)
            bits = (
                (words[:, :, None] >> shifts[None, None, :]) & np.uint64(1)
            ).reshape(len(hs), n_words * 64)[:, : opts.size]
            votes = ((2 * bits.astype(np.int64) - 1) * weights[:, None]).sum(axis=0)
        order = np.argsort(-votes, kind="stable")
        out.append(np.sort(order[: opts.active_bits]).astype(np.int32))
    return out


def _pool_matrix(opts: V2Opts) -> np.ndarray:
    """(column_size, size) boolean receptive fields, fixed by POOL_SEED."""
    rng = np.random.Generator(np.random.PCG64(POOL_SEED))
    return rng.random((opts.column_size, opts.size)) < POOL_POTENTIAL


def _active_columns(bit_rows: list[np.ndarray], opts: V2Opts, pool: np.ndarray) -> np.ndarray:
    """active encoder bits -> (n, active_cols) winner column indices
    (top overlap, stable ties by lower column index)."""
    n = len(bit_rows)
    cols = np.empty((n, opts.active_cols), dtype=np.int32)
    for i, bits in enumerate(bit_rows):
        overlap = pool[:, bits].sum(axis=1) if len(bits) else np.zeros(opts.column_size)
        order = np.argsort(-overlap, kind="stable")
        cols[i] = np.sort(order[: opts.active_cols])
    return cols


def _active_columns_boosted(
    bit_rows: list[np.ndarray], opts: V2Opts, connected: np.ndarray, boost: np.ndarray
) -> np.ndarray:
    """Winner columns by BOOSTED overlap over CONNECTED synapses — the
    frozen-inference view of a (possibly trained) SpatialPooler; used by
    both the serving kernel and the broadcast-snapshot pandas UDF so
    batch and single-item encodes cannot drift."""
    n = len(bit_rows)
    cols = np.empty((n, opts.active_cols), dtype=np.int32)
    for i, bits in enumerate(bit_rows):
        overlap = (
            connected[:, bits].sum(axis=1).astype(np.float64)
            if len(bits)
            else np.zeros(opts.column_size)
        )
        order = np.argsort(-(overlap * boost), kind="stable")
        cols[i] = np.sort(order[: opts.active_cols])
    return cols


class SpatialPooler:
    """E3 at full depth — htm.core SpatialPooler learning semantics
    (public algorithm: Cui, Ahmad & Hawkins 2017, "The HTM Spatial
    Pooler"; htm.core SpatialPooler.cpp), numpy-vectorized. The
    reference trains its SP during v2 learning — ``SP.compute … True``
    (/root/reference/src/Htm/V2.hs:97-102) — and this reproduces the
    three learned behaviors on top of the fixed seeded potential pool:

      permanence adaptation  winners' synapses to ACTIVE inputs +inc,
                             to inactive inputs -dec, clipped to [0,1];
                             a synapse is connected iff perm >= thresh
      duty-cycle tracking    per-column moving average of activity
      exponential boosting   factor = exp((target_density - duty) * strength)

    Defaults follow htm.core's (synPermConnected .1, ActiveInc .05,
    InactiveDec .008, dutyCyclePeriod 1000); boost_strength defaults >0
    so starved columns recover (htm.core ships 0.0 = off — configurable
    here the same way). With ``learn=False`` throughout, behavior
    reduces to a fixed random-projection pooler (the untrained analog
    used when ``sp_learning`` is off)."""

    def __init__(
        self,
        opts: V2Opts,
        seed: int = POOL_SEED,
        syn_perm_connected: float = 0.1,
        syn_perm_active_inc: float = 0.05,
        syn_perm_inactive_dec: float = 0.008,
        boost_strength: float = 2.0,
        duty_cycle_period: int = 1000,
    ):
        self.opts = opts
        self.spc = syn_perm_connected
        self.inc = syn_perm_active_inc
        self.dec = syn_perm_inactive_dec
        self.boost_strength = boost_strength
        self.duty_cycle_period = duty_cycle_period
        self.potential = _pool_matrix(opts)
        rng = np.random.Generator(np.random.PCG64(seed + 1))
        self.perm = np.where(
            self.potential,
            rng.uniform(0.0, 2.0 * syn_perm_connected, self.potential.shape),
            0.0,
        )
        self.boost = np.ones(opts.column_size, dtype=np.float64)
        self.active_dc = np.zeros(opts.column_size, dtype=np.float64)
        self.t = 0
        self._connected: np.ndarray | None = None

    @property
    def connected(self) -> np.ndarray:
        if self._connected is None:
            self._connected = self.perm >= self.spc
        return self._connected

    def compute(self, bits: np.ndarray, learn: bool = False) -> np.ndarray:
        """active encoder bits -> sorted winner columns; optionally learn."""
        cols = _active_columns_boosted([bits], self.opts, self.connected, self.boost)[0]
        if learn and len(bits):
            active = np.zeros(self.opts.size, dtype=bool)
            active[bits] = True
            delta = np.where(active[None, :], self.inc, -self.dec) * self.potential[cols]
            self.perm[cols] = np.clip(self.perm[cols] + delta, 0.0, 1.0)
            self._connected = None
            period = min(self.duty_cycle_period, self.t + 1)
            act = np.zeros(self.opts.column_size, dtype=np.float64)
            act[cols] = 1.0
            self.active_dc = (self.active_dc * (period - 1) + act) / period
            target = self.opts.active_cols / self.opts.column_size
            self.boost = np.exp((target - self.active_dc) * self.boost_strength)
            self.t += 1
        return cols


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# E4/E5 + L1 — the classifier
# ---------------------------------------------------------------------------


class SimHashClassifier:
    """Softmax classifier over pooled SDR columns (the reference model's
    encoder->SP->SDRClassifier chain, Spark-first)."""

    def __init__(self, opts: V2Opts | None = None, sp_learning: bool = False):
        self.opts = opts or V2Opts()
        self.labels: list[str] = []  # D1: first-seen order
        self.W = np.zeros((self.opts.column_size, 0), dtype=np.float64)
        self.b = np.zeros(0, dtype=np.float64)
        self._pool = _pool_matrix(self.opts)
        # E3 depth: sp_learning=True trains htm.core permanences/boosts
        # on every learn_one (the reference's SP.compute learn=True path);
        # off (default) keeps the fixed random-projection pooler.
        self.sp = SpatialPooler(self.opts) if sp_learning else None

    # -- label dictionary (D1) ------------------------------------------
    def _label_idx(self, label: str) -> int:
        try:
            return self.labels.index(label)
        except ValueError:
            self.labels.append(label)
            self.W = np.hstack([self.W, np.zeros((self.opts.column_size, 1))])
            self.b = np.append(self.b, 0.0)
            return len(self.labels) - 1

    # -- numpy kernels (serving + UDF-shared) ---------------------------
    def encode_cols(self, texts: list) -> np.ndarray:
        bit_rows = _encode_bits(texts, self.opts)
        if self.sp is not None:
            return _active_columns_boosted(
                bit_rows, self.opts, self.sp.connected, self.sp.boost
            )
        return _active_columns(bit_rows, self.opts, self._pool)

    def scores(self, texts: list) -> np.ndarray:
        """(n, n_labels) softmax probabilities."""
        cols = self.encode_cols(texts)
        logits = self.W[cols].sum(axis=1) + self.b
        return _softmax(logits)

    def infer_one(self, msg: str, k: int = 10) -> list[tuple[str, float]]:
        """E5 + O1/O2: top-k (label, score), score desc — the reference
        runner's reply shape (take 10 infers)."""
        if not self.labels:
            return []
        p = self.scores([msg])[0]
        order = np.argsort(-p, kind="stable")[:k]
        return [(self.labels[i], float(p[i])) for i in order]

    def learn_one(self, label: str, msg: str, lr: float = 0.5) -> None:
        """E4: single-sample online update (the serving learn path).
        With sp_learning, the pooler trains on the same sample first —
        encode -> SP.compute(learn=True) -> classifier learn, the
        reference's exact learn sequence (V2.hs:97-102)."""
        y = self._label_idx(label)
        if self.sp is not None:
            cols = self.sp.compute(_encode_bits([msg], self.opts)[0], learn=True)
        else:
            cols = self.encode_cols([msg])[0]
        p = _softmax((self.W[cols].sum(axis=0) + self.b)[None, :])[0]
        g = p.copy()
        g[y] -= 1.0
        self.W[cols] -= lr * g[None, :]
        self.b -= lr * g

    # -- distributed train/score (the Spark path) -----------------------
    def _encode_udf(self):
        """Pandas UDF over a FROZEN snapshot of the pooler: with
        sp_learning the current connected/boost state is broadcast, so
        every partition encodes identically (permanences do not train
        inside distributed epochs — cross-partition encode consistency;
        SP training happens on the sequential learn_one path, where the
        reference trains it too)."""
        opts = self.opts
        if self.sp is not None:
            connected, boost = self.sp.connected.copy(), self.sp.boost.copy()

            @F.pandas_udf(T.ArrayType(T.IntegerType()))
            def enc(msgs: pd.Series) -> pd.Series:
                cols = _active_columns_boosted(
                    _encode_bits(msgs.tolist(), opts), opts, connected, boost
                )
                return pd.Series(list(cols))

            return enc
        pool = self._pool

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def enc(msgs: pd.Series) -> pd.Series:
            cols = _active_columns(_encode_bits(msgs.tolist(), opts), opts, pool)
            return pd.Series(list(cols))

        return enc

    def transform(self, df: DataFrame, msg_col: str = "msg") -> DataFrame:
        """Batch inference: adds ``scores`` (array<double>, label order =
        self.labels) and ``pred`` (argmax label) columns."""
        W, b, labels = self.W.copy(), self.b.copy(), list(self.labels)

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def score(cols_s: pd.Series) -> pd.Series:
            cols = np.array(cols_s.tolist(), dtype=np.int64)
            p = _softmax(W[cols].sum(axis=1) + b)
            return pd.Series(list(p))

        enc = self._encode_udf()
        scored = df.withColumn("scores", score(enc(F.col(msg_col))))
        label_arr = F.array(*[F.lit(lb) for lb in labels])
        pred = F.element_at(
            label_arr,
            (F.array_position(F.col("scores"), F.array_max("scores"))).cast("int"),
        )
        return scored.withColumn("pred", pred)

    def fit(
        self,
        spark: SparkSession,
        train: DataFrame,
        valid: DataFrame | None = None,
        iters: int = 20,
        lr: float = 0.5,
        stats_path: str | None = None,
        n_partitions: int | None = None,
        audit_sink: str | None = None,
    ) -> list[dict]:
        """L1: full-batch distributed softmax GD for ``iters`` epochs.

        ``train``/``valid``: (line_id, label, msg) — the parsed labeled
        format (operators/labeled.py). Per epoch: ONE mapInPandas scan;
        each partition runs per-sample online SGD from the broadcast
        weights and emits its weight DELTA; the driver applies the
        row-count-weighted average (local SGD / parameter averaging).
        Train accuracy is measured against the epoch-START weights.
        Per-iter stats are written (atomic rename) to ``stats_path``
        (K2, reference <model>.stats.json shape).

        ``n_partitions`` (default: the session's shuffle parallelism)
        sets local-SGD parallelism — training throughput scales with it
        instead of being frozen at a constant (VERDICT r2 #5).
        Reproducibility at a FIXED count comes from a deterministic
        partitioner, not a fixed count: rows are hash-partitioned and
        sorted within partitions by a content key, so the same data +
        same n_partitions always yields the same model; parameter
        averaging keeps accuracy stable across different counts (Mann &
        McDonald et al., distributed perceptron averaging).

        ``audit_sink`` (test/audit hook, bounded corpora only): when set,
        materializes the oracle facts behind the per-iter stats —
        ``<sink>/examples`` (split, ex_id, y, col: the encoded corpora,
        one row per active SDR column) and ``<sink>/weights`` (snap, col,
        lab, w: every epoch-boundary weight snapshot, bias as col = -1)
        — so an external engine can re-derive each iteration's argmax
        predictions and accuracies from first principles (the gate's
        ``classifier_train_eval`` DuckDB oracle). Costs
        O(column_size x labels x iters) driver memory + a full write of
        the encoded corpus; never enable on a production-scale input."""
        from simhash_spark.operators.labeled import label_dictionary

        started_at = time.time()
        # D1 first-seen label dict, computed distributed then pinned.
        for r in label_dictionary(train).orderBy("idx").collect():
            self._label_idx(r["label"])
        labels = list(self.labels)
        lab_to_idx = {lb: i for i, lb in enumerate(labels)}
        n_labels = len(labels)
        opts, pool = self.opts, self._pool

        enc = self._encode_udf()
        # JVM-side label -> idx lookup (tiny literal map; no Python UDF)
        lab_map = F.create_map(
            *[x for lb, i in lab_to_idx.items() for x in (F.lit(lb), F.lit(i))]
        )
        y_col = F.coalesce(lab_map[F.col("label")], F.lit(-1)).cast("int")
        if n_partitions is None:
            n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        encoded = (
            train.select(y_col.alias("y"), enc("msg").alias("cols"))
            .filter(F.col("y") >= 0)
            # deterministic partitioner: hash-assign + in-partition sort by
            # a content key -> same data + same count == same model, at any
            # parallelism (no hardcoded repartition(8))
            .withColumn("sk", F.xxhash64("y", "cols"))
            .repartition(n_partitions, "sk")
            .sortWithinPartitions("sk")
            .drop("sk")
            .localCheckpoint()  # encode ONCE; epochs rescan this
        )
        vcoded = None
        if valid is not None:
            # labels unseen in training keep y = -1: argmax never matches,
            # so they count as INCORRECT (not silently dropped).
            vcoded = valid.select(y_col.alias("y"), enc("msg").alias("cols")).localCheckpoint()
        train_count = encoded.count()
        test_count = vcoded.count() if vcoded is not None else 0

        snaps: list[tuple[np.ndarray, np.ndarray]] = []
        if audit_sink:
            # Oracle facts, part 1: the encoded corpora. ex_id only ties
            # an example's exploded cols rows back together — its value
            # is arbitrary (monotonic ids are assigned per pre-explode
            # row, so the grouping is exact); split disambiguates the
            # two id spaces.
            ex = encoded.select(
                F.lit("train").alias("split"),
                F.monotonically_increasing_id().alias("ex_id"),
                "y",
                "cols",
            )
            if vcoded is not None:
                ex = ex.unionByName(
                    vcoded.select(
                        F.lit("test").alias("split"),
                        F.monotonically_increasing_id().alias("ex_id"),
                        "y",
                        "cols",
                    )
                )
            ex.select(
                "split", "ex_id", "y", F.explode("cols").alias("col")
            ).write.mode("overwrite").parquet(os.path.join(audit_sink, "examples"))
            snaps.append((self.W.copy(), self.b.copy()))

        grad_schema = T.StructType(
            [
                T.StructField("g", T.BinaryType()),
                T.StructField("gb", T.BinaryType()),
                T.StructField("n", T.LongType()),
                T.StructField("correct", T.LongType()),
            ]
        )
        stats_hist: list[dict] = []
        for it in range(iters):
            W, b = self.W.copy(), self.b.copy()

            def sgd_pass(batches, W=W, b=b, lr=lr):
                Wl, bl = W.copy(), b.copy()
                n = correct = 0
                for pdf in batches:
                    cols_m = np.array(pdf["cols"].tolist(), dtype=np.int64)
                    y = pdf["y"].to_numpy()
                    # accuracy vs the epoch-START weights (comparable
                    # across partitions regardless of local progress)
                    p0 = _softmax(W[cols_m].sum(axis=1) + b)
                    correct += int((p0.argmax(axis=1) == y).sum())
                    n += len(y)
                    for i in range(len(y)):  # the SERVING update, per sample
                        c = cols_m[i]
                        p = _softmax((Wl[c].sum(axis=0) + bl)[None, :])[0]
                        p[y[i]] -= 1.0
                        Wl[c] -= lr * p[None, :]
                        bl -= lr * p
                yield pd.DataFrame(
                    {
                        "g": [(Wl - W).tobytes()],
                        "gb": [(bl - b).tobytes()],
                        "n": [n],
                        "correct": [correct],
                    }
                )

            # treeAggregate (depth 2, VERDICT r3 #6): each partition emits
            # ONE (n_cols x n_labels) weight-delta blob; summing them on
            # executors first means the driver receives a single summed
            # delta instead of O(partitions x labels) bytes — at 10^4+
            # labels and hundreds of partitions the old .collect() was a
            # driver bandwidth/OOM choke.
            w_shape, b_shape = W.shape, b.shape

            def _seq(acc, row, w_shape=w_shape):
                dw, db, n, c = acc
                g = np.frombuffer(row["g"], dtype=np.float64).reshape(w_shape)
                gb = np.frombuffer(row["gb"], dtype=np.float64)
                return (dw + row["n"] * g, db + row["n"] * gb, n + row["n"], c + row["correct"])

            def _comb(x, y):
                return (x[0] + y[0], x[1] + y[1], x[2] + y[2], x[3] + y[3])

            zero = (np.zeros(w_shape), np.zeros(b_shape), 0, 0)
            dW, db, n, correct = (
                encoded.mapInPandas(sgd_pass, schema=grad_schema)
                .rdd.treeAggregate(zero, _seq, _comb, depth=2)
            )
            n = n or 1
            train_acc = correct / n
            self.W = W + dW / n
            self.b = b + db / n

            test_acc = None
            if vcoded is not None:
                test_acc = self._eval_encoded(vcoded)
            stats = {
                "iteration": it + 1,
                "iters": iters,
                "train_count": int(train_count),
                "test_count": int(test_count),
                "train_accuracy": round(float(train_acc), 6),
                "test_accuracy": None if test_acc is None else round(float(test_acc), 6),
                "started_at": started_at,
                "finished_at": time.time(),
            }
            stats_hist.append(stats)
            if stats_path:
                _atomic_json(stats_path, stats)
            if audit_sink:
                snaps.append((self.W.copy(), self.b.copy()))
        if audit_sink:
            # Oracle facts, part 2: every epoch-boundary weight snapshot
            # (snap k = weights after k averaged updates; iteration it's
            # train accuracy is scored against snap it-1, its test
            # accuracy against snap it). Bias rides as col = -1.
            frames = []
            for k, (Wk, bk) in enumerate(snaps):
                nc, nl = Wk.shape
                frames.append(
                    pd.DataFrame(
                        {
                            "snap": np.int32(k),
                            "col": np.repeat(np.arange(nc, dtype=np.int32), nl),
                            "lab": np.tile(np.arange(nl, dtype=np.int32), nc),
                            "w": Wk.ravel(),
                        }
                    )
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "snap": np.int32(k),
                            "col": np.full(nl, -1, dtype=np.int32),
                            "lab": np.arange(nl, dtype=np.int32),
                            "w": bk.astype(np.float64),
                        }
                    )
                )
            spark.createDataFrame(pd.concat(frames, ignore_index=True)).write.mode(
                "overwrite"
            ).parquet(os.path.join(audit_sink, "weights"))
        return stats_hist

    def _eval_encoded(self, encoded: DataFrame) -> float:
        W, b = self.W.copy(), self.b.copy()
        schema = T.StructType(
            [T.StructField("n", T.LongType()), T.StructField("correct", T.LongType())]
        )

        def acc_pass(batches):
            for pdf in batches:
                cols = np.array(pdf["cols"].tolist(), dtype=np.int64)
                y = pdf["y"].to_numpy()
                p = _softmax(W[cols].sum(axis=1) + b)
                yield pd.DataFrame(
                    {"n": [len(y)], "correct": [int((p.argmax(axis=1) == y).sum())]}
                )

        # JVM-side sum: one aggregated row reaches the driver, not one per
        # partition (same driver-choke fix as fit's treeAggregate).
        r = (
            encoded.mapInPandas(acc_pass, schema=schema)
            .agg(F.sum("n").alias("n"), F.sum("correct").alias("correct"))
            .first()
        )
        return (r["correct"] or 0) / ((r["n"] or 0) or 1)

    # -- K1: atomic model save/load --------------------------------------
    def save(self, path: str) -> None:
        """Write ``<path>.1`` then rename onto ``<path>`` — the
        reference's atomic save idiom (saveV2)."""
        tmp = path + ".1"
        meta = json.dumps(
            {
                "version": _MODEL_VERSION,
                "labels": self.labels,
                "opts": self.opts.to_dict(),
                "sp_learning": self.sp is not None,
            }
        )
        arrays = {"W": self.W, "b": self.b}
        if self.sp is not None:
            arrays.update(
                sp_perm=self.sp.perm,
                sp_boost=self.sp.boost,
                sp_dc=self.sp.active_dc,
                sp_t=np.array([self.sp.t], dtype=np.int64),
            )
        with open(tmp, "wb") as f:
            np.savez(f, meta=np.frombuffer(meta.encode(), dtype=np.uint8), **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "SimHashClassifier":
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            if meta.get("version") != _MODEL_VERSION:
                raise RuntimeError(
                    f"model {path!r} has version {meta.get('version')}, "
                    f"this build reads version {_MODEL_VERSION}"
                )
            m = cls(V2Opts(**meta["opts"]), sp_learning=meta.get("sp_learning", False))
            m.labels = list(meta["labels"])
            m.W = z["W"].astype(np.float64)
            m.b = z["b"].astype(np.float64)
            if m.sp is not None:
                m.sp.perm = z["sp_perm"].astype(np.float64)
                m.sp.boost = z["sp_boost"].astype(np.float64)
                m.sp.active_dc = z["sp_dc"].astype(np.float64)
                m.sp.t = int(z["sp_t"][0])
                m.sp._connected = None
        return m


def train_and_valid(
    spark: SparkSession,
    train_file: str,
    valid_file: str,
    model_file: str,
    iters: int = 20,
    boot_file: str | None = None,
) -> SimHashClassifier:
    """The ``v2-train`` command: load opts from ``<boot>.opts.yml``
    (defaults on failure), train over the labeled file, validate, write
    per-iter stats to ``<model>.stats.json`` and the model atomically to
    ``model_file`` (trainAndValid, /root/reference/src/Htm/Model.hs:105-128)."""
    from simhash_spark.operators.labeled import read_labeled_file

    base = boot_file or model_file
    opts = load_v2_opts(base + ".opts.yml")
    model = (
        SimHashClassifier.load(boot_file)
        if boot_file and os.path.exists(boot_file)
        else SimHashClassifier(opts)
    )
    train = read_labeled_file(spark, train_file)
    valid = read_labeled_file(spark, valid_file)
    model.fit(
        spark, train, valid, iters=iters, stats_path=model_file + ".stats.json"
    )
    model.save(model_file)
    return model


def _atomic_json(path: str, obj: dict) -> None:
    tmp = path + ".1"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
