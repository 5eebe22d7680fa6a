"""Sequence packing for training pipelines: concatenate documents in a
deterministic global order and slice the token stream into fixed-size
chunks (GPT-style concat-and-chunk packing). Each document learns its
global token offsets, then emits one row per training chunk it overlaps,
with in-document slice bounds — exactly what a tokenize-and-pack job needs
to build fixed-length sequences without ever materializing the
concatenated stream.

Scale design: a naive ``Window.orderBy(key)`` global cumulative sum drags
the whole corpus into ONE partition. Here the prefix sum is two-phase over
DETERMINISTIC order-key buckets: approximate quantile boundaries of the
order key (one cheap driver-side pass) become literals, so a row's bucket
``_pid`` is a pure function of its order key — immune to partitioner
sampling, exchange-reuse config, and re-evaluation (a
``repartitionByRange`` + ``spark_partition_id`` formulation is NOT: its
two plan branches each sample range boundaries independently when
``spark.sql.exchange.reuse`` is off, silently misaligning offsets). The
bucketed window cumsum then costs exactly ONE corpus shuffle (the
window's hash exchange on ``_pid``), and the per-bucket totals branch
reduces map-side to n_buckets rows before its own tiny exchange — the
corpus is scanned twice (column-pruned) but shuffled once.

Reference analogue: none (the reference has no packing operator);
north-star training-pipeline extension per the task brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def token_offsets(
    df: DataFrame,
    token_col: str,
    order_col: str,
    start_col: str = "tok_start",
    end_col: str = "tok_end",
    base_offset: int = 0,
    n_buckets: int | None = None,
) -> DataFrame:
    """Global token offsets ``[tok_start, tok_end)`` of every row under the
    total order given by ``order_col`` (numeric and unique — ties would
    make the order, and thus the offsets, nondeterministic). Adds the two
    columns; equivalent to the single-node ``SUM(tokens) OVER (ORDER BY
    order_col)`` without the single-partition bottleneck.

    ``n_buckets`` bounds per-task state (rows/bucket ~ corpus/n_buckets)
    and costs O(n_buckets) comparisons per row for the bucket id — keep it
    O(1000s); default is the session's parallelism. NOTE: computing the
    boundaries runs ``approxQuantile`` EAGERLY at composition time (one
    narrow scan job) — the returned frame is lazy as usual, but building
    it is not free.

    ``base_offset`` makes the operator resumable for incremental ingest:
    pass the previous batch's running total (its ``max(tok_end)``) and the
    new batch's stream continues where the last one stopped — batch N+1's
    chunks follow batch N's without re-packing history."""
    from pyspark.sql.types import NumericType

    # fail at entry with the column's name, not deep inside approxQuantile
    # (which throws an opaque error on non-numeric columns): a corpus with
    # string doc ids hits this the moment someone defaults order to id_col
    dt = df.schema[order_col].dataType
    if not isinstance(dt, NumericType):
        raise ValueError(
            f"token_offsets: order column {order_col!r} must be numeric "
            f"(got {dt.simpleString()}); hash string keys to a numeric "
            f"surrogate (e.g. xxhash64) or pass a numeric order_col"
        )
    n = n_buckets or max(df.sparkSession.sparkContext.defaultParallelism, 2)
    # quantile boundaries -> literals: the bucket id is a pure function of
    # the ORDER KEY, identical in every plan branch and every re-evaluation
    probs = [i / n for i in range(1, n)]
    bounds = sorted(set(df.approxQuantile(order_col, probs, 0.001)))
    if bounds:
        # Plain sum-of-comparisons, NOT a higher-order function: a lambda
        # holding an outer column reference (F.col(order_col) inside
        # F.aggregate) is not rewritten by DeduplicateRelations when this
        # frame is consumed in two plan branches over a reused LogicalRDD
        # (the foreachBatch case) — Spark 4.1 then fails binding with
        # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND. The expression tree below is
        # the same O(n_buckets) comparisons per row, whole-stage codegen'd.
        v = F.col(order_col).cast("double")
        pid = F.lit(0)
        for b in bounds:
            pid = pid + F.when(v >= F.lit(float(b)), 1).otherwise(0)
    else:  # empty/tiny frame: one bucket
        pid = F.lit(0)
    keyed = df.withColumn("_pid", pid)
    w_local = (
        W.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = keyed.withColumn(
        "_local_end", F.sum(F.col(token_col).cast("long")).over(w_local)
    )
    # Per-bucket totals: partial+final aggregate straight off the scan —
    # reduces to n_buckets rows map-side, so this branch never shuffles
    # the corpus; the prefix window runs over n_buckets rows.
    w_prefix = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    prefix = (
        keyed.groupBy("_pid")
        .agg(F.sum(F.col(token_col).cast("long")).alias("_ptotal"))
        .withColumn(
            "_poffset", F.coalesce(F.sum("_ptotal").over(w_prefix), F.lit(0))
        )
        .select("_pid", "_poffset")
    )
    return (
        local.join(F.broadcast(prefix), "_pid")
        .withColumn(
            end_col,
            F.col("_local_end") + F.col("_poffset") + F.lit(int(base_offset)),
        )
        .withColumn(start_col, F.col(end_col) - F.col(token_col).cast("long"))
        .drop("_pid", "_local_end", "_poffset")
    )


def pack_chunks(
    df: DataFrame,
    id_col: str,
    token_col: str,
    chunk_tokens: int,
    order_col: str | None = None,
    base_offset: int = 0,
) -> DataFrame:
    """Assign documents to fixed-size training chunks: concatenate all
    documents in ``order_col`` order (default: ``id_col``) and cut the
    token stream every ``chunk_tokens``. Returns one row per (document,
    chunk) overlap:

        (id, chunk_id, tok_start, tok_end, doc_tok_start, doc_tok_end)

    where ``doc_tok_[start,end)`` is the in-document token slice that lands
    in ``chunk_id`` — a downstream tokenizer job slices each text by these
    bounds and concatenates within chunk_id to emit fixed-length sequences.
    Zero-token documents emit no rows (nothing to pack). The chunk fan-out
    is a native ``sequence``+``explode`` over the chunk index range — a
    document spanning k chunks emits k rows, and k is bounded by
    ``tokens/chunk_tokens + 1``."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    out = token_offsets(
        df, token_col, order_col or id_col, base_offset=base_offset
    )
    b = F.lit(chunk_tokens)
    # integral `div`, not float division: exact past 2^53 tokens
    first = F.expr(f"tok_start div {int(chunk_tokens)}")
    last = F.expr(f"(tok_end - 1) div {int(chunk_tokens)}")
    exploded = out.filter(F.col(token_col) > 0).select(
        F.col(id_col).alias("id"),
        "tok_start",
        "tok_end",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
    )
    lo = F.greatest(F.col("tok_start"), F.col("chunk_id") * b)
    hi = F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * b)
    return exploded.select(
        "id",
        "chunk_id",
        "tok_start",
        "tok_end",
        (lo - F.col("tok_start")).alias("doc_tok_start"),
        (hi - F.col("tok_start")).alias("doc_tok_end"),
    )


class PackingStore:
    """Incremental packing over arriving batches (the shape of a daily
    crawl or a ``foreachBatch`` streaming sink): persists the running token
    total so each batch's chunks CONTINUE the global stream — batch N+1
    starts exactly where batch N ended, without re-packing history. Mirrors
    the incremental dedup store's design: tiny driver-side state, crash-safe
    via write-then-rename.

    Spans land under ``<path>/spans/batch=<seq>/`` — one subdir per batch,
    written with mode OVERWRITE, where ``<seq>`` comes from the committed
    state file. That makes the spans write IDEMPOTENT: if the spans write
    succeeds but the commit doesn't (crash between the two), the retry
    re-runs the SAME batch seq and REPLACES the orphaned subdir instead of
    appending a second copy of the same spans — no silent duplicate
    training chunks. The running total and the batch seq commit together
    in ``<path>/_running_total`` (atomically replaced). Within one batch,
    ordering follows ``order_col``; ACROSS batches, ordering is arrival
    order — the stream semantics a packer wants."""

    def __init__(self, spark, path: str, chunk_tokens: int,
                 id_col: str = "doc_id", token_col: str = "n_tok",
                 order_col: str | None = None,
                 pin_results: bool = False) -> None:
        import os

        self.spark = spark
        self.path = path
        self.chunk_tokens = chunk_tokens
        self.id_col = id_col
        self.token_col = token_col
        self.order_col = order_col or id_col
        os.makedirs(path, exist_ok=True)
        # Track per-batch localCheckpoint blocks across pack_batch calls
        # (same convention as MinHashDedupStore): each slot keeps its last
        # two generations, so a long-running foreachBatch stream doesn't
        # pin one dead block set per micro-batch. The spans frame RETURNED
        # by pack_batch stays readable through the next pack_batch call;
        # it is also always re-readable from disk via spans().
        # pin_results=True restores session-lifetime pinning (keep=None)
        # for callers holding many batches' returned spans at once.
        from graflo_spark.ops.graphalgo import _RoundCheckpointer

        self._ck = _RoundCheckpointer(
            spark, keep=None if pin_results else 2)

    def _total_file(self) -> str:
        import os

        return os.path.join(self.path, "_running_total")

    def _state(self) -> tuple[int, int]:
        """(running_total, next_batch_seq) from the commit file. Legacy
        single-integer files (pre-idempotency format) read as seq 0."""
        import os

        f = self._total_file()
        if not os.path.exists(f):
            return 0, 0
        with open(f) as fh:
            lines = fh.read().split()
        total = int(lines[0]) if lines else 0
        seq = int(lines[1]) if len(lines) > 1 else 0
        return total, seq

    def running_total(self) -> int:
        return self._state()[0]

    def _migrate_legacy_spans(self) -> None:
        """Pre-idempotency stores wrote span parquet files FLAT under
        ``spans/``; mixing those with ``batch=<seq>/`` subdirs breaks Spark
        partition discovery (conflicting directory depths), and a seq-0
        overwrite would silently replace the legacy history. Move the flat
        files into ``spans/batch=0/`` once, with the bumped state file
        (total, max(seq, 1)) committed BEFORE the move: a crash after the
        commit but before/mid-move leaves the flat files in place, so the
        retry re-triggers the (idempotent) move — whereas committing after
        the move would let a crash in between leave seq=0 with no flat
        files, and the next batch's mode-overwrite of ``batch=0`` would
        destroy the migrated history. A store whose ``_running_total`` file
        is missing entirely (crash between the legacy spans write and its
        total commit) recomputes the total from the spans' max global
        ``tok_end`` so the next batch's offsets continue after — not
        overlap — the migrated history."""
        import os
        import tempfile

        sdir = os.path.join(self.path, "spans")
        if not os.path.isdir(sdir):
            return
        flat = [
            e for e in os.listdir(sdir)
            if os.path.isfile(os.path.join(sdir, e))
        ]
        if not any(e.endswith(".parquet") for e in flat):
            return
        if os.path.exists(self._total_file()):
            total, seq = self._state()
        else:
            total = int(
                self.spark.read.parquet(sdir)
                .agg(F.max(F.col("tok_end").cast("long"))).first()[0] or 0
            )
            seq = 0
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as fh:
            fh.write(f"{total}\n{max(seq, 1)}\n")
        os.replace(tmp, self._total_file())
        dest = os.path.join(sdir, "batch=0")
        os.makedirs(dest, exist_ok=True)
        for e in flat:
            os.replace(os.path.join(sdir, e), os.path.join(dest, e))

    def pack_batch(self, batch: DataFrame) -> DataFrame:
        """Pack one batch against the persisted running total, write its
        spans under the next batch seq, commit (total, seq+1). Returns the
        batch's spans. The commit happens ONLY after the spans write
        succeeds; because the spans write is a mode-overwrite of the
        seq-keyed subdir, a crash between the two makes the retry REPLACE
        the orphan rather than append a duplicate — idempotent, no gap and
        no double-counted chunks.

        LIFETIME of the returned frame: its checkpoint blocks stay alive
        through the NEXT ``pack_batch`` call and are reclaimed after that
        (two-generation window) — consume it within the batch, or re-read
        from disk via :meth:`spans` which is always valid. To hold results
        across many batches, construct the store with ``pin_results=True``
        (session-lifetime blocks, the pre-r7 behavior)."""
        import os
        import tempfile

        self._migrate_legacy_spans()
        base, seq = self._state()
        # Pin the batch before packing: token_offsets consumes its input in
        # two plan branches (window cumsum + per-bucket totals) plus an eager
        # quantile probe. Against a foreachBatch micro-batch source the
        # branch-dedup of that plan is unbindable in Spark 4.1
        # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND); an eager localCheckpoint cuts
        # lineage to a stable scan — and evaluates any upstream hygiene chain
        # once instead of three times. Projected first so only the three
        # packing columns are materialized.
        cols = list(dict.fromkeys(
            [self.id_col, self.token_col, self.order_col]))
        batch = self._ck(batch.select(*cols), "batch")
        spans = self._ck(
            pack_chunks(
                batch, self.id_col, self.token_col, self.chunk_tokens,
                order_col=self.order_col, base_offset=base,
            ),
            "spans",
        )
        spans.write.mode("overwrite").parquet(
            os.path.join(self.path, "spans", f"batch={seq}")
        )
        # new total = base + batch token sum (spans may omit 0-token docs)
        batch_tokens = (
            batch.agg(F.sum(F.col(self.token_col).cast("long"))).first()[0]
            or 0
        )
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as fh:
            fh.write(f"{base + int(batch_tokens)}\n{seq + 1}\n")
        os.replace(tmp, self._total_file())
        return spans

    def spans(self) -> DataFrame:
        import os

        self._migrate_legacy_spans()
        # partition discovery surfaces the batch=N dirs as a `batch`
        # column; drop it to keep the pack_chunks span schema
        return self.spark.read.parquet(
            os.path.join(self.path, "spans")
        ).drop("batch")


def materialize_chunks(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    joiner: str = " ",
) -> DataFrame:
    """Assemble the actual training sequences: join :func:`pack_chunks`
    spans back to the documents, slice each document's whitespace tokens by
    its in-doc bounds, and concatenate slices within each chunk in stream
    order. Returns ``(chunk_id, n_docs, chunk_text)``.

    Shape: one equi-join on id (the corpus-side shuffle), then a groupBy
    on chunk_id whose per-group payload is bounded by ``chunk_tokens`` —
    sort_array on (tok_start, slice) structs makes the concatenation order
    deterministic regardless of arrival order. Token slicing uses the same
    whitespace split as :func:`graflo_spark.ops.textstats.token_count`; a
    tokenizer-accurate deployment swaps the split for real token ids with
    the identical plan shape.

    If the spans carry a ``split`` column (``prepare_training_data`` emits
    chunk ids that restart at 0 PER SPLIT), grouping automatically includes
    it — train and val chunk 0 are different sequences and must never be
    concatenated together."""
    group_keys = (["split"] if "split" in spans.columns else []) + ["chunk_id"]
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    piece = F.array_join(
        F.slice(
            tokens,
            (F.col("doc_tok_start") + 1).cast("int"),
            (F.col("doc_tok_end") - F.col("doc_tok_start")).cast("int"),
        ),
        joiner,
    )
    sliced = spans.join(
        docs.select(F.col(id_col).alias("id"), F.col(text_col)), "id"
    ).select(
        *group_keys,
        F.struct(F.col("tok_start").alias("pos"), piece.alias("piece")).alias(
            "p"
        ),
    )
    return (
        sliced.groupBy(*group_keys)
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
        .select(
            *group_keys,
            F.size("ps").alias("n_docs"),
            F.array_join(F.transform("ps", lambda s: s["piece"]), joiner).alias(
                "chunk_text"
            ),
        )
    )


def sliding_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    stride: int | None = None,
) -> DataFrame:
    """Per-document overlapping token windows — the RAG/embedding chunker
    (every retrieval pipeline's unit of indexing), distinct from
    :func:`pack_chunks` which CONCATENATES documents into training
    sequences. Window i covers tokens ``[i*stride, i*stride+chunk_tokens)``
    of the whitespace tokenization; the last window is the remainder (never
    empty, never duplicated: a doc emits ``ceil(max(n-overlap,1)/stride)``
    windows, so a doc shorter than ``chunk_tokens`` emits exactly one).
    ``stride`` defaults to ``chunk_tokens`` (disjoint windows); a smaller
    stride overlaps neighbors by ``chunk_tokens - stride`` tokens.

    Returns ``(id, chunk_id, n_chunks, chunk_text, n_chunk_tokens)``.
    NULL and zero-token texts emit nothing (the quality gate's concern,
    not the chunker's).

    100 TB shape: one zero-shuffle map pass — tokenize once, fan out with
    ``sequence`` + ``slice`` inside the row (array ops, no Python), then
    one explode. Output volume is input volume times the overlap factor
    ``chunk_tokens/stride`` — the caller's dial, visible in the plan as
    nothing but a Generate."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    stride = chunk_tokens if stride is None else stride
    if not 0 < stride <= chunk_tokens:
        raise ValueError("stride must be in (0, chunk_tokens]")
    t = F.col(text_col)
    toks = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != F.lit(""))
    n = F.size(toks)
    # number of windows: ceil(max(n - overlap, 1) / stride) — the last
    # window starts at the last multiple of stride strictly below
    # n - overlap, so every token is covered and no window is empty
    overlap = chunk_tokens - stride
    n_chunks = F.ceil(
        F.greatest(n - F.lit(overlap), F.lit(1)).cast("double")
        / F.lit(float(stride))
    ).cast("int")
    chunked = (
        df.filter(t.isNotNull())
        .select(
            F.col(id_col),
            toks.alias("__toks"),
            n_chunks.alias("n_chunks"),
        )
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            "n_chunks",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_chunks") - 1),
                    lambda i: F.struct(
                        i.alias("chunk_id"),
                        F.slice(
                            "__toks", i * stride + 1, chunk_tokens
                        ).alias("__w"),
                    ),
                )
            ).alias("c"),
        )
    )
    return chunked.select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        "n_chunks",
        F.array_join("c.__w", " ").alias("chunk_text"),
        F.size("c.__w").alias("n_chunk_tokens"),
    )
