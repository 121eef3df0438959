"""Deterministic sampling & shard packing for training-corpus assembly.

`df.sample()` draws from a per-partition RNG: resplitting the input
changes which rows survive, so a 100 TB corpus resampled after a
repartition yields a different training set. Everything here derives
per-row decisions from the portable 52-bit content hash
(functions/text.py:hash52) instead — reproducible across runs, engines
and partitionings, and expressible in the DuckDB oracle.

Shard packing assigns documents to fixed-token-budget training shards by
cumulative token offset — the standard contiguous-offset cut (a document
belongs to the shard where its first token lands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import hash52

# hash bucket resolution: rates are exact multiples of 1e-6
_BUCKETS = 1_000_000


def _bucket(id_col: str, seed: str) -> Column:
    """Uniform bucket in [0, 1e6) from the row id + seed string."""
    return F.pmod(hash52(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
                  F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame, id_col: str, rate: float, seed: str = "s0"
) -> DataFrame:
    """Keep ~rate of rows, decided by hash(seed || id) — deterministic,
    partitioning-independent, no shuffle (pure filter, pushes past scans
    like any predicate). Changing `seed` draws an independent sample."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(_bucket(id_col, seed) < int(rate * _BUCKETS))


def priority_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    seed: str = "s0",
    out_col: str = "priority",
) -> DataFrame:
    """Fixed-SIZE deterministic uniform sample: the k rows with the
    smallest seeded hash priorities (hash52(seed || id), ties to the
    lower id). The priority order is a uniform permutation per seed, so
    bottom-k is a uniform k-subset — but unlike rate-based
    `hash_sample` the size is EXACT, and unlike rand() the result is
    independent of partitioning, task retries, and row order, so an
    external SQL engine replays it row-for-row.

    Bottom-k is a semilattice (bottom-k of a union == bottom-k of the
    sides' bottom-k's), which makes the sample mergeable across shards,
    epochs, and streams — `streaming.priority_sample_batch_fn`
    maintains THIS exact sample incrementally over a stream, and a
    1000-executor job can bottom-k per partition and merge k-row
    summaries instead of shuffling the corpus.

    Plan shape: one narrow projection + TakeOrderedAndProject
    (per-partition k-heap, k-row merge) — no global sort, no corpus
    shuffle. Changing `seed` draws an independent sample.

    `id_col` is the sampling unit and must be non-null and unique:
    NULL ids are EXCLUDED (a NULL id hashes to a NULL priority, which
    asc() would sort first — every garbage row would win the bottom-k),
    and duplicate ids collide on (priority, id) so which physical row
    survives the tie is not defined — dedupe first if ids can repeat.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    pri = hash52(
        F.concat(F.lit(seed), F.col(id_col).cast("string"))
    )
    return (
        df.where(F.col(id_col).isNotNull())
        .withColumn(out_col, pri)
        .orderBy(F.asc(out_col), F.asc(id_col))
        .limit(k)
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downweight an over-
    represented source: {"web": 0.1, "books": 1.0}). The rate map is a
    small driver-side literal compiled into one CASE expression — still a
    pure filter, zero shuffles."""
    threshold: Column = F.lit(int(default_rate * _BUCKETS))
    for value, rate in sorted(rates.items()):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} must be in [0,1]")
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(_bucket(id_col, seed) < threshold)


def cap_per_key(
    df: DataFrame,
    key_cols: list[str] | str,
    cap: int,
    id_col: str,
    order_col: str | Column | None = None,
    seed: str = "quota",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep at most `cap` rows per key — the per-domain/source quota of
    corpus curation (capping an over-represented crawl domain so it
    can't dominate the token mix).

    Selection is deterministic: the `cap` smallest (order, hash, id)
    rows per key survive, where `order` is `order_col` if given (e.g. a
    quality score to keep the BEST rows) and the tie-break is always the
    portable hash(seed||id) — reruns, repartitions, and the DuckDB
    oracle all pick identical rows.

    Skew-proof two-stage top-k: a single row_number window per key would
    sort an entire hot domain (10^9 rows for one key = one giant
    partition) — instead stage 1 partitions by (key, hash-salt) and
    keeps `cap` rows per salt locally, bounding stage 2's input to
    cap * salt_buckets rows per key regardless of skew. Both stages are
    exact, so the composition equals the single-window result.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if cap <= 0:
        raise ValueError("cap must be positive")
    tie = _bucket(id_col, seed)
    order = (
        [F.col(order_col) if isinstance(order_col, str) else order_col]
        if order_col is not None else []
    ) + [tie.asc(), F.col(id_col).asc()]
    salt = F.pmod(hash52(F.concat(F.lit("salt"), F.col(id_col).cast("string"))),
                  F.lit(salt_buckets))
    w1 = Window.partitionBy(*keys, salt).orderBy(*order)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= cap)
        .withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= cap)
        .drop("__rk1", "__rk")
    )


def pack_shards(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    out_col: str = "shard",
    n_buckets: int | None = None,
) -> DataFrame:
    """Assign each document to a training shard of ~`budget` tokens:
    shard = floor(cumulative-token-offset / budget) in `order_col` order
    (a doc belongs to the shard where its first token lands, so every
    shard except the last spans >= budget tokens and shards are
    contiguous in the ordering).

    Default mode is a window over a global ORDER BY — Spark funnels
    that through ONE partition (Exchange SinglePartition), fine below
    ~10M rows. At corpus scale pass ``n_buckets`` (e.g. 256): the
    cumulative sum is then computed two-phase — approx-quantile split
    points of the numeric ``order_col`` range-bucket the rows, each
    bucket cumsums in parallel, and the bounded per-bucket totals
    (one `n_buckets`-row collect) become broadcast offsets. The
    result is bit-identical to the global window for unique
    ``order_col`` values: bucket boundaries only change WHERE the sum
    is split, never its value. Adds `out_col` and `token_offset`."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_buckets is not None and n_buckets > 1:
        df = _bucketed_cumsum_offset(df, order_col, token_col, n_buckets)
    else:
        w = (
            Window.orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        df = df.withColumn(
            "token_offset",
            (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long"),
        )
    return df.withColumn(
        out_col, F.floor(F.col("token_offset") / budget).cast("long")
    )


def _bucketed_cumsum_offset(
    df: DataFrame, order_col: str, token_col: str, n_buckets: int
) -> DataFrame:
    """Distributed exclusive cumulative sum of ``token_col`` in
    ``order_col`` order, as a ``token_offset`` column.

    Split points come from approx_percentile — they only steer load
    balance, never the answer: any contiguity-preserving bucketing
    yields the same cumulative sum. Per-bucket totals are a bounded
    collect (<= n_buckets rows); the in-bucket window is partitioned,
    so no stage sees more than ~1/n_buckets of the data.

    The input is PERSISTED here (memory-and-disk): this function scans
    it three times (split points, bucket totals, final offsets), and
    callers feed it expensive upstream projections (the BPE encode in
    bpe_shard_packing costs more than the cumsum itself) — without the
    cache every pass re-runs that projection. Callers should pass the
    NARROW (order, token) projection, so the cached footprint is two
    numeric columns per row; the cache is released by Spark's
    ContextCleaner once the plan is unreachable (the repo's bounded-
    cache convention for multi-pass operators).
    """
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    [row] = df.select(
        F.expr(
            f"approx_percentile({order_col}, array({qs}), 10000)"
        ).alias("b")
    ).collect()
    bounds = sorted({float(b) for b in (row["b"] or [])})
    if not bounds:
        w = (
            Window.orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(
            "token_offset",
            (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long"),
        )
    barr = F.array(*[F.lit(b) for b in bounds])
    bkt = F.size(
        F.filter(barr, lambda b: b < F.col(order_col).cast("double"))
    )
    keyed = df.withColumn("__bkt", bkt)
    sums = {
        r["__bkt"]: r["s"]
        for r in keyed.groupBy("__bkt")
        .agg(F.sum(token_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for i in range(len(bounds) + 1):
        offsets[i] = acc
        acc += int(sums.get(i, 0) or 0)
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return keyed.withColumn(
        "token_offset", (offset_map[F.col("__bkt")] + within).cast("long")
    ).drop("__bkt")


def pack_length_batches(
    df: DataFrame,
    id_col: str,
    token_col: str,
    batch_tokens: int,
    n_shards: int = 32,
    seed: str = "lbatch",
) -> DataFrame:
    """Padding-efficient dynamic batching: assign each document to a
    training batch so that every batch fits ``batch_tokens`` when its
    rows are padded to the batch's longest member — the cost model of
    fixed-shape accelerator steps (cost = rows x max_len, not
    sum(len)). Batching uniformly by id wastes 30-60% of a batch on
    padding when lengths are skewed; grouping similar lengths first is
    the standard fix (what dynamic-batching data loaders do), here as a
    deterministic, engine-replayable assignment.

    Algorithm (every step a pure column expression or a bounded
    window):
      1. length bucket = floor(log2(max(tokens, 1))) — power-of-two
         length classes, data-independent (no quantile probe).
      2. shard = portable id hash mod ``n_shards`` — the parallelism
         unit; batches never cross shards, so no window ever sorts
         more than a 1/n_shards slice of one length bucket, and the
         assignment is reproducible across runs/partitionings/engines.
      3. within (bucket, shard), order tokens desc (id tie-break),
         rows_per_batch = max(1, batch_tokens // slice_max_len), batch
         = row_number div rows_per_batch. Descending order puts each
         batch's max first, so early batches are the fullest.

    Output: input columns + len_bucket, shard, batch, batch_max_len,
    batch_n_docs, padding_frac (1 - sum(len) / (n * max_len), the
    fraction of the padded batch that is padding). A document longer
    than ``batch_tokens`` gets a singleton batch (padding_frac 0).

    No reference counterpart (its loaders are pandas row loops); this
    is the training-data scale path alongside pack_shards (contiguous
    token budget) and pack_contexts (concat-and-cut).
    """
    if batch_tokens <= 0:
        raise ValueError("batch_tokens must be positive")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    tok = F.greatest(F.col(token_col).cast("long"), F.lit(1))
    out = df.withColumn(
        "len_bucket", F.floor(F.log2(tok)).cast("int")
    ).withColumn(
        "shard",
        F.pmod(_bucket(id_col, seed), F.lit(n_shards)).cast("int"),
    )
    slice_w = Window.partitionBy("len_bucket", "shard")
    order_w = slice_w.orderBy(
        F.col(token_col).desc(), F.col(id_col).asc()
    )
    out = (
        out.withColumn("__max", F.max(tok).over(slice_w))
        .withColumn(
            "__rpb",
            F.greatest(
                F.lit(1), (F.lit(batch_tokens) / F.col("__max")).cast("long")
            ),
        )
        .withColumn(
            "batch",
            ((F.row_number().over(order_w) - 1) / F.col("__rpb"))
            .cast("long"),
        )
    )
    batch_w = Window.partitionBy("len_bucket", "shard", "batch")
    return (
        out.withColumn("batch_max_len", F.max(tok).over(batch_w))
        .withColumn(
            "batch_n_docs", F.count(F.lit(1)).over(batch_w).cast("long")
        )
        .withColumn(
            "padding_frac",
            1.0
            - F.sum(tok).over(batch_w)
            / (F.col("batch_n_docs") * F.col("batch_max_len")),
        )
        .drop("__max", "__rpb")
    )


def pack_contexts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    context_len: int = 2048,
    order_col: str | None = None,
    partition_col: str | None = None,
    tokenizer=None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end
    in a deterministic order into one global token stream, which is cut
    into fixed ``context_len`` training contexts; a document whose span
    crosses a boundary contributes a piece to each context it touches
    (the standard packing used to fill transformer context windows
    without padding).

    Offsets come from a cumulative token sum over ``order_col`` (default
    the id). A global ORDER BY window funnels through one partition —
    fine below ~10M docs; at corpus scale pass ``partition_col`` (e.g. a
    shard id from pack_shards) so packing runs per shard in parallel and
    context ids are per-partition. The scatter step (which contexts a
    doc touches, which token slice lands in each) is pure
    sequence/explode/slice expressions — narrow, no extra shuffle.

    Output: [partition_col,] context_id, {id_col}, ctx_offset (where the
    piece starts inside the context), n_tokens, piece_text. Zero-token
    documents emit nothing.

    `tokenizer`: any object with `tokens_expr(col) -> Column`
    (functions.tokenize.BPETokenizer / PandasTokenizer) — contexts are
    then measured and cut in REAL tokens, not whitespace words, so a
    context_len budget matches what a trained model's window holds.
    piece_text joins the tokenizer's tokens with spaces (token stream,
    not the original surface text).
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    L = int(context_len)
    if tokenizer is not None:
        toks = tokenizer.tokens_expr(F.col(text_col))
    else:
        toks = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    keep = [partition_col] if partition_col else []
    # the ordering column must survive the projection for the window
    order_by = order_col or id_col
    extra = [order_by] if order_by not in (id_col, *keep) else []
    base = df.select(
        *keep, *extra, F.col(id_col), toks.alias("__tk")
    ).withColumn("__n", F.size("__tk")).filter(F.col("__n") > 0)
    w = Window.orderBy(order_by)
    if partition_col:
        w = Window.partitionBy(partition_col).orderBy(order_by)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = base.withColumn(
        "__start", (F.sum("__n").over(w) - F.col("__n")).cast("long")
    )
    first_ctx = F.floor(F.col("__start") / L)
    last_ctx = F.floor((F.col("__start") + F.col("__n") - 1) / L)
    out = base.withColumn(
        "context_id", F.explode(F.sequence(first_ctx, last_ctx))
    )
    lo = F.greatest(F.col("context_id") * L - F.col("__start"), F.lit(0))
    hi = F.least(
        (F.col("context_id") + 1) * L - F.col("__start"), F.col("__n")
    )
    piece = F.slice(F.col("__tk"), (lo + 1).cast("int"), (hi - lo).cast("int"))
    return out.select(
        *keep,
        F.col("context_id").cast("long").alias("context_id"),
        id_col,
        F.greatest(F.col("__start") - F.col("context_id") * L, F.lit(0))
        .cast("long").alias("ctx_offset"),
        (hi - lo).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("piece_text"),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test labeling: the id's hash bucket falls
    into consecutive [0,1e6) intervals sized by `fractions` (insertion
    order). Fractions must sum to 1 (+-1e-9). Pure projection — no
    shuffle, stable across runs/partitionings/engines, and a document
    can never migrate between splits when the corpus grows (its bucket
    depends only on its id)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = _bucket(id_col, seed)
    expr = None
    acc = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = bucket < int(acc * _BUCKETS)
        expr = (
            F.when(cond, F.lit(name)) if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def mixture_rates(
    totals: dict[str, int],
    target_weights: dict[str, float],
    budget_tokens: int | None = None,
) -> dict[str, float]:
    """Per-source keep rates that make the sampled token mass follow
    `target_weights` (renormalized). Without a budget the mix is scaled
    to the largest total achievable by pure downsampling (the source
    that runs out first caps it — no upsampling); a budget shrinks it
    further. Driver-side arithmetic over one bounded aggregate
    (#sources rows)."""
    wsum = float(sum(target_weights.values()))
    if wsum <= 0:
        raise ValueError("target weights must sum to a positive value")
    w = {s: v / wsum for s, v in target_weights.items() if v > 0}
    missing = [s for s in w if totals.get(s, 0) <= 0]
    if missing:
        raise ValueError(f"no tokens for weighted sources: {missing}")
    t_max = min(totals[s] / w[s] for s in w)
    if budget_tokens is not None:
        t_max = min(t_max, float(budget_tokens))
    return {s: w[s] * t_max / totals[s] for s in w}


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    token_col: str,
    target_weights: dict[str, float],
    budget_tokens: int | None = None,
    seed: str = "mix",
) -> DataFrame:
    """Data-mixture resampling: downsample each source so the surviving
    token mass matches `target_weights` (e.g. web 50% / books 30% /
    code 20%), the core mixing step of training-corpus assembly.

    One bounded aggregate collects per-source token totals (#sources
    rows — the same bounded-driver pattern as the IVF codebook), rates
    come from mixture_rates, and the filter is the deterministic hash
    threshold of stratified_hash_sample — a pure pushed-down predicate,
    zero extra shuffles over the corpus itself. Sources without a
    weight are dropped."""
    totals = {
        r[0]: int(r[1])
        for r in df.groupBy(source_col)
        .agg(F.sum(F.col(token_col).cast("long")))
        .collect()
    }
    rates = mixture_rates(totals, target_weights, budget_tokens)
    bucket = _bucket(id_col, seed)
    threshold: Column = F.lit(0)
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(source_col) == value, F.lit(int(rate * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def temperature_weights(
    totals: dict[str, int], temperature: float = 0.5
) -> dict[str, float]:
    """Source weights from the empirical size distribution raised to
    `temperature` (the mT5 / UniMax mixing rule): tau=1 keeps natural
    proportions, tau -> 0 approaches uniform — small sources get
    upweighted without ever being upsampled. Driver arithmetic over the
    bounded per-source totals."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    pos = {s: float(n) for s, n in totals.items() if n > 0}
    if not pos:
        raise ValueError("no source has a positive total")
    powed = {s: n ** temperature for s, n in pos.items()}
    z = sum(powed.values())
    return {s: v / z for s, v in powed.items()}


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    token_col: str,
    temperature: float = 0.5,
    budget_tokens: int | None = None,
    seed: str = "tmix",
) -> DataFrame:
    """mixture_sample with the target mix DERIVED from the corpus
    itself: per-source token totals ^ temperature, renormalized
    (temperature sampling). One bounded totals aggregate feeds both the
    weight derivation and the keep-rate solve; the corpus-side filter
    is the same pushed-down deterministic hash threshold."""
    import math

    totals = {
        r[0]: int(r[1])
        for r in df.groupBy(source_col)
        .agg(F.sum(F.col(token_col).cast("long")))
        .collect()
    }
    if budget_tokens is None:
        # the normalizer z cancels out of rate_s = w_s * tmax / total_s:
        #   rate_s = min_u(total_u^(1-tau)) * total_s^(tau-1)
        # computing the cancelled form skips a cross-source float sum
        # whose accumulation order differs between engines — every term
        # is a per-source power + one multiply, so an external oracle
        # reproduces each rate bit-for-bit. tau=0.5 routes through
        # IEEE-exact sqrt (libm pow is not correctly rounded).
        def _pw(x: float, e: float) -> float:
            if e == 0.5:
                return math.sqrt(x)
            if e == -0.5:
                return 1.0 / math.sqrt(x)
            return x ** e

        pos = {s: float(n) for s, n in totals.items() if n > 0}
        if not pos:
            raise ValueError("no source has a positive total")
        if temperature <= 0:
            raise ValueError("temperature must be positive")
        mcap = min(_pw(t, 1.0 - temperature) for t in pos.values())
        rates = {
            s: min(1.0, mcap * _pw(t, temperature - 1.0))
            for s, t in pos.items()
        }
    else:
        weights = temperature_weights(totals, temperature)
        rates = mixture_rates(totals, weights, budget_tokens)
    bucket = _bucket(id_col, seed)
    threshold: Column = F.lit(0)
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(source_col) == value, F.lit(int(rate * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsamp",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis): each row gets key = ln(u) / w with u derived
    from the portable id hash (u in (0,1)), and the k largest keys win —
    inclusion probability proportional to weight, reproducible across
    runs/partitionings/engines. The classic use: keep the best-K
    documents where `weight_col` is a quality score, with randomness so
    the tail isn't a hard cutoff.

    Plan: a projection + global top-k (TakeOrderedAndProject — per-
    partition heaps then a driver merge of k rows, no full sort).
    Rows with weight <= 0 are excluded.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    u = (_bucket(id_col, seed) + 0.5) / float(_BUCKETS)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__wkey", key)
        .orderBy(F.desc("__wkey"), F.col(id_col))
        .limit(int(k))
        .drop("__wkey")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int = 0,
    seed: str = "shuffle",
    n_buckets: int = 256,
    out_col: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    dense position ``0..n-1`` in ``md5(seed:epoch:id)`` order. Same
    (seed, epoch) -> identical order on any cluster/partitioning;
    bumping ``epoch`` reshuffles — the standard per-epoch data-order
    recipe without materializing a shuffled copy of the corpus.

    Scale shape: a naive ``row_number() over (order by key)`` collapses
    to ONE partition. Instead the hex key's first byte buckets rows 256
    ways; because the bucket is a *prefix* of the sort key, per-bucket
    rank + the bucket's global offset equals the global rank. Bucket
    counts are a bounded 256-row collect; the rank window is
    partitioned by bucket, so the sort is spread across the cluster and
    no stage sees more than ~1/256 of the data.
    """
    if not 1 <= n_buckets <= 4096:
        raise ValueError("n_buckets must be in [1, 4096]")
    # bucket prefix length in hex chars: 256 -> 2, 16 -> 1, 4096 -> 3
    plen = 1
    while 16 ** plen < n_buckets:
        plen += 1
    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.lit(str(epoch)),
                    F.col(id_col).cast("string"))
    )
    keyed = df.withColumn("__key", key).withColumn(
        "__bkt", F.substring("__key", 1, plen)
    )
    counts = {
        r["__bkt"]: r["n"]
        for r in keyed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("__bkt").orderBy("__key", id_col)
    return (
        keyed.withColumn(
            out_col,
            (
                offset_map[F.col("__bkt")]
                + F.row_number().over(w)
                - F.lit(1)
            ).cast("long"),
        )
        .drop("__key", "__bkt")
    )


def shard_manifest(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    token_col: str,
    text_col: str | None = None,
) -> DataFrame:
    """Per-shard manifest for a packed training corpus: the audit
    record a dataloader (or a re-run) checks shards against without
    re-reading the documents. One hash aggregation on the shard key.

    Output per shard: n_docs, n_tokens, min/max id, n_bytes (UTF-8
    octets of ``text_col``, when given) and ``content_fingerprint`` —
    the XOR of per-doc 52-bit (id, content) hashes. XOR makes the
    fingerprint order-independent and overflow-free, and it MERGES:
    the fingerprint of a shard re-written from two partial runs is the
    XOR of the partial fingerprints, so incremental re-packs verify
    without a full scan.
    """
    doc_h = hash52(
        F.concat_ws(
            ":",
            F.lit("mf"),
            F.col(id_col).cast("string"),
            F.md5(F.col(text_col)) if text_col else F.lit(""),
        )
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).cast("long").alias("n_tokens"),
        F.min(F.col(id_col)).alias("min_id"),
        F.max(F.col(id_col)).alias("max_id"),
        F.bit_xor(doc_h).alias("content_fingerprint"),
    ]
    if text_col:
        aggs.insert(
            2,
            F.sum(F.octet_length(F.col(text_col))).cast("long").alias(
                "n_bytes"
            ),
        )
    return df.groupBy(shard_col).agg(*aggs)


def curriculum_phases(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_phases: int = 4,
    out_col: str = "phase",
    n_buckets: int | None = None,
) -> DataFrame:
    """Curriculum assignment: split the corpus into ``n_phases`` equal
    phases by DESCENDING ``score_col`` (ties broken by ascending
    ``id_col``) — phase 1 holds the highest-quality documents, the
    schedule quality-ordered pretraining feeds first. Semantics are
    exactly SQL ntile(n) OVER (ORDER BY score DESC, id): the first
    (total % n) phases get one extra row.

    Default mode uses the ntile window directly — a global ORDER BY
    that funnels one partition, fine below ~10M rows. At corpus scale
    pass ``n_buckets``: approx-percentile split points on the score
    range-bucket the rows, each bucket ranks in parallel, and the
    bounded per-bucket counts (one <= n_buckets-row collect) become
    broadcast offsets — an exact global rank with no single-partition
    stage, then the ntile arithmetic applied to it.
    """
    if n_phases <= 0:
        raise ValueError("n_phases must be positive")
    if not n_buckets or n_buckets <= 1:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        return df.withColumn(out_col, F.ntile(n_phases).over(w))

    # distributed exact rank: ascending (score, -id) buckets, so the
    # descending rank is total - rank_asc + 1.
    # This mode runs three actions over `df` (percentile sketch, bucket
    # counts, the returned frame) — persist so the caller's upstream
    # (often a text-heavy quality score) computes once, not three
    # times. Released when the returned frame no longer needs it is the
    # caller's call via the session (same contract as the other
    # multi-action kernels); the frame is the caller's narrow input.
    df = df.persist()
    qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    [row] = df.select(
        F.expr(
            f"approx_percentile({score_col}, array({qs}), 10000)"
        ).alias("b")
    ).collect()
    bounds = sorted({float(b) for b in (row["b"] or [])})
    if not bounds:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        return df.withColumn(out_col, F.ntile(n_phases).over(w))
    barr = F.array(*[F.lit(b) for b in bounds])
    bkt = F.size(
        F.filter(barr, lambda b: b < F.col(score_col).cast("double"))
    )
    keyed = df.withColumn("__bkt", bkt)
    counts = {
        r["__bkt"]: r["n"]
        for r in keyed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    offsets, acc = {}, 0
    for i in range(len(bounds) + 1):
        offsets[i] = acc
        acc += counts.get(i, 0)
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.col(score_col).asc(), F.col(id_col).desc())
    )
    rank_asc = offset_map[F.col("__bkt")] + F.row_number().over(w)
    rank = (F.lit(total) - rank_asc + 1).cast("long")
    # ntile(n): first (total % n) phases hold size+1 rows
    size, rem = total // n_phases, total % n_phases
    cut = rem * (size + 1)
    phase = F.when(
        F.lit(size) == 0, rank
    ).when(
        rank <= cut,
        F.ceil(rank / F.lit(size + 1)),
    ).otherwise(
        F.lit(rem) + F.ceil((rank - cut) / F.lit(size)),
    )
    return keyed.withColumn(out_col, phase.cast("int")).drop("__bkt")
