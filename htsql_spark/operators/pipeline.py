"""Training-data pipeline operators: deterministic splits and samples,
document chunking, TF-IDF term scoring, and PII redaction.

All operators are pure built-in-function DataFrame transforms (no
Python UDFs) so they stay inside whole-stage codegen; the split and
sample family is shuffle-free (a narrow filter over an md5 prefix),
which is what makes them usable as the first stage of a 100 TB
pipeline: the decision for each row is a pure function of (key, salt),
reproducible across runs, engines, and cluster sizes.

Determinism contract: `md5(key || '|' || salt)` is the only source of
randomness.  Its first 8 hex chars are uniform over [0, 16^8); split
thresholds are precomputed hex strings compared lexicographically
(lowercase hex of equal length orders identically to the underlying
integer in both Spark and DuckDB), so the same row lands in the same
split everywhere.

Reference parity note: the HTSQL reference (htsql 2.3.3) has no
sampling/chunking layer — these are beyond-reference operators for the
LLM-training use case, same contract style as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16**8


def frac_hex(fraction: float) -> str:
    """Lowercase 8-hex-char threshold such that a uniform 8-hex prefix
    is < threshold with probability `fraction`."""
    n = min(max(int(fraction * _HEX_SPACE), 0), _HEX_SPACE)
    # 'g' sorts above 'f', so the full space needs one extra char
    return "g" if n >= _HEX_SPACE else format(n, "08x")


def _hash_prefix(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt))), 1, 8)


def split_expr(
    key: Column,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> Column:
    """The named-split assignment as a pure column expression over a
    key column (train/valid/test by default) — the kernel
    :func:`hash_split` and the query-language ``split()`` flow method
    share.  Narrow: each task decides its own rows."""
    weights = weights or {"train": 0.9, "valid": 0.05, "test": 0.05}
    total = sum(weights.values())
    prefix = _hash_prefix(key, salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = prefix < F.lit(frac_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/valid/test by default)
    by hashing `key`.  Narrow (no shuffle, no action): each task decides
    its own rows, so this scales linearly and is partition-layout
    independent."""
    return df.withColumn("split", split_expr(F.col(key), weights, salt))


def stratified_sample(
    df: DataFrame,
    key: str,
    fractions: float | dict[str, float],
    strata: str | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep a row iff its hash
    fraction falls below the (per-stratum) threshold.  With a dict of
    `fractions`, `strata` picks the column whose value selects the
    rate (unlisted strata are dropped).  Shuffle-free."""
    prefix = _hash_prefix(F.col(key), salt)
    if isinstance(fractions, dict):
        if strata is None:
            raise ValueError("per-stratum fractions require a strata column")
        cond = F.lit(False)
        for value, frac in fractions.items():
            cond = cond | (
                (F.col(strata) == F.lit(value)) & (prefix < F.lit(frac_hex(frac)))
            )
    else:
        cond = prefix < F.lit(frac_hex(float(fractions)))
    return df.filter(cond)


def weighted_sample(
    df: DataFrame,
    key: str,
    rate,
    salt: str = "sample",
) -> DataFrame:
    """Per-row Bernoulli sample with a per-row keep probability
    (``rate``: column name or Column in [0,1]) — importance sampling
    by e.g. a quality score.  Same md5-prefix determinism contract as
    :func:`hash_split`: narrow, shuffle-free, reproducible anywhere.
    The hex threshold is computed row-wise
    (``lpad(hex(floor(rate·16^8)))``), matching :func:`frac_hex`'s
    truncation, so a DuckDB oracle can replicate it exactly."""
    r = F.col(rate) if isinstance(rate, str) else rate
    prefix = _hash_prefix(F.col(key), salt)
    thresh = F.lpad(F.lower(F.hex(F.floor(r * _HEX_SPACE).cast("bigint"))), 8, "0")
    return df.filter((r >= 1.0) | ((r > 0.0) & (prefix < thresh)))


def mix_corpora(
    sources: dict[str, DataFrame],
    fractions: dict[str, float],
    key: str,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic corpus mixing: downsample each source so the
    union approximates the target mixture ``fractions`` at the
    largest feasible total (no source is upsampled — the binding
    source keeps all rows).  The standard training-data "mixture
    weights" op.

    One ``count()`` per source fixes the rates (model-state
    aggregates — the only driver traffic); the selection itself is
    the narrow md5-prefix filter, so the mix is reproducible across
    runs, engines, and partitionings.  Output adds a ``__source``
    column."""
    active = {s: f for s, f in fractions.items() if f > 0}
    if not active:
        raise ValueError("mix_corpora needs at least one positive fraction")
    counts = {s: sources[s].count() for s in active}
    empty = sorted(s for s in active if counts[s] == 0)
    if empty:
        raise ValueError(
            "mix_corpora: partition(s) with zero rows cannot satisfy a"
            f" positive fraction: {', '.join(map(repr, empty))}"
        )
    feasible_total = min(counts[s] / active[s] for s in active)
    out = None
    for name, frac in active.items():
        rate = min(1.0, frac * feasible_total / counts[name])
        keep = (
            sources[name]
            .filter(_hash_prefix(F.col(key), salt) < F.lit(frac_hex(rate)))
            .withColumn("__source", F.lit(name))
        )
        out = keep if out is None else out.unionByName(keep)
    return out


def sample_n_per_group(
    df: DataFrame,
    group: str | list[str],
    n: int,
    key: str,
    salt: str = "sample",
) -> DataFrame:
    """Exactly min(n, |group|) rows per group, chosen by hash order —
    a deterministic reservoir sample.  One hash-partition shuffle on
    the group key (AQE splits skewed strata); the md5 rank is unique
    per key so ties cannot occur."""
    group_cols = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*group_cols).orderBy(_hash_prefix(F.col(key), salt), key)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into whitespace-token windows of
    `chunk_tokens` tokens advancing by `chunk_tokens - overlap` —
    the standard sliding-window chunker for embedding/training corpora.

    Pure generate-and-slice (split → sequence → explode → slice →
    array_join): narrow, no shuffle, no UDF; output rows ≈
    n_tokens/step per doc, produced task-locally so a 100 TB corpus
    chunks at scan speed."""
    d, names = append_chunk_columns(
        docs.select(F.col(id_col), F.col(text_col)),
        chunk_tokens=chunk_tokens,
        overlap=overlap,
        text_col=text_col,
        prefix="__ck_",
    )
    idx, start, ntok, md5 = names
    return d.select(
        F.col(id_col),
        F.col(idx).alias("chunk_idx"),
        F.col(start).alias("start_token"),
        F.col(ntok).alias("n_tokens"),
        F.col(md5).alias("chunk_md5"),
    )


def append_chunk_columns(
    df: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    prefix: str = "",
) -> tuple[DataFrame, list[str]]:
    """The sliding-window chunk expansion KEEPING every existing
    column: each row becomes one row per token window, with
    ``{prefix}idx`` / ``{prefix}start`` / ``{prefix}n_tokens`` /
    ``{prefix}md5`` appended — the kernel :func:`chunk_documents`
    selects from, and the column-builder form of the query-language
    ``chunk()`` flow method.  Pure generate-and-slice (split →
    sequence → explode → slice): narrow, no shuffle, no join —
    chunks are produced task-locally at scan speed.  Returns
    (df, appended names)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    tokc, startc = f"__{prefix}ck_toks", f"__{prefix}ck_start"
    clash = [c for c in (tokc, startc) if c in df.columns]
    if clash:
        raise ValueError(
            f"append_chunk_columns: scratch column(s) {clash} already"
            " exist on the input — pass a fresh prefix"
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = df.withColumn(tokc, toks).withColumn(
        startc,
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size(F.col(tokc)), F.lit(1)), F.lit(step)
            )
        ),
    )
    piece = F.slice(F.col(tokc), F.col(startc), F.lit(chunk_tokens))
    sig = {
        f"{prefix}idx": F.floor((F.col(startc) - 1) / step).cast("int"),
        f"{prefix}start": F.col(startc).cast("int"),
        f"{prefix}n_tokens": F.size(piece).cast("int"),
        f"{prefix}md5": F.md5(F.array_join(piece, " ")),
    }
    return d.withColumns(sig).drop(tokc, startc), list(sig)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k terms per document by tf·idf (idf = ln(N/df)).

    Plan shape: ONE explode + two hash aggregations (term counts are
    map-side combined) + a join on term.  The document frequency is
    derived from the tf aggregate — (id, term) rows are unique after
    it, so df = count(*) per term — NOT from a second pass over the
    exploded terms: at 100 TB that second pass was a full extra
    text-column scan + explode (caught by the round-9 scan-budget
    sweep).  The tf↔df join is a plain shuffle join on ``term``: the
    distinct-term table of a web-scale corpus is itself huge
    (billions of rows at 100 TB), so a forced broadcast would OOM
    every executor — AQE still picks a broadcast join at runtime when
    the vocabulary turns out small.  Only N (a single-row aggregate)
    is broadcast, never a driver-side count."""
    terms = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    # pin: tf feeds BOTH the df aggregation and the scored join; an
    # unpinned reference re-expands the scan+explode+partial-agg
    # subtree per use (verified: no ReusedExchange even post-AQE —
    # the two consumers hash-partition differently), i.e. two full
    # text-column passes at 100 TB.  The pin materializes the
    # NARROWEST corpus-scale intermediate (id, term, tf) once.
    tf = (
        terms.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(id_col, "term", F.col("tf").cast("int").alias("tf"), "tfidf")
    )


def stratified_eval_split(
    docs: DataFrame,
    n_eval: int = 10,
    strata: str = "lang",
    key: str = "doc_id",
    salt: str = "seval",
) -> DataFrame:
    """Exact-n per-stratum eval carve-out: within each stratum the
    ``n_eval`` smallest docs by deterministic md5 rank become 'eval',
    the rest 'train' — the guarantee a Bernoulli hash split cannot
    give (every language gets an eval set, even tail languages with a
    handful of documents).  One hash-partition shuffle on the stratum
    (AQE splits skewed strata); the rank key is unique so the
    carve-out is exact and reproducible."""
    w = Window.partitionBy(strata).orderBy(
        _hash_prefix(F.col(key), salt), F.col(key)
    )
    return docs.withColumn(
        "split",
        F.when(F.row_number().over(w) <= n_eval, F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )


def leakage_free_split(
    docs: DataFrame,
    key: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    strategy: str = "exact",
    threshold: float = 0.8,
) -> DataFrame:
    """Duplicate-cluster-aware split assignment: documents that are
    (near-)duplicates of each other ALWAYS land in the same split,
    because the split is hashed from the cluster representative, not
    the document — the structural fix for train/eval leakage that
    decontamination audits only detect after the fact.

    ``strategy``: 'exact' (fingerprint clusters) or 'minhash'
    (near-dup clusters at ``threshold``).  Unclustered docs hash on
    their own id as usual.  Plan: the pair → connected-components →
    representative path of :mod:`.dedup` (ids-only shuffles), one
    left join to attach representatives, then the narrow md5
    threshold arithmetic of :func:`hash_split` applied to the
    representative key."""
    from . import dedup as _d  # noqa: F401  (module path hint)
    from .dedup import dedup_clusters, exact_dup_pairs, minhash_dedup_pairs

    if strategy == "exact":
        pairs = exact_dup_pairs(docs)
    elif strategy == "minhash":
        pairs = minhash_dedup_pairs(docs, threshold=threshold).select("a", "b")
    else:
        raise ValueError(f"unknown strategy: {strategy!r}")
    clusters = dedup_clusters(pairs)  # (doc_id, cluster_id) for dup members
    tagged = docs.join(
        clusters.withColumnsRenamed({"doc_id": key, "cluster_id": "__rep"}),
        key,
        "left",
    ).withColumn("__rep", F.coalesce(F.col("__rep"), F.col(key)))
    out = hash_split(
        tagged.withColumnsRenamed({key: "__self", "__rep": key}), key, weights, salt
    )
    return out.withColumnsRenamed({key: "__rep", "__self": key}).drop("__rep")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Release-to-release corpus diff: one row per changed document —
    status 'added' (id only in new), 'removed' (id only in old), or
    'changed' (same id, different normalized-content fingerprint).
    Unchanged docs are dropped.  One full-outer join keyed on the id;
    only (id, fp) pairs shuffle."""
    from .textstats import fingerprint

    o = old.select(F.col(key), fingerprint(F.col(text_col)).alias("__fo"))
    n = new.select(F.col(key), fingerprint(F.col(text_col)).alias("__fn"))
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("__fo").isNull(), F.lit("added"))
        .when(F.col("__fn").isNull(), F.lit("removed"))
        .when(F.col("__fo") != F.col("__fn"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(key, "status")
    )


def cross_split_contamination(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    train: str = "train",
    eval_splits: tuple[str, ...] = ("valid", "test"),
    salt: str = "split",
) -> DataFrame:
    """Eval-set contamination detection: eval documents whose
    normalized content exactly matches a training document (the
    decontamination step every LLM data pipeline needs before
    training).  Content key = the md5 fingerprint over
    whitespace-normalized lowercased text (textstats.fingerprint);
    splits come from the same deterministic hash_split assignment the
    pipeline trains with, so this audits the REAL split.

    One shuffle on the fingerprint (train side is the typically-small
    probe … no: train is the big side — the join is fp↔fp equi-join,
    shuffle keyed on content hash, skew-free by construction since
    exact-dup groups are tiny after upstream dedup).  Near-dup
    contamination is the same join fed by minhash/simhash signatures
    instead of fp — this operator is the exact-match tier."""
    from .textstats import fingerprint

    tagged = hash_split(docs, key, salt=salt).select(
        F.col(key), F.col("split"), fingerprint(F.col(text_col)).alias("fp")
    )
    tr = tagged.filter(F.col("split") == train).select(
        F.col(key).alias("train_id"), "fp"
    )
    ev = tagged.filter(F.col("split").isin(list(eval_splits))).select(
        F.col(key).alias("eval_id"), F.col("split").alias("eval_split"), "fp"
    )
    return ev.join(tr, "fp").select("eval_id", "eval_split", "train_id", "fp")


def ngram_contamination(
    docs: DataFrame,
    n: int = 8,
    key: str = "doc_id",
    text_col: str = "text",
    train: str = "train",
    eval_splits: tuple[str, ...] = ("valid", "test"),
    salt: str = "split",
    max_postings: int = 1000,
    min_shared: int = 1,
) -> DataFrame:
    """N-gram overlap decontamination (the GPT-3 §C / Gopher-style
    13-gram tier, here word-``n``-grams): eval-split documents that
    share ≥ ``min_shared`` distinct word n-grams with a training
    document — catches PARTIAL contamination (quotes, near-copies,
    shared passages) that the exact-fingerprint tier
    (``cross_split_contamination``) misses.  Splits come from the same
    deterministic ``hash_split`` the pipeline trains with.

    Plan: words → md5-hashed n-grams (narrow, codegen) → distinct
    (doc, gram) → one equi-join shuffle keyed on the 32-hex gram hash.
    Skew/boilerplate guard: grams held by more than ``max_postings``
    TRAIN docs are dropped before the join (a gram that common is
    formulaic language, not contamination — and at 100 TB it is also
    the key that would explode the join).  Shuffle payload is
    (id, hash) pairs only; never text.
    """
    if n < 1:
        raise ValueError(f"ngram_contamination: n must be >= 1, got {n}")
    if not eval_splits:
        raise ValueError("ngram_contamination: eval_splits must be non-empty")
    # materialize the word array ONCE before the gram transform: the
    # lambda reads it 8× per position, and an inlined split()
    # expression would be re-evaluated at every read (measured 38 s →
    # ~1 s at sf0.1)
    base = hash_split(docs, key, salt=salt).select(
        F.col(key),
        F.col("split"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__w"),
    )
    w = F.col("__w")
    # sequence(start, stop) DESCENDS when start > stop — guard short docs
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.md5(
                F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tagged = base.select(
        F.col(key), F.col("split"), F.explode(F.array_distinct(grams)).alias("g")
    )
    # tagged feeds THREE subtrees (train postings count, the pruned
    # train side, the eval side) — unpinned, the md5 gram-generation
    # pass (the dominant CPU cost) evaluates once per subtree; pinned,
    # the narrow (id, split, 32-hex-gram) rows materialize once
    tagged = tagged.localCheckpoint(eager=True)
    tr = tagged.filter(F.col("split") == train).select(
        F.col(key).alias("train_id"), "g"
    )
    # anti join against the (tiny, boilerplate-only) over-cap gram
    # set: broadcastable, unlike the keep set which is ~every gram
    hot = (
        tr.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_postings)
        .select("g")
    )
    tr = tr.join(hot, "g", "left_anti")
    ev = tagged.filter(F.col("split").isin(list(eval_splits))).select(
        F.col(key).alias("eval_id"), F.col("split").alias("eval_split"), "g"
    )
    return (
        ev.join(tr, "g")
        .groupBy("eval_id", "eval_split", "train_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def near_split_contamination(
    docs: DataFrame,
    key: str = "doc_id",
    train: str = "train",
    eval_splits: tuple[str, ...] = ("valid", "test"),
    salt: str = "split",
    threshold: float = 0.8,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """NEAR-duplicate eval-set contamination: eval-split documents
    whose shingle-Jaccard with some training document is ≥
    ``threshold`` — the fuzziest decontamination tier, above
    exact-fingerprint (``cross_split_contamination``) and shared-
    n-gram (``ngram_contamination``).  Splits come from the same
    deterministic ``hash_split`` the pipeline trains with.

    Implementation: the train side is the 'archive' and the eval side
    the 'batch' of :func:`htsql_spark.operators.dedup.
    incremental_dup_pairs` — LSH banding join across sides only,
    never a train-side self-join, exact-Jaccard verification of
    candidates.  Output (train_id, eval_id, jaccard)."""
    from .dedup import incremental_dup_pairs

    tagged = hash_split(docs, key, salt=salt)
    tr = tagged.filter(F.col("split") == train).drop("split")
    ev = tagged.filter(F.col("split").isin(list(eval_splits))).drop("split")
    pairs = incremental_dup_pairs(
        tr, ev, k=k, num_hashes=num_hashes, bands=bands,
        threshold=threshold, within_incoming=False,
    )
    return pairs.select(
        F.col("a").alias("train_id"), F.col("b").alias("eval_id"), "jaccard"
    )


def vocab_top_terms(
    docs: DataFrame, v: int = 1000, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide vocabulary: global term frequencies, top ``v`` by
    (count desc, term) — the first step of tokenizer/vocab training.

    One shuffle keyed on term with map-side partial aggregation (the
    hot 'the'-style keys are pre-combined per partition, so the
    shuffle carries one row per (partition, term), not per
    occurrence); the top-v is TakeOrderedAndProject — only v rows per
    partition reach the driver-side merge.  Tie-break on the term
    string makes the cutoff deterministic.
    """
    if v < 1:
        raise ValueError(f"vocab_top_terms: v must be >= 1, got {v}")
    words = F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term")
    counts = docs.select(words).groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), "term")
        .limit(v)
    )


def select_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    buckets: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Budget-constrained corpus selection: keep the highest-quality
    documents, greedily in quality order, until ``budget_tokens``
    is filled — the 'train on the best N tokens' selection step.
    Deterministic ordering: (quality bucket desc, md5(id), id).

    A naive global sort + running sum is a full-corpus total order —
    the wrong shape at 100 TB.  Instead: one aggregation pass builds
    a ``buckets``-bin quality histogram of token mass (driver gets ≤
    ``buckets`` rows — model-sized), the driver walks the histogram
    to find the boundary bucket, whole buckets above it are taken
    with a plain filter (no ordering at all), and ONLY the boundary
    bucket — 1/buckets of the corpus — pays a windowed cumulative
    sum, partitioned so it never global-sorts.  Semantically
    identical to the global-order cumsum (monotone prefix rule),
    which is exactly what the oracle replays.

    Returns (id, q, toks) for the selected documents."""
    from .textstats import quality_score

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    scored = docs.select(
        F.col(id_col),
        quality_score(F.col(text_col)).alias("q"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("toks"),
    ).withColumn(
        "__b",
        F.least(F.floor(F.col("q") * buckets), F.lit(buckets - 1)).cast("int"),
    )
    hist = {
        r["__b"]: r["t"]
        for r in scored.groupBy("__b").agg(F.sum("toks").alias("t")).collect()
    }
    full, cum, boundary, rem = [], 0, None, 0
    for b in sorted(hist, reverse=True):
        if cum + hist[b] <= budget_tokens:
            cum += hist[b]
            full.append(b)
        else:
            boundary, rem = b, budget_tokens - cum
            break
    out = scored.filter(F.col("__b").isin(full)) if full else scored.limit(0)
    if boundary is not None:
        from pyspark.sql import Window

        w = (
            Window.partitionBy("__b")
            .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        part = (
            scored.filter(F.col("__b") == boundary)
            .withColumn("__cum", F.sum("toks").over(w))
            .filter(F.col("__cum") <= rem)
            .drop("__cum")
        )
        out = out.unionByName(part)
    return out.select(id_col, "q", "toks")


def embed_documents(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic feature-hashing text embeddings (the hashing
    trick, Weinberger '09): token → bucket md5(token) mod dim with a
    ±1 sign hash to debias collisions, per-doc signed counts,
    L2-normalized.  Model-free and reproducible anywhere — the
    embedder that lets the semantic ops (SemDeDup, ANN, k-means) run
    end-to-end FROM TEXT with no external model, and the baseline a
    learned embedder replaces.

    Plan: explode → one (doc, bucket) hash-aggregate shuffle →
    per-doc dense-vector build from ≤ dim map entries (narrow) →
    normalize (narrow).  Shuffle rows are (id, bucket, weight) —
    never text; at 100 TB the aggregate is map-side combined on the
    (id, bucket) key.  Output: (id, embedding array<double>, values
    rounded to 6 — exactly replayable in SQL)."""
    words = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ).alias("term")
    toks = docs.select(F.col(id_col), words)
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long") % dim
    ).cast("int")
    sign = F.when(
        F.conv(F.substring(F.md5(F.col("term")), 9, 1), 16, 10).cast("int") % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    g = toks.select(F.col(id_col), bucket.alias("b"), sign.alias("s")).groupBy(
        id_col, "b"
    ).agg(F.sum("s").alias("w"))
    m = F.map_from_entries(F.collect_list(F.struct(F.col("b"), F.col("w"))))
    dense = g.groupBy(id_col).agg(m.alias("__m"))
    # materialize raw vector and norm as COLUMNS between projections:
    # a lambda body re-evaluates embedded subexpressions per element,
    # so an inlined norm would fold the vector 64× per row (measured
    # 4.9 s → 2.2 s at sf0.1)
    raw = dense.select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("int")), F.lit(0.0)
            ),
        ).alias("__raw"),
    )
    withn = raw.select(
        F.col(id_col),
        F.col("__raw"),
        F.greatest(
            F.sqrt(F.aggregate(F.col("__raw"), F.lit(0.0), lambda a, x: a + x * x)),
            F.lit(1e-12),
        ).alias("__n"),
    )
    return withn.select(
        F.col(id_col),
        F.transform(
            F.col("__raw"), lambda x: F.round(x / F.col("__n"), 6)
        ).alias("embedding"),
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model scoring — the cheap proxy for the
    perplexity-filter tier (KenLM-style) every large pipeline runs:
    score each document by the mean log-probability of its words
    under the corpus's own unigram distribution.  Gibberish and
    off-distribution documents score low; boilerplate scores high —
    both tails get filtered downstream.

    Output: (id, n_words, avg_logp, ppl) with ppl = exp(−avg_logp).

    Plan: one term-count aggregation (map-side combined, shuffle
    keyed on term), then one join of exploded doc words against the
    frequency table (shuffle on term — the same key distribution, so
    AQE reuses statistics), then a per-doc mean.  Nothing is
    broadcast: the vocabulary is unbounded at 100 TB.  Hot stop-words
    are the biggest term keys, but their posting rows are (term,
    count) partials on the count side and (doc, term) pairs on the
    probe side — bounded by document length, not corpus size.
    """
    words = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ).alias("term")
    toks = docs.select(F.col(id_col), words)
    # pin the (term, tf) aggregate: it feeds BOTH the probe join and
    # the corpus-total fold, and without a pin Catalyst re-expands the
    # lineage — a THIRD full text explode just to sum tf (the same
    # no-CSE-across-join-inputs trap as tfidf_top_terms' df leg).  The
    # pinned table is vocabulary-sized, tiny next to the corpus text.
    freqs = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(
        eager=False
    )
    total = freqs.agg(F.sum("tf").alias("n")).select("n")
    scored = (
        toks.join(freqs, "term")
        .crossJoin(F.broadcast(total))  # 1-row corpus size
        .select(
            F.col(id_col),
            (F.log(F.col("tf").cast("double")) - F.log(F.col("n").cast("double"))).alias(
                "__lp"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.round(F.avg("__lp"), 6).alias("avg_logp"),
        F.round(F.exp(-F.avg("__lp")), 4).alias("ppl"),
    )


def es_weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis '06, algorithm A-ES): each row draws u ~ Uniform(0,1)
    from the md5 stream over (key, salt) and takes sort key
    ln(u)/w — the top ``k`` rows by that key are an exact weighted
    sample without replacement.  The quality-weighted corpus sampler:
    w = quality score ⇒ high-quality docs are proportionally likelier
    to survive, yet every doc has a chance (unlike a hard top-k by
    score) and the draw replays bit-for-bit across runs, engines and
    partitionings (same md5 determinism contract as :func:`hash_split`).

    Rows with weight <= 0 or NULL are excluded (zero-probability).
    Selection is TakeOrderedAndProject — the two-stage distributed
    top-k, never a global sort; the uniform draw is narrow codegen.
    Returns the sampled rows plus the draw key ``__es_key`` (round 6,
    ties broken by ``key``) for auditability."""
    if k < 1:
        raise ValueError(f"weighted_sample: k must be >= 1, got {k}")
    # u in (0,1]: (int(md5_8) + 1) / 16^8 — never 0, so ln(u) is finite
    u = (
        F.conv(_hash_prefix(F.col(key), salt), 16, 10).cast("double") + 1.0
    ) / F.lit(float(_HEX_SPACE))
    es = F.round(F.log(u) / F.col(weight_col), 6)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__es_key", es)
        .orderBy(F.col("__es_key").desc(), F.col(key))
        .limit(k)
    )


#: Poisson(1) CDF thresholds for the bootstrap draw (truncated at 5 —
#: P(X>5) < 6e-4; the same literals appear in SQL oracles)
_POISSON1_CDF = (0.367879, 0.735759, 0.919699, 0.981012, 0.996340)


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    key: str = "doc_id",
    replicas: int = 64,
    lo: float = 0.025,
    hi: float = 0.975,
    salt: str = "boot",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the corpus mean of
    ``value_col`` — THE resampling method at scale (classical
    bootstrap needs n draws per replica and a global shuffle each;
    Poisson bootstrap reweights every row independently with
    Poisson(1) counts, so all ``replicas`` resamples run in ONE
    pass).  The draw is md5-deterministic per (row, replica): results
    replay bit-for-bit across runs, engines and partitionings.

    Output: one row — (mean, ci_lo, ci_hi, n_replicas) with the
    percentile-method interval over the replica means.

    Plan: the row fans out ×replicas as (replica, weight,
    weight·value) triples folded straight into a per-replica partial
    aggregate (map-side combined, ``replicas`` keys); the replica
    means (≤ ``replicas`` rows) take their percentiles in a final
    single-row aggregate.  Nothing scales with corpus size except
    the one narrow scan."""
    if replicas < 2:
        raise ValueError(f"bootstrap_ci: replicas must be >= 2, got {replicas}")
    b = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("b")
    rows = df.select(F.col(key), F.col(value_col).alias("__v")).select(
        F.col(key), F.col("__v"), b
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col(key).cast("string"), F.lit(salt), F.col("b")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(_HEX_SPACE))
    )
    w = F.lit(5)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < _POISSON1_CDF[k], F.lit(k)).otherwise(w)
    per_rep = (
        rows.select("b", w.alias("__w"), F.col("__v"))
        .groupBy("b")
        .agg(
            (F.sum(F.col("__w") * F.col("__v")) / F.sum("__w")).alias("__mean")
        )
    )
    return per_rep.agg(
        F.round(F.avg("__mean"), 6).alias("mean"),
        F.round(F.percentile("__mean", F.lit(lo)), 6).alias("ci_lo"),
        F.round(F.percentile("__mean", F.lit(hi)), 6).alias("ci_hi"),
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
    )


def temperature_weights(
    docs: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.3,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-based mixture rebalancing (Conneau & Lample '19 /
    XLM-R): upweight tail groups by sampling groups proportionally to
    share^alpha instead of share, the standard fix for head-language
    dominance in multilingual corpora.  Per group: observed count and
    share, the temperature-flattened sampling weight, and (when
    ``budget`` is given) the expected document allocation.

    The output feeds :func:`mix_corpora` as its ``fractions``.  One
    map-side-combined groupBy; normalization runs over the
    group-bounded result (≤ #languages rows), so the single-partition
    window is size-independent of the corpus."""
    if not 0 < alpha <= 1:
        raise ValueError(f"temperature_weights: alpha must be in (0,1], got {alpha}")
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tw = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = F.col("n_docs") / F.sum("n_docs").over(tw)
    flat = F.pow(share, F.lit(float(alpha)))
    weight = flat / F.sum(flat).over(tw)
    out = counts.select(
        group_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(share, 6).alias("share"),
        F.round(weight, 6).alias("weight"),
    )
    if budget is not None:
        out = out.withColumn(
            "expected_docs", F.round(F.col("weight") * budget).cast("long")
        )
    return out


def dsir_weights(
    docs: DataFrame,
    target: Column,
    buckets: int = 1 << 10,
    smoothing: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. '23, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-domain-like its hashed n-gram profile is,
    so a 100 TB crawl can be resampled toward a small high-quality
    domain (wiki/books) without a learned model.

    Features are word unigrams + bigrams hashed into ``buckets``
    buckets (md5 — bit-portable, SQL-replayable).  The bucketed
    target distribution p comes from rows where ``target`` is true;
    the raw distribution q from ALL rows.  A document's importance
    log-weight is Σ_grams [log p̂(bucket) − log q̂(bucket)] with
    Laplace smoothing ``smoothing`` on both estimates.  Selection is
    a downstream ``orderBy(logw desc).limit(k)`` —
    TakeOrderedAndProject, never a global sort.

    Output: (id, n_grams, logw) with logw rounded to 4 (float sums
    agree cross-engine well inside 1e-4).

    Plan: narrow gram generation (unigrams + bigrams, codegen) →
    ONE (doc, bucket) hash-aggregate shuffle (map-side combined) →
    the bucket distribution folds from those partials (second
    shuffle bounded by ``buckets`` keys) → the ≤``buckets``-row
    log-ratio table broadcasts back → one per-doc aggregation.  The
    raw corpus text crosses the wire exactly once, as (doc, bucket,
    count) triples; distribution + log-ratio state is O(buckets)
    regardless of corpus size.  (Reference parity anchor: weighted
    selection sieves, SURVEY §2 F4/F10.)
    """
    if buckets < 2:
        raise ValueError(f"dsir_weights: buckets must be >= 2, got {buckets}")
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(F.col(id_col), target.alias("__tgt"), w.alias("__w"))
    ww = F.col("__w")
    n = F.size(ww)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ww, i), F.element_at(ww, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select(
        F.col(id_col),
        F.col("__tgt"),
        F.explode(F.concat(ww, bigrams)).alias("__g"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10).cast("long"),
        F.lit(buckets),
    ).cast("int")
    # per_doc feeds BOTH the bucket-distribution branch and the probe
    # side of the log-ratio join; without a pin Spark recomputes the
    # gram explode + aggregate twice (no CSE across join inputs — the
    # same rationale as winnow_overlap_pairs).  The pinned table is
    # (doc, bucket, count) triples: ≤ buckets rows per doc, tiny next
    # to the corpus text it summarizes.
    per_doc = (
        grams.select(F.col(id_col), F.col("__tgt"), bucket.alias("b"))
        .groupBy(id_col, "__tgt", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    dist = per_doc.groupBy("b").agg(
        F.sum(F.when(F.col("__tgt"), F.col("c")).otherwise(F.lit(0))).alias("ct"),
        F.sum("c").alias("cr"),
    )
    # totals over ≤buckets rows: a single-partition window is fine at
    # any corpus size because the input is bucket-bounded, not
    # row-bounded
    tw = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    a = F.lit(float(smoothing))
    denom = a * F.lit(float(buckets))
    lr = dist.select(
        "b",
        (
            F.log((F.col("ct") + a) / (F.sum("ct").over(tw) + denom))
            - F.log((F.col("cr") + a) / (F.sum("cr").over(tw) + denom))
        ).alias("lr"),
    )
    return (
        per_doc.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("c") * F.col("lr")), 4).alias("logw"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated-bigram language-model scoring — one fidelity tier
    above :func:`unigram_logprob` on the KenLM-style perplexity-filter
    ladder: score each doc by the mean log-probability of its bigrams
    under p(w2|w1) = λ·c(w1w2)/c(w1·) + (1−λ)·c(w2)/N (Jelinek-Mercer
    interpolation — the unigram back-off keeps unseen-context
    probabilities finite without discounting state).  Repetitive
    boilerplate scores high, shuffled/gibberish word salad scores low
    even when its UNIGRAMS are in-distribution — the failure mode the
    unigram tier cannot see.

    Output: (id, n_bigrams, avg_logp, ppl); docs with fewer than two
    words have no bigrams and are absent (score them with the unigram
    tier).

    Plan: bigram structs built inside the row (text never duplicated
    by the explode) → bigram/context/unigram count tables, each a
    map-side-combined aggregate keyed on its gram → the doc bigram
    stream joins the three tables on their natural keys (bigram,
    then w1, then w2 — the hot stop-word keys carry (gram, count)
    partials, bounded by vocabulary, never doc text) → per-doc mean.
    Nothing broadcasts: vocabulary is unbounded at 100 TB, exactly as
    :func:`unigram_logprob`."""
    if not 0 < lam < 1:
        raise ValueError(f"bigram_logprob: lam must be in (0,1), got {lam}")
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(F.col(id_col), w.alias("__w"))
    ww = F.col("__w")
    n = F.size(ww)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(ww, i).alias("w1"),
                F.element_at(ww, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = d.select(F.col(id_col), F.explode(pairs).alias("__p")).select(
        F.col(id_col), F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2")
    )
    toks = d.select(F.explode(ww).alias("term"))
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    cctx = cbg.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    cuni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c_uni"))
    total = cuni.agg(F.sum("c_uni").alias("n_total"))
    p = F.lit(float(lam)) * F.col("c_bg") / F.col("c_ctx") + (
        F.lit(1.0 - float(lam)) * F.col("c_uni") / F.col("n_total")
    )
    scored = (
        bg.join(cbg, ["w1", "w2"])
        .join(cctx, "w1")
        .join(cuni, bg["w2"] == cuni["term"])
        .crossJoin(F.broadcast(total))  # 1-row corpus size
        .select(F.col(id_col), F.log(p).alias("__lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("__lp"), 6).alias("avg_logp"),
        F.round(F.exp(-F.avg("__lp")), 4).alias("ppl"),
    )


def bigram_top_pairs(
    docs: DataFrame, v: int = 1000, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide adjacent-pair frequencies, top ``v`` — the counting
    primitive of a BPE merge step (the most frequent adjacent pair is
    the next merge).  Same scale shape as :func:`vocab_top_terms`:
    narrow per-row bigram generation, one term-keyed partial-agg
    shuffle, TakeOrderedAndProject with a deterministic (count desc,
    pair) cutoff."""
    if v < 1:
        raise ValueError(f"bigram_top_pairs: v must be >= 1, got {v}")
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    d = docs.select(w.alias("__w"))
    ww = F.col("__w")
    n = F.size(ww)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ww, i), F.element_at(ww, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        d.select(F.explode(bigrams).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), "pair")
        .limit(v)
    )


def corpus_profile(
    docs: DataFrame, by: tuple[str, ...] = ("lang", "source")
) -> DataFrame:
    """Dataset-card profile: per-``by`` document counts, token/char
    totals and length extrema — the summary every corpus release
    ships with (group by ("split", "lang") for the per-split card).
    One hash-aggregate shuffle on the tiny key space; all measures
    are algebraic (partial-agg friendly), so the map side reduces to
    |key-space| rows per partition before the exchange."""
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.groupBy(*by).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(words).alias("tokens"),
        F.sum("n_chars").alias("chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def write_dataset(
    docs: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("lang",),
    card: bool = True,
) -> None:
    """Publish a curated corpus: partitioned parquet plus a
    ``_dataset_card.json`` sidecar carrying the per-(lang, source)
    profile — the release layout a training job consumes directly
    (partition pruning on ``lang`` etc. comes free at read time).

    The card is the ONLY driver-side materialization and is
    |lang×source| rows — model-card-sized, not data-sized.  The
    write itself is the ordinary distributed parquet sink."""
    import json

    (docs.write.partitionBy(*partition_by).mode("overwrite").parquet(path))
    if card:
        rows = [r.asDict() for r in corpus_profile(docs).collect()]
        spark = docs.sparkSession
        # write through the JVM filesystem API so the card lands next
        # to the data on whatever storage the path points at (local,
        # HDFS, s3a…), not just the driver's local disk
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/_dataset_card.json")
        fs = p.getFileSystem(conf)
        out = fs.create(p, True)
        out.write(bytearray(json.dumps(rows, sort_keys=True).encode()))
        out.close()


def pack_sequences(
    docs: DataFrame,
    budget: int = 64,
    shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pre-training
    layout): documents are laid end-to-end in a deterministic order
    and cut into fixed ``budget``-token training sequences; a document
    may straddle a sequence boundary.  Output is one row per
    (document × sequence) span: (doc_id, shard, seq_id, offset, take)
    — offset/take say which slice of the doc's tokens lands in that
    sequence, so the actual batch materialization is a later narrow
    gather.

    Scale posture: documents are bucketed into ``shards`` independent
    streams by md5(doc_id), each packed with ONE window cumsum
    (partitionBy shard) — so parallelism is the shard count and a
    100 TB corpus packs as `shards` independent scans; there is no
    global order dependency.  Deterministic: shard assignment and
    within-shard order are both md5/id-derived, no RNG."""
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % shards
    ).cast("int")
    d = docs.select(
        F.col(id_col), shard.alias("shard"), n_tok.cast("long").alias("__n")
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    d = d.withColumn("__cum0", F.sum("__n").over(w) - F.col("__n"))
    first_seq = F.floor(F.col("__cum0") / budget)
    last_seq = F.floor((F.col("__cum0") + F.col("__n") - 1) / budget)
    d = d.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
    offset = F.greatest(F.lit(0).cast("long"), F.col("seq_id") * budget - F.col("__cum0"))
    take = (
        F.least((F.col("seq_id") + 1) * budget - F.col("__cum0"), F.col("__n")) - offset
    )
    return d.select(
        F.col(id_col),
        "shard",
        F.col("seq_id").cast("int").alias("seq_id"),
        offset.cast("int").alias("offset"),
        take.cast("int").alias("take"),
    )


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """End-to-end corpus curation: quality gate → exact-dedup
    survivors → deterministic split assignment.  The composition a
    training-data job actually runs, as one Catalyst plan.

    Stage costs at scale: the quality gate is a narrow codegen'd
    filter applied AT THE SCAN (cheap rows die before any shuffle);
    the survivor pick is the single shuffle (hash-partition on the
    md5 fingerprint — uniform by construction, no skew); the split
    is narrow again.  One shuffle total for the whole pipeline."""
    from .textstats import fingerprint, quality_score

    t = F.col("text")
    scored = docs.select(
        "doc_id", quality_score(t).alias("quality"), fingerprint(t).alias("fp")
    ).filter(F.col("quality") >= min_quality)
    w = Window.partitionBy("fp")
    survivors = (
        scored.withColumn("__keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__keep"))
        .drop("__keep", "fp")
    )
    return hash_split(survivors, "doc_id", weights)


#: portable (Java regex ∩ RE2) patterns — keep in sync with the oracle
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9() .-]{6,}[0-9]"


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Replace email addresses and phone-number-shaped digit runs with
    typed placeholders, reporting per-doc redaction counts.  Pure
    regexp_replace/regexp_count — codegen'd, narrow, scan-speed."""
    t = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
    )


def append_pii_signals(
    df: DataFrame, text_col: str = "text", prefix: str = ""
) -> tuple[DataFrame, list[str]]:
    """Append the :func:`redact_pii` signals — ``{prefix}emails`` /
    ``{prefix}phones`` (match counts) and ``{prefix}clean`` (the
    redacted text itself) — KEEPING every existing column: the
    column-builder form the query-language ``pii()`` flow method
    composes onto an arbitrary flow.  Pure regexp_replace /
    regexp_count, codegen'd, zero shuffle.  Returns (df, names)."""
    t = F.col(text_col)
    sig = {
        f"{prefix}emails": F.regexp_count(t, F.lit(EMAIL_RE)).cast("int"),
        f"{prefix}phones": F.regexp_count(t, F.lit(PHONE_RE)).cast("int"),
        f"{prefix}clean": F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
        ),
    }
    return df.withColumns(sig), list(sig)


def dedup_chunks(
    docs: DataFrame,
    chunk_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide repeated-passage removal (the RefinedWeb-style
    paragraph-dedup stage, generalized to fixed ``chunk_tokens``-token
    windows since the fixture corpus has no paragraph breaks): every
    chunk of text is kept only at its FIRST occurrence in the corpus
    (global order = (doc_id, chunk position)); later occurrences are
    dropped and the surviving chunks are stitched back into each
    document.  Catches boilerplate shared ACROSS documents that
    whole-doc dedup can't see.

    Plan: tokenize → non-overlapping windows (narrow generate/slice,
    same shape as chunk_documents) → ONE shuffle keyed on the chunk
    md5 (row_number picks the first occurrence; exact-dup groups are
    small after upstream dedup so the key is skew-safe) → one
    group-by-doc to reassemble.  Shuffle payload carries the chunk
    text once per occurrence — at 100 TB this is the same order as the
    scan itself, and the reassembly group is keyed by doc_id (uniform).

    Output: (doc_id, clean_text, kept_chunks, dropped_chunks).
    """
    if chunk_tokens < 1:
        raise ValueError(f"dedup_chunks: chunk_tokens must be >= 1, got {chunk_tokens}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(chunk_tokens)
            )
        ).alias("__start"),
    )
    chunks = exploded.select(
        F.col(id_col),
        F.col("__start"),
        F.array_join(F.slice(F.col("__toks"), F.col("__start"), F.lit(chunk_tokens)), " ").alias(
            "__txt"
        ),
    )
    w = Window.partitionBy(F.md5(F.col("__txt"))).orderBy(id_col, "__start")
    kept = chunks.withColumn("__rk", F.row_number().over(w))
    return (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rk") == 1,
                                F.struct(F.col("__start"), F.col("__txt")),
                            )
                        )
                    ),
                    lambda s: s["__txt"],
                ),
            ).alias("clean_text"),
            F.sum((F.col("__rk") == 1).cast("int")).cast("int").alias("kept_chunks"),
            F.sum((F.col("__rk") > 1).cast("int")).cast("int").alias("dropped_chunks"),
        )
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge-table training (Sennrich '16), the
    tokenizer-training stage of an LLM data pipeline, distributed:

    * corpus state lives as one ``array<string>`` symbol sequence per
      WORD (characters + a ``</w>`` terminator), weighted by word
      frequency — the classic formulation trains on the word
      histogram, so the state size is the VOCABULARY, not the corpus:
      the only full-corpus pass is the initial word count;
    * each round, adjacent-pair frequencies come from one explode +
      map-side-combined count (a shuffle over distinct pairs, tiny),
      the winning pair is chosen deterministically (max count, then
      lexicographic), and the merge is applied to the word table in
      one Arrow pass (adjacent-slot rewriting is inherently
      sequential per word — exactly the declared-Python shape);
    * the driver holds only the merge table (num_merges pairs) and
      each round's argmax row — model artifacts, never corpus data.

    Returns the ordered merge list [(left, right), ...].  Determinism
    contract: fixed merge count + total tie order ⇒ identical merges
    on any partitioning (asserted in tests).
    """
    from typing import Iterator as _It

    import pandas as _pd

    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit("</w>"))
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = (
            words.select(
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("l"),
                                F.element_at("syms", i + 1).alias("r"),
                            ),
                        ),
                    ).otherwise(
                        F.array().cast("array<struct<l:string,r:string>>")
                    )
                ).alias("p"),
                F.col("freq"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        best = (pairs[0]["l"], pairs[0]["r"])
        merges.append(best)
        left, right = best

        def apply_merge(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
            for pdf in batches:
                out_syms = []
                for syms in pdf["syms"]:
                    syms = list(syms)
                    merged = []
                    i = 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == left
                            and syms[i + 1] == right
                        ):
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(syms[i])
                            i += 1
                    out_syms.append(merged)
                yield _pd.DataFrame({"syms": out_syms, "freq": pdf["freq"]})

        words = words.mapInPandas(
            apply_merge, "syms array<string>, freq bigint"
        ).localCheckpoint(eager=True)
    return merges

def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    jvm_max_merges: int = 64,
) -> DataFrame:
    """Apply a trained BPE merge table (:func:`bpe_train`) to a corpus
    — the tokenizer-APPLY stage: real token counts for packing,
    budget selection, and per-token pricing come from here, not from
    whitespace splits.

    Encoding spec: merges are applied SEQUENTIALLY in training order,
    each merging all non-overlapping occurrences left-to-right with
    the scan continuing after each replacement — exactly the word
    rewrite ``bpe_train`` performs, so encoding the training corpus
    reproduces the training run's final word table (asserted in
    tests).  Training-order replay equals rank-priority encoding on
    any pair the table can produce, because a merge's components
    always predate it.

    Plan (``len(merges) <= jvm_max_merges``): pure whole-stage
    codegen, zero shuffle, zero Python.  Each word becomes a
    delimiter-wrapped symbol string (``\\x01sym\\x02`` per symbol) and
    each merge is ONE ``F.replace`` — the closing delimiter makes a
    pair pattern unable to capture a longer symbol's prefix, and
    back-to-back wrapped symbols share no characters, so adjacent
    occurrences merge exactly like the training loop ([a,a,a,a] with
    merge (a,a) -> [aa,aa]).  Above the threshold the same sequential
    semantics run as ONE Arrow pass per batch (not per merge) —
    chained replaces would exceed codegen/method limits at real
    tokenizer sizes (30k+ merges).

    Returns (id_col, toks, n_tokens): ``toks`` is the space-joined
    token string (tokens never contain whitespace — words are
    whitespace-split first), ``n_tokens`` the count.  The reserved
    delimiter chars ``\\x01``/``\\x02`` are stripped from the corpus
    text before encoding on BOTH paths (identical normalization;
    merges containing them are rejected outright).
    Reference spirit: htsql's function registry composes scalarly
    (src/htsql/core/fn/: every op a composable expression); this is
    the same contract over a learned table."""
    if not merges:
        raise ValueError("bpe_encode: empty merge table")
    for m in merges:
        if len(m) != 2 or not m[0] or not m[1]:
            raise ValueError(f"bpe_encode: malformed merge {m!r}")
        if any("\x01" in s or "\x02" in s or " " in s for s in m):
            raise ValueError(f"bpe_encode: merge contains reserved char {m!r}")

    # \x01/\x02 are the JVM path's symbol delimiters: corpus
    # occurrences are stripped HERE, upstream of the word split, so
    # both paths see the same normalized text (previously the JVM
    # unwrap deleted them while the Arrow path kept them as symbols —
    # divergent outputs, and phantom empty tokens inflating n_tokens
    # on the JVM side)
    clean = F.translate(F.col(text_col), "\x01\x02", "")
    words = F.filter(
        F.split(F.trim(F.lower(clean)), r"\s+"),
        lambda w: w != "",
    )

    if len(merges) <= jvm_max_merges:
        # the whole encode is a LINEAR expression chain (each
        # intermediate referenced exactly once) and the result is
        # materialized as a column between two projections: lambda
        # bodies and CollapseProject both re-evaluate duplicated
        # subexpressions, and a naive toks/n_tokens pair re-ran the
        # full replace chain 4x per row (same pitfall documented in
        # embed_documents; measured 2.3 s -> 1.6 s at sf0.1)

        def _encode_word(w):
            syms = F.concat(F.split(w, ""), F.array(F.lit("</w>")))
            s = F.array_join(
                F.transform(
                    syms, lambda c: F.concat(F.lit("\x01"), c, F.lit("\x02"))
                ),
                "",
            )
            for left, right in merges:
                s = F.replace(
                    s,
                    F.lit(f"\x01{left}\x02\x01{right}\x02"),
                    F.lit(f"\x01{left}{right}\x02"),
                )
            # token boundaries \x02\x01 -> ' ' (tokens never contain
            # spaces), then the two outer delimiters vanish
            s = F.replace(s, F.lit("\x02\x01"), F.lit(" "))
            return F.translate(s, "\x01\x02", "")

        enc = docs.select(
            F.col(id_col),
            F.array_join(F.transform(words, _encode_word), " ").alias("toks"),
        )
        return enc.select(
            F.col(id_col),
            F.col("toks"),
            F.when(F.length("toks") == 0, F.lit(0))
            .otherwise(F.size(F.split("toks", " ")))
            .cast("int")
            .alias("n_tokens"),
        )

    # Arrow path: same sequential spec, one Python pass per batch
    from typing import Iterator as _It

    import pandas as _pd

    merge_list = [tuple(m) for m in merges]
    base = docs.select(F.col(id_col).alias("__id"), words.alias("__ws"))

    def _encode(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        def enc_word(w: str) -> list[str]:
            syms = list(w) + ["</w>"]
            for left, right in merge_list:
                merged, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = merged
            return syms

        for pdf in batches:
            toks = [
                [t for w in ws for t in enc_word(w)] for ws in pdf["__ws"]
            ]
            yield _pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "toks": [" ".join(t) for t in toks],
                    "n_tokens": _pd.Series(
                        [len(t) for t in toks], dtype="int32"
                    ),
                }
            )

    out_schema = f"__id {docs.schema[id_col].dataType.simpleString()}, toks string, n_tokens int"
    return base.mapInPandas(_encode, out_schema).withColumnRenamed("__id", id_col)
