"""Plan-shape regression tests: the 100 TB posture in SURVEY.md §8
(minimize shuffles, batch aggregates, push filters to the scan) is
locked in by inspecting the optimized/physical plans — not just row
values."""

import pytest


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_multi_aggregate_one_shuffle(db):
    """3 aggregates over the same plural link → ONE Aggregate + ONE
    Join (batched grouped-join), not three."""
    df = db.df(
        "/customer{name := c_name, total := sum(orders.o_totalprice),"
        " cnt := count(orders), mx := max(orders.o_totalprice)}"
    )
    plan = optimized(df)
    assert plan.count("Aggregate [") == 1, plan
    assert plan.count("Join ") == 1, plan


def test_tpch_q1_shape(db):
    """Quotient with batched complement aggregates (incl. a define()d
    expression): distinct + one grouped join."""
    df = db.df(
        "/lineitem.define(rev := l_extendedprice*(1-l_discount))"
        "^{rf := l_returnflag, ls := l_linestatus}"
        "{rf, ls, sum_qty := sum(^.l_quantity), sum_rev := sum(^.rev),"
        " avg_qty := avg(^.l_quantity), n := count(^)}"
    )
    plan = optimized(df)
    # quotient fusion: ONE groupBy, no distinct, no join-back
    assert plan.count("Aggregate [") == 1, plan
    assert plan.count("Join ") == 0, plan


def test_tpch_q5_single_aggregate(db):
    """Multi-hop navigation + sieve + quotient: the kernel chain is
    joined once and the quotient fuses to one aggregation."""
    df = db.df(
        "/lineitem.define(rev := l_extendedprice*(1-l_discount))"
        "?orders.customer.nation.region.name = 'ASIA'"
        "^{nat := supplier.nation.name}{nat, revenue := sum(^.rev)}"
    )
    plan = optimized(df)
    assert plan.count("Aggregate [") == 1, plan
    # 6 navigation joins (orders, customer, c-nation, region,
    # supplier, s-nation), each table joined exactly once
    assert plan.count("Join ") == 6, plan


def test_multihop_aggregate_prereduces_leaf(db):
    """count/exists over orders.lineitem partial-aggregates lineitem
    on l_orderkey BEFORE joining orders — the fact-fact join consumes
    per-order partials, not exploded rows (hierarchical
    re-aggregation; no Catalyst rule does this)."""
    df = db.df(
        "/customer{name := c_name, has := exists(orders.lineitem),"
        " nli := count(orders.lineitem)}"
    )
    plan = optimized(df)
    # leaf partial agg + per-customer merge; partial join + outer join
    # (the generic path would be ONE agg over an exploded 2-table join)
    assert plan.count("Aggregate [") == 2, plan
    assert plan.count("Join ") == 2, plan


def test_filter_pushdown_reaches_scan(db):
    """A sieve on a scanned column must reach the parquet source."""
    df = db.df("/orders{okey := o_orderkey}?o_totalprice > 100000")
    plan = physical(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice,100000" in plan, plan


def test_column_pruning(db):
    """Selecting 2 columns must not read all 7 orders columns."""
    df = db.df("/orders{okey := o_orderkey, tot := o_totalprice}")
    plan = physical(df)
    idx = plan.index("ReadSchema")
    snippet = plan[idx : idx + 200]
    assert "o_orderdate" not in snippet, snippet


def test_broadcast_dims(db):
    """region/nation singular joins broadcast (no shuffle join for
    fixed-size dims)."""
    df = db.df("/customer{name := c_name, reg := nation.region.name}")
    plan = physical(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_no_sort_without_observable_order(db):
    """A selection + filter with no sort/limit must not plan a global
    Sort."""
    df = db.df("/customer{name := c_name}?c_acctbal > 0")
    assert "Sort [" not in physical(df)


def test_sort_limit_is_take_ordered(db):
    df = db.df("/orders.sort(o_totalprice-).limit(5){okey := o_orderkey}")
    assert "TakeOrderedAndProject" in physical(df)


def test_repeated_aggregate_memoized_across_clauses(db):
    """The same pure-chain aggregate in selection AND sieve (TPC-H Q18
    HAVING shape) lowers once: one scan of the child table, one
    Aggregate, one Join."""
    df = db.df(
        "/orders{okey := o_orderkey, qty := sum(lineitem.l_quantity)}"
        "?sum(lineitem.l_quantity) > 300"
    )
    plan = optimized(df)
    assert plan.count("] parquet") == 2, plan  # orders + lineitem, once each
    assert plan.count("Aggregate [") == 1, plan
    assert plan.count("Join ") == 1, plan


def test_defined_aggregate_lowers_once_across_references(db):
    """An aggregate-valued define (rev := sum(...)) referenced from
    the selection AND the sieve resolves to one grouped join — the
    child table is scanned once (compile.resolve_name name_memo)."""
    df = db.df(
        "/supplier.define(rev := sum((lineitem?l_discount > 0.05)"
        ".define(r := l_extendedprice * (1 - l_discount)).r))"
        "{sname := s_name, total := round(rev, 6)}?rev > 0"
    )
    plan = optimized(df)
    assert plan.count("] parquet") == 2, plan  # supplier + lineitem, once each
    assert plan.count("Aggregate [") == 1, plan


def test_inner_defines_do_not_leak_scope(db):
    """A define() inside an aggregate argument is scoped to that
    sub-flow; referencing it outside is a compile error."""
    import pytest as _pytest

    from htsql_spark.ir import CompileError

    with _pytest.raises(CompileError):
        db.df(
            "/supplier{sname := s_name,"
            " rev := sum(lineitem.define(r := l_extendedprice).r), oops := r}"
        ).collect()


def test_shared_sieved_flow_aggregates_batch(db):
    """Aggregates over the same sieved flow expression with different
    value paths (TPC-H Q14 ratio shape) share one flow evaluation:
    one scan, one Aggregate."""
    df = db.df(
        "/{hi := sum((lineitem?l_discount > 0.05).l_extendedprice),"
        " n := count(lineitem?l_discount > 0.05)}"
    )
    plan = optimized(df)
    assert plan.count("] parquet") == 1, plan  # lineitem scanned once
    assert plan.count("Aggregate [") == 1, plan


def test_sieve_family_aggregates_batch(db, duck):
    """Aggregates over the same flow differing ONLY in their sieve
    predicate (TPC-H Q21's exists/!exists pair) lower as conditional
    aggregates in ONE grouped join — the fact table is touched once
    for the whole family, not once per aggregate — and the values
    match the correlated-subquery oracle."""
    q = (
        "/customer{name := c_name,"
        " nf := count(orders?o_orderstatus='F'),"
        " hi := exists(orders?o_totalprice > 200000),"
        " spend := sum((orders?o_orderstatus='F').o_totalprice)}"
        "?c_custkey < 50"
    )
    df = db.df(q)
    plan = optimized(df)
    # orders appears ONCE: one shared scan feeds all three aggregates
    assert (
        sum("o_orderstatus" in l and "] parquet" in l for l in plan.splitlines()) == 1
    ), plan
    assert plan.count("Aggregate [") == 1, plan
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        duck.execute(
            "SELECT c_name AS name,"
            " coalesce((SELECT count(*) FROM orders WHERE o_custkey = c_custkey"
            "   AND o_orderstatus = 'F'), 0) AS nf,"
            " coalesce((SELECT count(*) FROM orders WHERE o_custkey = c_custkey"
            "   AND o_totalprice > 200000) > 0, FALSE) AS hi,"
            " (SELECT sum(o_totalprice) FROM orders WHERE o_custkey = c_custkey"
            "   AND o_orderstatus = 'F') AS spend"
            " FROM customer WHERE c_custkey < 50"
        ).fetchall()
    )
    assert got == want


def test_q21_reference_family_single_grouped_join(db):
    """The Q21 shape (given $ref + exists/!exists over the same
    correlated flow) touches lineitem 3×, not 5×: outer scan + ONE
    shared grouped join + the ref-injection join."""
    df = db.df(
        "/lineitem?l_shipdate > orders.o_orderdate + 90"
        " & given($me := l_suppkey,"
        " exists(orders.lineitem?l_suppkey != $me)"
        " & !exists(orders.lineitem?l_suppkey != $me"
        "  & l_shipdate > orders.o_orderdate + 90))"
    )
    plan = physical(df)
    assert plan.count("lineitem.parquet") <= 3, plan


def test_tfidf_no_forced_broadcast(db):
    """The tf↔df join must not force a broadcast of the unbounded
    vocabulary table (VERDICT r1 #3): no ResolvedHint in the optimized
    plan; AQE may still choose broadcast at runtime for small ones."""
    from htsql_spark.operators import pipeline

    plan = optimized(pipeline.tfidf_top_terms(db.table("documents")))
    assert "ResolvedHint" not in plan, plan


def test_embedding_lsh_shuffles_ids_only(db):
    """embedding_dup_pairs (default LSH): the candidate self-join must
    join on ids + band buckets — the vectors never replicate into a
    cartesian/blocked product (VERDICT r1 #4) — and signatures come
    from ONE Arrow-vectorized projection, not per-plane folds."""
    from htsql_spark.operators import dedup

    df = dedup.embedding_dup_pairs(db.table("embeddings"), threshold=0.95)
    plan = optimized(df)
    assert "CartesianProduct" not in plan and "crossJoin" not in plan, plan
    # the only Python stages are the band_buckets pandas_udf, once per
    # self-join side (scan-local signature computation, recomputed
    # rather than cached — ids+buckets are what shuffles)
    assert plan.count("ArrowEvalPython") == 2, plan
    # candidate join keyed on (band, bkt), not on vector payloads
    assert "band" in plan and "bkt" in plan, plan


def test_winnow_fingerprints_no_shuffle(db):
    """Winnowing fingerprints are produced task-locally: no Exchange
    in the physical plan (narrow explode/array algebra only)."""
    from htsql_spark.operators import textstats

    plan = physical(textstats.winnow_fingerprints(db.table("documents")))
    assert "Exchange" not in plan, plan


def test_repetition_stats_no_shuffle(db):
    """Repetition quality signals are per-row array algebra: no
    Exchange, whole-stage codegen, scan pruned to (doc_id, text)."""
    from htsql_spark.operators import textstats

    plan = physical(textstats.repetition_stats(db.table("documents")))
    assert "Exchange" not in plan, plan
    # scan pruned to the two columns used
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_gopher_and_entropy_no_shuffle(db):
    """The Gopher rule set and the entropy fold are in-row
    projections: no Exchange, scan pruned to (doc_id, text)."""
    from htsql_spark.operators import textstats

    for fn in (textstats.gopher_rules, textstats.token_entropy):
        plan = physical(fn(db.table("documents")))
        assert "Exchange" not in plan, (fn.__name__, plan)
        assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_dsir_single_scan_and_broadcast(db):
    """DSIR: the pinned per-doc aggregate keeps the corpus to ONE scan
    (no FileScan above the checkpoint); the bucket-bounded log-ratio
    table joins via broadcast, never sort-merge."""
    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline

    plan = physical(
        pipeline.dsir_weights(db.table("documents"), F.col("lang") == "en")
    )
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "FileScan" not in plan, plan  # corpus pinned below the checkpoint


def test_duplicated_spans_no_text_shuffle(db):
    """Duplicated-span detection shuffles (id, pos, fp) triples only:
    text appears in the scan but in no Exchange payload."""
    from htsql_spark.operators import textstats

    plan = physical(textstats.duplicated_spans(db.table("documents")))
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_hard_negatives_two_stage_topk(db):
    """Hard-negative mining: query side broadcasts (no shuffled join
    of the corpus against queries), both ranking stages are windows."""
    from htsql_spark.operators import similarity

    plan = physical(
        similarity.hard_negatives(db.table("embeddings"), query_ids=[0, 1], k=3)
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Window") >= 2, plan


def test_vocab_partial_agg_and_take_ordered(db):
    """Global vocabulary: map-side partial aggregation before the
    term exchange, top-v via TakeOrderedAndProject (no global sort)."""
    from htsql_spark.operators import pipeline

    plan = physical(pipeline.vocab_top_terms(db.table("documents"), v=100))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    assert "Sort " not in plan, plan  # no full sort — heap-merge only


def test_corpus_profile_single_exchange(db):
    """Dataset-card profile: exactly one exchange (the lang×source
    hash agg); all measures partial-agg on the map side."""
    from htsql_spark.operators import pipeline

    plan = physical(pipeline.corpus_profile(db.table("documents")))
    assert plan.count("Exchange") == 1, plan


def test_ngram_contamination_id_hash_shuffle_only(db):
    """Decontamination join shuffles (id, gram-hash) pairs only —
    document text never crosses the wire."""
    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline

    df = pipeline.ngram_contamination(db.table("documents"), n=8)
    plan = physical(df)
    # the join key is the md5 gram hash; text is consumed upstream of
    # every exchange (no 'text' column in any exchange's schema line)
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0), m.group(0)


def test_semantic_dedup_cell_keyed_gemm(db):
    """SemDeDup pair stage is ONE Arrow applyInPandas GEMM per
    centroid cell — a single exchange keyed on cell, never a
    cartesian or an expression-level self-join."""
    from htsql_spark.operators import dedup

    plan = physical(dedup.semantic_dup_pairs(db.table("embeddings"), num_cells=4))
    assert "CartesianProduct" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert plan.count("Exchange") == 1, plan


# ----------------------------------------------------------------------
# plan-shape locks for the round-8 gate rotation (the 8 ops that only
# ever had pytest-oracle coverage) — shapes graded for 100 TB
# ----------------------------------------------------------------------
def test_zscore_single_window(db):
    """group_zscore: both moments AND the normalized value come from
    ONE Window node over ONE group-key exchange — not one shuffle per
    moment."""
    from htsql_spark.operators import olap

    df = olap.group_zscore(
        db.table("documents"), "n_chars", ["lang"], id_cols=["doc_id"]
    )
    plan = physical(df)
    assert plan.count("Window") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Join") == 0, plan


def test_table_stats_shape(db):
    """table_stats exact_ndv=True (r13 optimization): the plain
    statistics fold into one pass and each column's exact NDV runs as
    its OWN pruned single-column two-phase hash count_distinct — no
    Expand (the old single-agg multi-distinct shape sorted a
    rows×(cols+1) expansion), the NDV side table joins back by
    BROADCAST.  Scans = 1 + #cols by design (each NDV scan reads one
    column; see olap.table_stats docstring)."""
    from htsql_spark.operators import olap

    orders = db.table("orders")
    ncols = len(orders.columns)
    plan = physical(olap.table_stats(orders))
    assert "Expand" not in plan, plan
    assert plan.count("Scan ") == 1 + ncols, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_table_stats_hll_single_pass(db):
    """table_stats exact_ndv=False (the documented 100 TB path):
    mergeable HLL NDV collapses the profile back into ONE scan, no
    joins."""
    from htsql_spark.operators import olap

    plan = physical(olap.table_stats(db.table("orders"), exact_ndv=False))
    assert plan.count("Scan ") == 1, plan
    assert plan.count("Join") == 0, plan


def test_bootstrap_ci_single_scan(db):
    """Poisson bootstrap: all replicas fan out from ONE scan via one
    Generate (explode) into a map-side-combined per-replica aggregate;
    nothing scales with corpus size except that scan."""
    from htsql_spark.operators import pipeline

    plan = physical(pipeline.bootstrap_ci(db.table("documents"), "n_chars"))
    assert plan.count("Scan ") == 1, plan
    assert plan.count("Join") == 0, plan
    assert plan.count("Generate") == 1, plan


def test_triangles_pinned_edges_no_nested_loop(spark):
    """triangle_count pins the normalized and oriented edge lists, so
    the caller's edge-derivation subtree is scanned once, not once per
    reference (was 60 scans / 53 joins on the gate query), and every
    join is an equi-join."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    df = entry.queries()["op_triangles"](spark, SF_DIR)
    plan = physical(df)
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoop" not in plan, plan
    assert plan.count("Scan ") <= 4, plan
    assert plan.count("Join") <= 3, plan


def test_audio_dedup_arrow_only_single_decode(db):
    """audio_dup_pairs: WAV decode is Arrow mapInPandas (never
    row-at-a-time Python), and the pinned (id, fp) table means the
    pair self-join does NOT re-decode each side."""
    from htsql_spark.operators import multimodal

    assets = multimodal.audio_assets_from_documents(db.table("documents"))
    plan = physical(multimodal.audio_dup_pairs(assets))
    assert "BatchEvalPython" not in plan, plan
    # the decode subtree is behind the checkpoint pin: the visible
    # plan joins two scans of the pinned rdd, no MapInPandas re-run
    assert plan.count("MapInPandas") <= 1, plan


def test_ivfpq_index_path_scans_codes_only(spark):
    """The op_ann_ivfpq gate query (materialized code index): the only
    scan touching `embedding` is the broadcast query-row lookup; the
    corpus side reads the cell-bucketed codes table."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    df = entry.queries()["op_ann_ivfpq"](spark, SF_DIR)
    plan = physical(df)
    emb_scans = [l for l in plan.splitlines() if "Scan" in l and "embedding" in l]
    assert len(emb_scans) == 1, plan
    assert "pq_codes_gate" in plan, plan


def test_ivfpq_append_path_scans_codes_only(spark):
    """The op_ann_append gate query: after build-half + append-half,
    the query side scans the appended codes table only — the archive's
    embedding column is never re-read (incremental-ingest contract)."""
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    df = entry.queries()["op_ann_append"](spark, SF_DIR)
    plan = physical(df)
    emb_scans = [l for l in plan.splitlines() if "Scan" in l and "embedding" in l]
    assert len(emb_scans) == 1, plan
    assert "pq_codes_app" in plan, plan


def test_ivfpq_gate_index_built_once_per_session(spark):
    """_ensure_pq_gate_index is a no-op when the marker-checked table
    already exists (r8 judge nit #1: the old gate row rebuilt + rewrote
    the index inside every timed run)."""
    import os

    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    table = entry._ensure_pq_gate_index(spark, SF_DIR)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, table)
    before = {n: os.path.getmtime(os.path.join(loc, n)) for n in os.listdir(loc)}
    assert entry._ensure_pq_gate_index(spark, SF_DIR) == table
    after = {n: os.path.getmtime(os.path.join(loc, n)) for n in os.listdir(loc)}
    assert before == after  # reused, not rewritten


def test_lang_classify_single_projection(db):
    """classify() through the parser stays a zero-shuffle scan +
    project: no Exchange, no Python stage."""
    plan = physical(
        db.df("/documents.classify(){doc_id, cls_score, cls_keep}")
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan and "InPandas" not in plan, plan


def test_lang_inrow_methods_zero_shuffle(db):
    """stats()/pii()/sample()/split() through the parser stay
    zero-shuffle scan + project/filter: no Exchange, no Python stage —
    the flow methods inherit the operators' scan-speed plans."""
    for q in (
        "/documents.stats(){doc_id, stats_quality, stats_langid}",
        "/documents.pii(){doc_id, pii_emails, pii_clean}",
        "/documents.sample(0.25){doc_id}",
        "/documents.split(){doc_id, split}",
        "/documents.split('test'){doc_id}",
    ):
        plan = physical(db.df(q))
        assert "Exchange" not in plan, (q, plan)
        assert "EvalPython" not in plan and "InPandas" not in plan, (q, plan)


def test_lang_chunk_repetition_zero_shuffle(db):
    """chunk()/repetition() through the parser are task-local
    expansions/projections: no Exchange, no join, no Python stage."""
    for q in (
        "/documents.chunk(){doc_id, chunk_idx, chunk_md5}",
        "/documents.repetition(){doc_id, rep_dup_word_frac}",
    ):
        plan = physical(db.df(q))
        assert "Exchange" not in plan, (q, plan)
        assert "EvalPython" not in plan and "InPandas" not in plan, (q, plan)


def test_lang_unigram_single_text_scan(db):
    """unigram() reads the text column once for the model AND the
    probe (the exploded token table feeds both legs); the join back
    ships ids + three numbers."""
    df = db.df("/documents.unigram(){doc_id, lm_avg_logp}")
    plan = optimized(df)
    assert plan.count("] parquet") <= 3, plan  # flow leg + token legs
    phys = physical(df)
    assert "EvalPython" not in phys and "InPandas" not in phys, phys


def test_lang_sessionize_single_exchange(db):
    """sessionize() is one user_id-keyed shuffle: both windows (lag +
    running sum) share the same partitioning, so exactly one Exchange
    appears in the plan."""
    plan = physical(
        db.df("/events.sessionize(){user_id, event_id, session_id}")
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan and "InPandas" not in plan, plan


def test_lang_winnow_single_text_scan(db):
    """winnow() reads the documents text column exactly once: the
    fingerprint leg carries (key, fp) only and joins back on the key —
    no second full-text pass."""
    df = db.df("/documents.winnow(){doc_id, fp}")
    plan = optimized(df)
    assert plan.count("] parquet") <= 2, plan  # flow leg + fp leg
    # the join-back ships ids+fp, never a second text column
    phys = physical(df)
    assert "EvalPython" not in phys and "InPandas" not in phys, phys


def test_lang_reshape_methods_plan_shape(db):
    """funnel()/retention()/transitions() through the parser inherit
    the analytics kernels' plans: funnel reads events ONCE (one
    user_id shuffle, per-user lists stay array-local); transitions
    reads events once (lead window + pair count = 2 exchanges);
    retention reads events twice (first-touch leg + distinct-active
    leg) with 3 exchanges total.  No Python stage anywhere — a 100 TB
    event log pays scan + keyed shuffles only."""
    cases = [
        ("/events.funnel('view','click','purchase')", 1, 1),
        (
            "/events.retention(){cohort_week, week_offset, users}"
            "?week_offset>0",
            2,
            3,
        ),
        ("/events.transitions().sort(n-, event_type, next_type).limit(25)", 1, 2),
    ]
    for q, max_scans, max_hash_exchanges in cases:
        df = db.df(q)
        opt = optimized(df)
        assert opt.count("] parquet") <= max_scans, (q, opt)
        phys = physical(df)
        assert phys.count("Exchange hashpartitioning") <= max_hash_exchanges, (
            q,
            phys,
        )
        assert "EvalPython" not in phys and "InPandas" not in phys, (q, phys)


def test_lang_zscore_single_window(db):
    """zscore(value, group) through the parser is ONE scan + ONE
    group-keyed exchange + ONE Window node: both moments and the
    normalized value share the partitioning (the append_zscore
    contract group_zscore also rides on)."""
    df = db.df("/events.zscore(value, event_type){event_id, z}")
    opt = optimized(df)
    assert opt.count("] parquet") == 1, opt
    phys = physical(df)
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert phys.count("Window") == 1, phys
    assert "EvalPython" not in phys and "InPandas" not in phys, phys


def test_lang_dup_spans_pack_scan_budget(db):
    """dup_spans()/pack() through the parser stay within the kernels'
    scan budgets (dup_spans: flow leg + fp leg + totals leg; pack:
    flow leg + token-count leg) with no Python stage."""
    for q, max_scans in (
        ("/documents.dup_spans(){doc_id, spans_dup_frac}", 3),
        ("/documents.pack(64){doc_id, pack_seq_id, pack_take}", 2),
    ):
        df = db.df(q)
        opt = optimized(df)
        assert opt.count("] parquet") <= max_scans, (q, opt)
        phys = physical(df)
        assert "EvalPython" not in phys and "InPandas" not in phys, (q, phys)


def test_lang_profile_single_exchange(db):
    """profile() through the parser is ONE scan + ONE partition-keyed
    exchange; the two Window nodes (value-ordered rank family,
    row-ordered ntile/lag/lead/running family) share the
    partitioning."""
    df = db.df(
        "/orders.profile(o_totalprice, o_custkey, o_orderdate,"
        " o_orderkey){okey := o_orderkey, prof_rnk, prof_running_sum}"
    )
    opt = optimized(df)
    assert opt.count("] parquet") == 1, opt
    phys = physical(df)
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert "EvalPython" not in phys and "InPandas" not in phys, phys


def test_lang_decontaminate_broadcast_anti(db):
    """decontaminate(benchmark) is a BROADCAST left anti join on the
    content fingerprint: the corpus side is one scan with no
    corpus-keyed shuffle — the shape that holds when the corpus is
    100 TB and the benchmark is an eval set."""
    df = db.df("/documents.decontaminate(documents?doc_id>=400){doc_id}")
    phys = physical(df)
    assert "BroadcastHashJoin" in phys and "LeftAnti" in phys, phys
    # the only exchange is benchmark-side (fingerprint distinct)
    assert phys.count("Exchange hashpartitioning") <= 1, phys
    assert "EvalPython" not in phys and "InPandas" not in phys, phys


def test_stream_anomaly_state_is_fixed_width(spark):
    """streaming anomaly state: three fixed-width numeric fields
    (n, s, ss) — O(1) bytes per key, no lists/strings that could grow
    with stream length (the state-store boundedness contract)."""
    from pyspark.sql.types import _parse_datatype_string

    from htsql_spark.streaming import events as ev

    st = _parse_datatype_string(ev._ANOM_STATE)
    assert len(st.fields) == 3
    assert {f.dataType.typeName() for f in st.fields} <= {"long", "double"}


def test_theta_join_nonbroadcast_extracts_equi_key(spark):
    """theta_join(broadcast_right=False) with a mixed condition plans
    a HASH-KEYED join (Catalyst extracts the equality conjunct; the
    inequality is a residual filter) — never a nested loop.  A pure
    inequality condition RAISES instead of silently planning a
    cartesian; allow_unbounded=True is the explicit opt-in."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from htsql_spark.operators.joins import theta_join

    from tests.conftest import SF_DIR

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_extendedprice") > F.col("o_totalprice") * 0.5
    )
    out = theta_join(li, o, cond, broadcast_right=False)
    phys = out._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in phys, phys
    assert "BroadcastNestedLoopJoin" not in phys, phys
    assert (
        "SortMergeJoin" in phys
        or "ShuffledHashJoin" in phys
        or "BroadcastHashJoin" in phys
    ), phys

    bad = F.col("l_extendedprice") > F.col("o_totalprice") * 0.5
    with _pytest.raises(ValueError, match="equality conjunct"):
        theta_join(li, o, bad, broadcast_right=False)
    # explicit opt-in still works (the documented small-corpus mode)
    assert (
        theta_join(li.limit(5), o.limit(5), bad, broadcast_right=False,
                   allow_unbounded=True).count() >= 0
    )


def test_theta_join_guard_ignores_upstream_nested_loops(spark):
    """The containment guard inspects ITS OWN join node only: an
    upstream sanctioned broadcast-1-row nested loop (the
    detach/histogram pattern) must not false-positive a perfectly
    hash-keyed theta join."""
    from pyspark.sql import functions as F

    from htsql_spark.operators.joins import theta_join
    from tests.conftest import SF_DIR

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    one = li.agg(F.max("l_extendedprice").alias("__mx"))
    left = li.join(F.broadcast(one))  # sanctioned 1-row cross join
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_extendedprice") > F.col("o_totalprice") * 0.5
    )
    out = theta_join(left, o, cond, broadcast_right=False)
    assert out.count() >= 0  # guard did not raise


def test_theta_join_guard_is_batch_only(spark):
    """The broadcast_right=False plan guard forces physical planning
    at construction time, which a streaming input cannot do: it must
    raise a NAMED error pointing at the two declared containment
    shapes, not fail deep inside streaming planning (round-10
    ADVICE).  broadcast_right=True stays streaming-legal."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from htsql_spark.operators.joins import theta_join
    from tests.conftest import SF_DIR

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    ).select(F.col("value").alias("l_orderkey"), F.col("timestamp"))
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    cond = F.col("l_orderkey") == F.col("o_orderkey")
    with _pytest.raises(ValueError, match="batch-only"):
        theta_join(stream, o, cond, broadcast_right=False)
    # the broadcast containment shape still constructs on a stream
    out = theta_join(stream, o.limit(10), cond, broadcast_right=True)
    assert out.isStreaming
