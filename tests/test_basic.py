"""M0 slice: scan, selection, sieve, navigation, correlated count."""

import pytest


def test_mapped_selection_aggregate(db, duck):
    """sum(plural{expr}) — a one-item selection maps an expression
    over the plural flow for the enclosing aggregate."""
    rows = db.produce(
        "/nation{name, rev := sum(customer{c_acctbal * 2})}?region.name='ASIA'"
    )
    exp = dict(
        duck.execute(
            "SELECT n_name, sum(c_acctbal * 2) FROM nation"
            " JOIN region ON n_regionkey = r_regionkey"
            " LEFT JOIN customer ON c_nationkey = n_nationkey"
            " WHERE r_name = 'ASIA' GROUP BY n_name"
        ).fetchall()
    )
    assert {r["name"]: round(r["rev"], 4) for r in rows} == {
        k: round(v, 4) for k, v in exp.items()
    }


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_scan_all(db):
    df = db.df("/region")
    assert df.columns == ["r_regionkey", "r_name"]
    assert df.count() == 5


def test_selection_and_alias(db):
    df = db.df("/region{name := r_name}")
    assert df.columns == ["name"]
    assert sorted(rows(df)) == [
        ("AFRICA",), ("AMERICA",), ("ASIA",), ("EUROPE",), ("MIDDLE EAST",)
    ]


def test_prefix_alias(db):
    df = db.df("/region{name}")
    assert df.columns == ["name"]
    assert df.count() == 5


def test_sieve(db):
    df = db.df("/region?r_name='ASIA'")
    assert df.count() == 1


def test_singular_navigation(db):
    df = db.df("/nation{name, region.name :as region_name}")
    out = dict(rows(df))
    assert len(out) == 25
    assert set(dict(rows(db.df("/region{name}"))).keys()) if False else True
    assert all(v in ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST") for v in out.values())


def test_flagship_correlated_count(db, duck):
    df = db.df("/nation{name, count(customer) :as cnt}?region.name='ASIA'")
    got = sorted(rows(df))
    exp = sorted(
        duck.execute(
            """
            SELECT n_name AS name, count(c_custkey) AS cnt
            FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' GROUP BY n_name
            """
        ).fetchall()
    )
    assert got == exp


def test_plural_flow(db, duck):
    df = db.df("/nation.customer?nation.region.name='ASIA'")
    n = duck.execute(
        """
        SELECT count(*) FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        """
    ).fetchone()[0]
    assert df.count() == n


def test_scalar_at_home(db):
    assert rows(db.df("/2+2")) == [(4,)]


def test_count_at_home(db, duck):
    n = duck.execute("SELECT count(*) FROM customer").fetchone()[0]
    assert rows(db.df("/count(customer)")) == [(n,)]


def test_unknown_name_errors(db):
    from htsql_spark import CompileError

    with pytest.raises(CompileError):
        db.df("/nation{nonexistent_column}")


def test_plural_in_singular_errors(db):
    from htsql_spark import CompileError

    with pytest.raises(CompileError):
        db.df("/nation{customer}")  # plural link selected without aggregate


def test_approx_percentile_matches_discrete_quantile(db):
    """approx_percentile (GK sketch, accuracy 10000) is exact on small
    groups: equals the lower discrete median element."""
    r = db.produce(
        "/nation{name, p50 := approx_percentile(customer.c_acctbal, 0.5)}"
        "?n_nationkey = 1"
    )
    vals = sorted(
        x["c_acctbal"] for x in db.produce("/customer{c_acctbal}?c_nationkey = 1")
    )
    assert r[0]["p50"] == vals[(len(vals) - 1) // 2]


def test_derived_partsupp_shape_and_navigation(db, duck):
    """partsupp is derived (no fixture file): 4 distinct suppliers per
    part, values matching the oracle CTE, navigable in both
    directions."""
    from htsql_spark.derived import PARTSUPP_ORACLE_CTE

    got = sorted(rows(db.df("/partsupp")))
    want = sorted(duck.execute(PARTSUPP_ORACLE_CTE + "SELECT * FROM partsupp").fetchall())
    assert got == want
    per_part = db.produce("/part.limit(5){p_partkey, n := count(partsupp)}")
    assert all(r["n"] == 4 for r in per_part)
    nav = db.produce("/partsupp.limit(1){ps_partkey, pname := part.p_name, sname := supplier.s_name}")
    assert nav[0]["pname"] and nav[0]["sname"]


def test_define_on_quotient(db, duck):
    """`flow^{k}.define(v := sum(^.x))` — the bare-record kernel heads
    a compose chain; define binds to the QUOTIENT, and fork() compares
    each group against the global aggregate of groups."""
    got = sorted(rows(db.df(
        "/customer.define(val := c_acctbal)"
        "^{seg := c_mktsegment}"
        ".define(v := sum(^.val))"
        "{seg, total := round(v, 4)}?v > avg(fork().v)"
    )))
    want = sorted(duck.execute(
        "WITH g AS (SELECT c_mktsegment AS seg, sum(c_acctbal) AS v"
        " FROM customer GROUP BY 1)"
        " SELECT seg, round(v, 4) AS total FROM g"
        " WHERE v > (SELECT avg(v) FROM g)"
    ).fetchall())
    assert got == want


def test_ordered_mode_reference_parity(spark, duck):
    """ordered=True restores the reference's always-ordered output
    contract: scans come back in PK order, quotients in kernel order —
    without it, order is only materialized at order-sensitive
    boundaries (the Spark-sane default)."""
    from htsql_spark import HTSQL
    from tests.conftest import SF_DIR

    odb = HTSQL(spark, SF_DIR, ordered=True)
    got = [r["c_custkey"] for r in odb.produce("/customer{c_custkey}?c_custkey < 20")]
    assert got == sorted(got)
    segs = [r["seg"] for r in odb.produce("/customer^{seg := c_mktsegment}{seg}")]
    assert segs == sorted(segs)
    # explicit sort still wins over the implicit PK order
    desc = [r["c_custkey"] for r in odb.produce(
        "/customer.sort(c_custkey-).limit(5){c_custkey}")]
    assert desc == sorted(desc, reverse=True)


def test_textstat_scalars_in_language(db):
    """Pipeline kernels callable from HTSQL queries: quality/lang_id/
    token_count/fingerprint/word_count as scalar functions."""
    rows = db.produce(
        "/documents{doc_id, q := quality(text), lid := lang_id(text)}"
        "?doc_id < 5"
    )
    assert len(rows) == 5
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)
    assert all(isinstance(r["lid"], str) for r in rows)
    # usable in predicates and arity-checked
    n = db.produce("/{n := count(documents?word_count(text) >= 50)}")
    assert n[0]["n"] > 0
    import pytest as _pytest

    from htsql_spark.compile import CompileError

    with _pytest.raises(CompileError):
        db.df("/documents{quality(text, 2)}")


def test_flow_method_dedup_exact_planted_clones(spark, tmp_path):
    """dedup_exact(key) through the parser over a keyless reflected
    mount: exact AND whitespace/case-normalized clones collapse to
    the min-key survivor; omitting the key on a pk-less mount is a
    loud compile error, not a wrong answer."""
    from htsql_spark import HTSQL
    from htsql_spark.catalog import Catalog
    from htsql_spark.ir import CompileError

    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma"),  # exact clone of 0
        (2, "something else entirely"),
        (3, "  Alpha   BETA gamma  "),  # normalized clone of 0
        (4, "alpha beta gamma delta"),  # superstring, NOT a clone
    ]
    import pandas as pd

    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        str(tmp_path / "docs.parquet")
    )
    db2 = HTSQL(spark, str(tmp_path), catalog=Catalog.from_files(str(tmp_path)))
    got = sorted(
        r["doc_id"] for r in db2.produce("/docs.dedup_exact(doc_id){doc_id}")
    )
    assert got == [0, 2, 4]
    with pytest.raises(CompileError, match="survivor key"):
        db2.produce("/docs.dedup_exact(){doc_id}")


def test_flow_method_signals_compose_with_aggregates(db, duck):
    """Appended gopher()/entropy() attributes participate in
    quotients/aggregates like physical columns."""
    got = {
        (r["lang"], r["n"], r["avg_e"])
        for r in db.produce(
            "/documents.entropy()^{lang := lang}"
            "{lang, n := count(^), avg_e := round(avg(^.entropy), 4)}"
        )
    }
    exp = {
        tuple(r)
        for r in duck.execute(
            """
            WITH base AS (
              SELECT doc_id, lang,
                string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
              FROM documents),
            toks AS (SELECT doc_id, lang, unnest(w) AS term FROM base),
            cnt AS (SELECT doc_id, lang, term, count(*) AS c FROM toks GROUP BY 1,2,3),
            ent AS (SELECT doc_id, lang,
                round(ln(sum(c)) - sum(c*ln(c))/sum(c), 6) AS entropy
              FROM cnt GROUP BY 1,2)
            SELECT lang, count(*) AS n, round(avg(entropy), 4) AS avg_e
            FROM ent GROUP BY 1
            """
        ).fetchall()
    }
    assert got == exp


def test_flow_method_dedup_minhash_planted_clones(spark, tmp_path):
    """dedup_minhash(key) through the parser: planted near-clones (one
    token appended to a 60-token doc → shingle Jaccard ≈ 0.97) are
    dropped in favour of the smaller key; unrelated docs survive."""
    import pandas as pd

    from htsql_spark import HTSQL
    from htsql_spark.catalog import Catalog

    base = " ".join(f"tok{i} common word here" for i in range(15))
    other = " ".join(f"zz{i} completely different vocabulary" for i in range(15))
    rows = [
        (0, base),
        (1, base + " extra"),  # near-clone of 0 (j ≈ 0.97)
        (2, other),
        (3, other + " tail"),  # near-clone of 2
        (4, "short unrelated text snippet"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        str(tmp_path / "docs.parquet")
    )
    db2 = HTSQL(spark, str(tmp_path), catalog=Catalog.from_files(str(tmp_path)))
    got = sorted(
        r["doc_id"] for r in db2.produce("/docs.dedup_minhash(doc_id){doc_id}")
    )
    assert got == [0, 2, 4]


def test_flow_method_tfidf_matches_operator(db, spark):
    """tfidf(k) through the parser equals pipeline.tfidf_top_terms on
    the same corpus — the flow method is a front-end, not a fork of
    the operator."""
    from htsql_spark.operators.pipeline import tfidf_top_terms

    got = {
        (r["doc_id"], r["tfidf_term"], r["tfidf_tf"], r["tfidf_score"])
        for r in db.produce(
            "/documents.tfidf(3){doc_id, tfidf_term, tfidf_tf, tfidf_score}"
        )
    }
    exp = {
        (r.doc_id, r.term, r.tf, r.tfidf)
        for r in tfidf_top_terms(db.table("documents"), k=3).collect()
    }
    assert got == exp


def test_flow_method_near_matches_operator(db):
    """near(q, k) through the parser equals similarity.topk_ivfpq
    (inline path) — same quantizers, same ranking, same rounding."""
    from htsql_spark.operators.similarity import topk_ivfpq

    got = {
        (r["vec_id"], r["near_cos4"])
        for r in db.produce("/embeddings.near(0, 10){vec_id, near_cos4}")
    }
    exp = {
        (r.vec_id, r.cos4)
        for r in topk_ivfpq(db.table("embeddings"), query_id=0, topk=10).collect()
    }
    assert got == exp


def test_selection_alias_wins_over_appended_attribute(db):
    """A user alias defined in a selection is NOT shadowed by a later
    flow method's appended attribute of the same name (r8 advisor):
    selection-output names resolve before Flow.extra."""
    rows = {
        r["doc_id"]: r["entropy"]
        for r in db.produce(
            "/documents{doc_id, entropy := doc_id + 100}.entropy()?doc_id<3"
        )
    }
    assert rows == {0: 100, 1: 101, 2: 102}


def test_flow_method_stats_matches_operator(db):
    """stats() through the parser equals textstats.text_stats on the
    same corpus — the flow method is a front-end, not a fork."""
    from htsql_spark.operators.textstats import text_stats

    got = {
        (
            r["doc_id"], r["stats_tokens"], r["stats_words"],
            r["stats_chars"], r["stats_punct_ratio"], r["stats_quality"],
            r["stats_langid"], r["stats_fp"],
        )
        for r in db.produce(
            "/documents.stats(){doc_id, stats_tokens, stats_words,"
            " stats_chars, stats_punct_ratio, stats_quality,"
            " stats_langid, stats_fp}"
        )
    }
    exp = {tuple(r) for r in text_stats(db.table("documents")).collect()}
    assert got == exp


def test_flow_method_pii_planted_redaction(spark, tmp_path):
    """pii() through the parser over planted PII: emails and phone
    runs are counted and replaced by typed placeholders; clean docs
    pass through byte-identical."""
    import pandas as pd

    from htsql_spark import HTSQL
    from htsql_spark.catalog import Catalog

    rows = [
        (0, "contact alice.smith+x@example.co.uk or bob@test.org now"),
        (1, "call +1 (415) 555-0199 today"),
        (2, "no personal data here at all"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        str(tmp_path / "docs.parquet")
    )
    db2 = HTSQL(spark, str(tmp_path), catalog=Catalog.from_files(str(tmp_path)))
    got = {
        r["doc_id"]: (r["pii_emails"], r["pii_phones"], r["pii_clean"])
        for r in db2.produce(
            "/docs.pii(){doc_id, pii_emails, pii_phones, pii_clean}"
        )
    }
    assert got[0] == (2, 0, "contact [EMAIL] or [EMAIL] now")
    assert got[1] == (0, 1, "call [PHONE] today")
    assert got[2] == (0, 0, "no personal data here at all")
    # sieve on the appended count composes (selection first — the
    # sieve binds loosest, reference precedence)
    hits = [
        r["doc_id"]
        for r in db2.produce("/docs.pii(){doc_id}?pii_emails+pii_phones>0")
    ]
    assert sorted(hits) == [0, 1]


def test_flow_method_sample_split_deterministic_and_disjoint(db):
    """sample(frac) picks the same rows on every run (content-stable);
    split() partitions the corpus — the three sieves are disjoint and
    exhaustive, and agree with the appended split() attribute."""
    s1 = [r["doc_id"] for r in db.produce("/documents.sample(0.25){doc_id}")]
    s2 = [r["doc_id"] for r in db.produce("/documents.sample(0.25){doc_id}")]
    assert sorted(s1) == sorted(s2) and 0 < len(s1)
    total = db.produce("/{n := count(documents)}")[0]["n"]
    assert len(s1) < total
    # sample(1.0) keeps everything, sample(0.0) nothing
    assert len(db.produce("/documents.sample(1.0){doc_id}")) == total
    assert len(db.produce("/documents.sample(0.0){doc_id}")) == 0
    parts = {
        name: {r["doc_id"] for r in db.produce(f"/documents.split('{name}'){{doc_id}}")}
        for name in ("train", "valid", "test")
    }
    assert sum(len(v) for v in parts.values()) == total
    assert not (parts["train"] & parts["valid"]) and not (
        parts["valid"] & parts["test"]
    ) and not (parts["train"] & parts["test"])
    appended = {
        r["doc_id"]: r["split"]
        for r in db.produce("/documents.split(){doc_id, split}")
    }
    for name, ids in parts.items():
        assert all(appended[i] == name for i in ids)


def test_flow_method_sessionize_matches_operator(db):
    """sessionize(gap) through the parser carries the SAME per-event
    session index the batch sessionize aggregation compresses: group
    the appended attribute in the language and the (user, session)
    row set equals analytics.sessionize."""
    from htsql_spark.operators.analytics import sessionize

    got = {
        (r["user_id"], r["session_id"], r["n"])
        for r in db.produce(
            "/events.sessionize()^{user_id := user_id, session_id :="
            " session_id}{user_id, session_id, n := count(^)}"
        )
    }
    exp = {
        (r.user_id, r.session_id, r.n_events)
        for r in sessionize(db.table("events")).collect()
    }
    assert got == exp


def test_flow_method_dedup_ngram_simhash_planted_clones(spark, tmp_path):
    """dedup_ngram(key)/dedup_simhash(key) through the parser:
    planted near-clones collapse to the min-key survivor; unrelated
    docs survive both tiers."""
    import pandas as pd

    from htsql_spark import HTSQL
    from htsql_spark.catalog import Catalog

    base = " ".join(f"tok{i} common word here" for i in range(15))
    other = " ".join(f"zz{i} completely different vocabulary" for i in range(15))
    rows = [
        (0, base, "en"),
        # repeats an existing token: char-3-gram Jaccard ≈ 0.99 AND
        # the distinct token set is unchanged (simhash hamming 0)
        (1, base + " common", "en"),
        (2, other, "en"),
        (3, other + " vocabulary", "en"),  # near-clone of 2, same rule
        (4, "short unrelated text snippet", "en"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(
        str(tmp_path / "docs.parquet")
    )
    db2 = HTSQL(spark, str(tmp_path), catalog=Catalog.from_files(str(tmp_path)))
    got_ng = sorted(
        r["doc_id"] for r in db2.produce("/docs.dedup_ngram(doc_id){doc_id}")
    )
    assert got_ng == [0, 2, 4]
    got_sh = sorted(
        r["doc_id"] for r in db2.produce("/docs.dedup_simhash(doc_id){doc_id}")
    )
    assert got_sh == [0, 2, 4]


def test_flow_method_budget_matches_operator(db):
    """budget(n) through the parser equals
    pipeline.select_token_budget: same selected set, same quality and
    token values, and the selected token mass respects the budget."""
    from htsql_spark.operators.pipeline import select_token_budget

    got = {
        (r["doc_id"], r["budget_q"], r["budget_toks"])
        for r in db.produce(
            "/documents.budget(50000){doc_id, budget_q, budget_toks}"
        )
    }
    exp = {
        tuple(r)
        for r in select_token_budget(
            db.table("documents"), budget_tokens=50_000
        ).collect()
    }
    assert got == exp
    assert sum(t for _, _, t in got) <= 50_000


def test_flow_method_chunk_matches_operator(db):
    """chunk() through the parser equals pipeline.chunk_documents —
    same windows, same md5s, same counts."""
    from htsql_spark.operators.pipeline import chunk_documents

    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk_start"],
         r["chunk_n_tokens"], r["chunk_md5"])
        for r in db.produce(
            "/documents.chunk(){doc_id, chunk_idx, chunk_start,"
            " chunk_n_tokens, chunk_md5}?doc_id<50"
        )
    }
    exp = {
        tuple(r)
        for r in chunk_documents(
            db.table("documents").filter("doc_id < 50")
        ).collect()
    }
    assert got == exp


def test_flow_method_repetition_matches_operator(db):
    """repetition() through the parser equals
    textstats.repetition_stats."""
    from htsql_spark.operators.textstats import repetition_stats

    got = {
        (r["doc_id"], r["rep_n_words"], r["rep_dup_word_frac"],
         r["rep_top_word_frac"], r["rep_top_bigram_frac"])
        for r in db.produce(
            "/documents.repetition(){doc_id, rep_n_words,"
            " rep_dup_word_frac, rep_top_word_frac, rep_top_bigram_frac}"
            "?doc_id<50"
        )
    }
    exp = {
        tuple(r)
        for r in repetition_stats(
            db.table("documents").filter("doc_id < 50")
        ).collect()
    }
    assert got == exp


def test_flow_method_unigram_scores_own_distribution(db):
    """unigram() scores against the FLOW's distribution: on the full
    corpus it equals pipeline.unigram_logprob, and composing it after
    a sieve re-fits the model to the sieved corpus (the semantically
    meaningful behavior for curation subsets)."""
    from htsql_spark.operators.pipeline import unigram_logprob

    got = {
        (r["doc_id"], r["lm_n_words"], r["lm_avg_logp"], r["lm_ppl"])
        for r in db.produce(
            "/documents.unigram(){doc_id, lm_n_words, lm_avg_logp, lm_ppl}"
        )
    }
    exp = {tuple(r) for r in unigram_logprob(db.table("documents")).collect()}
    assert got == exp
    sub = {
        (r["doc_id"], r["lm_avg_logp"])
        for r in db.produce(
            "/(documents?lang='en').unigram(){doc_id, lm_avg_logp}"
        )
    }
    exp_sub = {
        (r.doc_id, r.avg_logp)
        for r in unigram_logprob(
            db.table("documents").filter("lang = 'en'")
        ).collect()
    }
    assert sub == exp_sub


def test_flow_method_dsir_matches_operator(db):
    """dsir(target) through the parser equals pipeline.dsir_weights
    with the same boolean target column."""
    from pyspark.sql import functions as F

    from htsql_spark.operators.pipeline import dsir_weights

    got = {
        (r["doc_id"], r["dsir_n_grams"], r["dsir_logw"])
        for r in db.produce(
            "/documents.dsir(lang='en'){doc_id, dsir_n_grams, dsir_logw}"
        )
    }
    exp = {
        tuple(r)
        for r in dsir_weights(
            db.table("documents"), target=F.col("lang") == "en"
        ).collect()
    }
    assert got == exp


def test_flow_method_winnow_matches_operator(db):
    """winnow() through the parser equals the portable-md5
    winnow_fingerprints kernel (the op_winnow_portable shape)."""
    from htsql_spark.operators.textstats import winnow_fingerprints

    got = {
        (r["doc_id"], r["fp"])
        for r in db.produce("/documents.winnow(){doc_id, fp}?doc_id<50")
    }
    exp = {
        (r.doc_id, r.fp)
        for r in winnow_fingerprints(
            db.table("documents").filter("doc_id < 50"), gram_hash="md5"
        ).collect()
    }
    assert got == exp


def test_flow_method_funnel_matches_operator(db):
    """funnel(steps...) through the parser — the bridge's first
    RESHAPING method — equals analytics.funnel on the same
    (pre-sieved) event subset; a '?' filter before the reshape
    restricts the funnel's input."""
    from htsql_spark.operators.analytics import funnel

    got = {
        (r["step"], r["event_type"], r["users"])
        for r in db.produce(
            "/(events?value>=0.2).funnel('view','click','purchase')"
        )
    }
    exp = {
        tuple(r)
        for r in funnel(
            db.table("events").filter("value >= 0.2"),
            ["view", "click", "purchase"],
        ).collect()
    }
    assert got == exp
    # strict-sequence monotonicity: each step's user count can only fall
    counts = [u for _, _, u in sorted(got)]
    assert counts == sorted(counts, reverse=True)


def test_flow_method_retention_matches_operator(db):
    """retention() through the parser equals analytics.retention, and
    the reshaped flow is a real projection scope: a post-reshape sieve
    on the derived week_offset attribute filters the matrix."""
    from htsql_spark.operators.analytics import retention

    got = {
        (r["cohort_week"], r["week_offset"], r["users"])
        for r in db.produce(
            "/events.retention(){cohort_week, week_offset, users}"
        )
    }
    exp = {tuple(r) for r in retention(db.table("events")).collect()}
    assert got == exp
    sieved = {
        (r["cohort_week"], r["week_offset"], r["users"])
        for r in db.produce(
            "/events.retention(){cohort_week, week_offset, users}"
            "?week_offset>0"
        )
    }
    assert sieved == {t for t in exp if t[1] > 0} and sieved < got


def test_flow_method_transitions_matches_operator(db):
    """transitions() through the parser equals analytics.transitions;
    sort + limit compose after the reshape under a total order."""
    from htsql_spark.operators.analytics import transitions

    got = {
        (r["event_type"], r["next_type"], r["n"])
        for r in db.produce("/events.transitions()")
    }
    exp = {tuple(r) for r in transitions(db.table("events")).collect()}
    assert got == exp
    top = [
        (r["event_type"], r["next_type"], r["n"])
        for r in db.produce(
            "/events.transitions().sort(n-, event_type, next_type).limit(5)"
        )
    ]
    assert top == sorted(exp, key=lambda t: (-t[2], t[0], t[1]))[:5]


def test_flow_method_zscore_matches_operator(db):
    """zscore(value, group) through the parser equals
    olap.group_zscore; value and group are full expressions, so a
    computed value standardizes too."""
    from htsql_spark.operators.olap import group_zscore

    got = {
        (r["event_id"], r["z"])
        for r in db.produce("/events.zscore(value, event_type){event_id, z}")
    }
    exp = {
        (r.event_id, r.z)
        for r in group_zscore(
            db.table("events"), value_col="value",
            group_cols=["event_type"], id_cols=["event_id"],
        ).collect()
    }
    assert got == exp
    # expression value: z of value*2 has the same z (affine invariance)
    scaled = {
        (r["event_id"], r["z"])
        for r in db.produce(
            "/events.zscore(value * 2, event_type){event_id, z}"
        )
    }
    assert scaled == got


def test_flow_method_dup_spans_matches_operator(db):
    """dup_spans() through the parser equals textstats.
    duplicated_spans under the spans_* names."""
    from htsql_spark.operators.textstats import duplicated_spans

    got = {
        (r["doc_id"], r["spans_n_windows"], r["spans_dup_windows"],
         r["spans_n_spans"], r["spans_dup_chars"], r["spans_dup_frac"])
        for r in db.produce(
            "/documents.dup_spans(){doc_id, spans_n_windows,"
            " spans_dup_windows, spans_n_spans, spans_dup_chars,"
            " spans_dup_frac}"
        )
    }
    exp = {tuple(r) for r in duplicated_spans(db.table("documents")).collect()}
    assert got == exp


def test_flow_method_pack_matches_operator(db):
    """pack(budget) through the parser equals pipeline.pack_sequences:
    same spans, and per-sequence takes within a shard sum to the
    budget for every non-final sequence."""
    from htsql_spark.operators.pipeline import pack_sequences

    got = {
        (r["doc_id"], r["pack_shard"], r["pack_seq_id"],
         r["pack_offset"], r["pack_take"])
        for r in db.produce(
            "/documents.pack(64){doc_id, pack_shard, pack_seq_id,"
            " pack_offset, pack_take}"
        )
    }
    exp = {tuple(r) for r in pack_sequences(db.table("documents")).collect()}
    assert got == exp
    # every sequence except each shard's last carries exactly 64 tokens
    from collections import defaultdict

    per_seq = defaultdict(int)
    for _, shard, seq, _, take in got:
        per_seq[(shard, seq)] += take
    last = {s: max(q for (sh, q) in per_seq if sh == s)
            for s in {sh for sh, _ in per_seq}}
    for (shard, seq), total in per_seq.items():
        if seq < last[shard]:
            assert total == 64, (shard, seq, total)


def test_flow_method_profile_matches_operator(db):
    """profile(value, partition, order, tiebreak) through the parser
    equals analytics.window_profile under the prof_* names."""
    from htsql_spark.operators.analytics import window_profile

    got = {
        (r["ck"], r["okey"], r["prof_rnk"], r["prof_tile"],
         r["prof_prev_val"], r["prof_running_sum"])
        for r in db.produce(
            "/orders.profile(o_totalprice, o_custkey, o_orderdate,"
            " o_orderkey){ck := o_custkey, okey := o_orderkey,"
            " prof_rnk, prof_tile, prof_prev_val, prof_running_sum}"
        )
    }
    exp = {
        (r.o_custkey, r.o_orderkey, r.rnk, r.tile, r.prev_val, r.running_sum)
        for r in window_profile(
            db.table("orders"),
            partition_col="o_custkey", order_col="o_orderdate",
            tiebreak_col="o_orderkey", value_col="o_totalprice",
        ).collect()
    }
    assert got == exp


def test_flow_method_heavy_hitters_matches_operator(db):
    """heavy_hitters(expr, f) through the parser equals
    sketches.heavy_hitters, and as a projection scope the result
    filters/sorts on derived attributes."""
    from htsql_spark.operators.sketches import heavy_hitters

    got = {
        (r["item"], r["cnt"], r["freq"])
        for r in db.produce("/documents.heavy_hitters(lang, 0.05)")
    }
    exp = {
        tuple(r)
        for r in heavy_hitters(
            db.table("documents").selectExpr("lang AS item"), "item",
            min_freq=0.05,
        ).collect()
    }
    assert got == exp
    top = [
        r["item"]
        for r in db.produce(
            "/documents.heavy_hitters(lang, 0.05).sort(cnt-, item).limit(2)"
            "{item}"
        )
    ]
    assert top == [t[0] for t in sorted(exp, key=lambda t: (-t[1], t[0]))[:2]]


def test_flow_method_decontaminate(db, spark):
    """decontaminate(benchmark) drops exactly the rows whose
    normalized-content fingerprint appears in the benchmark flow —
    including planted cross-id content twins."""
    ids = {
        r["doc_id"]
        for r in db.produce(
            "/documents.decontaminate(documents?doc_id>=400){doc_id}"
        )
    }
    # fixture texts are unique, so the survivor set is exactly <400
    assert ids == set(range(400))
    # the benchmark is a full sub-query: a sieve on ANY column works
    sub = {
        r["doc_id"]
        for r in db.produce(
            "/documents.decontaminate(documents?lang='en'){doc_id}"
        )
    }
    en = {r["doc_id"] for r in db.produce("/documents{doc_id}?lang='en'")}
    assert sub == set(range(500)) - en
    # self-decontamination empties the corpus
    assert db.produce("/documents.decontaminate(documents){doc_id}") == []


def test_flow_method_cluster_matches_operator(db):
    """cluster() through the parser equals dedup_clusters over the
    capped n-gram pair graph, with singletons keeping their own key;
    the cluster minimum is always a member key and every cluster
    minimum survives dedup_ngram() (the pairwise rule can keep MORE —
    a member with no direct edge to a smaller key survives even
    inside a cluster — so minima is a subset, not an equality)."""
    from pyspark.sql import functions as F

    from htsql_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs

    got = {
        (r["doc_id"], r["cluster_id"])
        for r in db.produce("/documents.cluster(){doc_id, cluster_id}")
    }
    pairs = ngram_jaccard_pairs(
        db.table("documents"), n=3, threshold=0.5, max_bucket=200
    )
    comp = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    all_ids = {r.doc_id for r in db.table("documents").select("doc_id").collect()}
    exp = {(i, comp.get(i, i)) for i in all_ids}
    assert got == exp
    # consistency with the dedup tier: survivors == cluster minima
    survivors = {
        r["doc_id"] for r in db.produce("/documents.dedup_ngram(){doc_id}")
    }
    minima = {cid for _, cid in got}
    assert minima <= survivors
    # and every minimum is a real member key
    assert minima <= all_ids


def test_reshape_then_append_extra_resolves(db):
    """Appenders are legal ON reshaped flows: zscore()/profile() after
    transitions() register extra attributes that resolve inside the
    projection scope (selection, sieve, sort) — the extra lookup runs
    before the 'unknown attribute in projection scope' error."""
    rows = db.produce(
        "/events.transitions().zscore(n, event_type)"
        "{event_type, next_type, z}?z>1"
    )
    assert rows and all(r["z"] > 1 for r in rows)
    ordered = [
        r["z"]
        for r in db.produce(
            "/events.transitions().zscore(n, event_type).sort(z-).limit(3){z}"
        )
    ]
    assert ordered == sorted(ordered, reverse=True)


def test_window_profile_duplicate_roles(db):
    """window_profile ranks BY the value (order_col == value_col) and
    group_zscore tolerates the value repeated in id_cols — the
    narrowing select dedupes roles instead of crashing with
    AMBIGUOUS_REFERENCE."""
    from htsql_spark.operators.analytics import window_profile
    from htsql_spark.operators.olap import group_zscore

    wp = window_profile(
        db.table("orders"), partition_col="o_custkey",
        order_col="o_totalprice", tiebreak_col="o_orderkey",
        value_col="o_totalprice",
    )
    assert wp.count() == db.table("orders").count()
    # rank ordered by the value itself: rnk follows totalprice order
    one = wp.filter("o_custkey = 5").orderBy("rnk").collect()
    vals = [r.o_totalprice for r in one]
    assert vals == sorted(vals)
    gz = group_zscore(
        db.table("events"), value_col="value",
        group_cols=["event_type"], id_cols=["event_id", "value"],
    )
    assert gz.columns == ["event_id", "value", "event_type", "z"]
    assert gz.count() == db.table("events").count()


def test_cluster_rejects_non_integral_key(db):
    """cluster() on a string key is a loud bind error — dedup_clusters
    casts endpoints to long and silently drops null casts, which would
    otherwise report all-singletons."""
    import pytest as _pytest

    from htsql_spark.ir import CompileError

    with _pytest.raises(CompileError, match="integral key"):
        db.df("/documents.cluster(lang){doc_id, cluster_id}")


def test_flow_method_mix_matches_operator(db):
    """mix(label, name, frac, ...) through the parser equals
    pipeline.mix_corpora: same selected set, and the realized mixture
    tracks the target weights (binding source keeps all rows)."""
    from pyspark.sql import functions as F

    from htsql_spark.operators.pipeline import mix_corpora

    docs = db.table("documents")
    sources = {s: docs.filter(F.col("lang") == s) for s in ("en", "de")}
    exp = {
        r.doc_id
        for r in mix_corpora(sources, {"en": 0.7, "de": 0.3}, "doc_id").collect()
    }
    got = {
        r["doc_id"]
        for r in db.produce("/documents.mix(lang, 'en', 0.7, 'de', 0.3){doc_id}")
    }
    assert got == exp and got
    by = {
        r["l"]: r["n"]
        for r in db.produce(
            "/documents.mix(lang, 'en', 0.7, 'de', 0.3)"
            "^{l := lang}{l, n := count(^)}"
        )
    }
    total = sum(by.values())
    assert abs(by["en"] / total - 0.7) < 0.05
    # unnamed partitions are excluded entirely
    assert set(by) == {"en", "de"}


def test_flow_method_tumbling_matches_kernel(db):
    """tumbling(interval) through the parser equals the
    stream_tumbling kernel run in batch (all windows — no watermark
    filter over a static table), and composes: the reshape output
    sieves and sorts on its derived attributes."""
    from htsql_spark.streaming.events import tumbling_counts

    got = {
        (str(r["w_start"]), str(r["w_end"]), r["event_type"], r["n"])
        for r in db.produce("/events.tumbling('1 day')")
    }
    exp = {
        (str(r["w_start"]), str(r["w_end"]), r["event_type"], r["n"])
        for r in tumbling_counts(db.table("events")).collect()
    }
    assert got == exp
    filtered = db.produce("/(events.tumbling('1 day')?n>5){event_type, n}")
    assert filtered and all(r["n"] > 5 for r in filtered)
    # non-day intervals work (epoch-aligned 6-hour windows)
    assert len(db.produce("/events.tumbling('6 hours')")) >= len(got)


def test_flow_method_sessions_matches_kernel(db):
    """sessions(gap) equals session_counts in batch; default gap is
    30 minutes."""
    from htsql_spark.streaming.events import session_counts

    got = {
        (r["user_id"], str(r["s_start"]), str(r["s_end"]), r["n"])
        for r in db.produce("/events.sessions('30 minutes')")
    }
    exp = {
        (r["user_id"], str(r["s_start"]), str(r["s_end"]), r["n"])
        for r in session_counts(db.table("events")).collect()
    }
    assert got == exp
    assert {
        (r["user_id"], str(r["s_start"]), str(r["s_end"]), r["n"])
        for r in db.produce("/events.sessions()")
    } == exp


def test_flow_method_anomalies_matches_stateful_stream(db, spark):
    """anomalies(z) — the declarative batch twin — is value-identical
    to one availableNow drain of the STATEFUL streaming kernel (same
    order, same null rule, same rounding)."""
    import uuid

    from htsql_spark import streaming
    from htsql_spark.streaming.events import streaming_anomalies

    got = {
        (r["event_id"], r["event_type"], r["n_prior"], round(r["z"], 4))
        for r in db.produce("/events.anomalies(3.0)")
    }
    name = f"t_langanom_{uuid.uuid4().hex[:8]}"
    stream = streaming.read_events_stream(spark, db.data_dir)
    streaming.run_to_memory(streaming_anomalies(stream), name, "append")
    exp = {
        (r["event_id"], r["event_type"], r["n_prior"], round(r["z"], 4))
        for r in spark.table(name).collect()
    }
    assert got == exp
    # threshold/min_n arguments restrict further
    sub = {
        r["event_id"] for r in db.produce("/events.anomalies(4.0, 20){event_id}")
    }
    assert sub <= {g[0] for g in got}


def test_flow_method_distinct_count(db):
    """distinct_count(expr, group...) estimates per-group distincts
    within the HLL lgK=14 error bound; the global (no-group) form
    yields one row."""
    from pyspark.sql import functions as F

    rows = db.produce("/events.distinct_count(user_id, event_type)")
    exact = {
        r["event_type"]: r["x"]
        for r in db.table("events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        assert abs(r["approx_distinct"] - exact[r["event_type"]]) <= max(
            2, 0.05 * exact[r["event_type"]]
        )
    g = db.produce("/events.distinct_count(user_id)")
    total = db.table("events").select("user_id").distinct().count()
    assert len(g) == 1 and abs(g[0]["approx_distinct"] - total) <= max(2, 0.05 * total)


def test_flow_method_quantiles_certificate(db):
    """quantiles(expr, q...) carries n (exact), err, and per-quantile
    estimates whose true rank is within err of ceil(q*n)."""
    rows = db.produce("/lineitem.quantiles(l_quantity, 0.5, 0.9)")
    assert len(rows) == 1
    r = rows[0]
    vals = sorted(
        x["l_quantity"] for x in db.table("lineitem").select("l_quantity").collect()
    )
    n = len(vals)
    assert r["n"] == n
    import math

    for q, key in ((0.5, "p50"), (0.9, "p90")):
        target = math.ceil(q * n - 1e-9)
        lt = sum(1 for v in vals if v < r[key])
        le = sum(1 for v in vals if v <= r[key])
        assert lt + 1 - r["err"] <= target <= le + r["err"]


def test_flow_method_freq_certificate(db):
    """freq(expr, group...) carries est_n (never an underestimate),
    exact n and the additive bound err=ceil(eps*n); composition with
    a prior sieve and the global (no-group) form both hold."""
    from pyspark.sql import functions as F

    rows = db.produce("/events.freq(event_type)")
    ev = db.table("events")
    exact = {
        r["event_type"]: r["x"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("x")).collect()
    }
    n = ev.count()
    assert {r["item"] for r in rows} == set(exact)
    for r in rows:
        assert r["n"] == n
        assert exact[r["item"]] <= r["est_n"] <= exact[r["item"]] + r["err"]
    # grouped: one row per observed (user_id, event_type) combo
    g = db.produce("/(events?value>0).freq(event_type, user_id)")
    flt = ev.filter(F.col("value") > 0)
    combos = flt.select("user_id", "event_type").distinct().count()
    assert len(g) == combos
    gex = {
        (str(r["user_id"]), r["event_type"]): r["x"]
        for r in flt.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    }
    for r in g:
        key = (str(r["user_id"]), r["item"])
        assert gex[key] <= r["est_n"] <= gex[key] + r["err"]


def test_streaming_flow_method_errors(db):
    """Compile-time validation: bad intervals, wrong table shape,
    non-identifier groups, and duplicate quantiles are named
    CompileErrors."""
    import pytest as _pytest

    from htsql_spark import CompileError

    for q, pat in [
        ("/events.tumbling('1 fortnight')", "interval"),
        ("/events.tumbling()", "interval"),
        ("/documents.tumbling('1 day')", "requires a flow"),
        ("/events.sessions('0 minutes')", "interval"),
        ("/lineitem.quantiles(l_quantity)", "quantile"),
        ("/lineitem.quantiles(l_quantity, 0.5, 0.5)", "duplicate"),
        ("/lineitem.quantiles(l_quantity, 1.5)", "0, 1"),
        ("/events.distinct_count(user_id, user_id+1)", "attribute names"),
        ("/events.distinct_count()", "value expression"),
        ("/events.anomalies(3.0, 1)", "min_n"),
    ]:
        with _pytest.raises(CompileError, match=pat):
            db.df(q)


ALIAS_SHADOW_CASES = [
    # (query, key attribute, aliased appended-name) — the alias must
    # win over the method's appended column for EVERY appender
    ("/documents{doc_id, gopher_n_words := doc_id + 100}.gopher()?doc_id<3", "doc_id", "gopher_n_words"),
    ("/documents{doc_id, entropy := doc_id + 100}.entropy()?doc_id<3", "doc_id", "entropy"),
    ("/documents{doc_id, cls_score := doc_id + 100}.classify()?doc_id<3", "doc_id", "cls_score"),
    ("/documents{doc_id, tfidf_score := doc_id + 100}.tfidf(3)?doc_id<3", "doc_id", "tfidf_score"),
    ("/embeddings{vec_id, near_cos4 := vec_id + 100}.near(0, 10)", "vec_id", "near_cos4"),
    ("/documents{doc_id, stats_tokens := doc_id + 100}.stats()?doc_id<3", "doc_id", "stats_tokens"),
    ("/documents{doc_id, pii_clean := doc_id + 100}.pii()?doc_id<3", "doc_id", "pii_clean"),
    ("/events{event_id, session_id := event_id + 100}.sessionize(20)?event_id<3", "event_id", "session_id"),
    ("/documents{doc_id, chunk_idx := doc_id + 100}.chunk()?doc_id<3", "doc_id", "chunk_idx"),
    ("/documents{doc_id, rep_n_words := doc_id + 100}.repetition()?doc_id<3", "doc_id", "rep_n_words"),
    ("/documents{doc_id, lm_ppl := doc_id + 100}.unigram()?doc_id<3", "doc_id", "lm_ppl"),
    ("/documents{doc_id, dsir_logw := doc_id + 100}.dsir(lang='en')?doc_id<3", "doc_id", "dsir_logw"),
    ("/documents{doc_id, budget_q := doc_id + 100}.budget(100000)?doc_id<3", "doc_id", "budget_q"),
    ("/events{event_id, z := event_id + 100}.zscore(value, event_type)?event_id<3", "event_id", "z"),
    ("/documents{doc_id, spans_n_windows := doc_id + 100}.dup_spans()?doc_id<3", "doc_id", "spans_n_windows"),
    ("/documents{doc_id, pack_shard := doc_id + 100}.pack(64)?doc_id<3", "doc_id", "pack_shard"),
    ("/orders{o_orderkey, prof_rnk := o_orderkey + 100}.profile(o_totalprice,"
     " o_custkey, o_orderdate, o_orderkey)?o_orderkey<3", "o_orderkey", "prof_rnk"),
    ("/documents{doc_id, fp := doc_id + 100}.winnow()?doc_id<3", "doc_id", "fp"),
    ("/documents{doc_id, split := doc_id + 100}.split()?doc_id<3", "doc_id", "split"),
    ("/documents{doc_id, cluster_id := doc_id + 100}.cluster()?doc_id<3", "doc_id", "cluster_id"),
]


@pytest.mark.parametrize("query,key,attr", ALIAS_SHADOW_CASES)
def test_alias_wins_over_every_appended_attribute(db, query, key, attr):
    """The r8 advisor's name-shadowing rule, locked for ALL appending
    flow methods (r9 judge directive #8): a user alias defined in a
    selection is NEVER silently shadowed by a later flow method's
    appended attribute of the same name — selection-output names
    resolve before Flow.extra, for every appender in FLOW_METHODS."""
    rows = db.produce(query)
    assert rows, query
    for r in rows:
        assert r[attr] == r[key] + 100, (query, dict(r))


def test_flow_method_sliding_matches_kernel(db):
    """sliding(window, slide) equals sliding_event_avg in batch (all
    windows, no watermark filter), and the reshape composes."""
    from htsql_spark.streaming.events import sliding_event_avg

    got = {
        (str(r["w_start"]), round(r["avg_value"], 6), r["n"])
        for r in db.produce("/events.sliding('2 days', '1 day')")
    }
    exp = {
        (str(r["w_start"]), round(r["avg_value"], 6), r["n"])
        for r in sliding_event_avg(db.table("events")).collect()
    }
    assert got == exp
    top = db.produce("/events.sliding('2 days', '1 day').sort(n-).limit(1){n}")
    assert top[0]["n"] == max(t[2] for t in exp)


def test_flow_method_asof_matches_kernel(db, spark):
    """asof(other, on, ts, payload) through the parser equals the
    asof_join kernel demo (purchases_asof_clicks), composes after a
    sieve, and supports 'forward'."""
    from htsql_spark.operators.joins import purchases_asof_clicks

    got = {
        (r["event_id"], r["asof_event_id"], str(r["asof_ts"]))
        for r in db.produce(
            "/(events?event_type='purchase')"
            ".asof(events?event_type='click', user_id, ts, event_id)"
            "{event_id, asof_ts, asof_event_id}"
        )
    }
    # the kernel demo prededuplicates (user, ts) ties; the fixture's
    # click/purchase slices have none, so values agree exactly
    exp = {
        (r["event_id"], r["click_id"], str(r["click_ts"]))
        for r in purchases_asof_clicks(db.table("events")).collect()
    }
    assert got == exp
    fwd = db.produce(
        "/(events?event_type='purchase')"
        ".asof(events?event_type='click', user_id, ts, event_id, 'forward')"
        "{event_id, user_id, ts, asof_ts}?!is_null(asof_ts)"
    )
    assert fwd and all(r["asof_ts"] >= r["ts"] for r in fwd)


def test_flow_method_asof_errors(db):
    import pytest as _pytest

    from htsql_spark import CompileError

    for q, pat in [
        ("/events.asof(events, user_id, ts)", "takes a flow"),
        ("/events.asof(5, user_id, ts, event_id)", "flow argument"),
        ("/events.asof(events, user_id+1, ts, event_id)", "attribute name"),
        ("/events.asof(events, user_id, ts, event_id, 'sideways')",
         "backward"),
    ]:
        with _pytest.raises(CompileError, match=pat):
            db.df(q)


def test_sketch_reshapes_on_empty_flows(db):
    """Graceful empties (locked semantics): quantiles() over an empty
    flow reshapes to ZERO rows (no state to query); global
    distinct_count() yields one row with 0; grouped distinct_count()
    yields zero rows (no groups)."""
    assert db.df("/(lineitem?l_quantity<0).quantiles(l_quantity, 0.5)").count() == 0
    g = db.produce("/(events?event_id<0).distinct_count(user_id)")
    assert len(g) == 1 and g[0]["approx_distinct"] == 0
    assert db.df("/(events?event_id<0).distinct_count(user_id, event_type)").count() == 0


def test_flow_method_asof_payload_ts_collision_is_error(db):
    import pytest as _pytest

    from htsql_spark import CompileError

    with _pytest.raises(CompileError, match="asof_ts"):
        db.df("/events.asof(events, user_id, ts, ts)")


def test_flow_method_quantiles_grouped_and_asof_tolerance(db):
    """Grouped quantiles: one row per group, exact n per group,
    estimates within the carried rank band; asof tolerance discards
    matches further than the interval."""
    rows = {r["l_returnflag"]: r for r in db.produce(
        "/lineitem.quantiles(l_quantity, 0.5, l_returnflag)"
    )}
    exact = {}
    for x in db.produce("/lineitem{l_returnflag, l_quantity}"):
        exact.setdefault(x["l_returnflag"], []).append(x["l_quantity"])
    assert set(rows) == set(exact)
    import math

    for rf, r in rows.items():
        vals = sorted(exact[rf])
        assert r["n"] == len(vals)
        target = math.ceil(0.5 * r["n"] - 1e-9)
        lt = sum(1 for v in vals if v < r["p50"])
        le = sum(1 for v in vals if v <= r["p50"])
        assert lt + 1 - r["err"] <= target <= le + r["err"]
    # tolerance: every surviving backward match is within the interval
    tol = db.produce(
        "/(events?event_type='purchase')"
        ".asof(events?event_type='click', user_id, ts, event_id,"
        " 'backward', '1 hour')"
        "{ts, asof_ts}?!is_null(asof_ts)"
    )
    assert tol and all(
        0 <= (r["ts"] - r["asof_ts"]).total_seconds() <= 3600 for r in tol
    )
    # groups must follow the quantile literals, and be attribute names
    import pytest as _pytest

    from htsql_spark import CompileError

    with _pytest.raises(CompileError, match="group arguments"):
        db.df("/lineitem.quantiles(l_quantity, 0.5, l_returnflag+1)")
    with _pytest.raises(CompileError, match="quantile literal"):
        db.df("/lineitem.quantiles(l_quantity, l_returnflag)")


def test_flow_method_hist(db):
    """hist(expr, buckets) is the equi-depth histogram reshape:
    bucket counts sum to the non-null row count, edges are monotone
    and the kernel composes after a sieve."""
    rows = db.produce("/(orders?o_totalprice>0).hist(o_totalprice, 4)")
    assert {r["bucket"] for r in rows} == {0, 1, 2, 3}
    n_total = db.produce(
        "/{n := count(orders?o_totalprice>0)}"
    )[0]["n"]
    assert sum(r["n"] for r in rows) == n_total
    srt = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(srt, srt[1:]):
        assert a["lo"] <= a["hi"] <= b["lo"] <= b["hi"]
    # equi-depth: buckets within one row of each other is too strict
    # for interpolated ties, but within 10% of n/4 holds easily
    for r in rows:
        assert abs(r["n"] - n_total / 4) <= max(2, 0.1 * n_total / 4)


def test_freq_composite_encoding_is_injective(spark, tmp_path):
    """round-11 advice: a separator-joined composite let a value
    CONTAINING the separator alias a different (group, item)
    combination — ('a\\x1fb', 'c') and ('a', 'b\\x1fc') collapsed to
    one row with a merged estimate.  The length-prefixed encoding
    keeps them distinct, with the sentinel and separator as ordinary
    text."""
    from htsql_spark import HTSQL
    from htsql_spark.catalog import Catalog

    rows = (
        [("a\x1fb", "c")] * 3
        + [("a", "b\x1fc")] * 5
        + [("\x00", "z")] * 2
        + [(None, "z")] * 4
    )
    import pandas as pd

    pd.DataFrame(rows, columns=["g", "x"]).to_parquet(
        str(tmp_path / "t.parquet")
    )
    db2 = HTSQL(spark, str(tmp_path), catalog=Catalog.from_files(str(tmp_path)))
    got = {
        (r["g"], r["item"]): r["est_n"]
        for r in db2.produce("/t.freq(x, g)")
    }
    assert len(got) == 4
    for k, exact in {
        ("a\x1fb", "c"): 3,
        ("a", "b\x1fc"): 5,
        ("\x00", "z"): 2,
        (None, "z"): 4,
    }.items():
        assert exact <= got[k] <= exact + 1, (k, got[k])


def test_freq_group_column_keeps_its_type(db):
    """round-11 advice: freq() used to cast group attributes to text
    in the OUTPUT (only the probe key needs the string fold) — a
    numeric sieve on the group column then compared as text.  The
    group column now keeps the flow's type."""
    df = db.df("/events.freq(event_type, user_id)")
    ev_type = dict(db.table("events").dtypes)["user_id"]
    assert dict(df.dtypes)["user_id"] == ev_type
    # and a numeric sieve on it works numerically
    rows = db.produce("/events.freq(event_type, user_id)?user_id>=10")
    assert rows and all(r["user_id"] >= 10 for r in rows)
