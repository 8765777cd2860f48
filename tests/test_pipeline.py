"""Training-pipeline operators (operators/pipeline.py): planted-data
behavior plus the scale properties the module advertises — the
split/sample/chunk family must be shuffle-free narrow plans, and the
deterministic-hash contract must hold across repeated runs."""

import hashlib
import math

import pytest

from htsql_spark.operators import pipeline


@pytest.fixture(scope="module")
def docs(db):
    return db.table("documents")


# ---------------------------------------------------------------- split
def test_hash_split_partitions_totally(docs):
    out = pipeline.hash_split(docs, "doc_id")
    counts = dict(
        (r["split"], r["n"])
        for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()
    )
    total = docs.count()
    assert sum(counts.values()) == total  # disjoint + total
    assert counts["train"] / total == pytest.approx(0.9, abs=0.05)
    assert counts["valid"] / total == pytest.approx(0.05, abs=0.03)
    assert counts["test"] / total == pytest.approx(0.05, abs=0.03)


def test_hash_split_deterministic(docs):
    a = pipeline.hash_split(docs, "doc_id").select("doc_id", "split")
    b = pipeline.hash_split(docs, "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hash_split_salt_changes_assignment(docs):
    a = pipeline.hash_split(docs, "doc_id", salt="s1").select("doc_id", "split")
    b = pipeline.hash_split(docs, "doc_id", salt="s2").select("doc_id", "split")
    assert a.exceptAll(b).count() > 0


# -------------------------------------------------------------- samples
def test_stratified_sample_scalar_fraction(docs):
    kept = pipeline.stratified_sample(docs, "doc_id", 0.3).count()
    assert kept / docs.count() == pytest.approx(0.3, abs=0.08)


def test_stratified_sample_per_stratum(docs):
    out = pipeline.stratified_sample(
        docs, "doc_id", {"en": 1.0, "de": 0.0, "zh": 0.5}, strata="lang"
    )
    by_lang = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    n_en = docs.filter("lang = 'en'").count()
    n_zh = docs.filter("lang = 'zh'").count()
    assert by_lang.get("en") == n_en  # fraction 1.0 keeps everything
    assert "de" in {"de": by_lang.get("de")} and by_lang.get("de") is None  # dropped
    assert "es" not in by_lang and "fr" not in by_lang  # unlisted strata dropped
    assert by_lang.get("zh", 0) / n_zh == pytest.approx(0.5, abs=0.2)


def test_sample_n_per_group_exact_counts(docs):
    out = pipeline.sample_n_per_group(docs, "source", 3, key="doc_id")
    sizes = [r["count"] for r in out.groupBy("source").count().collect()]
    assert sizes and all(s == 3 for s in sizes)
    # sampled rows are a subset of the input
    assert out.join(docs, "doc_id", "left_anti").count() == 0


# ------------------------------------------------------------- chunking
def test_chunk_documents_planted(spark):
    words = [f"w{i}" for i in range(50)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = pipeline.chunk_documents(df, chunk_tokens=10, overlap=2).collect()
    # step 8 → starts 1,9,17,25,33,41,49
    assert [r["start_token"] for r in out] == [1, 9, 17, 25, 33, 41, 49]
    assert [r["chunk_idx"] for r in out] == list(range(7))
    assert [r["n_tokens"] for r in out] == [10, 10, 10, 10, 10, 10, 2]
    for r in out:
        s = r["start_token"] - 1
        expected = " ".join(words[s : s + 10])
        assert r["chunk_md5"] == hashlib.md5(expected.encode()).hexdigest()


def test_chunk_documents_empty_text(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = pipeline.chunk_documents(df).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 1  # [''] degenerate token


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pipeline.chunk_documents(df, chunk_tokens=4, overlap=4)


# --------------------------------------------------------------- tf·idf
def test_tfidf_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = pipeline.tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: (r["term"], r["tfidf"]) for r in out}
    # doc 1: apple tf=2 df=1 → 2·ln(3); banana tf=1 df=2 → ln(1.5)
    assert top[1][0] == "apple"
    assert top[1][1] == pytest.approx(round(2 * math.log(3), 6))
    # doc 3: cherry tf=3 df=2 → 3·ln(1.5)=1.216... beats date ln(3)=1.098
    assert top[3][0] == "cherry"
    assert top[3][1] == pytest.approx(round(3 * math.log(1.5), 6))


# ------------------------------------------------------------------ PII
def test_redact_pii_planted(spark):
    text = "mail me at jo.doe+x@exa-mple.org or call +1 (555) 123-4567 now"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = pipeline.redact_pii(df).collect()[0]
    assert row["n_emails"] == 1 and row["n_phones"] == 1
    clean = "mail me at [EMAIL] or call [PHONE] now"
    assert row["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()


def test_redact_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([(1, "no contact info here")], "doc_id long, text string")
    row = pipeline.redact_pii(df).collect()[0]
    assert row["n_emails"] == 0 and row["n_phones"] == 0
    assert row["clean_md5"] == hashlib.md5(b"no contact info here").hexdigest()


# ------------------------------------------------------------ plan shape
def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_split_and_sample_are_shuffle_free(docs):
    for df in (
        pipeline.hash_split(docs, "doc_id"),
        pipeline.stratified_sample(docs, "doc_id", 0.25),
        pipeline.chunk_documents(docs),
        pipeline.redact_pii(docs),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan, plan  # narrow: no shuffle at any scale
        assert "Python" not in plan and "InPandas" not in plan  # codegen only


def test_chunk_prunes_scan_columns(docs):
    plan = _plan(pipeline.chunk_documents(docs))
    assert "ReadSchema" in plan
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "text" in read and "source" not in read  # column pruning reaches the scan


# ------------------------------------------------------------- curation
def test_curate_corpus_planted(spark):
    good = ("the cat and the dog went to the market and it was good " * 8).strip()
    df = spark.createDataFrame(
        [(1, good), (2, good), (3, "zz")],  # 2 clones, 1 junk
        "doc_id long, text string",
    )
    out = pipeline.curate_corpus(df, min_quality=0.5).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1]  # clone 2 deduped (min doc_id wins), junk 3 quality-gated
    assert out[0]["split"] in ("train", "valid", "test")
    assert out[0]["quality"] >= 0.5


def test_curate_one_shuffle_total(db):
    plan = _plan(pipeline.curate_corpus(db.table("documents")))
    # quality gate + split are narrow; the fingerprint window is the
    # single Exchange in the whole pipeline
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ------------------------------------------------- embedding utilities
def test_centroids_planted(spark):
    from htsql_spark.operators import similarity

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], 0),
            (2, [3.0, 6.0], 0),
            (3, [10.0, 0.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {(r["label"], r["dim"]): r["centroid"] for r in similarity.centroids(df).collect()}
    assert out == {(0, 0): 2.0, (0, 1): 4.0, (1, 0): 10.0, (1, 1): 0.0}


def test_quantize_int8_planted(spark):
    import hashlib

    from htsql_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25])], "vec_id long, embedding array<float>"
    )
    row = similarity.quantize_int8(df).collect()[0]
    assert row["scale"] == 1.0
    assert row["quant_md5"] == hashlib.md5(b"127,-64,32").hexdigest()


def test_weighted_sample_edges_and_determinism(db, spark):
    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline

    docs = db.table("documents").select("doc_id")
    all_kept = pipeline.weighted_sample(docs.withColumn("r", F.lit(1.0)), "doc_id", "r")
    assert all_kept.count() == docs.count()
    none_kept = pipeline.weighted_sample(docs.withColumn("r", F.lit(0.0)), "doc_id", "r")
    assert none_kept.count() == 0
    half = docs.withColumn("r", F.lit(0.5))
    a = {r["doc_id"] for r in pipeline.weighted_sample(half, "doc_id", "r").collect()}
    b = {r["doc_id"] for r in pipeline.weighted_sample(half, "doc_id", "r").collect()}
    assert a == b and 0 < len(a) < docs.count()


def test_mix_corpora_proportions(db):
    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline

    docs = db.table("documents")
    sources = {l: docs.filter(F.col("lang") == l) for l in ("en", "de")}
    mixed = pipeline.mix_corpora(sources, {"en": 0.7, "de": 0.3}, "doc_id")
    by = {r["__source"]: r["count"] for r in mixed.groupBy("__source").count().collect()}
    total = sum(by.values())
    # the binding source keeps ~all rows; ratios near the target
    assert abs(by["en"] / total - 0.7) < 0.1
    assert abs(by["de"] / total - 0.3) < 0.1


def test_pack_sequences_invariants(db):
    """Every non-final sequence in a shard is exactly full, and each
    doc's spans partition its token count contiguously."""
    from collections import Counter

    from htsql_spark.operators import pipeline

    rows = pipeline.pack_sequences(db.table("documents"), budget=64).collect()
    fill = Counter()
    last_seq = {}
    for r in rows:
        fill[(r["shard"], r["seq_id"])] += r["take"]
        last_seq[r["shard"]] = max(last_seq.get(r["shard"], 0), r["seq_id"])
    for (sh, seq), t in fill.items():
        if seq != last_seq[sh]:
            assert t == 64, f"shard {sh} seq {seq} has {t} tokens"
        else:
            assert 0 < t <= 64
    # spans of one doc are contiguous from offset 0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["seq_id"], r["offset"], r["take"]))
    for doc, spans in by_doc.items():
        spans.sort()
        assert spans[0][1] == 0
        pos = 0
        for _, off, take in spans:
            assert off == pos and take > 0
            pos += take


def test_cross_split_contamination_detects_planted_clones(db):
    """Planted content clones that land in eval splits are reported
    against their train twins; a clean corpus reports nothing."""
    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline

    docs = db.table("documents")
    assert pipeline.cross_split_contamination(docs).count() == 0
    clones = docs.select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    hits = pipeline.cross_split_contamination(docs.unionByName(clones))
    rows = hits.collect()
    assert len(rows) > 0
    # every reported pair really is content-equal and really crosses
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    import re

    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower())

    for r in rows:
        e = r["eval_id"] % 500000
        t = r["train_id"] % 500000
        assert norm(texts[e]) == norm(texts[t])
        assert r["eval_split"] in ("valid", "test")


def test_write_dataset_card_and_partitions(db, spark, tmp_path):
    """Partitioned publish + dataset-card sidecar: partitions prune at
    read time, the card matches corpus_profile exactly."""
    import json
    import os

    from htsql_spark.operators import pipeline

    docs = db.table("documents").filter("doc_id < 300")
    out = str(tmp_path / "release")
    pipeline.write_dataset(docs, out, partition_by=("lang",))
    assert any(d.startswith("lang=") for d in os.listdir(out))
    card = json.loads(open(f"{out}/_dataset_card.json").read())
    expect = sorted(
        (r.asDict() for r in pipeline.corpus_profile(docs).collect()),
        key=lambda r: (r["lang"], r["source"]),
    )
    assert sorted(card, key=lambda r: (r["lang"], r["source"])) == expect
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition pruning visible in the plan
    plan = back.filter("lang = 'en'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_end_to_end_training_pipeline(db, spark, tmp_path):
    """The whole curation story in one run: raw text-file ingestion →
    quality/dedup/split curation → decontamination audit → sequence
    packing → partitioned publish with a dataset card.  Each stage's
    output feeds the next; invariants checked at every seam."""
    import json
    import os

    from htsql_spark import ingest
    from htsql_spark.operators import pipeline

    # 1. ingest a landing directory of text files (with a planted dup)
    land = tmp_path / "landing"
    land.mkdir()
    texts = {
        f"doc{i:02d}.txt": f"document number {i} " + " ".join(
            ["alpha beta gamma delta epsilon zeta eta theta"] * (2 + i % 3)
        )
        for i in range(12)
    }
    texts["dup_of_doc00.txt"] = texts["doc00.txt"]
    for name, body in texts.items():
        (land / name).write_text(body)
    docs = ingest.documents_from_text(spark, str(land / "*.txt"))
    assert docs.count() == 13

    # 2. curate: quality gate + exact dedup + split
    curated = pipeline.curate_corpus(docs, min_quality=0.2)
    kept = curated.collect()
    assert len(kept) == 12  # the planted dup died
    assert {r["split"] for r in kept} <= {"train", "valid", "test"}

    # 3. decontamination audit over the split that was just assigned
    audit = pipeline.cross_split_contamination(docs)
    # fingerprint-identical docs may or may not straddle splits; the
    # audit must at least be consistent: every hit is a real fp match
    for r in audit.collect():
        assert r["eval_id"] != r["train_id"]

    # 4. pack surviving docs into training sequences
    survivors = docs.join(curated.select("doc_id"), "doc_id")
    packed = pipeline.pack_sequences(survivors, budget=16, shards=2)
    spans = packed.collect()
    assert len(spans) > 0
    # every span fits its budget and every surviving doc is packed
    assert all(0 < r["take"] <= 16 for r in spans)
    assert {r["doc_id"] for r in spans} == {r["doc_id"] for r in kept}

    # 5. publish with card
    out = str(tmp_path / "release")
    pipeline.write_dataset(survivors, out, partition_by=("lang",))
    card = json.loads(open(f"{out}/_dataset_card.json").read())
    assert sum(c["docs"] for c in card) == 12
    assert spark.read.parquet(out).count() == 12


def test_unigram_logprob_reference(spark):
    """Exact agreement with a python Counter reference on a tiny
    corpus; rare words score lower than common ones."""
    import math
    from collections import Counter

    from htsql_spark.operators import pipeline

    docs = spark.createDataFrame(
        [(1, "the the the cat"), (2, "the dog"), (3, "xylophone")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pipeline.unigram_logprob(docs).collect()}
    words = "the the the cat the dog xylophone".split()
    tf = Counter(words)
    n = len(words)

    def avg_lp(ws):
        return round(sum(math.log(tf[w] / n) for w in ws) / len(ws), 6)

    assert rows[1]["avg_logp"] == avg_lp("the the the cat".split())
    assert rows[2]["avg_logp"] == avg_lp("the dog".split())
    assert rows[3]["avg_logp"] == avg_lp(["xylophone"])
    # the rare-word doc is the least probable → highest ppl
    assert rows[3]["ppl"] > rows[1]["ppl"] and rows[3]["ppl"] > rows[2]["ppl"]


def test_dsir_weights_separates_domains(spark):
    """Planted two-vocabulary corpus: docs written in the target
    domain's vocabulary must outscore raw-only-vocabulary docs, a
    Python reference replay must agree exactly, and weights must be
    invariant to doc order (determinism)."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline

    wiki = ["alpha beta gamma delta alpha beta", "beta gamma delta epsilon beta"]
    crawl = ["spam junk click buy spam junk", "junk click buy now spam"]
    mixed = "alpha beta spam junk"
    rows = (
        [(i, t, True) for i, t in enumerate(wiki)]
        + [(10 + i, t, False) for i, t in enumerate(crawl)]
        + [(99, mixed, False)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    B, a = 64, 0.5
    out = {
        r["doc_id"]: r
        for r in pipeline.dsir_weights(docs, F.col("tgt"), buckets=B).collect()
    }
    # target-vocabulary docs outrank raw-vocabulary docs; mixed in between
    assert min(out[0]["logw"], out[1]["logw"]) > out[99]["logw"]
    assert out[99]["logw"] > max(out[10]["logw"], out[11]["logw"])

    # exact Python reference (same md5 bucketing + smoothing)
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    def grams(t):
        w = t.split()
        return w + [f"{x} {y}" for x, y in zip(w, w[1:])]

    ct, cr = Counter(), Counter()
    for _, t, tgt in rows:
        for g in grams(t):
            b = bucket(g)
            cr[b] += 1
            if tgt:
                ct[b] += 1
    T, R = sum(ct.values()), sum(cr.values())
    for i, t, _ in rows:
        gs = grams(t)
        ref = sum(
            math.log((ct[bucket(g)] + a) / (T + a * B))
            - math.log((cr[bucket(g)] + a) / (R + a * B))
            for g in gs
        )
        assert out[i]["logw"] == round(ref, 4)
        assert out[i]["n_grams"] == len(gs)


def test_bootstrap_ci_properties(docs, spark):
    """Poisson-bootstrap CI: brackets the plain mean, is
    partitioning-invariant, and the replica-0 mean matches a pure
    Python replay of the md5 Poisson draw."""
    import hashlib

    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline
    from htsql_spark.operators.pipeline import _POISSON1_CDF

    r = pipeline.bootstrap_ci(docs, "n_chars").collect()[0]
    true_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert r["ci_lo"] <= true_mean <= r["ci_hi"]
    assert r["ci_lo"] < r["mean"] < r["ci_hi"]
    assert r["n_replicas"] == 64
    r2 = pipeline.bootstrap_ci(docs.repartition(13), "n_chars").collect()[0]
    assert tuple(r) == tuple(r2)

    rows = docs.select("doc_id", "n_chars").collect()

    def pois(doc_id, b):
        h = hashlib.md5(f"{doc_id}|boot|{b}".encode()).hexdigest()[:8]
        u = int(h, 16) / 16**8
        for k, t in enumerate(_POISSON1_CDF):
            if u < t:
                return k
        return 5

    # the replica-0 resample mean replayed in Python sits near the
    # true mean (the draw really is Poisson(1) reweighting, not noise)
    num = sum(pois(x["doc_id"], 0) * x["n_chars"] for x in rows)
    den = sum(pois(x["doc_id"], 0) for x in rows)
    assert den > 0 and abs(num / den - true_mean) / true_mean < 0.2


def test_float_scores_partitioning_invariant(docs, spark):
    """DSIR log-weights and bigram-LM scores are float SUMS whose
    addition order varies with partitioning; the rounded outputs must
    not (the driver hash-compares them against a serial oracle)."""
    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline

    base = {
        r["doc_id"]: r["logw"]
        for r in pipeline.dsir_weights(docs, F.col("lang") == "en").collect()
    }
    rep = {
        r["doc_id"]: r["logw"]
        for r in pipeline.dsir_weights(
            docs.repartition(13), F.col("lang") == "en"
        ).collect()
    }
    assert base == rep
    b1 = {r["doc_id"]: r["avg_logp"] for r in pipeline.bigram_logprob(docs).collect()}
    b2 = {
        r["doc_id"]: r["avg_logp"]
        for r in pipeline.bigram_logprob(docs.repartition(13)).collect()
    }
    assert b1 == b2


def test_es_weighted_sample_invariants(docs, spark):
    """A-ES sampling: scale-invariant in the weights, excludes
    zero/null weights, partitioning-invariant, exactly k rows, and
    matches a pure-Python replay of the md5 draw."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline

    base = docs.select("doc_id", F.col("n_chars").cast("double").alias("w"))
    s1 = {r["doc_id"] for r in pipeline.es_weighted_sample(base, "w", 50).collect()}
    assert len(s1) == 50
    # positive scaling of all weights preserves the sample
    s2 = {
        r["doc_id"]
        for r in pipeline.es_weighted_sample(
            base.withColumn("w", F.col("w") * 10), "w", 50
        ).collect()
    }
    assert s1 == s2
    # partitioning-invariant
    s3 = {
        r["doc_id"]
        for r in pipeline.es_weighted_sample(base.repartition(7), "w", 50).collect()
    }
    assert s1 == s3
    # python replay of the draw
    rows = base.collect()

    def key(doc_id, w):
        h = hashlib.md5(f"{doc_id}|wsample".encode()).hexdigest()[:8]
        return round(math.log((int(h, 16) + 1.0) / 16**8) / w, 6), doc_id

    exp = sorted(rows, key=lambda r: (-key(r["doc_id"], r["w"])[0], r["doc_id"]))
    assert s1 == {r["doc_id"] for r in exp[:50]}
    # zero/null weights are excluded
    z = base.withColumn("w", F.when(F.col("doc_id") < 10**9, 0.0))
    assert pipeline.es_weighted_sample(z, "w", 5).count() == 0


def test_bigram_logprob_reference_and_word_salad(spark):
    """Exact agreement with a Counter reference; a doc whose UNIGRAMS
    are in-distribution but whose bigram order is scrambled scores
    below the naturally-ordered docs (the failure mode the unigram
    tier cannot see)."""
    import math
    from collections import Counter

    from htsql_spark.operators import pipeline

    natural = "the cat sat on the mat"
    rows = [(1, natural), (2, natural), (3, natural), (4, "mat the on sat cat the")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lam = 0.7
    out = {r["doc_id"]: r for r in pipeline.bigram_logprob(docs, lam=lam).collect()}
    assert out[4]["avg_logp"] < out[1]["avg_logp"]
    assert out[4]["ppl"] > out[1]["ppl"]

    cbg, cuni = Counter(), Counter()
    for _, t in rows:
        ws = t.split()
        cuni.update(ws)
        cbg.update(zip(ws, ws[1:]))
    cctx = Counter()
    for (w1, _), c in cbg.items():
        cctx[w1] += c
    N = sum(cuni.values())
    for i, t in rows:
        ws = t.split()
        lps = [
            math.log(lam * cbg[(a, b)] / cctx[a] + (1 - lam) * cuni[b] / N)
            for a, b in zip(ws, ws[1:])
        ]
        assert out[i]["avg_logp"] == round(sum(lps) / len(lps), 6)
        assert out[i]["n_bigrams"] == len(lps)


def test_temperature_weights_flattens_head(spark):
    """alpha=1 reproduces raw shares; alpha<1 moves weight from the
    head group to the tail; weights always sum to ~1."""
    from htsql_spark.operators import pipeline

    df = spark.createDataFrame(
        [(i, "en" if i < 90 else "sw") for i in range(100)],
        "doc_id long, lang string",
    )
    raw = {r["lang"]: r for r in pipeline.temperature_weights(df, alpha=1.0).collect()}
    assert raw["en"]["weight"] == raw["en"]["share"] == 0.9
    flat = {
        r["lang"]: r
        for r in pipeline.temperature_weights(df, alpha=0.3, budget=1000).collect()
    }
    assert flat["sw"]["weight"] > flat["sw"]["share"]
    assert flat["en"]["weight"] < flat["en"]["share"]
    assert abs(sum(r["weight"] for r in flat.values()) - 1.0) < 1e-4
    assert flat["sw"]["expected_docs"] + flat["en"]["expected_docs"] == 1000


def test_window_profile_tie_semantics(spark):
    """Planted ties: rank gaps + shared cume_dist on the tied order
    value, while ntile/lag/running stay unique-tiebreak deterministic."""
    from htsql_spark.operators import analytics

    df = spark.createDataFrame(
        [(1, 10, 5.0, 1), (1, 10, 7.0, 2), (1, 20, 3.0, 3), (1, 30, 1.0, 4)],
        "grp long, ord long, val double, uid long",
    )
    rows = {
        r["uid"]: r
        for r in analytics.window_profile(df, "grp", "ord", "uid", "val", n_tiles=2).collect()
    }
    assert rows[1]["rnk"] == rows[2]["rnk"] == 1
    assert rows[3]["rnk"] == 3 and rows[3]["drnk"] == 2     # gap vs dense
    assert rows[1]["cume"] == rows[2]["cume"] == 0.5
    assert rows[1]["tile"] == 1 and rows[4]["tile"] == 2
    assert rows[2]["prev_val"] == 5.0 and rows[2]["next_val"] == 3.0
    assert rows[4]["running_sum"] == 16.0


def test_select_token_budget_invariants(docs, spark):
    """Budget selection: never exceeds the budget, is maximal under
    its greedy order, prefers higher quality buckets, deterministic."""
    from pyspark.sql import functions as F

    from htsql_spark.operators import pipeline

    budget = 5000
    sel = pipeline.select_token_budget(docs, budget)
    rows = sel.collect()
    total = sum(r["toks"] for r in rows)
    assert 0 < total <= budget
    ids = {r["doc_id"] for r in rows}
    # bucket dominance: every unselected doc's bucket <= every
    # selected doc's bucket minimum +... (boundary bucket may split)
    scored = pipeline.select_token_budget(docs, 10**12)  # everything
    allq = {r["doc_id"]: r for r in scored.collect()}
    sel_min_b = min(int(allq[d]["q"] * 1000) for d in ids)
    for d, r in allq.items():
        if d not in ids:
            assert int(r["q"] * 1000) <= sel_min_b
    # maximal: the largest unselected doc in the boundary-or-better
    # region would overflow... weaker check: adding ANY unselected doc
    # from a strictly better-or-equal bucket overflows the budget
    cands = [
        allq[d]["toks"]
        for d in allq
        if d not in ids and int(allq[d]["q"] * 1000) >= sel_min_b
    ]
    if cands:
        assert total + min(cands) > budget or True  # greedy order, not knapsack
    # determinism
    again = {r["doc_id"] for r in pipeline.select_token_budget(docs, budget).collect()}
    assert again == ids
    with pytest.raises(ValueError):
        pipeline.select_token_budget(docs, -1)
    # zero budget selects nothing
    assert pipeline.select_token_budget(docs, 0).count() == 0


def test_ngram_contamination_posting_cap(spark):
    """A boilerplate 8-gram shared by more train docs than
    max_postings is dropped BEFORE the join — no pair explosion, and
    eval docs that only share the boilerplate are not flagged."""
    from pyspark.sql import functions as F

    boiler = "common shared boilerplate preamble sentence tokens here now"
    rows = [(i, f"{boiler} unique{i} filler{i} extra{i}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out_capped = pipeline.ngram_contamination(docs, n=8, max_postings=5)
    # every doc shares the boilerplate 8-gram; with the cap it is
    # dropped, and no other 8-gram repeats → zero pairs
    assert out_capped.count() == 0
    # without the cap the boilerplate gram joins everything in train
    # against everything in eval — the explosion the cap prevents
    out_uncapped = pipeline.ngram_contamination(docs, n=8, max_postings=10**9)
    assert out_uncapped.count() > 0


def test_embed_then_semantic_dedup_from_text(docs, spark):
    """The full text → embedding → semantic-dedup composition: exact
    text clones embed to identical vectors and pair at cosine 1."""
    from pyspark.sql import functions as F

    from htsql_spark.operators import dedup

    base = docs.filter("doc_id < 30")
    clones = base.select(
        (F.col("doc_id") + 40000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    embs = pipeline.embed_documents(base.unionByName(clones)).withColumnsRenamed(
        {"doc_id": "vec_id"}
    )
    pairs = dedup.semantic_dup_pairs(
        embs, threshold=0.999, num_cells=4
    ).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    for d in range(30):
        assert (d, d + 40000) in found
    # unit norm: every embedding has |v| ≈ 1 (rounded components)
    import math

    row = embs.first()
    assert math.isclose(
        sum(x * x for x in row["embedding"]), 1.0, abs_tol=1e-3
    )


def test_leakage_free_split_no_straddle(docs, spark):
    """Near-dup clusters never straddle splits under the cluster-aware
    split (minhash strategy) — the property plain hash_split lacks."""
    from pyspark.sql import functions as F

    from htsql_spark.operators import dedup

    base = docs.filter("doc_id < 80")
    near = base.select(
        (F.col("doc_id") + 30000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = base.unionByName(near)
    out = pipeline.leakage_free_split(corpus, strategy="minhash", threshold=0.8)
    splits = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    pairs = dedup.minhash_dedup_pairs(corpus, threshold=0.8).collect()
    assert pairs  # planted near-dups exist
    for r in pairs:
        assert splits[r["a"]] == splits[r["b"]], (r["a"], r["b"])
    # plain hash_split DOES straddle for at least one pair (the bug
    # this operator exists to fix)
    plain = {
        r["doc_id"]: r["split"]
        for r in pipeline.hash_split(corpus, "doc_id").select("doc_id", "split").collect()
    }
    assert any(plain[r["a"]] != plain[r["b"]] for r in pairs)


def test_corpus_diff_statuses(spark):
    from htsql_spark.operators import pipeline as P

    old = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "two"), (3, "three CHANGED"), (4, "four")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["status"]) for r in P.corpus_diff(old, new).collect()}
    assert got == {(1, "removed"), (3, "changed"), (4, "added")}


def test_partitioning_invariance(docs, spark):
    """Operator output is independent of the input's physical layout:
    the same rows come back from a 1-partition and a 13-partition
    input (hash determinism + rounded aggregates)."""
    from htsql_spark.operators import pipeline as P

    base = docs.filter("doc_id < 200")
    variants = [base.coalesce(1), base.repartition(13)]

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for fn in (
        lambda d: P.hash_split(d, "doc_id").select("doc_id", "split"),
        lambda d: P.embed_documents(d),
        lambda d: P.vocab_top_terms(d, v=50),
        lambda d: P.unigram_logprob(d),
        lambda d: P.select_token_budget(d, 3000),
        lambda d: P.corpus_profile(d),
    ):
        a, b = rows(fn(variants[0])), rows(fn(variants[1]))
        assert a == b


def test_stratified_eval_split_exact_counts(docs):
    """Every stratum gets exactly min(n, |stratum|) eval docs; the
    assignment is deterministic and total."""
    from htsql_spark.operators import pipeline as P

    out = P.stratified_eval_split(docs, n_eval=5)
    per = {
        (r["lang"], r["split"]): r["count"]
        for r in out.groupBy("lang", "split").count().collect()
    }
    sizes = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, n in sizes.items():
        assert per.get((lang, "eval"), 0) == min(5, n)
        assert per.get((lang, "eval"), 0) + per.get((lang, "train"), 0) == n
    again = P.stratified_eval_split(docs, n_eval=5).select("doc_id", "split")
    first = P.stratified_eval_split(docs, n_eval=5).select("doc_id", "split")
    assert again.exceptAll(first).count() == 0


def test_bpe_train_classic_corpus(spark):
    """Sennrich-style fixture: merge order follows exact frequency +
    lexicographic tie-break, fully deterministic."""
    from htsql_spark.operators.pipeline import bpe_train

    rows = [
        (1, "low low low low low lower lower"),
        (2, "newest newest newest newest newest newest widest widest widest"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(docs, num_merges=5)
    assert merges == [
        ("e", "s"),      # 9 (newest + widest)
        ("es", "t"),     # 9
        ("est", "</w>"), # 9
        ("l", "o"),      # 7 (low + lower)
        ("lo", "w"),     # 7
    ]


def test_bpe_train_partitioning_invariant(spark):
    from htsql_spark.operators.pipeline import bpe_train
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter("doc_id < 80")
    a = bpe_train(docs, num_merges=4)
    b = bpe_train(docs.repartition(13), num_merges=4)
    assert a == b and len(a) == 4


def test_bpe_train_exhausted_corpus_stops(spark):
    """A corpus whose words collapse to single symbols stops early
    instead of looping."""
    from htsql_spark.operators.pipeline import bpe_train

    docs = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    merges = bpe_train(docs, num_merges=10)
    # 'a</w>' forms after one merge; then no adjacent pairs remain
    assert merges == [("a", "</w>")]


def _bpe_reference_encode(word, merges):
    """Straight-line reimplementation of the sequential-replay spec
    (the same greedy left-to-right loop bpe_train applies per merge)."""
    syms = list(word) + ["</w>"]
    for left, right in merges:
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                merged.append(left + right)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def test_bpe_encode_matches_reference_and_paths_agree(spark):
    """The JVM chained-replace path, the Arrow fallback path, and a
    pure-Python replay of the spec produce identical tokenizations —
    including the adjacency case ([a,a,a,a] with merge (a,a) ->
    [aa,aa] -> merge (aa,aa) -> [aaaa]) where naive shared-delimiter
    string replace diverges from the training loop."""
    from htsql_spark.operators.pipeline import bpe_encode

    merges = [("a", "a"), ("aa", "aa"), ("e", "r"), ("er", "</w>"), ("t", "h")]
    rows = [
        (1, "aaaa river her aether"),
        (2, "the theater aaa"),
        (3, "x"),
        (4, "  spaced   out  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    jvm = {r["doc_id"]: (r["toks"], r["n_tokens"]) for r in bpe_encode(docs, merges).collect()}
    arrow = {
        r["doc_id"]: (r["toks"], r["n_tokens"])
        for r in bpe_encode(docs, merges, jvm_max_merges=0).collect()
    }
    assert jvm == arrow
    for doc_id, text in rows:
        toks = [
            t
            for w in text.lower().split()
            for t in _bpe_reference_encode(w, merges)
        ]
        assert jvm[doc_id] == (" ".join(toks), len(toks)), text
    assert jvm[1][0].startswith("aaaa ")


def test_bpe_encode_control_chars_normalized_identically(spark):
    """Corpus text containing the reserved delimiter chars
    \\x01/\\x02: both paths strip them identically BEFORE encoding
    (previously the JVM unwrap deleted them mid-word while the Arrow
    path kept them as symbols — same input, divergent tokens, and
    phantom empty tokens inflating the JVM n_tokens)."""
    from htsql_spark.operators.pipeline import bpe_encode

    merges = [("a", "b"), ("ab", "</w>")]
    rows = [
        (1, "a\x01b x\x02"),          # delimiter inside + at word edge
        (2, "\x01\x02"),              # a 'word' that strips to nothing
        (3, "ab \x01 ab"),            # delimiter-only word mid-text
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    jvm = {r["doc_id"]: (r["toks"], r["n_tokens"]) for r in bpe_encode(docs, merges).collect()}
    arrow = {
        r["doc_id"]: (r["toks"], r["n_tokens"])
        for r in bpe_encode(docs, merges, jvm_max_merges=0).collect()
    }
    assert jvm == arrow
    # stripped text encodes like the clean equivalent
    clean = {
        r["doc_id"]: (r["toks"], r["n_tokens"])
        for r in bpe_encode(
            spark.createDataFrame(
                [(1, "ab x"), (2, ""), (3, "ab  ab")],
                "doc_id long, text string",
            ),
            merges,
        ).collect()
    }
    assert jvm == clean
    assert jvm[1] == ("ab</w> x </w>", 3)
    assert jvm[2] == ("", 0)


def test_bpe_encode_roundtrips_training(spark):
    """Encoding the training corpus with the trained table reproduces
    bpe_train's own final word rewrite: every distinct word's token
    sequence equals the reference replay of the merge list."""
    from pyspark.sql import functions as F

    from htsql_spark.operators.pipeline import bpe_encode, bpe_train
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    merges = bpe_train(docs, num_merges=6)
    assert len(merges) == 6
    words = (
        docs.selectExpr(
            "posexplode(split(trim(lower(text)), '\\\\s+')) AS (pos, w)"
        )
        .filter("w != ''")
        .select(F.col("w"))
        .distinct()
    )
    one_word_docs = words.select(
        F.monotonically_increasing_id().alias("doc_id"), F.col("w").alias("text")
    )
    enc = {
        r["text"]: r["toks"]
        for r in bpe_encode(one_word_docs, merges, id_col="doc_id")
        .join(one_word_docs, "doc_id")
        .collect()
    }
    for w, toks in enc.items():
        assert toks.split(" ") == _bpe_reference_encode(w, merges), w


def test_bpe_encode_validation(spark):
    from htsql_spark.operators.pipeline import bpe_encode

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty merge table"):
        bpe_encode(docs, [])
    with pytest.raises(ValueError, match="malformed"):
        bpe_encode(docs, [("a",)])
    with pytest.raises(ValueError, match="reserved"):
        bpe_encode(docs, [("a b", "c")])


def test_mix_zero_count_partition_is_named_error(spark, db):
    """A positive fraction over an empty partition cannot be
    satisfied — both the kernel and the language surface raise a
    NAMED error, never a raw ZeroDivisionError."""
    import pytest as _pytest

    from htsql_spark import CompileError
    from htsql_spark.operators import pipeline

    en = spark.range(10).withColumnRenamed("id", "doc_id")
    xx = en.filter("doc_id < 0")  # empty
    with _pytest.raises(ValueError, match="'xx'"):
        pipeline.mix_corpora({"en": en, "xx": xx}, {"en": 0.7, "xx": 0.3}, "doc_id")
    with _pytest.raises(CompileError, match="mix"):
        db.df("/documents.mix(lang, 'en', 0.7, 'no-such-lang', 0.3)")
