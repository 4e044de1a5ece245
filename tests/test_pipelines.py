"""End-to-end reference pipelines over MPG-shaped fixtures, pinned by
the reference's own operational invariants (SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mpg_data_warehouse_spark import fixtures as FX
from mpg_data_warehouse_spark.plans import pipelines as P


@pytest.fixture(scope="module")
def mpg(spark):
    meta = FX.survey_metadata(spark, n_surveys=40)
    species = FX.species_metadata(spark)
    return {
        "meta": meta,
        "species": species,
        "ground": FX.point_intercept_ground(spark, meta, points_per_survey=40),
        "ground_meta": FX.ground_cover_metadata(spark),
        "foliar": FX.foliar_cover_all(spark, meta, species),
        "additional": FX.additional_species(spark, meta),
    }


def test_ground_cover_complete_grid_invariant(spark, mpg):
    """Pre-filter, the completed grid must be exactly
    |observed (survey, grid_point)| × |observed codes|
    (the 1,242×23=28,556-style invariant, and no NULL measures —
    gridVeg_groundCover_intercepts_WRANGLE.ipynb:552-554, 771-830)."""
    agg = (
        mpg["ground"]
        .filter(F.col("intercept_ground_code").isNotNull())
        .groupBy("survey_ID", "grid_point", "intercept_ground_code")
        .agg((F.count("intercept_ground_code") / 2).alias("intercepts_pct"))
    )
    from mpg_data_warehouse_spark.operators.complete import complete

    filled = complete(
        agg,
        expand=["intercept_ground_code"],
        nesting=["survey_ID", "grid_point"],
        fill={"intercepts_pct": 0.0},
    )
    n_anchor = agg.select("survey_ID", "grid_point").distinct().count()
    n_codes = agg.select("intercept_ground_code").distinct().count()
    assert filled.count() == n_anchor * n_codes
    assert filled.filter(F.col("intercepts_pct").isNull()).count() == 0


def test_ground_cover_pipeline_output(spark, mpg):
    out = P.ground_cover_pipeline(mpg["ground"], mpg["meta"], mpg["ground_meta"])
    assert out.columns == [
        "survey_ID", "year", "survey_sequence", "grid_point",
        "intercept_ground_code", "ground_group", "intercepts_pct",
    ]
    rows = out.collect()
    assert rows, "recent-years filter should keep some surveys"
    assert all(r.year > 2022 and r.grid_point != 586 for r in rows)
    # every kept code resolves to its group (no dangling codes)
    assert all(r.ground_group is not None for r in rows)
    # %-cover: count/2 of 40 points ≤ 20, ≥ 0
    assert all(0.0 <= r.intercepts_pct <= 20.0 for r in rows)


def test_functional_groups_cardinality_invariant(spark, mpg):
    out = P.functional_groups_pipeline(mpg["foliar"], mpg["meta"], min_year=0)
    agg_src = mpg["foliar"].filter(F.col("key_plant_code") != "NV")
    n_surveys = agg_src.select("survey_ID").distinct().count()
    n_combos = (
        agg_src.select(
            "plant_native_status", "plant_life_cycle", "plant_life_form"
        )
        .distinct()
        .count()
    )
    # min_year=0 keeps everything → the full completed grid survives
    assert out.count() == n_surveys * n_combos
    assert out.filter(F.col("detection_rate").isNull()).count() == 0


def test_species_richness_no_duplicate_supplementals(spark, mpg):
    out = P.species_richness_pipeline(mpg["foliar"], mpg["additional"], min_year=0)
    # Invariant (gridVeg_species_richness_WRANGLE.ipynb:979-987): a
    # (survey, species) pair that appears ≥2× among point-intercept
    # detections must have NO supplemental rows.
    pi_multi = (
        out.filter(F.col("detection_type") == "point_intercept")
        .groupBy("survey_ID", "key_plant_species")
        .count()
        .filter("count > 1")
        .select("survey_ID", "key_plant_species")
    )
    bad = (
        out.filter(F.col("detection_type") == "supplemental")
        .join(pi_multi, ["survey_ID", "key_plant_species"], "left_semi")
        .count()
    )
    assert bad == 0
    # NV sentinel is gone on the point-intercept side
    assert out.filter(F.col("key_plant_species") == 360).filter(
        F.col("detection_type") == "point_intercept"
    ).count() == 0


def test_ingest_pipeline_idempotent(spark, mpg, tmp_path):
    table = str(tmp_path / "survey_metadata")
    mpg["meta"].write.parquet(table)
    raw = mpg["meta"].limit(10).select(
        F.col("survey_ID").alias("Survey Data::__kp_Survey"),
        F.col("grid_point").alias("Survey Data::GridPoint"),
        F.col("year").alias("Survey Data::Year"),
        F.col("date").alias("Survey Data::Date"),
        F.col("surveyor").alias("Survey Data::Surveyor"),
    )
    rename = {
        "Survey Data::__kp_Survey": "survey_ID",
        "Survey Data::GridPoint": "grid_point",
        "Survey Data::Year": "year",
        "Survey Data::Date": "date",
        "Survey Data::Surveyor": "surveyor",
    }
    res = P.ingest_pipeline(
        raw, table, rename, required=["survey_ID", "date"], key_cols=["survey_ID"]
    )
    assert res.appended_rows == 0 and res.duplicate_rows == 10
    assert res.reconciled


def test_ingest_pipeline_validation_gate(spark, mpg, tmp_path):
    table = str(tmp_path / "t2")
    mpg["meta"].write.parquet(table)
    bad = spark.createDataFrame(
        [("x1", None), ("x2", "2024-07-01")], ["survey_ID", "date"]
    )
    with pytest.raises(ValueError, match="validation failed"):
        P.ingest_pipeline(bad, table, {}, required=["date"], key_cols=["survey_ID"])


def test_date_repair_pipeline(spark, mpg):
    corrupted = FX.additional_species(spark, mpg["meta"], corrupt_dates=True)
    # sanity: corruption planted some mismatched dates
    joined = corrupted.alias("a").join(
        mpg["meta"].select("survey_ID", F.col("date").alias("true_date")),
        "survey_ID",
    )
    n_bad = joined.filter(F.col("date") != F.col("true_date")).count()
    assert n_bad > 0
    repaired = P.date_repair_pipeline(corrupted, mpg["meta"])
    re_joined = repaired.alias("a").join(
        mpg["meta"].select("survey_ID", F.col("date").alias("true_date")),
        "survey_ID",
    )
    assert re_joined.filter(F.col("date") != F.col("true_date")).count() == 0
    assert repaired.filter(F.col("year") != F.year("date")).count() == 0


def test_image_ingest_pipeline(spark, mpg, tmp_path):
    """Trim fix + url derivation + image_ID-keyed idempotent append
    (reference update_gridVeg_image_metadata flow)."""
    import pyspark.sql.functions as SF

    from mpg_data_warehouse_spark import schemas as SCH

    table = str(tmp_path / "images")
    spark.createDataFrame([], SCH.IMAGE_METADATA).write.parquet(table)
    raw = FX.image_metadata_raw(spark, mpg["meta"].limit(10))
    res = P.image_ingest_pipeline(raw, table)
    assert res.appended_rows == 20 and res.reconciled
    got = spark.read.parquet(table)
    # F7: no trailing whitespace survives
    assert got.filter(SF.col("image_direction").rlike(r"\s$")).count() == 0
    assert set(
        r.image_direction for r in got.select("image_direction").distinct().collect()
    ) <= {"North", "East", "South", "West"}
    # F8: every url is base + id + .jpg
    bad_urls = got.filter(
        SF.col("image_url")
        != SF.concat(SF.lit(P.IMAGE_URL_BASE), SF.col("image_ID"), SF.lit(".jpg"))
    ).count()
    assert bad_urls == 0
    # J6 idempotence: replay appends nothing
    res2 = P.image_ingest_pipeline(raw, table)
    assert res2.appended_rows == 0


def test_vegetation_fixture_null_layering(spark, mpg):
    veg = FX.point_intercept_vegetation(spark, mpg["meta"].limit(20))
    import pyspark.sql.functions as SF

    rates = veg.select(
        *[
            (SF.count(SF.when(SF.col(f"intercept_{i}").isNull(), 1))
             / SF.count(SF.lit(1))).alias(f"r{i}")
            for i in range(1, 5)
        ]
    ).collect()[0]
    # null rate must increase with layer (the reference's layering)
    assert rates.r1 < rates.r2 < rates.r3 < rates.r4


def test_point_intercepts_fanout_ingest(spark, mpg, tmp_path):
    """One CSV batch fans out to vegetation + ground tables; ground
    runs only after vegetation reconciles; both idempotent."""
    import pyspark.sql.functions as SF

    from mpg_data_warehouse_spark import schemas as SCH

    veg_path = str(tmp_path / "veg")
    ground_path = str(tmp_path / "ground")
    spark.createDataFrame([], SCH.POINT_INTERCEPT_VEGETATION).write.parquet(veg_path)
    spark.createDataFrame([], SCH.POINT_INTERCEPT_GROUND).write.parquet(ground_path)

    # raw FileMaker-shaped batch derived from the ground fixture, with
    # sentinel "" / "NA" strings in the numeric layers
    g = mpg["ground"].limit(30)
    raw = g.select(
        SF.col("survey_ID").alias("Survey Data::__kp_Survey"),
        SF.col("grid_point").cast("string").alias("Survey Data::_kf_Site"),
        SF.col("date").alias("Survey Data::SurveyDate"),
        SF.col("year").alias("Survey Data::SurveyYear"),
        SF.col("transect_point").alias("PointTrans"),
        SF.lit("12.5").alias("Height"),
        SF.coalesce(SF.col("intercept_ground_code"), SF.lit("BG")).alias("GroundCover"),
        SF.col("intercept_1").cast("string").alias("_kf_Hit1_serial"),
        SF.lit("NA").alias("_kf_Hit2_serial"),
        SF.lit("").alias("_kf_Hit3_serial"),
        SF.lit("7").alias("_kf_Hit4_serial"),
    )
    veg_res, ground_res = P.point_intercepts_ingest_pipeline(raw, veg_path, ground_path)
    assert veg_res.appended_rows == 30 and veg_res.reconciled
    assert ground_res.appended_rows == 30 and ground_res.reconciled

    veg = spark.read.parquet(veg_path)
    assert veg.schema == SCH.POINT_INTERCEPT_VEGETATION
    row = veg.limit(1).collect()[0]
    assert row.height_intercept_1 == 12.5
    assert row.intercept_2 is None and row.intercept_3 is None  # sentinels → NULL
    assert row.intercept_4 == 7

    # replay: both appends add zero
    v2, g2 = P.point_intercepts_ingest_pipeline(raw, veg_path, ground_path)
    assert v2.appended_rows == 0 and g2.appended_rows == 0


def test_point_intercepts_bad_transect_aborts_before_write(spark, mpg, tmp_path):
    import pyspark.sql.functions as SF

    from mpg_data_warehouse_spark import schemas as SCH

    veg_path = str(tmp_path / "veg2")
    ground_path = str(tmp_path / "ground2")
    spark.createDataFrame([], SCH.POINT_INTERCEPT_VEGETATION).write.parquet(veg_path)
    spark.createDataFrame([], SCH.POINT_INTERCEPT_GROUND).write.parquet(ground_path)
    raw = mpg["ground"].limit(3).select(
        SF.col("survey_ID").alias("Survey Data::__kp_Survey"),
        SF.col("grid_point").cast("string").alias("Survey Data::_kf_Site"),
        SF.col("date").alias("Survey Data::SurveyDate"),
        SF.col("year").alias("Survey Data::SurveyYear"),
        SF.lit("X99").alias("PointTrans"),  # invalid transect format
        SF.lit("1.0").alias("Height"),
        SF.lit("BG").alias("GroundCover"),
        SF.lit("1").alias("_kf_Hit1_serial"),
        SF.lit("2").alias("_kf_Hit2_serial"),
        SF.lit("3").alias("_kf_Hit3_serial"),
        SF.lit("4").alias("_kf_Hit4_serial"),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="validation failed"):
        P.point_intercepts_ingest_pipeline(raw, veg_path, ground_path)
    # the gate fired BEFORE any write
    assert spark.read.parquet(veg_path).count() == 0
    assert spark.read.parquet(ground_path).count() == 0


def test_curate_corpus_pipeline_invariants(spark):
    """End-to-end curation: exact dups collapse, near-dups collapse to
    one representative, chunks respect the token budget, and the run
    is deterministic."""
    from mpg_data_warehouse_spark.plans.pipelines import curate_corpus_pipeline

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base * 3, "web"),
            (2, base * 3, "web"),          # exact dup of 1
            (3, ("x " * 2) + base * 3, "web"),  # near dup of 1
            (4, "completely different long form content " * 5, "books"),
            (5, "shrt", "web"),            # fails quality (too few tokens)
        ],
        ["doc_id", "text", "source"],
    )
    out = curate_corpus_pipeline(docs, min_quality=0.5, max_tokens=16, overlap=4)
    kept_docs = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert 5 not in kept_docs            # quality-filtered
    assert kept_docs & {1, 2, 3} == {1}  # exact + near dups → canonical only
    assert 4 in kept_docs
    assert out.filter("n_tokens > 16").count() == 0
    # deterministic end to end
    out2 = curate_corpus_pipeline(docs, min_quality=0.5, max_tokens=16, overlap=4)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in out2.collect()}


def test_curate_corpus_pipeline_budget_stage(spark):
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.plans.pipelines import curate_corpus_pipeline

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        # big docs share a long prefix but keep pairwise Jaccard < 0.5
        # (distinct doc{i} run dominates the union) — they survive
        # near-dedup and get budget-sampled
        [(i, f"{words} " + " ".join(f"doc{i}w{j}" for j in range(20)), "big")
         for i in range(40)]
        + [(100, "unrelated tiny corpus entry about nothing shared", "small")],
        ["doc_id", "text", "source"],
    )
    out = curate_corpus_pipeline(
        docs, min_quality=0.0, target_tokens_per_source=100.0, max_tokens=64
    )
    per_src = {
        r.source: r.t
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert per_src.get("small", 0) > 0          # under budget → kept whole
    assert per_src["big"] < 40 * 21             # big source down-sampled


def test_curate_corpus_pipeline_subword_budget(spark):
    """vocab= switches the rebalance budget unit to SUBWORD tokens:
    a source whose docs are few WORDS but many PIECES sails under a
    whitespace budget yet is down-sampled under the same budget in
    subword units — and the kept subword weight lands near target."""
    import string

    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.tokenize import (
        subword_token_count,
    )
    from mpg_data_warehouse_spark.plans.pipelines import (
        curate_corpus_pipeline,
    )

    # char-grain vocab: every word tokenizes to len(word) pieces
    chars = string.ascii_lowercase + string.digits
    vocab = list(chars) + ["##" + c for c in chars]
    # 60 docs, 12 words each, but words are ~18 chars: whitespace
    # total = 720, subword total ≈ 13k
    docs = spark.createDataFrame(
        [
            (
                i,
                "the "
                + " ".join(f"w{i}x{j}" + "q" * 12 for j in range(11)),
                "heavy",
            )
            for i in range(60)
        ],
        ["doc_id", "text", "source"],
    )
    kw = dict(min_quality=0.0, target_tokens_per_source=2000.0,
              max_tokens=64)
    by_words = curate_corpus_pipeline(docs, **kw)
    by_pieces = curate_corpus_pipeline(docs, vocab=vocab, **kw)
    n_words = by_words.select("doc_id").distinct().count()
    n_pieces = by_pieces.select("doc_id").distinct().count()
    assert n_words == 60       # whitespace accounting: under budget
    assert 0 < n_pieces < 30   # subword accounting: down-sampled
    # kept subword weight ≈ target (hash-uniform keep-rate)
    kept_ids = by_pieces.select("doc_id").distinct()
    kept_w = (
        subword_token_count(docs.join(kept_ids, "doc_id"), vocab)
        .agg(F.sum("n_subword_tokens"))
        .first()[0]
    )
    assert 700 <= kept_w <= 4000


def test_curate_corpus_pipeline_learned_vocab_auto_sizing(spark):
    """A learn_bpe_vocab vocab (pieces can exceed the tokenizer's
    default max_piece_len) feeds straight into the pipeline — the
    auto-sized scanner must not raise."""
    from mpg_data_warehouse_spark.operators.tokenize import learn_bpe_vocab
    from mpg_data_warehouse_spark.plans.pipelines import (
        curate_corpus_pipeline,
    )

    docs = spark.createDataFrame(
        [
            (i, "the " + " ".join(f"tok{i}n{j}" for j in range(11)), "s")
            for i in range(8)
        ],
        ["doc_id", "text", "source"],
    )
    _merges, vocab = learn_bpe_vocab(docs, n_merges=40, min_pair_count=2)
    out = curate_corpus_pipeline(
        docs, min_quality=0.0, target_tokens_per_source=1e9, vocab=vocab
    )
    assert out.count() > 0


def test_curate_corpus_pipeline_boilerplate_stage(spark):
    """With max_line_df set, a nav line shared by every web page is
    stripped BEFORE dedup/quality — docs that differ only by their
    body survive as distinct, and the boilerplate never reaches the
    packed chunks."""
    from mpg_data_warehouse_spark.plans.pipelines import curate_corpus_pipeline

    nav = "home about contact privacy terms sitemap login register help"
    docs = spark.createDataFrame(
        [
            (i, f"{nav}\n" + " ".join(f"doc{i}word{j}" for j in range(30)), "web")
            for i in range(1, 5)
        ],
        ["doc_id", "text", "source"],
    )
    out = curate_corpus_pipeline(
        docs, min_quality=0.0, max_tokens=64, max_line_df=2
    )
    kept_docs = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert kept_docs == {1, 2, 3, 4}  # bodies are distinct -> all survive
    assert out.filter(F.col("chunk_text").contains("sitemap")).count() == 0


def test_curate_corpus_pipeline_lm_gate(spark):
    """With a pre-trained unigram model, the perplexity gate drops the
    OOV-garble doc that the surface-quality heuristics would pass."""
    from mpg_data_warehouse_spark.plans.pipelines import curate_corpus_pipeline
    from mpg_data_warehouse_spark.operators.text import unigram_lm

    fluent = "the quick brown fox jumps over the lazy dog near the river bank"
    reference = spark.createDataFrame(
        [(i, fluent, "ref") for i in range(3)], ["doc_id", "text", "source"]
    )
    model, oov = unigram_lm(reference)
    garble = " ".join(f"zq{j}xv wblort" for j in range(8))
    docs = spark.createDataFrame(
        [(1, fluent + " today", "web"), (2, garble, "web")],
        ["doc_id", "text", "source"],
    )
    gated = curate_corpus_pipeline(
        docs, min_quality=0.0, max_tokens=64,
        lm_model=(model, oov), max_nll_per_token=-oov - 0.5,
    )
    assert {r.doc_id for r in gated.select("doc_id").distinct().collect()} == {1}
    # Without the gate both docs survive — the drop is the LM's doing.
    open_ = curate_corpus_pipeline(docs, min_quality=0.0, max_tokens=64)
    assert open_.select("doc_id").distinct().count() == 2


def test_curate_corpus_pipeline_temperature_mixture_stage(spark):
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.plans.pipelines import curate_corpus_pipeline

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, f"{words} " + " ".join(f"doc{i}w{j}" for j in range(20)), "big")
         for i in range(40)]
        + [(100, "unrelated tiny corpus entry about nothing shared", "small")],
        ["doc_id", "text", "source"],
    )
    out = curate_corpus_pipeline(
        docs, min_quality=0.0, max_tokens=64,
        mixture_temperature=0.0, mixture_target_total=200.0,
    )
    per_src = {
        r.source: r.t
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    # T=0 splits the budget evenly: small keeps everything (capped at
    # 1), big is down-sampled toward ~100 tokens.
    assert per_src.get("small", 0) > 0
    assert per_src["big"] < 40 * 21 / 2
    import pytest

    with pytest.raises(ValueError):
        curate_corpus_pipeline(
            docs, target_tokens_per_source=10.0, mixture_temperature=0.5
        )


def test_curate_corpus_pipeline_span_strip_stage(spark):
    """strip_spans_tokens removes a passage shared between two
    otherwise-distinct surviving docs (keep_first spares one copy),
    before packing."""
    from mpg_data_warehouse_spark.plans.pipelines import curate_corpus_pipeline

    shared = " ".join(f"boiler{i}" for i in range(8))
    a_body = " ".join(f"alpha{i}" for i in range(24))
    b_body = " ".join(f"beta{i}" for i in range(24))
    docs = spark.createDataFrame(
        [
            (1, f"{shared} {a_body}", "web"),
            (2, f"{shared} {b_body}", "web"),
        ],
        ["doc_id", "text", "source"],
    )
    out = curate_corpus_pipeline(
        docs,
        min_quality=0.0,
        jaccard_threshold=0.9,
        max_tokens=64,
        overlap=0,
        strip_spans_tokens=8,
    )
    texts = {
        r.doc_id: " ".join(
            c.chunk_text for c in out.filter(out.doc_id == r.doc_id)
            .orderBy("chunk_id").collect()
        )
        for r in out.select("doc_id").distinct().collect()
    }
    assert set(texts) == {1, 2}
    # exactly one copy of the shared passage survives corpus-wide
    n_with_shared = sum("boiler0" in t for t in texts.values())
    assert n_with_shared == 1
    assert "alpha0" in texts[1] and "beta0" in texts[2]


def test_curate_corpus_pipeline_decontaminates(spark):
    from mpg_data_warehouse_spark.plans.pipelines import curate_corpus_pipeline

    bench = "which planet has the most moons in the solar system overall"
    filler = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, f"{filler} {bench}", "web"),      # leaked -> dropped
            (2, f"{filler} clean tail content here", "web"),
        ],
        ["doc_id", "text", "source"],
    )
    eval_set = spark.createDataFrame([(9, bench)], ["doc_id", "text"])
    out = curate_corpus_pipeline(
        docs, min_quality=0.0, eval_set=eval_set, decontaminate_shingle_n=8
    )
    assert {r.doc_id for r in out.select("doc_id").distinct().collect()} == {2}


def test_curate_corpus_pipeline_funnel_observations(spark):
    """Per-gate survivor counts arrive from the pipeline's one action —
    no extra count() jobs."""
    from mpg_data_warehouse_spark.operators.observability import stage_metrics
    from mpg_data_warehouse_spark.plans.pipelines import curate_corpus_pipeline

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base * 3, "web"),
            (2, base * 3, "web"),       # exact dup
            (3, "shrt", "web"),         # quality-filtered
            (4, "completely different long form content " * 5, "books"),
        ],
        ["doc_id", "text", "source"],
    )
    funnel = stage_metrics(["quality", "exact_dedup", "near_dedup"])
    out = curate_corpus_pipeline(
        docs, min_quality=0.5, max_tokens=16, overlap=4, funnel=funnel
    )
    out.count()  # the one action
    got = {k: o.get["rows"] for k, o in funnel.items()}
    assert got["quality"] == 3        # doc 3 dropped
    assert got["exact_dedup"] == 2    # doc 2 collapsed into 1
    assert got["near_dedup"] == 2     # no near dups beyond exact


def test_curate_corpus_pipeline_classifier_cap_and_dsir_stages(spark):
    """Round-4 stages compose: the trained classifier gate drops
    off-model docs, per-source caps bound a dominant source, and DSIR
    selects target-like survivors."""
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.text import nb_term_weights
    from mpg_data_warehouse_spark.plans.pipelines import (
        curate_corpus_pipeline,
    )

    good = "the committee published detailed findings about the survey"
    spam = "click here buy now free prize winner subscribe cheap deal"
    docs = spark.createDataFrame(
        [
            (i, good + f" topic{i} " + " ".join(f"w{i}x{j}" for j in range(8)), "web")
            for i in range(6)
        ]
        + [(50, spam + " " + " ".join(f"s{j}" for j in range(8)), "web")],
        ["doc_id", "text", "source"],
    )
    pos = spark.createDataFrame(
        [Row(doc_id=i, text=good + f" extra{i}") for i in range(3)]
    )
    neg = spark.createDataFrame(
        [Row(doc_id=i, text=spam + f" extra{i}") for i in range(3)]
    )
    weights, bias = nb_term_weights(pos, neg)

    out = curate_corpus_pipeline(
        docs,
        min_quality=0.0,
        max_tokens=32,
        overlap=0,
        classifier=(weights, bias),
        min_classifier_p=0.5,
        max_docs_per_source=4,
    )
    kept = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert 50 not in kept          # classifier-gated
    assert len(kept) == 4          # source cap holds
    assert kept == {0, 1, 2, 3}    # keep-earliest determinism

    # DSIR stage: target matching selects good-like docs
    target = pos
    out2 = curate_corpus_pipeline(
        docs,
        min_quality=0.0,
        max_tokens=32,
        overlap=0,
        dsir_target=target,
        dsir_n=3,
    )
    kept2 = {r.doc_id for r in out2.select("doc_id").distinct().collect()}
    assert len(kept2) == 3
    assert 50 not in kept2


def test_curation_repetition_gates_drop_repetitive_docs(spark):
    """Gopher-rule gates: a doc that is one bigram repeated and a doc
    with duplicated lines must drop; normal docs survive."""
    from mpg_data_warehouse_spark.plans.pipelines import (
        curate_corpus_pipeline,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far"
    rows = [
        (1, base + " every single day", "a"),
        (2, "spam ham " * 30, "a"),  # one repeated bigram
        (3, base + "\nline two\nline two\nline two", "a"),  # dup lines
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = curate_corpus_pipeline(
        docs,
        min_quality=0.0,
        jaccard_threshold=0.9,
        max_tokens=64,
        overlap=0,
        max_dup_line_frac=0.3,
        max_top_bigram_frac=0.5,
    )
    kept = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert kept == {1}


def test_curation_bigram_gate_drops_shuffled_text(spark):
    """The bigram gate must drop word-shuffled text the unigram gate
    cannot distinguish from its fluent source."""
    from mpg_data_warehouse_spark.operators.text import bigram_lm
    from mpg_data_warehouse_spark.plans.pipelines import (
        curate_corpus_pipeline,
    )

    fluent = "the cat sat on the mat while the dog ran fast today"
    shuffled = "today mat the fast on while sat ran the dog cat the"
    train = spark.createDataFrame(
        [(i, fluent, "a") for i in range(5)], ["doc_id", "text", "source"]
    )
    bi = bigram_lm(train, vocab_size=50, bigram_size=100)
    docs = spark.createDataFrame(
        [(1, fluent, "a"), (2, shuffled, "a")],
        ["doc_id", "text", "source"],
    )
    # threshold between the two scores: fluent scores near the model,
    # shuffled pays the (1-lambda)-only backoff on most bigrams
    from mpg_data_warehouse_spark.operators.text import (
        doc_logprob_score_bigram,
    )

    scores = {
        r.doc_id: r.nll_per_token
        for r in doc_logprob_score_bigram(docs, *bi).collect()
    }
    assert scores[2] > scores[1]
    cut = (scores[1] + scores[2]) / 2
    out = curate_corpus_pipeline(
        docs,
        min_quality=0.0,
        jaccard_threshold=0.9,
        max_tokens=64,
        overlap=0,
        lm_bigram=bi,
        max_bigram_nll=cut,
    )
    kept = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert kept == {1}


def test_lm_gates_keep_unscoreable_short_docs(spark):
    """r8 ADVICE low: docs with fewer than 2 tokens have no bigram
    (and 0-token docs no unigram) — they are absent from the scorer's
    output and must PASS the fluency gates, not be silently dropped
    by a semi-join on scored passes."""
    from mpg_data_warehouse_spark.operators.text import (
        bigram_lm,
        unigram_lm,
    )
    from mpg_data_warehouse_spark.plans.pipelines import (
        curate_corpus_pipeline,
    )

    fluent = "the cat sat on the mat while the dog ran fast today"
    train = spark.createDataFrame(
        [(i, fluent, "a") for i in range(5)], ["doc_id", "text", "source"]
    )
    bi = bigram_lm(train, vocab_size=50, bigram_size=100)
    uni = unigram_lm(train, vocab_size=50)
    docs = spark.createDataFrame(
        [(1, fluent, "a"), (2, "solitary", "a")],
        ["doc_id", "text", "source"],
    )
    out = curate_corpus_pipeline(
        docs,
        min_quality=0.0,
        jaccard_threshold=0.9,
        max_tokens=64,
        overlap=0,
        lm_model=uni,
        max_nll_per_token=1e9,
        lm_bigram=bi,
        max_bigram_nll=1e9,
    )
    kept = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert 2 in kept, "sub-2-token doc dropped by the lm gates"
    assert kept == {1, 2}
