"""End-to-end reference pipelines (SURVEY §3 entry points) as lazy
DataFrame compositions over the MPG-shaped schemas.

Where the reference splits work between warehouse SQL pushdown and
local pandas/dplyr (§3.3), these build ONE logical plan and let
Catalyst run the whole thing distributed — aggregation pushdown,
column pruning and filter pushdown all happen automatically. Each
function cites the notebook cells whose semantics it reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.functions.cleaning import rename_columns
from mpg_data_warehouse_spark.functions.dates import survey_sequence
from mpg_data_warehouse_spark.operators.aggregates import multiples
from mpg_data_warehouse_spark.operators.append import AppendResult, anti_join_append
from mpg_data_warehouse_spark.operators.complete import complete_map
from mpg_data_warehouse_spark.operators.repair import fix_dates_from_dim
from mpg_data_warehouse_spark.operators.validate import validate


def ground_cover_pipeline(
    ground: DataFrame,
    survey_meta: DataFrame,
    ground_meta: DataFrame,
    min_year: int = 2022,
    excluded_grid_point: int = 586,
) -> DataFrame:
    """The §3.3 ground-cover wrangle
    (notebooks/gridVeg_groundCover_intercepts_WRANGLE.ipynb:301-762):
    %-cover per (survey, grid_point, code) → complete() the code grid
    → enrich with survey + code-group metadata → recent-years filter.

    Scale: the aggregate is the only fact-sized shuffle; both
    dimension joins broadcast; complete()'s grid build is
    broadcast-side too (see operators.complete)."""
    agg = (
        ground.filter(F.col("intercept_ground_code").isNotNull())
        .groupBy("survey_ID", "grid_point", "intercept_ground_code")
        .agg((F.count("intercept_ground_code") / 2).alias("intercepts_pct"))
    )
    # map-strategy completion (r5): the code domain comes from the
    # CHEAP source — one column-pruned scan of the base fact's
    # non-null codes (identical to the aggregate's observed set by
    # construction) — so the expensive aggregate executes once and
    # the grid is never materialized pre-join (operators.complete_map)
    filled = complete_map(
        agg,
        expand=["intercept_ground_code"],
        nesting=["survey_ID", "grid_point"],
        fill={"intercepts_pct": 0.0},
        expand_values=ground.filter(
            F.col("intercept_ground_code").isNotNull()
        ),
    )
    enriched = (
        filled.join(
            F.broadcast(
                survey_meta.select("survey_ID", "year", "survey_sequence")
            ),
            "survey_ID",
            "left",
        )
        .join(F.broadcast(ground_meta), "intercept_ground_code", "left")
    )
    return enriched.filter(
        (F.col("year") > min_year) & (F.col("grid_point") != excluded_grid_point)
    ).select(
        "survey_ID",
        "year",
        "survey_sequence",
        "grid_point",
        "intercept_ground_code",
        "ground_group",
        "intercepts_pct",
    )


def functional_groups_pipeline(
    foliar: DataFrame,
    survey_meta: DataFrame,
    min_year: int = 2022,
) -> DataFrame:
    """The §3.3 plant-functional-groups wrangle
    (notebooks/gridVeg_plant_functional_groups_WRANGLE.ipynb:371-372,
    508-511, 748-752, 823-828, 951-952): drop the no-vegetation
    sentinel, sum cover per (survey × pfg triple), complete() over
    survey × observed triples (the 1,242 × 23 = 28,556 invariant),
    enrich, filter."""
    pfg = ["plant_native_status", "plant_life_cycle", "plant_life_form"]
    agg = (
        foliar.filter(F.col("key_plant_code") != "NV")
        .groupBy("survey_ID", *pfg)
        .agg(F.sum("intercepts_pct").alias("detection_rate"))
    )
    # map-strategy completion (r5): pfg-triple domain from the base
    # fact (observed combos of the filtered rows == the aggregate's
    # observed combos), aggregate executes once, no grid join
    filled = complete_map(
        agg,
        expand=pfg,
        nesting=["survey_ID"],
        fill={"detection_rate": 0.0},
        expand_values=foliar.filter(F.col("key_plant_code") != "NV"),
    )
    enriched = filled.join(
        F.broadcast(
            survey_meta.select("survey_ID", "year", "survey_sequence", "grid_point")
        ),
        "survey_ID",
        "left",
    )
    return enriched.filter(F.col("year") > min_year).select(
        "survey_ID",
        "year",
        "survey_sequence",
        "grid_point",
        *pfg,
        "detection_rate",
    )


def species_richness_pipeline(
    foliar: DataFrame,
    additional: DataFrame,
    min_year: int = 2022,
) -> DataFrame:
    """The §3.3 species-richness wrangle
    (notebooks/gridVeg_species_richness_WRANGLE.ipynb:185-193,
    225-226, 305-314, 346-348, 688-691, 740-746, 858-862, 937-941,
    1037-1039): point-intercept detections ∪ supplemental detections,
    supplemental pairs already seen ≥2× removed, NV sentinel dropped,
    recent years kept."""
    pi = (
        foliar.filter(F.col("key_plant_species") != F.lit(360))
        .select("survey_ID", "grid_point", "year", "key_plant_species")
        .withColumn("detection_type", F.lit("point_intercept"))
    )
    supp = (
        additional.filter(F.col("key_plant_species").isNotNull())
        .select("survey_ID", "grid_point", "year", "key_plant_species")
        .withColumn("detection_type", F.lit("supplemental"))
    )
    multi = multiples(pi, ["survey_ID", "key_plant_species"]).select(
        "survey_ID", "key_plant_species"
    )
    supp_clean = supp.join(
        multi, ["survey_ID", "key_plant_species"], "left_anti"
    )
    out = pi.unionByName(supp_clean)
    return out.filter(
        (F.col("year") > min_year) & F.col("key_plant_species").isNotNull()
    )


def ingest_pipeline(
    raw: DataFrame,
    table_path: str,
    rename_map: dict[str, str],
    required: list[str],
    key_cols: list[str],
    patterns: dict[str, str] | None = None,
    derive_sequence: bool = True,
) -> AppendResult:
    """The §3.1/§3.2 ingest lifecycle: rename → derive → validate →
    anti-join-append. Raises on validation failure (the reference
    aborts before touching the warehouse —
    src/survey_metadata_update.py:241-243)."""
    df = rename_columns(raw, rename_map)
    if derive_sequence and "year" in df.columns:
        df = df.withColumn("survey_sequence", survey_sequence("year"))
    report = validate(df, required, patterns)
    if not report.ok:
        raise ValueError(
            "validation failed: "
            f"nulls={report.null_violations} "
            f"patterns={report.pattern_violations}"
        )
    return anti_join_append(raw.sparkSession, df, table_path, key_cols)


def point_intercepts_ingest_pipeline(
    raw: DataFrame,
    vegetation_path: str,
    ground_path: str,
) -> tuple[AppendResult, AppendResult]:
    """The §3.1 fan-out ingest (src/point_intercepts_update.py:445-524):
    ONE FileMaker CSV feeds TWO tables — the vegetation transform
    (heights + 4 intercept layers) and the ground transform (ground
    code) — and the ground append only runs if the vegetation append
    succeeded (:522-524). Both keyed on (survey_ID, transect_point);
    both validate the ^[NSEW]\\d{1,2}$ transect format (P10) before
    any write."""
    from mpg_data_warehouse_spark.functions.cleaning import (
        clean_null_sentinels,
        coerce_double,
        coerce_long,
    )
    from mpg_data_warehouse_spark.operators.validate import (
        TRANSECT_POINT_PATTERN,
    )
    from mpg_data_warehouse_spark.schemas import (
        POINT_INTERCEPTS_SOURCE_COLUMNS,
    )

    renamed = rename_columns(raw, POINT_INTERCEPTS_SOURCE_COLUMNS)
    cleaned = renamed
    for c in ("intercept_1", "intercept_2", "intercept_3", "intercept_4"):
        cleaned = cleaned.withColumn(c, coerce_long(clean_null_sentinels(c)))
    cleaned = cleaned.withColumn(
        "height_intercept_1",
        coerce_double(clean_null_sentinels("height_intercept_1")),
    ).withColumn("grid_point", coerce_long("grid_point"))

    veg = cleaned.select(
        "survey_ID", "grid_point", "date", "year", "transect_point",
        "height_intercept_1", "intercept_1", "intercept_2",
        "intercept_3", "intercept_4",
    )
    ground = cleaned.select(
        "survey_ID", "grid_point", "date", "year", "transect_point",
        "intercept_1", "intercept_ground_code",
    )
    keys = ["survey_ID", "transect_point"]
    required = ["survey_ID", "transect_point", "date"]
    patterns = {"transect_point": TRANSECT_POINT_PATTERN}

    for frame, label in ((veg, "vegetation"), (ground, "ground")):
        report = validate(frame, required, patterns)
        if not report.ok:
            raise ValueError(
                f"{label} validation failed: nulls={report.null_violations} "
                f"patterns={report.pattern_violations}"
            )

    spark = raw.sparkSession
    veg_result = anti_join_append(spark, veg, vegetation_path, keys)
    if not veg_result.reconciled:
        raise RuntimeError(
            "vegetation append did not reconcile; ground append skipped "
            f"({veg_result})"
        )
    ground_result = anti_join_append(spark, ground, ground_path, keys)
    return veg_result, ground_result


IMAGE_RENAME_MAP = {
    "Image::__kp_ID": "image_ID",
    "Image::_kf_Survey": "survey_ID",
    "Image::Date": "date",
    "Image::Year": "year",
    "Image::GridPoint": "grid_point",
    "Image::Direction": "image_direction",
}

IMAGE_URL_BASE = "https://storage.cloud.google.com/gridveg-reference-images/"


def image_ingest_pipeline(
    raw: DataFrame,
    table_path: str,
    url_base: str = IMAGE_URL_BASE,
) -> AppendResult:
    """The image-metadata ingest (§3.2 variant,
    notebooks/update_gridVeg_image_metadata.ipynb): rename → trim the
    invisible-whitespace image_direction defect (:416-418, F7) →
    derive image_url from the id (:447-450, F8) → validate → anti-join
    append keyed on image_ID (:1098-1142, J6)."""
    from mpg_data_warehouse_spark.functions.cleaning import image_url

    df = (
        rename_columns(raw, IMAGE_RENAME_MAP)
        .withColumn("image_direction", F.trim(F.col("image_direction")))
        .withColumn("image_url", image_url(F.col("image_ID"), url_base))
        .select(
            "image_ID", "image_url", "survey_ID", "date", "year",
            "grid_point", "image_direction",
        )
    )
    report = validate(df, required=["image_ID", "survey_ID", "date"])
    if not report.ok:
        raise ValueError(f"validation failed: {report.null_violations}")
    return anti_join_append(raw.sparkSession, df, table_path, ["image_ID"])


def date_repair_pipeline(
    fact: DataFrame, survey_meta: DataFrame
) -> DataFrame:
    """The §2 J5 repair: replace every fact date from the survey
    dimension and re-derive year (src/fix_gridveg_dates.py:85-133)."""
    return fix_dates_from_dim(fact, survey_meta)


def _obs(df: DataFrame, funnel: dict | None, stage: str) -> DataFrame:
    """Attach the funnel's Observation for ``stage`` (if provided) —
    per-stage attrition counters materialize as a side effect of the
    caller's ONE action (operators.observability), never as extra
    count() jobs."""
    if funnel and stage in funnel:
        from mpg_data_warehouse_spark.operators.observability import (
            observe_stage,
        )

        return observe_stage(df, funnel[stage])
    return df


def curate_corpus_pipeline(
    docs: DataFrame,
    normalize: bool = True,
    min_quality: float = 0.5,
    max_dup_line_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    jaccard_threshold: float = 0.5,
    max_tokens: int = 64,
    overlap: int = 8,
    target_tokens_per_source: float | None = None,
    max_line_df: int | None = None,
    lm_model: tuple[DataFrame, float] | None = None,
    max_nll_per_token: float | None = None,
    lm_bigram: tuple[DataFrame, DataFrame, float] | None = None,
    max_bigram_nll: float | None = None,
    mixture_temperature: float | None = None,
    mixture_target_total: float | None = None,
    strip_spans_tokens: int | None = None,
    eval_set: DataFrame | None = None,
    decontaminate_shingle_n: int = 13,
    classifier: tuple[DataFrame, float] | None = None,
    min_classifier_p: float | None = None,
    max_docs_per_source: int | None = None,
    dsir_target: DataFrame | None = None,
    dsir_n: int | None = None,
    funnel: dict | None = None,
    html_col: str | None = None,
    html_extract_kwargs: dict | None = None,
    vocab=None,
    vocab_max_piece_len: int | None = None,
) -> DataFrame:
    """End-to-end training-corpus curation, composing the engine's
    LLM-pipeline operators into one lazy plan:

        [optional HTML→text extraction (``html_col`` — jusText-style
        block filter, operators/html.py; web corpora enter here)] →
        unicode/whitespace normalization (default on — curly-quote /
        NBSP / zero-width variants of identical text must hash
        identically or every downstream dedup stage misses them) →
        [optional line-level boilerplate strip] → quality filter →
        [optional Gopher repetition gates (``max_dup_line_frac`` /
        ``max_top_bigram_frac`` — in-row predicates, zero Exchange)] →
        [optional trained-classifier gate (``classifier`` NB weights +
        ``min_classifier_p``)] → [optional unigram-LM perplexity
        gate] → [optional eval-set decontamination (``eval_set``,
        GPT-3 n-gram recipe)] → exact dedup (keep canonical) →
        near-dup retention (MinHash+LSH → verify → connected
        components, keep one per cluster) → [optional passage-level
        duplicate-span strip (``strip_spans_tokens``)] → [optional
        per-source doc cap (``max_docs_per_source``)] → [optional
        DSIR target-matched selection (``dsir_target`` +
        ``dsir_n``)] → [optional per-source token-budget rebalance OR
        temperature-flattened mixture sample] → sequence packing

    Output: packed chunks (doc_id, chunk_id, chunk_text, n_tokens)
    plus the surviving doc's source. Every stage is individually
    oracle-checked by its own contract query; this composition is the
    production shape — one job, no intermediate materialization
    except the cached shingle table inside the dedup stage.

    ``max_line_df`` enables the C4-style boilerplate pass FIRST:
    shared nav/footer lines would otherwise both depress quality
    scores and create spurious near-dup pairs downstream.

    ``lm_bigram`` + ``max_bigram_nll`` add the word-ORDER-sensitive
    fluency gate on top: pass a pre-trained ``text.bigram_lm`` triple
    (bi_model, uni_model, p_oov); shuffled/templated text the
    order-invariant unigram gate passes is dropped here.

    ``lm_model`` + ``max_nll_per_token`` enable the CCNet-style
    perplexity gate: pass a pre-trained ``text.unigram_lm`` (the model
    is trained OFFLINE on a reference corpus, exactly as CCNet uses a
    pre-trained KenLM — keeping it an input keeps this plan fully
    lazy) and docs scoring above the nats-per-token cap are dropped.
    The model join is broadcast (vocab-capped by construction).

    ``funnel``: optional ``{stage: Observation}`` map (build with
    ``observability.stage_metrics([...])``; stages: ``quality``,
    ``repetition``, ``classifier``, ``lm``, ``lm_bigram``,
    ``decontaminated``, ``exact_dedup``, ``near_dedup``) —
    per-gate survivor counts arrive with the job's single action, so
    the curation funnel ("how many docs survived each gate?") costs
    zero extra passes.

    ``mixture_temperature`` + ``mixture_target_total`` select the
    temperature-flattened mixture (T5/PaLM recipe) instead of the
    fixed per-source budget; the two rebalance modes are mutually
    exclusive.

    ``vocab`` (a piece list or one-column DataFrame, e.g. the vocab
    ``tokenize.learn_bpe_vocab`` returns) switches BOTH rebalance
    modes' token accounting from whitespace words to SUBWORD tokens
    (``tokenize.subword_token_count``) — the unit a training run
    actually budgets in. ``vocab_max_piece_len`` sizes the greedy
    scanner; for a list vocab it defaults to the longest piece's
    match length (a learned vocab can exceed the tokenizer's default
    16). Sequence packing stays word-window based — chunk windows
    are positional, only the BUDGET unit changes.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from mpg_data_warehouse_spark.operators.chunking import pack_sequences
    from mpg_data_warehouse_spark.operators.dedup import (
        content_hash,
        minhash_dedup_pairs,
        retain_representatives,
    )
    from mpg_data_warehouse_spark.operators.sampling import (
        budget_rebalance_sample,
        temperature_mixture_sample,
    )
    from mpg_data_warehouse_spark.operators.text import (
        doc_logprob_score,
        quality_score,
        strip_boilerplate_lines,
        tokens,
    )

    if target_tokens_per_source is not None and mixture_temperature is not None:
        raise ValueError(
            "target_tokens_per_source and mixture_temperature are "
            "mutually exclusive rebalance modes"
        )

    def _with_token_weight(df: DataFrame) -> DataFrame:
        """Append ``_n_tok``: subword tokens when a vocab is supplied
        (the budget unit of a training run), whitespace words
        otherwise."""
        if vocab is not None:
            from mpg_data_warehouse_spark.operators.tokenize import (
                _match_len,
                subword_token_count,
            )

            kw: dict = {}
            if vocab_max_piece_len is not None:
                kw["max_piece_len"] = vocab_max_piece_len
            elif not isinstance(vocab, DataFrame):
                # learned vocabs can carry pieces past the default 16
                kw["max_piece_len"] = max(
                    16, max(_match_len(str(p)) for p in vocab)
                )
            return subword_token_count(
                df, vocab, id_col="doc_id", text_col="text",
                out_col="_n_tok", **kw,
            )
        toks = F.filter(tokens("text"), lambda t: t != F.lit(""))
        return df.withColumn("_n_tok", F.size(toks).cast("long"))

    if html_col is not None:
        # web corpora arrive as HTML: extract content text (block
        # segmentation + link/stopword-density boilerplate filter)
        # BEFORE any text-grain stage — markup would otherwise poison
        # quality scores, shingles, and token budgets alike
        from mpg_data_warehouse_spark.operators.html import (
            extract_html_text,
        )

        docs = extract_html_text(
            docs, html_col=html_col, out_col="text",
            **(html_extract_kwargs or {}),
        ).drop("n_blocks_kept", "n_blocks_total", html_col)

    if normalize:
        from mpg_data_warehouse_spark.operators.text import normalize_text

        docs = normalize_text(docs)
    if max_line_df is not None:
        docs = strip_boilerplate_lines(docs, max_line_df).drop(
            "n_lines_removed"
        )
    scored = docs.withColumn("_q", quality_score("text"))
    kept = _obs(
        scored.filter(F.col("_q") >= min_quality).drop("_q"),
        funnel,
        "quality",
    )

    if max_dup_line_frac is not None or max_top_bigram_frac is not None:
        # Gopher-rule repetition gates (Rae et al. 2021 Table A1) —
        # pure in-row predicates (operators/text.py), zero Exchange:
        # repetitive docs drop BEFORE the expensive dedup stages.
        from mpg_data_warehouse_spark.operators.text import (
            duplicate_line_fraction,
            top_bigram_fraction_from,
            tokens as _ws_tokens,
        )

        cond = F.lit(True)
        if max_dup_line_frac is not None:
            cond = cond & (
                duplicate_line_fraction(F.col("text"))
                <= F.lit(max_dup_line_frac)
            )
        if max_top_bigram_frac is not None:
            gated = kept.withColumn("_rt", _ws_tokens("text"))
            cond2 = top_bigram_fraction_from(F.col("_rt")) <= F.lit(
                max_top_bigram_frac
            )
            kept = _obs(
                gated.filter(cond & cond2).drop("_rt"),
                funnel,
                "repetition",
            )
        else:
            kept = _obs(kept.filter(cond), funnel, "repetition")

    if classifier is not None and min_classifier_p is not None:
        # Trained quality gate (NB log-odds weights): broadcast weight
        # join, map-side over the corpus — same stage the curation
        # STREAM applies per micro-batch.
        from mpg_data_warehouse_spark.operators.text import (
            quality_classifier_scores,
        )

        weights, bias = classifier
        liked = quality_classifier_scores(
            kept, weights, bias=bias, threshold=min_classifier_p
        ).filter(F.col("quality_keep"))
        kept = _obs(
            kept.join(liked.select("doc_id"), "doc_id", "left_semi"),
            funnel,
            "classifier",
        )

    if lm_model is not None and max_nll_per_token is not None:
        model, oov_logp = lm_model
        # anti-join on failures (see the lm_bigram gate below): docs
        # with zero tokens are unscoreable and pass the gate
        influent_uni = doc_logprob_score(kept, model, oov_logp).filter(
            F.col("nll_per_token") > max_nll_per_token
        )
        kept = _obs(
            kept.join(
                influent_uni.select("doc_id"), "doc_id", "left_anti"
            ),
            funnel,
            "lm",
        )

    if lm_bigram is not None and max_bigram_nll is not None:
        # Word-ORDER-sensitive fluency gate: the interpolated bigram
        # model (text.bigram_lm) catches shuffled/templated text the
        # order-invariant unigram gate scores as fluent. Same shape:
        # pre-trained model input, broadcast scoring, doc-keyed
        # semi-join back.
        from mpg_data_warehouse_spark.operators.text import (
            doc_logprob_score_bigram,
        )

        bi_model, uni_model, p_oov = lm_bigram
        # ANTI-join on gate FAILURES, not semi-join on passes: docs
        # with fewer than two tokens have no bigram, are absent from
        # the scorer's output, and must PASS (they are not repetitive
        # or influent — a semi-join on passes would silently drop
        # every sub-2-token doc regardless of max_bigram_nll).
        influent = doc_logprob_score_bigram(
            kept, bi_model, uni_model, p_oov
        ).filter(F.col("nll_per_token") > max_bigram_nll)
        kept = _obs(
            kept.join(influent.select("doc_id"), "doc_id", "left_anti"),
            funnel,
            "lm_bigram",
        )

    if eval_set is not None:
        # Benchmark decontamination FIRST among the dedup stages: an
        # eval-tainted doc must not become a near-dup cluster's
        # surviving representative.
        from mpg_data_warehouse_spark.operators.dedup import decontaminate

        kept = _obs(
            decontaminate(kept, eval_set, shingle_n=decontaminate_shingle_n),
            funnel,
            "decontaminated",
        )

    # exact dedup: canonical = min doc_id per content hash
    canon = (
        kept.withColumn("_h", content_hash("text"))
        .withColumn(
            "_rk",
            F.row_number().over(Window.partitionBy("_h").orderBy("doc_id")),
        )
        .filter(F.col("_rk") == 1)
        .drop("_h", "_rk")
    )
    canon = _obs(canon, funnel, "exact_dedup")

    # Materialize the (tiny) pair set before the iterative
    # connected-components stage: CC re-references its edge input every
    # round, and without a lineage cut each round would stack the whole
    # shingle→signature→band→verify pipeline again — plan depth grows
    # multiplicatively and the driver, not the data, becomes the
    # bottleneck. localCheckpoint truncates lineage at executor-storage
    # cost of |pairs| rows (at 100 TB: checkpoint to durable storage).
    pairs = minhash_dedup_pairs(
        canon.select("doc_id", "text"), threshold=jaccard_threshold
    ).select("id_a", "id_b").localCheckpoint()
    survivors = _obs(
        retain_representatives(canon, pairs), funnel, "near_dedup"
    )

    if strip_spans_tokens is not None:
        # Passage-level pass AFTER doc-level dedup: whole-document
        # duplicates are already gone, so what remains is shared
        # boilerplate passages inside otherwise-distinct docs (Lee et
        # al. 2021's ExactSubstr finding). keep_first spares one
        # corpus-wide copy of each passage.
        from mpg_data_warehouse_spark.operators.dedup import (
            strip_duplicate_spans,
        )

        stripped = strip_duplicate_spans(
            survivors.select("doc_id", "text"),
            span_tokens=strip_spans_tokens,
            keep_first=True,
        )
        survivors = survivors.drop("text").join(stripped, "doc_id")

    if max_docs_per_source is not None:
        # Domain caps BEFORE the token-budget shaping: a runaway
        # domain should lose docs to the cap (quality-blind here,
        # keep-earliest deterministic), not distort the mix targets.
        from mpg_data_warehouse_spark.operators.sampling import (
            cap_per_group,
        )

        survivors = _obs(
            cap_per_group(survivors, "source", max_docs_per_source),
            funnel,
            "source_cap",
        )

    if dsir_target is not None and dsir_n is not None:
        # Target-distribution selection (DSIR) replaces heuristic mix
        # shaping when a target corpus exists; it composes after the
        # dedup stages so importance weights never favor duplicates.
        from mpg_data_warehouse_spark.operators.sampling import (
            dsir_resample,
        )

        survivors = _obs(
            dsir_resample(survivors, dsir_target, n=dsir_n).drop(
                "dsir_logw"
            ),
            funnel,
            "dsir",
        )

    if target_tokens_per_source is not None:
        survivors = budget_rebalance_sample(
            _with_token_weight(survivors),
            strata="source",
            key="doc_id",
            weight="_n_tok",
            target_per_stratum=target_tokens_per_source,
        ).drop("_w", "_n_tok")
    elif mixture_temperature is not None:
        if mixture_target_total is None:
            raise ValueError(
                "mixture_temperature requires mixture_target_total"
            )
        survivors = temperature_mixture_sample(
            _with_token_weight(survivors),
            strata="source",
            key="doc_id",
            weight="_n_tok",
            temperature=mixture_temperature,
            target_total=mixture_target_total,
        ).drop("_w", "_n_tok")

    chunks = pack_sequences(
        survivors, "doc_id", "text", max_tokens=max_tokens, overlap=overlap
    )
    return chunks.join(survivors.select("doc_id", "source"), "doc_id")
