"""Deterministic MPG-shaped synthetic tables (FIXTURES.md spec,
derived from the reference's schemas and value domains — SURVEY §1.4).

Seeded ``random.Random`` generators; every call with the same seed
and sizes yields identical frames, so pipeline tests can pin exact
invariants (the reference's own QC checks, SURVEY §5).
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from mpg_data_warehouse_spark import schemas as SCH

# The 18 ground-cover codes and their groups
# (notebooks/gridVeg_groundCover_intercepts_WRANGLE.ipynb:400-418).
GROUND_CODES = {
    "BG": "inorganic", "BV": "vas_plant", "G": "vas_plant", "L": "litter",
    "LIC": "lichen", "M": "nonvas_plant", "M/L": "litter", "OTHER": "inorganic",
    "R": "inorganic", "SC": "inorganic", "SD": "dung", "SE": "inorganic",
    "SH": "vas_plant", "SU": "inorganic", "WDL": "woody", "WDS": "woody",
    "WDSTUMP": "woody", "WDT": "woody",
}

NATIVE_STATUS = ("native", "nonnative", "unknown")
LIFE_CYCLE = ("annual", "perennial", "biennial", "unknown")
LIFE_FORM = ("forb", "graminoid", "shrub", "tree", "succulent", "unknown")
DIRECTIONS = ("North", "East", "South", "West")
NV_SPECIES = 360  # the no-vegetation sentinel (key_plant_code "NV")


def _survey_id(rng: random.Random, i: int) -> str:
    # Mix of short numerics and 8-char UUID prefixes — both occur
    # (gridVeg_species_richness_WRANGLE.ipynb:216).
    if i % 2 == 0:
        return str(400 + i)
    return "".join(rng.choice("0123456789ABCDEF") for _ in range(8))


def survey_metadata(
    spark: SparkSession, n_surveys: int = 60, seed: int = 11
) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n_surveys):
        year = rng.choice(range(2010, 2026))
        date = dt.date(year, rng.choice((6, 7, 8, 9)), rng.randint(1, 28))
        seq = "2011-12" if year in (2011, 2012) else str(year)
        rows.append(
            (
                _survey_id(rng, i),
                rng.choice([586] + list(range(1, 646))),
                year,
                date,
                seq,
                rng.choice(("EAR", "JMM", "KPH", "TSW", "ABC")),
            )
        )
    return spark.createDataFrame(rows, SCH.SURVEY_METADATA)


def point_intercept_ground(
    spark: SparkSession,
    meta: DataFrame,
    points_per_survey: int = 50,
    seed: int = 13,
    null_code_every: int = 997,
) -> DataFrame:
    """Fact rows keyed (survey_ID, transect_point); a sprinkle of NULL
    ground codes for the fix-NA flow (0.01% in the reference)."""
    rng = random.Random(seed)
    codes = list(GROUND_CODES)
    rows = []
    k = 0
    for m in meta.collect():
        for p in range(points_per_survey):
            k += 1
            tp = f"{'NESW'[p % 4]}{p // 4 + 1}"
            code = None if k % null_code_every == 0 else rng.choice(codes)
            rows.append(
                (
                    m.survey_ID,
                    m.grid_point,
                    m.date,
                    m.year,
                    tp,
                    rng.randint(1, 700),
                    code,
                )
            )
    return spark.createDataFrame(rows, SCH.POINT_INTERCEPT_GROUND)


def ground_cover_metadata(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        sorted(GROUND_CODES.items()), SCH.GROUND_COVER_METADATA
    )


def species_metadata(
    spark: SparkSession, n_species: int = 80, seed: int = 17
) -> DataFrame:
    rng = random.Random(seed)
    rows = [
        (
            NV_SPECIES,
            "NV",
            "No vegetation",
            None,
            "none",
            "none",
            "unknown",
            "unknown",
            "unknown",
        )
    ]
    for i in range(1, n_species + 1):
        if i == NV_SPECIES:
            continue
        code = "".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ") for _ in range(6))
        rows.append(
            (
                i,
                code,
                f"Genus species{i}",
                None if rng.random() < 0.6 else f"Syn {i}",
                f"common {i}",
                f"Family{i % 12}",
                rng.choice(NATIVE_STATUS),
                rng.choice(LIFE_CYCLE),
                rng.choice(LIFE_FORM),
            )
        )
    return spark.createDataFrame(rows, SCH.SPECIES_METADATA)


def foliar_cover_all(
    spark: SparkSession,
    meta: DataFrame,
    species: DataFrame,
    per_survey: int = 8,
    seed: int = 19,
) -> DataFrame:
    """The derived foliar-cover view both wrangles read (SURVEY §1.4):
    per-survey per-species percent cover with pfg attributes."""
    rng = random.Random(seed)
    sp = species.collect()
    rows = []
    for m in meta.collect():
        for s in rng.sample(sp, min(per_survey, len(sp))):
            rows.append(
                (
                    m.survey_ID,
                    m.grid_point,
                    m.year,
                    s.key_plant_species,
                    s.key_plant_code,
                    s.plant_native_status,
                    s.plant_life_cycle,
                    s.plant_life_form,
                    rng.choice((0.5, 1.0, 1.5, 2.0, 5.0, 10.0)),
                )
            )
    return spark.createDataFrame(rows, SCH.FOLIAR_COVER_ALL)


def image_metadata_raw(
    spark: SparkSession,
    meta: DataFrame,
    per_survey: int = 2,
    seed: int = 29,
) -> DataFrame:
    """FileMaker-shaped raw image rows (pre-ingest): source headers,
    trailing-whitespace image_direction variants (the invisible-char
    defect the reference fixes with strip() —
    notebooks/update_gridVeg_image_metadata.ipynb:416-418), no
    image_url yet (derived at ingest, :447-450)."""
    rng = random.Random(seed)
    rows = []
    for m in meta.collect():
        for i in range(per_survey):
            img_id = "".join(
                rng.choice("0123456789abcdef") for _ in range(12)
            )
            direction = rng.choice(DIRECTIONS)
            if rng.random() < 0.25:
                direction += " "  # planted trailing whitespace
            rows.append((img_id, m.survey_ID, m.date, m.year, m.grid_point, direction))
    return spark.createDataFrame(
        rows,
        "`Image::__kp_ID` string, `Image::_kf_Survey` string, "
        "`Image::Date` date, `Image::Year` long, "
        "`Image::GridPoint` long, `Image::Direction` string",
    )


def point_intercept_vegetation(
    spark: SparkSession,
    meta: DataFrame,
    points_per_survey: int = 20,
    seed: int = 31,
) -> DataFrame:
    """Vegetation fact rows: layered intercepts with increasing null
    rates by layer (FIXTURES.md: ≈5%/60%/90%/98%), ~20% null
    height."""
    rng = random.Random(seed)
    null_rates = (0.05, 0.60, 0.90, 0.98)
    rows = []
    for m in meta.collect():
        for p in range(points_per_survey):
            tp = f"{'NESW'[p % 4]}{p // 4 + 1}"
            intercepts = [
                None if rng.random() < r else rng.randint(1, 700)
                for r in null_rates
            ]
            height = None if rng.random() < 0.2 else round(rng.uniform(0, 150), 1)
            rows.append(
                (m.survey_ID, m.grid_point, m.date, m.year, tp, height, *intercepts)
            )
    return spark.createDataFrame(rows, SCH.POINT_INTERCEPT_VEGETATION)


def additional_species(
    spark: SparkSession,
    meta: DataFrame,
    per_survey: int = 4,
    seed: int = 23,
    corrupt_dates: bool = False,
) -> DataFrame:
    """Supplemental detections keyed (survey_ID, key_plant_species).
    ``corrupt_dates=True`` plants the DD-MM-YY misparse the repair op
    must fix (docs/gridveg_date_issue.md:13-28): date →
    make_date(2000+day, month, year-2000)."""
    rng = random.Random(seed)
    rows = []
    for m in meta.collect():
        chosen = rng.sample(range(1, 700), per_survey)
        for s in chosen:
            date = m.date
            if corrupt_dates and rng.random() < 0.17:
                date = dt.date(2000 + m.date.day, m.date.month, m.date.year - 2000)
            rows.append((m.survey_ID, m.grid_point, date, date.year, s))
    return spark.createDataFrame(rows, SCH.ADDITIONAL_SPECIES)
