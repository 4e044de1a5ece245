"""Explicit schemas for every warehouse table.

The reference declares schemas by hand on every write
(``src/survey_metadata_update.py:121-129``,
``src/point_intercepts_update.py:453-475``,
``src/image_metadata_update.py:130-139``,
``src/additional_species_update.py:130-137`` in the reference repo)
and verifies them column-by-column before appends. We centralize the
same contracts as Spark ``StructType``s: schema-on-write everywhere,
never inference, so nullable integer columns stay ``long`` (the
pandas ``Int64`` pain the reference fights disappears natively).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# --- Warehouse fact tables (reference §1.4 canonical schemas) ---

SURVEY_METADATA = _st(
    ("survey_ID", T.StringType()),
    ("grid_point", T.LongType()),
    ("year", T.LongType()),
    ("date", T.DateType()),
    ("survey_sequence", T.StringType()),
    ("surveyor", T.StringType()),
)

POINT_INTERCEPT_VEGETATION = _st(
    ("survey_ID", T.StringType()),
    ("grid_point", T.LongType()),
    ("date", T.DateType()),
    ("year", T.LongType()),
    ("transect_point", T.StringType()),
    ("height_intercept_1", T.DoubleType()),
    ("intercept_1", T.LongType()),
    ("intercept_2", T.LongType()),
    ("intercept_3", T.LongType()),
    ("intercept_4", T.LongType()),
)

POINT_INTERCEPT_GROUND = _st(
    ("survey_ID", T.StringType()),
    ("grid_point", T.LongType()),
    ("date", T.DateType()),
    ("year", T.LongType()),
    ("transect_point", T.StringType()),
    ("intercept_1", T.LongType()),
    ("intercept_ground_code", T.StringType()),
)

ADDITIONAL_SPECIES = _st(
    ("survey_ID", T.StringType()),
    ("grid_point", T.LongType()),
    ("date", T.DateType()),
    ("year", T.LongType()),
    ("key_plant_species", T.LongType()),
)

IMAGE_METADATA = _st(
    ("image_ID", T.StringType()),
    ("image_url", T.StringType()),
    ("survey_ID", T.StringType()),
    ("date", T.DateType()),
    ("year", T.LongType()),
    ("grid_point", T.LongType()),
    ("image_direction", T.StringType()),
)

SPECIES_METADATA = _st(
    ("key_plant_species", T.LongType()),
    ("key_plant_code", T.StringType()),
    ("plant_name_sci", T.StringType()),
    ("plant_name_syn", T.StringType()),
    ("plant_name_common", T.StringType()),
    ("plant_name_family", T.StringType()),
    ("plant_native_status", T.StringType()),
    ("plant_life_cycle", T.StringType()),
    ("plant_life_form", T.StringType()),
)

GROUND_COVER_METADATA = _st(
    ("intercept_ground_code", T.StringType()),
    ("ground_group", T.StringType()),
)

LOCATION_POSITION_CLASSIFICATION = _st(
    ("grid_point", T.LongType()),
    ("lat", T.DoubleType()),
    ("long", T.DoubleType()),
    ("aspect_mean_deg", T.DoubleType()),
    ("aspect_direction", T.StringType()),
    ("aspect_northness", T.DoubleType()),
    ("aspect_eastness", T.DoubleType()),
    ("elevation_mean_m", T.DoubleType()),
    ("slope_mean_deg", T.DoubleType()),
    ("cover_type_2016_gridVeg", T.StringType()),
    ("biomass_habitat_type", T.StringType()),
    ("type1_biome", T.StringType()),
    ("type2_vegetation_community", T.StringType()),
    ("type3_vegetation_indicators", T.StringType()),
    ("type4_indicators_history", T.StringType()),
    ("mgmt_unit_habitat", T.StringType()),
)

FOLIAR_COVER_ALL = _st(
    ("survey_ID", T.StringType()),
    ("grid_point", T.LongType()),
    ("year", T.LongType()),
    ("key_plant_species", T.LongType()),
    ("key_plant_code", T.StringType()),
    ("plant_native_status", T.StringType()),
    ("plant_life_cycle", T.StringType()),
    ("plant_life_form", T.StringType()),
    ("intercepts_pct", T.DoubleType()),
)

# Derived summary tables the wrangle pipelines produce.
GROUND_COVER_INTERCEPTS = _st(
    ("survey_ID", T.StringType()),
    ("year", T.LongType()),
    ("survey_sequence", T.StringType()),
    ("grid_point", T.LongType()),
    ("intercept_ground_code", T.StringType()),
    ("ground_group", T.StringType()),
    ("intercepts_pct", T.DoubleType()),
)

PLANT_FUNCTIONAL_GROUPS = _st(
    ("survey_ID", T.StringType()),
    ("year", T.LongType()),
    ("survey_sequence", T.StringType()),
    ("grid_point", T.LongType()),
    ("plant_native_status", T.StringType()),
    ("plant_life_cycle", T.StringType()),
    ("plant_life_form", T.StringType()),
    ("detection_rate", T.DoubleType()),
)

SPECIES_RICHNESS = _st(
    ("survey_ID", T.StringType()),
    ("grid_point", T.LongType()),
    ("year", T.LongType()),
    ("key_plant_species", T.LongType()),
    ("detection_type", T.StringType()),
)

WAREHOUSE_SCHEMAS: dict[str, T.StructType] = {
    "gridVeg_survey_metadata": SURVEY_METADATA,
    "gridVeg_point_intercept_vegetation": POINT_INTERCEPT_VEGETATION,
    "gridVeg_point_intercept_ground": POINT_INTERCEPT_GROUND,
    "gridVeg_additional_species": ADDITIONAL_SPECIES,
    "gridVeg_image_metadata": IMAGE_METADATA,
    "vegetation_species_metadata": SPECIES_METADATA,
    "gridVeg_ground_cover_metadata": GROUND_COVER_METADATA,
    "location_position_classification": LOCATION_POSITION_CLASSIFICATION,
    "gridVeg_foliar_cover_all": FOLIAR_COVER_ALL,
    "gridVeg_groundCover_intercepts": GROUND_COVER_INTERCEPTS,
    "gridVeg_plant_functional_groups": PLANT_FUNCTIONAL_GROUPS,
    "gridVeg_species_richness": SPECIES_RICHNESS,
}

# The full 18-code ground-cover domain and its 7 groups (reference
# notebooks/gridVeg_groundCover_intercepts_WRANGLE.ipynb:400-418).
GROUND_COVER_DOMAIN: list[tuple[str, str]] = [
    ("BG", "inorganic"),
    ("G", "inorganic"),
    ("OTHER", "inorganic"),
    ("R", "inorganic"),
    ("BV", "vas_plant"),
    ("L", "litter"),
    ("LIC", "lichen"),
    ("M", "nonvas_plant"),
    ("M/L", "nonvas_plant"),
    ("SC", "dung"),
    ("SD", "dung"),
    ("SE", "dung"),
    ("SH", "dung"),
    ("SU", "dung"),
    ("WDL", "woody"),
    ("WDS", "woody"),
    ("WDSTUMP", "woody"),
    ("WDT", "woody"),
]

# --- Raw FileMaker-export CSV schemas (pre-transform; §2 S1/P1) ---
# All string: the cleaning layer owns null-sentinel replacement and
# typed casts, mirroring the reference's read-then-coerce flow
# (src/point_intercepts_update.py:107-130).

SURVEY_METADATA_SOURCE_COLUMNS = {
    "__kp_Survey": "survey_ID",
    "_kf_Site": "grid_point",
    "SurveyYear": "year",
    "SurveyDate": "date",
    "Surveyor1": "surveyor",
}

POINT_INTERCEPTS_SOURCE_COLUMNS = {
    "Survey Data::__kp_Survey": "survey_ID",
    "Survey Data::_kf_Site": "grid_point",
    "Survey Data::SurveyDate": "date",
    "Survey Data::SurveyYear": "year",
    "PointTrans": "transect_point",
    "Height": "height_intercept_1",
    "GroundCover": "intercept_ground_code",
    "_kf_Hit1_serial": "intercept_1",
    "_kf_Hit2_serial": "intercept_2",
    "_kf_Hit3_serial": "intercept_3",
    "_kf_Hit4_serial": "intercept_4",
}

ADDITIONAL_SPECIES_SOURCE_COLUMNS = {
    "Survey Data::__kp_Survey": "survey_ID",
    "Survey Data::_kf_Site": "grid_point",
    "Survey Data::SurveyDate": "date",
    "Survey Data::SurveyYear": "year",
    "_kf_Species_serial": "key_plant_species",
}

IMAGE_METADATA_SOURCE_COLUMNS = {
    "__kp_Photos": "image_ID",
    "Survey Data::__kp_Survey": "survey_ID",
    "Survey Data::SurveyDate": "date",
    "Survey Data::SurveyYear": "year",
    "Survey Data::_kf_Site": "grid_point",
    "Direction": "image_direction",
}

SPECIES_METADATA_SOURCE_COLUMNS = {
    "__kp_PlantMetadata": "key_plant_species",
    "__kp_PlantCode": "key_plant_code",
    "NameScientific": "plant_name_sci",
    "NameSynonym": "plant_name_syn",
    "NameCommon": "plant_name_common",
    "NameFamily": "plant_name_family",
    "NativeStatus": "plant_native_status",
    "LifeCycle": "plant_life_cycle",
    "LifeForm": "plant_life_form",
}

# --- Driver synthetic testdata tables (/root/testdata/sf*/) ---

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions safe to broadcast at any scale factor: at 100 TB
# (TPC-H-ish scaling) region/nation stay constant-size and supplier/
# part/customer grow but the *filtered* dims we broadcast are bounded.
BROADCAST_TABLES = ("region", "nation")


def schema_diff(actual: T.StructType, expected: T.StructType) -> list[str]:
    """Column/type diff between two schemas (reference verifies
    expected-vs-actual column sets before every append:
    notebooks/update_plant_species_metadata.ipynb:331-344,
    notebooks/append_csv_to_bq.ipynb:316-323)."""
    problems: list[str] = []
    a = {f.name: f.dataType for f in actual.fields}
    e = {f.name: f.dataType for f in expected.fields}
    for name in e.keys() - a.keys():
        problems.append(f"missing column: {name}")
    for name in a.keys() - e.keys():
        problems.append(f"unexpected column: {name}")
    for name in a.keys() & e.keys():
        if a[name] != e[name]:
            problems.append(f"type mismatch {name}: {a[name]} != {e[name]}")
    return sorted(problems)
