"""Sources: CSV encodings + schema-on-read, cache-through reads,
writers round trips, catalog ops (reference §2 S1-S8, S12-S15)."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import types as T

from mpg_data_warehouse_spark.sources import catalog as C
from mpg_data_warehouse_spark.sources.readers import (
    cached_or_compute,
    read_csv,
)
from mpg_data_warehouse_spark.sources.writers import (
    backup_csv,
    write_append,
    write_single_csv,
)

SF = "/root/testdata/sf0.001"


def test_read_csv_latin1_and_schema(spark, tmp_path):
    """S2: latin-1 FileMaker exports with accented characters must
    survive, and the declared schema must win over inference."""
    p = str(tmp_path / "latin.csv")
    with open(p, "w", encoding="latin-1") as f:
        f.write("survey_ID,grid_point,surveyor\n")
        f.write("a1,5,Jos\xe9\n")
        f.write("a2,NA,\n")  # NA → null long, "" → null string
    schema = T.StructType(
        [
            T.StructField("survey_ID", T.StringType()),
            T.StructField("grid_point", T.LongType()),
            T.StructField("surveyor", T.StringType()),
        ]
    )
    df = read_csv(spark, p, schema=schema, encoding="ISO-8859-1")
    rows = {r.survey_ID: r for r in df.collect()}
    assert df.schema == schema
    assert rows["a1"].surveyor == "José"
    assert rows["a2"].grid_point is None and rows["a2"].surveyor is None


def test_cached_or_compute_round_trip(spark, tmp_path):
    """S15: first call computes and persists, second call reads the
    interim parquet instead of recomputing."""
    cache = str(tmp_path / "interim")
    calls = []

    def compute():
        calls.append(1)
        return spark.createDataFrame([Row(a=1), Row(a=2)])

    d1 = cached_or_compute(spark, cache, compute)
    d2 = cached_or_compute(spark, cache, compute)
    assert d1.count() == 2 and d2.count() == 2
    assert len(calls) == 1


def test_write_append_and_backup(spark, tmp_path):
    table = str(tmp_path / "t")
    backup = str(tmp_path / "backup")
    spark.createDataFrame([Row(k=1, v="x")]).write.parquet(table)
    write_append(spark.createDataFrame([Row(k=2, v="y")]), table)
    assert spark.read.parquet(table).count() == 2
    n = backup_csv(spark, table, backup)
    assert n == 2
    assert spark.read.option("header", "true").csv(backup).count() == 2


def test_write_single_csv(spark, tmp_path):
    out = str(tmp_path / "single")
    write_single_csv(spark.range(5).toDF("n"), out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1  # S14 single-file parity (coalesce(1))


def test_catalog_register_list_describe(spark):
    got = C.register_sf_dir(spark, SF)
    assert "lineitem" in got and "documents" in got
    listed = C.list_tables(spark)
    assert set(got) <= set(listed)
    desc = C.describe_table(spark, "region")
    names = [c[0] for c in desc]
    assert names == ["r_regionkey", "r_name"]
    assert C.row_count(spark, f"{SF}/region.parquet") == 5


def test_schema_matches_gate(spark):
    from mpg_data_warehouse_spark import schemas as SCH
    from mpg_data_warehouse_spark.fixtures import survey_metadata

    df = survey_metadata(spark, n_surveys=3)
    assert C.schema_matches(df, SCH.SURVEY_METADATA)
    assert not C.schema_matches(df.drop("surveyor"), SCH.SURVEY_METADATA)


def test_read_csv_fallback_to_latin1(spark, tmp_path):
    from mpg_data_warehouse_spark.sources.readers import read_csv_with_fallback

    p = str(tmp_path / "l1.csv")
    with open(p, "w", encoding="latin-1") as f:
        f.write("name\nJos\xe9\nRen\xe9e\n")
    df = read_csv_with_fallback(spark, p)
    got = {r.name for r in df.collect()}
    assert got == {"José", "Renée"}  # latin-1 fallback decoded cleanly


def test_read_csv_fallback_probe_is_bounded(spark, tmp_path):
    """The encoding probe reads ``probe_rows`` rows, not the file: a
    large file whose non-UTF-8 bytes sit in the FIRST rows must still
    trigger the latin-1 fallback with a tiny probe — proving the
    decision is made from the bounded prefix, never a full scan."""
    from mpg_data_warehouse_spark.sources.readers import read_csv_with_fallback

    p = str(tmp_path / "big_l1.csv")
    with open(p, "w", encoding="latin-1") as f:
        f.write("name\nJos\xe9\n")  # bad byte for UTF-8, row 1
        for i in range(50_000):  # ASCII tail the probe must NOT need
            f.write(f"row{i}\n")
    df = read_csv_with_fallback(spark, p, probe_rows=10)
    assert df.count() == 50_001
    assert df.limit(1).collect()[0].name == "José"


def test_read_csv_fallback_prefers_utf8(spark, tmp_path):
    from mpg_data_warehouse_spark.sources.readers import read_csv_with_fallback

    p = str(tmp_path / "u8.csv")
    with open(p, "w", encoding="utf-8") as f:
        f.write("name\nJosé\n")
    df = read_csv_with_fallback(spark, p)
    assert [r.name for r in df.collect()] == ["José"]


def test_compact_table_reduces_files_preserves_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.sources.writers import compact_table, file_stats

    path = str(tmp_path / "frag")
    src = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    src.repartition(37).write.parquet(path)
    assert file_stats(spark.read.parquet(path)).count() == 37
    n = compact_table(spark, path, target_files=4)
    assert n == 10000
    back = spark.read.parquet(path)
    assert file_stats(back).count() == 4
    assert back.agg(F.sum("v")).first()[0] == src.agg(F.sum("v")).first()[0]


def test_write_clustered_files_have_disjoint_ranges(spark, tmp_path):
    """Range clustering must give each file a disjoint key range with
    tight parquet footer stats — the property file skipping relies on."""
    import glob

    import pyarrow.parquet as pq

    from mpg_data_warehouse_spark.sources.writers import write_clustered

    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    path = str(tmp_path / "clustered")
    write_clustered(li, path, ["l_shipdate"], partitions=8)

    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("l_shipdate")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 8
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (touching at boundaries allowed)
    # row preservation
    assert spark.read.parquet(path).count() == li.count()


def test_catalog_database_external_tables(spark):
    """SURVEY §1.3: an sf-dir exposed as a catalog DATABASE of
    external parquet tables — `spark.table("db.t")` resolves without
    temp views, repeated registration is idempotent, and DESCRIBE
    TABLE serves schema from metadata."""
    db = C.register_sf_database(spark, SF, tables=("nation", "region"))
    assert db == C.register_sf_database(spark, SF, tables=("nation", "region"))
    assert {"nation", "region"} <= {
        t.name for t in spark.catalog.listTables(db)
    }
    nation = spark.table(f"{db}.nation")
    assert nation.count() == 25
    desc = {
        r.col_name: r.data_type
        for r in C.describe_table_sql(spark, f"{db}.region").collect()
    }
    assert desc["r_regionkey"] == "int" and desc["r_name"] == "string"


def test_save_as_table_round_trip(spark, tmp_path):
    """saveAsTable → spark.table round-trip on an external path:
    catalog holds metadata, data lands where we said, and overwrite
    mode replaces content."""
    C.create_database(spark, "ct_test", str(tmp_path / "db"))
    src = spark.range(0, 100).withColumnRenamed("id", "k")
    C.save_as_table(src, "ct_test.t1", path=str(tmp_path / "t1"))
    assert spark.table("ct_test.t1").count() == 100
    C.save_as_table(
        spark.range(0, 7).withColumnRenamed("id", "k"), "ct_test.t1"
    )
    assert spark.table("ct_test.t1").count() == 7
    assert os.path.exists(str(tmp_path / "t1"))
    spark.sql("DROP TABLE ct_test.t1")
    spark.sql("DROP DATABASE ct_test")


def test_write_zordered_tightens_both_columns(spark, tmp_path):
    """Z-order clustering must tighten per-file min/max footer ranges
    on BOTH dimensions (vs the global range), where single-column
    clustering only serves one — the property 2-D file skipping
    relies on."""
    import glob

    import pyarrow.parquet as pq

    from mpg_data_warehouse_spark.sources.writers import write_zordered

    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    path = str(tmp_path / "zordered")
    write_zordered(li, path, "l_orderkey", "l_partkey", partitions=16)

    def avg_file_span(col):
        spans, glo, ghi = [], None, None
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append(max(maxs) - min(mins))
            glo = min(mins) if glo is None else min(glo, min(mins))
            ghi = max(maxs) if ghi is None else max(ghi, max(maxs))
        return (sum(spans) / len(spans)) / (ghi - glo)

    # each file should cover well under the full range in BOTH dims
    assert avg_file_span("l_orderkey") < 0.6
    assert avg_file_span("l_partkey") < 0.6
    out = spark.read.parquet(path)
    assert out.count() == li.count()
    assert set(out.columns) == {"l_orderkey", "l_partkey", "l_quantity"}


def test_read_csv_with_quarantine_splits_bad_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from mpg_data_warehouse_spark.sources.readers import read_csv_with_quarantine

    p = str(tmp_path / "dirty.csv")
    with open(p, "w") as f:
        f.write("k,v\n1,10\n2,not_a_number\n3,30\nbroken_line_only\n4,40\n")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    good, bad = read_csv_with_quarantine(spark, p, schema)
    assert good.columns == ["k", "v"]
    assert {(r.k, r.v) for r in good.collect()} == {(1, 10), (3, 30), (4, 40)}
    raw = {r.raw_line for r in bad.collect()}
    assert raw == {"2,not_a_number", "broken_line_only"}


def test_read_csv_with_quarantine_clean_file_empty_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from mpg_data_warehouse_spark.sources.readers import read_csv_with_quarantine

    p = str(tmp_path / "clean.csv")
    with open(p, "w") as f:
        f.write("k,v\n1,10\n2,20\n")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    good, bad = read_csv_with_quarantine(spark, p, schema)
    assert good.count() == 2
    assert bad.count() == 0


def test_convert_table_roundtrip_and_swap(spark, tmp_path):
    """tools/convert_table.py: parquet→orc conversion verifies and
    atomically replaces an existing destination; a re-read matches the
    source row for row."""
    import sys

    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    from tools.convert_table import convert_table

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.range(500).withColumn("s", F.concat(F.lit("row"), F.col("id")))
    df.write.parquet(src)
    # pre-existing destination gets swapped, not clobbered mid-write
    spark.range(3).write.orc(dst)

    n = convert_table(spark, src, dst, "parquet", "orc")
    assert n == 500
    back = spark.read.orc(dst)
    assert back.count() == 500
    assert sorted(r.s for r in back.collect()) == sorted(
        r.s for r in df.collect()
    )
    import os

    assert not os.path.exists(dst + "__staging")
    assert not os.path.exists(dst + "__old")


def test_convert_table_to_jsonl_counts(spark, tmp_path):
    import sys

    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    from tools.convert_table import convert_table

    src = str(tmp_path / "psrc")
    dst = str(tmp_path / "jdst")
    spark.range(100).withColumn("s", F.lit("x")).write.parquet(src)
    assert convert_table(spark, src, dst, "parquet", "jsonl") == 100
    assert spark.read.json(dst).count() == 100


def test_convert_table_csv_with_embedded_newlines(spark, tmp_path):
    """A string value containing a newline is valid quoted CSV output;
    verification must read the staged copy multiLine or the count
    check fails a correct conversion."""
    import os
    import sys

    from pyspark.sql import Row

    sys.path.insert(0, "/root/repo")
    from tools.convert_table import convert_table

    src = str(tmp_path / "nlsrc")
    dst = str(tmp_path / "nldst")
    spark.createDataFrame(
        [Row(id=i, s=f"line one {i}\nline two \"quoted\" {i}") for i in range(50)]
    ).write.parquet(src)
    assert convert_table(spark, src, dst, "parquet", "csv") == 50
    assert not os.path.exists(dst + "__staging")


def test_convert_table_cleans_staging_on_failed_verification(
    spark, tmp_path, monkeypatch
):
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    import tools.convert_table as ct

    src = str(tmp_path / "fsrc")
    dst = str(tmp_path / "fdst")
    spark.range(10).write.parquet(src)

    import pytest
    from pyspark.sql import Observation

    # Force the count-mismatch path by lying about the written count.
    class FakeObs(Observation):
        @property
        def get(self):
            return {"n": -1}

    monkeypatch.setattr("pyspark.sql.Observation", FakeObs)
    with pytest.raises(RuntimeError, match="verification failed"):
        ct.convert_table(spark, src, dst, "parquet", "orc")
    assert not os.path.exists(dst + "__staging")
