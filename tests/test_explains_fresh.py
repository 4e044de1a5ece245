"""EXPLAINS.md freshness guard (r8 VERDICT: a stale digest file is
worse than none — it is the perf-attribution tool). A plan-bearing
change to any of the sampled queries without a digest regeneration
(`python tools/explain_digest.py`) fails here, binding the refresh to
plan-touching commits. Sampled queries are the cheap ones so the
guard costs seconds, not a sweep."""

from __future__ import annotations

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"
SAMPLE = [
    "ingest_transform_rename",
    "date_repair_from_dim",
    "group_multiples_having",
    "window_partition_count",
    "multi_way_join_enrich",
    "lineitem_flag_profile",
]


def _recorded_hashes() -> dict[str, str]:
    out = {}
    with open(os.path.join(REPO, "EXPLAINS.md")) as fh:
        for line in fh:
            m = re.match(r"\| (\w+) \|.*`([0-9a-f]{12})` \|", line)
            if m:
                out[m.group(1)] = m.group(2)
    return out


def test_explains_md_matches_live_plans(spark):
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from explain_digest import digest

    from mpg_data_warehouse_spark.plans.driver_queries import QUERIES

    recorded = _recorded_hashes()
    stale = []
    # plan text embeds the shuffle-partition count AND truncates scan
    # metadata at maxMetadataStringLength (where the cut falls depends
    # on expression-id width, i.e. session age): capture under the
    # digest tool's settings, then restore
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_meta = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        for name in SAMPLE:
            assert name in recorded, f"{name} missing from EXPLAINS.md"
            fn = getattr(QUERIES[name], "__wrapped__", QUERIES[name])
            plan = (
                fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
            )
            _, h = digest(plan)
            if h != recorded[name]:
                stale.append(
                    f"{name}: live {h} != recorded {recorded[name]}"
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.maxMetadataStringLength", prev_meta)
    assert not stale, (
        "EXPLAINS.md is stale — regenerate with "
        "`python tools/explain_digest.py`:\n" + "\n".join(stale)
    )
