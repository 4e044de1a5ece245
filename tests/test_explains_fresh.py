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


def test_explains_meta_header_fresh():
    """The digest-meta header binds EXPLAINS.md to the generating
    tree: `queries` must equal the live registry size (a registry
    add/remove without regeneration fails), `rows` must equal the
    number of recorded digest rows (internal consistency), and
    `plans-fingerprint` must equal a live sha256 of plans/*.py — so
    ANY plan-file edit without `python tools/explain_digest.py`
    fails, not just edits to the six sampled queries below."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from explain_digest import plans_fingerprint

    from mpg_data_warehouse_spark.plans.driver_queries import QUERIES

    with open(os.path.join(REPO, "EXPLAINS.md")) as fh:
        text = fh.read()
    m = re.search(
        r"<!-- digest-meta queries=(\d+) rows=(\d+) "
        r"plans-fingerprint=([0-9a-f]{16}) -->",
        text,
    )
    assert m, "EXPLAINS.md lacks a digest-meta header — regenerate"
    queries, rows, fp = int(m.group(1)), int(m.group(2)), m.group(3)
    assert queries == len(QUERIES), (
        f"registry has {len(QUERIES)} queries but EXPLAINS.md was "
        f"generated against {queries} — regenerate"
    )
    assert rows == len(_recorded_hashes()), (
        "digest-meta row count disagrees with the table — regenerate"
    )
    live = plans_fingerprint()
    assert fp == live, (
        f"plans/ changed since EXPLAINS.md was generated "
        f"(recorded {fp}, live {live}) — regenerate with "
        "`python tools/explain_digest.py`"
    )


def test_plans_fingerprint_trips_on_any_plan_edit(tmp_path):
    """Demonstrates the guard's sensitivity end-to-end: a byte-exact
    copy of plans/ fingerprints identically, and ONE appended byte to
    ANY plan file — including a comment-only change to a query nobody
    samples — changes the fingerprint, which is what fails
    test_explains_meta_header_fresh until the digest is regenerated."""
    import shutil
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from explain_digest import plans_fingerprint

    src = os.path.join(REPO, "mpg_data_warehouse_spark", "plans")
    copy = str(tmp_path / "plans")
    shutil.copytree(
        src, copy, ignore=shutil.ignore_patterns("__pycache__")
    )
    assert plans_fingerprint(copy) == plans_fingerprint(), (
        "a byte-exact copy must fingerprint identically"
    )
    victim = sorted(
        f for f in os.listdir(copy) if f.endswith(".py")
    )[-1]
    with open(os.path.join(copy, victim), "a") as fh:
        fh.write("\n# one comment byte\n")
    assert plans_fingerprint(copy) != plans_fingerprint(), (
        f"an edit to {victim} did not change the fingerprint"
    )


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
