"""Per-FILE Bloom skipping for txlog point lookups.

The 100 TB point-lookup problem: footer min/max skipping
(``txlog.read_pruned``) is decisive only when the table is CLUSTERED
on the probed column — on any other column every file's [min, max]
straddles the value and nothing prunes. A per-file Bloom filter
answers "this file definitely does not contain v" regardless of
layout (Delta Lake's bloom filter index plays the same role; Bloom,
CACM 1970 — both public).

Design — a maintained SIDECAR TABLE, not a write-path tax:

- ``build_file_blooms`` scans the table ONCE with the engine's
  blocked-bloom column math (`operators/bloom.py`): explode each
  value into k (block, mask) draws, aggregate ``bit_or`` per
  (file, block) — one shuffle of fixed-width rows keyed by the file
  the row physically lives in (``input_file_name()``). The sidecar is
  plain parquet ``(file, block, bits)`` written CLUSTERED BY block
  plus a JSON meta (params + covered files + source version), and is
  installed atomically through the storage backend.
- Maintenance is incremental like the sketch rollups: a refresh
  re-sketches only files added since the stamp and drops rows of
  files no longer live — removals are SAFE here (per-file state dies
  with its file), so unlike ``incremental_sketch_rollup`` no rebuild
  is ever forced.
- ``read_bloom_pruned`` hashes the probe value into its ≤ k
  (block, mask) pairs, joins them (broadcast) against the sidecar —
  clustered by block, so parquet row-group pushdown touches only the
  probed blocks' slices — and keeps a file iff EVERY probe block's
  bits cover the mask. Files the sidecar does not cover yet (added
  after the last refresh) are ALWAYS kept: false negatives stay
  impossible by construction, the invariant pruning must never
  break. The residual ``col == v`` filter still applies inside the
  survivors, so answers are exact at any false-positive rate.

Sizing: FPR ≈ (1 − e^(−k·n/m))^k per file. The default m = 2^17 bits
(16 KiB ≤ 2 Ki block rows) holds ~9 K distinct keys per file at ~1%
FPR with k = 7; at 100 TB with ~10 K-row files the sidecar is ~0.1%
of the data and the probe scans k row-group slices of it instead of
the corpus.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.bloom import _block_masks
from mpg_data_warehouse_spark.sources.storage import (
    get_storage_backend,
    read_json,
    write_json_atomic,
)
from mpg_data_warehouse_spark.sources.txlog import (
    _read_files,
    latest_version,
    snapshot_state,
)

BLOOM_DIR = "_file_blooms"
META_FILE = "_bloom_index_meta.json"
DEFAULT_N_BITS = 1 << 17
DEFAULT_K = 7


def _sidecar(table: str, col: str) -> str:
    return os.path.join(table, BLOOM_DIR, col)


def _rel_file(table: str) -> "F.Column":
    """Strip everything through the table root from
    ``input_file_name()``'s URI, leaving the commit-relative path the
    txlog state keys files by.

    ``input_file_name()`` is PERCENT-ENCODED (a space in a partition
    value arrives as ``%20`` — same fact txlog's ``_uri_to_path``
    unquotes around), so the raw URI must be decoded BEFORE the
    table-root strip or any path containing an encoded character
    never matches and every sidecar row keys by full URI. Decode
    JVM-side with ``url_decode`` after shielding literal ``+`` (a
    legal, unencoded path char that URLDecoder would otherwise turn
    into a space — pre-escaping it to ``%2B`` reproduces Python
    ``unquote`` semantics exactly)."""
    root = re.escape(os.path.abspath(table))
    decoded = F.url_decode(
        F.regexp_replace(F.input_file_name(), r"\+", "%2B")
    )
    return F.regexp_replace(decoded, f"^.*{root}/", "")


def build_file_blooms(
    spark: SparkSession,
    table: str,
    col: str,
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
    seed: int = 0,
) -> int:
    """Create or incrementally refresh the per-file Bloom sidecar for
    ``col``. Only files not yet covered are scanned; rows of files no
    longer live are dropped. Returns the source version the sidecar
    now reflects."""
    if n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    side = _sidecar(table, col)
    meta_path = os.path.join(side, META_FILE)
    state = snapshot_state(table)
    src_head = latest_version(table)
    live = set(state["files"])

    prev = None
    backend = get_storage_backend()
    if backend.exists(meta_path):
        prev = read_json(meta_path)
        if (prev["n_bits"], prev["k"], prev["seed"]) != (n_bits, k, seed):
            prev = None  # parameter change: full rebuild
    covered = set(prev["files"]) if prev else set()
    todo = sorted(live - covered)
    kept = covered & live
    if prev is not None and not todo and kept == covered:
        return prev["src_version"]

    parts = []
    if todo:
        rows = (
            _read_files(spark, table, state, todo)
            .select(F.col(col).alias("_v"))
            .withColumn("file", _rel_file(table))
            .filter(F.col("_v").isNotNull())
        )
        parts.append(
            _block_masks(rows, "_v", n_bits, k, seed)
            .groupBy("file", "_block")
            .agg(F.bit_or("_mask").alias("bits"))
            .select("file", F.col("_block").alias("block"), "bits")
        )
    if prev is not None and kept:
        old = spark.read.parquet(side)
        # semi-join, not isin(): the kept-file list is |files|-sized —
        # an IN expression that long breaks codegen at fleet scale
        kept_df = spark.createDataFrame(
            [(f,) for f in sorted(kept)], "file string"
        )
        parts.append(old.join(F.broadcast(kept_df), "file", "left_semi"))
    if not parts:
        # empty table on first build, or a refresh after every covered
        # file was removed: install an empty (but well-typed) sidecar
        # so probes work and the meta stamp still advances
        parts.append(
            spark.createDataFrame([], "file string, block long, bits long")
        )
    new = parts[0]
    for p in parts[1:]:
        new = new.unionByName(p)
    # cluster by block so a probe's k block values map to a few
    # pushdown-prunable row-group slices of the sidecar
    staged = side + "__staged"
    (
        new.repartitionByRange(8, "block")
        .sortWithinPartitions("block", "file")
        .write.mode("overwrite")
        .parquet(staged)
    )
    # meta rides INSIDE the staged dir (underscore-prefixed: invisible
    # to the parquet reader), so the install swap is atomic for
    # data+meta together — writing it after the swap left a window
    # where a crash destroyed the OLD meta (it lives in the dir the
    # swap retires) before the new one existed, hard-breaking every
    # read_bloom_pruned caller AND hiding the column from
    # refresh_all_blooms, so maintain_table could never self-heal it
    write_json_atomic(
        os.path.join(staged, META_FILE),
        {
            "col": col,
            "n_bits": n_bits,
            "k": k,
            "seed": seed,
            "src_version": src_head,
            "files": sorted(live),
        },
    )
    backend.install_dir(staged, side)
    return src_head


def read_bloom_pruned(
    spark: SparkSession,
    table: str,
    col: str,
    value=None,
    version: int | None = None,
    values: list | None = None,
) -> DataFrame:
    """Point lookup ``col == value`` (or batched ``col IN values``)
    with FILE-level Bloom skipping: files whose sidecar bloom proves
    absence OF EVERY probed value never enter the scan. Files added
    after the last ``build_file_blooms`` refresh are always kept (no
    false negatives, ever); the residual equality/IN filter applies
    inside the survivors, so results are exact. Same answers as
    ``read().where(...)``.

    The IN form probes all values in ONE sidecar pass (a file
    survives if any value's every block-mask is covered) — the shape
    for key-batch lookups (reconciliation worklists, CDC key replays)
    where per-value calls would re-scan the sidecar |values| times."""
    if (value is None) == (values is None):
        raise ValueError("pass exactly one of value / values")
    probes = values if values is not None else [value]
    if not probes:
        raise ValueError("values is empty")
    side = _sidecar(table, col)
    meta_path = os.path.join(side, META_FILE)
    if not get_storage_backend().exists(meta_path):
        raise FileNotFoundError(
            f"no bloom sidecar for {col!r} at {table!r} — run "
            "build_file_blooms first"
        )
    meta = read_json(meta_path)
    state = snapshot_state(table, version)
    live = list(state["files"])
    covered = set(meta["files"])

    # one tiny JVM job derives every probe value's block/mask pairs
    # with the SAME hash draws the build used. The build hashed the
    # column under the TABLE's type, so the probe must be cast to
    # that exact type BEFORE hashing — a Python int 2500 probed
    # against a double column would otherwise render "2500" while
    # the build rendered "2500.0", hash to different bits, and
    # silently prune matching files (a false negative the residual
    # filter would have matched via numeric coercion). Un-castable
    # probes raise rather than prune.
    from pyspark.sql.types import _parse_datatype_string

    col_type = dict(
        (f.name, f.dataType)
        for f in _parse_datatype_string(state["schema"]).fields
    )[col]
    # ship probes as STRINGS (sidesteps createDataFrame inference on
    # mixed int/float lists) and let the JVM cast string → column
    # type — one rendering path for every probe type
    probe_df = spark.createDataFrame(
        [(i, None if v is None else str(v)) for i, v in enumerate(probes)],
        "_pid long, _raw string",
    ).withColumn(
        "_v",
        F.expr(f"try_cast(_raw as {col_type.simpleString()})"),
    )
    bad = probe_df.filter(
        F.col("_v").isNull() & F.col("_raw").isNotNull()
    ).collect()
    if bad:
        raise TypeError(
            f"probe value(s) {[r['_raw'] for r in bad]!r} cannot be cast "
            f"to {col!r}'s type {col_type.simpleString()}"
        )
    pairs = (
        _block_masks(
            probe_df.drop("_raw"),
            "_v",
            meta["n_bits"],
            meta["k"],
            meta["seed"],
        )
        .groupBy("_pid", "_block")
        .agg(F.bit_or("_mask").alias("_mask"))
        .collect()
    )
    n_blocks = {}
    for r in pairs:
        n_blocks[r["_pid"]] = n_blocks.get(r["_pid"], 0) + 1
    pair_df = spark.createDataFrame(
        [(r["_pid"], r["_block"], r["_mask"]) for r in pairs],
        "pid long, block long, _mask long",
    )
    nb_df = spark.createDataFrame(
        [(pid, n) for pid, n in n_blocks.items()], "pid long, _need long"
    )
    sidecar = spark.read.parquet(side)
    hits = (
        sidecar.join(F.broadcast(pair_df), "block")
        .groupBy("file", "pid")
        .agg(
            F.sum(
                (
                    F.col("bits").bitwiseAND(F.col("_mask")) == F.col("_mask")
                ).cast("int")
            ).alias("_ok")
        )
        .join(F.broadcast(nb_df), "pid")
        .filter(F.col("_ok") == F.col("_need"))
        .select("file")
        .distinct()
        .collect()
    )
    maybe = {r["file"] for r in hits}
    keep = [f for f in live if f in maybe or f not in covered]
    df = _read_files(spark, table, state, keep)
    if values is not None:
        if len(values) <= 64:
            return df.where(F.col(col).isin(*values))
        # big key batches (CDC replays, reconciliation worklists):
        # a |values|-long IN expression breaks whole-stage codegen at
        # fleet scale — the same rule the build path applies to its
        # kept-file list. The typed probe frame already exists;
        # broadcast-semi-join the survivors against it. Residual
        # semantics match isin (null probes never match an equi-join,
        # and isin's null contributes no TRUE either).
        probe_vals = probe_df.select(F.col("_v").alias(col)).where(
            F.col(col).isNotNull()
        )
        return df.join(F.broadcast(probe_vals), on=col, how="left_semi")
    return df.where(F.col(col) == F.lit(value))


def bloom_sidecar_columns(table: str) -> list[str]:
    """Columns with an installed Bloom sidecar under ``table`` —
    discovered from the sidecar layout itself (one dir per column
    under ``_file_blooms/``, each self-describing via its meta).
    Discovery goes through the storage backend's recursive listing
    (the one primitive every backend has), filtering for meta files
    one level under the bloom root."""
    backend = get_storage_backend()
    root = os.path.join(table, BLOOM_DIR)
    if not backend.exists(root):
        return []
    cols = set()
    for p in backend.list_files(root):
        rel = os.path.relpath(p, root)
        parts = rel.split(os.sep)
        if len(parts) == 2 and parts[1] == META_FILE:
            cols.add(parts[0])
    return sorted(cols)


def refresh_all_blooms(spark: SparkSession, table: str) -> dict[str, int]:
    """Incrementally refresh EVERY Bloom sidecar the table carries
    (each under its own recorded n_bits/k/seed), returning
    {column: source version covered}.

    The operational gap this closes: ``compact()`` / MERGE rewrite
    live rows into fresh files the sidecars do not cover, and the
    no-false-negative rule then keeps every uncovered file — correct,
    but the reads silently degrade to full scans until a refresh.
    Maintenance cadences that rewrite files should end with this call
    (``maintain_table`` does)."""
    out = {}
    for col in bloom_sidecar_columns(table):
        meta = read_json(os.path.join(_sidecar(table, col), META_FILE))
        out[col] = build_file_blooms(
            spark,
            table,
            col,
            n_bits=meta["n_bits"],
            k=meta["k"],
            seed=meta["seed"],
        )
    return out
