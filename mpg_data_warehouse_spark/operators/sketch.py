"""Mergeable sketches in pure column math: HyperLogLog distinct
counts, Count-Min frequencies, and KMV/theta bottom-k distinct sets
(the set-algebra member: union AND intersection stay sketches).

The 100 TB profiling problem: ``count(DISTINCT user_id)`` per group is
exact but non-reaggregatable — a day rollup cannot be derived from
hour rollups, so every new grain re-shuffles the raw corpus. An HLL
sketch is a tiny fixed-size register array whose merge is element-wise
``max``: compute once at the finest grain, derive every coarser grain
(and every incremental update) by merging sketches instead of
re-scanning rows. (Flajolet et al. 2007; bias notes from HLL++,
Heule et al. 2013 — both public.)

Spark 4 ships DataSketches HLL (``F.hll_sketch_agg`` /
``F.hll_union_agg``) — the right choice when raw speed matters and
the sketch never leaves Spark. This module instead keeps the
registers as a PLAIN ``array<int>`` column built from md5-derived
hashes, because the engine's contract is cross-engine replayability:

- the register algebra (hash → bucket → leading-zero rank → per-bucket
  max) is exact integer arithmetic any engine reproduces bit-for-bit
  (the DuckDB oracles replay it in SQL — same policy as the SimHash
  and MinHash families, `operators/dedup.py`);
- at rest it is ordinary parquet — readable, mergeable, and auditable
  without a DataSketches runtime;
- ``bit_length`` is taken as ``length(bin(x))`` — a minimal binary
  string in both Spark and DuckDB — so no float ``log2`` enters the
  rank computation.

Plan shape (the 100 TB audit): one corpus-sized shuffle to the
``(keys, bucket)`` grain with map-side partial ``max`` — the same
shape as a group-by count — then a keys-grain assembly agg over at
most ``m`` fixed-width rows per group. Merging pre-built sketches
shuffles only ``|groups| × m`` small rows (``hll_merge``), or is a
zero-shuffle ``zip_with`` for two columns (``hll_union``). No UDFs,
no driver state; estimates are per-row column math over a bounded
array.

Reference parity: extends the reference's profiling surface (the
group-count family of `notebooks/gridVeg_groundCover_intercepts_
WRANGLE.ipynb:301-313` and its `n_distinct` per-group sites) with
the re-aggregatable form its BigQuery scripts get from
``APPROX_COUNT_DISTINCT`` / ``HLL_COUNT.MERGE``.

Only the final estimate touches floats: the raw estimator divides two
exactly-derived quantities (``alpha·m²·2^(w+1)`` and the integer
register sum ``T = Σ 2^((w+1)−M_j)``), and the small-range linear
count is ``m·ln(m/V)`` with integer ``m``/``V`` — both deterministic
given IEEE doubles; contract queries round the estimate (the same
absorption trick as the k-means centroid oracle).

The Count-Min half (Cormode & Muthukrishnan 2005 — public) is the
frequency analog: ``depth`` seeded hash rows of ``width`` counters as
ONE flat ``array<long>`` (index ``d·width + bucket``); point queries
take the per-row minimum (an upper bound on the true count, exact
when the value escaped every collision); merge is element-wise SUM —
so unlike HLL it composes under weights and is exact integer algebra
END TO END, no float anywhere. The 100 TB uses: mergeable heavy-hitter
/ vocabulary-frequency state across corpus increments, and hot-key
probes whose memory is fixed by (depth, width) rather than key
cardinality (the detection half of `operators/joins.py`'s salted-join
recipe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P_DEFAULT = 8
REG_COL = "hll_registers"

def _pow2() -> Column:
    """element_at(_pow2(), k+1) == 2^k exactly, k in [0, 59] — covers
    2^((w+1) - rho) for every register value down to p = 6 (w+1 = 59,
    and an EMPTY register's rho = 0 indexes w+2; p < 6 is rejected
    below). Built lazily: Column literals need a live SparkContext,
    which module import time doesn't have."""
    return F.array(*[F.lit(1 << k) for k in range(60)])


def _alpha(m: int) -> float:
    """Flajolet's bias-correction constant by register count."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _check_p(p: int) -> None:
    # p >= 6 keeps every 2^((w+1) - rho) inside the _pow2 table (the
    # classical minimum is 4, but m < 64 sketches are too noisy to be
    # worth the table extension); p <= 16 bounds the register array at
    # 64 Ki ints — beyond that the "tiny mergeable state" premise is
    # gone.
    if not 6 <= p <= 16:
        raise ValueError(f"p={p} outside [6, 16]")


def _register_rows(
    df: DataFrame, key_cols: list[str], value_col: str, p: int
) -> DataFrame:
    """(keys…, _bucket, _rho) — one row per non-null value.

    Hash = md5 of the value cast to string (DuckDB's
    ``md5(CAST(x AS VARCHAR))`` produces identical hex on the same
    value — the established cross-engine hash, `dedup.py:29`), split
    into two 32-bit halves. Bucket = top ``p`` bits; rank ``rho`` =
    leading zeros of the remaining ``w = 64 − p`` bits + 1, derived
    from ``length(bin(rest))`` — exact integer arithmetic, no float
    log anywhere. NULL values are skipped (``count(DISTINCT x)``
    semantics)."""
    w = 64 - p
    md5c = F.md5(F.col(value_col).cast("string"))
    hi = F.conv(F.substring(md5c, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(md5c, 9, 8), 16, 10).cast("long")
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *key_cols, hi.alias("_hi"), lo.alias("_lo")
    )
    bucket = F.shiftright(F.col("_hi"), 32 - p)
    # rest = the low (32 − p) bits of hi, then all 32 bits of lo:
    # < 2^56 for p >= 8 (< 2^58 at p = 6) — long-safe in both engines
    rest = (
        (F.col("_hi") - F.shiftleft(bucket, 32 - p)) * F.lit(1 << 32)
        + F.col("_lo")
    )
    bl = F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    return rows.select(
        *key_cols,
        bucket.cast("int").alias("_bucket"),
        (F.lit(w + 1) - bl).cast("int").alias("_rho"),
    )


def _dense_from_map(
    sparse: DataFrame, last_idx, zero: Column, out_col: str
) -> DataFrame:
    """(keys…, _map) → (keys…, out_col): densify an int-keyed sparse
    map into the [0, last_idx] array with ``zero`` at missing
    positions. Shared by every sketch assembly (HLL registers, CMS
    counters, merge reassembly). The sparse→map hoist mirrors
    `plans/retrieval.py`'s embedding assembly (inlining the map costs
    one construction per component per row)."""
    last = last_idx if isinstance(last_idx, Column) else F.lit(last_idx)
    dense = F.transform(
        F.sequence(F.lit(0), last),
        lambda i: F.coalesce(
            F.element_at(F.col("_map"), i.cast("int")), zero
        ),
    )
    return sparse.withColumn(out_col, dense).drop("_map")


def _assemble(
    grouped: DataFrame, key_cols: list[str], p: int, out_col: str
) -> DataFrame:
    """(keys…, _bucket, _rho)@unique-bucket rows → (keys…, out_col)
    with the dense m-length register array (missing buckets = 0)."""
    m = 1 << p
    sparse = grouped.groupBy(*key_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct("_bucket", "_rho"))
        ).alias("_map")
    )
    return _dense_from_map(sparse, m - 1, F.lit(0), out_col)


def hll_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    p: int = P_DEFAULT,
    out_col: str = REG_COL,
) -> DataFrame:
    """Per-group HLL registers: one row per distinct ``key_cols``
    combination (with at least one non-null value), carrying the
    ``2^p``-length ``array<int>`` register column. Groups whose
    values are ALL null produce no row — the caller's join decides
    whether that group reads as the empty sketch (all-zero array)."""
    _check_p(p)
    rows = _register_rows(df, key_cols, value_col, p)
    grouped = rows.groupBy(*key_cols, "_bucket").agg(
        F.max("_rho").alias("_rho")
    )
    return _assemble(grouped, key_cols, p, out_col)


def hll_merge(
    df: DataFrame,
    key_cols: list[str],
    sketch_col: str = REG_COL,
    p: int = P_DEFAULT,
    out_col: str | None = None,
) -> DataFrame:
    """Merge many sketch ROWS per group into one: element-wise max.
    posexplode → per-(keys, position) max → reassemble; shuffles only
    ``|groups| × m`` fixed-width rows, never raw values — the rollup
    path that makes day grains derivable from hour sketches."""
    _check_p(p)
    out = out_col or sketch_col
    # zero registers are kept (not filtered pre-shuffle): a group whose
    # input sketches are ALL empty must still emit its all-zero sketch,
    # not vanish — and the shuffle stays |groups| × m fixed-width rows
    # either way, the same order as the reassembly output.
    ex = df.select(
        *key_cols,
        F.posexplode(F.col(sketch_col)).alias("_bucket", "_rho"),
    )
    grouped = ex.groupBy(*key_cols, "_bucket").agg(
        F.max("_rho").alias("_rho")
    )
    return _assemble(grouped, key_cols, p, out)


def hll_union(a: Column, b: Column) -> Column:
    """Two sketch columns → their union: zero-shuffle ``zip_with``
    element-wise max (register arrays must share ``p``)."""
    return F.zip_with(a, b, lambda x, y: F.greatest(x, y))


def hll_zero_regs(sketch: Column) -> Column:
    """Number of empty (zero) registers — the ``V`` of the
    small-range linear-counting correction; exact integer."""
    return F.size(F.filter(sketch, lambda x: x == F.lit(0))).cast("long")


def hll_reg_sum(sketch: Column, p: int = P_DEFAULT) -> Column:
    """The EXACT integer register sum ``T = Σ_j 2^((w+1) − M_j)``
    (``w = 64 − p``), as ``decimal(38,0)`` — up to ``m·2^(w+1)``
    (≈ 2^65 at p = 8), beyond long range but exact in decimal. The
    harmonic mean ``Z = Σ 2^(−M_j)`` equals ``T / 2^(w+1)``: keeping
    the sum integral makes the estimator's only float op a single
    division of exactly-derived quantities — identical in every
    IEEE engine, which is what lets a DuckDB oracle replay it."""
    _check_p(p)
    w = 64 - p
    idx = F.lit(w + 2)  # element_at is 1-based: 2^((w+1) - rho)
    pow2 = _pow2()
    return F.aggregate(
        sketch,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: (
            acc + F.element_at(pow2, (idx - x).cast("int"))
        ).cast("decimal(38,0)"),
    )


def py_update_registers(regs, values, p: int = P_DEFAULT):
    """Pure-Python register update — the SAME algebra as
    ``_register_rows`` bit for bit (md5 halves, top-p-bit bucket,
    ``rho = (w+1) − bit_length(rest)``). Used by the streaming
    stateful operator (whose per-key state is exactly this register
    list) and by the test reference; NULL values are skipped. Returns
    ``regs`` mutated in place."""
    import hashlib

    _check_p(p)
    w = 64 - p
    for v in values:
        # v != v catches float NaN: a nullable long column crossing a
        # pandas boundary surfaces SQL NULLs as NaN, which would
        # otherwise hash as the literal string 'nan'
        if v is None or v != v:
            continue
        hx = hashlib.md5(str(v).encode()).hexdigest()
        hi = int(hx[:8], 16)
        lo = int(hx[8:16], 16)
        bucket = hi >> (32 - p)
        rest = (hi - (bucket << (32 - p))) * (1 << 32) + lo
        rho = (w + 1) - rest.bit_length()  # bit_length(0) == 0
        if rho > regs[bucket]:
            regs[bucket] = rho
    return regs


def py_estimate(regs, p: int = P_DEFAULT, decimals: int | None = 4):
    """Pure-Python mirror of ``hll_estimate`` — same exact-integer
    register sum, same branch arithmetic — so driver-side consumers
    of streamed register state (and the tests) agree with the column
    form to the rounding decimal."""
    import math

    _check_p(p)
    m = 1 << p
    w = 64 - p
    t = sum(1 << ((w + 1) - r) for r in regs)
    raw = _alpha(m) * m * m * float(1 << (w + 1)) / float(t)
    v = regs.count(0) if isinstance(regs, list) else list(regs).count(0)
    est = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    return est if decimals is None else round(est, decimals)


def hll_estimate(
    sketch: Column, p: int = P_DEFAULT, decimals: int | None = 4
) -> Column:
    """The HLL cardinality estimate: ``alpha·m²/Z`` with the classic
    small-range correction (linear counting ``m·ln(m/V)`` when the
    raw estimate ≤ 2.5·m and zero registers remain). 64-bit hashes
    make the 32-bit large-range correction unnecessary (HLL++ §4).
    ``decimals`` rounds the result so engine-replayed oracles hash
    identically despite last-ulp ``ln`` differences; pass ``None``
    for the unrounded value."""
    _check_p(p)
    m = 1 << p
    w = 64 - p
    t = hll_reg_sum(sketch, p).cast("double")
    v = hll_zero_regs(sketch)
    raw = F.lit(_alpha(m) * m * m * float(1 << (w + 1))) / t
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return est if decimals is None else F.round(est, decimals)


# ---------------------------------------------------------------------------
# Count-Min frequency sketch — the mergeable-by-SUM sibling.
# ---------------------------------------------------------------------------

CMS_WIDTH = 1024
CMS_DEPTH = 4
CMS_COL = "cms_counters"


def _check_cms(width: int, depth: int) -> None:
    # width*depth bounds the flat counter array (memory per group);
    # depth > 8 buys nothing (error prob 2^-depth already < 0.4%)
    if width < 16 or width > (1 << 20):
        raise ValueError(f"width={width} outside [16, 2^20]")
    if not 1 <= depth <= 8:
        raise ValueError(f"depth={depth} outside [1, 8]")


def _cms_bucket(value: Column, d: int, width: int) -> Column:
    """Row-d bucket of a value: md5 of the seed-prefixed string —
    ``md5('cms<d>|' || CAST(x AS VARCHAR))`` in any engine — first
    32 hash bits mod width. Seeding by prefix (not a second hash
    argument) keeps the replay one expression in DuckDB."""
    h = F.md5(F.concat(F.lit(f"cms{d}|"), value.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width)
    )


def cms_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    weight_col: str | None = None,
    out_col: str = CMS_COL,
) -> DataFrame:
    """Per-group Count-Min counters: one row per ``key_cols`` combo
    carrying a flat ``array<long>`` of ``depth × width`` counters
    (index ``d·width + bucket``; flat beats nested arrays — one
    ``map_from_entries`` assembly, no nested HOF lambdas). Each
    non-null value adds ``weight_col`` (default 1) to one bucket per
    depth row. ``key_cols=[]`` builds one global sketch. Like
    ``hll_sketch``, a group whose values are ALL null produces no row
    (the caller's join decides whether it reads as the all-zero
    counter array); the global form always yields its one row.

    Plan shape: the input explodes ×depth into (keys, flat-index,
    weight) rows — fixed small factor — then ONE corpus-sized
    hash-agg shuffle with map-side partial sums and a keys-grain
    assembly, the same audit shape as ``hll_sketch``."""
    _check_cms(width, depth)
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    idx = F.explode(
        F.array(
            *[
                (F.lit(d * width) + _cms_bucket(F.col(value_col), d, width))
                .cast("int")  # int-keyed map, same as every assembly
                for d in range(depth)
            ]
        )
    )
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *key_cols, idx.alias("_ix"), w.alias("_w")
    )
    grouped = rows.groupBy(*key_cols, "_ix").agg(F.sum("_w").alias("_c"))
    sparse = grouped.groupBy(*key_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct("_ix", "_c"))
        ).alias("_map")
    )
    return _dense_from_map(
        sparse, width * depth - 1, F.lit(0).cast("long"), out_col
    )


def cms_merge(
    df: DataFrame,
    key_cols: list[str],
    sketch_col: str = CMS_COL,
    out_col: str | None = None,
) -> DataFrame:
    """Merge many counter ROWS per group: element-wise sum (counters
    are linear, so merge also composes with weighted builds). Shuffles
    |groups| × depth·width fixed-width rows, never raw values."""
    out = out_col or sketch_col
    ex = df.select(
        *key_cols, F.posexplode(F.col(sketch_col)).alias("_ix", "_c")
    )
    grouped = ex.groupBy(*key_cols, "_ix").agg(F.sum("_c").alias("_c"))
    # reassemble at the length of the input arrays (posexplode emits
    # every index, zeros included, so max(_ix) is depth·width − 1)
    sparse = grouped.groupBy(*key_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct("_ix", "_c"))
        ).alias("_map"),
        F.max("_ix").alias("_mx"),
    )
    return _dense_from_map(
        sparse, F.col("_mx"), F.lit(0).cast("long"), out
    ).drop("_mx")


def cms_union(a: Column, b: Column) -> Column:
    """Two counter columns → their sum: zero-shuffle ``zip_with``
    (arrays must share (width, depth))."""
    return F.zip_with(a, b, lambda x, y: x + y)


def cms_query(
    sketch: Column,
    value: Column,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> Column:
    """Point frequency estimate: min over depth rows of the value's
    counter — an UPPER bound on the true count (exact when the value
    dodged every collision). Pure integer column math."""
    _check_cms(width, depth)
    return F.least(
        *[
            F.element_at(
                sketch,
                (F.lit(d * width) + _cms_bucket(value, d, width) + 1).cast(
                    "int"
                ),
            )
            for d in range(depth)
        ]
    )


# ---------------------------------------------------------------------------
# KMV / bottom-k (theta) distinct sketch — the SET-ALGEBRA sibling.
# ---------------------------------------------------------------------------

KMV_K = 64
KMV_COL = "kmv_minima"
KMV_SPACE = 1 << 56  # 56-bit hash domain: first 14 md5 hex chars


def _check_k(k: int) -> None:
    # k >= 8 keeps the (k-1)/U_(k) estimator sane; the upper bound
    # caps per-group sketch memory (k longs) like _check_cms does
    if k < 8 or k > (1 << 16):
        raise ValueError(f"k={k} outside [8, 65536]")


def _kmv_hash(value: Column) -> Column:
    """56-bit hash: the first 14 hex chars of ``md5(CAST(x AS
    VARCHAR))`` — ``CAST('0x' || substr(md5(x), 1, 14) AS BIGINT)``
    in DuckDB, long-safe in both engines (< 2^56), the established
    cross-engine hash family (`_register_rows`, `_cms_bucket`)."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 14), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = KMV_K,
    out_col: str = KMV_COL,
) -> DataFrame:
    """Per-group bottom-k sketch: the k smallest DISTINCT 56-bit
    hashes of ``value_col``, as a sorted ``array<long>`` (fewer than
    k rows when the group has fewer distinct values — then the
    sketch IS the exact distinct set). KMV / theta sketches
    (Bar-Yossef et al. 2002; Dasgupta et al. 2016, the public
    DataSketches theta framework) buy what HLL registers cannot:
    closed SET ALGEBRA — union (``kmv_union``) AND intersection
    (``kmv_intersect_estimate``) stay sketches, so segment-overlap
    questions ("users in cohort A ∩ cohort B") are answerable from
    pre-built per-segment state without rescanning raw rows.

    Plan shape at 100 TB: a ``dense_rank() ≤ k`` window on the hash —
    Spark's InferWindowGroupLimit inserts a MAP-SIDE partial top-k
    before the exchange, so the shuffle carries at most
    ``tasks × k`` rows per group, never the raw distinct values —
    then one keys-grain collect of ≤ k longs. NULL values are
    skipped (count-distinct semantics); an all-null group emits no
    row, matching ``hll_sketch``; ``key_cols=[]`` builds one global
    sketch (always one row)."""
    from pyspark.sql import Window

    _check_k(k)
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *key_cols, _kmv_hash(F.col(value_col)).alias("_h")
    )
    w = Window.partitionBy(*key_cols).orderBy("_h")
    ranked = rows.withColumn("_r", F.dense_rank().over(w)).filter(
        F.col("_r") <= k
    )
    return ranked.groupBy(*key_cols).agg(
        F.array_sort(F.collect_set("_h")).alias(out_col)
    )


def kmv_merge(
    df: DataFrame,
    key_cols: list[str],
    sketch_col: str = KMV_COL,
    k: int = KMV_K,
    out_col: str | None = None,
) -> DataFrame:
    """Merge many sketch ROWS per group: the k smallest distinct
    hashes of the union of the inputs — same dense_rank ≤ k shape as
    the build, but over |groups| × k fixed-width rows, never raw
    values. A group whose sketches are ALL empty still emits its
    (empty-array) row, matching ``hll_merge``'s zero-register rule:
    ``explode_outer`` keeps one NULL row per empty sketch, nulls rank
    LAST so they never displace a real hash, and ``collect_set``
    drops them from the output array."""
    from pyspark.sql import Window

    _check_k(k)
    out = out_col or sketch_col
    ex = df.select(
        *key_cols, F.explode_outer(F.col(sketch_col)).alias("_h")
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_h").asc_nulls_last()
    )
    ranked = ex.withColumn("_r", F.dense_rank().over(w)).filter(
        F.col("_r") <= k
    )
    return ranked.groupBy(*key_cols).agg(
        F.array_sort(F.collect_set("_h")).alias(out)
    )


def kmv_union(a: Column, b: Column, k: int = KMV_K) -> Column:
    """Two sketch columns → the union sketch: zero-shuffle column
    math (distinct-merge, sort, keep the k smallest). Exact while
    the union still has < k distinct hashes — the same exactness
    contract as the build."""
    _check_k(k)
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_theta(sketch: Column, k: int = KMV_K) -> Column:
    """The sketch's θ as an INTEGER hash bound: the k-th smallest
    hash when the sketch is full (k distinct values were seen), else
    the whole domain ``KMV_SPACE`` (the sketch is exact). Every hash
    h < θ was retained — the theta-sketch invariant that makes
    intersection estimable."""
    _check_k(k)
    return F.when(
        F.size(sketch) >= k, F.element_at(sketch, k)
    ).otherwise(F.lit(KMV_SPACE))


def kmv_estimate(
    sketch: Column, k: int = KMV_K, decimals: int | None = 4
) -> Column:
    """Distinct-count estimate: EXACT ``|sketch|`` while under k
    distinct values; else the classic unbiased ``(k−1)·U/h_(k)``
    (U = hash domain). The only float op is one multiply of exactly-
    representable doubles (k−1 and the power-of-two U) and one
    divide — deterministic IEEE, replayed verbatim by the DuckDB
    oracle; ``decimals`` rounds for hash-stable contracts."""
    _check_k(k)
    n = F.size(sketch)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(KMV_SPACE))
        / F.element_at(sketch, k).cast("double")
    )
    return est if decimals is None else F.round(est, decimals)


def kmv_intersect_estimate(
    a: Column,
    b: Column,
    k: int = KMV_K,
    decimals: int | None = 4,
) -> Column:
    """Distinct-count estimate of A ∩ B from the two sketches alone
    (Dasgupta et al. 2016 theta intersection): θ = min(θ_a, θ_b);
    the retained intersection sample is every shared hash < θ; the
    estimate scales the sample by 1/θ (as a domain fraction). When
    NEITHER sketch is full θ covers the whole domain and the result
    is the EXACT overlap count. Integer algebra until the final
    scale — zero-shuffle column math over two ≤ k arrays."""
    _check_k(k)
    theta = F.least(kmv_theta(a, k), kmv_theta(b, k))
    cnt = F.size(
        F.filter(F.array_intersect(a, b), lambda h: h < theta)
    )
    est = F.when(theta == F.lit(KMV_SPACE), cnt.cast("double")).otherwise(
        cnt.cast("double") * F.lit(float(KMV_SPACE)) / theta.cast("double")
    )
    return est if decimals is None else F.round(est, decimals)


def py_kmv(values, k: int = KMV_K):
    """Pure-Python bottom-k build — same 56-bit md5 prefix hash as
    ``_kmv_hash`` bit for bit. Test reference and driver-side
    consumer of sketch state; NULL/NaN values are skipped."""
    import hashlib

    _check_k(k)
    hs = set()
    for v in values:
        if v is None or v != v:
            continue
        hs.add(int(hashlib.md5(str(v).encode()).hexdigest()[:14], 16))
    return sorted(hs)[:k]


def py_kmv_estimate(sketch, k: int = KMV_K, decimals: int | None = 4):
    """Pure-Python mirror of ``kmv_estimate`` — same branch, same
    float op order."""
    _check_k(k)
    if len(sketch) < k:
        est = float(len(sketch))
    else:
        est = float(k - 1) * float(KMV_SPACE) / float(sketch[k - 1])
    return est if decimals is None else round(est, decimals)


def py_kmv_intersect_estimate(a, b, k: int = KMV_K, decimals=4):
    """Pure-Python mirror of ``kmv_intersect_estimate``."""
    _check_k(k)
    ta = a[k - 1] if len(a) >= k else KMV_SPACE
    tb = b[k - 1] if len(b) >= k else KMV_SPACE
    theta = min(ta, tb)
    cnt = sum(1 for h in set(a) & set(b) if h < theta)
    if theta == KMV_SPACE:
        est = float(cnt)
    else:
        est = float(cnt) * float(KMV_SPACE) / float(theta)
    return est if decimals is None else round(est, decimals)


def py_kmv_update(sketch, values, k: int = KMV_K):
    """Pure-Python incremental bottom-k update — merge new values'
    hashes into an existing sorted sketch, keeping the k smallest
    distinct. Insert-only KMV is exactly maintainable this way: an
    evicted hash exceeded the k-th smallest, which only DECREASES as
    values arrive, so it can never re-enter. Streaming state operator
    (`streaming/events.py::running_distinct_kmv_stream`) and test
    reference; NULL/NaN skipped."""
    import hashlib

    _check_k(k)
    hs = set(sketch)
    for v in values:
        if v is None or v != v:
            continue
        hs.add(int(hashlib.md5(str(v).encode()).hexdigest()[:14], 16))
    return sorted(hs)[:k]


def py_cms_update(counters, values, width=CMS_WIDTH, depth=CMS_DEPTH, w=1):
    """Pure-Python incremental Count-Min update — the same
    seed-prefixed md5 bucket draw as ``_cms_bucket`` bit for bit.
    Counters are sums, so incremental maintenance is exact and
    order-independent (unlike the bottom-k/register families there is
    nothing to evict). Streaming state operator and test reference;
    NULL/NaN skipped. Mutates and returns ``counters``."""
    import hashlib

    _check_cms(width, depth)
    for v in values:
        if v is None or v != v:
            continue
        for d in range(depth):
            hx = hashlib.md5(f"cms{d}|{v}".encode()).hexdigest()
            counters[d * width + int(hx[:8], 16) % width] += w
    return counters


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch — the mergeable ORDER-STATISTICS sibling.
#
# A per-group uniform ROW sample keyed by a 56-bit hash of the row's
# unique id (bottom-k sampling, Cohen & Kaplan 2007 — public): the k
# rows with the smallest id-hashes, each carrying its value. Because
# hash order is a fixed random-looking permutation of the rows, the
# retained set is a uniform k-sample, and merging sketches over
# DISJOINT row sets (hour→day, shard→global) is just bottom-k of the
# union — the same re-aggregation property as HLL/KMV/CMS, here for
# quantiles/medians where registers and counters cannot answer.
# BigQuery's APPROX_QUANTILES has no mergeable at-rest form; this
# column representation is the rollup-friendly analog.
#
# Everything is deterministic given the data: the hash fixes WHICH
# rows are sampled, so the estimate is exactly reproducible by any
# engine with md5 — the DuckDB oracle replays sample AND estimate
# bit for bit (no statistical tolerance needed in the contract).
# Exactness contract: a group with ≤ k rows keeps ALL of them and
# every quantile is EXACT — the sketch degrades gracefully into the
# true order statistics, same two-branch story as KMV's estimator.
#
# Plan shape at 100 TB: one row_number() ≤ k window on (hash, value)
# — InferWindowGroupLimit inserts the map-side partial top-k, so the
# shuffle carries ≤ tasks × k rows per group — then a keys-grain
# collect of ≤ k (h, v) structs. Merge re-grains |groups| × k
# fixed-width rows, never raw data.
# ---------------------------------------------------------------------------

QS_K = 256
QS_COL = "qs_sample"


def _qs_id_hash(id_cols: list[str]) -> Column:
    """56-bit row-id hash: md5 of the '|'-joined id columns (cast to
    string) — ``CAST('0x' || substr(md5(a || '|' || b), 1, 14) AS
    BIGINT)`` in DuckDB. The id columns must UNIQUELY identify a row
    (the caller's contract): duplicate ids would collapse under the
    hash order and bias the sample toward their shared position.

    NULL-PROPAGATING join (``F.concat``, matching SQL ``||``), not
    ``concat_ws``: concat_ws silently skips null components, so the
    distinct id tuples (1, NULL) and (NULL, 1) would both render "1"
    and collide — and would diverge from the documented SQL replay,
    which nulls out. Rows with any null id component hash to NULL and
    are dropped from the sample on both engines."""
    parts: list[Column] = []
    for i, c in enumerate(id_cols):
        if i:
            parts.append(F.lit("|"))
        parts.append(F.col(c).cast("string"))
    return F.conv(
        F.substring(F.md5(F.concat(*parts)), 1, 14), 16, 10
    ).cast("long")


def quantile_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    id_cols: list[str],
    k: int = QS_K,
    out_col: str = QS_COL,
) -> DataFrame:
    """Per-group bottom-k quantile sketch: the k rows with the
    smallest id-hashes, as a sorted ``array<struct<h, v>>`` (by hash,
    then value — ties only under md5 collision). NULL and NaN values
    are skipped (quantiles are over the non-null population, matching
    ``quantile_cont``; NaN matches ``py_qs_update``'s v != v rule so
    batch and streaming state stay bit-identical); an all-null group
    emits no row, matching the other sketch families."""
    from pyspark.sql import Window

    _check_k(k)
    rows = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *key_cols,
            _qs_id_hash(id_cols).alias("_h"),
            F.col(value_col).cast("double").alias("_v"),
        )
        # null-id rows carry a NULL hash (see _qs_id_hash) — skipped,
        # same rule both engines replay
        .filter(F.col("_h").isNotNull())
        # NaN skipped too — py_qs_update (the streaming twin's state
        # update) drops NaN (v != v), so the batch build must apply
        # the identical rule or the bit-identical batch↔stream state
        # contract breaks on NaN inputs
        .filter(~F.isnan(F.col("_v")))
    )
    w = Window.partitionBy(*key_cols).orderBy("_h", "_v")
    ranked = rows.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k
    )
    return ranked.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_h").alias("h"),
                                    F.col("_v").alias("v")))
        ).alias(out_col)
    )


def quantile_merge(
    df: DataFrame,
    key_cols: list[str],
    sketch_col: str = QS_COL,
    k: int = QS_K,
    out_col: str | None = None,
) -> DataFrame:
    """Merge many sketch rows per group: bottom-k by hash of the
    union — EXACTLY the sketch a direct build over the union of the
    underlying (disjoint) row sets produces, because hash order is a
    property of the rows, not of the grouping (pinned by test). Same
    explode → row_number ≤ k shape as the build over |groups| × k
    fixed-width rows; a group whose sketches are all empty keeps its
    (empty-array) row via explode_outer + nulls-last, matching
    ``kmv_merge``."""
    from pyspark.sql import Window

    _check_k(k)
    out = out_col or sketch_col
    ex = df.select(
        *key_cols, F.explode_outer(F.col(sketch_col)).alias("_s")
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_s.h").asc_nulls_last(), F.col("_s.v").asc_nulls_last()
    )
    ranked = ex.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k
    )
    # collect_list skips NULL structs, so an all-empty group keeps its
    # row with an empty (correctly typed) array — kmv_merge's rule
    return ranked.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list("_s")).alias(out)
    )


def quantile_estimate(sketch: Column, q: float) -> Column:
    """The q-quantile estimate: the lower order statistic of the
    sample's values at 0-based index ``floor(q·(n−1))`` — an element
    SELECTION, not an interpolation, so the result is one of the
    sampled values verbatim and the oracle replay is exact with no
    float arithmetic beyond the one deterministic IEEE product
    ``q·(n−1)``. EXACT (the true population quantile under the same
    definition) whenever the group had ≤ k rows."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q={q} outside [0, 1]")
    vs = F.array_sort(F.transform(sketch, lambda s: s["v"]))
    idx = (
        F.floor(F.lit(float(q)) * (F.size(vs) - 1).cast("double"))
        .cast("int")
        + 1
    )
    # the empty-array rows quantile_merge preserves (all-empty
    # groups) estimate as NULL, not an element_at(_, 0) error —
    # py_qs_estimate's None, mirrored
    return F.when(F.size(vs) > 0, F.element_at(vs, idx))


def py_qs_update(sample, pairs, k: int = QS_K):
    """Pure-Python incremental bottom-k sample update — same id-hash
    as ``_qs_id_hash`` bit for bit. ``sample`` is a list of (h, v)
    tuples; ``pairs`` is an iterable of (id_str, value) with id_str
    the '|'-joined id columns. Insert-only streams maintain the
    bottom-k EXACTLY (an evicted row's hash exceeded the k-th
    smallest, which only decreases — the KMV twin's argument).
    Streaming state operator and test reference; NULL/NaN values
    skipped. Returns the new sorted sample."""
    import hashlib

    _check_k(k)
    s = {(h, v) for h, v in sample}
    for id_str, v in pairs:
        if id_str is None or v is None or v != v:
            continue
        h = int(hashlib.md5(id_str.encode()).hexdigest()[:14], 16)
        s.add((h, float(v)))
    return sorted(s)[:k]


def py_qs_estimate(sample, q: float):
    """Pure-Python mirror of ``quantile_estimate``."""
    if not sample:
        return None
    vs = sorted(v for _, v in sample)
    return vs[int(q * (len(vs) - 1))]
