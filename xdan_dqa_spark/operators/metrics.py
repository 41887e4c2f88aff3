"""Per-partition lineage + batch metrics (A1/A5 + §2.6).

Re-expresses the reference's batch metrics (``calculate_batch_metrics``
``src/processor.py:404-421``: average/min/max score, success rate) and its
run-summary stats (``src/cli.py:119-139``) as ONE aggregation over the
scored DataFrame, grouped by physical partition id — each Spark partition
is the analogue of a reference "batch", so lineage is per-unit-of-work
and a resumed run can prove which partitions committed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partition_metrics(scored: DataFrame, run_id: str) -> DataFrame:
    """One lineage row per physical partition of the scored output."""
    return (
        scored.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
            F.sum(F.when(F.col("score").isNull(), 1).otherwise(0)).alias("n_error"),
            F.sum(F.col("scrub_count").cast("long")).alias("scrub_count"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.avg("score").alias("avg_score"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
        .select(
            "run_id", "part_id", "n_docs", "n_keep", "n_drop", "n_error",
            "scrub_count", "min_score", "max_score", "avg_score", "committed_at",
        )
    )


def summarize_run(metrics: DataFrame, run_id: str, wall_sec: float) -> dict:
    """Fold this run's per-partition lineage rows into the reference's
    end-of-run stats (``src/cli.py:119-139``: Total Items / Successfully
    Processed / Failed Items / Filtered Items / Success Rate / Processing
    Time / Items per Second). One tiny aggregate over the lineage table —
    the scored data is NOT re-scanned."""
    r = (
        metrics.filter(F.col("run_id") == run_id)
        .agg(
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("total"),
            F.coalesce(F.sum("n_keep"), F.lit(0)).alias("kept"),
            F.coalesce(F.sum("n_drop"), F.lit(0)).alias("dropped"),
            F.coalesce(F.sum("n_error"), F.lit(0)).alias("errors"),
            F.coalesce(F.sum("scrub_count"), F.lit(0)).alias("scrubbed"),
        )
        .collect()[0]
    )
    total = int(r["total"])
    return {
        "run_id": run_id,
        "total_items": total,
        "successfully_processed": int(r["kept"]),
        "failed_items": int(r["errors"]),
        "filtered_items": int(r["dropped"]),
        "scrub_count": int(r["scrubbed"]),
        "success_rate_pct": round(100.0 * r["kept"] / total, 2) if total else 0.0,
        "processing_time_sec": round(wall_sec, 2),
        "items_per_second": round(total / wall_sec, 2) if wall_sec > 0 else 0.0,
    }


def format_summary_table(s: dict) -> str:
    """Human-readable analogue of the reference's rich Table printout."""
    rows = [
        ("Total Items", f"{s['total_items']}"),
        ("Successfully Processed", f"{s['successfully_processed']}"),
        ("Failed Items", f"{s['failed_items']}"),
        ("Filtered Items", f"{s['filtered_items']}"),
        ("Scrub Count", f"{s['scrub_count']}"),
        ("Success Rate", f"{s['success_rate_pct']:.2f}%"),
        ("Processing Time", f"{s['processing_time_sec']:.2f} seconds"),
        ("Items per Second", f"{s['items_per_second']:.2f}"),
    ]
    w = max(len(k) for k, _ in rows)
    lines = [f"Processing Results — {s['run_id']}"]
    lines += [f"  {k.ljust(w)}  {v}" for k, v in rows]
    return "\n".join(lines)


def batch_metrics(scored: DataFrame) -> DataFrame:
    """Whole-run metrics row (reference src/processor.py:404-421 shape)."""
    return scored.agg(
        F.count("*").alias("total_items"),
        F.avg("score").alias("average_score"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
        F.avg(F.col("keep").cast("double")).alias("success_rate"),
        F.sum(F.col("scrub_count").cast("long")).alias("scrub_count"),
    )


def feature_correlation(df: DataFrame, x_col: str, y_col: str,
                        by: str) -> DataFrame:
    """Per-group Pearson correlation of two integer feature columns via
    EXACT moment sums — the feature-QA primitive (e.g. chars-vs-tokens
    drift per language flags tokenizer or extraction regressions).

    Why not ``F.corr``: the built-in streams doubles through Welford-style
    running updates, so the result depends on row order and partitioning —
    non-deterministic across runs and never bit-equal across engines.
    Here the five moment sums (Σx, Σy, Σxy, Σx², Σy²) are accumulated as
    DECIMAL(38,0) — exact integer arithmetic in both Spark and DuckDB
    (hugeint), order-independent, map-side-combinable — and only the final
    closed-form r = (nΣxy − ΣxΣy) / √(nΣx²−(Σx)²)·√(nΣy²−(Σy)²) runs in
    doubles, where every op (mul/sub/div/sqrt) is IEEE-754
    correctly-rounded and therefore bit-identical given identical inputs.
    One map-side-combined hash aggregate; output is one bounded row per
    group. Zero-variance groups yield 0.0 (guarded), not NULL/NaN."""
    xd = F.col(x_col).cast("decimal(19,0)")
    yd = F.col(y_col).cast("decimal(19,0)")
    m = df.groupBy(by).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(F.col(x_col).cast("decimal(38,0)")).cast("double").alias("_sx"),
        F.sum(F.col(y_col).cast("decimal(38,0)")).cast("double").alias("_sy"),
        F.sum((xd * F.col(y_col).cast("decimal(18,0)")).cast("decimal(38,0)"))
        .cast("double").alias("_sxy"),
        F.sum((xd * F.col(x_col).cast("decimal(18,0)")).cast("decimal(38,0)"))
        .cast("double").alias("_sxx"),
        F.sum((yd * F.col(y_col).cast("decimal(18,0)")).cast("decimal(38,0)"))
        .cast("double").alias("_syy"),
    )
    vx = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    return m.select(
        F.col(by),
        F.col("_n").cast("long").alias("n"),
        F.when((vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy)))
        .otherwise(F.lit(0.0)).alias("pearson_r"),
    )


def fd_violations(df, lhs: str, rhs: str):
    """Functional-dependency audit: groups of ``lhs`` that map to MORE
    than one distinct ``rhs`` — the declarative data-quality rule
    ("one url ⇒ one language", "one order ⇒ one customer") checked as
    a violation census instead of assumed. Returns one row per
    violating lhs value: (lhs, n_rows, n_distinct_rhs).

    Shape: ONE hash aggregate on the lhs key with an exact
    count_distinct — Spark plans multi-distinct via expand, but a
    single distinct aggregate stays one pass with map-side partial
    distinct; the violating subset is typically tiny (clean data ⇒
    empty result), so the output never needs a cap. For the 100 TB
    version of a high-cardinality rhs, swap count_distinct for two
    stacked aggregates (groupBy(lhs, rhs) → groupBy(lhs)) — same
    result, bounded per-group state; that is exactly the shape used
    here, spelled explicitly so the plan is audit-friendly."""
    from pyspark.sql import functions as F

    pairs = df.groupBy(F.col(lhs), F.col(rhs)).agg(F.count("*").alias("_c"))
    per = pairs.groupBy(lhs).agg(
        F.sum("_c").alias("n_rows"),
        F.count("*").alias("n_distinct_rhs"),
    )
    return per.filter(F.col("n_distinct_rhs") > 1)


def pareto_frontier_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """2-D Pareto frontier (skyline): the rows NOT dominated by any
    other row, where a dominates b iff x_a >= x_b AND y_a >= y_b with
    at least one strict — the multi-objective shortlist query
    ("newest AND highest-value orders", "highest-quality AND longest
    documents") that a flat ORDER BY cannot express. Returns the
    dominating rows of ``df`` (all columns preserved).

    Scale shape (the staircase construction, NOT the quadratic
    NOT-EXISTS self-join): (1) fold to per-distinct-x maxima — ONE
    map-side-combinable aggregate, output bounded by |distinct x|,
    which IS the distributed pre-prune (the skyline of per-group
    maxima equals the skyline of the corpus); (2) a running max of y
    over x-groups sorted descending — a group survives iff its max-y
    strictly exceeds every higher-x group's (rows-between frame, O(1)
    state); (3) survivors join back BROADCAST, keeping rows at their
    group's max y (same-x lower-y rows are dominated within the
    group). The single-task window runs over |distinct x| rows; at
    extreme x-cardinality (x is a raw float score over 10^12 rows),
    quantize x into fixed-width grid cells first — grid-cell maxima
    keep the frontier a superset, then re-run exact on the survivor
    set (documented two-phase refinement; not needed at warehouse key
    cardinalities).

    Only comparisons and max() touch the values — no arithmetic — so
    floats/dates/ints are all safe and the result is engine-exact."""
    g = df.groupBy(F.col(x_col).alias("_x")).agg(
        F.max(F.col(y_col)).alias("_gy")
    )
    w = (
        Window.orderBy(F.desc("_x"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept = (
        g.withColumn("_prev", F.max("_gy").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_gy") > F.col("_prev")))
        .select("_x", "_gy")
    )
    return (
        df.join(
            F.broadcast(kept),
            (F.col(x_col) == F.col("_x")) & (F.col(y_col) == F.col("_gy")),
        )
        .drop("_x", "_gy")
    )


def mutual_information(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """One-row mutual information (nats) between two categorical
    columns — (n_rows, n_cells, mi_nats). MI(lang; source) near 0 means
    sources are language-balanced; high MI means language is predicted
    by source (a single-language source dominating its slice) — the
    information-theoretic audit behind the lang_confusion /
    keep_rate_by_lang fairness reports.

    Determinism discipline (token_entropy's pattern): a raw float sum
    of p·ln terms is accumulation-order-dependent, so each cell's term
    (c_ab/N)·ln(c_ab·N/(c_a·c_b)) — ONE fixed IEEE sequence on exact
    integer counts — is rounded to 9 dp and summed as DECIMAL
    (order-free, map-side combinable). Cells with c_ab = 0 contribute
    exactly 0 by the MI definition and never appear (the contingency
    fold only emits observed cells).

    Scale shape: one contingency fold at (a, b) grain (bounded by the
    category product), marginals are two further folds of THAT bounded
    table, attached by key joins; the final fold is one row."""
    cells = df.groupBy(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).agg(F.count("*").alias("c_ab"))
    ma = cells.groupBy("_a").agg(F.sum("c_ab").alias("c_a"))
    mb = cells.groupBy("_b").agg(F.sum("c_ab").alias("c_b"))
    tot = cells.agg(F.sum("c_ab").alias("n_rows"))
    joined = (
        cells.join(ma, "_a").join(mb, "_b")
        .crossJoin(F.broadcast(tot))
    )
    n = F.col("n_rows").cast("double")
    term = (
        F.col("c_ab").cast("double") / n
    ) * F.log(
        F.col("c_ab").cast("double") * n
        / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    )
    return (
        joined.select(
            "n_rows",
            F.round(term, 9).cast("decimal(20,9)").alias("_t"),
        )
        .groupBy("n_rows")
        .agg(
            F.count("*").alias("n_cells"),
            F.round(F.sum("_t").cast("double"), 6).alias("mi_nats"),
        )
    )


def fd_discovery(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise functional-dependency CENSUS over a column set: for
    every ordered pair (lhs -> rhs), how many lhs values exist, how
    many violate (map to >1 distinct rhs), and whether the FD holds —
    the profiling upgrade of fd_violations (which checks ONE declared
    FD) to discovery over all candidate pairs. The schema-inference
    report a new feed gets before anyone writes constraints by hand.

    Scale shape: each pair is the same two-stacked-aggregate shape as
    fd_violations (groupBy(lhs, rhs) → groupBy(lhs) — per-group state
    bounded at any rhs cardinality), the per-pair 1-row summaries
    union into one bounded report. len(cols)² − len(cols) small plans
    over one cacheable input — run it on a profile sample, not the
    full corpus (as with any profiler)."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    outs = []
    for lhs in cols:
        for rhs in cols:
            if lhs == rhs:
                continue
            pairs = df.groupBy(F.col(lhs).alias("_l"),
                               F.col(rhs).alias("_r")).agg(
                F.count("*").alias("_c")
            )
            per = pairs.groupBy("_l").agg(
                F.count("*").alias("_nd")
            )
            outs.append(per.agg(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count("*").alias("n_lhs_values"),
                F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)).alias(
                    "n_violating"
                ),
            ).withColumn("holds", F.col("n_violating") == 0))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def k_anonymity_census(df: DataFrame, qi_cols: list[str], k: int = 5,
                       sensitive_col: str | None = None) -> DataFrame:
    """One-row k-anonymity (and optional l-diversity) risk census over
    a quasi-identifier column set: (n_classes, n_rows,
    n_classes_below_k, n_rows_at_risk, min_class_size[, min_l]) — the
    privacy audit a dataset release gate runs: every equivalence class
    of QI values smaller than k re-identifies its members; if a
    sensitive column is given, min_l is the smallest number of distinct
    sensitive values in any class (l-diversity — a k-anonymous class
    where everyone shares one diagnosis still leaks it).

    Shape: ONE fold to the QI grain (map-side combinable; class count
    bounded by the QI value product), then one bounded fold to the
    report row. The distinct-sensitive count per class uses the
    stacked-aggregate form (groupBy(QI, sensitive) first) so per-class
    state stays bounded at any sensitive cardinality."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    if sensitive_col is None:
        classes = df.groupBy(*qi_cols).agg(F.count("*").alias("_n"))
        lcol = []
        lagg = []
    else:
        pairs = df.groupBy(*qi_cols, sensitive_col).agg(
            F.count("*").alias("_c")
        )
        classes = pairs.groupBy(*qi_cols).agg(
            F.sum("_c").alias("_n"), F.count("*").alias("_l")
        )
        lcol = ["_l"]
        lagg = [F.min("_l").alias("min_l")]
    return classes.select("_n", *lcol).agg(
        F.count("*").alias("n_classes"),
        F.sum("_n").alias("n_rows"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0)).alias("n_classes_below_k"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0)).alias("n_rows_at_risk"),
        F.min("_n").alias("min_class_size"),
        *lagg,
    )


def commutative_fingerprint(df: DataFrame, cols: list[str],
                            label: str) -> DataFrame:
    """One-row ORDER-INSENSITIVE dataset fingerprint: (table_name,
    n_rows, checksum) with checksum = Σ over rows of the 60-bit
    md5-derived integer of the row's canonical serialization, as an
    exact DECIMAL(38,0) sum. Two replicas of a table (different
    clusters, different partitionings, different row orders) are
    byte-equal iff counts and checksums match (collision odds ~n²/2⁶⁰)
    — the cheap cross-cluster integrity check a 100 TB replication job
    runs instead of a sort-merge diff.

    Canonical serialization: each column cast to string, NULL mapped
    to a sentinel (concat_ws silently DROPS nulls, which would make
    (NULL,'x') collide with ('x',NULL)), joined with an \\x1f unit
    separator. Addition is commutative/associative on exact decimals —
    any partitioning gives the identical checksum, and the same SQL
    computes it in any engine."""
    canon = F.concat_ws(
        "\x1f", *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in cols
        ]
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return df.select(h.alias("_h")).agg(
        F.lit(label).alias("table_name"),
        F.count("*").alias("n_rows"),
        F.sum(F.col("_h").cast("decimal(38,0)")).cast("string").alias("checksum"),
    )


def neyman_allocation(df: DataFrame, stratum_col: str, y_col: str,
                      total_k: int = 1000) -> DataFrame:
    """Neyman-optimal sample allocation plan: per stratum (stratum,
    n, sd, alloc_k) with alloc_k proportional to n_h * sd_h — the
    survey-sampling allocation that minimizes estimator variance for a
    fixed budget (high-variance strata get more of the sample than
    proportional allocation would give). Feed alloc_k to
    s3_fixed_n_per_group for the draw itself.

    Determinism: per-stratum sd comes from EXACT DECIMAL moment sums
    (population variance closed form) with ONE sqrt; the allocation
    weight n_h*sd_h and its normalization are a fixed IEEE sequence on
    those scalars, floored (floor, not round-half-even, so both
    engines truncate identically); leftover budget from flooring is
    reported in the fractional column rather than redistributed by a
    tie-breaking scheme the reader would have to reverse-engineer.

    Shape: one stratum-grain moment fold + a 1-row broadcast total."""
    if total_k < 1:
        raise ValueError(f"total_k must be >= 1 (got {total_k})")
    y19 = F.col(y_col).cast("decimal(19,0)")
    y18 = F.col(y_col).cast("decimal(18,0)")
    m = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(y_col).cast("decimal(38,0)")).alias("_sy"),
        F.sum((y19 * y18).cast("decimal(38,0)")).alias("_syy"),
    )
    nD = F.col("n").cast("double")
    sy, syy = F.col("_sy").cast("double"), F.col("_syy").cast("double")
    var = syy / nD - (sy / nD) * (sy / nD)
    staged = m.select(
        "stratum", "n",
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sd"),
    ).withColumn("_w", F.col("n").cast("double") * F.col("_sd"))
    tot = staged.agg(F.sum("_w").alias("_tw"))
    alloc = F.col("_w") * F.lit(float(total_k)) / F.col("_tw")
    return staged.crossJoin(F.broadcast(tot)).select(
        "stratum", "n",
        F.round(F.col("_sd"), 6).alias("sd"),
        F.floor(alloc).cast("long").alias("alloc_k"),
        F.round(alloc - F.floor(alloc), 6).alias("alloc_frac"),
    )


def contract_report(df: DataFrame, row_rules: dict,
                    unique_cols: list[str] | None = None) -> DataFrame:
    """Declarative data-contract checker: evaluate a set of row-level
    rules (name -> VIOLATION predicate Column) plus uniqueness rules in
    ONE pass, returning (rule, n_violations, passed) per rule — the
    ingest gate every feed crosses before entering the corpus, as a
    single queryable report instead of N ad-hoc scans.

    Shape: all row-rule counters ride ONE wide aggregate over one scan
    (uniqueness rides the same aggregate as count - count_distinct,
    planned via Expand); the per-rule rows unpivot from a bounded
    literal stack. A rule whose predicate errors is a plan-time
    failure, not a silent pass."""
    unique_cols = unique_cols or []
    if not row_rules and not unique_cols:
        raise ValueError("at least one rule required")
    aggs = [F.count("*").alias("_n")]
    for name, pred in row_rules.items():
        aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(f"_v_{name}"))
    for c in unique_cols:
        aggs.append(F.count_distinct(F.col(c)).alias(f"_d_{c}"))
    wide = df.agg(*aggs)
    entries = []
    for name in row_rules:
        entries.append(F.struct(
            F.lit(name).alias("rule"),
            F.col(f"_v_{name}").cast("long").alias("n_violations"),
        ))
    for c in unique_cols:
        entries.append(F.struct(
            F.lit(f"unique:{c}").alias("rule"),
            (F.col("_n") - F.col(f"_d_{c}")).cast("long").alias("n_violations"),
        ))
    return wide.select(F.explode(F.array(*entries)).alias("_r")).select(
        "_r.rule", "_r.n_violations",
        (F.col("_r.n_violations") == 0).alias("passed"),
    )


def rank_biased_overlap(ra: DataFrame, rb: DataFrame, item_col: str,
                        rank_col: str = "rank", p: float = 0.9,
                        depth: int = 20) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between two rankings of
    the same item universe, truncated at ``depth``: one row
    (depth, p, rbo) with rbo = (1-p)·Σ_{d=1..D} p^(d-1)·|A_d ∩ B_d|/d
    — the top-weighted ranking-similarity score used to quantify
    search-ranking drift (swap a scorer, RBO against the old ranking
    tells you how much the TOP moved, where users look).

    Determinism discipline: the overlap-at-depth sequence is exact
    integers (a COUNT over a rank-pair join per depth is avoided — ONE
    join on item gives each shared item's (rank_a, rank_b), and
    |A_d∩B_d| = count of items with max(rank_a, rank_b) <= d, a
    cumulative count over the bounded depth grid); each weighted term
    is one fixed IEEE sequence rounded to 12 dp and DECIMAL-summed.
    p^(d-1) is computed by pow on integer exponents — correctly
    rounded, identical cross-engine.

    Shape: two depth-bounded inputs (callers pass top-``depth``
    rankings), one item-keyed join, one explode over the <=depth grid —
    everything bounded by the depth constant."""
    if not (0 < p < 1):
        raise ValueError(f"p must be in (0,1), got {p}")
    a = ra.select(F.col(item_col).alias("_i"), F.col(rank_col).alias("_ra"))
    b = rb.select(F.col(item_col).alias("_i"), F.col(rank_col).alias("_rb"))
    shared = a.join(b, "_i").select(
        F.greatest("_ra", "_rb").alias("_m")
    ).filter(F.col("_m") <= depth)
    grid = shared.groupBy("_m").agg(F.count("*").alias("_c"))
    full = (
        ra.sparkSession.range(1, depth + 1).select(F.col("id").alias("d"))
        .join(grid, F.col("d") == F.col("_m"), "left")
        .select("d", F.coalesce(F.col("_c"), F.lit(0)).alias("_c"))
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    overl = full.withColumn("_ov", F.sum("_c").over(wd))
    term = F.round(
        F.pow(F.lit(p), F.col("d") - 1)
        * F.col("_ov").cast("double") / F.col("d").cast("double"),
        12,
    ).cast("decimal(24,12)")
    return overl.select(term.alias("_t")).agg(
        F.lit(depth).alias("depth"),
        F.lit(p).alias("p"),
        F.round(
            F.lit(1.0 - p) * F.sum("_t").cast("double"), 6
        ).alias("rbo"),
    )
