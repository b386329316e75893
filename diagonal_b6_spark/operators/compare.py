"""Scenario comparison: the reference UI's /compare endpoint as DataFrame
transforms (b6/ui/ui.go:880-1014 CompareHandler + equaliseBars; pinned by
ui_test.go:188-277 TestCompareScenarios and :279-406 TestEqualiseBars).

The reference stores an analysis expression (e.g. ``find [...] | map ... |
histogram-with-id``) on the baseline world, re-evaluates it inside each
scenario overlay world, extracts each result's histogram bars, and then
*equalises* the bars so every world reports the same bucket set in the
same order -- missing buckets zero-filled, indices reassigned, each
histogram keeping its own total.

Spark-first shape: worlds are snapshot DataFrames (operators/change.py
overlays), an analysis is a callable world -> histogram DataFrame (the
output of agg.histogram_buckets, or anything exposing label/value bars),
and equalisation is a tiny full-outer alignment: the bucket-label table
is bounded by max_buckets * n_worlds (~6 per histogram), so the ordering
window here is over a provably bounded input -- the same exemption as
agg.py's bucket ordering, NOT a corpus-sized global window.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def histogram_label(numeric: bool) -> F.Column:
    """Bar label for a histogram_buckets row, the reference's rules
    (api/histogram.go:187-229 formatLabel + :247-283 bucket labels):

      categorical exact          the value; NULL lo = "other"
      numeric exact (hi == lo)   the value, integers unpadded
      numeric range, hi == lo+1 on integers -> just "lo"
      numeric range              "lo-hi" (%.3g floats)
      numeric open-ended         "lo-"

    Integer collapse: Go keeps int-typed tag values; our numeric buckets
    are doubles, so whole doubles format as integers (42.0 -> "42").
    Non-integer floats use Java's %.3g, which differs from Go's %.3g in
    keeping a trailing ".00" on whole values -- engine-internal labels
    are consistent across worlds, which is all equalisation requires.
    """
    if not numeric:
        return F.coalesce(F.col("lo"), F.lit("other"))

    def fmt(c):
        return F.when(
            c == F.round(c), c.cast("long").cast("string")
        ).otherwise(F.format_string("%.3g", c))

    lo, hi = F.col("lo"), F.col("hi")
    return (
        F.when(hi.isNull(), F.concat(fmt(lo), F.lit("-")))
        .when(hi == lo, fmt(lo))
        .when(
            (lo == F.round(lo)) & (hi == F.round(hi)) & (hi == lo + 1),
            lo.cast("long").cast("string"),
        )
        .otherwise(F.concat(fmt(lo), F.lit("-"), fmt(hi)))
    )


def histogram_bars(hist: DataFrame) -> DataFrame:
    """(bucket, lo, hi, n) from agg.histogram_buckets -> the bar rows the
    UI renders: (label string, value long, total long)
    (ui/histogram.go:30-76 fillResponseFromHistogramFeature).

    Distinct numeric buckets can format to the SAME label (%.3g); the
    reference's equaliseBars keys bars by label in a map, so the
    last bar in bucket order wins (ui.go:989-992) -- mirrored here with
    a max_by, which also guarantees labels are unique per histogram.
    The total rides on every row so downstream alignment never has to
    re-run the analysis just to re-aggregate it.
    """
    numeric = dict(hist.dtypes).get("lo") == "double"
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        hist.select(
            histogram_label(numeric).alias("label"),
            F.col("n").cast("long").alias("value"),
            F.col("bucket"),
            # bounded window: one row per bucket (<= max_buckets)
            F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("total"),
        )
        .groupBy("label")
        .agg(
            F.max_by("value", "bucket").alias("value"),
            F.max("total").alias("total"),
        )
    )


def sortable_bar_key() -> F.Column:
    """SortableKeyForAtom for value atoms (ui/lines.go:610-635): integer
    labels zero-pad to Go's %010d (sign leading, '-000000042'), everything
    else sorts as the raw string; value atoms share the '0 ' prefix."""
    label = F.col("label")
    as_int = F.when(
        label.rlike(r"^[+-]?[0-9]+$"), label.cast("long")
    )
    return F.concat(
        F.lit("0 "),
        F.when(as_int.isNotNull(), F.format_string("%010d", as_int)).otherwise(label),
    )


def equalise_bars(bar_sets: Sequence[DataFrame]) -> DataFrame:
    """ui.go:977-1014 equaliseBars: align every histogram onto the union
    of bucket labels, sorted by the reference's sortable key; missing
    buckets zero-fill, indices reassign 0..n-1, and each histogram keeps
    its own total on every bar (including the zero-filled ones).

    Input: one (label, value, total) DataFrame per world, baseline first.
    Output: (world int, index int, label string, value long, total long),
    where world 0 is the baseline (scenarios follow in input order).
    """
    keys = None
    for bars in bar_sets:
        k = bars.select("label")
        keys = k if keys is None else keys.unionByName(k)
    # The label table is bounded by max_buckets per histogram (<= ~6 * n
    # worlds): the global ordering window below runs over a provably tiny
    # input, the agg.py bucket-table exemption.
    keys = keys.distinct().withColumn(
        "index",
        (F.row_number().over(Window.orderBy(sortable_bar_key())) - 1).cast("int"),
    )

    # Per world: one left join against the key table; the world's total
    # spreads onto zero-filled rows via a window over the ALIGNED table
    # (bounded by the union bucket count -- tiny), so the underlying
    # analysis is scanned twice per world (keys + join), never a third
    # time for a separate total aggregate.
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = None
    for i, bars in enumerate(bar_sets):
        aligned = keys.join(bars, "label", "left").select(
            F.lit(i).alias("world"),
            "index",
            "label",
            F.coalesce("value", F.lit(0)).cast("long").alias("value"),
            F.coalesce(F.max("total").over(w_all), F.lit(0))
            .cast("long")
            .alias("total"),
        )
        out = aligned if out is None else out.unionByName(aligned)
    return out


def compare_scenarios(
    baseline: DataFrame,
    scenarios: Sequence[DataFrame],
    analysis: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """CompareHandler.ServeHTTP end to end (ui.go:885-960): run the stored
    analysis against the baseline world and re-run it inside every
    scenario world, then equalise the resulting histograms.

    ``analysis`` maps a world snapshot to a histogram DataFrame in the
    agg.histogram_buckets shape (bucket, lo, hi, n) -- the Spark analogue
    of re-evaluating the stored expression feature against each overlay
    world.  Returns the equalised (world, index, label, value, total)
    comparison table; world 0 is the baseline.
    """
    bar_sets = [histogram_bars(analysis(baseline))]
    for scenario in scenarios:
        bar_sets.append(histogram_bars(analysis(scenario)))
    return equalise_bars(bar_sets)
