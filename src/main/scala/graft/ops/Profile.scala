package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling ("ANALYZE"-style corpus stats): one long-format row per
  * (column, metric) over the whole table — the ingestion-health check a
  * pipeline runs before/after every curation stage (null spikes, cardinality
  * collapse, length drift all show up here first).
  *
  * Metrics: every column gets `n_nulls` and `n_distinct` (exact); numeric
  * columns add `min` / `max` / `sum`; string columns add `min_len` /
  * `max_len` / `sum_len` (bytes, octet_length). All values are doubles in
  * one `(column, metric, value)` table so the shape is schema-stable.
  *
  * Scale shape: ONE aggregation job for all non-distinct metrics (a single
  * wide agg row, unpivoted driver-free with stack), plus one exact
  * count_distinct per column folded into the same agg (Spark plans
  * multi-distinct aggs as expand+partial — still a single shuffle pass
  * of the input, never a per-column scan). `approxDistinct = true` IS the
  * default (the 100-TB shape): the exact multi-distinct expand becomes one
  * HLL++ sketch per column — constant memory per column. Pass
  * `approxDistinct = false` for the exact form, which is what the
  * cross-engine oracle checks (the doc_profile gate query pins it).
  *
  * NULL semantics (ADVICE r3): min/max/sum of an all-null column — and
  * every metric of an empty table except the counts — are NULL, matching
  * the SQL aggregates on any engine. Nothing is coalesced to 0.0: a
  * profiling tool that fabricates a 0 where no data existed is reporting a
  * statistic that was never measured.
  */
object Profile {

  def summarize(df: DataFrame, approxDistinct: Boolean = true): DataFrame = {
    val metrics: Seq[(String, String, Column)] = df.schema.fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val distinct =
        if (approxDistinct) approx_count_distinct(c) else count_distinct(c)
      val base = Seq(
        (f.name, "n_nulls", count(when(c.isNull, 1)).cast("double")),
        (f.name, "n_distinct", distinct.cast("double")))
      val typed = f.dataType match {
        case _: NumericType => Seq(
          (f.name, "min", min(c).cast("double")),
          (f.name, "max", max(c).cast("double")),
          (f.name, "sum", sum(c).cast("double")))
        case StringType => Seq(
          (f.name, "min_len", min(octet_length(c)).cast("double")),
          (f.name, "max_len", max(octet_length(c)).cast("double")),
          (f.name, "sum_len", sum(octet_length(c)).cast("double")))
        case _ => Seq.empty
      }
      base ++ typed
    }
    // counts (n_nulls/n_distinct) are never NULL by SQL semantics; min/max/
    // sum legitimately are (all-null column, empty table) and stay so
    val aggs = metrics.zipWithIndex.map { case ((_, _, expr), i) =>
      expr.as(s"m$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row with stack — no collect, no per-metric job
    val stackArgs = metrics.zipWithIndex
      .map { case ((cn, mn, _), i) => s"'$cn', '$mn', m$i" }
      .mkString(", ")
    wide.select(expr(
      s"stack(${metrics.size}, $stackArgs) AS (column_name, metric, value)"))
  }
}
