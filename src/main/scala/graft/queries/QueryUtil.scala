package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Shared helpers for the driver-checked query surface.
  *
  * Every query has a DuckDB oracle twin; to make the driver's hash compare
  * robust, both sides round double columns to 6 decimals (Spark round and
  * DuckDB round are both half-away-from-zero for positive values) and cast
  * back to double.
  */
object QueryUtil {

  /** Round every DoubleType column of `df` to 6 decimals. */
  def roundDoubles(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == DoubleType) round(col(f.name), 6).as(f.name) else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** The deterministic graph derived from lineitem (shared by all kg_*
    * queries and their oracles): vertices v0..v4095, labels p0..p6.
    */
  def liEdges(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet").select(
      concat(lit("v"), (col("l_orderkey") % 4096).cast("string")).as("src"),
      concat(lit("v"), (col("l_partkey") % 4096).cast("string")).as("dst"),
      concat(lit("p"), (col("l_suppkey") % 7).cast("string")).as("label"))

  /** Fixture scale factor for the COMBINATORIAL consumers of the lineitem
    * graph (BGP pattern matches): k = max(1, rows/600000), i.e. 1 at every
    * driver scale up to sf0.1 and 10 at sf1. Widening the vertex space by
    * k keeps mean degree — and with it the embedding count per hub —
    * constant as SF grows, the way a real KG grows its vertex set with its
    * edge set. A FIXED modulus densifies linearly with SF, and a w-way
    * join's embeddings grow ~degree^w: measured at sf1 (10× rows), the
    * 6-way snowflake match ground 47 minutes in a single task before this
    * guard. Aggregate consumers (degree stats, gini, powerlaw…) keep the
    * fixed 4096 space: their cost is linear in edges by construction.
    * The count() is a parquet metadata read (no data scan).
    */
  def liScale(s: SparkSession, dir: String): Long =
    math.max(1L, s.read.parquet(s"$dir/lineitem.parquet").count() / 600000L)

  /** DuckDB scalar mirroring [[liScale]]. */
  val liScaleSql: String =
    "greatest(1, CAST(floor(count(*) / 600000.0) AS BIGINT))"

  /** Density-constant variant of [[liEdges]]: vertex space v0..v(4096k-1). */
  def liEdgesScaled(s: SparkSession, dir: String): DataFrame = {
    val k = liScale(s, dir)
    s.read.parquet(s"$dir/lineitem.parquet").select(
      concat(lit("v"), (col("l_orderkey") % (4096 * k)).cast("string")).as("src"),
      concat(lit("v"), (col("l_partkey") % (4096 * k)).cast("string")).as("dst"),
      concat(lit("p"), (col("l_suppkey") % 7).cast("string")).as("label"))
  }

  /** DuckDB CTE mirroring [[liEdgesScaled]] (named `edges`, plus `sc(k)`).
    * Both CTEs are MATERIALIZED: inlined, the scalar subquery inside each
    * projected key expression defeats DuckDB's equi-join detection and the
    * downstream pattern joins degrade to cross products (observed: a 78 GB
    * temp spill at sf0.01 before ENOSPC); materialized, the joins see plain
    * columns and hash-join.
    */
  val edgesScaledCte: String =
    s"""WITH sc AS MATERIALIZED (SELECT $liScaleSql AS k FROM lineitem),
       |edges AS MATERIALIZED (
       |  SELECT 'v' || (l_orderkey % (4096 * (SELECT k FROM sc))) AS src,
       |         'v' || (l_partkey % (4096 * (SELECT k FROM sc))) AS dst,
       |         'p' || (l_suppkey % 7) AS label
       |  FROM lineitem)""".stripMargin

  /** DuckDB CTE mirroring [[liEdges]] + the degree vector. */
  val edgesCte: String =
    """WITH edges AS (
      |  SELECT 'v' || (l_orderkey % 4096) AS src,
      |         'v' || (l_partkey % 4096) AS dst,
      |         'p' || (l_suppkey % 7) AS label
      |  FROM lineitem
      |), degv AS (
      |  SELECT v AS vertex,
      |         CAST(sum(o) AS BIGINT) AS out_deg,
      |         CAST(sum(i) AS BIGINT) AS in_deg,
      |         CAST(sum(o) + sum(i) AS BIGINT) AS deg
      |  FROM (SELECT src AS v, 1 AS o, 0 AS i FROM edges
      |        UNION ALL SELECT dst AS v, 0 AS o, 1 AS i FROM edges) u
      |  GROUP BY v
      |)""".stripMargin

  /** DuckDB SQL fragment computing the histogram-based gini of one degree
    * column of degv — the exact formula of DistributionMeasures.gini.
    */
  def giniSql(column: String, alias: String): String =
    s"""(SELECT CAST(round(
       |   sum(x*cnt*(2*cumb + cnt - n)) /
       |   (max(n) * (sum(x*cnt) + max(n)*max(shift+eps))), 6) AS DOUBLE)
       | FROM (
       |   SELECT x, cnt,
       |     sum(cnt) OVER () AS n,
       |     coalesce(sum(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
       |     CASE WHEN min(x) OVER () < 0 THEN -min(x) OVER () ELSE 0 END AS shift,
       |     CASE WHEN min(x) OVER () + (CASE WHEN min(x) OVER () < 0 THEN -min(x) OVER () ELSE 0 END) = 0
       |          THEN 0.0000001 ELSE 0 END AS eps
       |   FROM (SELECT CAST($column AS DOUBLE) AS x, CAST(count(*) AS BIGINT) AS cnt
       |         FROM degv GROUP BY 1) h
       | ) t) AS $alias""".stripMargin

  /** DuckDB fragment: histogram h-index of one degv column. */
  def hIndexSql(column: String, alias: String): String =
    s"""(SELECT CAST(max(CAST(floor(least(x, n_ge)) AS BIGINT)) AS BIGINT)
       | FROM (
       |   SELECT x, sum(cnt) OVER (ORDER BY x DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ge
       |   FROM (SELECT CAST($column AS DOUBLE) AS x, count(*) AS cnt FROM degv GROUP BY 1) h
       | ) t) AS $alias""".stripMargin
}
