package graft.measures

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini / h-index / power-law fit over a degree *histogram* (x, cnt).
  *
  * lodcc sorts the raw per-vertex vector (`core/gini.py:18`,
  * `degree_based.py:104`); sorting |V| values globally does not scale, so all
  * three measures here are reformulated over the value histogram — at most
  * |distinct degree values| rows (thousands, even for billion-edge graphs),
  * after one distributed groupBy. The formulas are algebraically identical to
  * the reference's vector versions.
  */
object DistributionMeasures {

  private val wAll = Window.partitionBy(lit(0))
  private val wAsc = Window.partitionBy(lit(0)).orderBy("x")
    .rowsBetween(Window.unboundedPreceding, -1)

  /** Gini coefficient, parity with lodcc `core/gini.py:3-23`:
    * sort ascending, G = sum((2i-n-1)*x_i) / (n*sum(x)); shift by -min if
    * min<0; add 1e-7 to every element if min==0. For a run of `cnt` equal
    * values starting after `cumb` smaller ones, sum_{i}(2i-n-1) over the run
    * is cnt*(2*cumb + cnt - n); the constant shift s contributes
    * sum((2i-n-1)*s) = 0 to the numerator and n*s to sum(x).
    */
  def gini(hist: DataFrame): DataFrame =
    hist
      .withColumn("n", sum("cnt").over(wAll))
      .withColumn("minx", min("x").over(wAll))
      .withColumn("cumb", coalesce(sum("cnt").over(wAsc), lit(0L)))
      .withColumn("shift", when(col("minx") < 0, -col("minx")).otherwise(lit(0.0)))
      .withColumn("eps", when(col("minx") + col("shift") === 0, lit(0.0000001)).otherwise(lit(0.0)))
      .withColumn("contrib", col("x") * col("cnt") * (lit(2) * col("cumb") + col("cnt") - col("n")))
      .agg((sum("contrib") /
        (max("n") * (sum(col("x") * col("cnt")) + max("n") * max(col("shift") + col("eps")))))
        .as("gini"))

  /** h-index: largest h such that at least h values are >= h
    * (`degree_based.py:103-113`). Per distinct value x with N_ge values >= x,
    * the candidate is min(x, N_ge); h = max over candidates.
    */
  def hIndex(hist: DataFrame): DataFrame = {
    val wDesc = Window.partitionBy(lit(0)).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("n_ge", sum("cnt").over(wDesc))
      .agg(coalesce(max(floor(least(col("x"), col("n_ge")))), lit(0L)).as("h_index"))
  }

  /** Continuous CSN power-law fit, semantics of `powerlaw.Fit(data)` as used
    * at `degree_based.py:117-122`: drop values <= 0 (the library discards
    * them), candidate xmin = each distinct remaining value, continuous MLE
    * alpha = 1 + n_tail / sum(ln(x/xmin)), pick the xmin minimizing the KS
    * distance between empirical and fitted CDF on the tail.
    * Returns (alpha, xmin).
    *
    * Cost: |candidates| x |distinct| pairs. With every distinct value as a
    * candidate that is |distinct|^2 — fine for the usual thousands of
    * distinct degrees, a 10^12-pair blow-up if a 100-TB graph yields ~10^6
    * of them. `maxCandidates` caps the sweep: when the histogram has more
    * distinct positive values, candidates thin to every k-th value in rank
    * order (deterministic, preserves the full range). Below the cap the
    * sweep is exhaustive and bit-identical to the reference semantics;
    * the default cap never triggers at oracle scales.
    */
  def powerlawFit(hist: DataFrame, maxCandidates: Int = 4096): DataFrame = {
    val pos = hist.where(col("x") > 0)
    val cands = pos
      .withColumn("rn", row_number().over(Window.partitionBy(lit(0)).orderBy("x")) - 1)
      .withColumn("ntot", count(lit(1)).over(wAll))
      .withColumn("step", ceil(col("ntot").cast("double") / maxCandidates).cast("long"))
      .where(col("rn") % col("step") === 0)
      .select(col("x").as("xmin"))
    val pairs = cands.join(pos, col("x") >= col("xmin"))
    val stats = pairs.groupBy("xmin").agg(
      sum("cnt").as("nt"),
      sum(col("cnt") * log(col("x") / col("xmin"))).as("sumlog"),
      count(lit(1)).as("ndistinct"))
      .where(col("sumlog") > 0 && col("ndistinct") >= 2)
      .withColumn("alpha", lit(1.0) + col("nt") / col("sumlog"))
    val wTail = Window.partitionBy("xmin").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ks = pairs.join(stats, "xmin")
      .withColumn("cum_le", sum("cnt").over(wTail))
      .withColumn("d", abs(col("cum_le") / col("nt") -
        (lit(1.0) - pow(col("x") / col("xmin"), lit(1.0) - col("alpha")))))
      .groupBy("xmin", "alpha").agg(max("d").as("ks"))
    // order by ROUNDED ks so candidate selection is engine-portable when two
    // candidates differ only in the last ulps of ln/pow
    ks.orderBy(round(col("ks"), 9).asc, col("xmin").asc)
      .limit(1)
      .select(col("alpha"), col("xmin"))
  }
}
