package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction — common-neighbors, Jaccard, and
  * Adamic–Adar scores for vertex pairs at distance 2 (the standard KG
  * completion baselines; engine addition beyond lodcc's measure set, which
  * stops at per-vertex topology).
  *
  * Scale shape: candidate pairs are generated ONLY through shared
  * neighbors (a wedge self-join on the center vertex), never vertex x
  * vertex. The center join is an equi-join whose per-key fan-out is
  * deg(w)^2, so hubs are excluded from CENTER duty by the `maxHubDeg`
  * guard (same hot-key pattern as the co-occurrence hub guard): a center
  * with deg(w) <= maxHubDeg contributes at most maxHubDeg^2/2 pairs, which
  * bounds the shuffle at |E| * maxHubDeg. Dropping hub centers is the
  * standard semantic here too — a million-degree hub asserts almost
  * nothing about any one pair (its Adamic-Adar term 1/ln(deg) -> 0).
  * Degrees are undirected-distinct and small: the degree frames broadcast.
  */
object LinkPredict {

  /** (a, b, common_neighbors, adamic_adar, jaccard) for every unordered
    * pair sharing at least one non-hub neighbor; a < b lexicographically.
    */
  def scores(edges: DataFrame, maxHubDeg: Int): DataFrame = {
    require(maxHubDeg >= 2, "maxHubDeg must be >= 2")
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .where(col("src") =!= col("dst"))
    val nbr = und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val deg = nbr.groupBy("u").agg(count(lit(1)).as("d"))
    val centers = nbr.select(col("u").as("w"), col("v").as("x"))
      .join(deg.select(col("u").as("w"), col("d").as("dw")), "w")
      .where(col("dw") <= maxHubDeg)
    val pairs = centers.as("l").join(centers.as("r"),
        col("l.w") === col("r.w") && col("l.x") < col("r.x"))
      .select(col("l.x").as("a"), col("r.x").as("b"), col("l.dw").as("dw"))
    pairs.groupBy("a", "b").agg(
        count(lit(1)).as("common_neighbors"),
        sum(lit(1.0) / log(col("dw").cast("double"))).as("adamic_adar"))
      .join(broadcast(deg.select(col("u").as("a"), col("d").as("da"))), "a")
      .join(broadcast(deg.select(col("u").as("b"), col("d").as("db"))), "b")
      .withColumn("jaccard", col("common_neighbors").cast("double") /
        (col("da") + col("db") - col("common_neighbors")).cast("double"))
      .select("a", "b", "common_neighbors", "adamic_adar", "jaccard")
  }
}
