package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k (query set x corpus — a broadcastable
  * join when the query set is small). Scale path: sign-LSH bucketing with
  * deterministic integer hyperplanes, so candidates shrink to bucket-mates;
  * both paths share the same codegen'd dot-product expressions (no UDFs).
  */
object Similarity {

  /** Cast float vector to double so arithmetic is engine-portable. */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-to-right dot product — same association order as DuckDB's
    * list_dot_product, so oracle values agree bit-for-bit.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = try_divide(dot(a, b), l2(a) * l2(b))

  /** Brute-force top-k cosine neighbors for a query subset.
    * Rank by (rounded cosine desc, neighbor id asc) — rounding first keeps
    * the ordering engine-portable at equal similarities.
    */
  def bruteForceTopK(embs: DataFrame, idCol: String, vecCol: String,
                     queryPred: Column, k: Int): DataFrame = {
    val e = embs.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
    val q = embs.where(queryPred)
      .select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("qv"))
    val scored = broadcast(q).join(e, col("query_id") =!= col("id"))
      .withColumn("sim", round(cosine(col("qv"), col("v")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }

  /** Deterministic integer hyperplane weight for (plane p, dim d):
    * ((p*37 + d*11) mod 13) - 6 in [-6, 6]. Integer weights make the dot
    * product exact enough that sign decisions are engine-portable.
    */
  def planeWeight(p: Column, d: Column): Column =
    ((p * 37 + d * 11) % 13 - 6).cast("double")

  /** Sign-LSH bucket id (0..2^planes-1) per vector. */
  def lshBucket(embs: DataFrame, idCol: String, vecCol: String, planes: Int): DataFrame = {
    val e = embs.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
    val withPlane = e.select(col("id"), col("v"),
      explode(sequence(lit(0), lit(planes - 1))).as("p"))
    val dotted = withPlane.withColumn("dp",
      aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, d) => x * planeWeight(col("p"), d)),
        lit(0.0), (acc, x) => acc + x))
    dotted
      .withColumn("bit",
        when(col("dp") > 0, expr("shiftleft(CAST(1 AS BIGINT), p)")).otherwise(lit(0L)))
      .groupBy("id").agg(sum("bit").as("bucket"))
  }

  /** Bucketed ANN: exact cosine only within the query's LSH bucket — the
    * scale path (bucket join instead of query x corpus).
    */
  def lshTopK(embs: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, planes: Int, k: Int): DataFrame = {
    val buckets = lshBucket(embs, idCol, vecCol, planes)
    val corpus = embs.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .join(buckets, "id")
    val qs = embs.where(queryPred)
      .select(col(idCol).as("query_id"), toDoubleVec(col(vecCol)).as("qv"))
      .join(buckets.select(col("id").as("query_id"), col("bucket").as("qbucket")), "query_id")
    val scored = qs.join(corpus,
      col("qbucket") === col("bucket") && col("query_id") =!= col("id"))
      .withColumn("sim", round(cosine(col("qv"), col("v")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }
}
