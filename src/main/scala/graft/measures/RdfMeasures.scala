package graft.measures

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fernández et al. RDF structural measures (SURVEY.md §2.4 A20-A34) as lazy
  * single-row DataFrames over the edge table (src, dst, label).
  *
  * Reference: the modules under `graph/measures/fernandez_et_al/`
  * (subject_out_degrees.py, object_in_degrees.py, predicate_degrees.py,
  * common_ratios.py, predicate_lists.py, typed_subjects_objects.py).
  * Zero degrees never occur
  * in these group-bys (a group exists only if >= 1 edge does), which matches
  * the reference's NaN-exclusion of zeros (`subject_out_degrees.py:10-11`).
  * All are single-shuffle hash aggregations; Spark's partial aggregation
  * subsumes the reference's manual partition collect/reduce loops
  * (`fernandez_et_al/main.py:47-195`).
  */
object RdfMeasures {

  private def maxMean(grouped: DataFrame, maxName: String, meanName: String): DataFrame =
    grouped.agg(
      max("c").cast("long").as(maxName),
      avg("c").as(meanName))

  /** Eq.1: triples per subject. */
  def outDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("src").agg(count(lit(1)).as("c")),
      "max_out_degree", "mean_out_degree")

  /** Eq.2: triples per (subject, predicate). */
  def partialOutDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("src", "label").agg(count(lit(1)).as("c")),
      "max_partial_out_degree", "mean_partial_out_degree")

  /** Eq.3: distinct predicates per subject. */
  def labelledOutDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("src").agg(count_distinct(col("label")).as("c")),
      "max_labelled_out_degree", "mean_labelled_out_degree")

  /** Eq.4: distinct objects per subject. */
  def directOutDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("src").agg(count_distinct(col("dst")).as("c")),
      "max_direct_out_degree", "mean_direct_out_degree")

  /** Eq.5: triples per object. */
  def inDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("dst").agg(count(lit(1)).as("c")),
      "max_in_degree", "mean_in_degree")

  /** Eq.6: triples per (object, predicate). */
  def partialInDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("dst", "label").agg(count(lit(1)).as("c")),
      "max_partial_in_degree", "mean_partial_in_degree")

  /** Eq.7: distinct predicates per object. */
  def labelledInDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("dst").agg(count_distinct(col("label")).as("c")),
      "max_labelled_in_degree", "mean_labelled_in_degree")

  /** Eq.8: distinct subjects per object. */
  def directInDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("dst").agg(count_distinct(col("src")).as("c")),
      "max_direct_in_degree", "mean_direct_in_degree")

  /** Eq.9: triples per predicate. */
  def predicateDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("label").agg(count(lit(1)).as("c")),
      "max_predicate_degree", "mean_predicate_degree")

  /** Eq.10: distinct subjects per predicate. */
  def predicateInDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("label").agg(count_distinct(col("src")).as("c")),
      "max_predicate_in_degree", "mean_predicate_in_degree")

  /** Eq.11: distinct objects per predicate. */
  def predicateOutDegree(edges: DataFrame): DataFrame =
    maxMean(edges.groupBy("label").agg(count_distinct(col("dst")).as("c")),
      "max_predicate_out_degree", "mean_predicate_out_degree")

  private def setRatio(a: DataFrame, b: DataFrame, alias: String): DataFrame = {
    val inter = a.intersect(b).agg(count(lit(1)).as("i"))
    val union = a.union(b).distinct().agg(count(lit(1)).as("u"))
    inter.crossJoin(union)
      .select(try_divide(col("i").cast("double"), col("u")).as(alias))
  }

  /** Eq.12: |S cap O| / |S cup O| (`common_ratios.py:3-13`). */
  def subjectObjectRatio(edges: DataFrame): DataFrame =
    setRatio(
      edges.select(col("src").as("v")).distinct(),
      edges.select(col("dst").as("v")).distinct(),
      "subject_object_ratio")

  /** Eq.13-14 analog: |S cap P| / |S cup P|. The reference stubs this out
    * "because this is a costly computation" (`common_ratios.py:15-18` is an
    * empty TODO); distributed set intersection makes it one semi-join, so
    * the engine ships it.
    */
  def subjectPredicateRatio(edges: DataFrame): DataFrame =
    setRatio(
      edges.select(col("src").as("v")).distinct(),
      edges.select(col("label").as("v")).distinct(),
      "subject_predicate_ratio")

  /** Eq.15-16 analog: |P cap O| / |P cup O| (`common_ratios.py:20-23`,
    * also TODO in the reference — see [[subjectPredicateRatio]]).
    */
  def predicateObjectRatio(edges: DataFrame): DataFrame =
    setRatio(
      edges.select(col("label").as("v")).distinct(),
      edges.select(col("dst").as("v")).distinct(),
      "predicate_object_ratio")

  /** Eq.17-19 (`predicate_lists.py:5-32`): per-subject predicate list in a
    * *defined* order (the reference depends on file order,
    * `fernandez_et_al/main.py:216-219`; we pin the caller-supplied `ord`
    * column, defaulting to the label itself, and document it).
    * repeated_predicate_lists = 1 - distinct_lists/|S|;
    * list degree = subjects per distinct list -> max/mean.
    */
  def predicateLists(edges: DataFrame, ord: Option[Column] = None): DataFrame = {
    val perList = ord match {
      case Some(o) =>
        // caller-pinned order: the list must actually be materialized
        edges
          .groupBy("src")
          .agg(concat_ws("\u0001",
            transform(array_sort(collect_list(struct(o.as("o"), col("label").as("l")))),
              s => s.getField("l"))).as("plist"))
          .groupBy("plist").agg(count(lit(1)).as("c"))
      case None =>
        // label-order lists are FULLY DETERMINED by the per-(src, label)
        // multiplicities, so the list identity reduces to a set hash over
        // the (label, count) pairs — no per-subject array ever materializes
        // (a 10^6-out-degree hub would otherwise build a 10^6-element row
        // in one aggregation buffer). The pairs within one subject are
        // distinct, so XOR is a sound set hash; two independently-salted
        // 64-bit XORs + the set width make collisions negligible, and XOR
        // is commutative so map-side partial aggregation applies everywhere
        // (no ANSI overflow, unlike a sum of full-range hashes).
        val perLabel = edges.groupBy("src", "label").agg(count(lit(1)).as("c"))
        perLabel
          .withColumn("h1", xxhash64(col("label"), col("c")))
          .withColumn("h2", xxhash64(col("c"), col("label"), lit(0x9e3779b9L)))
          .groupBy("src")
          .agg(expr("bit_xor(h1)").as("hx1"),
            expr("bit_xor(h2)").as("hx2"),
            count(lit(1)).as("width"))
          .groupBy("hx1", "hx2", "width").agg(count(lit(1)).as("c"))
    }
    perList.agg(
      (lit(1.0) - try_divide(count(lit(1)).cast("double"), sum("c"))).as("repeated_predicate_lists"),
      max("c").cast("long").as("max_predicate_list_degree"),
      try_divide(sum("c").cast("double"), count(lit(1))).as("mean_predicate_list_degree"))
  }

  /** A33/A34 (`typed_subjects_objects.py:4-46`): distinct classes, typed
    * subjects and their ratio over |S|. `typeLabel` is the hashed rdf:type
    * predicate (gfunctions.RdfTypeHash for N-Triples parity) or any
    * engine-level type-predicate hash.
    */
  def typedMeasures(edges: DataFrame, typeLabel: String): DataFrame = {
    val typed = edges.where(col("label") === typeLabel)
    val t = typed.agg(
      count_distinct(col("dst")).as("distinct_classes"),
      count_distinct(col("src")).as("typed_subjects"))
    val s = edges.agg(count_distinct(col("src")).as("s_count"))
    t.crossJoin(s).select(
      col("distinct_classes"),
      col("typed_subjects"),
      try_divide(col("typed_subjects").cast("double"), col("s_count")).as("ratio_of_typed_subjects"))
  }
}
