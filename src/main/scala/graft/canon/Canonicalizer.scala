package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.algo.ConnectedComponents
import graft.extract.Extractor
import graft.ops.{Dedup, TextOps}

/** Entity canonicalization (north rule): MinHash-LSH blocking over character
  * shingles of the normalized surface form, Jaccard verification, then the
  * iterative connected-components kernel merges transitive alias clusters.
  * Canonical id = lexicographically smallest member surface.
  *
  * Blocking keeps the pair space proportional to band-bucket collisions —
  * never |surfaces|^2 — and CC is the same large-star/small-star kernel used
  * for lodcc's largest-component measure (build once, use twice,
  * SURVEY.md §2.6 G3).
  */
object Canonicalizer {

  /** Star edges through the normalized form: for every group of surfaces
    * sharing one normalized form, one edge per member to the group hub
    * (min surface) — g-1 edges for a group of g, never the g²/2 of an
    * all-pairs self-join. CC output is identical (a star is connected),
    * but a popular normalized form ("the", OCR noise, boilerplate) stays
    * linear instead of exploding quadratically on one shuffle key.
    */
  private[graft] def exactNormEdges(withNorm: DataFrame): DataFrame = {
    val hubs = withNorm.groupBy("norm").agg(min("surface").as("hub"))
    withNorm.join(hubs, "norm")
      .where(col("surface") =!= col("hub"))
      .select(col("hub").as("src"), col("surface").as("dst"))
  }

  /** Character k-shingles of the normalized surface. */
  def charShingles(surfaces: DataFrame, k: Int): DataFrame = {
    val norm = Extractor.normalizeCol(col("surface"))
    surfaces
      .withColumn("norm", norm)
      .withColumn("sh_idx",
        when(length(col("norm")) >= k, sequence(lit(1), length(col("norm")) - (k - 1)))
          .otherwise(array(lit(1))))
      .select(col("surface"), col("norm"),
        explode(col("sh_idx")).as("i"))
      .select(col("surface"), col("norm").substr(col("i"), lit(k)).as("shingle"))
      .distinct()
  }

  /** surfaces(surface) -> (surface, canonical).
    *
    * Edges between surfaces: (a) identical normalized form; (b) MinHash-LSH
    * band collision verified at Jaccard >= minJ over char shingles.
    */
  def canonicalize(surfaces: DataFrame, shingleK: Int = 3,
                   rowsPerBand: Int = 2, minJ: Double = 0.5): DataFrame = {
    val s = surfaces.select(col("surface")).distinct().cache()
    val withNorm = s.withColumn("norm", Extractor.normalizeCol(col("surface")))

    // (a) exact edges through the normalized form (star, not all-pairs)
    val exactEdges = exactNormEdges(withNorm)

    // (b) near-dup edges: minhash signatures over char shingles. The
    // hashed distinct-shingle set is one array column (materialized once
    // per surface) and all signatures are array minima over it — MAP-ONLY,
    // where the composed formulation paid a distinct shuffle plus a
    // coeff-crossJoin-groupBy shuffle; at 10^8+ extracted surfaces those
    // two shuffles dominate the canonicalization stage
    val k = shingleK
    val idx = when(length(col("norm")) >= k,
      sequence(lit(1), length(col("norm")) - (k - 1)))
      .otherwise(array(lit(1)))
    val withHs = withNorm.withColumn("hs",
      array_distinct(transform(idx,
        i => TextOps.portableHash31(col("norm").substr(i, lit(k))))))
      .cache()
    // array form feeds the LSH directly — the signature table never
    // shuffles (Dedup.minhashLshCandidatesArrays scaladoc)
    val sigArrays = withHs.select(col("surface").as("id"),
      array(Dedup.MinhashCoeffs.map { case (a, b) =>
        array_min(transform(col("hs"),
          h => (lit(a) * h + lit(b)) % Dedup.MinhashPrime))
      }: _*).as("mhs"))
    val cands = Dedup.minhashLshCandidatesArrays(sigArrays, rowsPerBand)
    // exploded (id, h) rows for the exact-Jaccard verification joins
    val sh = withHs.select(col("surface").as("id"), explode(col("hs")).as("h"))

    // verify candidates at Jaccard >= minJ over the char shingle sets
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val verified = cands
      .join(sh.select(col("id").as("a"), col("h")), "a")
      .join(sh.select(col("id").as("b"), col("h")), Seq("b", "h")) // equi-join = set intersection
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("a"), col("sz").as("sa")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("sb")), "b")
      .where(col("inter").cast("double") / (col("sa") + col("sb") - col("inter")) >= minJ)
      .select(col("a").as("src"), col("b").as("dst"))

    val edges = exactEdges.union(verified)
    val cc = ConnectedComponents.run(edges)
    // surfaces that collected no edge are their own canonical form
    s.join(cc.withColumnRenamed("vertex", "surface"), Seq("surface"), "left_outer")
      .select(col("surface"), coalesce(col("component"), col("surface")).as("canonical"))
  }

  /** MLlib-built-in variant (SURVEY.md §7.5): char shingles -> binary
    * HashingTF vectors -> `ml.feature.MinHashLSH.approxSimilarityJoin` at
    * Jaccard distance <= 1-minJ, then the same exact-normalization edges and
    * CC merge as [[canonicalize]]. Kept alongside the portable-hash
    * implementation; both must agree on the gazetteer clusters (CanonSpec).
    */
  def canonicalizeML(surfaces: DataFrame, shingleK: Int = 3,
                     numHashTables: Int = 8, minJ: Double = 0.5): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val s = surfaces.select(col("surface")).distinct().cache()
    val withNorm = s.withColumn("norm", Extractor.normalizeCol(col("surface")))
    val exactEdges = exactNormEdges(withNorm)

    val shingleSets = charShingles(s, shingleK)
      .groupBy("surface").agg(collect_set(col("shingle")).as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = tf.transform(shingleSets)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(feats)
    val pairs = model.approxSimilarityJoin(feats, feats, 1.0 - minJ, "jaccard_dist")
      .select(col("datasetA.surface").as("src"), col("datasetB.surface").as("dst"))
      .where(col("src") < col("dst"))

    val cc = graft.algo.ConnectedComponents.run(exactEdges.union(pairs))
    s.join(cc.withColumnRenamed("vertex", "surface"), Seq("surface"), "left_outer")
      .select(col("surface"), coalesce(col("component"), col("surface")).as("canonical"))
  }

  /** Rewrite a triples table through the canonical map on subj and obj. */
  def applyTo(triples: DataFrame, mapping: DataFrame): DataFrame = {
    val m = broadcast(mapping)
    triples
      .join(m.select(col("surface").as("subj"), col("canonical").as("subj_c")), Seq("subj"), "left_outer")
      .join(m.select(col("surface").as("obj"), col("canonical").as("obj_c")), Seq("obj"), "left_outer")
      .select(
        col("conv_id"), col("turn_idx"),
        coalesce(col("subj_c"), col("subj")).as("subj"),
        col("pred"),
        coalesce(col("obj_c"), col("obj")).as("obj"))
  }
}
