package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine. All are shuffle-bounded
  * by blocking (a pair is only materialized when a block key collides), the
  * standard web-scale shape — never an unblocked cross join.
  */
object Dedup {

  /** Exact dedup by text hash: one row per duplicate group with the kept
    * (minimum) id and the group size.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Candidate pairs (a < b) sharing at least one k-token shingle, with
    * exact Jaccard similarity over shingle sets. Blocking = the shingle
    * itself; `jaccard >= minJ` filters the final pair list.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, minJ: Double): DataFrame = {
    val sh = TextOps.shingles(docs, idCol, textCol, k)
      .select(col(idCol).as("id"), col("shingle")).distinct()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"), col("x.shingle") === col("y.shingle"))
      .where(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sb"), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .where(col("jaccard") >= minJ)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** (a_i, b_i) coefficients for the portable MinHash family — literal so
    * the DuckDB oracle twin uses the identical family.
    */
  val MinhashCoeffs: Seq[(Long, Long)] = Seq(
    (387563L, 1759177L), (817237L, 932587L), (523541L, 144611L), (995837L, 662833L),
    (317489L, 875929L), (661393L, 421807L), (739217L, 582341L), (258911L, 742297L))
  val MinhashPrime = 2147483647L

  /** MinHash signatures: (id, i, minhash_i) for i in 0..k-1 over k-shingles.
    * h31 keeps a_i * h < 2^51 — no overflow under ANSI mode.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int): DataFrame = {
    val sh = TextOps.shingles(docs, idCol, textCol, shingleK)
      .select(col(idCol).as("id"), TextOps.portableHash31(col("shingle")).as("h"))
      .distinct()
    val coeffs = MinhashCoeffs.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF_(docs)
    sh.crossJoin(broadcast(coeffs))
      .withColumn("hv", (col("a") * col("h") + col("b")) % MinhashPrime)
      .groupBy("id", "i").agg(min("hv").as("mh"))
  }

  private implicit class SeqOps(private val s: Seq[(Int, Long, Long)]) {
    def toDF_(ref: DataFrame): DataFrame = {
      val spark = ref.sparkSession
      import spark.implicits._
      s.toDF("i", "a", "b")
    }
  }

  /** LSH candidate pairs: band signatures of `rowsPerBand` minhashes; two
    * docs are candidates iff at least one band signature matches. Returns
    * distinct (a, b) with a < b.
    */
  def minhashLshCandidates(signatures: DataFrame, rowsPerBand: Int): DataFrame = {
    val banded = signatures
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy("id", "band")
      .agg(concat_ws(",", sort_array(collect_list(concat(col("i"), lit(":"), col("mh"))))).as("sig"))
    banded.as("x").join(banded.as("y"),
      col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** SimHash near-dup pairs with pigeonhole banding: the 16 bits split into
    * 4 nibble bands; any pair with Hamming distance <= 3 must agree on at
    * least one band, so joining per-band keys is a lossless blocking for
    * maxHamming <= 3 — never an unblocked cross join.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "nibble banding is only lossless for maxHamming <= 3")
    val sh = TextOps.simhash16(docs, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash"))
    val banded = sh.select(col("id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("key", expr("shiftright(simhash, band * 4) & 15"))
    banded.as("x").join(banded.as("y"),
      col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct()
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .where(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Embedding near-dup pairs within a blocking key, cosine >= minCos. */
  def embeddingCosinePairs(embs: DataFrame, idCol: String, vecCol: String,
                           blockCol: String, minCos: Double): DataFrame = {
    val e = embs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      Similarity.toDoubleVec(col(vecCol)).as("v"))
    e.as("x").join(e.as("y"), col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .withColumn("cos", Similarity.cosine(col("x.v"), col("y.v")))
      .where(col("cos") >= minCos)
      .select(col("x.id").as("a"), col("y.id").as("b"), col("cos"))
  }
}
