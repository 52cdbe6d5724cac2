package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine. All are shuffle-bounded
  * by blocking (a pair is only materialized when a block key collides), the
  * standard web-scale shape — never an unblocked cross join.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Dedup")

  /** Exact dedup by text hash: one row per duplicate group with the kept
    * (minimum) id and the group size.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Candidate pairs (a < b) sharing at least one k-token shingle with
    * document frequency <= `maxDf`, with EXACT Jaccard similarity over the
    * full shingle sets; `jaccard >= minJ` filters the final pair list.
    *
    * Blocking-key hygiene (the web-scale guard): without the df cap, the
    * candidate count is Σ df(shingle)² — one stop-shingle shared by 10⁶ docs
    * is a single-key ~10¹² pair explosion. Shingles with df > maxDf are
    * dropped from CANDIDATE GENERATION only (the drop is logged); the Jaccard
    * value itself is still computed exactly over every shingle, so surviving
    * pairs have exact scores. Pairs whose only common shingles are hot ones
    * are missed — the standard, documented recall trade of df-capped
    * blocking. `maxDf <= 0` disables the cap (test-scale only).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, minJ: Double, maxDf: Int = 1000): DataFrame = {
    val sh = TextOps.shingles(docs, idCol, textCol, k)
      .select(col(idCol).as("id"), col("shingle")).distinct()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val blocked = if (maxDf > 0) {
      val dfTab = sh.groupBy("shingle").agg(count(lit(1)).as("df")).cache()
      val hot = dfTab.where(col("df") > maxDf)
      val Array(dropped, droppedRows) = hot
        .agg(count(lit(1)), coalesce(sum("df"), lit(0L))).head()
        .toSeq.map(_.asInstanceOf[Long]).toArray
      if (dropped > 0)
        log.warn(s"ngramJaccardPairs: dropped $dropped shingles with df > $maxDf " +
          s"($droppedRows doc-shingle rows) from candidate generation")
      sh.join(broadcast(hot.select("shingle")), Seq("shingle"), "left_anti")
    } else sh
    val cands = blocked.as("x").join(blocked.as("y"), Seq("shingle"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    // exact intersection over the FULL shingle sets (equi-join = set ∩)
    val inter = cands
      .join(sh.select(col("id").as("a"), col("shingle")), "a")
      .join(sh.select(col("id").as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
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
    *
    * MAP-ONLY: the shingle set, its hashes, and all k minima are computed
    * as array expressions inside one projection — the composed twin
    * ([[minhashSignaturesComposed]]) pays a distinct shuffle plus a
    * coeff-crossJoin-groupBy shuffle for the same result. Documents with
    * no shingle (shorter than shingleK tokens) emit no rows, matching the
    * composed path.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val idx = when(size(toks) >= shingleK,
      sequence(lit(0), size(toks) - shingleK)).otherwise(typedlit(Seq.empty[Int]))
    // materialize the hashed distinct-shingle array ONCE per row, in its own
    // projection: the k array_min passes below reference the stored array,
    // so the md5 per shingle is computed once, not once per coefficient
    // (k+1 interpreted re-evaluations of the md5 transform was a 10x
    // regression at sf0.1)
    val hashed = docs.select(col(idCol).as("id"),
      array_distinct(transform(idx,
        i => TextOps.portableHash31(array_join(slice(toks, i + 1, lit(shingleK)), " "))))
        .as("hs"))
    val sigs = array(MinhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("i"),
        array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % MinhashPrime)).as("mh"))
    }: _*)
    hashed.select(col("id"), explode(when(size(col("hs")) > 0, sigs)
      .otherwise(typedlit(Seq.empty[(Int, Long)]).cast("array<struct<i:int,mh:bigint>>")))
      .as("sig"))
      .select(col("id"), col("sig.i").as("i"), col("sig.mh").as("mh"))
  }

  /** Composed-operator twin of [[minhashSignatures]] (cross-check). */
  def minhashSignaturesComposed(docs: DataFrame, idCol: String, textCol: String,
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

  /** SimHash near-dup pairs with pigeonhole banding over a `bits`-wide
    * SimHash (default 60): the hash splits into `maxHamming + 1` bands, so
    * any pair with Hamming distance <= maxHamming must agree on at least one
    * whole band — the banded equi-join is a LOSSLESS blocking, never an
    * unblocked cross join. Each band key is ~bits/(maxHamming+1) wide
    * (15 bits at the defaults -> 32,768 distinct keys per band), which keeps
    * buckets selective at web scale — the 16-bit variant's 16 values per
    * nibble band collapse into enormous buckets at >=10^8 docs.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, bits: Int = 60): DataFrame = {
    val bands = maxHamming + 1
    require(bits >= bands, s"need at least one bit per band ($bands bands)")
    val bandBits = (bits + bands - 1) / bands // ceil: every bit covered
    val sh = TextOps.simhash(docs, idCol, textCol, bits)
      .select(col(idCol).as("id"), col("simhash"))
    val banded = sh.select(col("id"), col("simhash"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("key",
        expr(s"shiftright(simhash, band * $bandBits) & ${(1L << bandBits) - 1}"))
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

  /** Embedding near-dup pairs within a blocking key, cosine >= minCos.
    *
    * The pair count is quadratic WITHIN each block, so the block cardinality
    * is audited up front: the max block size is logged always, and when
    * `maxBlock > 0` any block larger than that is sub-blocked by a
    * deterministic sign-LSH bucket (`subBlockPlanes` hyperplanes) before the
    * self-join — bounding the quadratic term at the cost of missing pairs
    * that a hyperplane separates inside an oversized block (documented
    * recall trade; small blocks are untouched, so default-call semantics on
    * bounded blocks are exact). `maxBlock <= 0` keeps the exact all-pairs
    * behavior with the audit log only.
    */
  def embeddingCosinePairs(embs: DataFrame, idCol: String, vecCol: String,
                           blockCol: String, minCos: Double,
                           maxBlock: Long = 0L, subBlockPlanes: Int = 4): DataFrame = {
    val e0 = embs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      Similarity.toDoubleVec(col(vecCol)).as("v"))
    val blockSizes = e0.groupBy("blk").agg(count(lit(1)).as("bsz"))
    val top = blockSizes.agg(max("bsz"), count(lit(1))).head()
    val (maxSz, nBlocks) = (top.getLong(0), top.getLong(1))
    log.info(s"embeddingCosinePairs: $nBlocks blocks, max block size $maxSz" +
      (if (maxBlock > 0 && maxSz > maxBlock)
        s" > maxBlock=$maxBlock -> sign-LSH sub-blocking ($subBlockPlanes planes)"
      else ""))
    val e =
      if (maxBlock > 0 && maxSz > maxBlock) {
        val buckets = Similarity.lshBucket(
          e0.select(col("id"), col("v").as("vec")), "id", "vec", subBlockPlanes)
        e0.join(blockSizes, "blk").join(buckets, "id")
          .withColumn("blk",
            when(col("bsz") > maxBlock,
              concat(col("blk").cast("string"), lit("#"), col("bucket").cast("string")))
              .otherwise(col("blk").cast("string")))
          .select("id", "blk", "v")
      } else e0
    e.as("x").join(e.as("y"), col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .withColumn("cos", Similarity.cosine(col("x.v"), col("y.v")))
      .where(col("cos") >= minCos)
      .select(col("x.id").as("a"), col("y.id").as("b"), col("cos"))
  }
}
