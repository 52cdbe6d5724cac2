package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weakly-connected components via alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * — O(log n) rounds, no giant-frontier propagation, robust to skewed
  * components (a star with a hot hub shrinks in one round instead of
  * funneling through one reducer for `diameter` rounds).
  *
  * lodcc analog: `label_largest_component` (`edge_based.py:18`); the same
  * kernel canonicalizes entities after MinHash-LSH blocking (north rule).
  *
  * Input: edge DataFrame with columns (src, dst) — direction ignored.
  * Output: (vertex, component) where component = min vertex id reachable.
  */
object ConnectedComponents {

  /** Symmetrize in ONE scan: each (src, dst) row explodes to both
    * directions, self-loops dropped. The generator reads the input once;
    * dedup happens via [[dedupPairs]] on the skew-free (u, v) key.
    */
  private def symmetrized(edges: DataFrame): DataFrame =
    dedupPairs(edges.where(col("src") =!= col("dst"))
      .select(explode_outer(array(
        struct(col("src").as("u"), col("dst").as("v")),
        struct(col("dst").as("u"), col("src").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v")))

  /** Deduplicate (u, v) pairs on the PAIR key, deliberately NOT on `u`
    * alone. Two measured reasons (284M-edge bench leg, BASELINE.md round-5
    * probe matrix):
    *
    *  - **Skew.** Real transcript graphs have hub vertices (hot
    *    conversations / ubiquitous entities): the bench table's hottest
    *    u-group is 3.16M of 61.7M symmetrized pairs (p50 degree = 8, max =
    *    3.16M). A `repartition(col("u"))` (the proto-9 shape) funnels every
    *    copy of a hot key — 9.2x duplicated pre-dedup, ~28M rows — into ONE
    *    partition, a straggler that caps the whole stage at high core
    *    counts while leaving low-core legs unaffected (uniform 2.2-3.0x
    *    instead of 4x per-phase speedup, the shuffle-leg gate failure).
    *    Hash-partitioning on (u, v) spreads a hot u across the cluster by
    *    its v's; the u-keyed star joins that DO need co-location by u are
    *    left to AQE's skew-join splitting (see the session configs in
    *    Bench/LegRunner), the salted-hot-conversations contract of the
    *    north rule expressed with the built-in optimizer rule instead of
    *    hand salting.
    *  - **Map-side combine.** `dropDuplicates` plans a partial
    *    HashAggregate BEFORE its exchange; repeated mentions of the same
    *    entity pair inside one conversation are co-located in the scan
    *    partition and collapse before the wire, where `repartition`
    *    ships every copy.
    */
  private def dedupPairs(pairs: DataFrame): DataFrame =
    pairs.dropDuplicates("u", "v")

  /** Vertex ids that iterate cheaply as-is — anything else goes through the
    * order-free hash encode in [[run]] (8-byte longs shuffle 2-4x fewer
    * bytes per round than UTF8 strings; measured 43 -> 22 s at 8 cores on
    * the 71M-edge bench leg, and the savings compound at every round of
    * every rerun).
    */
  private def numericVertices(edges: DataFrame): Boolean = {
    import org.apache.spark.sql.types._
    Seq(edges.schema("src").dataType, edges.schema("dst").dataType).forall {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
  }

  /** Component assignment over arbitrary vertex ids. Non-numeric ids on
    * LARGE graphs (|V| >= `encodeMinVertices`) are hash-encoded to longs
    * for the fixpoint (the iterated shuffles carry 8-byte keys instead of
    * strings — the same move as lodcc's hashed int edgelist, SURVEY §2.1
    * S11) and decoded after: the hash only has to be INJECTIVE on this
    * graph's vertex set, which is verified against the vertex universe
    * (one count_distinct over |V|); on the astronomically rare collision
    * the kernel falls back to iterating the original ids. Component NAMING
    * is restored exactly — component = min ORIGINAL vertex id over the
    * members — by a |V|-sized regroup, so callers (canonicalization's
    * "min surface" contract, the DuckDB oracles) see byte-identical output
    * either way.
    *
    * The |V| threshold exists because the decode costs three small
    * shuffles (vh join, naming regroup, naming join): on a 71M-edge /
    * 1M-vertex graph the encode wins 43 -> 22 s at 8 cores, but on the
    * latency-bound small graphs the suite's canonicalization chains feed
    * (|V| ~ 10^4) those three extra jobs ADDED ~2-3.5 s per query
    * (measured, protocol runs 16 vs 17) while saving nothing — byte
    * savings only pay when the per-round shuffle volume dominates the
    * per-round job latency.
    */
  def run(edges: DataFrame, maxIter: Int = 50,
          encodeMinVertices: Long = 500000L): DataFrame = {
    // vertex universe, pinned EAGERLY while the input chain is being paid
    // anyway: the final fill must see every input vertex (incl.
    // self-loop-only ones the pairs drop), and deriving it lazily from
    // `edges` re-evaluated the caller's entire upstream plan once per
    // consumption of the result — for a caller whose edge table is an
    // expensive similarity chain (incremental canonicalization) that
    // tripled the query
    val allVs = timed("allVs")(edges
      .select(explode_outer(array(col("src"), col("dst"))).as("vertex"))
      .distinct() // one scan, not union-of-two-selects (halves input decode)
      .localCheckpoint(true))

    if (numericVertices(edges)) return fill(allVs, fixpoint(edges, maxIter))
    // the count scans the checkpoint blocks, not the caller's plan
    val nV = timed("countV")(allVs.count())
    if (nV < encodeMinVertices) return fill(allVs, fixpoint(edges, maxIter))

    val vmap = allVs.select(col("vertex"), xxhash64(col("vertex")).as("vh"))
    val nh = timed("collisionChk")(
      vmap.agg(count_distinct(col("vh")).as("nh")).head().getLong(0))
    if (nh != nV)
      return fill(allVs, fixpoint(edges, maxIter)) // hash collision: iterate originals

    val enc = edges.select(
      xxhash64(col("src")).as("src"), xxhash64(col("dst")).as("dst"))
    val ccL = fixpoint(enc, maxIter) // (vertex: long, component: long)
    // decode (|V|-sized): original vertex -> long component group, then
    // restore canonical naming as the min original member id
    val withComp = vmap
      .join(ccL.withColumnRenamed("vertex", "vh"), Seq("vh"), "left_outer")
      .select(col("vertex"), col("component"))
    val naming = withComp.where(col("component").isNotNull)
      .groupBy("component").agg(min("vertex").as("cname"))
    withComp.join(naming, Seq("component"), "left_outer")
      .select(col("vertex"),
        coalesce(col("cname"), col("vertex")).as("component"))
  }

  /** Every universe vertex gets its assignment; edge-free ones are their
    * own component.
    */
  private def fill(allVs: DataFrame, asSelf: DataFrame): DataFrame =
    allVs.join(asSelf, Seq("vertex"), "left_outer")
      .select(col("vertex"), coalesce(col("component"), col("vertex")).as("component"))

  /** Large-star/small-star fixpoint over vertices that appear in at least
    * one non-self-loop edge; returns (vertex, component = min reachable id
    * under the INPUT type's ordering).
    */
  // diagnostics only: per-phase walls on stderr when SPARK_GRAFT_CC_TIMING
  // is set (used by tools.CcLegProbe to attribute leg scaling)
  private def timed[T](what: String)(f: => T): T =
    if (!sys.env.contains("SPARK_GRAFT_CC_TIMING")) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[cc] $what%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

  private def fixpoint(edges: DataFrame, maxIter: Int): DataFrame = {
    var pairs = symmetrized(edges)
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (sys.env.contains("SPARK_GRAFT_CC_TIMING")) timed("symmetrize")(pairs.count())

    var converged = false
    var iter = 0
    var prevSig: (Long, Long) = (-1L, -1L)
    while (!converged && iter < maxIter) {
      // large-star: connect every neighbor v > u to m = min(N(u) u {u})
      val ls = {
        val mins = pairs.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("mn"))
        pairs.join(mins, "u")
          .where(col("v") > col("u"))
          .select(col("v").as("a"), col("mn").as("b"))
          .where(col("a") =!= col("b"))
      }
      // small-star: for each u, connect all neighbors v <= u (and u) to the min
      val ss = {
        val smaller = ls.select(
          greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        val mins = smaller.groupBy("u").agg(min(col("v")).as("mn"))
        smaller.join(mins, "u")
          .select(col("v").as("a"), col("mn").as("b"))
          .union(mins.select(col("u").as("a"), col("mn").as("b")))
          .where(col("a") =!= col("b"))
      }
      // EAGER localCheckpoint — deliberately. A lazy checkpoint folded into
      // the signature job looks like it saves a job launch, but `ss` feeds
      // `next` through a generator and `ls` feeds `ss` twice; with nothing
      // materialized in between, the un-truncated branches recompute the
      // round's shuffle tree 2-4x inside the one job (measured: round 1 on
      // the 71M-edge bench table 56 s lazy vs 22 s eager at 8 cores). The
      // extra signature job scans cached blocks and costs ~0.1 s.
      // Dedup happens ONCE per round, after the symmetrizing explode, via
      // dedupPairs — partial-aggregated map-side and hash-spread on the
      // skew-free (u, v) key (see dedupPairs for the hot-hub measurement).
      val next = timed(s"star$iter")(dedupPairs(
        ss.select(explode_outer(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("a").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v")))
        .localCheckpoint(true))

      // overflow-free set signature: count + bitwise XOR of row hashes
      // (rows are distinct, so XOR is a faithful multiset-free signature)
      val sigRow = timed(s"round$iter")(next.agg(
        count(lit(1)).as("c"),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head())
      val sig = (sigRow.getLong(0), sigRow.getLong(1))
      converged = sig == prevSig
      prevSig = sig
      iter += 1
      pairs.unpersist(false)
      pairs = next
    }
    // pairs now (member, root) star: component = min neighbor (or self for roots)
    val comp = pairs.groupBy(col("u").as("vertex")).agg(min(col("v")).as("component"))
    comp.select(
      col("vertex"),
      least(col("vertex"), col("component")).as("component"))
  }

  /** (component, size) ordered by size desc. */
  def componentSizes(cc: DataFrame): DataFrame =
    cc.groupBy("component").agg(count(lit(1)).as("size"))

  /** Vertices of the largest component (ties: smallest component id wins). */
  def largestComponent(cc: DataFrame): DataFrame = {
    val top = componentSizes(cc)
      .orderBy(col("size").desc, col("component").asc).limit(1)
    cc.join(broadcast(top), "component").select("vertex")
  }
}
