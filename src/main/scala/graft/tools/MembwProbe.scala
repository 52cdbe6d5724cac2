package graft.tools

/** Pure-JVM memory-bandwidth probe for the scaling-leg instrument (the
  * read-bandwidth sibling of [[graft.Bench]]'s cpuProbe): `threads` workers
  * stream disjoint chunks of ONE fixed-size working set (default 8 GiB of
  * longs — far past LLC, same order as a CC-leg shuffle round), each doing
  * stride-1 sums until every pass completes; prints aggregate GB/s (best of
  * `runs`).
  *
  * Purpose: a single socket shares its memory channels across all pinned
  * cores, so a bandwidth-bound phase cannot speed up 4x from 2 to 8 cores
  * no matter the code — this probe MEASURES that host ceiling
  * (`membw_ceiling_2_to_8 = (gbps@8 / gbps@2) / 4`) the same way
  * cpu_probe measures the 8->32 SMT/turbo ceiling. A real cluster scales
  * memory channels with node count; local[N] cannot.
  *
  * Usage: MembwProbe <threads> [runs] [gib]   (run under the same
  * `taskset -c` pin as the leg being explained).
  */
object MembwProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val runs = if (args.length > 1) args(1).toInt else 3
    val gib = if (args.length > 2) args(2).toInt else 8

    val words = gib.toLong << 27 // longs per GiB
    require(words <= Int.MaxValue.toLong, "working set must fit one array")
    val n = words.toInt
    val a = new Array[Long](n)
    java.util.Arrays.fill(a, 0x9e3779b97f4a7c15L) // touch every page

    val chunk = n / threads
    @volatile var sink = 0L
    def once(): Double = {
      val ts = (0 until threads).map { i =>
        new Thread(() => {
          val lo = i * chunk
          val hi = if (i == threads - 1) n else lo + chunk
          var s = 0L
          var pass = 0
          while (pass < 2) { // 2 passes so the timed window dwarfs startup
            var j = lo
            while (j < hi) { s += a(j); j += 1 }
            pass += 1
          }
          sink ^= s // defeat dead-code elimination
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      2.0 * n * 8L / sec / 1e9 // GB touched / wall
    }
    val best = (1 to runs).map(_ => once()).max
    println(f"""{"threads":$threads,"gbps":$best%.2f,"sink":${sink != 0}}""")
  }
}
