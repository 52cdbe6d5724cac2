package graft.io

/** Splittable counter-based PRNG (SplitMix64 finalizer). Deterministic by
  * construction — no `Math.random`/`new java.util.Random` anywhere, so the
  * synthesized transcripts table is bit-identical across runs, partitionings
  * and parallelism levels (FIXTURES.md §B requirement).
  */
object Prng {
  final val GoldenGamma = 0x9e3779b97f4a7c15L

  /** SplitMix64 mix of a 64-bit counter. */
  def mix(z0: Long): Long = {
    var z = z0 + GoldenGamma
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hash a (seed, stream, counter) coordinate to a 64-bit value. */
  def at(seed: Long, stream: Long, counter: Long): Long =
    mix(mix(mix(seed) ^ stream) ^ counter)

  /** Uniform int in [0, bound) — bound must be > 0 and small vs 2^64. */
  def nextInt(seed: Long, stream: Long, counter: Long, bound: Int): Int = {
    val v = at(seed, stream, counter)
    (((v >>> 1) % bound).toInt + bound) % bound
  }
}
