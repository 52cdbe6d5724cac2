package graft.io

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.extract.Gazetteer

/** Deterministic synthetic multi-turn transcripts (FIXTURES.md §B).
  *
  * Matches `BASELINE.json.input_hint` exactly:
  * `(conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp)`. Generation is a pure function of (seed, conv, turn) via
  * the counter-based [[Prng]] — identical output at any parallelism level.
  *
  * A fixed skew block (every 97th conversation gets 64x turns) exercises the
  * salted-key / AQE-skew handling that the north rule requires at
  * 10^12-turn scale.
  */
object Transcripts {

  final val Seed = 42L
  final val BaseEpochMs = 1767225600000L // 2026-01-01T00:00:00Z

  private val userTpl = Vector(
    "Hey, can you tell me about %P% and their work at %O%?",
    "What do you know about %P% from %L%?",
    "I was reading about %O% yesterday. Does %P% still work there?",
    "Quick question: is %O% headquartered in %L%?",
    "Please compare %P% and %P2% for me.",
    "Who runs the %L% office of %O%?")

  private val assistantTpl = Vector(
    "%P% works at %O% and is currently based in %L%.",
    "As far as I can tell, %O% is headquartered in %L%.",
    "%P% collaborated with %P2% on several projects at %O%.",
    "There is no public record of %P% visiting %L% recently.",
    "Sure - %O% was founded in %L%, and %P% joined a few years later.",
    "According to my notes, %P2% reports to %P% at %O%.")

  private val toolTpl = Vector(
    "result: %P% | %O% | %L%",
    "lookup(%P%) -> employer=%O%; location=%L%",
    "rows=1: name=%P%, org=%O%, city=%L%")

  /** Pick an alias variant of entity list `es` at skewed index. */
  private def pick(es: IndexedSeq[Gazetteer.Entity], stream: Long, ctr: Long, skew: Boolean): (Gazetteer.Entity, String) = {
    val n = es.length
    val r = Prng.at(Seed, stream, ctr)
    val u = ((r >>> 11).toDouble / (1L << 53).toDouble) // [0,1)
    val idx = if (skew) math.min(n - 1, (u * u * u * n).toInt) else math.min(n - 1, (u * n).toInt)
    val e = es(idx)
    val a = e.aliases(Prng.nextInt(Seed, stream ^ 0x5aL, ctr, e.aliases.length))
    (e, a)
  }

  /** Number of turns for conversation c: 1..16 uniform, 64x every 97th. */
  def turnsFor(conv: Long): Int = {
    val base = 1 + Prng.nextInt(Seed, 1L, conv, 16)
    if (conv % 97 == 0) base * 64 else base
  }

  def convId(conv: Long): String = f"conv-$conv%08d"

  /** Build one turn — the single source of truth for row content. */
  def turn(conv: Long, turnIdx: Int): Turn = {
    val ctr = conv * 1048576L + turnIdx
    val role =
      if (turnIdx % 5 == 4) "tool"
      else if (turnIdx % 2 == 0) "user"
      else "assistant"
    val (p, pa) = pick(Gazetteer.people, 10L, ctr, skew = true)
    val (_, p2a) = {
      // second person distinct from the first
      val others = Gazetteer.people.filterNot(_.id == p.id)
      pick(others, 11L, ctr, skew = false)
    }
    val (_, oa) = pick(Gazetteer.orgs, 12L, ctr, skew = true)
    val (_, la) = pick(Gazetteer.places, 13L, ctr, skew = true)
    val bank = role match {
      case "user"      => userTpl
      case "assistant" => assistantTpl
      case _           => toolTpl
    }
    val tpl = bank(Prng.nextInt(Seed, 14L, ctr, bank.length))
    val text = tpl
      .replace("%P2%", p2a)
      .replace("%P%", pa)
      .replace("%O%", oa)
      .replace("%L%", la)
    val toolName =
      if (role == "tool") Gazetteer.tools(Prng.nextInt(Seed, 15L, ctr, Gazetteer.tools.length)).id.stripPrefix("tool:")
      else ""
    val ts = new Timestamp(BaseEpochMs + conv * 3600000L % 31536000000L + turnIdx * 7000L)
    Turn(convId(conv), turnIdx, role, text, toolName, ts)
  }

  /** Distributed synthesis of `nConvs` conversations. */
  def generate(spark: SparkSession, nConvs: Long, partitions: Int = 32): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, nConvs, 1, partitions).flatMap { conv =>
      val n = turnsFor(conv)
      (0 until n).iterator.map(t => turn(conv, t))
    }
  }
}
