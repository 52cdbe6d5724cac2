package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-Triples line scan, parity with lodcc's `parse_spo`
  * (`graph/building/edgelist.py:11-15`) and its skip rules
  * (`edgelist.py:74-76`): drop empty lines and lines starting "# ";
  * split on single spaces; subj = token 0, pred = token 1,
  * obj = join(tokens[2:-1]) (the trailing "." token is dropped, objects may
  * contain spaces). Pure column expressions — stays in whole-stage codegen
  * and lets Catalyst push the line filters into the text scan.
  */
object NTriples {

  /** lines(value: string) -> (subj, pred, obj). */
  def parse(lines: DataFrame): DataFrame =
    lines
      .where(length(trim(col("value"))) > 0 && !col("value").startsWith("# "))
      .withColumn("t", split(col("value"), " "))
      .where(size(col("t")) >= 4) // header sanity check, edgelist.py:50-65
      .select(
        element_at(col("t"), 1).as("subj"),
        element_at(col("t"), 2).as("pred"),
        // greatest(...,0): slice must stay total even if Catalyst evaluates
        // the projection before the size>=4 guard (ANSI slice throws on
        // negative length)
        array_join(slice(col("t"), lit(3), greatest(size(col("t")) - 3, lit(0))), " ").as("obj"))

  /** Read .nt files from a path (text source handles .gz etc natively). */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))
}
