// scratch decomposition main (not committed)
package graft
import org.apache.spark.sql.functions._
object TimeQ4 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("timeq4")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val ts = split(col("text"), " ")
    val sh = when(size(ts) >= 3,
      transform(sequence(lit(1), size(ts) - 2),
        i => array_join(slice(ts, i, lit(3)), "_")))
      .otherwise(array().cast("array<string>"))
    val shingled = d.select(col("doc_id"), array_join(sh, " ").as("shtext"))
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    val tok = shingled.select(col("doc_id").as("id"),
        explode(split(col("shtext"), " +")).as("token"))
      .where(length(col("token")) > 0).distinct().cache()
    t("tok")(tok.count())
    val sizes = tok.groupBy("id").agg(count(lit(1)).as("sz"))
    val dfreq = tok.groupBy("token").agg(count(lit(1)).as("df"))
    t("sizes")(sizes.count()); t("dfreq")(dfreq.count())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy(col("df"), col("token"))
    val prefix = tok.join(dfreq, "token")
      .withColumn("rn", row_number().over(w))
      .join(sizes, "id")
      .where(col("rn") <= col("sz") - ceil(lit(0.75) * col("sz")) + 1)
      .select(col("id"), col("token"), col("sz")).cache()
    t("prefix")(prefix.count())
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.token") === col("y.token") && col("x.id") < col("y.id") &&
          lit(0.75) * greatest(col("x.sz"), col("y.sz")) <=
            least(col("x.sz"), col("y.sz")))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct().cache()
    t("cands")(cands.count())
    val inter = cands
      .join(tok.select(col("id").as("a"), col("token")), "a")
      .join(tok.select(col("id").as("b"), col("token")), Seq("b", "token"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    t("verify")(inter.count())
    spark.stop()
  }
}
