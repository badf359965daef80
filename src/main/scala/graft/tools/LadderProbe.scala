package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage attribution for q408's ladder census at replica
  * scale (corpus build vs normalization vs multi-distinct agg). */
object LadderProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfrep100")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    val base = graft.queries.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val draw = conv(substring(md5(col("doc_id").cast("string")),
      1, 4), 16, 10).cast("long")
    val corpus = base
      .union(base.filter(draw % 7 === 0)
        .select(col("doc_id") + 10000000L, upper(col("text"))))
      .union(base.filter(draw % 11 === 3)
        .select(col("doc_id") + 20000000L,
          concat(lit(" "), col("text"), lit(" !!"))))
      .union(base.filter(draw % 13 === 5)
        .select(col("doc_id") + 30000000L,
          concat(col("text"), lit(" rev 1"))))
      .union(base.filter(draw % 13 === 5)
        .select(col("doc_id") + 40000000L,
          concat(col("text"), lit(" rev 2"))))
    val n2 = trim(regexp_replace(regexp_replace(lower(col("text")),
      "[^a-z0-9 ]", " "), " +", " "))
    for (r <- 1 to 2) {
      time(s"r$r corpus count")(corpus.count())
      time(s"r$r norm only (sum lengths)")(
        corpus.select(length(n2).as("l")).agg(sum("l"))
          .collect()(0).getLong(0))
      time(s"r$r md5 only")(
        corpus.select(md5(col("text")).as("h0"))
          .agg(countDistinct("h0")).collect()(0).getLong(0))
      time(s"r$r one distinct on norm")(
        corpus.select(md5(n2).as("h2"))
          .agg(countDistinct("h2")).collect()(0).getLong(0))
      time(s"r$r full 4-distinct")(
        corpus.select(md5(col("text")).as("h0"),
          md5(lower(col("text"))).as("h1"), md5(n2).as("h2"),
          md5(regexp_replace(n2, "[0-9]", "#")).as("h3"))
          .agg(count(lit(1)), countDistinct("h0"), countDistinct("h1"),
            countDistinct("h2"), countDistinct("h3"))
          .collect()(0).getLong(0))
    }
    spark.stop()
  }
}
