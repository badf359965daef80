package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CdcChunks kernel: differential vs a direct reference implementation
  * of the boundary rule, tiling invariants, edit-realignment property,
  * and the SQL registration.
  */
class CdcChunksSpec extends SparkSpec {

  import spark.implicits._

  private def refChunks(s: String, k: Int, mod: Int): Seq[String] = {
    if (s.isEmpty) return Seq.empty
    val nh = math.max(s.length - (k - 1), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val bounds = (0 until nh).filter { i =>
      md.reset()
      md.update(s.substring(i, math.min(i + k, s.length)).getBytes("UTF-8"))
      (md.digest()(0) & 0xff) % mod == 0
    }.map(_ + 1)
    val starts = (Seq(1) ++ bounds).distinct.sorted
    starts.zipWithIndex.map { case (st, j) =>
      val until = if (j + 1 < starts.length) starts(j + 1) - 1 else s.length
      s.substring(st - 1, until)
    }
  }

  private def viaSpark(in: Seq[String], k: Int, mod: Int): Seq[Seq[String]] =
    in.toDF("s")
      .select(functions.cdc_chunks(col("s"), k, mod).as("c"))
      .as[Seq[String]].collect().toSeq

  test("differential vs the reference rule on fixture texts") {
    val texts = graft.queries.Tables.documents(spark, sf)
      .select(col("text")).as[String].collect().toSeq
    val got = viaSpark(texts, 8, 16)
    texts.zip(got).foreach { case (t, chunks) =>
      assert(chunks == refChunks(t, 8, 16), s"diverged on: ${t.take(60)}")
      // chunks tile the text exactly
      assert(chunks.mkString == t)
    }
  }

  test("differential on short/degenerate strings and other (k, mod)") {
    val edges = Seq("", "a", "abcdefg", "abcdefgh", "x" * 40,
      "the same the same the same")
    for (k <- Seq(4, 8); mod <- Seq(4, 16)) {
      val got = viaSpark(edges, k, mod)
      edges.zip(got).foreach { case (t, chunks) =>
        assert(chunks == refChunks(t, k, mod), s"k=$k mod=$mod on '$t'")
      }
    }
  }

  test("a prefix edit realigns boundaries — tail chunks are shared") {
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val edited = "EDITED INTRO " + base
    val Seq(a, b) = viaSpark(Seq(base, edited), 8, 16)
    val shared = a.toSet.intersect(b.toSet)
    // most of the base's chunk mass must reappear in the edited copy
    val sharedBytes = a.filter(shared.contains).map(_.length).sum
    assert(sharedBytes * 10 > base.length * 7,
      s"only $sharedBytes of ${base.length} bytes realigned")
  }

  test("cdc_chunks callable from SQL, matches the Column builder") {
    GraftExtensions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT cdc_chunks('the quick brown fox jumps over it', 8, 16) AS c")
      .as[Seq[String]].collect().head
    val viaColumn = viaSpark(Seq("the quick brown fox jumps over it"), 8, 16).head
    assert(viaSql == viaColumn)
  }
}
