package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Pipeline13

/** Seeded randomized differentials for the session-3 text operators:
  * the HOF chains (run collapse, positional grams, clipped multiset
  * matching) vs their plain-Scala definitions on adversarial random
  * token streams (heavy stutters, repeated grams, single tokens). */
class TextOpsFuzzSpec extends SparkSpec {

  import spark.implicits._

  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector("a", "b", "c", "ab", "ba", "x")
    (1 to n).map { i =>
      val len = rnd.between(1, 30)
      val toks = (1 to len).map { _ =>
        val t = vocab(rnd.nextInt(vocab.size))
        // stutter injection: ~1/3 of tokens repeat 2–4 times
        if (rnd.nextInt(3) == 0) Seq.fill(rnd.between(2, 5))(t) else Seq(t)
      }.flatten
      (i.toLong, toks.mkString(" "))
    }
  }

  test("run collapse HOF == Scala reference on stutter-heavy random docs") {
    val docs = randomDocs(11, 200)
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"),
        expr("array_join(filter(transform(toks, (t, i) -> " +
          "struct(t AS t, i AS i)), s -> s.i = 0 OR toks[s.i - 1] != s.t)" +
          ".t, ' ')").as("clean"))
      .as[(Long, String)].collect().toMap
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+")
      val ref = toks.zipWithIndex
        .filter { case (t, i) => i == 0 || toks(i - 1) != t }
        .map(_._1).mkString(" ")
      assert(got(id) === ref, s"doc $id: ${got(id)} != $ref")
    }
  }

  test("positional bigrams HOF == Scala sliding(2) on random docs") {
    val docs = randomDocs(23, 200)
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), Pipeline13.grams("toks", 2).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").toSeq
      if (toks.length >= 2) {
        val ref = toks.sliding(2).map(_.mkString(" ")).toSeq
        assert(got(id) === ref, s"doc $id")
      }
    }
  }

  test("clipped multiset match == Scala min-count reference (ROUGE rule)") {
    val docs = randomDocs(37, 150)
    // the q193 shape on random data: candidate = drop every 3rd token
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 4)
      .withColumn("cand", Pipeline13.candidate)
      .select(col("doc_id"), explode(array(
        struct(Pipeline13.grams("cand", 2).as("g"), lit("c").as("side")),
        struct(Pipeline13.grams("toks", 2).as("g"), lit("r").as("side"))))
        .as("e"))
      .select(col("doc_id"), col("e.side").as("side"),
        explode(col("e.g")).as("g"))
      .groupBy("doc_id", "g")
      .agg(sum(when(col("side") === "c", 1L).otherwise(0L)).as("cc"),
        sum(when(col("side") === "r", 1L).otherwise(0L)).as("rc"))
      .groupBy("doc_id").agg(sum(least(col("cc"), col("rc"))).as("m2"))
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").toSeq
      if (toks.length >= 4) {
        val cand = toks.zipWithIndex
          .filter { case (_, i) => (i + 1) % 3 != 0 }.map(_._1)
        def multi(ts: Seq[String]) =
          ts.sliding(2).map(_.mkString(" ")).toSeq
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val cm = multi(cand); val rm = multi(toks)
        val ref = (cm.keySet ++ rm.keySet).toSeq
          .map(g => math.min(cm.getOrElse(g, 0L), rm.getOrElse(g, 0L))).sum
        assert(got(id) === ref, s"doc $id: ${got(id)} != $ref")
      }
    }
  }
}
