package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 pack, third batch: embedding dispersion + repetition
  * exposure.
  */
class Pipeline82Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q401: the planted mode-collapse source is the unique 'collapsed'") {
    val rows = q("q401_embedding_dispersion").collect()
    val collapsed = rows.filter(_.getString(5) == "collapsed")
    assert(collapsed.length == 1, "exactly one source must collapse")
    // the collapsed source has ZERO dispersion (every vec is the rep)
    assert(collapsed.head.getLong(3) == 0L)
    assert(collapsed.head.getLong(4) == 0L)
    // healthy sources sit far from the threshold — near-unit-norm
    // embeddings with real spread read thousands of bp
    rows.filter(_.getString(5) == "ok").foreach { r =>
      assert(r.getLong(4) > 5000L,
        s"${r.getString(0)} dispersion ${r.getLong(4)} bp suspiciously low")
    }
    // moment identity sanity: msd <= 2 * mean norm^2 (triangle bound)
    rows.foreach(r => assert(r.getLong(3) <= 2L * r.getLong(2)))
  }

  test("q402: exposure buckets tile the cluster set; dup plants populate the tail") {
    val rows = q("q402_repetition_exposure").collect()
    assert(rows.nonEmpty)
    // cluster count equals the distinct-text count of the planted corpus
    val base = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val nDistinct = base.select(col("text")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nDistinct)
    // shares tile to <= 10000 bp (truncating div)
    val shareSum = rows.map(_.getLong(4)).sum
    assert(shareSum <= 10000L && shareSum >= 10000L - rows.length)
    // the 4-way dup plant x multi-epoch sources must push SOME content
    // past 4 repeats
    assert(rows.exists(r => r.getString(5) == "over_exposed" &&
      r.getLong(1) > 0L), "no over-exposed tail despite the dup plant")
    // verdict is a pure function of the bucket
    rows.foreach { r =>
      assert((r.getLong(0) * 500 >= 4000) == (r.getString(5) == "over_exposed"))
    }
  }

  test("q403: leakage evidence is eval-side only; the census rides the sentinels") {
    val rows = q("q403_split_neardup_leakage").collect()
    val (census, docs) = rows.partition(_.getLong(0) < 0L)
    assert(census.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((-1L, "val"), (-2L, "test")))
    census.foreach { r =>
      // leaked_bp rides the max_jaccard_bp column on sentinel rows
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
      assert(r.getLong(2) > 0L) // n_eval
    }
    assert(docs.nonEmpty, "no leaked docs despite the edit plant")
    docs.foreach { r =>
      assert(Set("val", "test").contains(r.getString(1)),
        "train docs must never be flagged")
      assert(r.getLong(2) >= 1L)
      // every flagged pair passed the 4/5 verify
      assert(r.getLong(3) >= 8000L && r.getLong(3) <= 10000L)
    }
    // the flagged count per split matches what the sentinel rate claims
    val nVal = docs.count(_.getString(1) == "val")
    val cVal = census.find(_.getString(1) == "val").get
    assert(cVal.getLong(3) == nVal * 10000L / cVal.getLong(2))
  }
}
