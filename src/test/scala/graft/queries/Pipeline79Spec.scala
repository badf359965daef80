package graft.queries

import graft.SparkSpec

/** Round-14 pack, sixth batch: the release-cut composition. */
class Pipeline79Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q392: stages gate in order; kept rows carry the full record") {
    val rows = q("q392_release_pipeline").collect()
    assert(rows.nonEmpty)
    val stages = Set("duplicate", "low_quality", "contaminated", "kept")
    val byStage = rows.groupBy(_.getString(3)).view.mapValues(_.length)
    stages.foreach(st =>
      assert(byStage.getOrElse(st, 0) > 0, s"stage $st never fired"))
    val perSourceRoot = scala.collection.mutable.Map.empty[String, String]
    val perSourceAlloc = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { r =>
      val (id, src, verdict, stage) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
      assert(stages.contains(stage))
      assert(verdict == (if (stage == "kept") "keep" else "drop"))
      stage match {
        case "duplicate" =>
          assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
          assert(id >= 10000000L,
            s"min-id rep $id dropped as duplicate")
        case "low_quality" =>
          assert(r.getLong(4) < 500L)
          assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
        case "contaminated" =>
          assert(r.getLong(4) >= 500L && id % 50 == 0,
            s"$id contaminated but not a benchmark doc")
        case "kept" =>
          assert(r.getLong(4) >= 500L)
          assert(!r.isNullAt(5) && !r.isNullAt(6) && !r.isNullAt(7))
          assert(r.getLong(6) >= 0L && r.getLong(6) < 256L)
          // roots and allocations are per-source constants
          perSourceRoot.get(src).foreach(x => assert(x == r.getString(7)))
          perSourceRoot(src) = r.getString(7)
          perSourceAlloc.get(src).foreach(x => assert(x == r.getLong(5)))
          perSourceAlloc(src) = r.getLong(5)
      }
    }
    // allocations respect the cap range (1..4 epochs in milli)
    perSourceAlloc.values.foreach(a => assert(a >= 1L && a <= 4000L))
  }
}
