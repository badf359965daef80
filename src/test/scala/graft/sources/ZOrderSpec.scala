package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: the interleave math, and the actual file-level
  * min/max skipping property on written parquet — a point filter on
  * EITHER dimension prunes most z-ordered files, while the linear
  * (a, b) sort prunes only on a. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue matches a reference bit interleave") {
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val cases = for (a <- 0L to 7L; b <- 0L to 7L) yield (a, b)
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 3)).as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => ref(a, b, 3) })
    // spot values: z(1,0)=1, z(0,1)=2, z(3,3)=15
    assert(ref(1, 0, 3) == 1 && ref(0, 1, 3) == 2 && ref(3, 3, 3) == 15)
  }

  /** files whose [min,max] interval of `c` covers `v` — the files a
    * min/max-skipping reader must open for filter c = v. */
  private def filesCovering(dir: String, c: String, v: Long): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .count { f =>
        val mm = spark.read.parquet(f.getPath.toString)
          .agg(min(col(c)), max(col(c))).head
        mm.getLong(0) <= v && v <= mm.getLong(1)
      }
  }

  test("z-order prunes on BOTH dimensions; linear sort only on the first") {
    val n = 1 << 12
    val grid = spark.range(n)
      .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val linDir = java.nio.file.Files.createTempDirectory("lin").toString
    ZOrder.writeZOrdered(grid, col("a"), col("b"), bits = 6, nFiles, zDir)
    grid.repartitionByRange(nFiles, col("a"), col("b"))
      .sortWithinPartitions(col("a"), col("b"))
      .write.mode("overwrite").parquet(linDir)

    // point filter on the SECONDARY dimension b: linear layout covers v
    // in every file; z-order in ~sqrt(nFiles)
    val zb = filesCovering(zDir, "b", 17L)
    val lb = filesCovering(linDir, "b", 17L)
    assert(lb >= nFiles - 1, s"linear layout should not prune on b, hit $lb")
    assert(zb <= nFiles / 2, s"z-order should prune most files on b, hit $zb")
    // and the primary dimension still prunes
    val za = filesCovering(zDir, "a", 17L)
    assert(za <= nFiles / 2, s"z-order should prune most files on a, hit $za")
  }
}
