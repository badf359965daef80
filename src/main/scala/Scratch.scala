import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries("q01_scan_filter_project")(spark, d)
    val scan = df.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("Scan") || l.contains("Pushed") || l.contains("ReadSchema"))
    scan.foreach(l => println("SCANLINE: " + l.trim.take(400)))
    spark.stop()
  }
}
