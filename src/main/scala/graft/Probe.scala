package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop probe: time queries from the registry against any parquet
  * dir (the bench cache, the sf1 synth, a raw sf dir) and optionally
  * dump the formatted plan — the .explain-and-iterate feedback loop
  * without running the whole Bench headline set.
  *
  * usage: runMain graft.Probe <dir> <query>[,<query>...] [--explain] [--runs N]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.contains("--explain")
    val runs = args.sliding(2).collectFirst {
      case Array("--runs", n) => n.toInt }.getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --conf k=v pairs land as session confs (e.g.
    // --conf spark.graft.scanStorage=MEMORY_AND_DISK_SER)
    args.sliding(2).collect { case Array("--conf", kv) => kv }
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      }
    spark.range(1000).selectExpr("sum(id)").collect() // codegen warmup
    names.foreach { n =>
      if (explain) {
        val q = SparkEntry.queries(n)(spark, dir)
        q.count() // run once so AQE settles into the final plan
        println(s"== $n ==")
        println(q.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.functions.ScanFns.unpersistScans()
        t
      }
      println(f"[probe] $n min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
