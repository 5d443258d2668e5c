package graft


/** Dev tool: time individual SparkEntry queries in isolation (2 runs each).
  * Usage: graft.DevTime [sfDir] [queryName...] */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = ToolSession.local(ToolSession.cpus("32"))
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-32s run1=${times(0)._1}%8.3fs run2=${times(1)._1}%8.3fs rows=${times(0)._2}")
    }
    spark.stop()
  }
}
