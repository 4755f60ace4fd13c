package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Round-19 optimization diagnostic: run named queries once each with a
  * job listener attached and print every Spark job's wall-clock, stage
  * count and description — the breakdown that names WHICH action inside
  * a multi-action gate query eats the time (the UI is disabled in this
  * environment, so this is the stand-in for the Jobs tab).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.Profile <q1,q2,...> [sfDir]'
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <q1,q2,...> [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(), j.stageInfos.size,
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach { case (t0, st, desc) =>
          done.synchronized {
            done += ((j.jobId, (System.nanoTime() - t0) / 1e9, st, desc))
          }
        }
      }
    })
    val qs = SparkEntry.queries
    names.foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown query $name"))
      // warm run first so codegen/layout costs don't pollute the profile
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      done.synchronized(done.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      val snap = done.synchronized(done.toIndexedSeq)
      println(f"\n=== $name%s wall=$wall%.2f s, ${snap.size}%d jobs, " +
        f"sum=${snap.map(_._2).sum}%.2f s ===")
      snap.sortBy(-_._2).take(25).foreach { case (id, secs, st, desc) =>
        println(f"  job#$id%-4d $secs%6.3f s stages=$st%-3d ${desc.take(90)}%s")
      }
    }
    spark.stop()
  }
}
