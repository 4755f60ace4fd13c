package graft

/** Forked-process half of the cross-process lock spec: try to take the
  * graft maintenance lock file (exclusive create, the same primitive
  * `Scale.withTableLock` uses) from a SEPARATE JVM. Exit 0 if the lock
  * was acquired, 17 if it was already held. No SparkSession — the lock
  * protocol is pure FileSystem, which is the point: any process (a
  * second driver, an ops script) participates with nothing but Hadoop.
  */
object LockProbeMain {
  def main(args: Array[String]): Unit = {
    val lock = new org.apache.hadoop.fs.Path(args(0) + "__maint_lock")
    val fs = lock.getFileSystem(new org.apache.hadoop.conf.Configuration())
    try { fs.create(lock, false).close(); sys.exit(0) }
    catch { case _: java.io.IOException => sys.exit(17) }
  }
}
