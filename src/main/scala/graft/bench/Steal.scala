package graft.bench

/** CPU-steal sampling from `/proc/stat` — ONE definition shared by every
  * benchmark main, so a measured region can self-attribute co-tenant
  * load (bracketing 10 s probes around a multi-minute run miss mid-run
  * bursts; sampling the run's own window cannot).
  */
object Steal {

  /** Aggregate steal jiffies (field 9 of the `cpu` line; USER_HZ = 100).
    * −1 when unreadable (non-Linux).
    */
  def jiffies(): Long =
    try {
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/stat"))
        .get(0).trim.split("\\s+") match {
          case a if a.length > 8 && a(0) == "cpu" => a(8).toLong
          case _ => -1L
        }
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** Average stolen cores over a region bracketed by two [[jiffies]]
    * samples, rounded to 2 decimals; −1.0 when either sample failed.
    */
  def avgCores(j0: Long, j1: Long, seconds: Double): Double =
    if (j0 < 0 || j1 < 0 || seconds <= 0) -1.0
    else math.rint((j1 - j0) / 100.0 / seconds * 100) / 100
}
