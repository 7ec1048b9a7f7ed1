package graft.util

import scala.util.control.NonFatal

/** Task-retry semantics (SURVEY.md §2 "Missing #4"; reference
  * `dags/get_securities_data.py:30-33` — every Airflow task runs with
  * `retries = 3, retry_delay = 5 min`).
  *
  * In this engine the driver program IS the orchestration (SURVEY.md
  * §3.1), so retry is a plain function wrapper around a stage instead
  * of scheduler metadata. Spark already retries TASKS inside a job
  * (`spark.task.maxFailures`); this wrapper is the reference's
  * outer JOB-level retry — the thing that survives a transient source
  * outage (the EOD vendor API, an object-store blip) rather than a
  * lost executor. The sleep is injectable so tests run instantly and
  * deterministic callers can log/record between attempts.
  */
object Retry {

  /** The reference's default policy: 3 retries, 5 minutes apart. */
  val DefaultRetries = 3
  val DefaultDelayMs: Long = 5L * 60L * 1000L

  /** Run `op`, retrying up to `retries` additional times on non-fatal
    * failure with `delayMs` between attempts; the final failure
    * rethrows the last exception. Total attempts = `retries + 1`,
    * matching the Airflow meaning of `retries = 3` (4 runs max). */
  def retry[A](retries: Int = DefaultRetries, delayMs: Long = DefaultDelayMs,
               sleep: Long => Unit = Thread.sleep)(op: () => A): A = {
    require(retries >= 0, s"retries must be >= 0, got $retries")
    var attempt = 0
    var out: Option[A] = None
    while (out.isEmpty) {
      try out = Some(op())
      catch {
        case NonFatal(e) =>
          attempt += 1
          if (attempt > retries) throw e
          sleep(delayMs)
      }
    }
    out.get
  }
}
