package graft.util

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

/**
 * Bounded-time execution guard — the reference's `timeout` decorator
 * (/root/reference/backend/encoder_utils.py:26-35: run in a 1-thread pool,
 * `future.result(seconds)`), used there to probe a remote encoder service
 * with 20 ms / 5 s budgets (bert_encoder.py:81, 105). Not a relational
 * operator; lives where the reference used it — around external calls
 * inside encoder implementations.
 */
object Timeout {

  /** Run `body` with a wall-clock budget; TimeoutException when exceeded
    * (the work thread is interrupted, mirroring the abandoned future). */
  def withTimeout[T](millis: Long)(body: => T): T = {
    val pool = Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-timeout")
      t.setDaemon(true)
      t
    })
    try {
      val fut = pool.submit(() => body)
      try fut.get(millis, TimeUnit.MILLISECONDS)
      catch {
        case _: TimeoutException =>
          fut.cancel(true)
          throw new TimeoutException(s"timed out after ${millis}ms")
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      }
    } finally pool.shutdownNow()
  }

  /** Probe-with-fallback (bert_encoder.py:151-157: remote if the probe
    * passes, else local). */
  def probeOrFallback[T](probeMillis: Long)(probe: => Boolean)(
      primary: => T)(fallback: => T): T = {
    val ok = try withTimeout(probeMillis)(probe) catch { case _: Throwable => false }
    if (ok) primary else fallback
  }
}
