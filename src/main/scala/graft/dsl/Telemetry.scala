package graft.dsl

/** Pipeline phase events (reference: telemetry.py:27-124 —
  * MapStarted/MapCompleted/FlushStarted/FlushCompleted/FlushFailed to a
  * user callback; callback errors are swallowed).
  */
trait Telemetry {
  def event(name: String, table: String, detail: String = ""): Unit

  final def safeEvent(name: String, table: String, detail: String = ""): Unit =
    try event(name, table, detail) catch { case _: Throwable => () }
}

object Telemetry {
  object Noop extends Telemetry {
    def event(name: String, table: String, detail: String): Unit = ()
  }

  /** Collects events in memory (testing / debugging). */
  final class Recording extends Telemetry {
    val events = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    def event(name: String, table: String, detail: String): Unit =
      events.synchronized { events += ((name, table, detail)) }
  }
}
