package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.ZonedDateTime
import java.time.format.DateTimeFormatter

/** Structured run logging (reference src/pipeline_orchestrator.py:116-123:
  * `%(asctime)s [%(levelname)s] %(name)s - %(message)s` to file + console).
  * Deliberately tiny — the driver-side log is an audit artifact, not a
  * logging framework; executors log through Spark's own log4j.
  */
final class RunLog(name: String, logFile: Option[String]) {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  private def emit(level: String, msg: String): Unit = {
    val line = s"${ZonedDateTime.now.format(fmt)} [$level] $name - $msg"
    println(line)
    logFile.foreach { f =>
      val p = Paths.get(f)
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.writeString(p, line + System.lineSeparator(),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  def info(msg: String): Unit = emit("INFO", msg)
  def warn(msg: String): Unit = emit("WARNING", msg)
  def error(msg: String): Unit = emit("ERROR", msg)
}

object RunLog {
  /** Console-only logger for library use; file logging is opt-in via
    * config (`log_file`), mirroring the reference's append-mode handler.
    */
  def apply(name: String, logFile: Option[String] = None): RunLog =
    new RunLog(name, logFile)
}
