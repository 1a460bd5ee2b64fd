package graft.api

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StringType

import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Arbitrary-language UDF escape hatch: stream a string column through
  * an external command, ONE PROCESS PER PARTITION (never per row), with
  * a line-oriented contract — the Spark-side half of the pattern behind
  * Python tokenizers, model scorers, or any tool the JVM can't host.
  *
  * Contract: `command` reads one input line per row from stdin and
  * writes EXACTLY one output line per row to stdout, in order. Row
  * count mismatches and non-zero exits fail loudly (a silent drop or
  * reorder would mis-attribute every downstream value). Payloads that
  * may contain newlines must be framed by the caller — `to_json` /
  * `from_json` at the boundary is the zero-dependency way (JSON escapes
  * embedded newlines), and keeps the subprocess stdlib-only.
  *
  * Scale notes: the partition is spooled (input rows + output lines)
  * so feeding and draining can't deadlock on OS pipe buffers — memory
  * is bounded by the split size (~100-200 MB at default
  * `maxPartitionBytes`), the same bound `collect_list` queries live
  * under. The feeder runs on its own thread; stdout is drained
  * concurrently. Process startup (~tens of ms for python3) is paid once
  * per partition and amortizes over the whole split — at 100 TB the
  * per-partition process is the difference between this pattern and an
  * unusable per-row fork. Stderr is inherited so subprocess diagnostics
  * reach the executor log.
  */
object ExternalProcess {

  def pipeLines(df: DataFrame, inputCol: String, outputCol: String,
      command: Seq[String]): DataFrame = {
    require(command.nonEmpty, "pipeLines needs a non-empty command")
    val schema = df.schema.add(outputCol, StringType)
    val inIdx = df.schema.fieldIndex(inputCol)
    df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val rows = it.toArray
        // validate on the main thread (a require inside the feeder
        // thread would surface as an opaque row-count mismatch)
        rows.foreach { r =>
          val v = r.getString(inIdx)
          require(v != null, s"pipeLines input column '$inputCol' must be non-null" +
            " (coalesce upstream)")
          require(v.indexOf('\n') < 0, s"pipeLines input contains a raw newline —" +
            " frame payloads with to_json upstream")
        }
        val proc = new ProcessBuilder(command.asJava)
          .redirectError(ProcessBuilder.Redirect.INHERIT)
          .start()
        val feeder = new Thread(() => {
          val w = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(proc.getOutputStream, UTF_8))
          try {
            rows.foreach { r => w.write(r.getString(inIdx)); w.write('\n') }
          } catch {
            // broken pipe = the process died early; the main thread
            // reports the exit code / row mismatch, which is the real story
            case _: java.io.IOException => ()
          } finally {
            try w.close() catch { case _: java.io.IOException => () }
          }
        }, "graft-pipe-feeder")
        feeder.setDaemon(true)
        feeder.start()
        val rdr = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, UTF_8))
        val out = Iterator.continually(rdr.readLine()).takeWhile(_ != null).toArray
        feeder.join()
        val exit = proc.waitFor()
        if (exit != 0) throw new IllegalStateException(
          s"pipeLines command exited $exit: ${command.head} ...")
        if (out.length != rows.length) throw new IllegalStateException(
          s"pipeLines command wrote ${out.length} lines for ${rows.length} input rows" +
            " — contract is exactly one output line per input line")
        rows.iterator.zip(out.iterator).map { case (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }(Encoders.row(schema))
  }
}
