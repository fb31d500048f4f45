package graft.tools

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Reference O23 (index.py:113-144): the crawler keeps a structured
  * journal of what it tried, explored and rejected. The engine analogue
  * is a SparkListener that attributes executor task metrics to the
  * currently-running named query: tasks, input records/bytes, shuffle
  * read/write bytes, output records — the numbers an operator would
  * page through to see WHERE a query spent its I/O.
  *
  * Metrics arrive on the async listener bus, so totals are eventually
  * consistent; callers either drain with a short wait (Bench) or poll
  * (spec). Thread-safe via LongAdder cells. */
class QueryJournal extends SparkListener {

  final class Cells {
    val tasks = new LongAdder
    val inputRecords = new LongAdder
    val inputBytes = new LongAdder
    val shuffleReadBytes = new LongAdder
    val shuffleWriteBytes = new LongAdder
    val outputRecords = new LongAdder
  }

  @volatile private var current: String = "(untagged)"
  private val cells = new ConcurrentHashMap[String, Cells]()

  /** Tag subsequent task metrics with this query name. */
  def start(name: String): Unit = current = name

  /** Drop all accumulated metrics (e.g. between bench sweeps). */
  def reset(): Unit = cells.clear()

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val tm = ev.taskMetrics
    if (tm != null) {
      val c = cells.computeIfAbsent(current, _ => new Cells)
      c.tasks.add(1)
      c.inputRecords.add(tm.inputMetrics.recordsRead)
      c.inputBytes.add(tm.inputMetrics.bytesRead)
      c.shuffleReadBytes.add(tm.shuffleReadMetrics.totalBytesRead)
      c.shuffleWriteBytes.add(tm.shuffleWriteMetrics.bytesWritten)
      c.outputRecords.add(tm.outputMetrics.recordsWritten)
    }
  }

  /** (query -> (tasks, inputRecords, inputBytes, shuffleRead, shuffleWrite, outputRecords)) */
  def snapshot: Map[String, (Long, Long, Long, Long, Long, Long)] = {
    val b = Map.newBuilder[String, (Long, Long, Long, Long, Long, Long)]
    cells.forEach { (k, c) =>
      b += k -> ((c.tasks.sum, c.inputRecords.sum, c.inputBytes.sum,
        c.shuffleReadBytes.sum, c.shuffleWriteBytes.sum, c.outputRecords.sum))
    }
    b.result()
  }

  /** One JSON object per line, sorted by query name. */
  def toJsonLines: String =
    snapshot.toSeq.sortBy(_._1).map { case (name, (t, ir, ib, sr, sw, or)) =>
      s"""{"query":"$name","tasks":$t,"input_records":$ir,"input_bytes":$ib,""" +
        s""""shuffle_read_bytes":$sr,"shuffle_write_bytes":$sw,"output_records":$or}"""
    }.mkString("", "\n", "\n")
}
