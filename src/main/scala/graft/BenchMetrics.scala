package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Execution-metric accounting for the bench's evidence pass.
  *
  * The 100 TB story in SCALING.md argues that the heavy operators
  * shuffle ids and sketches, never document bodies. Plan pins prove the
  * SHAPE of that claim (which exchanges exist); this listener measures
  * its SIZE: per-query shuffle bytes/records, input bytes, and spill,
  * straight from Spark's task metrics. A dedup query whose shuffle
  * write is a few MB against a corpus scan of hundreds of MB is the
  * ids-only claim in numbers; a spill count of zero is the
  * "partitions fit in executor memory at this SF" claim in numbers.
  *
  * Built on the public listener API ([[SparkListener]] /
  * `onTaskEnd.taskMetrics`); deltas are read between queries after
  * draining the listener bus, so attribution is exact in the bench's
  * one-query-at-a-time loop (nothing else runs concurrently there).
  */
final class BenchMetrics extends SparkListener {
  private val shuffleReadB = new LongAdder
  private val shuffleWriteB = new LongAdder
  private val shuffleWriteRec = new LongAdder
  private val inputB = new LongAdder
  private val spillMemB = new LongAdder
  private val spillDiskB = new LongAdder
  private val stagesN = new LongAdder
  private val tasksN = new LongAdder
  // max task-level peak execution memory (sum across tasks would double
  // count concurrent tasks; the per-task peak is what must fit per slot)
  @volatile private var peakTaskMemB: Long = 0L

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      shuffleReadB.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteB.add(m.shuffleWriteMetrics.bytesWritten)
      shuffleWriteRec.add(m.shuffleWriteMetrics.recordsWritten)
      inputB.add(m.inputMetrics.bytesRead)
      spillMemB.add(m.memoryBytesSpilled)
      spillDiskB.add(m.diskBytesSpilled)
      tasksN.add(1)
      if (m.peakExecutionMemory > peakTaskMemB) peakTaskMemB = m.peakExecutionMemory
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    stagesN.add(1)

  /** Reset the peak-memory high-water mark (counters are delta-read and
    * never need resetting; the mark does, once per query). */
  def resetPeak(): Unit = peakTaskMemB = 0L

  /** Cumulative totals since attach. */
  def snapshot(): BenchMetrics.Snap = BenchMetrics.Snap(
    shuffleReadB.sum(), shuffleWriteB.sum(), shuffleWriteRec.sum(),
    inputB.sum(), spillMemB.sum() + spillDiskB.sum(),
    stagesN.sum(), tasksN.sum(), peakTaskMemB)
}

object BenchMetrics {
  final case class Snap(shuffleReadB: Long, shuffleWriteB: Long,
                        shuffleWriteRec: Long, inputB: Long, spillB: Long,
                        stages: Long, tasks: Long, peakTaskMemB: Long) {
    def -(o: Snap): Snap = Snap(
      shuffleReadB - o.shuffleReadB, shuffleWriteB - o.shuffleWriteB,
      shuffleWriteRec - o.shuffleWriteRec, inputB - o.inputB,
      spillB - o.spillB, stages - o.stages, tasks - o.tasks,
      // peak is a high-water mark, not a counter — the caller resets it
      // per query via resetPeak(), so the newer mark is the query's own
      peakTaskMemB)
    def jsonFields: String = {
      val mb = BenchMetrics.mb _
      s""""shuffle_read_mb":${mb(shuffleReadB)},"shuffle_write_mb":${mb(shuffleWriteB)},""" +
        s""""shuffle_write_records":$shuffleWriteRec,"input_mb":${mb(inputB)},""" +
        s""""spill_mb":${mb(spillB)},"stages":$stages,"tasks":$tasks,""" +
        s""""peak_task_mem_mb":${mb(peakTaskMemB)}"""
    }
  }

  /** Bytes → MB with 3-decimal rounding — the ONE rounding used by both
    * the per-query fields and the headline aggregates (a second copy
    * could silently drift). */
  def mb(b: Long): Double = math.rint(b / 1048576.0 * 1000) / 1000

  /** Attach a fresh listener and drain the bus so its counters start
    * from a clean point. */
  def attach(spark: SparkSession): BenchMetrics = {
    val l = new BenchMetrics
    spark.sparkContext.addSparkListener(l)
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
    l
  }

  /** Remove the listener from the session's bus. Long-lived sessions
    * (the shared test session; any embedding application) must not keep
    * paying per-event accounting after the evidence pass is over. */
  def detach(spark: SparkSession, l: BenchMetrics): Unit =
    spark.sparkContext.removeSparkListener(l)
}
