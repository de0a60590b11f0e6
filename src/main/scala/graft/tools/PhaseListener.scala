package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-stage metrics collector for the scale rehearsal (r5 verdict
  * items 1 + 8): wall/cpu is not enough to call a phase scale-safe —
  * the spill bytes and peak execution memory say whether the 128 GiB
  * sandbox (or a 16 GiB-per-executor cluster) had headroom or was one
  * doubling from a cliff.
  *
  * Stages are tagged with the `spark.job.description` of their owning
  * job (curateCorpus names its actions `curate:<phase>`), so the
  * COMPOSED run reports per-phase without being taken apart.
  *
  * Caveats, recorded so the table reads honestly:
  *   - `peak_exec_mb` sums each task's peak unroll/join/agg memory
  *     over the stage — an upper bound on concurrent demand (tasks
  *     from many waves all count), but the right order of magnitude
  *     for "would 32 of these fit an executor".
  *   - `peak_heap_mb` (phase level, from the 250 ms sampler) is the
  *     single-JVM local-mode heap peak — on a real cluster this is
  *     per-executor and comes from the executor metrics poller.
  */
class PhaseListener extends SparkListener {

  final case class StageRow(desc: String, stageId: Int, wallMs: Long,
                            cpuNs: Long, runMs: Long, spillMem: Long,
                            spillDisk: Long, shufRead: Long, shufWrite: Long,
                            input: Long, peakExec: Long)

  private val jobDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
  private val rows = new ConcurrentLinkedQueue[StageRow]()

  // Live listeners only see executor heap via 10 s heartbeats — too
  // coarse for per-phase peaks. local[n] is one JVM, so a 250 ms
  // driver-side sampler IS the executor heap; `resetHeap`/`peakHeapMb`
  // scope it to a phase.
  private val heapPeak = new java.util.concurrent.atomic.AtomicLong(0L)
  private val sampler = new Thread(() => {
    val rt = Runtime.getRuntime
    while (true) {
      heapPeak.accumulateAndGet(rt.totalMemory - rt.freeMemory, math.max)
      Thread.sleep(250)
    }
  }, "phase-heap-sampler")
  sampler.setDaemon(true)
  sampler.start()

  def resetHeap(): Unit = heapPeak.set(0L)
  def peakHeapMb: Long = heapPeak.get / (1L << 20)

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val desc = Option(js.properties)
      .flatMap(p => Option(p.getProperty("spark.job.description")))
      .getOrElse("")
    js.stageIds.foreach(sid => jobDesc.put(sid, desc))
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val tm = si.taskMetrics
    if (tm != null) {
      val wall = (for (a <- si.completionTime; b <- si.submissionTime)
        yield a - b).getOrElse(0L)
      rows.add(StageRow(
        jobDesc.getOrDefault(si.stageId, ""), si.stageId, wall,
        tm.executorCpuTime, tm.executorRunTime,
        tm.memoryBytesSpilled, tm.diskBytesSpilled,
        tm.shuffleReadMetrics.totalBytesRead,
        tm.shuffleWriteMetrics.bytesWritten,
        tm.inputMetrics.bytesRead,
        tm.peakExecutionMemory))
    }
  }

  /** Index into the stage log — diff two marks to scope a phase. */
  def mark(): Int = rows.size()

  /** One aggregate line per job description over rows [from, size). */
  def phaseTable(from: Int): Seq[(String, Map[String, Long])] = {
    val slice = rows.asScala.toVector.drop(from)
    slice.groupBy(_.desc).toSeq.sortBy(_._2.head.stageId).map {
      case (desc, ss) => desc -> aggregate(ss)
    }
  }

  /** Aggregate of rows [from, size) regardless of description. */
  def totals(from: Int): Map[String, Long] =
    aggregate(rows.asScala.toVector.drop(from))

  private def mb(x: Long): Long = x / (1L << 20)

  private def aggregate(ss: Seq[StageRow]): Map[String, Long] =
    if (ss.isEmpty) Map.empty
    else Map(
      "stages" -> ss.size,
      "stage_wall_ms" -> ss.map(_.wallMs).sum,
      "cpu_s" -> ss.map(_.cpuNs).sum / 1000000000L,
      "run_s" -> ss.map(_.runMs).sum / 1000L,
      "spill_mem_mb" -> mb(ss.map(_.spillMem).sum),
      "spill_disk_mb" -> mb(ss.map(_.spillDisk).sum),
      "shuffle_read_mb" -> mb(ss.map(_.shufRead).sum),
      "shuffle_write_mb" -> mb(ss.map(_.shufWrite).sum),
      "input_mb" -> mb(ss.map(_.input).sum),
      "peak_exec_mb" -> mb(ss.map(_.peakExec).max))
}
