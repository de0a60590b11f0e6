package graft.tools

import graft.GraftSession
import graft.streaming.NearDupStream

/** r18 (r17 verdict item 5): back resolveKeepers' logarithmic-
  * convergence claim with measured jump counts on the worst-case
  * ledger shape — ONE boilerplate mega-signature whose doc ids arrive
  * strictly decreasing across B micro-batches, so EVERY batch
  * displaces the keeper and the re-point chain is B links long
  * (batch t emits the reassignment row old→new plus the new
  * self-keeper row, exactly what collisionLedger's flatMap emits;
  * NearDupStreamSpec's 3-batch fixture is this shape at B=4).
  *
  * Expectation: doc→keeper-of-keeper squaring resolves a B-link chain
  * in ⌈log2 B⌉ + 1 jumps (+1 = the confirming no-movement pass), so
  * the 64-jump require covers ~2^63 keeper-changing batches.
  */
object ProbeKeeperChains {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (b <- Seq(16, 129, 512, 1025)) {
      // ids b, b-1, …, 1 across b batches; ledger rows as emitted:
      // batch 0: (sig, b, b); batch t>0, doc d=b-t arriving under
      // prior keeper d+1: re-point (sig, d+1, d) + self (sig, d, d)
      val rows =
        Seq((0, "mega", b.toLong, b.toLong)) ++
          (1 until b).flatMap { t =>
            val d = (b - t).toLong
            Seq((0, "mega", d + 1, d), (0, "mega", d, d))
          }
      val ledger = rows.toDF("band", "sig", "doc_id", "keeper")
      val t0 = System.nanoTime()
      val (resolved, jumps) = NearDupStream.resolveKeepersCounted(ledger)
      val out = resolved.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val allOne = out.forall(_.getLong(3) == 1L)
      val expect = (math.log(b) / math.log(2)).ceil.toInt + 1
      println(f"[keeper-chains] batches=$b%5d chainLen=$b%5d " +
        f"jumps=$jumps%2d expected<=$expect%2d of bound 64  " +
        f"allResolvedTo1=$allOne  docs=${out.length}%5d  $secs%6.2f s")
      require(allOne, s"batch truth not recovered at B=$b")
      require(jumps <= expect,
        s"jumps $jumps exceeded the log2 expectation $expect at B=$b")
    }
    spark.stop()
  }
}
