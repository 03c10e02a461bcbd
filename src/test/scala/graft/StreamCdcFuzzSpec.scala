package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamCdc

/** Property-fuzz of the CDC changelog applier: random per-key version
  * chains (major-version ties resolved by `sub`, upserts and deletes
  * mixed), sliced into random micro-batches WITH random redeliveries
  * of earlier changes, must apply every distinct (key, ver, sub)
  * exactly once — redeliveries and stale versions suppressed at the
  * edge. Per-key version-ordered first delivery is the exactness
  * domain (the operator's documented contract: any slicing of an
  * in-order changelog; a transport that reorders ACROSS batches
  * loses the reordered-past change by design, pinned separately in
  * StreamingSpec).
  */
class StreamCdcFuzzSpec extends AnyFunSuite with PropHelpers {

  private lazy val spark = TestSpark.spark

  private final case class PCase(
      changes: Vector[StreamCdc.Change],
      cuts: Vector[Int],
      redeliveries: Vector[(Int, Int)]) // (change idx, batch idx)

  private val caseGen: Gen[PCase] = for {
    n <- Gen.choose(3, 14)
    nKeys <- Gen.choose(1, 3)
    keys <- Gen.listOfN(n, Gen.choose(1L, nKeys.toLong))
    // major-version steps INCLUDING 0 — a tied major version must be
    // ordered (and applied) through `sub`, the composite-version case
    verSteps <- Gen.listOfN(n, Gen.oneOf(0L, 0L, 1L, 1L, 5L))
    ops <- Gen.listOfN(n, Gen.frequency(3 -> Gen.const("U"),
      1 -> Gen.const("D")))
    nCuts <- Gen.choose(0, 4)
    cutPos <- Gen.listOfN(nCuts, Gen.choose(1, n - 1))
    nRe <- Gen.choose(0, 3)
    reIdx <- Gen.listOfN(nRe, Gen.choose(0, n - 1))
    reBatch <- Gen.listOfN(nRe, Gen.choose(0, nCuts))
  } yield {
    // per-key strictly increasing (ver, sub): ver accumulates the
    // (possibly 0) step, sub is the global sequence number — the log
    // sequence a real CDC transport carries
    val perKeyVer = collection.mutable.Map.empty[Long, Long]
    val changes = (0 until n).map { i =>
      val k = keys(i)
      val v = perKeyVer.getOrElse(k, 0L) + verSteps(i)
      perKeyVer(k) = v
      StreamCdc.Change(k, v, i.toLong, ops(i), i * 1.5, s"p$i")
    }.toVector
    PCase(changes, cutPos.distinct.sorted.toVector,
      reIdx.zip(reBatch).toVector)
  }

  /** Batch oracle: the first delivery of every distinct (key, ver,
    * sub) applies — per-key chains are version-ordered by
    * construction, so nothing is ever stale on first delivery.
    */
  private def reference(c: PCase): Set[(Long, Long, Long, String)] =
    c.changes.map(x => (x.key, x.ver, x.sub, x.op)).toSet

  test("property: random slicing with redeliveries applies every change exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    forAll(caseGen, n = 15) { c =>
      val batches = sliceBatches(c.changes, c.cuts)
      val withRe = withRedeliveries(batches, c.redeliveries,
        (x: StreamCdc.Change, i: Int) => x.sub == i.toLong, c.changes(_))
      val input = MemoryStream[StreamCdc.Change]
      val sink = s"cdc_fuzz_${System.nanoTime()}"
      val q = StreamCdc.applyChangelog(input.toDF())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        withRe.foreach { b =>
          if (b.nonEmpty) { input.addData(b: _*); q.processAllAvailable() }
        }
        val got = spark.table(sink)
          .select("key", "ver", "sub", "op")
          .as[(Long, Long, Long, String)].collect()
        assert(got.length == got.distinct.length,
          s"duplicate application\ncase=$c\ngot=${got.toSeq}")
        assert(got.toSet == reference(c),
          s"\ncase=$c\ngot=${got.toSet}\nwant=${reference(c)}")
      } finally {
        q.stop()
        spark.catalog.dropTempView(sink)
      }
    }
  }
}
