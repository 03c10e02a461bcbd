package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Property-fuzz of the watermarked stream-stream interval join:
  * random view/click interleavings (same-instant pairs, both horizon
  * boundaries, multi-user), split into random TIME-ORDERED
  * micro-batches, must emit exactly the all-pairs batch join — inner
  * AND left-outer, including the outer rows' exactly-once null
  * emission and the sentinel-typing rule (type filters sit BEFORE the
  * watermark nodes, so flush rows must CARRY the joined types on
  * unmatchable users). Time-ordered slicing is the operator's
  * exactness domain, same contract as [[SessionizeFuzzSpec]].
  */
class IntervalJoinFuzzSpec extends AnyFunSuite with PropHelpers {

  private lazy val spark = TestSpark.spark

  private val H = 600L // horizon seconds
  private val Base = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000

  private final case class PCase(
      times: Vector[Long],     // non-decreasing epoch seconds
      users: Vector[Long],     // 1..nUsers
      types: Vector[String],   // view | click
      cuts: Vector[Int])       // sorted batch cut positions

  private val caseGen: Gen[PCase] = for {
    n <- Gen.choose(2, 12)
    nUsers <- Gen.choose(1, 2)
    // 0 = same-instant pair (r_ts == l_ts boundary); H-1/H/H+1 probe
    // the inclusive far edge of [l_ts, l_ts + H]
    steps <- Gen.listOfN(n, Gen.oneOf(0L, 1L, 60L, 300L, 599L, 600L, 601L, 1500L))
    users <- Gen.listOfN(n, Gen.choose(1L, nUsers.toLong))
    types <- Gen.listOfN(n, Gen.oneOf("view", "click"))
    nCuts <- Gen.choose(0, 3)
    cutPos <- Gen.listOfN(nCuts, Gen.choose(1, n - 1))
  } yield PCase(steps.scanLeft(Base)(_ + _).tail.toVector,
    users.toVector, types.toVector, cutPos.distinct.sorted.toVector)

  private final case class Ev(id: Long, u: Long, ts: Long, tpe: String)

  private def evs(c: PCase): Vector[Ev] =
    c.times.indices.map(i => Ev(i.toLong, c.users(i), c.times(i),
      c.types(i))).toVector

  /** Reference: the all-pairs batch interval join. */
  private def reference(c: PCase, outer: Boolean)
      : Set[(Long, Option[Long], Long, Option[Long])] = {
    val all = evs(c)
    val views = all.filter(_.tpe == "view")
    val clicks = all.filter(_.tpe == "click")
    val matched = for {
      v <- views
      k <- clicks
      if k.u == v.u && k.ts >= v.ts && k.ts <= v.ts + H
    } yield (v.id, Option(k.id), v.u, Option((k.ts - v.ts) * 1000000L))
    val unmatched =
      if (!outer) Vector.empty
      else views.filterNot(v => matched.exists(_._1 == v.id))
        .map(v => (v.id, Option.empty[Long], v.u, Option.empty[Long]))
    (matched ++ unmatched).toSet
  }

  private def drive(c: PCase, joinType: String)
      : Set[(Long, Option[Long], Long, Option[Long])] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = evs(c)
    val batches: Vector[Vector[Ev]] = {
      val bounds = (0 +: c.cuts :+ all.length).distinct.sorted
      bounds.sliding(2).map(w => all.slice(w(0), w(1))).toVector
        .filter(_.nonEmpty)
    }
    val input = MemoryStream[EventStream.Event]
    val sink = s"ij_fuzz_${System.nanoTime()}"
    val q = EventStream.intervalJoin(input.toDS().toDF(),
      "view", "click", H, watermarkDelay = "0 seconds",
      joinType = joinType)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b.map(e => EventStream.Event(e.id,
          new Timestamp(e.ts * 1000L), e.u, e.tpe, 0.0)): _*)
        q.processAllAvailable()
      }
      // outer emission needs the watermark PAST l_ts + horizon on
      // BOTH inputs, and the type filters run before the watermark
      // nodes — each flush must carry a view AND a click, on users
      // that can never match each other (or any real row)
      Seq("2030-01-01 00:00:00", "2031-01-01 00:00:00")
        .zipWithIndex.foreach { case (t, i) =>
          input.addData(
            EventStream.Event(9000L + i, Timestamp.valueOf(t), -1L,
              "view", 0.0),
            EventStream.Event(9100L + i, Timestamp.valueOf(t), -2L,
              "click", 0.0))
          q.processAllAvailable()
        }
      spark.table(sink).filter(col("user_id") > 0)
        .select("l_id", "r_id", "user_id", "delta_us")
        .collect().map { r =>
          (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))
        }.toSet
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
    }
  }

  test("property: time-ordered random batch splits reproduce the batch interval join (inner)") {
    forAll(caseGen, n = 12) { c =>
      val got = drive(c, "inner")
      val want = reference(c, outer = false)
      assert(got == want,
        s"\ntimes=${c.times}\nusers=${c.users}\ntypes=${c.types}" +
          s"\ncuts=${c.cuts}\ngot=$got\nwant=$want")
    }
  }

  test("property: time-ordered random batch splits reproduce the batch interval join (left_outer)") {
    forAll(caseGen, n = 12) { c =>
      val got = drive(c, "left_outer")
      val want = reference(c, outer = true)
      assert(got == want,
        s"\ntimes=${c.times}\nusers=${c.users}\ntypes=${c.types}" +
          s"\ncuts=${c.cuts}\ngot=$got\nwant=$want")
    }
  }
}
