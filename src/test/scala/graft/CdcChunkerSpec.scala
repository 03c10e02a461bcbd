package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{CdcFunctions, GearChunks}

/** Gear content-defined chunking: invariants + parity against an
  * independently-written reference (BigInt mod-2^32 arithmetic, fold
  * style — shares no code with the expression's while-loop kernel),
  * pinned gear-table values (md5 derivation, the oracle's contract),
  * and the codegen seam.
  */
class CdcChunkerSpec extends AnyFunSuite with PropHelpers {

  lazy val spark = TestSpark.spark

  /** Independent reference: same public FastCDC-style spec, different
    * arithmetic (BigInt, mod instead of mask) and different control
    * flow (fold over indexed bytes).
    */
  private def refChunks(bytes: Array[Byte], k: Int, minLen: Int,
      maxLen: Int): Seq[(Int, Int)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def gear(b: Int): BigInt = {
      md.reset()
      BigInt(md.digest(b.toString.getBytes("UTF-8")).take(4)
        .map(x => f"${x & 0xff}%02x").mkString, 16)
    }
    val mod = BigInt(1) << 32
    val thresh = BigInt(1) << (32 - k)
    val (chunks, start, _) = bytes.indices
      .foldLeft((Vector.empty[(Int, Int)], 0, BigInt(0))) {
        case ((acc, st, h), i) =>
          val h2 = (h * 2 + gear(bytes(i) & 0xff)) mod mod
          val len = i - st + 1
          if ((len >= minLen && h2 / thresh == 0) || len >= maxLen)
            (acc :+ (st, len), i + 1, BigInt(0))
          else (acc, st, h2)
      }
    if (start < bytes.length) chunks :+ (start, bytes.length - start)
    else chunks
  }

  private def runExpr(bytes: Array[Byte], k: Int, minLen: Int,
      maxLen: Int): Seq[(Int, Int)] = {
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("bin")
      .select(CdcFunctions.gearChunks(col("bin"), k, minLen, maxLen)
        .as("c"))
      .select(explode(col("c")).as("ch"))
      .select(col("ch.off"), col("ch.len"))
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1)))
  }

  test("gear table matches the md5 derivation the oracle replicates") {
    // values pinned from an external md5 (the DuckDB oracle computes
    // the same inline) — a table regression breaks cross-engine parity
    assert(GearChunks.gearTable(0) == 3486326916L)
    assert(GearChunks.gearTable(1) == 3301589560L)
    assert(GearChunks.gearTable(57) == 1924344351L)
    assert(GearChunks.gearTable(255) == 4262665599L)
  }

  test("chunks partition the input exactly; min/max clamps hold") {
    val gen = for {
      n <- Gen.choose(0, 400)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
      k <- Gen.choose(2, 8)
      minL <- Gen.choose(1, 6)
      maxL <- Gen.choose(8, 48)
    } yield (bs.toArray, k, minL, maxL)
    forAll(gen, n = 60) { case (bs, k, minL, maxL) =>
      val chunks = refChunks(bs, k, minL, maxL)
      // exact cover, in order, no gaps or overlaps
      assert(chunks.map(_._2).sum == bs.length)
      chunks.foldLeft(0) { case (pos, (off, len)) =>
        assert(off == pos); assert(len >= 1 && len <= maxL); off + len
      }
      // every non-tail cut is either a forced max-cut or >= minLen
      chunks.dropRight(1).foreach { case (_, len) =>
        assert(len >= minL || len == maxL)
      }
      // the expression agrees with the independent fold
      assert(runExpr(bs, k, minL, maxL) == chunks)
    }
  }

  test("empty input yields an empty array; null stays null") {
    import spark.implicits._
    val out = Seq(Tuple1(Array.emptyByteArray), Tuple1(null: Array[Byte]))
      .toDF("bin")
      .select(CdcFunctions.gearChunks(col("bin"), 5, 8, 64).as("c"))
      .collect()
    assert(out(0).getSeq[Any](0).isEmpty)
    assert(out(1).isNullAt(0))
  }

  test("single-byte influence: a changed byte never moves boundaries " +
    "of chunks sealed before it") {
    val gen = for {
      n <- Gen.choose(64, 300)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
      at <- Gen.choose(0, n - 1)
      nb <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield (bs.toArray, at, nb)
    forAll(gen, n = 40) { case (bs, at, nb) =>
      val mutated = bs.clone(); mutated(at) = nb
      val a = refChunks(bs, 5, 4, 48)
      val b = refChunks(mutated, 5, 4, 48)
      // chunks that END strictly before the edited byte are identical
      // (the rolling state resets at each cut — content locality)
      val sealedA = a.takeWhile { case (off, len) => off + len <= at }
      assert(b.take(sealedA.length) == sealedA)
    }
  }

  test("gear_chunks runs inside whole-stage codegen") {
    // literal frames constant-fold to LocalTableScan; use a real scan
    val plan = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(CdcFunctions.gearChunks(
        encode(col("text"), "UTF-8"), 5, 8, 64).as("c"))
      .queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.toLowerCase.contains("gearchunks")),
      s"expected gearchunks inside a codegen span (*) in:\n$plan")
  }
}
