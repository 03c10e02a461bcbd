package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ProductQuantizer

class ProductQuantizerSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // fixed, distinct 8-dim vectors (values chosen to avoid distance ties)
  private val vecs: Map[Long, Array[Double]] = (1L to 10L).map { i =>
    i -> Array.tabulate(8)(j => (i * 7 + j * 3 + (i * j) % 5).toDouble)
  }.toMap

  private def df = vecs.toSeq.map { case (i, v) => (i, v.toSeq) }
    .toDF("vec_id", "v")

  test("pqCodes matches an independent local argmin recomputation") {
    val k = 3
    val out = ProductQuantizer.pqCodes(df, "vec_id", "v",
      subspaces = 2, subDim = 4, k = k)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out.size == vecs.size * 2) // one row per (vector, subspace)
    // the same hash-seeded codebook the op derives
    val seeds = vecs.keys.toSeq.sortBy(i => (md5hex(s"pq:$i"), i)).take(k)
    def sub(v: Array[Double], s: Int) = v.slice(s * 4, s * 4 + 4)
    for (i <- vecs.keys; s <- 0 to 1) {
      val vs = sub(vecs(i), s)
      val (bestCid, bestDist) = seeds.map { c =>
        val cs = sub(vecs(c), s)
        def dot(a: Array[Double], b: Array[Double]) =
          a.zip(b).map { case (x, y) => x * y }.sum
        (c, (dot(vs, vs) - 2.0 * dot(vs, cs)) + dot(cs, cs))
      }.minBy { case (c, d) => (d, c) }
      val (code, distR) = out((i, s.toLong))
      assert(code == bestCid, s"vec $i sub $s: $code vs $bestCid")
      assert(math.abs(distR - BigDecimal(bestDist)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("pqCodes with k = n assigns every vector to itself at distance 0") {
    val out = ProductQuantizer.pqCodes(df, "vec_id", "v",
      subspaces = 2, subDim = 4, k = vecs.size)
      .as[(Long, Long, Long, Double)].collect()
    out.foreach { case (id, _, code, dist) =>
      assert(code == id && dist == 0.0, s"vec $id: code=$code dist=$dist")
    }
    intercept[IllegalArgumentException] {
      ProductQuantizer.pqCodes(df, "vec_id", "v", 0, 4, 2)
    }
  }
}
