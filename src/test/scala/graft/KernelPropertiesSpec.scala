package graft

import graft.functions.MinHashAgg
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the pure-JVM kernels that back oracle-checked
  * queries. These run without Spark (fast, hundreds of cases) and pin the
  * algebraic facts the distributed plans rely on.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      prop)
    assert(r.passed, s"$name: $r")
  }

  /** The qround quantizer used on every float-valued oracle column:
    * floor(x·10⁶ + 0.5)/10⁶ — idempotent, monotone, within half an ulp of
    * the true 6-decimal rounding.
    */
  test("qround is idempotent and monotone") {
    def q(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val gen = Gen.chooseNum(-1e6, 1e6)
    check("idempotent", Prop.forAll(gen) { x => q(q(x)) == q(x) })
    check("monotone", Prop.forAll(gen, gen) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      q(hi) >= q(lo)
    })
  }

  /** The polynomial rolling hash (shingle kernel in DedupQueries) must
    * stay within [0, HashMod) and match a BigInt reference fold — the
    * no-overflow claim behind `h*31 + c` on Long.
    */
  test("rolling hash matches BigInt reference and never overflows") {
    val M = graft.functions.TextFns.HashMod
    // The SHIPPED kernel (behind TextFns.stringHash / ShingleHash), not a
    // copy — the property pins the actual production arithmetic.
    def kernel(s: String): Long = graft.functions.TextKernels.stringHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    def reference(s: String): Long =
      s.foldLeft(BigInt(0))((h, c) => (h * 31 + c.toInt) % M).toLong
    val gen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    check("matches-reference", Prop.forAll(gen) { s =>
      val k = kernel(s)
      k == reference(s) && k >= 0 && k < M
    })
  }

  /** MinHashAgg's merge must be associative and commutative with `zero` as
    * identity — the contract that makes it map-side combinable (partial
    * aggregation correctness on any partitioning).
    */
  test("MinHashAgg merge is a commutative monoid; reduce order-insensitive") {
    val agg = MinHashAgg(1103515245L, 12345L, 214013L, 2531011L, 2147483647L)
    val bufGen = for {
      a <- Gen.chooseNum(0L, Long.MaxValue)
      b <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (a, b)
    check("assoc", Prop.forAll(bufGen, bufGen, bufGen) { (x, y, z) =>
      agg.merge(agg.merge(x, y), z) == agg.merge(x, agg.merge(y, z))
    })
    check("comm", Prop.forAll(bufGen, bufGen) { (x, y) =>
      agg.merge(x, y) == agg.merge(y, x)
    })
    check("identity", Prop.forAll(bufGen) { x => agg.merge(agg.zero, x) == x })
    check("reduce-order", Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 1L << 40))) {
      hs =>
        val left  = hs.foldLeft(agg.zero)(agg.reduce)
        val right = hs.reverse.foldLeft(agg.zero)(agg.reduce)
        left == right
    })
  }

  /** Dictionary-encoding determinism (IdEncoder's contract): the id of a
    * key is a pure function of the key SET, independent of input order.
    */
  test("sorted-rank ids are input-order independent") {
    val gen = Gen.listOf(Gen.identifier)
    check("order-independent", Prop.forAll(gen) { keys =>
      def ids(ks: Seq[String]): Map[String, Long] =
        ks.distinct.sorted.zipWithIndex.map { case (k, i) => k -> i.toLong }
          .toMap
      ids(keys) == ids(scala.util.Random.shuffle(keys))
    })
  }
}
