package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._

/** The native [[graft.functions.ArrayDot]] codegen expression must be
  * bit-identical to the higher-order-function formulation it replaced
  * (sequential left fold, float widened to double per element).
  */
class ArrayDotSpec extends GraftSuite {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column,
                        b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the HOF fold on float arrays") {
    val df = Seq(
      (Array(1.0f, 2.5f, -3.25f), Array(0.5f, 4.0f, 2.0f)),
      (Array(1e-7f, 1e7f, 3.3f), Array(9.9f, 1e-6f, -1.1f)))
      .toDF("a", "b")
    val got = df.select(
      VectorFns.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mixed float/double operands widen per element") {
    val df = Seq((Array(1.0f, 2.0f), Array(0.25, 0.75))).toDF("a", "b")
    assert(df.select(VectorFns.dot(col("a"), col("b"))).head().getDouble(0)
      === 1.75)
  }

  test("ArrayDot participates in whole-stage codegen (no fallback)") {
    import org.apache.spark.sql.execution.debug.codegenString
    // AQE wraps the plan and defers codegen to stage execution; disable it
    // here so the concrete plan (and its generated source) is inspectable.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val gen = try {
      // A literal local relation would be pre-evaluated by
      // ConvertToLocalRelation — use a range source so a real codegen
      // stage exists.
      val df = spark.range(4)
        .select(array(col("id").cast("float"), lit(2.0f)).as("a"),
          array(lit(3.0f), lit(4.0f)).as("b"))
        .select(VectorFns.dot(col("a"), col("b")).as("d"))
        .filter(col("d") > 0)
      codegenString(df.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // A doGenCode compile failure would silently drop to interpreted
    // eval; the generated source must contain our primitive loop.
    assert(gen.contains("WholeStageCodegen"))
    assert(gen.contains("numElements"), gen.take(500))
  }

  test("null array yields null; norm and cosine compose") {
    val df = Seq((Some(Array(3.0f, 4.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(VectorFns.dot(col("a"), col("b")).as("d"),
      VectorFns.norm(col("a")).as("n")).head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 5.0)
  }
}
