package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSim

/** Bit-identity gate for the native cosine expression: swapping the
  * similarity family's `udf(cosineKernel)` for the codegen
  * `CosineSim` must not move a single bit of any oracle-checked entry's
  * output — so the expression is pinned against the reference kernel on
  * random vectors, via both the eval (interpreted) and codegen paths, and
  * through the registered SQL name.
  */
class CosineSimSpec extends AnyFunSuite with SparkTest {

  private val Dim = 64

  private def refKernel(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val vecs: Seq[(Array[Float], Array[Float])] = {
    val rnd = new scala.util.Random(11)
    Seq.fill(64)((Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat),
      Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat)))
  }

  test("cosine_sim is bit-identical to the reference kernel (codegen path)") {
    import spark.implicits._
    val df = vecs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
    val got = df.select(col("id"), CosineSim.sim(col("a"), col("b")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    vecs.zipWithIndex.foreach { case ((a, b), i) =>
      val want = refKernel(a, b)
      assert(java.lang.Double.doubleToRawLongBits(got(i)) ==
        java.lang.Double.doubleToRawLongBits(want),
        s"pair $i: got ${got(i)} want $want — cosine_sim must be bit-identical")
    }
  }

  test("cosine_sim matches the kernel through the registered SQL name") {
    import spark.implicits._
    CosineSim.register(spark)
    val df = vecs.take(8).zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
    val got = df.selectExpr("id", "cosine_sim(a, b) AS c")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    vecs.take(8).zipWithIndex.foreach { case ((a, b), i) =>
      assert(got(i) == refKernel(a, b), s"SQL-name pair $i diverged")
    }
  }

  test("cosine_sim NULL semantics: NULL vector in, NULL out") {
    import spark.implicits._
    val df = Seq((1, Some(vecs.head._1.toSeq), Option.empty[Seq[Float]]))
      .toDF("id", "a", "b")
    val rows = df.select(CosineSim.sim(col("a"), col("b"))).collect()
    assert(rows.head.isNullAt(0), "NULL input must yield NULL, not a crash or 0")
  }

  test("cosine_sim handles length mismatch like the kernel (min-length pass)") {
    import spark.implicits._
    val a = vecs.head._1
    val short = a.take(32)
    val df = Seq((1, a, short)).toDF("id", "a", "b")
    val got = df.select(CosineSim.sim(col("a"), col("b"))).head().getDouble(0)
    assert(got == refKernel(a, short))
  }

  test("cosine_sim rejects non-float-array inputs at analysis") {
    import spark.implicits._
    val df = Seq((1, "x", Seq(1.0f))).toDF("id", "s", "v")
    val e = intercept[Exception] {
      df.select(CosineSim.sim(col("s"), col("v"))).head()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("data type"),
      s"expected an analysis-time type error, got: ${e.getMessage}")
  }
}
