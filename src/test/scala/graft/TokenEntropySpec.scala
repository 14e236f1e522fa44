package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compiled token_entropy kernel BIT-IDENTICAL (raw doubles, no
  * rounding slack) to the interpreted HOF fold it replaced: same split
  * semantics, same binary sort order, same addition sequence, same
  * StrictMath.log. Any divergence — a different log flavor, a hash-order
  * accumulation — would eventually flip a floor-truncated 4th decimal
  * under the DuckDB oracle.
  */
class TokenEntropySpec extends AnyFunSuite with SparkTest {

  /** The r5 interpreted fold, verbatim (ext/Corpus.scala history). */
  private val foldExpr =
    """aggregate(array_sort(split(text, ' ')),
         named_struct('prev', CAST(NULL AS STRING), 'run', 0, 's', CAST(0.0 AS DOUBLE)),
         (acc, x) -> named_struct(
           'prev', x,
           'run', IF(x <=> acc.prev, acc.run + 1, 1),
           's', acc.s + IF(x <=> acc.prev, CAST(0.0 AS DOUBLE),
                           IF(acc.run > 0, acc.run * ln(acc.run), CAST(0.0 AS DOUBLE)))),
         acc -> ln(size(split(text, ' '))) - (acc.s + acc.run * ln(acc.run)) / size(split(text, ' ')))"""

  test("compiled kernel is bit-identical to the interpreted fold on the corpus") {
    graft.functions.TokenEntropy.register(spark)
    val d = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        expr("token_entropy(text)").as("fast"),
        expr(foldExpr).as("slow"))
      .collect()
    assert(d.length > 100)
    d.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"doc ${r.getLong(0)}: kernel ${r.getDouble(1)} != fold ${r.getDouble(2)}")
    }
  }

  test("edge shapes: empty string, runs of spaces, single word, all-identical words") {
    graft.functions.TokenEntropy.register(spark)
    import spark.implicits._
    val rows = Seq("", " ", "  ", "one", "a a a a", "a b a b", "x  y")
      .toDF("text")
      .select(expr("token_entropy(text)").as("fast"), expr(foldExpr).as("slow"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"kernel ${r.getDouble(0)} != fold ${r.getDouble(1)}")
    }
  }
}
