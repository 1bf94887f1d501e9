package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, v: String): Any =
    Seq(Option(v)).toDF("text").select(c.as("r")).head().get(0)

  test("tokens handles empty, blank, and multi-space text") {
    assert(one(TextOps.tokenCount(col("text")), "a  b\tc") == 3)
    assert(one(TextOps.tokenCount(col("text")), "") == 0)
    assert(one(TextOps.tokenCount(col("text")), "   ") == 0)
    assert(one(TextOps.tokenCount(col("text")), "one") == 1)
  }

  test("polyHash is deterministic and matches a reference fold") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % TextOps.HashMod)
    for (s <- Seq("hello world", "", "a", "the quick brown fox"))
      assert(one(TextOps.polyHash(col("text")), s) == ref(s), s"for '$s'")
  }

  test("qualityFeatures ratios are 0-guarded") {
    val f = Seq("").toDF("text")
      .select(TextOps.qualityFeatures(col("text")).as("f"))
      .select("f.*").head()
    assert(f.getAs[Double]("stopword_ratio") == 0.0)
    assert(f.getAs[Double]("punct_ratio") == 0.0)
  }

  test("langGuess picks the language with most marker hits, ties → first") {
    assert(one(TextOps.langGuess(col("text")), "the cat of the house") == "en")
    assert(one(TextOps.langGuess(col("text")), "der hund und die katze") == "de")
    // no markers at all → all scores 0 → first in list (de)
    assert(one(TextOps.langGuess(col("text")), "xyzzy plugh") == "de")
  }
}
