package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("hashSample is deterministic across partitionings and reruns") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.3, seed = 11)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), col("doc_id"), 0.3,
        seed = 11)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("hashSample fraction lands near the target; seeds decorrelate") {
    val n = docs.count().toDouble
    val k = Sampling.hashSample(docs, col("doc_id"), 0.5, seed = 1).count()
    assert(math.abs(k / n - 0.5) < 0.15, s"got ${k / n}")
    val s1 = Sampling.hashSample(docs, col("doc_id"), 0.5, seed = 1)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(docs, col("doc_id"), 0.5, seed = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 != s2)
  }

  test("fraction 0 keeps nothing; fraction 1 keeps everything") {
    assert(Sampling.hashSample(docs, col("doc_id"), 0.0, 5).count() == 0)
    assert(Sampling.hashSample(docs, col("doc_id"), 1.0, 5).count()
      == docs.count())
  }

  test("stratifiedHashSample applies per-stratum fractions") {
    val sampled = Sampling.stratifiedHashSample(docs, col("doc_id"),
      col("lang"), Map("en" -> 0.2), defaultFraction = 1.0, seed = 3)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampledByLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-en strata kept whole (fraction 1.0)
    for ((lang, cnt) <- byLang if lang != "en")
      assert(sampledByLang.getOrElse(lang, 0L) == cnt, s"stratum $lang")
    // en downsampled to ~20%
    val enFrac = sampledByLang.getOrElse("en", 0L).toDouble / byLang("en")
    assert(enFrac < 0.5 && enFrac > 0.02, s"en fraction $enFrac")
  }
}
