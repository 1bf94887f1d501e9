package graft.tools

import org.apache.spark.sql.functions._

/** Scale benchmark + global-contract check for exact-substring excision
  * ([[graft.ops.NearDup.exciseSpans]], q269):
  *
  *   runMain graft.tools.ExciseBench [nDocs] [nPassages]
  *
  * Synthesizes an nDocs corpus (hash-derived 40-word docs over a
  * size-scaled vocabulary, the CorpusBench recipe) and plants
  * `nPassages` distinct 12-token passages, each inserted into every
  * (nDocs/nPassages)-th doc — the boilerplate shape excision exists
  * for. After the rewrite it verifies the contract GLOBALLY, which no
  * per-row spec can: every planted passage must survive in EXACTLY ONE
  * document (its canonical site), and no document may keep a
  * non-canonical copy. Prints wall seconds, corpus/removed token
  * counts, and the per-passage survivor histogram. */
object ExciseBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nPass = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    val vocabSize = math.max(1000, n / 100)
    def word(i: Int) = format_string("w%05x",
      pmod(hash(col("doc_id"), lit(i)), lit(vocabSize)))
    // passage p = 12 tokens "p<p>_0 … p<p>_11" — disjoint from the
    // vocab, so its windows collide only with its own copies
    def passage(p: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 12).map(j =>
        format_string(s"p%d_$j", p)): _*)
    val stride = math.max(1, n / (nPass * 20)) // ~20 copies per passage
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(word): _*).as("body"))
    val docs = base.select(col("doc_id"),
      when(col("doc_id") % stride === 0,
        // insert the passage mid-doc so cuts are interior spans
        concat_ws(" ", substring_index(col("body"), " ", 20),
          passage(pmod((col("doc_id") / lit(stride)).cast("long"),
            lit(nPass))),
          substring_index(col("body"), " ", -20)))
        .otherwise(col("body")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()

    val t0 = System.nanoTime()
    val out = graft.ops.NearDup
      .exciseSpans(docs, "doc_id", "text", 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = out.agg(count(lit(1)), sum("n_removed"), sum("n_spans"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9

    // global contract: each passage's FIRST token (unique to it) must
    // appear in exactly one surviving text
    val survivors = out
      .select(explode(graft.ops.TextOps.tokens(col("clean_text")))
        .as("tok"))
      .filter(col("tok").rlike("^p[0-9]+_0$"))
      .groupBy(col("tok")).agg(count(lit(1)).as("copies"))
    val hist = survivors.groupBy(col("copies")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nSurvived = survivors.count()
    require(nSurvived == nPass.toLong && hist == Map(1L -> nPass.toLong),
      s"contract violated: $nSurvived passages survive, histogram $hist")

    println(f"""{"excise_bench":{"docs":$total,"secs":$secs%.1f,""" +
      s""""rows":${stats.getLong(0)},"removed_tokens":${stats.getLong(1)},""" +
      s""""spans":${stats.getLong(2)},"passages":$nPass,""" +
      s""""survivors_per_passage":1}}""")
    spark.stop()
  }
}
