package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class IvfSkewSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Centroids from label means (posexplode → mean per position). */
  private lazy val centroids = {
    val byPos = emb.select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v").cast("double")).as("c"))
    byPos.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("centroid"))
      .select(col("label").cast("long").as("centroid_id"), col("centroid"))
  }

  test("IVF with full probe equals brute force exactly") {
    val queries = emb.filter(col("vec_id") < 5)
    val nLists = centroids.count().toInt
    val ivf = VectorOps.ivfSearch(queries, emb, centroids, nLists, 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bf = VectorOps.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == bf)
  }

  test("IVF with nprobe=3 keeps useful recall at a fraction of the scan") {
    val queries = emb.filter(col("vec_id") < 20)
    val ivf = VectorOps.ivfSearch(queries, emb, centroids, 3, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = VectorOps.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & bf).size.toDouble / bf.size
    // random-ish embeddings make coarse quantization weak; the structural
    // guarantee is that probed lists cover ~3/10 of the corpus and recall
    // lands well above that floor
    assert(recall > 0.3, s"recall=$recall")
    assert(ivf.size == bf.size)
  }

  test("saltedJoin equals plain join and spreads the hot key") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A")).toDF("key", "tag")
    val plain = big.join(small, "key").select("key", "v", "tag")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "key", col("v"), 8)
      .select("key", "v", "tag").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == "hot") == 100)
  }
}
