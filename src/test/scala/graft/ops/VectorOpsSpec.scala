package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class VectorOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f))   // opposite of 0
  ).toDF("vec_id", "embedding")

  test("native vec_dot is bit-identical to the lambda fold on the corpus") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = emb.limit(50).crossJoin(
      emb.select($"embedding".as("b")).limit(50))
    val mism = pairs.select(
      VectorOps.dot($"embedding", $"b").as("native"),
      VectorOps.dotLambda($"embedding", $"b").as("lambda"))
      .filter($"native" =!= $"lambda").count() // exact, not approx
    assert(mism == 0)
    // double arrays too (centroid path)
    val d = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
    assert(d.select(VectorOps.dot($"a", $"b")).head().getDouble(0) == 13.0)
    // length mismatch → null (matches zip_with/oracle semantics)
    val m = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(m.select(VectorOps.dot($"a", $"b")).head().isNullAt(0))
  }

  test("cosine: self=1, orthogonal=0, opposite=-1") {
    val self = vecs.filter($"vec_id" === 0)
      .select(VectorOps.cosine($"embedding", $"embedding")).head().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        VectorOps.cosine($"a.embedding", $"b.embedding").as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(pairs((0L, 2L))) < 1e-12)
    assert(math.abs(pairs((0L, 3L)) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks nearest first with deterministic tiebreak") {
    val top = VectorOps.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, 3)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
    assert(top.head.getAs[Double]("cos_sim") > 0.99)
  }

  test("TopK aggregator equals the window formulation on the corpus") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val viaAgg = VectorOps.bruteForceTopK(q, emb, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaWindow = VectorOps.bruteForceTopKWindow(q, emb, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 70)
  }

  test("topKPerGroup rejects non-integral id columns up front") {
    val strKeys = Seq(("a", 1L, 0.5)).toDF("g", "item", "score")
    val ex = intercept[IllegalArgumentException] {
      TopK.topKPerGroup(strKeys, "g", "item", "score", 3)
    }
    assert(ex.getMessage.contains("must be integral"))
  }

  test("SRP: identical vectors land in the same bucket; opposite differ") {
    val sig = vecs.select($"vec_id",
      VectorOps.srpSignature($"embedding", 12, 3).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val dup = Seq((9L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
      .select(VectorOps.srpSignature($"embedding", 12, 3)).head().getLong(0)
    assert(dup == sig(0L))
    assert(sig(0L) != sig(3L))
  }

  // three well-separated blobs on the axes; ids interleaved so seed
  // choice can't accidentally align with blob order
  private def blobs = Seq(
    (0L, Array(1.0f, 0.02f, 0.0f)), (3L, Array(0.98f, 0.0f, 0.01f)),
    (6L, Array(1.0f, 0.01f, 0.02f)),
    (1L, Array(0.0f, 1.0f, 0.02f)), (4L, Array(0.01f, 0.97f, 0.0f)),
    (7L, Array(0.02f, 1.0f, 0.01f)),
    (2L, Array(0.01f, 0.0f, 1.0f)), (5L, Array(0.0f, 0.02f, 0.99f)),
    (8L, Array(0.01f, 0.01f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("kmeansFit recovers separated blobs and is partitioning-invariant") {
    val code = VectorOps.kmeansFit(blobs, k = 3, iters = 4)
    assert(code.count() == 3)
    val assign = VectorOps.assignToCentroids(blobs, code)
      .select($"vec_id", $"list_id").as[(Long, Long)].collect().toMap
    // blob membership: ids ≡ mod 3 belong together
    for (g <- 0 until 3) {
      val lists = (0 until 3).map(i => assign(g + 3L * i)).toSet
      assert(lists.size == 1, s"blob $g split across lists $lists")
    }
    // same codebook regardless of input partitioning, bit-for-bit
    val repart = VectorOps.kmeansFit(blobs.repartition(5, $"vec_id"),
      k = 3, iters = 4)
    val a = code.orderBy($"centroid_id")
      .as[(Long, Seq[Double])].collect().toSeq
    val b = repart.orderBy($"centroid_id")
      .as[(Long, Seq[Double])].collect().toSeq
    assert(a == b)
  }

  test("kmeansFit-trained IVF at full probe equals brute force") {
    val code = VectorOps.kmeansFit(blobs, k = 3, iters = 3)
    val queries = blobs.filter($"vec_id" < 3)
    val ivf = VectorOps.ivfSearch(queries, blobs, code, nprobe = 3, k = 2)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val bf = VectorOps.bruteForceTopK(queries, blobs, 2)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf == bf)
  }

  test("kmeansFit keeps previous centroid for empty lists") {
    // identical points: assignment ties all break to one centroid, the
    // other list is empty every round and must keep its seed centroid
    val tiny = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val code = VectorOps.kmeansFit(tiny, k = 2, iters = 3)
    assert(code.count() == 2)
    // every centroid remains finite and well-formed
    val all = code.as[(Long, Seq[Double])].collect()
    assert(all.forall(_._2.forall(v => !v.isNaN && !v.isInfinite)))
  }
}
