package graft

import org.apache.spark.sql.functions._

import graft.functions.{PolyHash2Fn, PolyHashFn, PolyHashWideFn, ShingleHashesFn, ShingleHashesWideFn}
import graft.ops.{NearDup, TextOps}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Round 12: the substring/winnow tier's prefilter widened from the
  * 30-bit poly hash to the wide two-plane key (≈2^60 space). Pins:
  * plane structure (wide >> 31 == legacy 30-bit hash, exactly), the
  * collision class the widening closes (a plane-1 birthday collision no
  * longer gates the repeated-span tier), and the packed occurrence-key
  * id-domain guard in exciseSpans. */
class Round12Spec extends SparkSpecBase {
  import spark.implicits._

  private def utf8(s: String) = UTF8String.fromString(s)
  private def arr(tokens: Seq[String]) =
    new GenericArrayData(tokens.map(t => utf8(t)).toArray[Any])

  test("poly_hash_wide: top plane IS poly_hash; bottom plane poly_hash2") {
    for (s <- Seq("", "a", "hash join vector", "Café ☃ mixed")) {
      val wide = PolyHashWideFn.hash(utf8(s))
      assert(wide >> 31 == PolyHashFn.hash(utf8(s)), s"top plane of '$s'")
      assert((wide & ((1L << 31) - 1)) == PolyHash2Fn.hash(utf8(s)),
        s"bottom plane of '$s'")
      assert(wide >= 0, s"wide hash of '$s' must stay non-negative")
    }
    // and the SQL-registered expression agrees with the kernel
    val got = Seq("hash join vector").toDF("s")
      .select(call_function("poly_hash_wide", col("s"))).head().getLong(0)
    assert(got == PolyHashWideFn.hash(utf8("hash join vector")))
  }

  test("shingle_hashes_wide >> 31 is elementwise shingle_hashes — " +
    "including the short-doc fallback") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
      .unionByName(Seq((90001L, ""), (90002L, "one"),
        (90003L, "two words")).toDF("doc_id", "text"))
    for (n <- Seq(2, 3, 8)) {
      val both = corpus.select(
        call_function("shingle_hashes",
          TextOps.tokens(col("text")), lit(n)).as("narrow"),
        call_function("shingle_hashes_wide",
          TextOps.tokens(col("text")), lit(n)).as("wide"))
      val bad = both.filter(size(col("narrow")) =!= size(col("wide")) ||
        exists(zip_with(col("wide"), col("narrow"),
          (w, nr) => shiftright(w, 31) =!= nr), x => x)).count()
      assert(bad == 0, s"n=$n: wide top plane diverges from narrow")
    }
  }

  /** Two distinct tokens colliding in plane 1 (the legacy 30-bit hash) —
    * found by birthday search over a deterministic token family; the
    * pair exists with overwhelming probability within ~2^17 draws over
    * the 1e9+7 space. */
  private lazy val plane1Collision: (String, String) = {
    val seen = scala.collection.mutable.HashMap.empty[Long, String]
    var res: (String, String) = null
    var i = 0
    while (res == null) {
      val t = s"tok$i"
      val h = PolyHashFn.hash(utf8(t))
      seen.get(h) match {
        case Some(prev) if prev != t => res = (prev, t)
        case _ => seen.update(h, t)
      }
      i += 1
    }
    res
  }

  test("a plane-1 birthday collision no longer passes the repeated gate") {
    val (a, b) = plane1Collision
    assert(a != b && PolyHashFn.hash(utf8(a)) == PolyHashFn.hash(utf8(b)))
    // the 2-gram window folds collide in the NARROW space…
    val na = ShingleHashesFn.shingles(arr(Seq(a, "x")), 2).toLongArray()(0)
    val nb = ShingleHashesFn.shingles(arr(Seq(b, "x")), 2).toLongArray()(0)
    assert(na == nb, "narrow 30-bit windows must collide by construction")
    // …but NOT in the wide space (plane 2 separates them)
    val wa = ShingleHashesWideFn.shingles(arr(Seq(a, "x")), 2).toLongArray()(0)
    val wb = ShingleHashesWideFn.shingles(arr(Seq(b, "x")), 2).toLongArray()(0)
    assert(wa != wb, "wide windows must separate a plane-1 collision")
    // end to end: two docs whose only shared structure is the collision
    // must produce NO repeated span (pre-widening they produced one each)
    val fx = Seq((1L, s"$a x"), (2L, s"$b x")).toDF("doc_id", "text")
    assert(NearDup.repeatedSpans(fx, "doc_id", "text", 2).count() == 0)
    // control: a REAL repeat still surfaces
    val real = Seq((1L, s"$a x"), (2L, s"$a x")).toDF("doc_id", "text")
    assert(NearDup.repeatedSpans(real, "doc_id", "text", 2).count() == 2)
  }

  test("exciseSpans fails fast on doc ids outside the packed-key domain") {
    val dup = (0 until 8).map(i => s"d$i").mkString(" ")
    val fx = Seq((1L, dup), (1L << 33, dup)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      NearDup.exciseSpans(fx, "doc_id", "text", 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("packed-key domain")),
      s"expected the id-domain guard, got: ${messages(e).mkString(" | ")}")
    // in-domain ids (including the max valid one) still excise fine
    val ok = Seq((1L, dup), ((1L << 33) - 1, dup)).toDF("doc_id", "text")
    val rows = NearDup.exciseSpans(ok, "doc_id", "text", 8)
      .orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == dup)  // canonical site keeps the text
    assert(rows(1).getString(1) == "")   // non-canonical copy excised
  }

  test("chunk hashes ride the wide key: distinct chunks get distinct " +
    "hashes across a plane-1 collision") {
    val (a, b) = plane1Collision
    val fx = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val hashes = TextOps.chunkRows(fx, "doc_id", "text", 32, 16)
      .select("chunk_hash").as[Long].collect()
    assert(hashes.distinct.length == 2,
      "wide chunk hashes must separate a plane-1 collision")
  }
}
