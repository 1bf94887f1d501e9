package graft

import org.apache.spark.sql.functions._

import graft.ops.{Bpe, VectorOps}

/** Round-11 hardening: the BPE encode kernel (r10 verdict #2 — the merge
  * table as DATA instead of nested literal folds), the miners' banded
  * candidate tier (verdict #1), and the SQL-registration validation the
  * r10 advice asked for. */
class Round11Spec extends SparkSpecBase {

  // ---- bpe_segment kernel (q134/q137 path) ----

  /** The classic BPE fixture (Sennrich et al. '16): low/lower/newest/
    * widest word set — every corner of merge interaction in a few words. */
  private def fixtureWords = Seq("low", "lower", "newest", "widest",
    "lowest", "aaa", "a", "", "ababab", "newestnewest")

  private def fixtureMerges = Seq(
    Bpe.Merge(1, "e", "s", 0L), Bpe.Merge(2, "es", "t", 0L),
    Bpe.Merge(3, "l", "o", 0L), Bpe.Merge(4, "lo", "w", 0L),
    Bpe.Merge(5, "a", "a", 0L), Bpe.Merge(6, "a", "b", 0L),
    Bpe.Merge(7, "n", "e", 0L), Bpe.Merge(8, "ne", "w", 0L))

  test("bpe_segment: bit-identical to the nested-literal-fold form on " +
      "the classic fixture (including 'aaa' non-overlap and empty word)") {
    import spark.implicits._
    val words = fixtureWords.toDF("w")
    val fold = fixtureMerges.sortBy(_.rank).foldLeft(split(col("w"), "")) {
      case (acc, m) => Bpe.applyMerge(acc, m.left, m.right)
    }
    val out = words.select(col("w"),
        Bpe.segment(col("w"), fixtureMerges).as("k"), fold.as("f"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"kernel vs fold diverge on '${r.getString(0)}': " +
          s"${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
    }
    // the defining example: (a,a) over "aaa" merges left-to-right
    // non-overlapping → [aa, a]
    val aaa = out.find(_.getString(0) == "aaa").get
    assert(aaa.getSeq[String](1) == Seq("aa", "a"))
  }

  test("bpe_segment: bit-identical to the fold form on real corpus words") {
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
      .distinct().limit(2000)
    val fold = fixtureMerges.sortBy(_.rank).foldLeft(split(col("w"), "")) {
      case (acc, m) => Bpe.applyMerge(acc, m.left, m.right)
    }
    val n = words.select(col("w"),
        Bpe.segment(col("w"), fixtureMerges).as("k"), fold.as("f"))
      .filter(not(col("k") === col("f"))).count()
    assert(n == 0, s"$n corpus words diverge between kernel and fold")
  }

  test("bpe_segment: whole-stage codegen SUCCEEDS at production sizing " +
      "(4k merges) — generated method stays under the 64 KB JVM wall") {
    // 4k distinct merge pairs: the table is DATA, so its size must not
    // appear in the generated code. Input must be parquet-backed — a
    // local relation is folded away by ConvertToLocalRelation and never
    // plans a WholeStageCodegen span at all.
    val merges = (1 to 4000).map(i =>
      Bpe.Merge(i, s"x${i}l", s"x${i}r", 0L))
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
      .select(size(Bpe.segment(col("w"), merges)).as("ns"))
    // the plan must still be whole-stage-codegen'd...
    val plan = df.queryExecution.executedPlan
    val wsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"no WholeStageCodegen span in:\n$plan")
    // ...and the generated source must COMPILE with every method below
    // the JVM's 64 KB limit (the silent-fallback threshold r10 measured
    // in the SRP tier; hugeMethodLimit default is this same 65535)
    wsc.foreach { w =>
      val (_, source) = w.doCodeGen()
      val (_, stats) =
        org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
          .compile(source)
      assert(stats.maxMethodCodeSize < 65535,
        s"generated method ${stats.maxMethodCodeSize} bytes — past the " +
          "codegen wall")
    }
    // and the values still flow (no merge matches real words, so every
    // word segments to its char count)
    assert(df.limit(5).collect().forall(_.getInt(0) >= 1))
  }

  test("bpe_segment SQL registration: wrong arity and non-literal merge " +
      "tables are ANALYSIS errors, not runtime index crashes") {
    import spark.implicits._
    Seq("a").toDF("w").createOrReplaceTempView("r11_bpe_w")
    val e1 = intercept[Exception](
      spark.sql("SELECT bpe_segment(w) FROM r11_bpe_w").collect())
    assert(e1.getMessage.contains("exactly 2 arguments"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT bpe_segment(w, w) FROM r11_bpe_w").collect())
    assert(e2.getMessage.contains("foldable"), e2.getMessage)
  }

  test("srp_banded_sig SQL registration: wrong arity and non-integral " +
      "literals are ANALYSIS errors (r10 advice)") {
    import spark.implicits._
    Seq(Seq(1.0, 2.0)).toDF("v").createOrReplaceTempView("r11_srp_v")
    val e1 = intercept[Exception](
      spark.sql("SELECT srp_banded_sig(v, 4) FROM r11_srp_v").collect())
    assert(e1.getMessage.contains("exactly 3 arguments"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT srp_banded_sig(v, 4.5, 8) FROM r11_srp_v").collect())
    assert(e2.getMessage.contains("integral literal"), e2.getMessage)
  }

  // ---- miners on the banded candidate tier (r10 verdict #1) ----

  test("mutualNeighborsAuto: rides the banded sizing — equals the " +
      "explicit (srpBandCountForPlanes, autoPlaneCount) call, and " +
      "banded candidates never LOSE pairs vs the single-table shape") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = emb.count()
    val p = VectorOps.autoPlaneCount(n)
    val b = VectorOps.srpBandCountForPlanes(p)
    val auto = VectorOps.mutualNeighborsAuto(emb, knownN = Some(n))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicit = VectorOps.mutualNeighbors(emb, b, p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == explicit)
    // a single-table (bands = 1) miner finds a SUBSET of banded
    // candidates; its mutual pairs need not be a subset (rank-1 picks
    // can shift with more candidates), but the banded pair count must
    // not collapse below it
    val single = VectorOps.mutualNeighbors(emb, 1, p).count()
    assert(auto.size >= single / 2,
      s"banded ${auto.size} vs single-table $single")
  }

  test("marginMiningPairs: banded candidates keep a planted exceptional " +
      "pair that single-table bucketing at the same planes loses some " +
      "of (the decay the port exists to fix, in miniature)") {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    val twins = base.select((col("vec_id") + 5000000L).as("vec_id"),
      zip_with(col("embedding"), reverse(col("embedding")),
        (a, b) => a * lit(0.9f) + b * lit(0.1f)).as("embedding"),
      (col("label") + 1000).as("label"))
    val corpus = base.unionByName(twins).cache()
    val n = corpus.count()
    val p = VectorOps.autoPlaneCount(n)
    val b = VectorOps.srpBandCountForPlanes(p)
    def planted(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("vec_b") - col("vec_a") === 5000000L).count()
    val banded = planted(VectorOps.marginMiningPairs(corpus, b, p,
      k = 3, minMargin = 1.0))
    val single = planted(VectorOps.marginMiningPairs(corpus, 1, p,
      k = 3, minMargin = 1.0))
    assert(banded >= single, s"banded $banded < single $single")
    assert(banded > 0, "banded miner must find planted twins")
    corpus.unpersist()
  }

  // ---- exciseSpans (q269): canonical-occurrence retention ----

  test("exciseSpans: duplicated span cut everywhere but its canonical " +
      "(min doc) site; short and unique docs untouched") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta eta theta"),
      (2L, s"one two three $shared four five six seven eight"),
      (3L, "totally unique text with no repeats at all here ok fine"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = graft.ops.NearDup
      .exciseSpans(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 is the canonical site (min (doc, pos)) → kept intact
    assert(out(1L)._2 == 0L, s"canonical doc lost tokens: ${out(1L)}")
    assert(out(1L)._1.contains(shared))
    // doc 2 loses exactly the 8 shared tokens, in one span
    assert(out(2L) == (s"one two three four five six seven eight", 8L, 1L),
      s"got ${out(2L)}")
    // unique and sub-window docs pass through whitespace-normalized
    assert(out(3L)._2 == 0L && out(3L)._3 == 0L)
    assert(out(4L) == (("tiny doc", 0L, 0L)))
  }

  test("exciseSpans: a fully duplicated doc excises to the empty string") {
    import spark.implicits._
    val body = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq((10L, body), (20L, body)).toDF("doc_id", "text")
    val out = graft.ops.NearDup
      .exciseSpans(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(out(10L) == ((body, 0L)), "canonical copy must survive")
    assert(out(20L) == (("", 12L)), s"duplicate must fully excise: ${out(20L)}")
  }

  /** Straight-line reference implementation of the excision contract —
    * same PolyHashFn arithmetic, same packed-(doc,pos) canonicality,
    * same island merge — for differential fuzzing against the
    * distributed plan. */
  private def bruteExcise(docs: Seq[(Long, String)],
                          n: Int): Map[Long, (String, Long, Long)] = {
    import org.apache.spark.unsafe.types.UTF8String
    val M = 1000000007L
    def toks(t: String): Vector[String] =
      if (t.trim.isEmpty) Vector.empty else t.trim.split("\\s+").toVector
    def h1(s: String): Long =
      graft.functions.PolyHashFn.hash(UTF8String.fromString(s))
    case class Occ(id: Long, pos: Int, h: Long, wt: String) {
      def key: Long = id * (1L << 30) + pos
    }
    val occs = docs.flatMap { case (id, t) =>
      val tk = toks(t)
      if (tk.size < n) Nil
      else {
        val th = tk.map(h1)
        (0 to tk.size - n).map { i =>
          var h = th(i)
          (1 until n).foreach(j => h = (h * 31 + th(i + j)) % M)
          Occ(id, i, h, tk.slice(i, i + n).mkString(" "))
        }
      }
    }
    // hash prefilter, then canonicality per exact window TEXT — as the
    // operator does
    val byH = occs.groupBy(_.h)
    val byText = occs.filter(o => byH(o.h).size > 1)
      .groupBy(o => (o.h, o.wt))
    val cut = occs.filter { o =>
      byText.get((o.h, o.wt)).exists { g =>
        g.size > 1 && o.key != g.map(_.key).min
      }
    }
    val cutByDoc = cut.groupBy(_.id)
    docs.map { case (id, t) =>
      val tk = toks(t)
      val poss = cutByDoc.getOrElse(id, Nil).map(_.pos).distinct.sorted
      val removed = poss.flatMap(p => p until p + n).toSet
      val kept = tk.zipWithIndex.collect {
        case (w, i) if !removed(i) => w }
      val nSpans = poss.zipWithIndex
        .count { case (p, i) => i == 0 || poss(i - 1) != p - 1 }
      id -> ((kept.mkString(" "), (tk.size - kept.size).toLong,
        nSpans.toLong))
    }.toMap
  }

  test("exciseSpans: differential fuzz vs the straight-line reference " +
      "on random small-vocab corpora") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 40L).map { id =>
        val len = rnd.nextInt(25)
        id -> Vector.fill(len)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val expected = bruteExcise(docs, 3)
      val got = graft.ops.NearDup
        .exciseSpans(docs.toDF("doc_id", "text"), "doc_id", "text", 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got.keySet == expected.keySet, s"seed $seed: doc sets differ")
      expected.foreach { case (id, e) =>
        assert(got(id) == e,
          s"seed $seed doc $id: engine ${got(id)} vs reference $e " +
            s"(text '${docs.find(_._1 == id).get._2}')")
      }
    }
  }
}
