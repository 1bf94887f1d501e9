package graft.ops

import graft.SparkSpecBase

/** [[graft.ops.Assoc.basketRules]] — support/confidence/lift. */
class AssocSpec extends SparkSpecBase {

  test("basketRules: hand-computed support, confidence, lift") {
    val s = spark
    import s.implicits._
    // baskets: u1 {a,b}, u2 {a,b}, u3 {a}, u4 {b,c} → N = 4
    // duplicates within a basket must not inflate counts
    val df = Seq((1L, "a"), (1L, "b"), (1L, "a"),
      (2L, "a"), (2L, "b"), (3L, "a"), (4L, "b"), (4L, "c"))
      .toDF("u", "it")
    val got = Assoc.basketRules(df, "u", "it")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_joint"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
      .toMap
    // a→b: joint 2, m(a)=3, m(b)=3 → support .5, conf 2/3, lift 2·4/9
    assert(got(("a", "b")) === ((2L, 0.5, 0.666667, 0.888889)))
    // b→c: joint 1, m(b)=3, m(c)=1 → conf 1/3, lift 4/3
    assert(got(("b", "c")) === ((1L, 0.25, 0.333333, 1.333333)))
    // c→b is the reverse direction with its own confidence 1/1
    assert(got(("c", "b"))._3 === 1.0)
    // no self-rules
    assert(!got.contains(("a", "a")))
  }

  test("basketRules: minJoint prunes rare pairs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "b"),
      (3L, "c")).toDF("u", "it")
    val got = Assoc.basketRules(df, "u", "it", minJoint = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"), ("b", "a")))
  }
}
