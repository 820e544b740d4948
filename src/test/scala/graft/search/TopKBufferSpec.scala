package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the bounded heap against a sort-based reference model — pure JVM,
  * no Spark. The heap is the core of the big-index search path; eviction
  * or tie-break bugs here would silently corrupt rankings. */
class TopKBufferSpec extends AnyFunSuite {

  private def reference(xs: Seq[(Long, Double)], k: Int,
      asc: Boolean): Seq[(Long, Double)] =
    xs.sortWith { case ((ia, da), (ib, db)) =>
      if (da != db) { if (asc) da < db else da > db } else ia < ib
    }.take(k)

  test("fuzz: heap == sort-take-k over random streams, both directions") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 200) {
      val n = rnd.nextInt(60)
      val k = rnd.nextInt(12) + 1
      val asc = rnd.nextBoolean()
      // small value range to force plenty of distance ties
      val xs = Seq.fill(n)((rnd.nextInt(1000).toLong, rnd.nextInt(6).toDouble))
      val buf = new TopKBuffer(k, asc)
      xs.foreach { case (id, d) => buf.insert(d, id) }
      assert(buf.sorted.toSeq === reference(xs, k, asc),
        s"trial $trial n=$n k=$k asc=$asc")
    }
  }

  test("fuzz: merge(a, b) == single buffer over concatenated stream") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 100) {
      val k = rnd.nextInt(8) + 1
      val asc = rnd.nextBoolean()
      val xs = Seq.fill(rnd.nextInt(40))((rnd.nextInt(500).toLong, rnd.nextInt(5).toDouble))
      val ys = Seq.fill(rnd.nextInt(40))((rnd.nextInt(500).toLong, rnd.nextInt(5).toDouble))
      val a = new TopKBuffer(k, asc); xs.foreach { case (id, d) => a.insert(d, id) }
      val b = new TopKBuffer(k, asc); ys.foreach { case (id, d) => b.insert(d, id) }
      var i = 0
      while (i < b.size) { a.insert(b.dists(i), b.ids(i)); i += 1 }
      assert(a.sorted.toSeq === reference(xs ++ ys, k, asc), s"trial $trial")
    }
  }

  test("serialize/deserialize round-trip preserves contents") {
    val agg = TopKByDistance(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 5, asc = true)
    val buf = new TopKBuffer(5, true)
    Seq((1L, 3.0), (2L, 1.0), (3L, 2.0), (4L, 0.5), (5L, 9.0), (6L, 0.1))
      .foreach { case (id, d) => buf.insert(d, id) }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sorted.toSeq === buf.sorted.toSeq)
  }

  test("mergeHits builds and executes without mutating session conf") {
    // r15 set the ObjectHashAggregate fallback threshold from inside plan
    // building — a session-global side effect. The lift now lives in
    // GraftConf.applySessionDefaults (declared, session setup); mergeHits
    // itself must stay pure.
    val s = graft.TestSpark.spark.newSession()
    import s.implicits._
    val partials = Seq((0L, 1L, 0.9), (0L, 2L, 0.8), (1L, 3L, 0.7))
      .toDF(SparkSearcher.QID, SparkSearcher.ROW_ID, SparkSearcher.DIST)
    val merged = TopKAggregate.mergeHits(partials, 1, ascending = false)
    assert(!s.conf.getAll.contains(graft.GraftConf.TopKFallbackKey))
    val rows = merged.orderBy(SparkSearcher.QID).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 1L), (1L, 3L)))
    assert(!s.conf.getAll.contains(graft.GraftConf.TopKFallbackKey))
  }
}
