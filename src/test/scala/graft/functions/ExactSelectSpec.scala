package graft.functions

import graft.SparkSpec

/** Pins [[ExactSelect.medianByGroup]] — value-domain refinement — against a
  * driver sorted-reference k-th order statistic on adversarial fixtures:
  * odd/even group sizes, duplicates, negative values, single-row groups,
  * and a seeded randomized sweep. */
class ExactSelectSpec extends SparkSpec {
  import spark.implicits._

  private def reference(vs: Seq[Long]): (Long, Long, Long) = {
    val k = (vs.size + 1) / 2
    (vs.size.toLong, k.toLong, vs.sorted.apply(k - 1))
  }

  private def check(data: Map[String, Seq[Long]]): Unit = {
    val df = data.toSeq.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("grp", "v")
    val got = ExactSelect.medianByGroup(df, "grp", "v").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == data.keySet)
    data.foreach { case (g, vs) =>
      assert(got(g) == reference(vs), s"group $g: ${vs.sorted}")
    }
  }

  test("odd/even sizes, duplicates, negatives, singletons") {
    check(Map(
      "odd" -> Seq(5L, 1L, 9L, 3L, 7L),          // median 5
      "even" -> Seq(4L, 2L, 8L, 6L),             // lower median 4
      "dups" -> Seq(2L, 2L, 2L, 7L, 2L),         // median 2
      "neg" -> Seq(-10L, -3L, -7L, 0L, -1L, 4L), // lower median -3
      "one" -> Seq(42L),
      "two_same" -> Seq(0L, 0L)))
  }

  test("seeded randomized sweep across group shapes") {
    val rnd = new scala.util.Random(17)
    val data = (1 to 6).map { gi =>
      val n = 1 + rnd.nextInt(200)
      s"g$gi" -> Seq.fill(n)(rnd.nextInt(2000).toLong - 1000L)
    }.toMap
    check(data)
  }

  test("wide domain converges in few refinement rounds and stays exact") {
    val vs = Seq(Long.MinValue / 4, -1L, 0L, 1L, Long.MaxValue / 4, 17L, 23L)
    check(Map("wide" -> vs))
  }
}
