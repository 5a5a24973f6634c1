package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the probabilistic dedup/similarity primitives (the ⚙
  * queries' verification path, SURVEY §5.2).
  */
class MinHashPropSpec extends SparkSpec {
  import spark.implicits._

  private def minhashSig(words: Seq[String], k: Int): Seq[Long] = {
    val df = Seq(words).toDF("w")
    (0 until k).map { i =>
      df.select(expr(s"array_min(transform(w, x -> xxhash64(concat(x, '#$i'))))"))
        .as[Long].collect().head
    }
  }

  test("minhash signature equality rate approximates Jaccard similarity") {
    // two sets with known overlap: J = 50/150
    val a = (0 until 100).map(i => s"tok$i")
    val b = (50 until 150).map(i => s"tok$i")
    val j = 50.0 / 150.0
    val k = 64
    val sa = minhashSig(a, k); val sb = minhashSig(b, k)
    val matches = sa.zip(sb).count { case (x, y) => x == y }
    val est = matches.toDouble / k
    assert(math.abs(est - j) < 0.2, s"estimate $est too far from $j")
  }

  test("identical sets always produce identical signatures") {
    val gen = Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))
    (1 to 5).foreach { seed =>
      val words = gen.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).get
      val s1 = minhashSig(words, 4)
      val s2 = minhashSig(words.reverse, 4) // order must not matter
      assert(s1 == s2)
    }
  }

  test("simhash: near-duplicate token sets have smaller Hamming distance than random ones") {
    def sig(words: Seq[String]): Long =
      Seq(words).toDF("w")
        .select(expr("simhash64(w)")).as[Long].collect().head
    val base = (0 until 80).map(i => s"w$i")
    val nearDup = base.drop(4) ++ Seq("x1", "x2")     // ~92% overlap
    val random = (0 until 80).map(i => s"z$i")        // disjoint
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = hamming(sig(base), sig(nearDup))
    val far = hamming(sig(base), sig(random))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16, s"near-dup hamming too large: $near")
  }

  test("q42 chunk-banding has exact recall vs brute-force all-pairs at Hamming <= 3") {
    // pigeonhole: 3 differing bits across 4 disjoint 16-bit chunks leave at
    // least one chunk identical, so banded candidates ⊇ all true pairs.
    val sigged = graft.Tables.documents(spark, sfDir)
      .withColumn("simhash", expr("simhash64(array_distinct(split(lower(text), ' ')))"))
      .select("doc_id", "source", "simhash")
    val a = sigged.select(col("doc_id").as("a_id"), col("source"),
      col("simhash").as("a_sig"))
    val b = sigged.select(col("doc_id").as("b_id"), col("source").as("b_source"),
      col("simhash").as("b_sig"))
    val brute = a.join(b, col("source") === col("b_source") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(a_sig ^ b_sig) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Long)].collect().toSet
    val banded = graft.SparkEntry.queries("q42_dedup_simhash")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute,
      s"banded missed ${(brute -- banded).size}, extra ${(banded -- brute).size}")
  }

  test("langGuess is deterministic and total") {
    val df = Seq("the quick fox", "el perro es grande", "zzz qqq").toDF("text")
    val out = df.select(TextFunctions.langGuess(split(col("text"), " ")).as("g"))
      .as[String].collect()
    assert(out.length == 3)
    assert(out(0) == "en")
    assert(out(1) == "es")
    assert(out(2) == "und")
  }

  test("ANN IVF top-10 recalls part of the exact cosine top-10 (Q51 vs Q38)") {
    val exact = graft.SparkEntry.queries("q38_sim_cosine_topk")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val ivf = graft.SparkEntry.queries("q51_sim_ann_ivf")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall $recall collapsed")
  }

  test("ANN LSH top-10 recalls most of the exact cosine top-10 (Q43 vs Q38)") {
    val exact = graft.SparkEntry.queries("q38_sim_cosine_topk")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val ann = graft.SparkEntry.queries("q43_sim_ann_lsh")(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.2, s"ANN recall $recall collapsed (buckets too selective?)")
  }
}
