package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** Every native expression claims bit-identical results to its
  * higher-order-function / SQL twin — pinned here with exact equality
  * (no tolerance) over the real test tables.
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val docs = Tables.documents(spark, sfDir)

  test("cosine_similarity native ≡ zip_with/aggregate formulation (bitwise)") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val both = emb.crossJoin(broadcast(q)).select(
      VectorFunctions.cosineNative(col("embedding"), col("q_emb")).as("native"),
      VectorFunctions.cosine(col("embedding"), col("q_emb")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("dot_product native ≡ HOF formulation (bitwise)") {
    val both = emb.select(
      VectorFunctions.dotNative(col("embedding"), reverse(col("embedding"))).as("native"),
      VectorFunctions.dot(col("embedding"), reverse(col("embedding"))).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("word_shingles native ≡ transform/concat_ws formulation") {
    val both = docs.select(
      call_function("word_shingles", TextFunctions.tokens(col("text")), lit(3))
        .as("native"),
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sql"))
    assert(both.filter(col("native") =!= col("sql")).count() == 0)
  }

  test("md5_prefix32 native ≡ conv(substring(md5)) formulation, null-safe") {
    val toks = docs.filter(col("text").isNotNull)
      .select(explode(TextFunctions.tokens(col("text"))).as("t"))
    val both = toks.select(
      call_function("md5_prefix32", col("t")).as("native"),
      conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long").as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    // empty string has a well-defined digest; null stays null
    val edge = Seq(Some(""), None).toDF("t").select(
      call_function("md5_prefix32", col("t")).as("n"),
      conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long").as("b")).collect()
    assert(edge(0).getLong(0) == edge(0).getLong(1))
    assert(edge(1).isNullAt(0) && edge(1).isNullAt(1))
  }

  test("intersect_count native ≡ size(array_intersect) incl. duplicates and empties") {
    // corpus pairs: every doc's token set against the reversed next doc's
    val toks = TextFunctions.tokenSet(col("text"))
    val pairs = docs.select(toks.as("a"),
      reverse(lead(toks, 1).over(org.apache.spark.sql.expressions.Window
        .orderBy("doc_id"))).as("b"))
      .filter(col("b").isNotNull)
    val both = pairs.select(
      call_function("intersect_count", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(both.count() > 0)
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    // constructed edges: duplicate elements count once; empty/disjoint = 0;
    // asymmetric sizes exercise the build-smaller-side branch
    val edge = Seq(
      (Seq("a", "a", "b"), Seq("a")),
      (Seq("a"), Seq("a", "a", "b")),
      (Seq.empty[String], Seq("a")),
      (Seq("x", "y"), Seq("z")),
      (Seq("a", "b", "c", "d", "e"), Seq("e", "a"))).toDF("a", "b")
    val got = edge.select(
      call_function("intersect_count", col("a"), col("b")).as("n")).collect()
      .map(_.getInt(0)).toSeq
    assert(got == Seq(1, 1, 0, 0, 2), s"got $got")
  }

  test("nearest_centroid native ≡ interpreted HOF argmax fold (incl. tie/NaN/mismatch/empty edges)") {
    // real table: label centroids over the embeddings fixture — every row
    // assigned by both formulations must agree exactly
    val cents = graft.operators.IvfStorage.labelCentroids(emb)
    val centArr = cents.agg(array_sort(
      collect_list(struct(col("cent_id"), col("centroid")))).as("cents"))
    val hof = aggregate(col("cents"),
      struct(lit(-2.0).as("sim"), lit(-1).as("cid")),
      (acc, c) => {
        val sim = VectorFunctions.cosineNative(col("embedding"), c.getField("centroid"))
        when(sim > acc.getField("sim"),
          struct(sim.as("sim"), c.getField("cent_id").as("cid"))).otherwise(acc)
      }).getField("cid")
    val both = emb.crossJoin(broadcast(centArr)).select(
      call_function("nearest_centroid", col("embedding"), col("cents")).as("native"),
      hof.as("hofv"))
    assert(both.count() > 0)
    assert(both.filter(col("native") =!= col("hofv")).count() == 0)
    // constructed edges, BOTH formulations compared on every row: exact
    // tie (two identical centroids → smallest cent_id), zero VECTOR (NaN
    // cosine — Spark's `>` ranks NaN above everything, so the first
    // centroid wins and sticks), zero CENTROID mid-corpus (NaN for every
    // row — same rule), length-mismatched centroid (null cosine in the
    // HOF, skipped in the kernel), empty centroid array (-1 seed)
    def hofOn(centArr2: org.apache.spark.sql.DataFrame,
        e: org.apache.spark.sql.DataFrame) =
      e.crossJoin(broadcast(centArr2)).select(col("vec_id"),
        call_function("nearest_centroid", col("embedding"), col("cents"))
          .as("native"),
        hof.as("hofv"))
    val c2 = Seq(
      (1, Seq(1.0f, 0.0f)), (2, Seq(1.0f, 0.0f)), (3, Seq(0.0f, 1.0f)),
      (4, Seq(1.0f, 1.0f, 1.0f))).toDF("cent_id", "centroid")
    val c2Arr = c2.agg(array_sort(
      collect_list(struct(col("cent_id"), col("centroid")))).as("cents"))
    val e2 = Seq(
      (10L, Seq(2.0f, 0.1f)),   // nearest = tie-free cell 1
      (11L, Seq(1.0f, 1.0f)),   // bit-equal cosine to 1/2/3 → tie → 1
      (12L, Seq(0.0f, 0.0f)),   // zero vector: NaN beats all → first = 1
      (13L, Seq(0.1f, 5.0f))).toDF("vec_id", "embedding")
    val edge = hofOn(c2Arr, e2).orderBy("vec_id").collect()
    assert(edge.forall(r => r.getInt(1) == r.getInt(2)),
      s"native/HOF drift: ${edge.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq}")
    assert(edge.map(_.getInt(1)).toSeq == Seq(1, 1, 1, 3),
      s"got ${edge.map(_.getInt(1)).toSeq}")
    // a zero-norm centroid mid-array NaNs every row — first NaN wins in
    // both formulations (cent_id 0 sorts first here)
    val c3 = c2.unionByName(Seq((0, Seq(0.0f, 0.0f))).toDF("cent_id", "centroid"))
    val c3Arr = c3.agg(array_sort(
      collect_list(struct(col("cent_id"), col("centroid")))).as("cents"))
    val zc = hofOn(c3Arr, e2).orderBy("vec_id").collect()
    assert(zc.forall(r => r.getInt(1) == r.getInt(2)),
      s"zero-centroid drift: ${zc.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq}")
    assert(zc.map(_.getInt(1)).toSeq == Seq(0, 0, 0, 0))
    // empty centroid table → every row -1 (the HOF seed)
    val none = graft.operators.IvfStorage.assignCells(e2,
      c2.filter(col("cent_id") > 99))
      .select("cent_id").collect().map(_.getInt(0)).toSeq
    assert(none == Seq(-1, -1, -1, -1), s"got $none")
  }

  test("intersect_count_sorted over hashed projections ≡ intersect_count on the strings") {
    // the production composition: per-doc token_hashes (native sorted
    // distinct xxhash64 projection) feeding the merge kernel must count
    // exactly what the string kernel counts (duplicates once, empties 0);
    // also pin token_hashes ≡ its HOF formulation (same hash function)
    val hash = (c: String) => call_function("token_hashes", col(c))
    val toks = TextFunctions.tokenSet(col("text"))
    val pairs = docs.select(toks.as("a"),
      reverse(lead(toks, 1).over(org.apache.spark.sql.expressions.Window
        .orderBy("doc_id"))).as("b"))
      .filter(col("b").isNotNull)
    val both = pairs.select(
      call_function("intersect_count_sorted", hash("a"), hash("b")).as("fast"),
      call_function("intersect_count", col("a"), col("b")).as("exact"))
    assert(both.count() > 0)
    assert(both.filter(col("fast") =!= col("exact")).count() == 0)
    val edge = Seq(
      (Seq("a", "a", "b"), Seq("a")),
      (Seq.empty[String], Seq("a")),
      (Seq("x", "y"), Seq("z")),
      (Seq("a", "b", "c", "d", "e"), Seq("e", "a"))).toDF("a", "b")
    val got = edge.select(call_function("intersect_count_sorted",
        hash("a"), hash("b")).as("n")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 0, 0, 2), s"got $got")
    // token_hashes itself ≡ the HOF formulation, element for element
    val cmp = docs.select(
      call_function("token_hashes",
        TextFunctions.tokenSet(col("text"))).as("native"),
      expr("""array_sort(transform(array_distinct(
        |  split(lower(text), ' ')), x -> xxhash64(x)))""".stripMargin)
        .as("sql"))
    assert(cmp.filter(col("native") =!= col("sql")).count() == 0)
  }

  test("simhash64 native ≡ per-bit vote SQL formulation") {
    // the SQL twin is O(64·tokens) interpreted — keep the sample small
    val sample = docs.limit(25)
      .withColumn("toks", TextFunctions.tokenSet(col("text")))
    val sqlSig = expr(
      """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
        |  (acc, i) -> acc + IF(
        |    aggregate(toks, 0, (v, t) -> v + IF((shiftright(xxhash64(t), i) & 1) = 1, 1, -1)) > 0,
        |    shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin)
    val both = sample.select(
      call_function("simhash64", col("toks")).as("native"), sqlSig.as("sql"))
    assert(both.filter(col("native") =!= col("sql")).count() == 0)
  }

  test("simhash_md5_60 native ≡ md5-nibble vote SQL formulation, and uses only 60 bits") {
    val sample = docs.limit(25)
      .withColumn("toks", TextFunctions.tokenSet(col("text")))
    // per-token hash = first 15 md5 hex digits as a 60-bit value — the
    // exact expression the DuckDB q42b oracle uses on its side
    val sqlSig = expr(
      """aggregate(sequence(0, 59), CAST(0 AS BIGINT),
        |  (acc, i) -> acc + IF(
        |    aggregate(transform(toks, t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)),
        |      0, (v, h) -> v + IF((shiftright(h, i) & 1) = 1, 1, -1)) > 0,
        |    shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin)
    val both = sample.select(
      call_function("simhash_md5_60", col("toks")).as("native"), sqlSig.as("sql"))
    assert(both.filter(col("native") =!= col("sql")).count() == 0)
    assert(both.filter(col("native") < 0 ||
      col("native") >= (1L << 60)).count() == 0)
  }

  test("minhash_bands_md5: null on empty input, deterministic, md5-family (≠ xxhash family)") {
    val sh = call_function("word_shingles", TextFunctions.tokens(col("text")), lit(3))
    val both = docs.limit(50).select(col("doc_id"),
      call_function("minhash_bands_md5", sh, lit(16), lit(4)).as("m"),
      call_function("minhash_bands", sh, lit(16), lit(4)).as("x"))
    assert(both.filter(col("m") === col("x")).count() == 0,
      "md5 twin must be a different hash family, not an alias")
    val again = docs.limit(50).select(col("doc_id"),
      call_function("minhash_bands_md5", sh, lit(16), lit(4)).as("m"))
    assert(both.select("doc_id", "m").except(again).isEmpty)
    val empty = spark.sql(
      "SELECT minhash_bands_md5(CAST(array() AS array<string>), 16, 4) AS m")
    assert(empty.collect().head.isNullAt(0),
      "empty shingle set has no minimum — must be null in both engines")
  }

  test("md5_buckets native ≡ sorted-distinct md5_prefix32 % B formulation, null-safe") {
    val toks = TextFunctions.tokens(col("text"))
    val both = docs.filter(col("text").isNotNull).select(
      call_function("md5_buckets", toks, lit(64)).as("native"),
      array_sort(array_distinct(transform(toks, t =>
        pmod(call_function("md5_prefix32", t), lit(64L)).cast("int"))))
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    val edge = Seq((Seq("a", "a", "b"), 1), (Seq.empty[String], 2))
      .toDF("t", "k")
      .select(col("k"), call_function("md5_buckets", col("t"), lit(16)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(edge(1).length == 2, "duplicates collapse")
    assert(edge(2).isEmpty, "empty array stays empty (not null)")
    val nul = spark.sql("SELECT md5_buckets(CAST(NULL AS array<string>), 8) AS n")
    assert(nul.collect().head.isNullAt(0))
  }

  test("weight_lookup_sum native ≡ aggregate/element_at fold, out-of-range → 0") {
    val w = Array(10L, -20L, 30L, 0L)
    val rows = Seq((1, Seq(0, 2)), (2, Seq(1, 1, 3)), (3, Seq(7, -1)),
      (4, Seq.empty[Int]))
    val both = rows.toDF("k", "idx").select(col("k"),
      call_function("weight_lookup_sum", col("idx"), lit(w)).as("native"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(both(1) == 40L)
    assert(both(2) == -40L, "indices may repeat; each occurrence counts")
    assert(both(3) == 0L, "out-of-range indices contribute 0")
    assert(both(4) == 0L)
  }

  test("minhash_sig_md5 native ≡ transform/array_min/conv HOF formulation") {
    val both = docs.limit(50).select(
        org.apache.spark.sql.functions.call_function("minhash_sig_md5",
          org.apache.spark.sql.functions.array_distinct(
            org.apache.spark.sql.functions.split(
              org.apache.spark.sql.functions.lower(col("text")), " ")),
          org.apache.spark.sql.functions.lit(16)).as("native"),
        expr("""transform(sequence(1, 16), i -> array_min(transform(
          array_distinct(split(lower(text), ' ')),
          t -> cast(conv(substring(md5(concat(cast(i as string), '#', t)),
            1, 8), 16, 10) as bigint))))""").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // empty input → null (the minhash_bands_md5 convention)
    import spark.implicits._
    val e = Seq(Seq.empty[String]).toDF("w")
      .selectExpr("minhash_sig_md5(w, 16) AS s").collect()
    assert(e.head.isNullAt(0))
  }

  test("minhash_bands is stable and sensitive (same input → same bands; different input → different bands)") {
    val sh = call_function("word_shingles", TextFunctions.tokens(col("text")), lit(3))
    val bands = docs.select(col("doc_id"),
      call_function("minhash_bands", sh, lit(16), lit(4)).as("b"))
    val again = docs.select(col("doc_id"),
      call_function("minhash_bands", sh, lit(16), lit(4)).as("b"))
    assert(bands.except(again).isEmpty)
    assert(bands.select("b").distinct().count() > 450) // content-sensitive
  }

  test("wordpiece_encode ≡ independent greedy reference; UNK/empty/longest-match edges") {
    val vocab = Seq("a", "b", "c", "d", "e", "ab", "abc", "##a", "##b",
      "##c", "##cd", "##d", "##e", "##bc", "un", "##believ", "##able")
    // independent reference: straightforward recursive greedy matcher.
    // Initial positions may only match non-## pieces (a word literally
    // beginning with "##" must not hit a continuation piece — the kernel
    // and the q148 oracle both enforce this split).
    val initVocab = vocab.filterNot(_.startsWith("##")).toSet
    val contVocab = vocab.filter(_.startsWith("##")).toSet
    def ref(word: String): Seq[String] = {
      def longest(pos: Int): Option[String] = {
        val cands = (word.length to (pos + 1) by -1).iterator.map { end =>
          val raw = word.substring(pos, end)
          if (pos == 0) raw else "##" + raw
        }
        cands.find(c =>
          if (pos == 0) initVocab.contains(c) else contVocab.contains(c))
      }
      if (word.isEmpty) Seq.empty
      else {
        val out = scala.collection.mutable.Buffer[String]()
        var pos = 0
        while (pos < word.length) {
          longest(pos) match {
            case Some(p) =>
              out += p
              pos += (if (p.startsWith("##")) p.length - 2 else p.length)
            case None => return Seq("[UNK]")
          }
        }
        out.toSeq
      }
    }
    val words = Seq("abcd", "abc", "abcde", "ab", "a", "e", "", "unbelievable",
      "abz", "zab", "aaaa", "abcdcdcd", "eab", "##a", "##cd")
    val got = words.toDF("w")
      .select(col("w"), call_function("wordpiece_encode", col("w"),
        array(vocab.map(lit): _*)).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (w <- words) assert(got(w) == ref(w), s"word '$w': ${got(w)} vs ${ref(w)}")
    // semantics pins the reference itself must satisfy
    assert(got("abcd") == Seq("abc", "##d"), "longest initial match wins")
    assert(got("abcdcdcd") == Seq("abc", "##d", "##cd", "##cd"))
    assert(got("abz") == Seq("[UNK]"), "whole word fails, not a suffix")
    assert(got("") == Seq.empty)
    assert(got("eab") == Seq("e", "##a", "##b"),
      "initial 'ab' piece is not legal mid-word")
    assert(got("##a") == Seq("[UNK]"),
      "a word literally starting with '##' cannot match continuation pieces")
    // null word → null result
    val nulls = Seq((1, null: String)).toDF("k", "w")
      .select(call_function("wordpiece_encode", col("w"),
        array(vocab.map(lit): _*)).as("p"))
      .collect()
    assert(nulls.head.isNullAt(0))
    // non-foldable vocab rejected at analysis
    val err = intercept[Exception] {
      Seq(("x", Seq("x"))).toDF("w", "v")
        .select(call_function("wordpiece_encode", col("w"), col("v")))
        .collect()
    }
    assert(err.getMessage.contains("foldable"), err.getMessage)
  }

  test("centered_int_dot native ≡ zip_with/aggregate formulation, null edges") {
    val hof = expr("""aggregate(zip_with(a, b,
        (x, y) -> (2 * x - 255) * (2 * y - 255)),
      0L, (acc, v) -> acc + cast(v as bigint))""")
    // real codes: quantize the embeddings fixture and pair each vector's
    // codes against the reversed next vector's
    val codes = graft.operators.IvfStorage.quantize(emb,
      graft.operators.IvfStorage.quantizationParams(emb))
      .select(col("vec_id"), col("codes"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    val pairs = codes.select(col("codes").as("a"),
      reverse(lead(col("codes"), 1).over(w)).as("b"))
      .filter(col("b").isNotNull)
    val both = pairs.select(
      call_function("centered_int_dot", col("a"), col("b")).as("native"),
      hof.as("twin"))
    assert(both.count() > 0)
    assert(both.filter(col("native") =!= col("twin")).count() == 0)
    // length mismatch and null element → null, like the twin
    val edge = Seq(
      (Seq(0, 255), Seq(255, 0)),
      (Seq(1, 2, 3), Seq(1, 2))).toDF("a", "b")
      .select(call_function("centered_int_dot", col("a"), col("b")).as("n"))
      .collect()
    assert(edge(0).getLong(0) == (2L * 0 - 255) * (2L * 255 - 255) +
      (2L * 255 - 255) * (2L * 0 - 255))
    assert(edge(1).isNullAt(0), "length mismatch must be null")
    val nel = spark.sql(
      "SELECT centered_int_dot(array(1, CAST(NULL AS INT)), array(1, 2)) AS n")
    assert(nel.collect().head.isNullAt(0), "null element must be null")
  }

  test("two instances of each hand-codegen'd kernel compile in ONE projection (no Janino local redefinition)") {
    // Round-15 defect: kernels emitted FIXED local names (int n, double dot,
    // for (int i ...), java.lang.Double r). When CollapseProject lands two
    // instances in the same generated function, Janino fails with
    // "Redefinition of local variable" and Spark silently falls back to an
    // INTERPRETED UnsafeProjection (reproduced on q234). This spec compiles
    // two instances of every such kernel through GenerateUnsafeProjection
    // .generate, which — unlike UnsafeProjection.create — has NO interpreted
    // fallback: a name collision fails the test instead of hiding.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._

    val floatArr = ArrayType(FloatType)
    val qparamT = ArrayType(StructType(Seq(
      StructField("pos", IntegerType), StructField("mn", LongType),
      StructField("mx", LongType))))
    val cbT = ArrayType(StructType(Seq(
      StructField("sub", IntegerType), StructField("code", IntegerType),
      StructField("centroid", ArrayType(FloatType)))))

    // row: a, b (array<float>), qparams, codes4 (len-4 int8 codes),
    //      pqCodes (len-2 subspace codes), adcTable, codebooks
    val a = BoundReference(0, floatArr, nullable = true)
    val b = BoundReference(1, floatArr, nullable = true)
    val qp = BoundReference(2, qparamT, nullable = true)
    val codes4 = BoundReference(3, ArrayType(IntegerType), nullable = true)
    val pqCodes = BoundReference(4, ArrayType(IntegerType), nullable = true)
    val adcTable = BoundReference(5, ArrayType(DoubleType), nullable = true)
    val cbs = BoundReference(6, cbT, nullable = true)
    // lsh_sig needs >= 64 dims — its own pair of wide columns
    val wa = BoundReference(7, floatArr, nullable = true)
    val wb = BoundReference(8, floatArr, nullable = true)
    // hilbert_d grid coordinates
    val gx = BoundReference(9, LongType, nullable = true)
    val gy = BoundReference(10, LongType, nullable = true)

    val exprs: Seq[Expression] = Seq(
      CosineSimilarity(a, b), CosineSimilarity(b, a),
      DotProduct(a, b), DotProduct(b, a),
      Int8Quantize(a, qp), Int8Quantize(b, qp),
      QuantizedCosine(codes4, qp, a), QuantizedCosine(codes4, qp, b),
      LshSignature(wa), LshSignature(wb),
      Md5LshSignature(wa), Md5LshSignature(wb),
      PqEncode(a, cbs), PqEncode(b, cbs),
      PqAdcScore(pqCodes, adcTable), PqAdcScore(pqCodes, adcTable),
      CenteredIntDot(codes4, codes4), CenteredIntDot(pqCodes, pqCodes),
      HilbertIndex(gx, gy), HilbertIndex(gy, gx))
    exprs.foreach(e => assert(e.checkInputDataTypes().isSuccess, e.toString))

    // throws CompileException on any local-name collision — the assertion
    val proj = GenerateUnsafeProjection.generate(exprs)

    def fa(xs: Float*) = new GenericArrayData(xs.map(Float.box).toArray[Any])
    val row = new GenericInternalRow(Array[Any](
      fa(1.0f, 2.0f, 3.0f, 4.0f),
      fa(0.5f, -1.0f, 2.5f, 0.0f),
      new GenericArrayData((0 until 4).map(i => new GenericInternalRow(
        Array[Any](i, -5000000L, 5000000L))).toArray[Any]),
      new GenericArrayData(Array[Any](10, 200, 0, 255)),
      new GenericArrayData(Array[Any](1, 0)),
      new GenericArrayData(Array[Any](0.25, 1.5, -0.5, 2.0, 3.5, 0.0)),
      new GenericArrayData(Array[Any](
        new GenericInternalRow(Array[Any](0, 0, fa(1.0f, 2.0f))),
        new GenericInternalRow(Array[Any](0, 1, fa(0.0f, -1.0f))),
        new GenericInternalRow(Array[Any](1, 0, fa(3.0f, 4.0f))),
        new GenericInternalRow(Array[Any](1, 1, fa(-2.0f, 0.5f))))),
      fa((0 until 64).map(i => (i % 7).toFloat - 3.0f): _*),
      fa((0 until 64).map(i => 1.0f - (i % 5).toFloat): _*),
      12345L, 54321L))

    // generated output must equal the interpreted eval, slot for slot
    val out = proj(row)
    exprs.zipWithIndex.foreach { case (e, i) =>
      val expected = e.eval(row)
      assert(expected != null, s"fixture must exercise the non-null path: $e")
      e.dataType match {
        case DoubleType =>
          assert(out.getDouble(i) == expected.asInstanceOf[Double], e.toString)
        case IntegerType =>
          assert(out.getInt(i) == expected.asInstanceOf[Int], e.toString)
        case LongType =>
          assert(out.getLong(i) == expected.asInstanceOf[Long], e.toString)
        case ArrayType(IntegerType, _) =>
          assert(out.getArray(i).toIntArray.toSeq ==
            expected.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toIntArray.toSeq, e.toString)
        case StructType(fields) =>
          val got = out.getStruct(i, fields.length)
          val exp = expected.asInstanceOf[InternalRow]
          assert(got.getArray(0).toIntArray.toSeq ==
            exp.getArray(0).toIntArray.toSeq, e.toString)
          assert(got.getLong(1) == exp.getLong(1), e.toString)
        case t => fail(s"unhandled result type $t for $e")
      }
    }
  }
}
