package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** The custom-Expression surface: FloatVectorDot must be bit-identical to
  * the HOF reference formulation (same fold), survive codegen, and handle
  * nulls like any binary expression.
  */
class ExpressionSpec extends SparkSpec {

  import spark.implicits._

  /** Runs `body` with the HOF→fvec_dot optimizer rewrite disabled, so the
    * HOF side of a twin test stays a genuine HOF plan (with the rule on,
    * native-vs-HOF equality tests would compare fvec_dot to itself). */
  private def withHofRuleOff[A](body: => A): A = {
    spark.conf.set("spark.graft.rewriteHofDot", "false")
    try body finally spark.conf.set("spark.graft.rewriteHofDot", "true")
  }

  test("fvec_dot == HOF zip_with/aggregate fold, bit-exact, on the corpus") {
    withHofRuleOff {
      val em = Tables.load(spark, sf001, "embeddings")
      val pairs = em.as("a").join(em.as("b"), col("a.vec_id") < col("b.vec_id"))
        .filter(col("a.vec_id") < 30)
        .select(
          Similarity.dot(col("a.embedding"), col("b.embedding")).as("native"),
          Similarity.dotHof(col("a.embedding"), col("b.embedding")).as("hof"))
      // the reference side must actually BE the HOF plan, not a rewrite
      assert(pairs.queryExecution.optimizedPlan.toString.contains("aggregate("))
      assert(pairs.filter(col("native") =!= col("hof")).count() === 0)
      assert(pairs.count() > 0)
    }
  }

  test("RewriteHofDot: the user-written HOF chain executes as fvec_dot, " +
    "same results; conservative non-matches are left alone") {
    val em = Tables.load(spark, sf001, "embeddings").filter(col("vec_id") < 50)
    // NOTE: the Dataset must be REBUILT under each flag state — a Dataset
    // caches its QueryExecution, so re-collecting the same instance after
    // flipping the flag would re-execute the already-optimized (rewritten)
    // plan and compare fvec_dot to itself.
    def buildHof() = em.as("a").join(em.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"),
        Similarity.dotHof(col("a.embedding"), col("b.embedding")).as("d"))
    val hof = buildHof()
    // rewritten: the optimized plan carries the native expression
    assert(hof.queryExecution.optimizedPlan.toString.contains("fvec_dot"))
    // and the rewrite changes nothing observable vs a genuine HOF run
    val rewritten = hof.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val genuine = withHofRuleOff {
      val g = buildHof()
      assert(!g.queryExecution.optimizedPlan.toString.contains("fvec_dot"))
      g.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    assert(rewritten === genuine)
    // non-match 1: float multiply (no double casts) rounds differently —
    // must NOT be rewritten
    val floatMult = em.select(
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> x * y), 0d, (s, v) -> s + v)"))
    assert(!floatMult.queryExecution.optimizedPlan.toString.contains("fvec_dot"))
    // non-match 2: a non-zero fold seed changes the result — must NOT be
    // rewritten
    val seeded = em.select(
      expr("aggregate(zip_with(embedding, embedding, " +
        "(x, y) -> double(x) * double(y)), 1d, (s, v) -> s + v)"))
    assert(!seeded.queryExecution.optimizedPlan.toString.contains("fvec_dot"))
    // non-match 2b: a NEGATIVE-zero seed is observable on empty arrays
    // (HOF yields -0.0, fvec_dot +0.0) — must NOT be rewritten
    val negZero = em.select(
      expr("aggregate(zip_with(embedding, embedding, " +
        "(x, y) -> double(x) * double(y)), -0d, (s, v) -> s + v)"))
    assert(!negZero.queryExecution.optimizedPlan.toString.contains("fvec_dot"))
    // non-match 3: flag off leaves even the canonical shape alone
    withHofRuleOff {
      val off = em.select(Similarity.dotHof(col("embedding"), col("embedding")))
      assert(!off.queryExecution.optimizedPlan.toString.contains("fvec_dot"))
    }
  }

  test("S9 UDF twins: udf == size(split) == ws_token_count, corpus + edges") {
    import graft.functions.UdfTwin
    val docs = Tables.load(spark, sf001, "documents").select(col("text"))
      .unionByName(Seq(
        Some("a b  c"),        // empty token between double spaces counts
        Some(" lead trail "),  // leading/trailing empties count (limit -1)
        Some("汉字 テスト x"),  // multi-byte chars: byte scan must not miscount
        Some(""), None).toDF("text"))
    val all = docs.select(
      UdfTwin.tokensNative(col("text")).as("chain"),
      UdfTwin.tokensUdf(col("text")).as("via_udf"),
      expr("ws_token_count(text)").as("native"))
    assert(all.filter(not(col("chain") <=> col("via_udf"))).count() === 0)
    assert(all.filter(not(col("chain") <=> col("native"))).count() === 0)
    assert(all.filter(col("native").isNull).count() === 1)
    assert(all.count() > 500)
  }

  test("ws_token_count runs inside whole-stage codegen") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(expr("ws_token_count(text)").as("n"))
    val plan = docs.queryExecution.executedPlan.toString
    // the LINE holding the expression must carry the codegen `*(n)` marker —
    // a span elsewhere in the plan (the scan's) would not prove anything
    val exprLine = plan.linesIterator.find(_.contains("ws_token_count"))
    assert(exprLine.isDefined, plan.take(500))
    assert("""\*\(\d+\)""".r.findFirstIn(exprLine.get).isDefined, exprLine.get)
  }

  test("fvec_dot: hand-computed values and null propagation") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.5f, -0.5f), Array(2.0f, 2.0f)))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), expr("fvec_dot(a, b)").as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(1L) === 32.0)
    assert(got(2L) === 0.0)
    val withNull = df.select(expr("fvec_dot(a, CAST(NULL AS ARRAY<FLOAT>))"))
      .collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("fvec_dot edge semantics match the HOF on length mismatch and null elements") {
    // zip_with pads the shorter array with nulls, so the HOF fold yields
    // NULL for mismatched lengths; a null ELEMENT likewise poisons the sum.
    // fvec_dot must agree (it used to truncate / read nulls as 0).
    val df = withHofRuleOff { Seq(
      ("mismatch", Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](Some(3.0))),
      ("null_elem", Seq[Option[Double]](Some(1.0), None),
        Seq[Option[Double]](Some(3.0), Some(4.0))),
      ("clean", Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](Some(3.0), Some(4.0))))
      .toDF("label", "a", "b")
      .select(col("label"),
        expr("fvec_dot(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (s, v) -> s + v)")
          .as("hof"))
      .collect() }
    val rows = df.map(r =>
      r.getString(0) -> (r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(rows("mismatch")._1 && rows("mismatch")._2)   // both NULL
    assert(rows("null_elem")._1 && rows("null_elem")._2) // both NULL
    assert(!rows("clean")._1 && rows("clean")._3 === 11.0)
  }

  test("S9: map column surface — map_from_arrays / element_at / map_keys") {
    val df = Seq((1L, Array("a", "b"), Array(10, 20))).toDF("id", "ks", "vs")
      .select(col("id"), map_from_arrays(col("ks"), col("vs")).as("m"))
    val r = df.select(
      element_at(col("m"), "b").as("b"),
      map_keys(col("m")).as("ks"),
      map_values(col("m")).as("vs"),
      size(col("m")).as("n")).collect()(0)
    assert(r.getInt(0) === 20)
    assert(r.getSeq[String](1) === Seq("a", "b"))
    assert(r.getSeq[Int](2) === Seq(10, 20))
    assert(r.getInt(3) === 2)
  }

  test("S9: scalar UDF twin agrees with the native function (overhead documented)") {
    // The extension-surface ordering claim (SURVEY §2.6-S9): native function
    // > UDF. Semantics must agree; the perf delta is logged, not asserted
    // (timing assertions flake on shared machines).
    val upperUdf = udf((s: String) => if (s == null) null else s.toUpperCase)
    val c = Tables.load(spark, sf001, "customer")
    val diff = c.select(upper(col("c_name")).as("a"), upperUdf(col("c_name")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tn = time((1 to 20).foreach(_ =>
      c.select(upper(col("c_name"))).write.format("noop").mode("overwrite").save()))
    val tu = time((1 to 20).foreach(_ =>
      c.select(upperUdf(col("c_name"))).write.format("noop").mode("overwrite").save()))
    info(f"native upper: $tn%.3f s, scala udf: $tu%.3f s (x${tu / tn}%.2f)")
  }

  test("morton_interleave == composed-builtin tree, bit-exact, incl. masking") {
    val ev = Tables.load(spark, sf001, "events")
      .select(col("event_id"), col("user_id"))
    val both = ev.select(
      graft.plans.Layout.mortonKey(col("user_id"), col("event_id")).as("native"),
      graft.plans.Layout.mortonKeyExpr(col("user_id"), col("event_id")).as("tree"))
    assert(both.filter(col("native") =!= col("tree")).count() === 0)
    // masking: values beyond `bits` bits are dropped identically
    val big = Seq((70000L, 3L)).toDF("x", "y").select(
      graft.plans.Layout.mortonKey(col("x"), col("y")).as("native"),
      graft.plans.Layout.mortonKeyExpr(col("x"), col("y")).as("tree"))
      .collect()(0)
    assert(big.getLong(0) === big.getLong(1))
    // null propagation
    val n = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .selectExpr("morton_interleave(x, y)").collect()(0)
    assert(n.isNullAt(0))
  }

  test("int8_quant_stats == HOF formulation, bit-exact, on the corpus") {
    val em = Tables.load(spark, sf001, "embeddings")
    val native = Similarity.quantizeInt8(em)
    val hof = Similarity.quantizeInt8Hof(em)
    assert(native.schema === hof.schema.copy(fields = native.schema.fields
      .zip(hof.schema.fields).map { case (n, h) => h.copy(nullable = n.nullable) }))
    val joined = native.as("n").join(hof.as("h"), Seq("vec_id"))
    // null-safe inequality (<=>): `=!=` yields null when either side is
    // null, silently dropping a row where one formulation returned a null
    // field and the other a value — exactly the plausible divergence shape.
    val diff = joined.filter(
      not(col("n.n_dims") <=> col("h.n_dims"))
        || not(col("n.scale") <=> col("h.scale"))
        || not(col("n.code_min") <=> col("h.code_min"))
        || not(col("n.code_max") <=> col("h.code_max"))
        || not(col("n.code_sum") <=> col("h.code_sum"))
        || not(col("n.recon_err") <=> col("h.recon_err"))).count()
    assert(diff === 0)
    assert(joined.count() > 0)
  }

  test("int8_quant_stats edge semantics: all-zero, empty, null vector") {
    val df = Seq(
      (1L, Some(Array(0.0f, 0.0f, 0.0f))), // all-zero: scale 0, codes 0
      (2L, Some(Array.empty[Float])),      // empty: (0,null,null,null,0,0.0)
      (3L, None)                           // null vector: null struct
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 3L && got(1L).getDouble(2) === 0.0
      && got(1L).getLong(3) === 0L && got(1L).getLong(4) === 0L
      && got(1L).getLong(5) === 0L && got(1L).getDouble(6) === 0.0)
    assert(got(2L).getLong(1) === 0L && got(2L).isNullAt(2)
      && got(2L).isNullAt(3) && got(2L).isNullAt(4)
      && got(2L).getLong(5) === 0L && got(2L).getDouble(6) === 0.0)
    assert((1 to 6).forall(got(3L).isNullAt))
    // empty-vector row matches the HOF chain exactly
    val hofEmpty = Similarity.quantizeInt8Hof(
      Seq((2L, Array.empty[Float])).toDF("vec_id", "embedding")).collect()(0)
    assert(hofEmpty.getLong(1) === 0L && hofEmpty.isNullAt(2)
      && hofEmpty.isNullAt(3) && hofEmpty.isNullAt(4)
      && hofEmpty.getLong(5) === 0L && hofEmpty.getDouble(6) === 0.0)
  }

  test("int8_quant_stats runs inside whole-stage codegen") {
    val em = Tables.load(spark, sf001, "embeddings")
    val df = Similarity.quantizeInt8(em)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val exprLine = plan.linesIterator.find(_.contains("int8_quant_stats"))
    assert(exprLine.isDefined, plan.take(500))
    assert("""\*\(\d+\)""".r.findFirstIn(exprLine.get).isDefined, exprLine.get)
  }

  test("fvec_dot runs inside whole-stage codegen") {
    val em = Tables.load(spark, sf001, "embeddings")
    val df = em.select(Similarity.norm2(col("embedding")).as("n2"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val exprLine = plan.linesIterator.find(_.contains("fvec_dot"))
    assert(exprLine.isDefined, plan.take(500))
    // the LINE holding the expression carries the codegen `*(n)` marker
    assert("""\*\(\d+\)""".r.findFirstIn(exprLine.get).isDefined, exprLine.get)
  }

  // --- bounded_top_m (plans.BoundedTopM) ---------------------------------

  /** The window formulation bounded_top_m replaces — the semantic twin. */
  private def windowTopM(df: org.apache.spark.sql.DataFrame, m: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= m)
      .select(col("g"), col("id"), col("s"))
  }

  private def aggTopM(df: org.apache.spark.sql.DataFrame, m: Int) =
    df.groupBy(col("g"))
      .agg(call_function("bounded_top_m", col("s"), col("id"), lit(m)).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.id").as("id"), col("e.score").as("s"))

  test("bounded_top_m == window top-m, independent of partition layout") {
    // scores derived from the corpus so ties and spreads are realistic
    val base = Tables.load(spark, sf001, "embeddings")
      .select((col("vec_id") % 7).as("g"), col("vec_id").as("id"),
        Similarity.norm2(col("embedding")).as("s"))
    for (parts <- Seq(1, 7, 32)) {
      val df = base.repartition(parts)
      val got = aggTopM(df, 5).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = windowTopM(df, 5).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === want, s"parts=$parts")
      assert(got.nonEmpty)
    }
  }

  test("bounded_top_m: ties break by lowest id; output is best-first; " +
    "m > group size returns the whole group; null rows are skipped") {
    val df = Seq[(Long, java.lang.Long, java.lang.Double)](
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), // three-way tie
      (1L, 13L, 9.0), (1L, 14L, 1.0),
      (2L, 20L, 2.0), (2L, 21L, null),                // null score ignored
      (2L, null, 8.0)                                 // null id ignored
    ).toDF("g", "id", "s")
    val rows = df.groupBy(col("g"))
      .agg(call_function("bounded_top_m", col("s"), col("id"), lit(3)).as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e =>
          (e.getDouble(0), e.getLong(1)))).toMap
    // g=1: best-first (9.0,13) then the tie resolved by id asc: 10, 11
    assert(rows(1L) === Seq((9.0, 13L), (5.0, 10L), (5.0, 11L)))
    // g=2: only the one fully-non-null row survives; m=3 > group size
    assert(rows(2L) === Seq((2.0, 20L)))
  }

  test("bounded_top_m aggregates with map-side partials (ObjectHashAggregate)") {
    val df = aggTopM(Tables.load(spark, sf001, "embeddings")
      .select((col("vec_id") % 7).as("g"), col("vec_id").as("id"),
        lit(1.0).as("s")), 4)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_bounded_top_m"), plan.take(1000))
    assert(plan.contains("ObjectHashAggregate"), plan.take(1000))
  }

  test("int8_pack/int8_packed_dot: packed dot == long-array HOF dot on the " +
    "corpus codes; roundtrip preserves every code") {
    val em = Tables.load(spark, sf001, "embeddings")
    // codes via the l48 formulation, once per vector
    val codes = em
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .withColumn("scale", array_max(transform(col("e"), x => abs(x))) / 127.0)
      .select(col("vec_id"), transform(col("e"), x =>
        when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(x / col("scale") + 0.5).cast("long"))).as("codes"))
    // packed self-join dot vs the HOF zip_with/aggregate fold over longs
    val a = codes.select(col("vec_id").as("ida"), col("codes").as("ca"),
      call_function("int8_pack", col("codes")).as("pa"))
    val b = codes.select(col("vec_id").as("idb"), col("codes").as("cb"),
      call_function("int8_pack", col("codes")).as("pb"))
    val joined = a.join(b, col("ida") < col("idb") && col("ida") % 50 === 0)
    val diff = joined.select(
      call_function("int8_packed_dot", col("pa"), col("pb")).as("packed"),
      aggregate(zip_with(col("ca"), col("cb"), (x, y) => x * y),
        lit(0L), (s, v) => s + v).as("hof"))
      .filter(not(col("packed") <=> col("hof"))).count()
    assert(diff === 0)
    assert(joined.count() > 0)
    // roundtrip: sign-extending the packed bytes re-yields every code
    a.select(col("ca"), col("pa")).collect().foreach { r =>
      val cs = r.getSeq[Long](0)
      val packed = r.getAs[Array[Byte]](1)
      assert(packed.length === cs.length)
      assert(packed.map(_.toLong).toSeq === cs)
    }
  }

  test("int8_pack/int8_packed_dot edge semantics: out-of-range, null " +
    "element, length mismatch, empty") {
    val got = Seq(
      (1L, Some(Seq[Option[Long]](Some(1L), Some(-127L)))), // packs
      (2L, Some(Seq[Option[Long]](Some(200L)))),            // out of range -> null
      (3L, Some(Seq[Option[Long]](Some(1L), None))),        // null element -> null
      (4L, Some(Seq.empty[Option[Long]])),                  // empty -> empty binary
      (5L, None)                                            // null array -> null
    ).toDF("id", "codes")
      .select(col("id"), call_function("int8_pack", col("codes")).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).get.asInstanceOf[Array[Byte]].toSeq === Seq(1.toByte, (-127).toByte))
    assert(got(2L).isEmpty && got(3L).isEmpty && got(5L).isEmpty)
    assert(got(4L).get.asInstanceOf[Array[Byte]].isEmpty)
    // dot: length mismatch -> null; empty x empty -> 0
    val d = Seq((Array[Byte](1, 2), Array[Byte](3), Array.empty[Byte]))
      .toDF("a", "b", "e")
      .select(
        call_function("int8_packed_dot", col("a"), col("b")).as("mismatch"),
        call_function("int8_packed_dot", col("e"), col("e")).as("empty"),
        call_function("int8_packed_dot", col("a"), col("a")).as("self"))
      .collect()(0)
    assert(d.isNullAt(0))
    assert(d.getLong(1) === 0L)
    assert(d.getLong(2) === 5L) // 1*1 + 2*2
  }

  test("int8_pack and int8_packed_dot run inside whole-stage codegen") {
    val em = Tables.load(spark, sf001, "embeddings")
    val df = Similarity.int8RerankTopKPacked(em)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the broadcast (query) side's projection sits under a
    // BroadcastExchange outside any codegen span — the pin is that the
    // CORPUS-side fused quantize+pack and the coarse dot run codegen'd, so
    // assert SOME occurrence of each sits inside a `*(n)` span
    def inSpan(needle: String): Boolean = plan.linesIterator
      .filter(_.contains(needle))
      .exists(l => """\*\(\d+\)""".r.findFirstIn(l).isDefined)
    assert(plan.contains("int8_quant_pack"), plan.take(1000))
    assert(inSpan("int8_quant_pack"),
      plan.linesIterator.filter(_.contains("int8_quant_pack")).mkString("\n"))
    assert(plan.contains("int8_packed_dot"), plan.take(1000))
    assert(inSpan("int8_packed_dot"),
      plan.linesIterator.filter(_.contains("int8_packed_dot")).mkString("\n"))
  }

  test("int8_quant_pack == HOF quantize + int8_pack, field for field, on " +
    "the corpus; null/empty edges answer NULL") {
    val em = Tables.load(spark, sf001, "embeddings")
    val hof = em
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .withColumn("scale", array_max(transform(col("e"), x => abs(x))) / 127.0)
      .select(col("vec_id"), col("scale"),
        call_function("int8_pack", transform(col("e"), x =>
          when(col("scale") === 0.0, lit(0L))
            .otherwise(floor(x / col("scale") + 0.5).cast("long")))).as("pk"))
    val fused = em.select(col("vec_id"),
      call_function("int8_quant_pack", col("embedding")).as("qp"))
      .select(col("vec_id"), col("qp.scale").as("scale"), col("qp.codes").as("pk"))
    val diff = fused.as("f").join(hof.as("h"), Seq("vec_id"))
      .filter(not(col("f.scale") <=> col("h.scale"))
        || not(col("f.pk") <=> col("h.pk"))).count()
    assert(diff === 0)
    assert(fused.count() > 0)
    val edges = Seq(
      (1L, Some(Array.empty[Float])),
      (2L, None),
      (3L, Some(Array(0.0f, 0.0f)))) // all-zero: scale 0, codes 0x0000
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        call_function("int8_quant_pack", col("embedding")).as("qp"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(edges(1L).isEmpty && edges(2L).isEmpty)
    val z = edges(3L).get.asInstanceOf[org.apache.spark.sql.Row]
    assert(z.getDouble(0) === 0.0)
    assert(z.getAs[Array[Byte]](1).toSeq === Seq(0.toByte, 0.toByte))
  }

  test("positional_gram_hashes n=1 == per-element md5Int32 (bandSignatures' shape)") {
    import graft.llm.TextOps
    // n = 1 hashes each element alone — the per-shingle md5Int32 the
    // S12/S14/S15 streaming band projection needs (Dedup.bandSignatures).
    // Null-FREE arrays only: shinglesFromTokens filters nulls, and the
    // n = 1 null-element semantics differ by design (the HOF yields a
    // null element, the native loop hashes the empty gram) — no call
    // site feeds nulls at n = 1.
    val docs = Tables.load(spark, sf001, "documents").select(col("text"))
      .unionByName(Seq(Some("a"), Some("x y z"), Some("")).toDF("text"))
      .select(TextOps.shinglesFromTokens(TextOps.tokens(col("text")), 3).as("shs"))
    val both = docs.select(
      transform(col("shs"), s => TextOps.md5Int32(s)).as("hof"),
      call_function("positional_gram_hashes", col("shs"), lit(1)).as("native"))
    assert(both.filter(not(col("hof") <=> col("native"))).count() === 0)
    assert(both.count() > 500)
  }

  test("positional_gram_hashes n=2 == HOF bigram md5Int32 twin (l51's grid)") {
    import graft.llm.TextOps
    // the l51 bigram digest as the original interpreted-HOF formulation
    val docs = Tables.load(spark, sf001, "documents").select(col("text"))
      .unionByName(Seq(Some("one"), Some("a b"), Some("x  y"),
        Some(""), None).toDF("text"))
      .select(TextOps.tokens(col("text")).as("toks"))
    val both = docs.select(
      when(size(col("toks")) >= 2,
        transform(sequence(lit(0), size(col("toks")) - 2),
          i => TextOps.md5Int32(concat_ws(" ",
            element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))))
        .otherwise(array().cast("array<bigint>")).as("hof"),
      call_function("positional_gram_hashes", col("toks"), lit(2)).as("native"))
    // the when/otherwise twin maps null toks to the otherwise branch
    // (empty), the native to null — compare only where toks is bound
    assert(both.filter(col("native").isNotNull)
      .filter(not(col("hof") <=> col("native"))).count() === 0)
    assert(both.filter(col("native").isNull).count() === 1)
  }

  test("positional_gram_hashes == HOF md5Int32 twin, corpus + edges") {
    import graft.llm.TextOps
    val n = 3
    // the l102 hash sequence as the original interpreted-HOF formulation
    def hofHashes(toks: org.apache.spark.sql.Column) = filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - n,
          TextOps.md5Int32(concat_ws(" ",
            (0 until n).map(k => element_at(toks, i + k + 1)): _*)))),
      x => x.isNotNull)
    val docs = Tables.load(spark, sf001, "documents").select(col("text"))
      .unionByName(Seq(
        Some("one two"),            // shorter than n: empty hash array
        Some("a b c"),              // exactly n: one gram
        Some("x  y z w"),           // double space: empty token participates
        Some(""), None).toDF("text"))
      .select(TextOps.tokens(col("text")).as("toks"))
    val both = docs.select(
      hofHashes(col("toks")).as("hof"),
      call_function("positional_gram_hashes", col("toks"), lit(n)).as("native"))
    assert(both.filter(not(col("hof") <=> col("native"))).count() === 0)
    assert(both.filter(col("native").isNull).count() === 1) // the null text
    assert(both.count() > 500)
    // null ELEMENT mid-array: concat_ws skips it (value and separator) —
    // the native loop must reproduce that, not emit a null gram
    val withNullElem = Seq(1).toDF("i")
      .select(array(lit("a"), lit(null.asInstanceOf[String]), lit("b"),
        lit("c")).as("toks"))
    val nn = withNullElem.select(
      hofHashes(col("toks")).as("hof"),
      call_function("positional_gram_hashes", col("toks"), lit(n)).as("native"))
    assert(nn.filter(not(col("hof") <=> col("native"))).count() === 0)
  }

  test("gram_extent == HOF longest-common-extension twin on corpus anchors") {
    import graft.llm.TextAnalysis
    import org.apache.spark.sql.Column
    // the original interpreted formulation, kept as the semantic reference
    def extentHof(bound: Column, mismatchAt: Column => Column): Column = {
      val mism = array_position(
        transform(sequence(lit(1), bound), t => mismatchAt(t)), true)
      when(bound < 1, lit(0L))
        .when(mism === 0, bound.cast("long")).otherwise(mism - 1)
    }
    def at(hs: String, p: Column): Column =
      element_at(col(hs), p.cast("int"))
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val wt = TextAnalysis.winnowTable(docs, 3, 4).localCheckpoint()
    val posts = wt.select(col("doc_id"),
        explode(arrays_zip(col("sel_pos"), col("sel_h"))).as("z"))
      .select(col("doc_id"), col("z.sel_pos").as("p"), col("z.sel_h").as("h"))
    val anchors = posts.as("a").join(posts.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("a.p").as("pa"),
        col("b.doc_id").as("b_id"), col("b.p").as("pb"))
      .join(wt.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
      .join(wt.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
    val maxBack = least(col("pa"), col("pb")) - 1
    val maxFwd = least(size(col("ha")) - col("pa"), size(col("hb")) - col("pb"))
    val both = anchors.select(
      extentHof(maxBack, t => at("ha", col("pa") - t) =!= at("hb", col("pb") - t)).as("lh"),
      extentHof(maxFwd, t => at("ha", col("pa") + t) =!= at("hb", col("pb") + t)).as("rh"),
      call_function("gram_extent",
        col("ha"), col("pa"), col("hb"), col("pb")).as("ext"))
    assert(both.filter(not(col("lh") <=> col("ext").getItem(0))
      || not(col("rh") <=> col("ext").getItem(1))).count() === 0)
    assert(both.count() > 100)
    // hand edges: anchor at both array boundaries, full-equality arrays
    val edges = Seq(
      (Seq(1L, 2L, 3L), 1, Seq(9L, 2L, 3L), 1),  // left boundary: l=0, fwd runs
      (Seq(1L, 2L, 3L), 2, Seq(1L, 2L, 3L), 2),  // identical arrays, mid anchor
      (Seq(5L), 1, Seq(5L), 1))                  // single-element arrays
      .toDF("ha", "pa", "hb", "pb")
      .select(call_function("gram_extent",
        col("ha"), col("pa"), col("hb"), col("pb")).as("ext"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(edges.toSeq === Seq(Seq(0L, 2L), Seq(1L, 1L), Seq(0L, 0L)))
  }

  test("positional_gram_hashes runs inside whole-stage codegen") {
    import graft.llm.TextOps
    val docs = Tables.load(spark, sf001, "documents")
      .select(TextOps.tokens(col("text")).as("toks"))
      .select(call_function("positional_gram_hashes", col("toks"), lit(3)).as("hs"))
    val plan = docs.queryExecution.executedPlan.toString
    val exprLine = plan.linesIterator.find(_.contains("positional_gram_hashes"))
    assert(exprLine.isDefined, plan.take(500))
    assert("""\*\(\d+\)""".r.findFirstIn(exprLine.get).isDefined, exprLine.get)
  }
}
