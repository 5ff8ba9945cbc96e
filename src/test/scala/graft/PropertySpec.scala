package graft

import graft.cdc.Envelope
import graft.functions.Validation
import graft.llm.{Dedup, TextAnalysis}
import graft.schema.{CustomerActivity, Schemas}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based invariants (SURVEY §5.4) — scalacheck generators drive
  * randomized inputs through the codec and validation planes; sampling is
  * SEEDED so failures reproduce.
  *
  * (scalatest's scalacheck bridge isn't on the offline classpath, so
  * generators are sampled explicitly — same coverage, deterministic.)
  */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g)(Gen.Parameters.default, rng.Seed(seed))
      .getOrElse(fail("generator exhausted"))

  /** Arbitrary in-domain activity rows — including hostile strings in the
    * free-text-adjacent fields via city (domain) vs feature (domain):
    * domains are fixed, so hostile content is injected through the money /
    * time dimensions and via a separate hostile-string generator below. */
  private val genActivity: Gen[CustomerActivity] = for {
    uid <- Gen.chooseNum(Schemas.idRangeStart.toInt, Schemas.idRangeEnd.toInt - 1)
    city <- Gen.oneOf(Schemas.cityDomain)
    trx <- Gen.oneOf(Schemas.transactionTypeDomain)
    cents <- Gen.chooseNum(10000L, 1000000L) // 100.00 .. 10000.00
    secs <- Gen.chooseNum(Schemas.timeinappMin, Schemas.timeinappMax)
    feat <- Gen.oneOf(Schemas.featureDomain)
    epochMs <- Gen.chooseNum(1704067200000L, 1735689600000L) // 2024
  } yield CustomerActivity(uid, city, trx,
    new java.math.BigDecimal(cents).movePointLeft(2),
    secs.toShort, feat, new java.sql.Timestamp(epochMs))

  /** Rows with hostile string content (quotes, backslashes, unicode,
    * control chars) in the city field — the JSON codec must round-trip
    * them byte-exactly even though they'd fail validation. */
  private val genHostile: Gen[CustomerActivity] = for {
    base <- genActivity
    s <- Gen.oneOf(
      "a\"b", "back\\slash", "new\nline", "tab\tchar", "日本語",
      "emoji🙂", "{\"json\":1}", "', DROP TABLE --", "\u0000nul", " ")
  } yield base.copy(city = s)

  test("property: CDC envelope round-trips arbitrary in-domain rows exactly") {
    val rows = sample(genActivity, 200, seed = 42L)
    val df = Fixtures.df(spark, rows)
    val back = Envelope.flatten(Envelope.decode(Envelope.encode(df, lit("insert"))))
      .drop("operation")
    val orig = df.select(back.columns.map(col): _*)
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty)
    assert(back.count() === 200)
  }

  test("property: envelope codec survives hostile strings (JSON escaping)") {
    val rows = sample(genHostile, 60, seed = 7L)
    val df = Fixtures.df(spark, rows)
    val back = Envelope.flatten(Envelope.decode(Envelope.encode(df, lit("update"))))
      .drop("operation")
    val orig = df.select(back.columns.map(col): _*)
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty)
  }

  test("property: every in-domain generated row is valid, none quarantined") {
    val df = Fixtures.df(spark, sample(genActivity, 300, seed = 11L))
    assert(Validation.valid(df).count() === 300)
    assert(Validation.quarantine(df).count() === 0)
  }

  test("property: any single out-of-domain mutation lands in quarantine") {
    val base = sample(genActivity, 50, seed = 13L)
    val mutated = Fixtures.df(spark, base)
      .withColumn("city", concat(col("city"), lit("X"))) // 4 chars, off-domain
    assert(Validation.valid(mutated).count() === 0)
    assert(Validation.quarantine(mutated).count() === 50)
    val m2 = Fixtures.df(spark, base)
      .withColumn("monetary_value",
        (col("monetary_value") + 100000).cast("decimal(8,2)"))
    assert(Validation.quarantine(m2).count() === 50)
  }

  test("property: latest-state keeps exactly one newest image per key") {
    val rows = sample(genActivity, 150, seed = 17L)
    val df = Fixtures.df(spark, rows).withColumn("operation", lit("insert"))
    val latest = graft.cdc.LatestState.batch(df)
    val keys = latest.groupBy("user_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(keys === 1L)
    // and each kept row carries its key's max ts
    val joined = latest.as("l").join(
      df.groupBy("user_id").agg(max("ts").as("mx")).as("m"), "user_id")
      .filter(col("l.ts") =!= col("m.mx"))
    assert(joined.count() === 0)
  }

  test("property: morton key round-trips — deinterleaving recovers (x, y)") {
    import spark.implicits._
    val xs = sample(Gen.chooseNum(0L, 65535L), 200, seed = 11L)
    val ys = sample(Gen.chooseNum(0L, 65535L), 200, seed = 13L)
    val df = xs.zip(ys).toDF("x", "y")
    val rows = df.select(col("x"), col("y"),
      graft.plans.Layout.mortonKey(col("x"), col("y")).as("z")).collect()
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val dx = (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val dy = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert((dx, dy) === ((x, y)), s"z=$z")
    }
  }

  test("property: ws_token_count == String.split on arbitrary unicode text") {
    import spark.implicits._
    val genText: Gen[String] = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      4 -> Gen.const(" "),
      2 -> Gen.oneOf("汉", "テ", "ß", "é", "🙂", "\t", ".", "@"),
      1 -> Gen.const("\n"))).map(_.mkString)
    val texts = sample(genText, 300, seed = 41L) :+ "" :+ " " :+ "  "
    val got = texts.toDF("text")
      .select(col("text"), expr("ws_token_count(text)").as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    texts.foreach { t =>
      assert(got(t) === t.split(" ", -1).length, s"text=${t.take(40)}")
    }
  }

  test("property: dupShingleProfile is partition-layout-independent and " +
    "bounded; duplicate copies are fully duplicated") {
    import spark.implicits._
    val genWord: Gen[String] = Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val genText: Gen[String] =
      Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, genWord)).map(_.mkString(" "))
    val texts = sample(genText, 60, seed = 17L)
    // plant exact duplicates so dup_frac = 1.0 rows must exist
    val docs = (texts ++ texts.take(5)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Dedup.dupShingleProfile(df, n = 3).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
    val base = run(docs)
    // invariants: n_dup <= n_shingles, frac consistent
    base.values.foreach { case (n, d, f) =>
      assert(d <= n && f === d.toDouble / n)
    }
    // planted copies: both members of each duplicate pair are 100% duplicated
    (0 until 5).foreach { i =>
      assert(base(i.toLong)._3 === 1.0)
      assert(base((texts.size + i).toLong)._3 === 1.0)
    }
    // the profile is a pure function of content — any physical layout
    // (partition count, row order) produces the identical map
    assert(run(docs.repartition(17)) === base)
    assert(run(docs.orderBy(col("doc_id").desc).coalesce(1)) === base)
  }

  test("property: int8RerankTopK and sourceOverlap are partition-layout-independent") {
    import spark.implicits._
    val em = Tables.load(spark, sf001, "embeddings")
    def runRerank(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Similarity.int8RerankTopK(df, k = 2, m = 5, queryMod = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val base = runRerank(em)
    assert(base.nonEmpty)
    // deterministic tie-breaks (nid) make the result a pure function of
    // content: any partitioning/order produces the identical map
    assert(runRerank(em.repartition(7)) === base)
    assert(runRerank(em.orderBy(col("vec_id").desc).coalesce(1)) === base)

    val docs = Tables.load(spark, sf001, "documents")
    def runOverlap(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Dedup.sourceOverlap(df, n = 3)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(5))).toMap
    val ov = runOverlap(docs)
    assert(runOverlap(docs.repartition(11)) === ov)
  }

  test("property: incrementalDedup verdicts match a straight-line reference " +
    "over the operator's own band sets on random corpora") {
    import spark.implicits._
    // Tiny vocabulary so random docs actually share shingles; lengths 2-10
    // so shingle-less (< 3 tokens) docs exercise the kept-by-default leg.
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val genDoc = for {
      len <- Gen.chooseNum(2, 10)
      toks <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield toks.mkString(" ")
    val texts = sample(genDoc, 25, seed = 77L)
    val corpusTexts = texts.take(15)
    val corpusDf = corpusTexts.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    // Planted structure (random independent docs essentially never produce
    // a FULL band collision): re-crawls of corpus docs with the last token
    // edited, fresh random docs, and re-posts of the fresh docs — so all
    // three verdict paths occur and the reference must rank them.
    val recrawls = corpusTexts.take(5).map { t =>
      val toks = t.split(" "); (toks.dropRight(1) :+ "zz").mkString(" ")
    }
    val fresh = texts.drop(15)
    val reposts = fresh.take(5)
    val batchIds = (recrawls ++ fresh ++ reposts).zipWithIndex
      .map { case (t, i) => (200L + i, t) }
    val batchDf = batchIds.toDF("doc_id", "text")

    val got = Dedup.incrementalDedup(batchDf, Dedup.bandIndex(corpusDf))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // Reference: the SAME band primitive, but the verdict logic re-derived
    // as straight-line set algebra — cross-validates the distributed
    // window/join/fold plumbing, which is where layout bugs would live.
    def bandsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Set[(Int, String)]] =
      Dedup.bandSignatures(df).collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
        .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    val corpusBands = bandsOf(corpusDf).values.flatten.toSet
    val batchBands = bandsOf(batchDf)
    val expected = batchIds.map { case (id, _) =>
      val bs = batchBands.getOrElse(id, Set.empty[(Int, String)])
      val dupC = bs.exists(corpusBands)
      val dupB = bs.exists(b =>
        batchBands.exists { case (oid, obs) => oid < id && obs(b) })
      id -> (if (dupC) "dup_corpus" else if (dupB) "dup_batch" else "kept")
    }.toMap
    assert(got === expected)
    // the random draw must actually exercise more than one verdict class
    assert(expected.values.toSet.size >= 2, expected.toString)
  }

  test("property: PII redaction is idempotent and leaves no pattern behind") {
    import spark.implicits._
    import graft.llm.TextAnalysis
    val genDoc: Gen[String] = for {
      pre <- Gen.listOfN(4, Gen.alphaLowerStr).map(_.mkString(" "))
      user <- Gen.alphaLowerStr.suchThat(_.nonEmpty)
      n <- Gen.chooseNum(100000000L, 9999999999L)
      p <- Gen.chooseNum(0, 999)
    } yield f"$pre $user@host.example.org id $n tel $p%03d-555-0199 end"
    val docs = sample(genDoc, 100, seed = 43L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = TextAnalysis.redactPii(docs)
    // redacting already-redacted text changes nothing and finds nothing
    val masked = docs.select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        TextAnalysis.EmailRe, "<EMAIL>"), TextAnalysis.PhoneRe, "<PHONE>"),
        TextAnalysis.LongIdRe, "<ID>").as("text"))
    val twice = TextAnalysis.redactPii(masked)
    assert(twice.filter(col("n_emails") + col("n_phones") + col("n_ids") > 0)
      .count() === 0)
    assert(once.select("doc_id", "redacted_md5").except(
      twice.select("doc_id", "redacted_md5")).count() === 0)
    // and every generated doc really carried PII into the redactor
    assert(once.filter(col("n_emails") >= 1 && col("n_phones") >= 1 &&
      col("n_ids") >= 1).count() === 100)
  }

  test("property: star contraction matches union-find on random graphs") {
    import spark.implicits._
    // 3 seeded random graphs: 60 nodes, 70 edges each — enough to mix
    // multi-component, cycles, and isolated-by-self-pair shapes.
    for (seed <- Seq(17L, 29L, 31L)) {
      val edges = sample(for {
        a <- Gen.chooseNum(0L, 59L)
        b <- Gen.chooseNum(0L, 59L)
      } yield (a, b), 70, seed)
      // driver-side union-find reference (test-only oracle)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      val got = Dedup.nearDupClustersStar(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: snapshotDiff over merged states recovers the applied batch") {
    // Integration invariant tying D45 to the CDC merge plane: diffing the
    // latest-state BEFORE and AFTER a batch of changes classifies exactly
    // that batch — updates for changed keys, inserts for new keys, deletes
    // for deleted keys, silence for untouched keys.
    import graft.cdc.LatestState
    val s1 = Fixtures.df(spark, Seq(
      Fixtures.row(1, "BOM", "CREDIT", "100.00", 120, "ENQUIRY", "2024-01-01 10:00:00"),
      Fixtures.row(2, "DEL", "CREDIT", "200.00", 120, "ENQUIRY", "2024-01-01 10:00:00"),
      Fixtures.row(3, "MAA", "CREDIT", "300.00", 120, "ENQUIRY", "2024-01-01 10:00:00")))
      .withColumn("operation", lit("load"))
    val batch = Fixtures.df(spark, Seq(
      Fixtures.row(2, "GOI", "CREDIT", "250.00", 120, "ENQUIRY", "2024-01-01 11:00:00"),
      Fixtures.row(4, "COK", "CREDIT", "400.00", 120, "ENQUIRY", "2024-01-01 11:00:00")))
      .withColumn("operation", lit("update"))
      .unionByName(Fixtures.df(spark, Seq(
        Fixtures.row(3, "MAA", "CREDIT", "300.00", 120, "ENQUIRY", "2024-01-01 11:00:00")))
        .withColumn("operation", lit("delete")))
    val before = LatestState.batch(s1).drop("operation")
    val after = LatestState.batch(s1.unionByName(batch)).drop("operation")
    // ts changes on update, so diff on the payload columns minus ts
    val got = LatestState.snapshotDiff(
        before.drop("ts"), after.drop("ts"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq((2, "update"), (3, "delete"), (4, "insert")))
  }

  test("property: tokenBudgetSample equals the unsalted global cumsum on " +
    "random corpora and budgets; kept set is a prefix of the md5 order") {
    import spark.implicits._
    val genDoc = for {
      len <- Gen.chooseNum(0, 12) // 0-token docs: n_tokens edge
      toks <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc"))
      // null text (counts zero) and null source (its own budget group)
      // keep the review-hardened degenerate paths under random fire
      text <- Gen.frequency(9 -> Gen.const(toks.mkString(" ")),
        1 -> Gen.const(null: String))
      src <- Gen.frequency(9 -> Gen.oneOf("s0", "s1", "s2", "s3"),
        1 -> Gen.const(null: String))
    } yield (text, src)
    def md5hex(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    for (seed <- Seq(3L, 19L)) {
      val rows = sample(genDoc, 80, seed).zipWithIndex
        .map { case ((t, s), i) => (i.toLong, t, s) }
      val d = rows.toDF("doc_id", "text", "source")
      for (budget <- Seq(1L, 7L, 23L, 10000L)) {
        // the reference is the UNSALTED form: one global cumsum per source
        // in full-md5 order — exactly what the salted two-phase sum must
        // reproduce (bucket prefix of the order key => same order)
        val expected = rows.groupBy(_._3).values.flatMap { grp =>
          val ordered = grp.sortBy(r => md5hex(r._1))
          // split with -1 limit mirrors Spark's split(): "" -> [""], so an
          // empty doc counts ONE whitespace token, exactly like
          // ws_token_count / len(string_split) in the oracle family;
          // null text coalesces to ZERO (the operator's documented rule)
          val before = ordered.scanLeft(0L)((acc, r) =>
            acc + (if (r._2 == null) 0L else r._2.split(" ", -1).length.toLong)).init
          ordered.zip(before).collect { case (r, b) if b < budget => r._1 }
        }.toSet
        val got = TextAnalysis.tokenBudgetSample(d, budget)
          .collect().map(_.getLong(0)).toSet
        assert(got === expected, s"seed=$seed budget=$budget")
        // prefix property: per source, the kept docs are exactly the first
        // |kept| docs of the md5 order — no holes
        rows.groupBy(_._3).values.foreach { grp =>
          val ordered = grp.sortBy(r => md5hex(r._1)).map(_._1)
          val keptInOrder = ordered.takeWhile(got.contains)
          assert(ordered.count(got.contains) === keptInOrder.size,
            s"seed=$seed budget=$budget: kept set has holes")
        }
      }
    }
  }

  test("property: sourceQualityDrift conserves rank mass (Σ2r = N(N+1)), " +
    "AUC stays in [0,1], and the result is partition-layout-independent") {
    import spark.implicits._
    val genDoc = for {
      len <- Gen.chooseNum(0, 8)
      toks <- Gen.listOfN(len, Gen.oneOf("the", "a", "xx", "yy", "zz"))
      // null text (unrankable, dropped) and null source (its own group)
      text <- Gen.frequency(9 -> Gen.const(toks.mkString(" ")),
        1 -> Gen.const(null: String))
      src <- Gen.frequency(9 -> Gen.oneOf("s0", "s1", "s2"),
        1 -> Gen.const(null: String))
    } yield (text, src)
    for (seed <- Seq(5L, 23L)) {
      val rows = sample(genDoc, 60, seed).zipWithIndex
        .map { case ((t, s), i) => (i.toLong, t, s) }
      val d = rows.toDF("doc_id", "text", "source")
      def run(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.sourceQualityDrift(df).collect()
          .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getDouble(4))).sortBy(_._1)
      val out = run(d)
      val nRanked = out.map(_._2).sum
      // tie-averaged ranks (×2) of ALL ranked docs sum to N(N+1) no
      // matter how ties group — the conservation a tie-handling bug
      // would break first
      assert(out.map(_._3).sum === nRanked * (nRanked + 1), s"seed=$seed")
      out.foreach { case (src, n, _, _, auc) =>
        if (nRanked - n > 0)
          assert(auc >= 0.0 && auc <= 1.0, s"seed=$seed src=$src auc=$auc")
      }
      assert(run(d.repartition(7, col("doc_id"))).toSeq === out.toSeq,
        s"seed=$seed: layout changed the drift table")
    }
  }

  test("property: weightedJaccardPairs equals a straight-line weighted-set " +
    "reference on random overlapping corpora") {
    import spark.implicits._
    // small alphabet => dense shingle overlap: pairs actually survive the
    // 0.5 threshold and the integer weights span 1..N
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    val genDoc: Gen[String] =
      Gen.chooseNum(3, 10).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    def shingleSet(text: String): Set[String] =
      text.split(" ", -1).toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    Seq(13L, 29L).foreach { seed =>
      val texts = sample(genDoc, 30, seed)
      val n = texts.length.toLong
      val sets = texts.zipWithIndex.map { case (t, i) => (i.toLong, shingleSet(t)) }
      val df = sets.flatMap(_._2).groupBy(identity).map { case (h, o) => h -> o.size.toLong }
      def w(h: String): Long = n / df(h)
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        common = (sa & sb).toSeq.map(w).sum if common > 0
        wa = sa.toSeq.map(w).sum; wb = sb.toSeq.map(w).sum
        jw = common.toDouble / (wa + wb - common) if jw >= 0.5
      } yield (a, b, common, jw)).toSet
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.weightedJaccardPairs(d, n = 3, minW = 0.5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: diversity-sample merge is order- and split-independent " +
    "on random vector batches") {
    import spark.implicits._
    import graft.llm.Similarity
    val dim = 8; val planes = 4; val cap = 2
    val genVec: Gen[Seq[Float]] =
      Gen.listOfN(dim, Gen.chooseNum(-1000, 1000).map(_ / 1000.0f)).map(_.toSeq)
    Seq(17L, 43L).foreach { seed =>
      val vecs = sample(genVec, 40, seed).zipWithIndex
        .map { case (e, i) => (i.toLong, e.toArray) }
      val all = vecs.toDF("vec_id", "embedding")
      val whole = Similarity.diversitySample(all, cap, planes, dim)
      // deterministic pseudo-random 3-way split from the same seed
      val assign = sample(Gen.chooseNum(0, 2), 40, seed + 1)
      val batches = (0 to 2).map(g =>
        vecs.zip(assign).filter(_._2 == g).map(_._1).toDF("vec_id", "embedding"))
      // fold in two different orders — both must equal the whole-corpus
      // sample (associativity + commutativity of the bottom-cap merge)
      for (order <- Seq(Seq(0, 1, 2), Seq(2, 0, 1))) {
        val folded = order.map(batches)
          .map(b => Similarity.diversitySample(b, cap, planes, dim))
          .reduce((a, b) => Similarity.mergeDiversitySamples(a, b, cap))
        assert(folded.exceptAll(whole).isEmpty
          && whole.exceptAll(folded).isEmpty, s"seed=$seed order=$order")
      }
    }
  }

  test("property: bandConfigSweep candidate sets nest and every planted " +
    "exact dup is caught at every config on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8",
      "w9", "wa", "wb", "wc")
    val genDoc: Gen[String] =
      Gen.chooseNum(4, 12).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    Seq(5L, 23L).foreach { seed =>
      val base = sample(genDoc, 25, seed).distinct
      // plant one exact duplicate of each of the first 3 docs: J = 1
      // pairs that every (bands, rows) tiling MUST catch
      val texts = base ++ base.take(3)
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sweep = Dedup.bandConfigSweep(d, n = 3, k = 16,
        bandConfigs = Seq(2, 4, 8, 16), minJ = 1.0)
        .orderBy(col("bands")).collect()
      val nTruth = sweep.head.getLong(4)
      assert(nTruth >= 3, s"seed=$seed: planted dups must be truth pairs")
      sweep.foreach { r =>
        assert(r.getLong(4) === nTruth, s"seed=$seed truth config-invariant")
        assert(r.getLong(3) === nTruth && r.getDouble(5) === 1.0,
          s"seed=$seed: exact dups caught at bands=${r.getLong(0)}")
      }
      val cands = sweep.map(_.getLong(2))
      assert(cands.sameElements(cands.sorted),
        s"seed=$seed: hierarchical tilings must nest")
    }
  }

  test("property: exactRanks' bucket-prefix rank equals the global sort " +
    "rank on random tied/clustered score distributions") {
    import spark.implicits._
    // stress the monotone-prefix argument where it could break: exact
    // bucket boundaries (k/256 lands ON a grid line), the capped top cell
    // (score = 1.0 folds into bucket 255), and heavy ties (the within-
    // bucket (score, doc_id) tiebreak carries the order)
    val genScore: Gen[Double] = Gen.frequency(
      (3, Gen.oneOf(0.0, 1.0, 0.5, 255.0 / 256.0)),
      (3, Gen.chooseNum(0, 15).map(_ / 16.0)),
      (4, Gen.chooseNum(0, 1 << 20).map(_ / (1 << 20).toDouble)))
    Seq(7L, 11L).foreach { seed =>
      val scores = sample(genScore, 400, seed)
      val d = scores.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "sc")
      val got = TextAnalysis.exactRanks(d, col("sc"), 256, 256.0)
        .select(col("doc_id"), col("rank")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = scores.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
        .sortBy { case (id, s) => (s, id) }
        .zipWithIndex.map { case ((id, _), r) => id -> (r + 1).toLong }
        .toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: paired-group candidate keys equal banded pairs on " +
    "random signature tables with planted Hamming-radius-≤4 near-dups " +
    "(the l146 pigeonhole argument, fuzzed against SigGroups edits)") {
    import graft.llm.Multimodal
    import spark.implicits._
    // Both unguarded generators are recall-LOSSLESS at the tested radii
    // (8-bit banding to Hamming 7 by pigeonhole over 8 bands; paired-
    // group keys to Hamming 4 over the 6 bit-groups), so their verified
    // pair tables must be IDENTICAL — any future edit to the SigGroups
    // layout (an overlap, a gap, a wrong width) breaks the untouched-
    // pair guarantee for SOME planted radius and this catches it, the
    // way the envelope round-trip property hardens the CDC codec.
    val genSig: Gen[Long] = Gen.chooseNum(Long.MinValue, Long.MaxValue)
    (0 until 5).foreach { round =>
      val base = sample(genSig, 30, seed = 100L + round).distinct
      val flips = sample(Gen.chooseNum(0, 63), 200, seed = 200L + round)
      // plant near-dups of the first ten signatures at radii 0..4 —
      // radius i % 5, bit positions drawn from the fuzzed pool
      // (duplicate positions cancel, leaving a smaller radius: also
      // in-contract)
      val planted = base.take(10).zipWithIndex.map { case (h, i) =>
        flips.slice(i * 8, i * 8 + (i % 5)).distinct
          .foldLeft(h)((acc, b) => acc ^ (1L << b))
      }
      val sig = (base ++ planted).zipWithIndex
        .map { case (h, i) => ((i + 1).toLong, h) }
        .toDF("doc_id", "dhash").localCheckpoint()
      Seq(2, 4).foreach { h =>
        val grouped = Multimodal.sigPairsGrouped(sig, h, 1 << 30)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        val banded = Multimodal.imagePairCandidates(sig, h, 1 << 30, 8)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        assert(grouped === banded, s"round=$round radius=$h")
        // the planted radius-≤h copies are actually found (non-vacuous)
        if (h === 4) assert(grouped.nonEmpty, s"round=$round: vacuous")
      }
    }
  }
}
