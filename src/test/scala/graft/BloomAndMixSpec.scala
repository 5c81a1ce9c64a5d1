package graft

import org.apache.spark.sql.functions._
import graft.functions.Bloom
import graft.operators.{Dedup, Pipeline}
import graft.plans.BloomExpressions
import graft.sources.Tables

/** r4 additions: Bloom decontamination kernel + target-mix rebalancing.
  * The Bloom tests pin the load-bearing invariant (no false negatives,
  * build/probe index-math agreement across the interpreted and codegen
  * paths); targetMix is checked against an independent JVM
  * re-implementation of the water-filling formula, exact to the row. */
class BloomAndMixSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // deterministic pseudo-random 64-bit values (splitmix64 finalizer)
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("bloom has no false negatives and a sane false-positive rate (codegen path)") {
    import spark.implicits._
    val members = (1L to 1000L).map(mix)
    val bits = members.toDF("h")
      .agg(Bloom.build(col("h"), mBits = 1 << 16, k = 5))
      .head.getSeq[Long](0).toArray
    // probe through a DataFrame select so the generated code runs
    val probeMembers = members.toDF("h")
      .select(BloomExpressions.mightContain(typedlit(bits), col("h"), k = 5).as("hit"))
      .collect().map(_.getBoolean(0))
    assert(probeMembers.forall(identity), "bloom returned a false negative")

    val memberSet = members.toSet
    val nonMembers = (100001L to 120000L).map(mix).filterNot(memberSet)
    val fpCount = nonMembers.toDF("h")
      .select(BloomExpressions.mightContain(typedlit(bits), col("h"), k = 5).as("hit"))
      .collect().count(_.getBoolean(0))
    // m/n = 65 bits/key, k=5 → theoretical fpr ≈ 2e-6; 1% is far outside
    // anything but broken index math
    assert(fpCount < nonMembers.size * 0.01,
      s"false-positive rate ${fpCount.toDouble / nonMembers.size} is way above the m/n=65 expectation")
  }

  test("interpreted probe agrees with generated code on every input") {
    import spark.implicits._
    val members = (1L to 200L).map(mix)
    val bits = members.toDF("h")
      .agg(Bloom.build(col("h"), mBits = 1 << 12, k = 7)).head.getSeq[Long](0).toArray
    val probes = (members ++ (5000L to 5200L).map(mix)).toDF("h")
    val viaCodegen = probes
      .select(col("h"), BloomExpressions.mightContain(typedlit(bits), col("h"), 7).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // interpreted: evaluate the same expression without codegen via eval
    val expr = BloomExpressions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        bits, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false), 7)
    viaCodegen.foreach { case (h, hit) =>
      val row = org.apache.spark.sql.catalyst.InternalRow(h)
      assert(expr.eval(row) == hit, s"interpreted/codegen disagree on $h")
    }
  }

  test("bloom-prefiltered contamination equals the plain exact semi-join") {
    val sets = Dedup.shingleSets(Tables.t(spark, sf, "documents"), "doc_id", "text", shingleN = 5)
    val isEval = pmod(col("id"), lit(10)) === 7
    val got = Pipeline.bloomContaminated(sets, isEval)
      .collect().map(_.getLong(0)).toSet
    // reference: same semi-join with no bloom anywhere
    val ev = sets.where(isEval).select(explode(col("hs")).as("g")).distinct()
    val expected = sets.where(!isEval)
      .select(col("id"), explode(col("hs")).as("g"))
      .join(ev, Seq("g"), "left_semi")
      .select(col("id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"bloom path diverged: extra=${got -- expected}, missing=${expected -- got}")
    assert(got.nonEmpty, "fixture produced no contaminated docs — test is vacuous")
  }

  test("targetMix matches an independent reimplementation row-for-row") {
    val targets = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.1, "zh" -> 0.1)
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val got = Pipeline.targetMix(docs, "lang", "doc_id", "n_chars", targets)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    // reference: same formula, independently in plain Scala on collected rows
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w = rows.groupBy(_._2).map { case (l, rs) => l -> rs.map(_._3).sum }
    val minCap = targets.map { case (l, t) => w(l).toDouble / t }.min
    val ppm = targets.map { case (l, t) =>
      l -> math.floor(t * minCap / w(l).toDouble * 1000000.0).toLong
    }
    def md5Bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val expected = rows.filter { case (id, l, _) =>
      ppm.get(l).exists(p => md5Bucket(id) < p)
    }.map(_._1).toSet
    assert(got == expected,
      s"targetMix diverged: extra=${got -- expected}, missing=${expected -- got}")
    // binding stratum (min cap) must keep essentially everything: its exact
    // rate is 1.0 by construction; the ppm floor may shave at most 1 ppm
    val binding = targets.minBy { case (l, t) => w(l).toDouble / t }._1
    assert(ppm(binding) >= 999999L, s"binding stratum $binding got ppm ${ppm(binding)}")
  }

  test("temperatureMix matches the closed-form sqrt rates row-for-row") {
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val got = Pipeline.temperatureMix(docs, "lang", "doc_id", "n_chars")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    // reference: rate_c = sqrt(w_min)/sqrt(w_c), independently in plain
    // Scala on collected rows (same IEEE op order as the operator)
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w = rows.groupBy(_._2).map { case (l, rs) => l -> rs.map(_._3).sum }
    val wmin = w.values.min
    val ppm = w.map { case (l, wl) =>
      l -> math.floor(math.sqrt(wmin.toDouble) / math.sqrt(wl.toDouble) * 1000000.0).toLong
    }
    def md5Bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val expected = rows.filter { case (id, l, _) => md5Bucket(id) < ppm(l) }
      .map(_._1).toSet
    assert(got == expected,
      s"temperatureMix diverged: extra=${got -- expected}, missing=${expected -- got}")
    // the smallest stratum is the binding one and keeps everything
    val smallest = w.minBy(_._2)._1
    assert(ppm(smallest) == 1000000L, s"smallest stratum $smallest got ppm ${ppm(smallest)}")
    // kept mass ∝ sqrt(w): for every pair, kept ratios track sqrt ratios
    // within the 1-ppm floor slack
    val kept = rows.filter(r => expected(r._1)).groupBy(_._2)
      .map { case (l, rs) => l -> rs.map(_._3).sum }
    w.keys.foreach { l =>
      val expectedMass = math.sqrt(wmin.toDouble * w(l).toDouble)
      assert(math.abs(kept(l) - expectedMass) <= 0.15 * expectedMass,
        s"stratum $l kept ${kept(l)}, temperature law predicts ~$expectedMass")
    }
  }

  test("keepBest survivor is the (weight desc, id asc) argmax of each canonical group") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "Hello, world!", 13L), (2L, "hello world", 11L), (3L, "HELLO  world.", 14L),
      (4L, "goodbye world", 13L), (5L, "hello world", 11L)).toDF("doc_id", "text", "n_chars")
    val got = Dedup.keepBest(df, "doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // group {1,2,3,5} canonicalizes together: survivor = doc 3 (longest);
    // doc 4 stands alone
    assert(got == Set((3L, 14L, 4L), (4L, 13L, 1L)), got.toString)
  }

  test("hardNegatives returns only different-label items, ranked by cosine") {
    val emb = Tables.t(spark, sf, "embeddings")
    val got = graft.operators.Ann.hardNegatives(
      emb, emb.where(col("vec_id") < 3), "vec_id", "embedding", "label", k = 5)
      .collect()
    assert(got.nonEmpty, "no negatives mined — vacuous fixture?")
    val qLabels = emb.where(col("vec_id") < 3)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { r =>
      assert(r.getInt(2) != qLabels(r.getLong(0)),
        s"same-label item leaked into negatives: $r")
    }
    // per query: ranks are 1..k and cosine is non-increasing in rank
    got.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.length),
        s"ranks not contiguous for query $q")
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"cosine not non-increasing for query $q")
    }
  }

  test("randomNegatives: different-label only, contiguous ranks, layout-invariant") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.where(col("vec_id") < 3)
    val got = graft.operators.Ann.randomNegatives(emb, queries, "vec_id", "label", k = 5)
      .orderBy("query_id", "rank").collect()
    assert(got.length == 15, s"expected 3 queries x 5 negatives, got ${got.length}")
    val qLabels = queries.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { r =>
      assert(r.getInt(2) != qLabels(r.getLong(0)),
        s"same-label item leaked into negatives: $r")
    }
    got.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to 5), s"ranks for query $q")
    }
    // hash-ranked selection is a pure function of ids — identical at any layout
    val again = graft.operators.Ann.randomNegatives(
        Tables.t(spark, sf, "embeddings").repartition(11), queries, "vec_id", "label", k = 5)
      .orderBy("query_id", "rank").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "negative sample must not depend on partitioning")
  }

  test("bootstrapStats: Poisson(1) draws concentrate around n and are layout-invariant") {
    val s = spark; import s.implicits._
    val n = 2500
    val df = (0 until n).map(i => (i.toLong, 100L + i % 50)).toDF("doc_id", "n_chars")
    val rows = Pipeline.bootstrapStats(df, "doc_id", "n_chars", replicates = 8)
      .orderBy("replicate").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val drawn = r.getAs[Long]("drawn")
      // Poisson(n) total: mean n, sd sqrt(n)=50; 6 sigma = 300
      assert(math.abs(drawn - n) < 300, s"replicate ${r.get(0)}: drawn=$drawn")
      // weighted mean must land inside the value range
      val mm = r.getAs[Long]("mean_milli")
      assert(mm >= 100000L && mm <= 150000L, s"mean_milli=$mm")
    }
    // determinism: identical output at a different input layout
    val again = Pipeline.bootstrapStats(df.repartition(7), "doc_id", "n_chars", replicates = 8)
      .orderBy("replicate").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "bootstrap stats must not depend on partitioning")
  }

  test("epochAllocation matches an exact-rational water-filling reference") {
    // independent JVM re-implementation with BigInt rationals (the
    // targetMix testing pattern): iterate exact water-filling to a
    // fixpoint, then compare the operator's integer allocations row-exact
    val s = spark; import s.implicits._
    val docs = (0L until 400L).map { i =>
      val src = "s" + (i % 13)
      // skewed token masses so several sources cap out
      (i, src, 50L + (i % 13) * (i % 13) * 40L + (i % 7) * 3L)
    }.toDF("doc_id", "source", "n_chars")
    val maxE = 3; val bn = 2L; val bd = 1L
    val got = Pipeline.epochAllocation(docs, "source", "n_chars",
        maxEpochs = maxE, budgetNum = bn, budgetDen = bd)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap

    // reference: exact rationals, iterate "cap the over-full, re-level"
    val strata = (0L until 400L).map(i => ("s" + (i % 13),
      50L + (i % 13) * (i % 13) * 40L + (i % 7) * 3L))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum, v.size.toLong) }.toSeq
    val totTokens = strata.map(_._2).sum
    val t = BigInt(totTokens) * bn / bd // budgetDen = 1 ⇒ exact
    var capped = Set.empty[String]
    var done = false
    var lamNum = BigInt(0); var lamDen = BigInt(1)
    while (!done) {
      val cappedMass = strata.filter(s3 => capped(s3._1)).map(s3 => BigInt(s3._2) * maxE).sum
      val freeW = strata.filterNot(s3 => capped(s3._1)).map(s3 => BigInt(s3._3)).sum
      lamNum = t - cappedMass; lamDen = freeW
      val newlyCapped = strata.filterNot(s3 => capped(s3._1))
        .filter(s3 => BigInt(s3._2) * maxE * lamDen <= lamNum * s3._3)
        .map(_._1)
      if (newlyCapped.isEmpty) done = true else capped ++= newlyCapped
    }
    strata.foreach { case (src, tokens, w) =>
      val (gTokens, gDocs, gCap, gAlloc, gCapped) = got(src)
      assert(gTokens == tokens && gDocs == w && gCap == tokens * maxE, s"$src meta")
      val want =
        if (capped(src)) BigInt(tokens) * maxE
        else lamNum * w / lamDen // floor division, both non-negative
      assert(gCapped == capped(src), s"$src capped flag: got $gCapped")
      assert(BigInt(gAlloc) == want, s"$src alloc: got $gAlloc want $want")
    }
    // conservation: floors lose < 1 token per uncapped source
    val totalAlloc = got.values.map(_._4).sum
    val nUncapped = strata.count(s3 => !capped(s3._1))
    assert(BigInt(totalAlloc) <= t && t - BigInt(totalAlloc) < nUncapped.max(1),
      s"budget conservation: alloc=$totalAlloc T=$t")
  }

  test("epochAllocation degenerate splits: all-tied sources (k=0) and all-capped (k=n)") {
    val s = spark; import s.implicits._
    // 5 identical sources: every ratio ties. With budget 2x < cap 4x,
    // NO source caps (the empty-valid-set k=0 path: λ = T/W < r for all);
    // each gets exactly T/5
    val uniform = (0L until 100L).map(i => (i, "u" + (i % 5), 200L))
      .toDF("doc_id", "source", "n_chars")
    val a = Pipeline.epochAllocation(uniform, "source", "n_chars",
        maxEpochs = 4, budgetNum = 2L, budgetDen = 1L)
      .collect().map(r => (r.getString(0), r.getLong(4), r.getBoolean(5))).toSeq
    assert(a.forall(!_._3), s"no source may cap in the tied-uniform case: $a")
    assert(a.forall(_._2 == 100 * 200L * 2 / 5), s"equal shares expected: $a")
    // budget 10x > cap 4x: EVERY source caps (the k=n path, T ≥ Σcap)
    val b = Pipeline.epochAllocation(uniform, "source", "n_chars",
        maxEpochs = 4, budgetNum = 10L, budgetDen = 1L)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(b.forall(_._4), s"all sources must cap when T >= total capacity: $b")
    assert(b.forall(r => r._2 == r._3), s"capped alloc must equal cap: $b")
  }
}
