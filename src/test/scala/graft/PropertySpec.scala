package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, Nested}
import graft.functions.{Similarity, Text}

/** Property-based roundtrip laws (SURVEY.md §5.2 item 4) over generated
  * nested data. ScalaCheck generators are driven directly with fixed seeds
  * (the scalatest-scalacheck bridge isn't in the offline dependency cache),
  * so every run checks the same deterministic sample set.
  */
class PropertySpec extends SparkSpec {

  /** n deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int = 10): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default.withSize(12), Seed(i.toLong)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g).foreach(body)

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    (samples(g1) zip samples(g2)).foreach { case (a, b) => body(a, b) }

  private val genRow: Gen[(Long, Seq[(Int, Double)])] = for {
    id <- Gen.choose(1L, 1000L)
    n <- Gen.choose(0, 6)
    items <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 99), Gen.choose(-50.0, 50.0)))
  } yield (id, items)

  private val genRows: Gen[List[(Long, Seq[(Int, Double)])]] =
    Gen.nonEmptyListOf(genRow)

  test("merge(split(x)) == x for any array<struct> column") {
    val s = spark; import s.implicits._
    forAll(genRows) { rows =>
      val df = rows.toDF("id", "items")
      val soa = Nested.split(df, "items", "_1", "_2")
      val aos = Nested.merge(soa, "items", "_1", "_2")
      val orig = df.select(col("id"), col("items")).collect()
        .map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq)))
      val back = aos.select(col("id"), col("items")).collect()
        .map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq)))
      assert(back.sortBy(_._1).toSeq == orig.sortBy(_._1).toSeq)
    }
  }

  test("filterElements output is a sublist preserving order") {
    val s = spark; import s.implicits._
    forAll(genRows) { rows =>
      val df = rows.toDF("id", "items")
      val f = df.select(col("items"),
        Nested.filterElements(col("items"), x => x.getField("_2") > 0.0).as("pos"))
      f.collect().foreach { r =>
        val all = r.getSeq[org.apache.spark.sql.Row](0).map(_.getDouble(1))
        val kept = r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1))
        assert(kept == all.filter(_ > 0.0))
      }
    }
  }

  test("defineElements preserves element count; index is 0..n-1") {
    val s = spark; import s.implicits._
    forAll(genRows) { rows =>
      val df = rows.toDF("id", "items")
      val d = Nested.index(df, "items", "i")
        .select(size(col("items")).as("n"),
          transform(col("items"), _.getField("i")).as("idxs"))
      d.collect().foreach { r =>
        assert(r.getSeq[Int](1) == (0 until r.getInt(0)))
      }
    }
  }

  test("flatten concatenates in order; length adds up") {
    val s = spark; import s.implicits._
    forAll(genRows, genRows) { (r1, r2) =>
      val a = r1.map(_._2.map(_._2))
      val b = r2.map(_._2.map(_._2))
      val df = Seq((a.flatten, b.flatten)).toDF("x", "y")
      val f = df.select(Nested.flattenList(array(col("x"), col("y"))).as("f")).first()
      assert(f.getSeq[Double](0) == a.flatten ++ b.flatten)
    }
  }

  test("cosine similarity stays in [-1, 1] and is 1 on self") {
    val s = spark; import s.implicits._
    val genVec = Gen.listOfN(8, Gen.choose(-10.0f, 10.0f))
      .suchThat(_.exists(_ != 0.0f))
    forAll(Gen.nonEmptyListOf(genVec)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }.toDF("id", "v")
      val c = df.as("a").join(df.as("b"), col("a.id") <= col("b.id"))
        .select(col("a.id") === col("b.id"), Similarity.cosine(col("a.v"), col("b.v")))
        .collect()
      c.foreach { r =>
        val v = r.getDouble(1)
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
        if (r.getBoolean(0)) assert(math.abs(v - 1.0) < 1e-9)
      }
    }
  }

  test("minhash signature values are in [0, P) and permutation of a superset lowers or keeps each minimum") {
    val s = spark; import s.implicits._
    val genText = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
      .map(_.mkString(" "))
    forAll(genText) { text =>
      val base = Seq((1L, text), (2L, text + " extra words appended here"))
        .toDF("id", "text")
        .select(col("id"), array_distinct(Text.shingleHashes(col("text"), 2)).as("hs"))
        .where(size(col("hs")) > 0)
      val sigs = base.select(col("id"), Dedup.minhashSignature(col("hs"), 16).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      sigs.values.foreach(sig => assert(sig.forall(v => v >= 0 && v < Text.P)))
      // doc 2's shingle set ⊇ doc 1's → each per-permutation min can only go down
      for {
        s1 <- sigs.get(1L); s2 <- sigs.get(2L)
      } (s1 zip s2).foreach { case (m1, m2) => assert(m2 <= m1) }
    }
  }

  test("codegen shingle/simhash kernels match HOF forms on non-ASCII text") {
    val s = spark; import s.implicits._
    val genTok = Gen.oneOf("héllo", "wörld", "日本語", "مرحبا", "ascii", "émoji🙂", "ß")
    forAll(Gen.nonEmptyListOf(genTok)) { toks =>
      val df = Seq(toks.mkString(" ")).toDF("text")
      val sh = df.select(
        Text.shingleHashes(col("text"), 2).as("cg"),
        array_distinct(Text.shingleHashesHof(col("text"), 2)).as("hof"),
        Dedup.simhash64(Text.tokens(col("text"))).as("sim_cg"),
        Dedup.simhash64Hof(Text.tokens(col("text"))).as("sim_hof")).first()
      assert(sh.getSeq[Long](0) == sh.getSeq[Long](1),
        s"shingle hash mismatch on ${toks.mkString(" ")}")
      assert(sh.getLong(2) == sh.getLong(3),
        s"simhash mismatch on ${toks.mkString(" ")}")
    }
  }

  test("denormalize(normalize(x)) == x for any fact table with shared sub-objects") {
    val s = spark; import s.implicits._
    val genFact = Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 10000L)
      lang <- Gen.oneOf("en", "es", "zh", "de")
      src <- Gen.oneOf("web", "book", "wiki")
      x <- Gen.choose(-100, 100)
    } yield (id, lang, src, x))
    forAll(genFact) { rows =>
      val df = rows.toDF("id", "lang", "src", "x")
      val (fact, dim) = graft.operators.Variant.normalize(df, Seq("lang", "src"), "k")
      // dim is the distinct sub-object set
      assert(dim.count() == rows.map(r => (r._2, r._3)).distinct.size)
      val back = graft.operators.Variant.denormalize(fact, dim, "k")
        .select("id", "lang", "src", "x").collect().map(_.toSeq).toSeq
      val orig = df.collect().map(_.toSeq).toSeq
      assert(back.sortBy(_.toString) == orig.sortBy(_.toString))
    }
  }

  test("fingerprint is invariant to row order but sensitive to token order") {
    val s = spark; import s.implicits._
    forAll(Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z", "w"))) { toks =>
      if (toks.distinct.size > 1) {
        val t1 = toks.mkString(" ")
        val t2 = toks.reverse.mkString(" ")
        val fps = Seq((1L, t1), (2L, t2)).toDF("id", "text")
          .select(col("id"), Text.fingerprint(Text.tokens(col("text"))).as("fp"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        if (toks != toks.reverse) {
          // order-sensitivity: reversal changes the fingerprint unless the
          // polynomial happens to collide (hasn't for these alphabets)
          assert(fps(1L) != fps(2L) || t1 == t2)
        }
      }
    }
  }

  private val genKV: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 1000L)))

  test("Ivm.mergeStates is split-invariant: any partition of the rows merges to the same state") {
    val s = spark; import s.implicits._
    def state(xs: Seq[(Long, Long)]) = xs.toDF("k", "v").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
    val specs = Map("n" -> "sum", "sv" -> "sum", "lo" -> "min", "hi" -> "max")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    forAll(genKV, Gen.choose(0, 10)) { (rows, cutRaw) =>
      if (rows.size >= 2) {
        val cut = 1 + cutRaw % (rows.size - 1)
        val merged = graft.operators.Ivm.mergeStates(
          Seq(state(rows.take(cut)), state(rows.drop(cut))), Seq("k"), specs)
        assert(collect(merged) == collect(state(rows)),
          s"split at $cut diverged for $rows")
      }
    }
  }

  test("equiDepthHistogram: bins partition the rows and bounds nest monotonically") {
    val s = spark; import s.implicits._
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 40L)), Gen.oneOf(1, 2, 4, 8)) { (vals, bins) =>
      val got = graft.operators.Scale.equiDepthHistogram(
          vals.toDF("v"), col("v"), bins)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got.map(_._4).sum == vals.size.toLong, s"rows lost: $got vs ${vals.size}")
      got.foreach { case (_, lo, hi, _) => assert(lo <= hi) }
      got.sliding(2).foreach {
        case Seq((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 < lo2, got.toString)
        case _ =>
      }
      assert(got.map(_._1).forall(b => b >= 0 && b < bins))
    }
  }

  test("prefix-filtered jaccard equals brute force on random shingle sets (the pigeonhole law)") {
    val s = spark; import s.implicits._
    // random small-universe sets maximize collision/edge cases (equal
    // sizes, threshold-boundary overlaps, identical sets)
    val genSets: Gen[List[(Long, Set[Long])]] = Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 40L)
      n <- Gen.choose(1, 10)
      hs <- Gen.listOfN(n, Gen.choose(1L, 30L))
    } yield (id, hs.toSet))
    forAll(genSets) { raw =>
      val rows = raw.groupBy(_._1).map { case (id, g) => (id, g.head._2) }.toSeq
      val brute = (for {
        (a, sa) <- rows; (b, sb) <- rows if a < b
        inter = (sa & sb).size
        if inter * 5L >= (sa.size + sb.size - inter) * 4L
      } yield (a, b)).toSet
      val df = rows.map { case (id, hs) => (id, hs.toArray) }.toDF("id", "hs")
      val got = Dedup.prefixJaccardPairsOf(df, tNum = 4, tDen = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"rows=$rows missing=${brute -- got} extra=${got -- brute}")
    }
  }

  test("packGreedy: fills never exceed capacity (except oversized singletons), nothing lost, packs contiguous") {
    val s = spark; import s.implicits._
    val genDocs: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 500L), Gen.choose(1L, 60L)))
    forAll(genDocs, Gen.oneOf(32L, 50L, 100L)) { (raw, cap) =>
      val docs = raw.groupBy(_._1).map { case (id, g) => (id, id % 4, g.head._2) }.toSeq
      val got = graft.operators.Pipeline
        .packGreedy(docs.toDF("id", "shard", "w"), "id", "w", capacity = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.length == docs.size, "rows lost or duplicated")
      got.groupBy(t => (t._2, t._3)).foreach { case ((sh, pk), members) =>
        val fill = members.map(_._4).sum
        assert(fill <= cap || members.length == 1,
          s"overfull multi-doc pack shard=$sh pack=$pk fill=$fill")
      }
      // packs are contiguous in id order within a shard: pack ids are
      // non-decreasing as ids increase
      got.groupBy(_._2).values.foreach { ms =>
        val byId = ms.sortBy(_._1).map(_._3)
        assert(byId.zip(byId.drop(1)).forall { case (p, n) => p <= n }, byId.toString)
      }
    }
  }

  test("CDC chunking: chunks tile every position exactly once (lossless partition)") {
    val s = spark; import s.implicits._
    val genDoc: Gen[(Long, String)] = for {
      id <- Gen.choose(1L, 200L)
      n <- Gen.choose(2, 40)
      toks <- Gen.listOfN(n, Gen.choose(0, 25).map(i => s"w$i"))
    } yield (id, toks.mkString(" "))
    forAll(Gen.nonEmptyListOf(genDoc)) { raw =>
      val docs = raw.groupBy(_._1).map { case (id, g) => (id, g.head._2) }.toSeq
      val got = Dedup.cdcChunkDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
      docs.foreach { case (id, text) =>
        val positions = math.max(0, text.split(" ").length - 1)
        if (positions > 0) {
          val (nChunks, dupTokens) = got(id)
          assert(nChunks >= 1 && dupTokens <= positions,
            s"doc $id: chunks=$nChunks dupTokens=$dupTokens positions=$positions")
        } else assert(!got.contains(id), s"doc $id below window width must be absent")
      }
      // exact duplicate docs must see ALL their positions as duplicated
      docs.groupBy(_._2).values.filter(_.size > 1).foreach { g =>
        g.foreach { case (id, text) =>
          val positions = text.split(" ").length - 1
          assert(got(id)._2 == positions.toLong,
            s"verbatim-duplicate doc $id not fully dup-covered: ${got(id)}")
        }
      }
    }
  }

  test("BPE merges: self-pair runs merge leftmost-greedily; partition-order independent") {
    val s2 = spark; import s2.implicits._
    // "x x x x x": round-1 (x,x) count 4, merges at the 1st and 3rd pair
    // of the run (parity rule), leaving [x x][x x][x];
    // "y z y z": (y,z)=2 wins round 2 after the x-merge drops x-pairs
    val docs = Seq((1L, "x x x x x"), (2L, "y z y z")).toDF("doc_id", "text")
    for (parts <- Seq(1, 3)) {
      val got = graft.operators.Bpe.merges(docs.repartition(parts), "doc_id", "text", k = 2)
        .orderBy("rank").collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(got == Seq((1, "x", "x", 4L), (2, "y", "z", 2L)), s"parts=$parts: $got")
    }
    // after both merges the alive sequences are [x x][x x][x] and [y z][y z]:
    // a third round must pick ("y z","y z") count 1... tie with ("x x","x x")
    // count 1 and ("x x","x") count 1 -- DESC tiebreak picks the greatest
    // (lhs, rhs) = ("y z","y z")
    val got3 = graft.operators.Bpe.merges(docs, "doc_id", "text", k = 3)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got3.last == ((3, "y z", "y z", 1L)), s"round 3: ${got3.last}")
  }

  test("BPE merges: roundPartitions-invariant — identical merge tables at 2 and 16 partitions") {
    // the law the scaladoc promises: the per-round shuffle-partition
    // count is a COST knob only; the (rank, lhs, rhs, cnt) merge table
    // must be bit-identical at any setting (pair counts are exact
    // integers; the (cnt DESC, lhs DESC, rhs DESC) winner rule has no
    // order-dependence to leak through partitioning)
    val s2 = spark; import s2.implicits._
    val docs = Seq(
      (1L, "a b a b a b c d c d"), (2L, "b c b c b c a a a"),
      (3L, "d a d a d a b b"), (4L, "c c c c d d d"),
      (5L, "a b c d a b c d a b"), (6L, "e f e f g g g e f")
    ).toDF("doc_id", "text")
    val runs = Seq(Some(2), Some(16)).map { rp =>
      graft.operators.Bpe.merges(docs, "doc_id", "text", k = 4, roundPartitions = rp)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    assert(runs(0).size == 4, s"expected 4 merge rounds, got ${runs(0)}")
    assert(runs(0) == runs(1),
      s"merge table depends on roundPartitions: 2 -> ${runs(0)}, 16 -> ${runs(1)}")
  }

  test("funnelStageTimes: matches a per-user reference scan on random events (ties included)") {
    // the kernel shared by b94/b99/b102 and the streaming machine: a user
    // reaches stage n at the earliest stage-n event STRICTLY after their
    // stage-(n-1) time. Reference: fix s1..sN sequentially per user (each
    // the min qualifying ts given the previous FINAL value) — the window
    // algebra's definition, computed naively. Random ts in a tiny range
    // force same-timestamp ties across and within stages.
    val s2 = spark; import s2.implicits._
    val stages = Seq("v", "c", "p")
    val gen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 6L),           // user
      Gen.oneOf("v", "c", "p", "x"),// stage types + noise
      Gen.choose(0L, 12L)))         // seconds — dense, tie-heavy
    forAll(gen) { raw =>
      val df = raw.zipWithIndex.map { case ((u, st, sec), i) =>
        (i.toLong, u, st, new java.sql.Timestamp(sec * 1000L))
      }.toDF("event_id", "user_id", "event_type", "ts")
      val got = graft.operators.Series
        .funnelStageTimes(df, "user_id", "event_type", "ts", stages)
        .collect().map(r => r.getLong(0) ->
          (1 to 3).map(i => Option(r.getTimestamp(i)).map(_.getTime))).toMap
      val want = raw.groupBy(_._1).map { case (u, evs) =>
        val byStage = stages.map(st => evs.filter(_._2 == st).map(_._3 * 1000L).sorted)
        val times = byStage.foldLeft(List.empty[Option[Long]]) { (acc, ts) =>
          val prev = acc.lastOption.getOrElse(Some(Long.MinValue))
          acc :+ prev.flatMap(p =>
            ts.find(t => p == Long.MinValue || t > p))
        }
        u -> times.toIndexedSeq
      }
      want.foreach { case (u, times) =>
        assert(got(u) == times, s"user $u: got ${got(u)} want $times in $raw")
      }
    }
  }

  test("weightedPercentiles: matches brute cumulative scan; partition-order independent") {
    val s2 = spark; import s2.implicits._
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 50L), Gen.choose(1L, 9L)))) { raw =>
      val df = raw.toDF("v", "w")
      for (parts <- Seq(1, 5)) {
        val got = graft.operators.Scale.weightedPercentiles(
            df.repartition(parts), col("v"), col("w"), Seq(50, 90))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val tot = raw.map(_._2).sum
        val cum = raw.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
          .scanLeft((0L, 0L)) { case ((_, c), (v, w)) => (v, c + w) }.drop(1)
        for (p <- Seq(50, 90)) {
          val want = cum.find { case (_, cw) => cw * 100 >= p * tot }.get._1
          assert(got(p) == want, s"p$p parts=$parts: got ${got(p)} want $want in $raw")
        }
      }
    }
  }

  test("npy layout: roundtrip is bit-exact and bytes are row-order-independent") {
    val s2 = spark; import s2.implicits._
    // arbitrary float BITS (covers NaN payloads, subnormals, ±0, ±inf)
    // at a fixed dim per sample (the layout is rectangular by contract);
    // ids may repeat — the writer's duplicate-id tiebreak must still
    // produce order-independent bytes AND preserve the id↔vector pairing
    val genVecRows: Gen[(Int, List[(Long, List[Int])])] = for {
      d <- Gen.choose(1, 5)
      rows <- Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(-3L, 3L),
        Gen.listOfN(d, Gen.choose(Int.MinValue, Int.MaxValue))))
    } yield (d, rows)
    forAll(genVecRows) { case (_, bitRows) =>
      val rows = bitRows.map { case (id, bits) =>
        (id, bits.map(java.lang.Float.intBitsToFloat).toArray)
      }
      def layout(ordered: Seq[(Long, Array[Float])], tag: String) = {
        val dir = tempDir(s"graft-npy-prop-$tag").toString
        graft.sources.Npy.writeVectors(
          ordered.toDF("id", "v").coalesce(1), "id", "v", dir)
        val bytes = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".npy")).sortBy(_.getName)
          .map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSeq
        val back = graft.sources.Npy.readVectors(s2, dir)
          .as[(Long, Array[Float])].collect()
          .map { case (id, v) => (id, v.map(java.lang.Float.floatToRawIntBits).toSeq) }
        (bytes, back)
      }
      val (bytesA, backA) = layout(rows, "a")
      val (bytesB, backB) = layout(new scala.util.Random(42).shuffle(rows), "b")
      assert(bytesA == bytesB, "layout bytes depend on row order")
      // pairing intact: the multiset of (id, vector-bits) survives exactly
      def canon(xs: Seq[(Long, Seq[Int])]) =
        xs.map { case (id, bits) => (id, bits.mkString(",")) }.sorted
      assert(canon(backA.toSeq) == canon(bitRows),
        "roundtrip lost or mispaired a row")
      assert(backB.toSeq == backA.toSeq)
    }
  }

  test("contiguousIds: a permutation of 0..n-1 in key order, at any bucket width") {
    val s2 = spark; import s2.implicits._
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 10000L)).map(_.distinct)) { keys =>
      for (bw <- Seq(1L, 7L, 1024L)) {
        val got = graft.operators.Scale.contiguousIds(keys.toDF("k"), "k", bw)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = keys.sorted.zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap
        assert(got == want, s"bw=$bw: $got != $want")
      }
    }
  }
}
