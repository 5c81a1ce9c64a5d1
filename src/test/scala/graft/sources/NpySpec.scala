package graft.sources

import graft.SparkSpec

/** The npy backend's two correctness contracts: (1) the READER parses
  * genuine `numpy.save` output bit-exactly (the checked-in
  * src/test/resources/npy fixtures were written by CPython numpy — this
  * is the cross-engine compatibility evidence behind the scaladoc's
  * "loadable by numpy.load" claim, exercised in the reader direction);
  * (2) the Spark write→read roundtrip preserves float32 BITS, including
  * the awkward values (−0.0, NaN, min-subnormal, near-max) that would
  * die in any text format. */
class NpySpec extends SparkSpec {

  test("npy reader parses genuine numpy.save output bit-exactly") {
    val (d1, s1, ids) = Npy.readNpy("src/test/resources/npy/fixture.ids.npy")
    assert(d1 == "<i8" && s1.toSeq == Seq(3))
    val idVals = (0 until 3).map(i => ids.getLong(ids.position() + i * 8))
    assert(idVals == Seq(11L, -22L, 3000000000L))
    val (d2, s2, vec) = Npy.readNpy("src/test/resources/npy/fixture.vec.npy")
    assert(d2 == "<f4" && s2.toSeq == Seq(3, 3))
    val got = (0 until 9).map(i => vec.getFloat(vec.position() + i * 4))
    assert(got.take(3) == Seq(1.5f, -2.25f, 3.125f))
    assert(java.lang.Float.floatToRawIntBits(got(3)) ==
      java.lang.Float.floatToRawIntBits(0.1f))
    assert(java.lang.Float.floatToRawIntBits(got(6)) ==
      java.lang.Float.floatToRawIntBits(-0.0f), "-0.0 must keep its sign bit")
    assert(got(7).isPosInfinity)
    assert(java.lang.Float.floatToRawIntBits(got(8)) ==
      java.lang.Float.floatToRawIntBits(1e-7f))
  }

  test("npy Spark write/read roundtrip is bit-exact incl. awkward floats") {
    val s = spark; import s.implicits._
    val dir = tempDir("graft-npy").toString
    val rows = Seq(
      (1L, Array(0.1f, -0.0f, java.lang.Float.MIN_VALUE, 3.4e38f)),
      (2L, Array(1.5f, 2.5f, -2.5f, Float.NaN)),
      (7L, Array(0f, 0f, 0f, 0f)))
    Npy.writeVectors(rows.toDF("id", "v").repartition(2), "id", "v", dir)
    assert(new java.io.File(dir, "_SUCCESS").exists(), "layout marker missing")
    val back = Npy.readVectors(s, dir).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    assert(back.map(_._1).toSeq == Seq(1L, 2L, 7L))
    back.zip(rows.sortBy(_._1)).foreach { case ((_, got), (_, exp)) =>
      assert(got.length == exp.length)
      got.zip(exp).foreach { case (g, e) =>
        assert(java.lang.Float.floatToRawIntBits(g) ==
          java.lang.Float.floatToRawIntBits(e),
          s"bit drift: $g vs $e") }
    }
  }

  test("npz: parses a genuine numpy.savez archive and roundtrips its own writes") {
    // the fixture was written by CPython numpy.savez (ids <i8, vec <f4)
    val fx = Npy.readNpz("src/test/resources/npy/fixture.npz")
    assert(fx.keySet == Set("ids", "vec"))
    val (d1, s1, ids) = fx("ids")
    assert(d1 == "<i8" && s1.toSeq == Seq(3))
    assert((0 until 3).map(i => ids.getLong(ids.position() + i * 8)) == Seq(5L, 6L, 7L))
    val (d2, s2, vec) = fx("vec")
    assert(d2 == "<f4" && s2.toSeq == Seq(3, 2))
    assert(java.lang.Float.floatToRawIntBits(
      vec.getFloat(vec.position() + 5 * 4)) ==
      java.lang.Float.floatToRawIntBits(1e-7f))
    // write our own npz from the parsed values and read it back bit-exactly
    val dir = tempDir("graft-npz")
    val p = dir.resolve("out.npz").toString
    Npy.writeNpz(p, Seq(
      "ids" -> Npy.npyBytesI64(Array(5L, 6L, 7L)),
      "vec" -> Npy.npyBytesF32(Array(
        Array(1.0f, 2.0f), Array(3.5f, -4.5f), Array(0.25f, 1e-7f)))))
    val back = Npy.readNpz(p)
    assert(back.keySet == Set("ids", "vec"))
    val (_, bs, bv) = back("vec")
    assert(bs.toSeq == Seq(3, 2))
    (0 until 6).foreach { i =>
      assert(java.lang.Float.floatToRawIntBits(bv.getFloat(bv.position() + i * 4)) ==
        java.lang.Float.floatToRawIntBits(vec.getFloat(vec.position() + i * 4)),
        s"element $i drifted")
    }
    // strongest compatibility evidence: our npy FRAMING is byte-identical
    // to CPython numpy's own writer for the same values (same dict text,
    // same 64-byte alignment, same raw LE payload) — compare against the
    // savez fixture's raw entries
    val zf = new java.util.zip.ZipFile("src/test/resources/npy/fixture.npz")
    try {
      def entryBytes(n: String): Array[Byte] = {
        val in = zf.getInputStream(zf.getEntry(n))
        try in.readAllBytes() finally in.close()
      }
      assert(Npy.npyBytesI64(Array(5L, 6L, 7L)).toSeq == entryBytes("ids.npy").toSeq,
        "ids framing diverged from numpy's writer")
      assert(Npy.npyBytesF32(Array(
        Array(1.0f, 2.0f), Array(3.5f, -4.5f), Array(0.25f, 1e-7f))).toSeq ==
        entryBytes("vec.npy").toSeq,
        "vec framing diverged from numpy's writer")
    } finally zf.close()
  }

  test("npy reader rejects foreign shapes loudly, never misreads") {
    val dir = tempDir("graft-npy-bad")
    val bad = dir.resolve("x.npy")
    java.nio.file.Files.write(bad, "not an npy file at all".getBytes("UTF-8"))
    intercept[IllegalArgumentException](Npy.readNpy(bad.toString))
    // truncated BODY (valid header, short data): rejected by name at
    // parse time, never a bare IndexOutOfBounds in a later read task
    val full = Npy.npyBytesI64(Array(1L, 2L, 3L))
    val cut = dir.resolve("cut.npy")
    java.nio.file.Files.write(cut, full.dropRight(9))
    val e = intercept[IllegalArgumentException](Npy.readNpy(cut.toString))
    assert(e.getMessage.contains("truncated npy body"), e.getMessage)
  }

  test("readVectors requires _SUCCESS and bounds per-task buffering by name") {
    val s = spark; import s.implicits._
    val dir = tempDir("graft-npy-guards").toString
    val rows = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
    Npy.writeVectors(rows.toDF("id", "v").repartition(1), "id", "v", dir)
    // the commit protocol leaves no task-attempt temp files behind
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"uncommitted temp files: ${leftovers.toSeq}")
    // a part over the per-task read bound is rejected BY NAME at listing
    // time (each read task buffers one whole pair — readAllBytes), before
    // any task launches; same contract on the ids-only path
    val e1 = intercept[IllegalArgumentException](
      Npy.readVectors(s, dir, maxPartBytes = 64).collect())
    assert(e1.getMessage.contains("per-task read bound") &&
      e1.getMessage.contains("part-00000"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Npy.readIds(s, dir, maxPartBytes = 16).collect())
    assert(e2.getMessage.contains("per-task read bound"), e2.getMessage)
    // a layout whose writer never closed it (no _SUCCESS — crashed app)
    // is not silently readable, even though its part pairs parse fine
    assert(new java.io.File(dir, "_SUCCESS").delete())
    val e3 = intercept[IllegalArgumentException](Npy.readVectors(s, dir).collect())
    assert(e3.getMessage.contains("_SUCCESS"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](Npy.readIds(s, dir).collect())
    assert(e4.getMessage.contains("_SUCCESS"), e4.getMessage)
  }

  test("readIds projects the id column reading only the .ids.npy files") {
    val s = spark; import s.implicits._
    val dir = tempDir("graft-npy-ids").toString
    val rows = Seq((5L, Array(1.0f)), (6L, Array(2.0f)), (7L, Array(3.0f)))
    Npy.writeVectors(rows.toDF("id", "v").repartition(2), "id", "v", dir)
    // corrupt every vec payload: the ids-only path must never open them
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".vec.npy"))
      .foreach { f =>
        java.nio.file.Files.write(f.toPath, "garbage".getBytes("US-ASCII"))
      }
    val ids = Npy.readIds(s, dir).as[Long].collect().sorted.toSeq
    assert(ids == Seq(5L, 6L, 7L))
  }

  test("writeVectors overwrites: a rewrite leaves no stale parts behind") {
    val s = spark; import s.implicits._
    val dir = tempDir("graft-npy-rewrite").toString
    Npy.writeVectors(Seq((1L, Array(1f)), (2L, Array(2f)), (3L, Array(3f)))
      .toDF("id", "v").repartition(3), "id", "v", dir)
    // >= 2, not == 3: round-robin repartition may co-locate two rows
    // (seed accident, not a contract); the property under test only
    // needs MORE pairs than the rewrite leaves
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".ids.npy")) >= 2)
    // rewrite with fewer partitions: without the marker-first cleanup the
    // old high-numbered pairs would silently merge into every later read
    Npy.writeVectors(Seq((9L, Array(9f))).toDF("id", "v").repartition(1),
      "id", "v", dir)
    val back = Npy.readVectors(s, dir).as[(Long, Array[Float])].collect()
    assert(back.map(_._1).toSeq == Seq(9L), s"stale rows survived: ${back.toSeq}")
  }

  test("part content is a pure function of partition membership, not row order") {
    // the speculation-safety argument: two attempts of one partition may
    // iterate rows in different orders (e.g. after a shuffle); the writer
    // sorts by (id, vector bits) so both attempts produce byte-identical
    // files and interleaved pair commits cannot mispair a row
    val s = spark; import s.implicits._
    val rows = Seq((3L, Array(3f, 30f)), (1L, Array(1f, 10f)),
      (1L, Array(0.5f, 5f)), (2L, Array(2f, 20f)))
    def layoutBytes(ordered: Seq[(Long, Array[Float])], tag: String): Seq[Seq[Byte]] = {
      val dir = tempDir(s"graft-npy-det-$tag").toString
      Npy.writeVectors(ordered.toDF("id", "v").coalesce(1), "id", "v", dir)
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".npy"))
        .sortBy(_.getName)
        .map(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq).toSeq
    }
    val a = layoutBytes(rows, "fwd")
    val b = layoutBytes(rows.reverse, "rev")
    assert(a == b, "same membership, different bytes — attempt-order leaked into the layout")
  }

  test("readNpz rejects duplicate entry names after suffix normalization") {
    val dir = tempDir("graft-npz-dup")
    val p = dir.resolve("dup.npz").toString
    // "a.npy" and "a" collide after .npy-suffix stripping: last-entry-wins
    // via toMap would silently drop an array (ZipOutputStream itself
    // rejects LITERAL duplicate names, so the normalization collision is
    // the constructible foreign-archive case)
    val out = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(p))
    try {
      Seq("a.npy", "a").foreach { n =>
        out.putNextEntry(new java.util.zip.ZipEntry(n))
        out.write(Npy.npyBytesI64(Array(1L)))
        out.closeEntry()
      }
    } finally out.close()
    val e = intercept[IllegalArgumentException](Npy.readNpz(p))
    assert(e.getMessage.contains("duplicate npz entry"), e.getMessage)
  }

  test("headerBytes fails loudly on v1.0 u16 header-length overflow") {
    // unreachable for this writer's dicts; a future large-shape caller
    // must fail at write time, not produce a corrupt header
    val e = intercept[IllegalArgumentException](
      Npy.headerBytes("<i8", "(" + ("1," * 40000) + ")"))
    assert(e.getMessage.contains("header overflow"), e.getMessage)
  }

  test("npy writer rejects null vector ELEMENTS by name, never fabricates 0.0") {
    val s = spark
    import org.apache.spark.sql.functions._
    val dir = tempDir("graft-npy-nullelem").toString
    // array(1.0, NULL, 2.0): a whole-null guard alone would let getSeq
    // unbox the null element to 0.0f and write fabricated data
    val df = s.range(1).select(col("id"),
      array(lit(1.0f), lit(null).cast("float"), lit(2.0f)).as("v"))
    val err = intercept[org.apache.spark.SparkException] {
      Npy.writeVectors(df, "id", "v", dir)
    }
    val root = org.apache.commons.lang3.exception.ExceptionUtils.getRootCause(err)
    assert(String.valueOf(root.getMessage).contains("null vector element"),
      s"wrong failure: $root")
  }

  test("readVectorsSlice equals the full read's slice, bit-exactly, across parts") {
    val s = spark; import s.implicits._
    val dir = tempDir("graft-npy-slice").toString
    // awkward floats INSIDE and OUTSIDE the slice window, multi-part
    val rows = Seq(
      (1L, Array(0.1f, -0.0f, java.lang.Float.MIN_VALUE, 3.4e38f, 9f)),
      (2L, Array(1.5f, Float.NaN, -2.5f, 0f, 8f)),
      (7L, Array(0f, 7f, -7f, 2.25f, Float.NaN)))
    Npy.writeVectors(rows.toDF("id", "v").repartition(2), "id", "v", dir)
    val full = Npy.readVectors(s, dir).as[(Long, Array[Float])]
      .collect().map { case (id, v) => id -> v.slice(1, 4) }.toMap
    val sliced = Npy.readVectorsSlice(s, dir, 1, 4).as[(Long, Array[Float])]
      .collect()
    assert(sliced.map(_._1).sorted.toSeq == Seq(1L, 2L, 7L))
    sliced.foreach { case (id, got) =>
      val exp = full(id)
      assert(got.length == 3, s"id=$id width ${got.length}")
      got.zip(exp).foreach { case (g, e) =>
        assert(java.lang.Float.floatToRawIntBits(g) ==
          java.lang.Float.floatToRawIntBits(e),
          s"id=$id bit drift: $g vs $e") }
    }
  }

  test("readVectorsSlice streams in bounded windows — block boundaries don't split rows") {
    // force the MULTI-block path: windowBytes=24 over d=2 rows (8 B each)
    // gives 3 rows per block and a 1-row tail at n=1000 (3·333+1), so any
    // off-by-one in the block loop's position/limit arithmetic corrupts
    // values or drops the tail; the default-window single-block path is
    // covered by the slice-equality test above
    val s = spark; import s.implicits._
    val dir = tempDir("graft-npy-slice-many").toString
    val rows = (0L until 1000L).map(i => (i, Array(i.toFloat, (i * 2).toFloat)))
    Npy.writeVectors(rows.toDF("id", "v").repartition(1), "id", "v", dir)
    val got = Npy.readVectorsSlice(s, dir, 1, 2, windowBytes = 24L)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(got.length == 1000)
    got.foreach { case (id, v) =>
      assert(v.toSeq == Seq((id * 2).toFloat), s"id=$id got ${v.toSeq}") }
  }

  test("readVectorsSlice rejects out-of-range slices and truncated bodies by name") {
    val s = spark; import s.implicits._
    val dir = tempDir("graft-npy-slice-bad").toString
    Npy.writeVectors(Seq((1L, Array(1f, 2f, 3f))).toDF("id", "v")
      .repartition(1), "id", "v", dir)
    val e1 = intercept[IllegalArgumentException](
      Npy.readVectorsSlice(s, dir, 0, 4))
    assert(e1.getMessage.contains("out of range"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Npy.readVectorsSlice(s, dir, 2, 2))
    assert(e2.getMessage.contains("bad dimension slice"), e2.getMessage)
    // truncate the vec body below n*rowBytes: the slice path must fail
    // at its up-front size check, not EOF mid-loop
    val vec = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".vec.npy")).get
    val bytes = java.nio.file.Files.readAllBytes(vec.toPath)
    java.nio.file.Files.write(vec.toPath, bytes.dropRight(4))
    val err = intercept[org.apache.spark.SparkException] {
      Npy.readVectorsSlice(s, dir, 0, 2).count()
    }
    val root = org.apache.commons.lang3.exception.ExceptionUtils.getRootCause(err)
    assert(String.valueOf(root.getMessage).contains("truncated npy body"),
      s"wrong failure: $root")
  }

  test("readVectorsSlice requires _SUCCESS like every other reader") {
    val s = spark; import s.implicits._
    val dir = tempDir("graft-npy-slice-nomark").toString
    Npy.writeVectors(Seq((1L, Array(1f, 2f))).toDF("id", "v")
      .repartition(1), "id", "v", dir)
    assert(new java.io.File(dir, "_SUCCESS").delete())
    val e = intercept[IllegalArgumentException](
      Npy.readVectorsSlice(s, dir, 0, 1))
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
  }
}
