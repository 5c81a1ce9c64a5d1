package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal NumPy `.npy` v1.0 column files as a Spark source + sink — the
  * pluggable-backend role of the reference's numpy file backend (oamap
  * `backend/numpyfile.py` (R) — mount empty, public-module citation):
  * arrays at rest as raw little-endian buffers behind a self-describing
  * ASCII header, loadable by `numpy.load` verbatim (validated against
  * CPython numpy during development; the format subset is v1.0,
  * C-contiguous, `<i8` / `<f4`).
  *
  * Layout: one PAIR of files per Spark partition —
  * `part-NNNNN.ids.npy` (int64, shape (n,)) and `part-NNNNN.vec.npy`
  * (float32, shape (n, d)) — the columnar one-array-per-file posture of
  * the reference backend. Write is parallel per-partition
  * (foreachPartition, no driver funnel; a `_SUCCESS` marker closes the
  * layout for [[Formats.ensureWritten]]); read lists the pairs (the
  * standard datasource listing step) and parallelizes one task per pair.
  *
  * Scale notes: each writer task buffers its partition's rows once
  * (n × (8 + 4·d) bytes — the npy header needs the shape up front; size
  * partitions via `spark.sql.files.maxPartitionBytes` as usual). Like
  * [[Formats.sinkRoot]], the directory must be a filesystem shared by all
  * executors on a real cluster — per-node /tmp only works on local[*].
  * Float32 payloads roundtrip BIT-EXACTLY (raw IEEE bits, no text
  * conversion), which is what the b129 oracle key gates end-to-end.
  */
object Npy {

  private val Magic = Array(0x93.toByte, 'N'.toByte, 'U'.toByte,
    'M'.toByte, 'P'.toByte, 'Y'.toByte)

  /** v1.0 header: magic + version + little-endian u16 header length +
    * python-dict line space-padded so the data section starts 64-aligned
    * (the alignment numpy itself writes). */
  private[sources] def headerBytes(descr: String, shape: String): Array[Byte] = {
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shape, }"
    val pre = Magic.length + 2 + 2
    val pad = (64 - (pre + dict.length + 1) % 64) % 64
    val full = dict + (" " * pad) + "\n"
    // a v1.0 header length is an unsigned 16-bit field; unreachable for
    // the dicts this writer emits today, but a future large-shape caller
    // must fail HERE, at write time, not produce a silently corrupt file
    require(full.length <= 0xFFFF,
      s"npy v1.0 header overflow: ${full.length} bytes > 65535 (dict: ${dict.take(80)}…)")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    out.write(1); out.write(0)
    out.write(full.length & 0xff); out.write((full.length >> 8) & 0xff)
    out.write(full.getBytes("US-ASCII"))
    out.toByteArray
  }

  private def writeFile(path: String, header: Array[Byte],
                        body: java.nio.ByteBuffer): Unit = {
    val ch = new java.io.FileOutputStream(path).getChannel
    try {
      // drain loops: FileChannel.write may write fewer bytes than
      // remaining (interrupt, disk-full boundary) — a discarded short
      // write would leave a truncated file with a VALID header, failing
      // much later in an unrelated read job
      val h = java.nio.ByteBuffer.wrap(header)
      while (h.hasRemaining) ch.write(h)
      body.flip()
      while (body.hasRemaining) ch.write(body)
    } finally ch.close()
  }

  /** Task-side commit protocol: write to a task-attempt-suffixed temp
    * name, then rename atomically into the final path. Two speculative
    * attempts of the same partition each write their OWN temp file and
    * race only on the rename — the final file is always one complete
    * attempt's bytes, never an interleaving (the failure mode of writing
    * final paths directly under spark.speculation=true). Same-directory
    * rename, so ATOMIC_MOVE holds on any POSIX filesystem; the temp file
    * is removed on any failure path. */
  private def commitFile(dir: String, finalName: String, attempt: Long,
                         header: Array[Byte], body: java.nio.ByteBuffer): Unit = {
    val tmp = new java.io.File(dir, s".$finalName.$attempt.tmp")
    var committed = false
    try {
      writeFile(tmp.getPath, header, body)
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(dir, finalName).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      committed = true
    } finally if (!committed) tmp.delete()
  }

  /** Write (id, float-vector) rows as the per-partition npy pair layout.
    * OVERWRITE semantics: any prior layout in `dir` is removed first —
    * the `_SUCCESS` marker BEFORE the part files, so a CRASH anywhere
    * mid-rewrite leaves an unreadable (marker-less) dir, never old pairs
    * merged under a fresh marker; a stale file that cannot be deleted
    * fails the write loudly rather than surviving into later reads.
    * This is crash-safety, not reader isolation — writers are serialized
    * per layout ([[Formats.ensureWritten]] at the call sites) and a
    * reader concurrent with a rewrite is unsupported (it may see the
    * marker vanish or mixed listings mid-flight).
    * Nulls (id or vector) are rejected with a named error — npy arrays
    * cannot hold nulls, and a backend must reject loudly, never NPE.
    * Every vector in a partition must share its dimension (an npy 2-D
    * array is rectangular); cross-partition uniformity is enforced at
    * READ time ([[readVectors]] checks every pair's header against the
    * first), which also covers foreign layouts. Empty partitions write
    * no files. Each task commits via temp-name + atomic rename
    * ([[commitFile]]), and rows are written in (id, vector-bits) order,
    * making each part file's bytes a pure function of partition
    * MEMBERSHIP: two speculative attempts of the same partition write
    * byte-identical files, so even interleaved ids/vec commits from two
    * attempts cannot mispair a row (Spark's recompute contract makes
    * membership deterministic; attempt-order of equal ids is the one
    * residual the vector-bits tiebreak closes). Ends by writing the
    * `_SUCCESS` marker, which [[readVectors]] requires. */
  def writeVectors(df: DataFrame, idCol: String, vecCol: String,
                   dir: String): Unit = {
    val root = new java.io.File(dir)
    root.mkdirs()
    // marker first, then stale parts/temps — the reverse of write order;
    // a failed delete must fail the WRITE (a surviving stale part would
    // silently merge into every later read — the defect this cleanup
    // exists to prevent)
    val marker = new java.io.File(root, "_SUCCESS")
    require(marker.delete() || !marker.exists(),
      s"$dir: cannot delete stale _SUCCESS marker")
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".npy") || f.getName.endsWith(".tmp"))
      .foreach(f => require(f.delete() || !f.exists(),
        s"$dir: cannot delete stale ${f.getName} — refusing to write a mixed layout"))
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val rows = it.map { r =>
          require(!r.isNullAt(0), "null id — npy column files cannot hold nulls")
          require(!r.isNullAt(1),
            s"null vector for id=${r.getLong(0)} — npy arrays cannot hold nulls")
          // inspect BOXED elements: getSeq[Float] would silently unbox a
          // null ELEMENT to 0.0f — fabricated data, the opposite of the
          // reject-loudly contract
          val boxed = r.getSeq[java.lang.Float](1)
          require(!boxed.contains(null),
            s"null vector element for id=${r.getLong(0)} — npy arrays cannot hold nulls")
          (r.getLong(0), boxed.map(_.floatValue()).toArray)
        }.toArray
          // deterministic content: id order, raw-bits lexicographic
          // tiebreak for duplicate ids (see the scaladoc's speculation
          // argument) — NaN-safe because bits, not values, compare.
          // Comparator, not a sortBy key: the vector bits are only
          // touched on the rare duplicate-id tie, so the sort allocates
          // nothing per comparison in the write hot path
          .sorted(new Ordering[(Long, Array[Float])] {
            def compare(a: (Long, Array[Float]), b: (Long, Array[Float])): Int = {
              val c = java.lang.Long.compare(a._1, b._1)
              if (c != 0) return c
              val va = a._2; val vb = b._2
              val n = math.min(va.length, vb.length)
              var i = 0
              while (i < n) {
                val cc = java.lang.Integer.compare(
                  java.lang.Float.floatToRawIntBits(va(i)),
                  java.lang.Float.floatToRawIntBits(vb(i)))
                if (cc != 0) return cc
                i += 1
              }
              java.lang.Integer.compare(va.length, vb.length)
            }
          })
        if (rows.nonEmpty) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val attempt = tc.taskAttemptId()
          val d = rows(0)._2.length
          val ids = java.nio.ByteBuffer.allocate(rows.length * 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val vec = java.nio.ByteBuffer.allocate(rows.length * d * 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          rows.foreach { case (id, v) =>
            require(v.length == d,
              s"ragged vector: ${v.length} != $d — npy arrays are rectangular")
            ids.putLong(id)
            v.foreach(vec.putFloat)
          }
          commitFile(dir, f"part-$pid%05d.ids.npy", attempt,
            headerBytes("<i8", s"(${rows.length},)"), ids)
          commitFile(dir, f"part-$pid%05d.vec.npy", attempt,
            headerBytes("<f4", s"(${rows.length}, $d)"), vec)
        }
      }
    new java.io.FileOutputStream(s"$dir/_SUCCESS").close()
  }

  private val DictRe =
    ("""\{\s*'descr':\s*'([^']+)',\s*'fortran_order':\s*(False|True),""" +
      """\s*'shape':\s*\(([0-9,\s]*)\),\s*\}\s*""").r

  /** Parse npy bytes: (descr, shape, little-endian data buffer).
    * Accepts the v1.0 C-contiguous subset this backend writes; anything
    * else (v2+, fortran order, other dtypes at the callers) is rejected
    * loudly — a backend must never silently misread foreign data. */
  private[sources] def parseNpy(bytes: Array[Byte],
                                label: String): (String, Array[Int], java.nio.ByteBuffer) = {
    require(bytes.length > 10 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      s"$label: not an npy file")
    require(bytes(6) == 1, s"$label: unsupported npy version ${bytes(6)}")
    val hlen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    require(bytes.length >= 10 + hlen, s"$label: truncated npy header")
    val dict = new String(bytes, 10, hlen, "US-ASCII")
    dict match {
      case DictRe(descr, order, shapeStr) =>
        require(order == "False", s"$label: fortran_order not supported")
        val shape = shapeStr.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
        // reject truncated BODIES here, by name — a short data section
        // (the exact failure the writeFile drain-loop guards against on
        // our own writes, still reachable via foreign/corrupt files)
        // would otherwise surface as a bare IndexOutOfBounds deep inside
        // a read task much later
        val itemSize = descr.filter(_.isDigit).toInt
        val elems = shape.foldLeft(1L)(_ * _)
        require(bytes.length.toLong - 10 - hlen >= elems * itemSize,
          s"$label: truncated npy body (${bytes.length - 10 - hlen} bytes " +
            s"< ${elems * itemSize} for shape ${shape.mkString("(", ",", ")")} $descr)")
        val buf = java.nio.ByteBuffer.wrap(bytes, 10 + hlen, bytes.length - 10 - hlen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (descr, shape, buf)
      case _ => throw new IllegalArgumentException(s"$label: unparseable npy header: $dict")
    }
  }

  private[sources] def readNpy(path: String): (String, Array[Int], java.nio.ByteBuffer) =
    parseNpy(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), path)

  /** Single-archive `.npz` variant (the numpy.savez convention: a ZIP
    * whose entries are `.npy` files). This is the INTERCHANGE form of
    * the backend — one archive is inherently one stream, so read/write
    * are small driver-side byte operations (advisor tables, calibration
    * snapshots, eval manifests), never the data path; the SCALE form is
    * the per-partition pair layout ([[writeVectors]]/[[readVectors]],
    * gated by b129). Entries are written STORED (numpy.savez's own
    * choice; savez_compressed's DEFLATE also parses on read — ZipFile
    * inflates transparently), and a savez-written fixture round-trips
    * through [[readNpz]] in NpySpec. */
  def readNpz(path: String): Map[String, (String, Array[Int], java.nio.ByteBuffer)] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      val entries = scala.jdk.CollectionConverters.EnumerationHasAsScala(zf.entries()).asScala.toSeq
      val parsed = entries.map { e =>
        val name = e.getName.stripSuffix(".npy")
        val in = zf.getInputStream(e)
        val bytes = try in.readAllBytes() finally in.close()
        name -> parseNpy(bytes, s"$path!${e.getName}")
      }
      // reject-loudly, never last-entry-wins: a foreign archive with
      // duplicate entry names (or a pair like "a.npy" + "a" colliding
      // after suffix-stripping) must not silently drop an array via toMap
      val dup = parsed.map(_._1).groupBy(identity).collect {
        case (n, g) if g.size > 1 => n
      }
      require(dup.isEmpty,
        s"$path: duplicate npz entry name(s) after .npy-suffix normalization: ${dup.mkString(", ")}")
      parsed.toMap
    } finally zf.close()
  }

  /** Write named npy payloads as a STORED zip — byte-identical framing
    * to numpy.savez (entry name + ".npy", no compression). */
  def writeNpz(path: String, arrays: Seq[(String, Array[Byte])]): Unit = {
    val out = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try {
      out.setMethod(java.util.zip.ZipOutputStream.STORED)
      arrays.foreach { case (name, bytes) =>
        val e = new java.util.zip.ZipEntry(s"$name.npy")
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(bytes.length.toLong)
        e.setCompressedSize(bytes.length.toLong)
        val crc = new java.util.zip.CRC32(); crc.update(bytes)
        e.setCrc(crc.getValue)
        out.putNextEntry(e); out.write(bytes); out.closeEntry()
      }
    } finally out.close()
  }

  /** npy bytes for an int64 1-D array / a float32 2-D rectangular array
    * — the building blocks of [[writeNpz]] payloads. */
  def npyBytesI64(values: Array[Long]): Array[Byte] = {
    val body = java.nio.ByteBuffer.allocate(values.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(body.putLong)
    headerBytes("<i8", s"(${values.length},)") ++ body.array()
  }

  def npyBytesF32(rows: Array[Array[Float]]): Array[Byte] = {
    require(rows.nonEmpty, "npy 2-D array needs at least one row")
    val d = rows(0).length
    val body = java.nio.ByteBuffer.allocate(rows.length * d * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    rows.foreach { r =>
      require(r.length == d, s"ragged row: ${r.length} != $d")
      r.foreach(body.putFloat)
    }
    headerBytes("<f4", s"(${rows.length}, $d)") ++ body.array()
  }

  /** Header-only parse (first bytes via stream, never the body) — the
    * driver-side schema step of [[readVectors]]. Returns (descr, shape,
    * data-section offset) — the offset is what [[readVectorsSlice]]'s
    * positional reads anchor on. */
  private def readNpyHeader(path: String): (String, Array[Int], Long) = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      val pre = new Array[Byte](10)
      in.readFully(pre)
      require(Magic.indices.forall(i => pre(i) == Magic(i)), s"$path: not an npy file")
      require(pre(6) == 1, s"$path: unsupported npy version ${pre(6)}")
      val hlen = (pre(8) & 0xff) | ((pre(9) & 0xff) << 8)
      val hdr = new Array[Byte](hlen)
      in.readFully(hdr)
      new String(hdr, "US-ASCII") match {
        case DictRe(descr, order, shapeStr) =>
          require(order == "False", s"$path: fortran_order not supported")
          (descr, shapeStr.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt),
            10L + hlen)
        case d => throw new IllegalArgumentException(s"$path: unparseable npy header: $d")
      }
    } finally in.close()
  }

  /** Default per-part-file size bound for [[readVectors]] (1 GiB): each
    * read task buffers one whole pair ([[readNpy]] is readAllBytes), so
    * an unbounded foreign part could OOM a task. Our own writer's parts
    * are writer-partition-sized (pin via `spark.sql.files
    * .maxPartitionBytes`), far under this; a layout that trips the bound
    * was not written for this reader and is rejected BY NAME at listing
    * time, before any task launches. */
  val DefaultMaxPartBytes: Long = 1L << 30

  /** Shared listing preamble of [[readVectors]] and [[readIds]] — ONE
    * definition of the layout-open contract so the two readers cannot
    * drift: `_SUCCESS` required (a half-written layout from a crashed
    * app must not be silently readable), and every file the caller will
    * read bounded by `maxPartBytes` BY NAME (each read task buffers
    * whole files). Returns the matching file names, sorted. */
  private def listParts(dir: String, suffix: String,
                        maxPartBytes: Long): Seq[String] = {
    require(new java.io.File(dir, "_SUCCESS").exists(),
      s"$dir: no _SUCCESS marker — layout absent or not closed by its writer")
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(suffix))
    val oversized = files.filter(_.length() > maxPartBytes)
    require(oversized.isEmpty,
      s"part file(s) over the $maxPartBytes-byte per-task read bound " +
        s"(each read task buffers whole part files): " +
        oversized.map(f => s"${f.getName} (${f.length()} B)").mkString(", "))
    files.map(_.getName).sorted.toSeq
  }

  /** Read a [[writeVectors]] layout back as (id, vec) rows — one task per
    * part pair. The listing step (the standard datasource schema pass)
    * requires the writer's `_SUCCESS` marker (a half-written layout from
    * a crashed app must not be silently readable), reads every pair's
    * HEADER on the driver and requires one uniform vector dimension
    * across files — a layout whose parts disagree on d (foreign data, or
    * a write from a ragged input) is rejected loudly instead of silently
    * yielding mixed-width rows — and bounds every part file's size by
    * `maxPartBytes` (see [[DefaultMaxPartBytes]]). */
  def readVectors(spark: SparkSession, dir: String,
                  maxPartBytes: Long = DefaultMaxPartBytes): DataFrame = {
    import spark.implicits._
    // bound EVERY .npy file (a pair's task reads both halves)
    val parts = listParts(dir, ".npy", maxPartBytes)
      .filter(_.endsWith(".ids.npy")).map(_.stripSuffix(".ids.npy"))
    val dims = parts.map { base =>
      val (descr, shape, _) = readNpyHeader(s"$dir/$base.vec.npy")
      require(descr == "<f4" && shape.length == 2,
        s"$base: expected <f4 (n,d), got $descr ${shape.toSeq}")
      shape(1)
    }
    require(dims.distinct.size <= 1,
      s"mixed vector dimensions across part files: ${dims.distinct.sorted}")
    parts.toDS().repartition(math.max(parts.size, 1))
      .flatMap { base =>
        val (idDescr, idShape, idBuf) = readNpy(s"$dir/$base.ids.npy")
        val (vDescr, vShape, vBuf) = readNpy(s"$dir/$base.vec.npy")
        require(idDescr == "<i8" && vDescr == "<f4",
          s"$base: unexpected dtypes ($idDescr, $vDescr)")
        require(idShape.length == 1 && vShape.length == 2 &&
          idShape(0) == vShape(0),
          s"$base: shape mismatch ${idShape.toSeq} vs ${vShape.toSeq}")
        val n = idShape(0); val d = vShape(1)
        (0 until n).iterator.map { i =>
          val v = new Array[Float](d)
          var j = 0
          while (j < d) { v(j) = vBuf.getFloat((i.toLong * d + j).toInt * 4 + vBuf.position()); j += 1 }
          (idBuf.getLong(i * 8 + idBuf.position()), v)
        }
      }
      .toDF("id", "vec")
  }

  /** Column-pruned read of a [[writeVectors]] layout: ONLY the id files.
    * This is the one-array-per-file layout's projection payoff — a
    * consumer selecting just ids opens none of the `.vec.npy` payloads
    * and reads 8/(8+4·d) of the layout's bytes (measured at two sfs in
    * docs/PLANS.md). Same contracts as [[readVectors]]: `_SUCCESS`
    * required, per-task buffering bounded by `maxPartBytes` over the
    * files THIS read touches (the id files), one task per part. */
  def readIds(spark: SparkSession, dir: String,
              maxPartBytes: Long = DefaultMaxPartBytes): DataFrame = {
    import spark.implicits._
    val parts = listParts(dir, ".ids.npy", maxPartBytes)
    parts.toDS().repartition(math.max(parts.size, 1))
      .flatMap { name =>
        val (descr, shape, buf) = readNpy(s"$dir/$name")
        require(descr == "<i8" && shape.length == 1,
          s"$name: expected <i8 (n,), got $descr ${shape.toSeq}")
        (0 until shape(0)).iterator.map(i => buf.getLong(i * 8 + buf.position()))
      }
      .toDF("id")
  }

  /** Bounded streaming window for [[readVectorsSlice]]'s vec-payload
    * reads (4 MiB): the slice path never buffers a whole `.vec.npy`
    * file, so per-task heap is window + slice output, independent of
    * the file's size. */
  val SliceWindowBytes: Long = 4L << 20

  /** Dimension-sliced read of a [[writeVectors]] layout: (id, vec) rows
    * where vec = dims [dimStart, dimEnd) of each stored vector — column
    * pruning WITHIN the tensor leaf (the reference's lazy-column
    * contract, SURVEY §2A A16, applied inside the (n, d) array; the
    * consumers are PQ/ADC-style scans that touch a few leading dims of
    * wide embeddings).
    *
    * What the slice saves, honestly (measured, docs/PLANS.md r17):
    * per-task HEAP is slice-sized, not file-sized — the vec payload
    * streams through a ≤[[SliceWindowBytes]] window and only the
    * n·(dimEnd−dimStart)·4 slice bytes materialize — and every
    * DOWNSTREAM operator sees rows (dimEnd−dimStart)/d as wide (narrower
    * exchanges, narrower caches). PHYSICAL disk bytes are NOT saved at
    * small d: a d=64 row is 256 B, far under a 4 KiB page, so a strided
    * read still touches every page of the file; page-level skipping only
    * begins once the row stride 4·d exceeds the page size (d ≳ 1024).
    * That negative result is recorded rather than hidden — the
    * full-file sequential window used here is the faster plan at the
    * testdata's d, and becomes prunable I/O only for very wide vectors.
    *
    * Contracts shared with [[readVectors]]: `_SUCCESS` required; the
    * fully-buffered ids files are bounded by `maxPartBytes` BY NAME at
    * listing time; the vec files are exempt from that bound (they are
    * streamed, never buffered — the point of this path); one task per
    * part pair; uniform d across parts, and the slice must fit it. */
  def readVectorsSlice(spark: SparkSession, dir: String,
                       dimStart: Int, dimEnd: Int,
                       maxPartBytes: Long = DefaultMaxPartBytes,
                       windowBytes: Long = SliceWindowBytes): DataFrame = {
    require(dimStart >= 0 && dimEnd > dimStart,
      s"bad dimension slice [$dimStart, $dimEnd): need 0 <= start < end")
    require(windowBytes > 0, s"windowBytes must be positive: $windowBytes")
    import spark.implicits._
    val parts = listParts(dir, ".ids.npy", maxPartBytes)
      .map(_.stripSuffix(".ids.npy"))
    val dims = parts.map { base =>
      val (descr, shape, _) = readNpyHeader(s"$dir/$base.vec.npy")
      require(descr == "<f4" && shape.length == 2,
        s"$base: expected <f4 (n,d), got $descr ${shape.toSeq}")
      shape(1)
    }
    require(dims.distinct.size <= 1,
      s"mixed vector dimensions across part files: ${dims.distinct.sorted}")
    dims.headOption.foreach(d => require(dimEnd <= d,
      s"dimension slice [$dimStart, $dimEnd) out of range for layout d=$d"))
    val width = dimEnd - dimStart
    parts.toDS().repartition(math.max(parts.size, 1))
      .flatMap { base =>
        val (idDescr, idShape, idBuf) = readNpy(s"$dir/$base.ids.npy")
        require(idDescr == "<i8" && idShape.length == 1,
          s"$base: expected <i8 (n,), got $idDescr ${idShape.toSeq}")
        val n = idShape(0)
        val vecPath = java.nio.file.Paths.get(s"$dir/$base.vec.npy")
        val (vDescr, vShape, dataOff) = readNpyHeader(vecPath.toString)
        require(vDescr == "<f4" && vShape.length == 2 && vShape(0) == n &&
          dimEnd <= vShape(1),
          s"$base: vec shape ${vShape.toSeq} incompatible with n=$n slice [$dimStart,$dimEnd)")
        val d = vShape(1)
        val rowBytes = 4L * d
        // truncation check up front, by name — positional reads would
        // otherwise hit a bare EOF deep into the row loop
        require(java.nio.file.Files.size(vecPath) >= dataOff + n * rowBytes,
          s"$base.vec.npy: truncated npy body " +
            s"(${java.nio.file.Files.size(vecPath) - dataOff} bytes < ${n * rowBytes})")
        val out = new Array[Array[Float]](n)
        val ch = java.nio.channels.FileChannel.open(vecPath,
          java.nio.file.StandardOpenOption.READ)
        try {
          val rowsPerBlock = math.max(1L, windowBytes / rowBytes).toInt
          val block = java.nio.ByteBuffer.allocate(
            (math.min(rowsPerBlock.toLong, math.max(n.toLong, 1L)) * rowBytes).toInt)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var row = 0
          while (row < n) {
            val m = math.min(rowsPerBlock, n - row)
            block.clear(); block.limit((m * rowBytes).toInt)
            var pos = dataOff + row * rowBytes
            while (block.hasRemaining) {
              val k = ch.read(block, pos)
              require(k >= 0, s"$base.vec.npy: unexpected EOF at byte $pos")
              pos += k
            }
            var i = 0
            while (i < m) {
              val v = new Array[Float](width)
              val rowBase = (i * rowBytes).toInt + dimStart * 4
              var j = 0
              while (j < width) { v(j) = block.getFloat(rowBase + j * 4); j += 1 }
              out(row + i) = v
              i += 1
            }
            row += m
          }
        } finally ch.close()
        (0 until n).iterator.map(i =>
          (idBuf.getLong(i * 8 + idBuf.position()), out(i)))
      }
      .toDF("id", "vec")
  }
}
