package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Nested

/** §2A structural/functional operators on the F1 nested fixture
  * (roundtrip laws per SURVEY.md §5.2 item 4). */
class NestedOpsSpec extends SparkSpec {

  import Fixtures._

  lazy val events: DataFrame = {
    val s = spark; import s.implicits._
    Fixtures.events.toDF()
  }

  test("A1 fieldname renames top-level and nested fields") {
    val top = Nested.fieldname(events, "", "met", "missingEt")
    assert(top.columns.contains("missingEt") && !top.columns.contains("met"))

    val nested = Nested.fieldname(events, "muons", "pt", "momentum")
    val elem = nested.schema("muons").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(elem.fieldNames.contains("momentum") && !elem.fieldNames.contains("pt"))
    // values preserved
    val sums = nested.select(aggregate(col("muons"), lit(0.0),
      (a, m) => a + m.getField("momentum")).as("s")).collect().map(_.getDouble(0)).sum
    assert(math.abs(sums - (54.2 + 23.6 + 150.0 + 7.0 + 8.0 + 9.0)) < 1e-9)
  }

  test("A2 recordname stores logical name as metadata") {
    val named = Nested.recordname(events.withColumn("rec", struct(col("eventId"))), "rec", "Event")
    assert(named.schema("rec").metadata.getString("graft.recordname") == "Event")
  }

  test("A3 project drills through array-of-struct preserving list shape") {
    val pts = events.select(col("eventId"), Nested.project(col("muons"), "pt").as("pts"))
      .orderBy("eventId").collect()
    assert(pts(0).getSeq[Double](1) == Seq(54.2, 23.6))
    assert(pts(1).getSeq[Double](1).isEmpty)
  }

  test("A4/A5 keep and drop prune columns") {
    assert(Nested.keep(events, "eventId", "met").columns.toSeq == Seq("eventId", "met"))
    assert(!Nested.drop(events, "jets").columns.contains("jets"))
    val pruned = events.select(Nested.dropInElements(col("jets"), "btag").as("jets"))
    val elem = pruned.schema("jets").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(elem.fieldNames.toSeq == Seq("pt", "eta"))
  }

  test("A6/A7 split then merge is identity on field values") {
    val soa = Nested.split(events.select(col("eventId"), col("muons")), "muons", "pt", "eta", "phi", "q")
    assert(soa.columns.toSeq == Seq("eventId", "pt", "eta", "phi", "q"))
    val aos = Nested.merge(soa, "muons", "pt", "eta", "phi", "q")
    val back = aos.select(col("eventId"), col("muons")).orderBy("eventId").collect()
    val orig = events.select(col("eventId"), col("muons")).orderBy("eventId").collect()
    (back zip orig).foreach { case (b, o) =>
      val bs = b.getSeq[org.apache.spark.sql.Row](1)
      val os = o.getSeq[org.apache.spark.sql.Row](1)
      assert(bs.map(_.toSeq) == os.map(_.toSeq), s"event ${b.get(0)}")
    }
  }

  test("A8 parent injects containing-record key into each element") {
    val withP = Nested.parent(events, "muons", "evt", col("eventId"))
    val rows = withP.select(explode(col("muons")).as("m"))
      .select(col("m.evt"), col("m.pt")).collect()
    assert(rows.forall(r => r.getLong(0) > 0))
    assert(rows.count(_.getLong(0) == 4L) == 3)
  }

  test("A9 index adds 0-based position within list") {
    val idx = Nested.index(events, "muons", "i")
    val rows = idx.where(col("eventId") === 4)
      .select(explode(col("muons")).as("m")).select(col("m.i"), col("m.pt"))
      .orderBy("m.i").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(7.0, 8.0, 9.0))
  }

  test("A10 tomask nulls a sentinel range, keeps the rest") {
    val df = events.select(col("eventId"), Nested.tomask(col("met"), lit(5.0), lit(11.0)).as("m"))
      .orderBy("eventId").collect()
    assert(!df(0).isNullAt(1) && df(1).isNullAt(1) && !df(2).isNullAt(1) && df(3).isNullAt(1))
  }

  test("A10 tomask single-sentinel form nulls only exact matches") {
    val df = events.select(col("eventId"), Nested.tomask(col("met"), lit(10.1)).as("m"))
      .orderBy("eventId").collect()
    assert(!df(0).isNullAt(1) && df(1).isNullAt(1) && !df(2).isNullAt(1) && !df(3).isNullAt(1))
  }

  test("A10 tomaskElements nulls sentinel values inside lists") {
    val masked = events.select(Nested.tomaskElements(
      Nested.project(col("muons"), "pt"), lit(7.0), lit(8.5)).as("pts"))
    val rows = masked.where(size(col("pts")) === 3).first().getSeq[Any](0)
    assert(rows(0) == null && rows(1) == null && rows(2) == 9.0)
  }

  test("A11 flatten: List(List(x)) -> List(x)") {
    val f = events.select(Nested.flattenList(
        array(Nested.project(col("muons"), "pt"), Nested.project(col("jets"), "pt"))).as("all_pt"))
      .where(size(col("all_pt")) > 0)
    val first = f.orderBy(size(col("all_pt")).desc).first().getSeq[Double](0)
    assert(first.size == 6) // event 4: 3 muons + 3 jets
  }

  test("A12 filter result is a subset; A13 define preserves count") {
    val filtered = events.select(col("eventId"),
      Nested.filterElements(col("muons"), m => m.getField("pt") > 20.0).as("hi"))
    val counts = filtered.select(size(col("hi"))).collect().map(_.getInt(0))
    val origCounts = events.select(size(col("muons"))).collect().map(_.getInt(0))
    assert((counts zip origCounts).forall { case (c, o) => c <= o })

    val defined = events.select(Nested.defineElements(col("muons"), "pt2",
      m => m.getField("pt") * m.getField("pt")).as("muons"))
    val n = defined.select(size(col("muons"))).collect().map(_.getInt(0)).sum
    assert(n == origCounts.sum)
  }

  test("A14 mapElements and A15 reduceElements") {
    val doubled = events.select(Nested.mapElements(
      Nested.project(col("muons"), "pt"), x => x * 2).as("d"))
    val total = doubled.select(aggregate(col("d"), lit(0.0), _ + _)).collect().map(_.getDouble(0)).sum
    val reduced = events.select(Nested.reduceElements(
      Nested.project(col("muons"), "pt"), lit(0.0), _ + _).as("s"))
    val total2 = reduced.collect().map(_.getDouble(0)).sum
    assert(math.abs(total - 2 * total2) < 1e-9)
  }

  test("A14/A15 typed Dataset map and reduce (encoder path)") {
    val s = spark; import s.implicits._
    val ds = s.createDataset(Fixtures.events)
    // typed map: per-event scalar quantity, like oamap map with numba fn
    val met = ds.map(e => e.met)
    assert(math.abs(met.reduce(_ + _) - (27.5 + 10.1 + 88.8 + 5.5)) < 1e-9)
    // typed flat aggregation over nested lists
    val leadPt = ds.map(e => e.muons.map(_.pt).maxOption.getOrElse(0.0))
    assert(leadPt.collect().sorted.toSeq == Seq(0.0, 9.0, 54.2, 150.0))
  }

  test("A17 slice and element access") {
    val s = events.where(col("eventId") === 4)
      .select(Nested.sliceList(col("muons"), 2, 2).as("mid"))
    assert(s.select(size(col("mid"))).first().getInt(0) == 2)
    val firstPt = events.where(col("eventId") === 1)
      .select(Nested.at(col("muons"), 1).getField("pt")).first().getDouble(0)
    assert(firstPt == 54.2)
  }
}
