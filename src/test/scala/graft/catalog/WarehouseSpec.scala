package graft.catalog

import graft.SparkSpec
import graft.sources.{LocalFixtureClient, Poll}
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_wh").toString

  test("overwrite/append/read roundtrip + schema evolution by projection") {
    val wh = new Warehouse(spark, tmp())
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    wh.overwrite("staging", "t", df)
    assert(wh.read("staging", "t").count() == 2)
    wh.append("staging", "t", Seq((3, "c")).toDF("id", "v"))
    assert(wh.read("staging", "t").count() == 3)
    // S8/S9: full refresh replaces, not accumulates
    wh.overwrite("staging", "t", df)
    assert(wh.read("staging", "t").count() == 2)
    // S11: ALTER ADD COLUMN as projection
    wh.overwrite("staging", "t_v2",
      wh.read("staging", "t").withColumn("status", lit(null).cast("string")))
    assert(wh.read("staging", "t_v2").columns.contains("status"))
  }

  test("merge upserts by key and equals the rewrite-on-write result") {
    val wh = new Warehouse(spark, tmp())
    val hist = Seq((1L, "shipped", 10.0), (2L, "shipped", 20.0),
                   (3L, "shipped", 30.0)).toDF("id", "status", "amt")
    wh.overwrite("mart", "f", hist)
    val updates = Seq((2L, "refunded", 20.0), (4L, "shipped", 40.0))
      .toDF("id", "status", "amt")
    wh.merge("mart", "f", updates, Seq("id"))
    val got = wh.read("mart", "f").as[(Long, String, Double)].collect().toSet
    // rewrite-on-write equivalent: keep non-matched history, take updates
    val want = Set((1L, "shipped", 10.0), (3L, "shipped", 30.0),
                   (2L, "refunded", 20.0), (4L, "shipped", 40.0))
    assert(got == want)
    // merge into a missing table degenerates to create
    wh.merge("mart", "fresh", updates, Seq("id"))
    assert(wh.read("mart", "fresh").count() == 2)
  }

  test("merge recovers a table parked at .bak by a crash mid-swap") {
    val root = tmp()
    val wh = new Warehouse(spark, root)
    val hist = Seq((1L, "shipped"), (2L, "shipped")).toDF("id", "status")
    wh.overwrite("mart", "f", hist)
    // simulate a crash between writeSwap's two renames: live path gone,
    // previous table parked at the .bak path
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/mart/f"),
                     new org.apache.hadoop.fs.Path(s"$root/mart/.f__swap_bak")))
    val updates = Seq((2L, "refunded")).toDF("id", "status")
    wh.merge("mart", "f", updates, Seq("id"))
    val got = wh.read("mart", "f").as[(Long, String)].collect().toSet
    // history row 1 survives — merge did NOT degrade to overwrite(updates)
    assert(got == Set((1L, "shipped"), (2L, "refunded")))
  }

  test("overwriteAtomic replaces a table from a frame that reads it") {
    val wh = new Warehouse(spark, tmp())
    wh.overwrite("stg", "acc", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // replacement frame scans the live table — plain overwrite would race
    val next = wh.read("stg", "acc")
      .unionByName(Seq((3L, "c")).toDF("id", "v"))
    wh.overwriteAtomic("stg", "acc", next)
    assert(wh.read("stg", "acc").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("partitioned merge rewrites only the partitions present in updates") {
    val root = tmp()
    val wh = new Warehouse(spark, root)
    val hist = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
                   (3L, "2024-01-02", 30.0)).toDF("id", "day", "amt")
    wh.mergePartitioned("mart", "fp", hist, Seq("id"), "day")
    def files(day: String): Set[String] =
      Option(new java.io.File(s"$root/mart/fp/day=$day").list())
        .map(_.toSet.filter(_.startsWith("part-"))).getOrElse(Set())
    val day1Before = files("2024-01-01")
    val updates = Seq((3L, "2024-01-02", 31.0), (4L, "2024-01-02", 40.0))
      .toDF("id", "day", "amt")
    wh.mergePartitioned("mart", "fp", updates, Seq("id"), "day")
    val got = wh.read("mart", "fp")
      .select("id", "day", "amt").as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
                      (3L, "2024-01-02", 31.0), (4L, "2024-01-02", 40.0)))
    // untouched partition keeps its exact files (never rewritten)
    assert(files("2024-01-01") == day1Before && day1Before.nonEmpty)
  }

  test("DAG month-partitions the big facts; read() hides the layout column") {
    val root = tmp()
    val sf = "/root/testdata/sf0.001"
    PipelineRunner.run(spark, sf, root)
    val wh = new Warehouse(spark, root)
    // physical layout: one gp_month=YYYY-MM directory per month
    for (t <- Seq("staging/user_order_log_v2", "mart/f_sales",
                  "mart/f_sales_v2")) {
      val dirs = new java.io.File(s"$root/$t").list()
      assert(dirs != null && dirs.exists(_.startsWith("gp_month=")), t)
    }
    // logical schema: the layout column is invisible on read-back
    assert(!wh.read("mart", "f_sales_v2").columns.contains(Warehouse.PartCol))
    // base-overwrite + partitioned increment merge ≡ the monolithic frame
    val p = graft.etl.Pipeline.of(spark, sf)
    val cols = p.fSalesV2.columns.toIndexedSeq
    val want = p.fSalesV2.collect().toSet
    val got = wh.read("mart", "f_sales_v2")
      .select(cols.map(col): _*).collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("compact collapses small files, keeps rows and partition layout") {
    val root = tmp()
    val wh = new Warehouse(spark, root)
    def files(sub: String): Set[String] =
      Option(new java.io.File(s"$root/$sub").list())
        .map(_.toSet.filter(_.startsWith("part-"))).getOrElse(Set())
    // flat table: 3 appends x 4 files each -> 12 small files
    val mk = (o: Int) => (1 to 20).map(i => ((o * 100 + i).toLong, s"r$i"))
      .toDF("id", "v").repartition(4)
    wh.overwrite("staging", "cf", mk(0))
    wh.append("staging", "cf", mk(1)); wh.append("staging", "cf", mk(2))
    val before = wh.read("staging", "cf")
      .as[(Long, String)].collect().toSet
    assert(files("staging/cf").size == 12)
    wh.compact("staging", "cf")
    assert(files("staging/cf").size == 1)
    assert(wh.read("staging", "cf")
      .as[(Long, String)].collect().toSet == before)
    // partitioned table fragmented by an EXTERNAL writer (raw partitionBy,
    // one file per task per month — the shape overwritePartitioned no
    // longer produces itself): compact -> exactly one per month, partition
    // dirs (and so pruning) intact
    val part = (1 to 40).map(i =>
      (i.toLong, s"2024-0${i % 2 + 1}", i * 1.0))
      .toDF("id", Warehouse.PartCol, "amt").repartition(8)
    part.write.mode("overwrite").partitionBy(Warehouse.PartCol)
      .parquet(s"$root/mart/cp")
    assert(files(s"mart/cp/${Warehouse.PartCol}=2024-01").size > 1)
    val beforeP = wh.read("mart", "cp")
      .as[(Long, Double)].collect().toSet
    wh.compact("mart", "cp")
    for (m <- Seq("2024-01", "2024-02"))
      assert(files(s"mart/cp/${Warehouse.PartCol}=$m").size == 1, m)
    assert(wh.read("mart", "cp")
      .as[(Long, Double)].collect().toSet == beforeP)
    // bucketed tables are refused: a path-level rewrite would break the
    // bucket-id-in-filename layout behind the catalog's back
    wh.bucketedOverwrite("mart", "cb",
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "id", 4)
    val e = intercept[IllegalArgumentException] { wh.compact("mart", "cb") }
    assert(e.getMessage.contains("bucket"))
    // ...and still refused when the catalog entry is gone (fresh session):
    // the bucket ids survive only in the file names, and the guard reads
    // them from there
    spark.sql(s"DROP TABLE ${wh.catalogName("mart", "cb")}")
    val e2 = intercept[IllegalArgumentException] { wh.compact("mart", "cb") }
    assert(e2.getMessage.contains("bucket"))
  }

  test("partitioned writes land one file per partition; merges keep it") {
    val root = tmp()
    val wh = new Warehouse(spark, root)
    def files(sub: String): Set[String] =
      Option(new java.io.File(s"$root/$sub").list())
        .map(_.toSet.filter(_.startsWith("part-"))).getOrElse(Set())
    val part = (1 to 40).map(i =>
      (i.toLong, s"2024-0${i % 2 + 1}", i * 1.0))
      .toDF("id", Warehouse.PartCol, "amt").repartition(8)
    wh.overwritePartitioned("mart", "p1", part, Warehouse.PartCol)
    for (m <- Seq("2024-01", "2024-02"))
      assert(files(s"mart/p1/${Warehouse.PartCol}=$m").size == 1, m)
    // three successive increments through the partitioned merge: the
    // touched month stays at ONE file (no small-file accumulation), rows
    // equal the rewrite-on-write result
    for (k <- 1 to 3)
      wh.mergePartitioned("mart", "p1",
        Seq((40L + k, "2024-02", 100.0 * k)).toDF(
          "id", Warehouse.PartCol, "amt").repartition(4),
        Seq("id"), Warehouse.PartCol)
    assert(files(s"mart/p1/${Warehouse.PartCol}=2024-02").size == 1)
    assert(wh.read("mart", "p1").count() == 43)
    assert(wh.read("mart", "p1").where(col("amt") === 300.0).count() == 1)
  }

  test("readRange prunes to the matching partition directories") {
    val wh = new Warehouse(spark, tmp())
    val part = (1 to 30).map(i =>
      (i.toLong, s"2024-0${i % 3 + 1}", i * 1.0))
      .toDF("id", Warehouse.PartCol, "amt")
    wh.overwritePartitioned("mart", "pr", part, Warehouse.PartCol)
    val pruned = wh.readRange("mart", "pr", Warehouse.PartCol,
                              "2024-02", "2024-02")
    // logical schema: layout column stripped, rows = that month only
    assert(!pruned.columns.contains(Warehouse.PartCol))
    assert(pruned.count() == 10)
    // physical: the scan's file listing covers ONE of the three partition
    // directories (partition filter, not a post-scan row filter)
    val files = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
          .flatMap(_.files.map(_.getPath.toString))
    }.flatten
    assert(files.nonEmpty &&
           files.forall(_.contains(s"${Warehouse.PartCol}=2024-02")), files)
  }

  test("flat merge refuses a partitioned table (layout would be lost)") {
    val wh = new Warehouse(spark, tmp())
    val base = Seq((1L, "a", "2024-01"), (2L, "b", "2024-02"))
      .toDF("id", "v", Warehouse.PartCol)
    wh.overwritePartitioned("mart", "t", base, Warehouse.PartCol)
    val updates = Seq((2L, "b2", "2024-02")).toDF("id", "v", Warehouse.PartCol)
    val e = intercept[IllegalArgumentException] {
      wh.merge("mart", "t", updates.drop(Warehouse.PartCol), Seq("id"))
    }
    assert(e.getMessage.contains("mergePartitioned"))
    // the partitioned path handles the same update fine
    wh.mergePartitioned("mart", "t", updates, Seq("id"), Warehouse.PartCol)
    assert(wh.read("mart", "t").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b2")))
  }

  test("two warehouses with different roots bucket the same name independently") {
    // the session catalog is shared across Warehouse instances; before r8
    // the catalog entry was `${db}_$table`, so the SECOND instance's
    // bucketedOverwrite silently repointed the FIRST's table. The name now
    // carries the root hash: same (db, table) in two roots must coexist
    // and read back their own data.
    val whA = new Warehouse(spark, tmp())
    val whB = new Warehouse(spark, tmp())
    assert(whA.catalogName("mart", "sametab") !=
           whB.catalogName("mart", "sametab"))
    whA.bucketedOverwrite("mart", "sametab",
      (1 to 50).map(i => (i.toLong, "rootA")).toDF("id", "src"), "id", 4)
    whB.bucketedOverwrite("mart", "sametab",
      (1 to 70).map(i => (i.toLong, "rootB")).toDF("id", "src"), "id", 4)
    // A's table is untouched by B's write — counts AND contents distinct
    assert(whA.readTable("mart", "sametab").count() == 50)
    assert(whB.readTable("mart", "sametab").count() == 70)
    assert(whA.readTable("mart", "sametab")
      .select("src").distinct().as[String].collect().toSeq == Seq("rootA"))
    assert(whB.readTable("mart", "sametab")
      .select("src").distinct().as[String].collect().toSeq == Seq("rootB"))
    // appends route to their own instance's table too
    whA.bucketedAppend("mart", "sametab",
      Seq((51L, "rootA")).toDF("id", "src"), "id", 4)
    assert(whA.readTable("mart", "sametab").count() == 51)
    assert(whB.readTable("mart", "sametab").count() == 70)
  }

  test("compactPartitions refuses a partition holding bucketed files") {
    // the nested-bucketed-files false negative (r7 ADVICE): an external
    // writer bucketed files UNDER a partition dir — the top-level check
    // can't see them, but the per-partition listing must refuse the
    // rewrite instead of silently destroying the bucket layout
    val root = tmp()
    val wh = new Warehouse(spark, root)
    val base = (1 to 40).map(i => (i.toLong, s"2024-0${i % 2 + 1}", i * 1.0))
      .toDF("id", Warehouse.PartCol, "amt")
    wh.overwritePartitioned("mart", "nb", base, Warehouse.PartCol)
    // plant a bucket-named file inside one partition dir (the shape a
    // bucketed writer produces: part-…_00003.c000….parquet)
    val pdir = java.nio.file.Paths.get(
      s"$root/mart/nb/${Warehouse.PartCol}=2024-01")
    val donor = java.nio.file.Files.list(pdir).iterator().next()
    java.nio.file.Files.copy(donor, pdir.resolve(
      "part-00000-feedface_00003.c000.snappy.parquet"))
    val e = intercept[IllegalArgumentException] {
      wh.compactPartitions("mart", "nb", Warehouse.PartCol,
        Seq("2024-01", "2024-02"))
    }
    assert(e.getMessage.contains("bucketedOverwrite"))
    // whole-table compact's recursive walk refuses it too
    val e2 = intercept[IllegalArgumentException] { wh.compact("mart", "nb") }
    assert(e2.getMessage.contains("bucket"))
  }

  test("poll utility: succeeds within budget, gives up after it") {
    val client = new LocalFixtureClient(spark, "/root/testdata/sf0.001",
                                        pendingPolls = 2)
    val task = client.generateReport()
    val got = Poll.until(attempts = 5, delayMs = 1)(client.getReport(task))
    assert(got.contains("report:/root/testdata/sf0.001"))
    val never = Poll.until(attempts = 3, delayMs = 1)(
      Option.empty[String])
    assert(never.isEmpty)
  }

  test("fixture client feeds have the reference schemas") {
    val client = new LocalFixtureClient(spark, "/root/testdata/sf0.001")
    val feeds = client.fetchReport("r")
    assert(feeds("user_order_log").columns.toSeq == Seq(
      "uniq_id", "date_time", "city_id", "city_name", "customer_id",
      "first_name", "last_name", "item_id", "item_name", "quantity",
      "payment_amount"))
    assert(feeds("price_log").columns.toSeq == Seq("prod_name", "price"))
    val inc = client.fetchIncrement("i")
    assert(inc("user_order_log_inc").columns.contains("status"))
  }

  test("small control files: atomic replace, and a crash that parked the " +
       "old copy under .__bak heals on read") {
    val root = tmp()
    val wh = new Warehouse(spark, root)
    val p = s"$root/ctl/manifest"
    assert(wh.readSmallFile(p).isEmpty)
    wh.writeSmallFileAtomic(p, "gen:0\n0:a")
    assert(wh.readSmallFile(p).contains("gen:0\n0:a"))
    wh.writeSmallFileAtomic(p, "gen:0\n0:a\n1:b") // replace, not append
    assert(wh.readSmallFile(p).contains("gen:0\n0:a\n1:b"))
    // simulate a crash between live→bak and tmp→live: only .__bak exists
    java.nio.file.Files.move(java.nio.file.Paths.get(p),
      java.nio.file.Paths.get(p + ".__bak"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(wh.readSmallFile(p).contains("gen:0\n0:a\n1:b"),
      "read must heal from the parked backup")
    // healed IN PLACE: the live path is back
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
  }

  test("dropTable removes a bucketed table's catalog entry and files") {
    import spark.implicits._
    val root = tmp()
    val wh = new Warehouse(spark, root)
    wh.bucketedOverwrite("db", "t", Seq((1L, "x")).toDF("k", "v"), "k", 4)
    assert(wh.exists("db", "t"))
    wh.dropTable("db", "t")
    assert(!wh.exists("db", "t"))
    assert(!spark.catalog.tableExists(wh.catalogName("db", "t")))
    wh.dropTable("db", "t") // idempotent on a missing table
  }

  test("materializing runner is idempotent across re-runs (sf0.001)") {
    val root = tmp()
    val sf = "/root/testdata/sf0.001"
    PipelineRunner.run(spark, sf, root)
    val first = new Warehouse(spark, root)
      .read("mart", "retention_compact").collect().toSet
    PipelineRunner.run(spark, sf, root) // re-run over same warehouse
    val second = new Warehouse(spark, root)
      .read("mart", "retention_compact").collect().toSet
    assert(first == second && first.nonEmpty)
    for (t <- PipelineRunner.martTables)
      assert(new Warehouse(spark, root).exists("mart", t), t)
  }
}
