package graft.sources.mergetree

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

/** The `.index` manifest as the tree's single commit point (VERDICT
  * r12 "what's missing" #3): readers list parts from the manifest on
  * every backend, so a writer killed mid-part-rename — including the
  * copy+delete rename emulation an object store does, which can die
  * halfway with a half-copied part dir in place — never exposes a torn
  * part to a concurrent reader. Publication is one atomic small-file
  * swap, the Iceberg/Delta commit discipline. */
class ManifestCommitSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def sql(s: String) = graft.dialect.ChSql.sql(spark, s)

  private def withTable[A](name: String)(f: (String, String) => A): A = {
    val wh = Files.createTempDirectory("graft_manifest").toString
    spark.conf.set(graft.dialect.ChWrites.WarehouseConf, wh)
    try {
      sql(s"CREATE TABLE $name (id Int64, s String) ENGINE = MergeTree " +
        "ORDER BY id").collect()
      sql(s"INSERT INTO $name VALUES (1, 'a'), (2, 'b')").collect()
      f(wh, s"$wh/$name")
    } finally {
      sql(s"DROP TABLE IF EXISTS $name").collect()
      spark.conf.unset(graft.dialect.ChWrites.WarehouseConf)
    }
  }

  /** Simulate a writer killed mid-rename on a copy+delete filesystem:
    * half of an existing part's files appear under a new part-named
    * dir, and the manifest was never republished. */
  private def tearHalfCopy(tree: String, tornName: String): Unit = {
    val parts = MergeTree.partsInfo(tree).map(_._1)
    assert(parts.nonEmpty)
    val src = Paths.get(tree, parts.head)
    val dst = Paths.get(tree, tornName)
    Files.createDirectories(dst)
    val files = Files.list(src).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .sortBy(_.getFileName.toString)
    // copy only the first half — a torn part is structurally incomplete
    files.take(math.max(1, files.length / 2)).foreach { p =>
      Files.copy(p, dst.resolve(p.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("a torn (unmanifested) part is invisible to readers and system.parts") {
    withTable("mc_t") { (_, tree) =>
      val before = sql("SELECT id, s FROM mc_t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(before == Seq((1L, "a"), (2L, "b")))
      tearHalfCopy(tree, "all_99_99_0")
      assert(Files.isDirectory(Paths.get(tree, "all_99_99_0")),
        "the torn dir must physically exist for the test to mean anything")
      // invisible to the part inventory and to scans
      assert(!MergeTree.partsInfo(tree).map(_._1).contains("all_99_99_0"))
      spark.catalog.refreshByPath(tree)
      val after = sql("SELECT id, s FROM mc_t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(after == before, s"torn part leaked into the scan: $after")
    }
  }

  test("block allocation sees the raw directory: next INSERT goes above torn debris") {
    withTable("mc_a") { (_, tree) =>
      tearHalfCopy(tree, "all_7_7_0")
      // the torn dir holds block 7; a colliding allocation would fail
      // the rename — the raw-listing watermark must go above it
      sql("INSERT INTO mc_a VALUES (3, 'c')").collect()
      val parts = MergeTree.partsInfo(tree).map(_._1)
      assert(parts.exists(p => TableFiles.maxBlock(p).exists(_ > 7)),
        s"new part must allocate above the debris block: $parts")
      val rows = sql("SELECT id FROM mc_a ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(1L, 2L, 3L))
    }
  }

  test("manifest publish is atomic: no .pub_ temp survives, content is complete") {
    withTable("mc_p") { (_, tree) =>
      val listing = Files.list(Paths.get(tree)).toArray
        .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      assert(!listing.exists(_.contains(".pub_")), listing.mkString(", "))
      val idx = new String(
        Files.readAllBytes(Paths.get(tree, ".index")), "UTF-8")
      val parts = MergeTree.partsInfo(tree).map(_._1)
      parts.foreach(p => assert(idx.contains(s"$p/columns.txt"), p))
      assert(!idx.contains(".index"))
    }
  }

  test("crashed-publish debris (.index.pub_*) never re-manifests (advisor r14)") {
    withTable("mc_dbr") { (_, tree) =>
      // a writer killed between the temp write and the ATOMIC_MOVE
      // leaves exactly this file (NioTreeFs.publish's temp name)
      Files.write(Paths.get(tree, ".index.pub_deadbeef"),
        "junk".getBytes("UTF-8"))
      // the next commit rebuilds the manifest from the raw walk — the
      // debris must be excluded, not carried as a root entry
      sql("INSERT INTO mc_dbr VALUES (3, 'c')").collect()
      val idx = new String(
        Files.readAllBytes(Paths.get(tree, ".index")), "UTF-8")
      assert(!idx.contains(".pub_"), idx)
      val rows = sql("SELECT id FROM mc_dbr ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(1L, 2L, 3L))
    }
  }

  test("hand-built trees without a manifest fall back to the raw walk") {
    withTable("mc_w") { (_, tree) =>
      Files.delete(Paths.get(tree, ".index"))
      spark.catalog.refreshByPath(tree)
      // listing falls back to the walk; the tree still reads in full
      val rows = sql("SELECT id FROM mc_w ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(1L, 2L))
    }
  }

  test("manifest commit holds through a registered Hadoop scheme reader") {
    withTable("mc_h") { (_, tree) =>
      tearHalfCopy(tree, "all_55_55_0")
      val conf = spark.sessionState.newHadoopConf()
      conf.set("fs.graftfs.impl", classOf[graft.sources.GraftTestFs].getName)
      val tf = HadoopTableFiles(s"graftfs://$tree",
        new SerializableHadoopConf(conf))
      val parts = tf.partDirs()
      assert(parts.nonEmpty && !parts.contains("all_55_55_0"),
        parts.mkString(", "))
    }
  }
}
