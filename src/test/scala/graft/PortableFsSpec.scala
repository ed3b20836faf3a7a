package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{EntityStore, RunRegistry, TripleStore}

/** Filesystem portability of the persistence layers (VERDICT r04 next #1):
  * every store must work when its root is opened through the Hadoop
  * FileSystem API with an explicit scheme. `file:///...` roots exercise
  * exactly the code path an `hdfs://`/`s3a://` root takes (Path
  * resolution, FileSystem listings, FileContext renames) — the old
  * `java.nio` plumbing treated "file:" as a literal directory name and
  * broke on the first manifest write.
  */
class PortableFsSpec extends SparkSpec {

  private def schemeRoot(prefix: String): String =
    "file://" + Files.createTempDirectory(prefix).toAbsolutePath

  private def triples(rows: (String, String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("subj", "pred", "obj", "weight")
  }

  test("TripleStore commit/resume/supersede cycle through a file:// Hadoop root") {
    import spark.implicits._
    val root = schemeRoot("graft_pfs_ts_")
    val store = new TripleStore(root, spark)
    store.commit("b1", triples(
      ("u1", "mentions", "e1", 1L), ("u1", "processedIn", "b1", 1L)))
    store.commit("b2", triples(
      ("u2", "mentions", "e2", 1L), ("u2", "processedIn", "b2", 1L)))
    assert(store.committedBatches() === Seq("b1", "b2"))
    assert(store.committed().count() === 4L)
    // the resume anti-join sees the committed markers through the scheme
    val todo = store.unprocessed(Seq("u1", "u2", "u3").toDF("url"), "processedIn")
      .as[String].collect().sorted.toSeq
    assert(todo === Seq("u3"))
    // predicate-pruned read + manifest metrics work through the scheme
    assert(store.predRowCount("mentions") === 2L)
    assert(store.committedForPred("mentions").count() === 2L)
    // copy-on-write delete supersedes atomically through the scheme
    store.deleteWhere(col("subj") === "u1" && col("pred") === "mentions")
    assert(store.committed().filter($"pred" === "mentions").count() === 1L)
    assert(store.committed().filter($"pred" === "processedIn").count() === 2L)
    // compaction folds and the store keeps accepting commits
    store.compact()
    assert(store.committedBatches().size === 1)
    store.commit("b3", triples(("u3", "mentions", "e3", 1L)))
    assert(store.committed().filter($"pred" === "mentions").count() === 2L)
  }

  test("EntityStore merge cycle through a file:// Hadoop root (hard-link fast path kept)") {
    import spark.implicits._
    val root = schemeRoot("graft_pfs_es_")
    val es = new EntityStore(root, spark)
    def rows(xs: (String, String, String, String, Long)*) =
      xs.toDF("url", "entity_text_norm", "entity_type", "entity_text", "n")
    // batch 1 spreads over many buckets; batch 2 dirties just spark's —
    // the other buckets must ride to v=2 as hard links (local fast path)
    val b1 = rows((("u1", "spark", "ORG", "Spark", 2L) +:
      (0 until 8).map(i => ("u1", s"ent$i", "ORG", s"Ent$i", 1L))): _*)
    assert(es.merge("b1", b1))
    assert(es.merge("b2", rows(("u2", "spark", "ORG", "SPARK", 3L))))
    assert(!es.merge("b2", rows(("u9", "x", "ORG", "X", 1L)))) // idempotent
    val dict = es.dict().toDF()
      .filter($"entity_text_norm" === "spark")
      .select($"entity_text", $"entity_mentions_count", $"news_count")
      .as[(String, Long, Long)].collect().toSeq
    assert(dict === Seq(("SPARK", 5L, 2L)))
    assert(es.dict().count() === 9L)
    // clean buckets were forwarded as hard links (local scheme fast path):
    // at least one parquet in v=2 has link count > 1
    val v2 = java.nio.file.Paths.get(new java.net.URI(root)).resolve("v=2")
    val walk = java.nio.file.Files.walk(v2) // close: holds an open fd
    val linked = (try walk.toArray.map(_.toString) finally walk.close())
      .filter(_.endsWith(".parquet"))
      .map(p => java.nio.file.Files.getAttribute(
        java.nio.file.Paths.get(p), "unix:nlink").asInstanceOf[Int])
    assert(linked.exists(_ > 1),
      s"expected a hard-linked clean bucket in $v2 (nlink counts: ${linked.toSeq})")
  }

  test("RunRegistry register/activate through a file:// Hadoop root") {
    val root = schemeRoot("graft_pfs_reg_")
    val reg = new RunRegistry(root, spark)
    reg.register("r1", "m", 10, 2, 3, 0.1)
    reg.register("r2", "m", 10, 2, 3, 0.2)
    assert(reg.active().isEmpty)
    reg.activate("r1")
    assert(reg.active() === Some("r1"))
    reg.activate("r2") // deactivate-all-then-activate, one publish
    assert(reg.active() === Some("r2"))
    assert(reg.latest() === Some("r2"))
    assert(reg.table().count() === 2L)
  }
}
