package graft.ops

import graft.SparkSpec

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("fkEdge counts orphan keys and rows") {
    val child = Seq(1L, 1L, 2L, 3L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Audit.fkEdge(child, "fk", parent, "pk", "child.fk->parent.pk")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // 4 rows over 3 keys; key 3 (1 row) is the orphan
    assert(r == Seq(("child.fk->parent.pk", 4L, 3L, 1L, 1L)))
  }

  test("fkEdge on a clean edge reports zero orphans") {
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Audit.fkEdge(child, "fk", parent, "pk", "e")
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(r == (("e", 3L, 2L, 0L, 0L)))
  }

  test("full audit over the generated schema is clean") {
    val rows = Audit.fkAudit(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r._4 == 0L && r._5 == 0L),
           rows.mkString("; "))
  }
}
