package graft

import graft.plans.GraftExtensions

/** SQL-surface parity: every graft custom expression is reachable from
  * `spark.sql` once `GraftExtensions` is installed, and agrees with the
  * Column-API facade in [[graft.functions]].
  */
class ExtensionsSpec extends SparkSpecBase {

  private lazy val ready: Unit = GraftExtensions.register(spark)

  test("fnv1a32 is callable from SQL and matches the reference vector") {
    ready
    // FNV-1a-32("hello") = 0x4F9F2CAB
    val r = spark.sql("SELECT fnv1a32('hello') AS h").collect().head.getLong(0)
    assert(r == 0x4F9F2CABL)
  }

  test("wire_encode/wire_decode roundtrip from SQL") {
    ready
    val r = spark.sql(
      """SELECT wire_decode(wire_encode(42, CAST('payload' AS BINARY))) AS d"""
    ).selectExpr("d.schema_id", "CAST(d.payload AS STRING)").collect().head
    assert(r.getInt(0) == 42 && r.getString(1) == "payload")
  }

  test("proto wire frames carry the message-index byte") {
    ready
    val len = spark.sql(
      """SELECT length(wire_encode(7, CAST('x' AS BINARY), true)) AS l"""
    ).collect().head.getInt(0)
    // magic(1) + schema id(4) + message-index(1) + payload(1)
    assert(len == 7)
  }

  test("avro and proto record codecs roundtrip from SQL") {
    ready
    val row = spark.sql(
      """SELECT avro_record_decode(avro_record_encode(
        |         named_struct('name','Thor','real_name','Odinson',
        |                      'movies', array('Ragnarok')))) AS a,
        |       proto_record_decode(proto_record_encode(
        |         named_struct('name','Hulk','real_name','Banner',
        |                      'movies', array()))) AS p
        |""".stripMargin)
      .selectExpr("a.name", "a.movies[0]", "p.name", "size(p.movies)")
      .collect().head
    assert(row.getString(0) == "Thor" && row.getString(1) == "Ragnarok")
    assert(row.getString(2) == "Hulk" && row.getInt(3) == 0)
  }

  test("md5_long, vector_dot, word_shingles callable from SQL") {
    ready
    val row = spark.sql(
      """SELECT md5_long('abc', 8) AS m,
        |       vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       word_shingles('the quick brown fox', 2) AS s
        |""".stripMargin).collect().head
    assert(row.getLong(0) == java.lang.Long.parseLong("900150983", 16) ||
      row.getLong(0) > 0) // value checked exactly in FunctionsSpec; here: callable
    assert(row.getDouble(1) == 11.0)
    assert(row.getSeq[String](2).contains("the quick"))
  }

  test("kmv_sketch works as a SQL aggregate with dedup, bound, and sort") {
    ready
    import spark.implicits._
    // 5 distinct values, k=3: the 3 smallest distinct hashes, ascending
    Seq("a", "b", "a", "c", "d", "e", "b").toDF("s").createOrReplaceTempView("kmv_t")
    val got = spark.sql("SELECT kmv_sketch(s, 3) AS kmv FROM kmv_t")
      .collect().head.getSeq[Long](0)
    val expected = Seq("a", "b", "c", "d", "e")
      .map(s => graft.functions.Md5Long.hash(s.getBytes("UTF-8"), 15))
      .sorted.take(3)
    assert(got === expected)
  }

  test("top_k_rows works as a SQL aggregate with merge and bound") {
    ready
    import spark.implicits._
    Seq((5.0, 1L), (9.0, 2L), (9.0, 3L), (1.0, 4L), (7.0, 5L))
      .toDF("v", "id").repartition(3).createOrReplaceTempView("topk_t")
    // top-2 by v DESC, id ASC == 2 smallest (-v, id) ascending
    val got = spark.sql(
      """SELECT top_k_rows(named_struct('nv', -v, 'id', id), 2) AS t FROM topk_t""")
      .selectExpr("transform(t, x -> x.id) AS ids")
      .collect().head.getSeq[Long](0)
    assert(got === Seq(2L, 3L), s"got $got")
  }

  test("graft_bloom_agg/graft_bloom_contains: no false negatives, filters true negatives") {
    ready
    import spark.implicits._
    (1L to 1000L).toDF("k").repartition(4).createOrReplaceTempView("bloom_keys")
    spark.sql("SELECT graft_bloom_agg(k, 1000L, 16384L) AS b FROM bloom_keys WHERE k <= 100")
      .createOrReplaceTempView("bloom_bf")
    val kept = spark.sql(
      """SELECT k FROM bloom_keys
        |WHERE graft_bloom_contains((SELECT b FROM bloom_bf), k)""".stripMargin)
      .as[Long].collect().toSet
    // Every inserted key must survive (bloom has no false negatives)...
    assert((1L to 100L).forall(kept), "bloom dropped an inserted key")
    // ...and the filter must actually prune most of the 900 non-members.
    assert(kept.size < 200, s"bloom kept ${kept.size} of 1000 — not filtering")
  }

  test("SQL function registry agrees with the Column facade") {
    ready
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("alpha", "beta", "CUSTOM").toDF("k")
    val viaCol = df.select(graft.functions.fnv1a32(col("k"))).as[Long].collect()
    val viaSql = df.selectExpr("fnv1a32(k)").as[Long].collect()
    assert(viaCol.sameElements(viaSql))
    val normCol = df.select(graft.functions.unicode_normalize(col("k"), "NFKC"))
      .as[String].collect()
    val normSql = df.selectExpr("unicode_normalize(k, 'NFKC')").as[String].collect()
    assert(normCol.sameElements(normSql))
    // the round-5 kernels are SQL functions too
    val arrs = Seq(Seq(9L, 1L, 7L), Seq(2L, 2L, 2L)).toDF("xs")
    val sumSql = arrs.selectExpr("vector_sum_l(xs) AS s")
      .collect().head.getAs[scala.collection.Seq[Long]]("s")
    assert(sumSql === Seq(11L, 3L, 9L))
    val winSql = Seq(Tuple1(Seq(5L, 3L, 8L, 3L, 9L))).toDF("xs")
      .selectExpr("winnow_mins(xs, 2) AS m")
      .collect().head.getAs[scala.collection.Seq[Long]]("m")
    assert(winSql === Seq(3L))
  }

  test("NormalizeCollapse rewrites redundant chains and ONLY those") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.{unicode_normalize => un, UnicodeNormalize}
    def normCount(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      var n = 0
      plan.transformAllExpressions { case e: UnicodeNormalize => n += 1; e }
      n
    }
    // non-foldable input column: a literal would be constant-folded before
    // the rule could be observed; a+acute, fi-ligature, angstrom payload
    val df = spark.range(1).select(
      org.apache.spark.sql.functions.concat(
        col("id").cast("string"),
        org.apache.spark.sql.functions.lit("á ﬁle Å")).as("s"))
    // idempotent chain collapses to one call with the outer form
    val redundant = df.select(un(un(col("s"), "NFD"), "NFKC").as("t"))
      .queryExecution.optimizedPlan
    val collapsed = graft.plans.NormalizeCollapse(redundant)
    assert(normCount(redundant) === 2 && normCount(collapsed) === 1)
    // canonical-after-compatibility must NOT collapse (different output)
    val legit = df.select(un(un(col("s"), "NFKD"), "NFC").as("t"))
      .queryExecution.optimizedPlan
    assert(normCount(graft.plans.NormalizeCollapse(legit)) === 2)
    // runtime identities backing the rewrite, on adversarial codepoints
    val row = df.select(
      un(un(col("s"), "NFD"), "NFKC").as("chain"),
      un(col("s"), "NFKC").as("direct"),
      un(un(col("s"), "NFC"), "NFC").as("idem"),
      un(col("s"), "NFC").as("once"),
      un(un(col("s"), "NFKD"), "NFC").as("kd_then_c"))
      .collect()(0)
    assert(row.getString(0) === row.getString(1), "NFKC absorbs NFD")
    assert(row.getString(2) === row.getString(3), "NFC idempotent")
    assert(row.getString(4) !== row.getString(3),
      "NFC(NFKD(x)) differs from NFC(x) — correctly not collapsed")
  }
}
