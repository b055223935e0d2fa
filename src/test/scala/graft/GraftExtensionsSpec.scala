package graft

import org.apache.spark.sql.SparkSession

import graft.model.{EventModel, ProtoDescriptors}

/** SQL registration of the custom expressions (SparkSessionExtensions):
  * pure-SQL users get the same surface as the Column API.
  */
class GraftExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private lazy val spark: SparkSession = {
    // extensions only apply at session CREATION — force a fresh session
    // (the SparkContext is still reused) since suites share one JVM
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("GraftExtensionsSpec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
  }

  test("scalar functions evaluate from SQL and match the Column API") {
    val shingles = spark.sql(
      "SELECT graft_word_shingles('a b c d', 2) AS s").collect().head.getSeq[String](0)
    assert(shingles == Seq("a b", "b c", "c d"))

    val h = spark.sql("SELECT graft_token_hash('hello') AS h").collect().head.getLong(0)
    assert(h == graft.functions.TextExpressions.portableHash64("hello"))

    val dot = spark.sql(
      "SELECT graft_vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect().head.getDouble(0)
    assert(dot == 11.0)

    assert(spark.sql("SELECT graft_array_agree_count(array(1L,2L,3L), array(1L,9L,3L)) AS c")
      .collect().head.getInt(0) == 2)

    // the preClean pair: normalization + mojibake repair from pure SQL
    assert(spark.sql("SELECT graft_normalize('wé', 'NFC') AS t")
      .collect().head.getString(0) == "wé")
    assert(spark.sql("SELECT graft_fix_mojibake('itâ€™s') AS t")
      .collect().head.getString(0) == "it’s")
    assert(spark.sql("SELECT graft_fix_mojibake('costs 20€') AS t")
      .collect().head.getString(0) == "costs 20€")
    intercept[Exception] { // bad form name fails at plan time, loudly
      spark.sql("SELECT graft_normalize('x', 'NOT_A_FORM')").collect()
    }

    // HTML extraction from pure SQL (script dropped, entity decoded,
    // block tag to newline)
    assert(spark.sql(
      "SELECT graft_html_text('<p>a &amp; b</p><script>x<y</script><p>c</p>') AS t")
      .collect().head.getString(0) == "a & b\nc")
  }

  test("wire + proto decode compose in pure SQL") {
    import spark.implicits._
    val header = ProtoDescriptors.header.encode(Seq(
      "app_sql", "1", "x", "u", "c", "h", "", "YARN", "EXECUTOR", "",
      Seq("YARN_APPLICATION"), "", "", "", 0, ""))
    val body = ProtoDescriptors.fsEvent.encode(Seq(
      "/a", "", "RENAME", "hdfs://x", 9L, "u", "SUCCESS"))
    Seq(EventModel.encode(EventModel.Frame(1, 1700000000001L, header, body)))
      .toDF("value").createOrReplaceTempView("wire")
    val row = spark.sql(
      """SELECT graft_frame_marker(value) AS marker,
        |  graft_proto_decode(graft_frame_header(value), 'HEADER').application_id AS app,
        |  graft_proto_decode(graft_frame_body(value), 'FS_EVENT').action AS action,
        |  graft_proto_decode(graft_frame_body(value), 'FS_EVENT').status AS status
        |FROM wire""".stripMargin).collect().head
    assert(row.getInt(0) == 1)
    assert(row.getString(1) == "app_sql")
    assert(row.getString(2) == "RENAME")
    assert(row.getString(3) == "SUCCESS")
  }

  test("vec_cosine and topk_by work from SQL (zero-norm guard included)") {
    import spark.implicits._
    val cos = spark.sql(
      "SELECT graft_vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect().head.getDouble(0)
    assert(cos == 1.0)
    // the zero-norm guard: 0.0, never NaN
    val zero = spark.sql(
      "SELECT graft_vec_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS c").collect().head.getDouble(0)
    assert(zero == 0.0 && !zero.isNaN)
    Seq(("g", 0.5, 1L), ("g", 0.9, 2L), ("g", 0.9, 3L), ("g", 0.1, 4L))
      .toDF("grp", "score", "id").createOrReplaceTempView("scored")
    val top = spark.sql(
      """SELECT e.id, e.score
        |FROM (SELECT graft_topk_by(score, id, 2) AS top FROM scored GROUP BY grp)
        |LATERAL VIEW explode(top) t AS e""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    // (score desc, id asc): the 0.9 tie breaks to id 2 then 3
    assert(top == List((2L, 0.9), (3L, 0.9)))
  }

  test("signature aggregates work from SQL") {
    import spark.implicits._
    Seq(("d1", "x"), ("d1", "y"), ("d2", "x")).toDF("id", "tok")
      .createOrReplaceTempView("toks")
    val sigs = spark.sql(
      """SELECT id, graft_minhash(xxhash64(tok), 8) AS sig,
        |  graft_simhash(graft_token_hash(tok)) AS sh
        |FROM toks GROUP BY id ORDER BY id""".stripMargin).collect()
    assert(sigs.length == 2)
    assert(sigs.head.getSeq[Long](1).length == 8)
    // d1 and d2 share token x: identical single-token simhash for d2
    assert(sigs(1).getLong(2) != 0L)
  }
}
