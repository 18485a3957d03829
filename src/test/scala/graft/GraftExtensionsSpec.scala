package graft

import org.apache.spark.sql.functions._
import graft.functions.{DotF, SimHash64}
import graft.ops.Dedup

/** The SQL function registration (GraftExtensions via
  * spark.sql.extensions) must expose the native kernels to pure-SQL
  * callers with results identical to the Column API. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("kernels callable from SQL, identical to the Column API") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "spark catalyst tungsten shuffle partitions"))
      .toDF("id", "text").createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT id,
        |  simhash64(split(trim(text), '\\s+')) AS sh,
        |  minhash_sig(shingle_hashes(lower(text), 5), 64) AS sig,
        |  size(shingle_hashes(text, 8)) AS nsh
        |FROM ext_docs ORDER BY id""".stripMargin).collect()
    val viaApi = spark.table("ext_docs")
      .select($"id", Dedup.simhash($"text").as("sh"),
        Dedup.minhashSignatureFromHashes(
          graft.functions.ShingleHashes(lower($"text"), 5), 64).as("sig"),
        size(graft.functions.ShingleHashes($"text", 8)).as("nsh"))
      .orderBy("id").collect()
    viaSql.zip(viaApi).foreach { case (s, a) =>
      assert(s.getLong(1) == a.getLong(1))
      assert(s.getSeq[Long](2) == a.getSeq[Long](2))
      assert(s.getInt(3) == a.getInt(3))
    }

    val dots = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    dots.createOrReplaceTempView("ext_vecs")
    val sqlDot = spark.sql(
      "SELECT dot_f(a, b) AS d, lane_matches(array(1L,2L), array(1L,9L)) AS lm, " +
      "sorted_long_jaccard(array(1L,2L,3L), array(2L,3L,4L)) AS j, " +
      "vec_sign_bits(a, 16, 0) AS vs FROM ext_vecs").collect()(0)
    val apiDot = dots.select(DotF($"a", $"b").as("d")).collect()(0)
    assert(sqlDot.getDouble(0) == apiDot.getDouble(0))
    assert(sqlDot.getInt(1) == 1)
    assert(sqlDot.getDouble(2) == 0.5)
    assert(sqlDot.getLong(3) ==
      dots.select(graft.ops.Similarity.hyperplaneSketch($"a", 16, 0)).collect()(0).getLong(0))

    // non-literal where a literal is required -> clear error
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(text, id + 1) FROM ext_docs").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.toLowerCase.contains("shingle_hashes"))
  }

  test("enum label filters collapse to pushable code predicates") {
    import graft.core.{ArraySchema, Attr, Dim, Enumeration}
    import graft.storage.ArrayTable
    val uri = TestSession.tmpDir("enumpush")
    val schema = ArraySchema(
      dims = Seq(Dim("x", "int64")),
      attrs = Seq(Attr("color", "utf8", enumLabel = Some("colors"))),
      enums = Seq(Enumeration("colors", Seq("red", "green", "blue"))))
    ArrayTable.create(spark, uri, schema)
    ArrayTable.write(spark,
      Seq((1L, "red"), (2L, "blue"), (3L, "green"), (4L, "red")).toDF("x", "color"),
      uri, Some(100L))
    val df = ArrayTable.read(spark, uri).filter($"color" === "red")
    // the label predicate must reach the parquet scan as a CODE filter
    val scans = org.apache.spark.sql.graftshim.Shim.plannedPhysical(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val pushed = scans.map(_.metadata("PushedFilters")).mkString(";")
    assert(pushed.contains("EqualTo(color,0)"), s"no code pushdown in: $pushed")
    assert(df.select("x").as[Long].collect().toSet == Set(1L, 4L))
    // membership too
    val in = ArrayTable.read(spark, uri).filter($"color".isin("red", "blue"))
    val pushedIn = org.apache.spark.sql.graftshim.Shim.plannedPhysical(in).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.metadata("PushedFilters")).mkString(";")
    assert(pushedIn.contains("In(color"), s"no IN pushdown in: $pushedIn")
    assert(in.select("x").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // unknown label -> empty result, not an error
    assert(ArrayTable.read(spark, uri).filter($"color" === "mauve").count() == 0)

    // ordered-enum inequality (QueryCondition emit) becomes a pushable
    // integer range filter on the codes
    val ouri = TestSession.tmpDir("enumpushord")
    val oschema = ArraySchema(
      dims = Seq(Dim("x", "int64")),
      attrs = Seq(Attr("level", "utf8", enumLabel = Some("levels"))),
      enums = Seq(Enumeration("levels", Seq("LOW", "MID", "HIGH"), ordered = true)))
    ArrayTable.create(spark, ouri, oschema)
    ArrayTable.write(spark,
      Seq((1L, "LOW"), (2L, "MID"), (3L, "HIGH")).toDF("x", "level"), ouri, Some(100L))
    val ord = ArrayTable.read(spark, ouri).filter(
      graft.query.QueryCondition.compile("level <= 'MID'", Some(oschema)))
    val pushedOrd = org.apache.spark.sql.graftshim.Shim.plannedPhysical(ord).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.metadata("PushedFilters")).mkString(";")
    assert(pushedOrd.contains("LessThanOrEqual(level,1)"), s"no range pushdown in: $pushedOrd")
    assert(ord.select("x").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("text-pipeline scalars via SQL match the Column API") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    docs.createOrReplaceTempView("ext_txt")
    val viaSql = spark.sql(
      "SELECT doc_id, lang_id(text) AS l, quality_score(text) AS q, " +
        "token_count(text) AS n FROM ext_txt")
    val viaCol = docs.select($"doc_id",
      graft.ops.TextAnalysis.langId($"text").as("l"),
      graft.ops.TextAnalysis.qualityScore($"text").as("q"),
      graft.ops.TextAnalysis.tokenCount($"text").as("n"))
    assert(viaSql.exceptAll(viaCol).count() == 0 &&
      viaCol.exceptAll(viaSql).count() == 0)
    // normalization scalars: SQL surface matches the Column API and
    // the raw kernel composes a decomposed accent
    val norm = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS a, " +
        "clean_text('xy\r\nz') AS b").as[(String, String)].head()
    assert(norm == ("caf\u00E9", "xy\nz"), norm.toString)
    // markup strip + entropy via SQL match the Column API / closed form
    val extra = spark.sql(
      "SELECT strip_markup('<p>a &amp; b</p><script>x</script>') AS s, " +
        "word_entropy('a b a b') AS h").as[(String, Double)].head()
    assert(extra == (("a & b", 1.0)), extra.toString)
    // mojibake repair via SQL: "caf" + A-tilde + copyright = the
    // latin-1 view of UTF-8 e-acute; honest prose passes through
    val moji = spark.sql(
      "SELECT fix_mojibake('cafÃ©') AS a, " +
        "fix_mojibake('plain') AS b").as[(String, String)].head()
    assert(moji == (("café", "plain")), moji.toString)
    // gopher_keep: prose with stopwords keeps, word salad does not
    val keepTxt = ("the quick brown fox jumps over the lazy dog and " * 6).trim
    val gk = spark.sql(
      s"SELECT gopher_keep('$keepTxt') AS a, gopher_keep('zq zr zs') AS b")
      .as[(Boolean, Boolean)].head()
    assert(gk == ((true, false)), gk.toString)
  }

  test("SQL numeric-array coercion: decimal/int literals feed the float kernels") {
    // SQL's array(1.0, 2.0) is array<decimal> — the registration must
    // coerce it so idiomatic SQL works (found by the external-surface
    // probe: stock spark-shell users hit a type error here)
    val dot = spark.sql("SELECT dot_f(array(1.0, 2.0), array(3.0, 4.0))")
      .as[Double].head()
    assert(dot == 11.0, s"got $dot")
    val dotInt = spark.sql("SELECT dot_f(array(1, 2), array(3, 4))")
      .as[Double].head()
    assert(dotInt == 11.0)
    // float/double arrays still pass through the unchanged kernel path
    val viaCol = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(graft.functions.DotF($"a", $"b")).as[Double].head()
    assert(viaCol == 11.0)
    val bits = spark.sql("SELECT vec_sign_bits(array(1.0, -2.0, 3.0), 8, 0)")
    assert(bits.head().get(0) != null)
  }

  test("boundsOf keeps the TIGHTEST bound per dim") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThan, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.types.LongType
    val x = AttributeReference("x", LongType)()
    val b = graft.plans.ResolutionReadInline.boundsOf(Seq(
      GreaterThan(x, Literal(5L)), GreaterThan(x, Literal(10L)),
      LessThan(x, Literal(100L)), LessThanOrEqual(x, Literal(50L))), Set("x"))
    // max of lows, min of highs — `x > 5 AND x > 10` prunes with 10
    assert(b("x") == (Some(10L), Some(50L)), b.toString)
  }

  test("simhash64 via SQL matches Dedup.simhash on the docs table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.createOrReplaceTempView("ext_corpus")
    val bad = spark.sql(
      """SELECT doc_id, simhash64(split(trim(text), '\\s+')) AS s FROM ext_corpus""")
      .join(docs.select($"doc_id", Dedup.simhash($"text").as("s2")), "doc_id")
      .filter($"s" =!= $"s2").count()
    assert(bad == 0)
  }
}
