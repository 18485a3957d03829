package graft

import graft.storage.ArrayTable
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Write→read round-trip property over the fragment format with the
  * type-system edges the reference's hypothesis suite exercises
  * (reference: tiledb/tests/test_hypothesis.py — arbitrary binary
  * round-trips; datatype matrix of test_libtiledb.py): unicode and
  * empty strings, negative and extreme numerics, nulls, binary blobs,
  * timestamps, booleans, and multi-value (array) cells. */
class RoundTripProperties extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("i", IntegerType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = true),
  ))

  private val genStr = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
    Gen.oneOf("héllo wörld", "日本語テキスト", "emoji 🎉 test", "tab\tnewline\n"))
  private val genRowParts = for {
    s <- Gen.option(genStr)
    d <- Gen.option(Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.oneOf(0.0, -0.0, 1e-300, Double.MaxValue)))
    i <- Gen.option(Gen.choose(Int.MinValue, Int.MaxValue))
    b <- Gen.option(Gen.oneOf(true, false))
    bin <- Gen.option(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    tsv <- Gen.option(Gen.choose(0L, 4102444800000L)) // epoch ms up to 2100
    vec <- Gen.option(Gen.listOfN(4, Gen.choose(-100f, 100f)).map(_.toArray))
  } yield (s, d, i, b, bin, tsv.map(new java.sql.Timestamp(_)), vec)

  private def canon(r: Row): Seq[Any] = (0 until r.length).map { i =>
    r.get(i) match {
      case a: Array[_] => a.toSeq
      case a: Seq[_] => a.toSeq
      case x => x
    }
  }

  test("arbitrary typed rows round-trip exactly through the fragment format") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(genRowParts)) { parts =>
      val rows = parts.zipWithIndex.map { case ((s, d, i, b, bin, ts, vec), k) =>
        Row(k.toLong, s.orNull, d.map(Double.box).orNull, i.map(Int.box).orNull,
          b.map(Boolean.box).orNull, bin.orNull, ts.orNull, vec.orNull)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val uri = TestSession.tmpDir("rtp")
      ArrayTable.ingest(spark, df, uri, Seq("k"), tsOpt = Some(1L), overwrite = true)
      val back = ArrayTable.read(spark, uri).collect()
      val got = back.map(canon).sortBy(_.head.asInstanceOf[Long].toString)
      val want = rows.map(canon).sortBy(_.head.asInstanceOf[Long].toString)
      graft.storage.VFS(spark).delete(uri)
      got.toSeq == want.toSeq
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
