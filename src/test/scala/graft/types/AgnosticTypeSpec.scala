package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Accept/reject table ported from the reference's authoritative type-grammar
  * test (`tests/test_column_types.py:52-77`), plus round-trip properties. */
class AgnosticTypeSpec extends AnyFunSuite {

  val accepted = Seq(
    "character", "int", "long", "float", "double", "decimal(38,0)",
    "date", "datetime", "binary", "boolean",
    "struct<num:int>", "array<int>", "array<array<int>>",
    "struct<num:int,newnum:int>", "struct<num:int,arr:array<int>>",
    "array<struct<num:int,desc:character>>",
    "struct<num:int,desc:character>", "array<decimal(38,0)>",
    "struct<arr:array<int>>",
  )

  val rejected = Seq(
    "struct", "array", "array()", "array<>", "struct<>", "int8",
    // full-match divergence: the reference's prefix-anchored regex.match
    // accepts these (utils.py:165-166); we reject them (SURVEY.md §1.2).
    "intx", "character extra", "array<int>x",
    "struct<1num:int>", // field names are [a-zA-Z_]+ only
    "decimal", "decimal(38)", "string", // 'string' only valid inside glue, not agnostic
  )

  test("accepts every reference-accepted type") {
    accepted.foreach { t => assert(AgnosticType.isValid(t), s"should accept $t") }
  }

  test("rejects invalid types") {
    rejected.foreach { t => assert(!AgnosticType.isValid(t), s"should reject $t") }
  }

  test("parses to the reference spark mapping (glue_spark_dict.json, struct->StructType divergence)") {
    assert(AgnosticType.parse("character") == StringType)
    assert(AgnosticType.parse("int") == IntegerType)
    assert(AgnosticType.parse("long") == LongType)
    assert(AgnosticType.parse("float") == FloatType)
    assert(AgnosticType.parse("double") == DoubleType)
    assert(AgnosticType.parse("date") == DateType)
    assert(AgnosticType.parse("datetime") == TimestampType)
    assert(AgnosticType.parse("binary") == BinaryType)
    assert(AgnosticType.parse("boolean") == BooleanType)
    assert(AgnosticType.parse("decimal(38,0)") == DecimalType(38, 0))
    assert(AgnosticType.parse("array<struct<num:int,desc:character>>") ==
      ArrayType(StructType(Seq(
        StructField("num", IntegerType), StructField("desc", StringType)))))
    assert(AgnosticType.parse("struct<arr:array<int>>") ==
      StructType(Seq(StructField("arr", ArrayType(IntegerType)))))
  }

  test("glue conversion matches meta.py:300-330 substitution semantics") {
    assert(AgnosticType.toGlue("character") == "string")
    assert(AgnosticType.toGlue("long") == "bigint")
    assert(AgnosticType.toGlue("datetime") == "timestamp")
    assert(AgnosticType.toGlue("decimal(38,0)") == "decimal(38,0)")
    assert(AgnosticType.toGlue("array<character>") == "array<string>")
    assert(AgnosticType.toGlue("struct<num:int,desc:character>") ==
      "struct<num:int,desc:string>")
    assert(AgnosticType.fromGlue("string") == "character")
    assert(AgnosticType.fromGlue("bigint") == "long")
    assert(AgnosticType.fromGlue("integer") == "int")
    assert(AgnosticType.fromGlue("struct<num:integer,desc:string>") ==
      "struct<num:int,desc:character>")
  }

  test("trimComplexType matches utils.py:188-196") {
    assert(AgnosticType.trimComplexType("decimal(38,0)") == "decimal")
    assert(AgnosticType.trimComplexType("array<int>") == "array")
    assert(AgnosticType.trimComplexType("struct<num:int>") == "struct")
    assert(AgnosticType.trimComplexType("character") == "character")
  }

  // --- property: parse . print == identity on random nested types ---
  private val genPrimitive: Gen[String] = Gen.oneOf(
    "character", "int", "long", "float", "double", "date", "datetime",
    "boolean", "binary", "decimal(18,2)", "decimal(38,0)")

  private def genType(depth: Int): Gen[String] =
    if (depth <= 0) genPrimitive
    else Gen.frequency(
      4 -> genPrimitive,
      1 -> genType(depth - 1).map(t => s"array<$t>"),
      1 -> (for {
        n <- Gen.choose(1, 3)
        names <- Gen.listOfN(n, Gen.identifier.map(_.filter(_.isLetter)).suchThat(_.nonEmpty))
        ts <- Gen.listOfN(n, genType(depth - 1))
      } yield names.distinct.zip(ts)
        .map { case (nm, t) => s"$nm:$t" }.mkString("struct<", ",", ">"))
        .suchThat(s => !s.contains("struct<>")),
    )

  test("round-trip parse∘print = id (ScalaCheck)") {
    val gen = genType(3)
    (0 until 200).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach { t =>
        assert(AgnosticType.print(AgnosticType.parse(t)) == t, s"round-trip $t")
      }
    }
  }
}
