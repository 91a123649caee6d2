package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Arbitrary}
import org.scalacheck.rng.Seed

/** Property tests for the meta invariants the reference enforces
  * imperatively (meta.py:161-176 partition reordering, :238-298 surgery):
  * under random surgery sequences, partitions always sort last, data
  * schema excludes partition columns, and round-trips are stable. */
class MetaPropertiesSpec extends AnyFunSuite {

  private val genColName: Gen[String] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ '_')).map(_.mkString))
      .suchThat(s => s.nonEmpty && s.exists(_.isLetter))

  private val genType: Gen[String] = Gen.oneOf(
    "character", "int", "long", "double", "date", "datetime", "boolean",
    "decimal(18,2)", "array<int>", "struct<num:int,desc:character>")

  private val genTable: Gen[TableMeta] = for {
    n <- Gen.choose(1, 8)
    names <- Gen.listOfN(n, genColName).map(_.distinct).suchThat(_.nonEmpty)
    types <- Gen.listOfN(names.size, genType)
    nParts <- Gen.choose(0, math.min(2, names.size - 1))
  } yield {
    val cols = names.zip(types).map { case (nm, t) => ColumnMeta(nm, t) }
    val base = TableMeta("t", "t/", cols, dataFormat = "parquet")
    if (nParts == 0) base else base.withPartitions(names.takeRight(nParts))
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  test("partitions always sort last after withPartitions") {
    samples(genTable, 200).foreach { t =>
      t.validated
      val names = t.columnNames
      assert(names.takeRight(t.partitions.size) == t.partitions)
      assert(t.dataSchema.fieldNames.toSeq == names.dropRight(t.partitions.size))
    }
  }

  test("addColumn preserves the partition-last invariant") {
    samples(genTable, 200).zipWithIndex.foreach { case (t, i) =>
      val added = t.addColumn(ColumnMeta(s"zz_new_$i", "int"))
      added.validated
      assert(added.columnNames.takeRight(added.partitions.size) == added.partitions)
      assert(added.columnNames.contains(s"zz_new_$i"))
    }
  }

  test("removeColumn of a partition column keeps meta consistent") {
    samples(genTable, 200).filter(_.partitions.nonEmpty).foreach { t =>
      val removed = t.removeColumn(t.partitions.head)
      removed.validated
      assert(!removed.columnNames.contains(t.partitions.head))
      assert(!removed.partitions.contains(t.partitions.head))
    }
  }

  test("JSON round-trip is identity on the semantic content") {
    samples(genTable, 200).foreach { t =>
      val back = MetaJson.tableFromJson(MetaJson.tableToJson(t))
      assert(back.columnNames == t.columnNames)
      assert(back.columns.map(_.typeName) == t.columns.map(_.typeName))
      assert(back.partitions == t.partitions)
    }
  }

  test("fullSchema/dataSchema/partitionSchema partition the columns") {
    samples(genTable, 200).foreach { t =>
      assert(t.dataSchema.size + t.partitionSchema.size == t.fullSchema.size)
      assert(t.fullSchema.fieldNames.toSeq ==
        t.dataSchema.fieldNames.toSeq ++ t.partitionSchema.fieldNames.toSeq)
    }
  }
}
