package graft

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.SchemaRegistry

/** Registry-analog compatibility semantics (the reference registers
  * its Avro value schemas with a Confluent registry —
  * kafka-config/setup-kafka-topics.sh:43-69 — whose per-mode verdicts
  * these cases replicate offline). */
class SchemaRegistrySpec extends AnyFunSuite {

  private def rec(name: String)(
      f: SchemaBuilder.FieldAssembler[Schema] => SchemaBuilder.FieldAssembler[Schema]): Schema =
    f(SchemaBuilder.record(name).namespace("t").fields()).endRecord()

  private val v1 = rec("E")(_
    .name("id").`type`().stringType().noDefault()
    .name("score").`type`().longType().noDefault())

  test("BACKWARD: deleting a field is compatible") {
    val v2 = rec("E")(_.name("id").`type`().stringType().noDefault())
    val r = new SchemaRegistry(SchemaRegistry.Backward)
    assert(r.register("e", v1) === Right(1))
    assert(r.register("e", v2) === Right(2))
  }

  test("BACKWARD: adding a field WITH a default is compatible; without, rejected") {
    val withDefault = rec("E")(_
      .name("id").`type`().stringType().noDefault()
      .name("score").`type`().longType().noDefault()
      .name("device").`type`().stringType().stringDefault("unknown"))
    val withoutDefault = rec("E")(_
      .name("id").`type`().stringType().noDefault()
      .name("score").`type`().longType().noDefault()
      .name("device").`type`().stringType().noDefault())
    val r = new SchemaRegistry(SchemaRegistry.Backward)
    assert(r.register("e", v1).isRight)
    assert(r.register("e", withDefault) === Right(2))
    val bad = new SchemaRegistry(SchemaRegistry.Backward)
    assert(bad.register("e", v1).isRight)
    val rej = bad.register("e", withoutDefault)
    assert(rej.isLeft)
    assert(rej.left.exists(_.exists(_.contains("READER_FIELD_MISSING_DEFAULT_VALUE"))))
  }

  test("BACKWARD: writer->reader numeric promotion ok (long->int rejected, int widened ok)") {
    // reader widens score long -> double: old long data promotes, fine
    val widened = rec("E")(_
      .name("id").`type`().stringType().noDefault()
      .name("score").`type`().doubleType().noDefault())
    // reader narrows score long -> int: old long data cannot demote
    val narrowed = rec("E")(_
      .name("id").`type`().stringType().noDefault()
      .name("score").`type`().intType().noDefault())
    val r = new SchemaRegistry(SchemaRegistry.Backward)
    assert(r.register("e", v1).isRight)
    assert(r.register("e", widened) === Right(2))
    val r2 = new SchemaRegistry(SchemaRegistry.Backward)
    assert(r2.register("e", v1).isRight)
    assert(r2.register("e", narrowed).isLeft)
  }

  test("FORWARD: deleting a field is rejected, adding one is compatible") {
    // FORWARD = latest (reader) must read candidate-written data:
    // candidate may ADD fields (old reader ignores them) but deleting
    // `score` starves the old reader, which has no default for it
    val added = rec("E")(_
      .name("id").`type`().stringType().noDefault()
      .name("score").`type`().longType().noDefault()
      .name("extra").`type`().stringType().noDefault())
    val deleted = rec("E")(_.name("id").`type`().stringType().noDefault())
    val r = new SchemaRegistry(SchemaRegistry.Forward)
    assert(r.register("e", v1).isRight)
    assert(r.register("e", added) === Right(2))
    val r2 = new SchemaRegistry(SchemaRegistry.Forward)
    assert(r2.register("e", v1).isRight)
    assert(r2.register("e", deleted).isLeft)
  }

  test("FULL: only default-carrying (or deleted-with-default) evolutions pass") {
    val optionalAdd = rec("E")(_
      .name("id").`type`().stringType().noDefault()
      .name("score").`type`().longType().noDefault()
      .name("device").`type`().unionOf().nullType().and().stringType()
        .endUnion().nullDefault())
    val bareAdd = rec("E")(_
      .name("id").`type`().stringType().noDefault()
      .name("score").`type`().longType().noDefault()
      .name("device").`type`().stringType().noDefault())
    val r = new SchemaRegistry(SchemaRegistry.Full)
    assert(r.register("e", v1).isRight)
    assert(r.register("e", optionalAdd) === Right(2))
    assert(r.register("e", bareAdd).isLeft)
  }

  test("BACKWARD vs BACKWARD_TRANSITIVE: latest-only vs whole-history checks") {
    // v1: score long -> v2: drops score -> v3: re-adds score as INT
    // with default 0. Against v2 (the latest) v3 is compatible — the
    // reader default covers the missing field. Against v1 it is not:
    // v1's long data would narrow to int. Plain BACKWARD checks only
    // the latest and accepts; BACKWARD_TRANSITIVE checks the whole
    // history and catches the narrowing.
    val v2 = rec("E")(_.name("id").`type`().stringType().noDefault())
    val v3 = rec("E")(_
      .name("id").`type`().stringType().noDefault()
      .name("score").`type`().intType().intDefault(0))
    val plain = new SchemaRegistry(SchemaRegistry.Backward)
    assert(plain.register("e", v1).isRight)
    assert(plain.register("e", v2).isRight)
    assert(plain.register("e", v3) === Right(3)) // only checked vs v2
    val trans = new SchemaRegistry(SchemaRegistry.BackwardTransitive)
    assert(trans.register("e", v1).isRight)
    assert(trans.register("e", v2).isRight)
    assert(trans.register("e", v3).isLeft) // v1's long data narrows — caught
  }

  test("NONE records history without checks; re-register latest is idempotent") {
    val incompatible = rec("E")(_
      .name("id").`type`().intType().noDefault())
    val r = new SchemaRegistry(SchemaRegistry.None_)
    assert(r.register("e", v1) === Right(1))
    assert(r.register("e", incompatible) === Right(2))
    assert(r.register("e", incompatible) === Right(2)) // idempotent
    assert(r.versions("e").map(_.version) === Vector(1, 2))
  }

  test("StructType bridge: nullable column evolution is BACKWARD-legal, required is not") {
    val base = StructType(Seq(
      StructField("event_id", StringType, nullable = false),
      StructField("duration_ms", LongType, nullable = true)))
    val plusNullable = base.add(StructField("device", StringType, nullable = true))
    val plusRequired = base.add(StructField("device", StringType, nullable = false))
    val r = new SchemaRegistry(SchemaRegistry.Backward)
    assert(r.register("eng", base, "Engagement").isRight)
    assert(r.register("eng", plusNullable, "Engagement") === Right(2))
    val r2 = new SchemaRegistry(SchemaRegistry.Backward)
    assert(r2.register("eng", base, "Engagement").isRight)
    assert(r2.register("eng", plusRequired, "Engagement").isLeft)
  }

  test("StructType bridge: nested struct, array and map round through; wire schema matches AvroWire conventions") {
    val st = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("w", IntegerType, nullable = true))), nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = true),
      StructField("attrs", MapType(StringType, LongType, valueContainsNull = true), nullable = true)))
    val avro = SchemaRegistry.structToAvro(st, "Doc")
    assert(avro.getType === Schema.Type.RECORD)
    assert(avro.getField("id").schema().getType === Schema.Type.STRING)
    assert(avro.getField("meta").schema().getType === Schema.Type.UNION)
    assert(avro.getField("tags").schema().getTypes.get(1).getType === Schema.Type.ARRAY)
    assert(avro.getField("attrs").schema().getTypes.get(1).getType === Schema.Type.MAP)
    // self-compatibility sanity: a schema always reads its own data
    assert(SchemaRegistry.readerWriterIssues(avro, avro).isEmpty)
  }
}
