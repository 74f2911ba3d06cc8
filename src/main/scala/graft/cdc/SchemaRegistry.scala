package graft.cdc

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType
import org.apache.spark.sql.types._

/** Offline schema-registry analog: subject → versioned Avro schema
  * history with compatibility enforcement on register, the contract
  * the reference's Kafka setup delegates to a live Confluent Schema
  * Registry (reference kafka-config/setup-kafka-topics.sh:43-69
  * registers engagement/content value schemas; the registry then
  * rejects incompatible producer evolution). No registry service
  * exists in this environment, so the CONTRACT is re-expressed as a
  * library: the same compatibility modes (BACKWARD / FORWARD / FULL /
  * their TRANSITIVE variants / NONE), decided by Avro's own
  * reader/writer resolution rules — `SchemaCompatibility` ships inside
  * Spark's Avro dependency and is the exact checker Confluent's
  * registry runs under each mode.
  *
  * Mode semantics (Confluent's definitions):
  *  - BACKWARD: a consumer on the NEW schema can read data produced
  *    with the latest registered schema (new = reader, latest =
  *    writer). Delete-field and add-field-with-default are the
  *    canonical allowed evolutions.
  *  - FORWARD: a consumer on the LATEST schema can read data produced
  *    with the new schema (latest = reader, new = writer).
  *  - FULL: both directions.
  *  - *_TRANSITIVE: the same check against EVERY registered version,
  *    not just the latest.
  *  - NONE: no check (history still recorded).
  *
  * Spark-native pipelines register [[org.apache.spark.sql.types.StructType]]s
  * directly via the [[SchemaRegistry.structToAvro]] bridge (nullable
  * field → `["null", T]` union with null default — the optional-field
  * convention AvroWire's engagement schema uses, so an evolved
  * nullable column is a legal BACKWARD evolution by construction).
  *
  * Thread-safe: registration serializes on the instance — the
  * single-writer manifest discipline SnapshotStore uses, applied to
  * the schema history.
  */
object SchemaRegistry {

  /** Compatibility mode for a subject. */
  sealed abstract class Mode(val transitive: Boolean)
  case object None_ extends Mode(false)
  case object Backward extends Mode(false)
  case object Forward extends Mode(false)
  case object Full extends Mode(false)
  case object BackwardTransitive extends Mode(true)
  case object ForwardTransitive extends Mode(true)
  case object FullTransitive extends Mode(true)

  /** One registered version. */
  final case class Registered(version: Int, schema: Schema)

  /** Human-readable incompatibilities of `reader` reading data written
    * with `writer` — empty iff compatible. Wraps Avro's resolution-rule
    * checker (field-default requirements, numeric promotions,
    * string↔bytes, union branch matching — the full spec). */
  def readerWriterIssues(reader: Schema, writer: Schema): Seq[String] = {
    val res = SchemaCompatibility
      .checkReaderWriterCompatibility(reader, writer).getResult
    if (res.getCompatibility == SchemaCompatibilityType.COMPATIBLE) Seq.empty
    else res.getIncompatibilities.asScala.toSeq.map(i =>
      s"${i.getType} at ${i.getLocation}: ${i.getMessage}")
  }

  /** Issues of registering `candidate` after `prior` under `mode`
    * (prior ordered oldest → newest). */
  def issues(mode: Mode, candidate: Schema, prior: Seq[Schema]): Seq[String] = {
    val against = if (mode.transitive) prior else prior.takeRight(1)
    against.flatMap { old =>
      val back = mode match {
        case Backward | BackwardTransitive | Full | FullTransitive =>
          readerWriterIssues(candidate, old).map(m => s"BACKWARD: $m")
        case _ => Seq.empty
      }
      val fwd = mode match {
        case Forward | ForwardTransitive | Full | FullTransitive =>
          readerWriterIssues(old, candidate).map(m => s"FORWARD: $m")
        case _ => Seq.empty
      }
      back ++ fwd
    }
  }

  /** Spark schema → Avro record schema. Nullable fields become
    * `["null", T]` unions WITH null defaults — i.e. adding a nullable
    * column is a backward-compatible evolution, matching how every
    * Spark-written optional column behaves; non-nullable fields have
    * no default, so adding one is (correctly) rejected under BACKWARD.
    * Field metadata key `"default"` is intentionally NOT consulted:
    * required-with-default is not representable in Spark DDL, and the
    * null-union convention covers the registry use case. */
  def structToAvro(st: StructType, name: String,
      namespace: String = "graft"): Schema = {
    def convert(dt: DataType, path: String): Schema = dt match {
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case TimestampType | TimestampNTZType => Schema.create(Schema.Type.LONG)
      case DateType => Schema.create(Schema.Type.INT)
      case ArrayType(el, containsNull) =>
        Schema.createArray(
          if (containsNull) nullable(convert(el, path + ".item"))
          else convert(el, path + ".item"))
      case MapType(StringType, v, valueContainsNull) =>
        Schema.createMap(
          if (valueContainsNull) nullable(convert(v, path + ".value"))
          else convert(v, path + ".value"))
      case s: StructType => structToAvro(s, path.replace('.', '_'), namespace)
      case other =>
        throw new IllegalArgumentException(
          s"no Avro wire mapping for $other at $path")
    }
    def nullable(s: Schema): Schema =
      Schema.createUnion(Schema.create(Schema.Type.NULL), s)
    val fields = st.fields.map { f =>
      val base = convert(f.dataType, s"${name}_${f.name}")
      if (f.nullable)
        new Schema.Field(f.name, nullable(base), null,
          Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, base, null)
    }
    Schema.createRecord(name, null, namespace, false, fields.toList.asJava)
  }
}

final class SchemaRegistry(
    defaultMode: SchemaRegistry.Mode = SchemaRegistry.Backward) {
  import SchemaRegistry._

  private val subjects = mutable.Map.empty[String, Vector[Registered]]
  private val modes = mutable.Map.empty[String, Mode]

  def setMode(subject: String, mode: Mode): Unit =
    synchronized { modes(subject) = mode }

  def mode(subject: String): Mode =
    synchronized { modes.getOrElse(subject, defaultMode) }

  def versions(subject: String): Vector[Registered] =
    synchronized { subjects.getOrElse(subject, Vector.empty) }

  def latest(subject: String): Option[Registered] = versions(subject).lastOption

  /** Dry-run compatibility check of `candidate` against the subject's
    * history under its mode — empty iff a register would succeed. */
  def check(subject: String, candidate: Schema): Seq[String] =
    synchronized {
      issues(mode(subject), candidate, versions(subject).map(_.schema))
    }

  /** Register a new version; `Left(issues)` if the subject's mode
    * rejects it. Re-registering the exact latest schema is idempotent
    * (returns its existing version), as in the real registry. */
  def register(subject: String, candidate: Schema): Either[Seq[String], Int] =
    synchronized {
      val hist = versions(subject)
      if (hist.lastOption.exists(_.schema == candidate))
        Right(hist.last.version)
      else {
        val bad = issues(mode(subject), candidate, hist.map(_.schema))
        if (bad.nonEmpty) Left(bad)
        else {
          val v = hist.size + 1
          subjects(subject) = hist :+ Registered(v, candidate)
          Right(v)
        }
      }
    }

  /** Register a Spark schema via the [[SchemaRegistry.structToAvro]]
    * bridge. */
  def register(subject: String, st: StructType,
      recordName: String): Either[Seq[String], Int] =
    register(subject, structToAvro(st, recordName))
}
