package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType, DataType}

/** Output-contract lint for the ENTIRE gate surface: every
  * `SparkEntry.queries` result column must be an ATOMIC type. The
  * driver's comparator sorts result rows by all columns and hashes the
  * values — an array/map/struct column is unhashable there (the q87
  * round-11 failure: pandas `lexsort_indexer` → "unhashable type:
  * 'numpy.ndarray'"). The house rule since q23 is to serialize
  * list-shaped output to one string (`AuditKitQueries.scala` q23,
  * `TextPipelineQueries.scala` q87); this spec is the mechanical
  * enforcement — it fails the moment any gate query reintroduces a
  * nested column type.
  *
  * Schema is analysis-only (no execution), so linting at sf0.001 covers
  * the contract: output types are not size-driven. */
class GateSchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def nested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  test("every gate query's output schema is atomic-typed (scalars only)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, sf).schema.fields.collect {
        case f if nested(f.dataType) => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"gate output must be scalars-only (driver comparator sorts/hashes " +
      s"every column); serialize lists to one string as q23/q87 do: $offenders")
  }
}
