package graft.queries

import graft.{SparkSpec, SparkEntry}

/** The q92 gate pins values against the DuckDB oracle on driver data; this
  * spec pins the claim that makes the query safe at cluster scale: the
  * per-label centroid is accumulated in FIXED-POINT int64, so its value —
  * and every downstream cosine and outlier verdict — is independent of
  * partition layout and therefore of scan/aggregation order. The fixture
  * is engineered for catastrophic cancellation (±2²² magnitudes against
  * sub-unit residuals): a naive double sum over different partition orders
  * diverges in the low bits with high probability, while the fixed-point
  * path must produce byte-identical output from a 1-file layout and an
  * 8-file layout of the same rows. */
class SemanticOutlierSpec extends SparkSpec {

  test("fixed-point centroid: identical output across partition layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 8
    val base = (1 << 22).toFloat
    val rows = (0 until 96).map { i =>
      val v = Array.tabulate(dim) { j =>
        i % 3 match {
          case 0 => base + j
          case 1 => -base + j
          case _ => rnd.nextFloat() - 0.5f
        }
      }
      (i.toLong, v, i % 2)
    }

    def writeCorpus(parts: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"q92spec$parts").toString
      val df = rows.toDF("vec_id", "embedding", "label")
      (if (parts == 1) df.coalesce(1) else df.repartition(parts))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }

    def run(dir: String): Seq[(Long, Int, Double, Boolean)] =
      SparkEntry.queries("q92_semantic_outliers")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
        .toSeq

    val one = run(writeCorpus(1))
    val eight = run(writeCorpus(8))
    assert(one.size == 96)
    assert(one == eight,
      "fixed-point centroid must make q92 independent of partition layout")
    // The fixture actually exercises both verdict branches.
    assert(one.exists(_._4) && one.exists(!_._4),
      "fixture must produce both outliers and non-outliers")
  }
}
