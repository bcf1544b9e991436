package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Mathematical-contract pins for the q154-q156 curation-audit family.
  * Run at sf0.01 (the driver's gate tier). */
class CurationFamilySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q154: calibration bins are proper probabilities with gap = mean_p - obs_rate") {
    val rows = TextPipelineQueries.queries("q154_score_calibration")(spark, sf)
      .select(col("bin"), col("n"), col("pos"), col("mean_p"),
        col("obs_rate"), col("gap")).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "positives bounded by bin size")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "mean_p in [0,1]")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, "obs_rate in [0,1]")
      assert(math.abs(r.getDouble(5) - (r.getDouble(3) - r.getDouble(4))) < 2e-6,
        "gap is the bin's mean_p - obs_rate")
    }
    // min-max normalization pins the extremes: some doc sits in bin 0
    // and some in bin 9
    val bins = rows.map(_.getInt(0)).toSet
    assert(bins.contains(0) && bins.contains(9), "extreme bins populated")
    // mean_p must ramp with the bin index (value-binned by p itself)
    val byBin = rows.sortBy(_.getInt(0)).map(_.getDouble(3))
    assert(byBin.zip(byBin.tail).forall { case (a, b) => a < b },
      "mean_p strictly increases across bins")
  }

  test("q155: drift is antisymmetric in the halves and floor-bounded") {
    val rows = TextPipelineQueries.queries("q155_idf_drift")(spark, sf)
      .select(col("term"), col("df_a"), col("df_b"), col("drift")).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    rows.foreach { r =>
      assert(r.getLong(1) >= 5 && r.getLong(2) >= 5, "min-df floor both halves")
    }
    val drifts = rows.map(r => math.abs(r.getDouble(3)))
    assert(drifts.zip(drifts.tail).forall { case (a, b) => a >= b },
      "top-15 is |drift|-descending")
  }

  test("q156: quintile codes partition users into 1..5 and the census sums up") {
    val rows = RelationalQueries.queries("q156_user_rfm")(spark, sf)
      .select(col("r_q"), col("f_q"), col("m_q"), col("n_users")).collect()
    assert(rows.nonEmpty && rows.length <= 125)
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(q =>
        assert(q >= 1 && q <= 5, "quintile code in 1..5"))
      assert(r.getLong(3) >= 1)
    }
    val nUsers = rows.map(_.getLong(3)).sum
    val distinctUsers = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(nUsers == distinctUsers, "census covers every user exactly once")
  }
}
