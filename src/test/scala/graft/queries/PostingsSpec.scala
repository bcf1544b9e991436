package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** The q87 gate pins the inverted index against the DuckDB oracle on
  * driver data; this spec pins it against a BRUTE-FORCE index built in
  * plain Scala on a fixture with known term statistics — every ranking
  * rule (df desc, cf desc, term asc) and every posting field
  * (doc:first_pos:tf in doc_id order) is recomputed independently and
  * must match exactly. */
class PostingsSpec extends SparkSpec {

  test("q87 equals a brute-force inverted index on the engineered corpus") {
    val dir = java.nio.file.Files.createTempDirectory("q87spec").toString
    import spark.implicits._
    // Engineered stats: "alpha" in every doc (df ties broken by cf),
    // "beta" repeated within docs (cf > df), singleton tail terms.
    val docs = Seq(
      (0L, "alpha beta beta gamma"),
      (1L, "alpha beta delta delta delta"),
      (2L, "alpha gamma gamma"),
      (3L, "alpha epsilon beta beta beta"))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q87_postings")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4).split('|').toList))
      .toList

    // Brute force: token positions are 1-based, postings in doc_id order.
    val perDoc = docs.flatMap { case (id, text) =>
      text.split("\\s+").zipWithIndex.map { case (t, i) => (t, id, i + 1L) }
    }.groupBy { case (t, id, _) => (t, id) }
      .map { case ((t, id), occ) => (t, id, occ.size.toLong, occ.map(_._3).min) }
      .toSeq
    val stats = perDoc.groupBy(_._1).map { case (t, ps) =>
      (t, ps.size.toLong, ps.map(_._3).sum)
    }.toSeq
    val want = stats
      .sortBy { case (t, df, cf) => (-df, -cf, t) }
      .zipWithIndex
      .map { case ((t, df, cf), i) =>
        val posts = perDoc.filter(_._1 == t).sortBy(_._2)
          .map { case (_, id, tf, fp) => s"$id:$fp:$tf" }.toList
        (i + 1, t, df, cf, posts)
      }
      .take(20).toList

    assert(want.head._2 == "alpha" && want.head._3 == 4L,
      "fixture must rank the everywhere-term first")
    assert(got == want,
      s"inverted index must equal brute force:\n got $got\n want $want")
  }
}
