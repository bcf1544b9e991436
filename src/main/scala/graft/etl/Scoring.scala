package graft.etl

import J._

/** Proportional score computation (reference parity:
  * /root/reference/src/scoring.js:1-77 `computeScores`).
  *
  * Deliberately-preserved reference quirks:
  *   - `avgPos || 20` (scoring.js:60): JS falsy — an avg_pos of exactly 0
  *     (and null) both fall back to 20;
  *   - `Math.round` half-up toward +Infinity (scoring.js:44) for the
  *     one-decimal score, mirrored as floor(x + 0.5);
  *   - `Math.max(out.onsite.keywords.top100 || 1, 1)` (scoring.js:19):
  *     null/0 top100 become 1;
  *   - weights of unavailable/null components are excluded from the
  *     denominator (coverage-weighted mean, scoring.js:38-46); score is 0
  *     when nothing is available.
  */
object Scoring {

  /** JS Math.round: half-up toward +Infinity. */
  private def jsRound(x: Double): Double = math.floor(x + 0.5)

  private def clamp01(x: Double): Double = math.max(0.0, math.min(1.0, x))

  final private case class Agg(score: Double, used: Double, total: Double)

  private def aggregate(weights: Seq[(String, Double)], avail: Map[String, Boolean],
                        raw: Map[String, Option[Double]]): Agg = {
    val total = weights.map(_._2).sum
    var used = 0.0
    var acc = 0.0
    for ((k, w) <- weights)
      if (avail.getOrElse(k, false) && raw.getOrElse(k, None).isDefined) {
        used += w
        acc += w * raw(k).get
      }
    val score = if (used != 0) jsRound((acc / used) * 1000) / 10 else 0.0
    Agg(score, used, total)
  }

  /** Computes scores.json for a normalized doc; returns the insertion-ordered
    * score object (scoring.js:72-76). */
  def computeScores(out: JObj): JObj = {
    val ossW = Seq("gsc_clicks" -> 30.0, "kw_top10" -> 20.0, "site_health" -> 20.0,
      "cwv_pass" -> 15.0, "indexed_valid" -> 15.0)
    val lssW = Seq("avg_local_rank" -> 40.0, "pct_top3" -> 25.0,
      "citations" -> 15.0, "reviews" -> 10.0, "gbp_actions" -> 10.0)

    val onsite = out.obj("onsite")
    val keywords = onsite.obj("keywords")
    val cwv = onsite.obj("cwv")
    val passRate = cwv.get("pass_rate")

    val ossAvail = Map(
      "kw_top10" -> (keywords.get("top10") != JNull),
      "site_health" -> true,
      "cwv_pass" -> (passRate != missing),
      "gsc_clicks" -> false,
      "indexed_valid" -> false)

    // Raw 0..1 component scores (insertion order matters for the JSON).
    val top10 = keywords.num("top10").getOrElse(0.0)
    val top100 = math.max(keywords.num("top100").filter(_ != 0).getOrElse(1.0), 1.0)
    val kwTop10 = Some(math.min(top10 / top100, 1.0))

    val cwvPass = passRate match {
      case JNum(d) => Some(d)
      case _ => None
    }

    // Errors per page → site health, 0 once EPP >= 0.5 (scoring.js:25-33).
    val errs = onsite.obj("errors")
    val totalErr = Seq("4xx", "5xx", "redirect_chains", "canonical", "thin",
        "duplicate_titles", "orphan_pages")
      .flatMap(errs.num).filter(d => d == math.floor(d)).sum
    val pages = onsite.obj("content").num("pages_total").filter(_ != 0).getOrElse(100.0)
    val epp = totalErr / pages
    val health = clamp01(1 - epp / 0.5)

    val sRaw: Seq[(String, Option[Double])] = Seq(
      "kw_top10" -> kwTop10, "cwv_pass" -> cwvPass,
      "site_health" -> Some(health), "gsc_clicks" -> None, "indexed_valid" -> None)

    val oss = aggregate(ossW, ossAvail, sRaw.toMap)

    val local = out.obj("local")
    val rank = local.obj("rank")
    val cons = local.obj("citations").get("consistency")
    val reviews = local.obj("reviews")

    val lAvail = Map(
      "avg_local_rank" -> true,
      "pct_top3" -> (rank.get("pct_top3") != JNull),
      "citations" -> (cons != JNull && cons != missing),
      "reviews" -> (reviews.get("avg_rating") != JNull ||
                    reviews.get("count_total") != JNull),
      "gbp_actions" -> false)

    // `avgPos || 20` — the falsy-zero trap (scoring.js:60).
    val avgPos = rank.num("avg_pos").filter(_ != 0).getOrElse(20.0)
    val lsRaw: Seq[(String, Option[Double])] = Seq(
      "avg_local_rank" -> Some(clamp01(1 - (avgPos - 1) / 19)),
      "pct_top3" -> Some(rank.num("pct_top3").getOrElse(0.0)),
      "citations" -> (cons match { case JNum(d) => Some(d); case _ => None }),
      "reviews" -> reviews.num("avg_rating").map(r => clamp01((r - 3.5) / 1.5)),
      "gbp_actions" -> None)

    val lss = aggregate(lssW, lAvail, lsRaw.toMap)

    def rawObj(raw: Seq[(String, Option[Double])]): JObj = {
      val o = new JObj
      raw.foreach { case (k, v) => o.set(k, v.map(JNum).getOrElse(JNull)) }
      o
    }

    JObj(
      "oss" -> num(oss.score),
      "oss_coverage" -> num(jsRound((oss.used / oss.total) * 100) / 100),
      "oss_weight_used" -> num(oss.used),
      "oss_weight_total" -> num(oss.total),
      "lss" -> num(lss.score),
      "lss_coverage" -> num(jsRound((lss.used / lss.total) * 100) / 100),
      "lss_weight_used" -> num(lss.used),
      "lss_weight_total" -> num(lss.total),
      "components" -> JObj(
        "oss" -> JObj("raw" -> rawObj(sRaw)),
        "lss" -> JObj("raw" -> rawObj(lsRaw))))
  }
}
