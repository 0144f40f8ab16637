package graft

/** Merges N `BENCH_full.json`-style run artifacts into one
  * machine-readable band artifact, `BENCH_band.json` (r10 verdict item
  * 2: the three-run band lived only as prose in ARCHITECTURE.md — a
  * consumer could see the committed single run's dataset fingerprint
  * mechanically but not the run-to-run spread behind the headline
  * claim).
  *
  * Usage: `runMain graft.Band <out.json> <run1.json> <run2.json> ...`
  *
  * Per run it extracts the headline and per-section mins, the loadavg
  * window, the self-labeling counts (warm spread, suspects, errors) and
  * the vs_prev gate decision; across runs it reports `[min, max]` bands
  * over the CLEAN (≥0) values and whether every run carries the same
  * dataset fingerprint — a band mixing datasets is labeled, not
  * averaged away. Parsing reuses Bench's scanner style: the inputs are
  * Bench's own flat, regular output, and a miss degrades to -1 fields,
  * never a crash.
  */
object Band {

  /** First `"key":<number>` occurrence after `from`; -1 on miss. */
  private[graft] def scalar(json: String, key: String,
                            from: Int = 0): Double = {
    val m = ("\"" + java.util.regex.Pattern.quote(key) +
      "\":(-?[0-9][0-9.eE+-]*)").r
      .findFirstMatchIn(json.substring(from))
    m.flatMap(x => scala.util.Try(x.group(1).toDouble).toOption)
      .getOrElse(-1.0)
  }

  /** First `"key":"<string>"` occurrence; empty on miss. */
  private[graft] def str(json: String, key: String): String =
    ("\"" + java.util.regex.Pattern.quote(key) + "\":\"([^\"]*)\"").r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")

  /** Element count of the flat string array at `"key":[...]`; -1 when
    * the array is absent (distinct from 0 = present and empty). */
  private[graft] def arrCount(json: String, key: String): Int = {
    val ix = json.indexOf("\"" + key + "\":[")
    if (ix < 0) -1
    else {
      val start = json.indexOf('[', ix)
      val end = json.indexOf(']', start)
      if (end < 0) -1
      else {
        val body = json.substring(start + 1, end).trim
        if (body.isEmpty) 0 else body.count(_ == ',') + 1
      }
    }
  }

  /** One run's summary as a JSON object string. The warehouse-scoped
    * scalars are read after the `"warehouse"` key so the pipeline
    * section can never shadow them. */
  private[graft] def summarize(json: String): String = {
    val whIx = math.max(0, json.indexOf("\"warehouse\""))
    val loadS = scalar(json, "loadavg_start")
    val loadE = scalar(json, "loadavg_end")
    s"""{"value":${Bench.r2(scalar(json, "value"))},""" +
    s""""materialize_sec":${Bench.r2(scalar(json, "materialize_sec", whIx))},""" +
    s""""wh_total":${Bench.r2(scalar(json, "total", whIx))},""" +
    s""""daily_cycle_sec":${Bench.r2(scalar(json, "daily_cycle_sec", whIx))},""" +
    s""""ss_ingest_sec":${Bench.r2(scalar(json, "ss_ingest_sec", whIx))},""" +
    s""""ss_compact_sec":${Bench.r2(scalar(json, "ss_compact_sec", whIx))},""" +
    s""""loadavg":[${Bench.r2(loadS)},${Bench.r2(loadE)}],""" +
    s""""warm_spread_gt5":${scalar(json, "warm_spread_gt5").toInt},""" +
    s""""suspect":${arrCount(json, "suspect")},""" +
    s""""errors":${arrCount(json, "errors")},""" +
    s""""vs_prev":"${str(json, "vs_prev")}"}"""
  }

  /** `[min, max]` over the clean (≥0) values; `[-1,-1]` when none. */
  private[graft] def bandOf(vs: Seq[Double]): String = {
    val ok = vs.filter(_ >= 0)
    if (ok.isEmpty) "[-1,-1]"
    else s"[${Bench.r2(ok.min)},${Bench.r2(ok.max)}]"
  }

  /** The merged band artifact for N run artifacts (see class doc). */
  private[graft] def merge(runs: Seq[String]): String = {
    val sums = runs.map(summarize)
    def series(key: String, scoped: Boolean): Seq[Double] =
      runs.map { j =>
        scalar(j, key, if (scoped) math.max(0, j.indexOf("\"warehouse\""))
                       else 0)
      }
    val datasets = runs.map(Bench.parseDatasetObj)
    val consistent = datasets.nonEmpty && datasets.forall(_.isDefined) &&
      datasets.distinct.size == 1
    s"""{"metric":"band","unit":"sec","n_runs":${runs.size},""" +
    s""""runs":${sums.mkString("[", ",", "]")},""" +
    s""""band":{"value":${bandOf(series("value", scoped = false))},""" +
    s""""materialize_sec":${bandOf(series("materialize_sec", scoped = true))},""" +
    s""""wh_total":${bandOf(series("total", scoped = true))},""" +
    s""""daily_cycle_sec":${bandOf(series("daily_cycle_sec", scoped = true))},""" +
    s""""ss_ingest_sec":${bandOf(series("ss_ingest_sec", scoped = true))},""" +
    s""""ss_compact_sec":${bandOf(series("ss_compact_sec", scoped = true))}},""" +
    s""""dataset_consistent":$consistent,""" +
    s""""dataset":${datasets.headOption.flatten.getOrElse("{}")}}"""
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Band <out.json> <run1.json> [run2.json ...]")
    val runs = args.drop(1).toSeq.map { p =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8")
    }
    val out = merge(runs) + "\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      out.getBytes("UTF-8"))
    print(out)
  }
}
