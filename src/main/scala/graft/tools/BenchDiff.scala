package graft.tools

/** Round-over-round bench comparison that separates regression from this
  * host's documented 1.2-3× timing jitter, mechanically.
  *
  * Input: two bench records in `Bench.fullLine` format (the
  * BENCH_OUT.json written by every `graft.Bench` run — per-query
  * min-of-3 in `queries` plus the three raw samples in `samples`).
  * For each query present in both:
  *
  *  - ratio = newMin / oldMin;
  *  - a slowdown is flagged `REGRESSION?` only when ratio > 1.3 AND the
  *    new minimum exceeds the WORST sample the old record ever observed
  *    — a new-min inside the old sample envelope is by definition
  *    reachable by the old code under noise, so it proves nothing;
  *  - symmetric `improved` marks for ratio < 1/1.3 with the same
  *    envelope test against the new record's samples.
  *
  * Pure string work on a machine-written format (no JSON library in the
  * dependency footprint, and the format is regex-stable by
  * construction); runs without a SparkSession.
  *
  * Run: `sbt "runMain graft.tools.BenchDiff old.json new.json"`.
  */
object BenchDiff {

  final case class Rec(mins: Map[String, Double],
                       samples: Map[String, Seq[Double]],
                       total: Double, noise: Double)

  private val SamplesRe =
    """"(q[0-9][a-z0-9_]*)":\[([0-9.eE+\-]+(?:,[0-9.eE+\-]+)*)\]""".r
  private val FieldRe = (name: String) =>
    ("\"" + name + "\":([0-9.eE+\\-]+)").r

  def parse(text: String): Rec = {
    // the samples map is the only place arrays appear; every scalar
    // "qNN_name":min pair outside it belongs to the queries map
    val samples = SamplesRe.findAllMatchIn(text).map { m =>
      m.group(1) -> m.group(2).split(',').toSeq.map(_.toDouble)
    }.toMap
    val noArrays = SamplesRe.replaceAllIn(text, "")
    val mins = """"(q[0-9][a-z0-9_]*)":([0-9.eE+\-]+)""".r
      .findAllMatchIn(noArrays).map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
    def field(n: String): Double =
      FieldRe(n).findFirstMatchIn(noArrays).map(_.group(1).toDouble)
        .getOrElse(Double.NaN)
    Rec(mins, samples, field("value"), field("noise_ratio"))
  }

  /** (query, oldMin, newMin, ratio, verdict) for every shared query whose
    * ratio leaves the [1/1.3, 1.3] band; verdict is "REGRESSION?" /
    * "improved" when the envelope test confirms, "jitter" when the old
    * (resp. new) samples already cover the new (resp. old) minimum.
    */
  def movers(old: Rec, neu: Rec): Seq[(String, Double, Double, Double, String)] =
    (old.mins.keySet & neu.mins.keySet).toSeq.sorted.flatMap { q =>
      val (o, n) = (old.mins(q), neu.mins(q))
      if (o <= 0 || n <= 0) None // failure markers: not comparable
      else {
        val r = n / o
        if (r > 1.3) {
          val envelope = old.samples.getOrElse(q, Seq(o)).max
          Some((q, o, n, r, if (n > envelope) "REGRESSION?" else "jitter"))
        } else if (r < 1.0 / 1.3) {
          val envelope = neu.samples.getOrElse(q, Seq(n)).max
          Some((q, o, n, r, if (o > envelope) "improved" else "jitter"))
        } else None
      }
    }.sortBy(-_._4)

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BenchDiff <old.json> <new.json>")
    def read(p: String) =
      parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8"))
    val (old, neu) = (read(args(0)), read(args(1)))
    println(f"old: total=${old.total}%.1fs noise_ratio=${old.noise}%.2f " +
      f"queries=${old.mins.size}")
    println(f"new: total=${neu.total}%.1fs noise_ratio=${neu.noise}%.2f " +
      f"queries=${neu.mins.size}")
    val added = (neu.mins.keySet -- old.mins.keySet).toSeq.sorted
    val dropped = (old.mins.keySet -- neu.mins.keySet).toSeq.sorted
    if (added.nonEmpty) println(s"added: ${added.mkString(", ")}")
    if (dropped.nonEmpty) println(s"dropped: ${dropped.mkString(", ")}")
    val m = movers(old, neu)
    if (m.isEmpty) println("movers >1.3x: none")
    else m.foreach { case (q, o, n, r, v) =>
      println(f"$q%-28s $o%8.3fs -> $n%8.3fs  ${r}%5.2fx  $v")
    }
  }
}
