package graft.tools

import java.nio.file.{Files, Paths}

/** Rewrite a recorded bench JSON artifact by min-merging donor
  * per-query timings from an isolated/filtered same-code re-run,
  * leaving a `"patched":[…]` provenance marker naming every
  * substituted entry (r12 VERDICT hygiene 1: "the bench JSON itself
  * carries no marker of WHICH entries were replaced").
  *
  * Usage: runMain graft.tools.BenchPatch <baseJson> <donorJson> <outJson>
  *
  * Both inputs are bench_last.json-shaped lines. Semantics (the same
  * two cases prior rounds applied by hand, per the standing rules):
  *   - a donor entry FASTER than the base's → substituted (noise-spike
  *     min-merge from an isolated re-run);
  *   - a donor entry the base sweep lacks → appended (filtered same-SF
  *     run for a newly registered query).
  * `"value"` is recomputed; the patched list unions with any existing
  * one; re-applying the same donor is a no-op. The merge logic is
  * `graft.Bench.patchLine`, unit-tested in BenchSpec.
  */
object BenchPatch {
  def main(args: Array[String]): Unit = {
    val Array(baseF, donorF, outF) = args.take(3)
    val base = Files.readString(Paths.get(baseF)).trim
    val donor = graft.Bench.queriesOf(Files.readString(Paths.get(donorF)).trim)
    // donor provenance rides in the artifact (r13 ADVICE): the donors
    // list names the file, and the scheme gains "+patched" in patchLine
    val out = graft.Bench.patchLine(base, donor,
      Paths.get(donorF).getFileName.toString)
    Files.writeString(Paths.get(outF), out + "\n")
    val patched = """"patched":\[([^\]]*)\]""".r
      .findFirstMatchIn(out).map(_.group(1)).getOrElse("")
    System.err.println(s"[bench-patch] patched entries: [$patched]")
  }
}
