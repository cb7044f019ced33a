package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property-check helper (the scalatestplus bridge isn't in the
  * offline artifact cache): deterministic seeded sampling of a Gen. */
trait PropHelper {
  def forAllSampled[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    var tries = 0
    while (i < n && tries < n * 10) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try f(a) catch {
            case e: Throwable =>
              throw new AssertionError(s"property failed for sample #$i: $a", e)
          }
          i += 1
        case None =>
      }
      seed = seed.next
      tries += 1
    }
    assert(i > 0, "generator produced no samples")
  }
}
