package graft

import graft.rspn._
import org.scalatest.funsuite.AnyFunSuite

/** S4: save → reload in a fresh object → identical estimates (the model
  * store is only correct if inference over the reloaded tree is
  * bit-identical, since the tree is deterministic given the seed).
  */
class PersistenceSpec extends AnyFunSuite {
  import TestSpark._

  test("ensemble save/load round-trips estimates bit-identically") {
    val ens = Ensemble.get(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-models-spec").toString
    Store.save(dir, ens)
    val reloaded = Store.load(dir)

    assert(reloaded.keySet == ens.keySet)
    val preds = Map(
      ("lineitem", "l_quantity") -> (NumRange(5.0, 30.0): ColRange))
    val a = Ensemble.estCount(ens, Set("lineitem"), preds)
    val b = Ensemble.estCount(reloaded, Set("lineitem"), preds)
    assert(a == b, s"$a != $b after reload")

    // factored multi-SPN path also reproduces exactly from disk
    val fa = Ensemble.estCount(ens, Set("customer", "orders", "lineitem"), Map.empty)
    val fb = Ensemble.estCount(reloaded, Set("customer", "orders", "lineitem"), Map.empty)
    assert(fa == fb, s"$fa != $fb after reload")

    // reloaded models carry the full metadata surface
    val spn = reloaded("orders_lineitem")
    assert(spn.tables == Set("orders", "lineitem"))
    assert(spn.nnCol.contains("lineitem") && spn.multCol.contains("lineitem"))
  }

  test("load rejects a non-model file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-models-bad")
    java.nio.file.Files.write(dir.resolve("junk.spn"), Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    assertThrows[Exception](Store.load(dir.toString))
  }
}
