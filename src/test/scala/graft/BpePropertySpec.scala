package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for the BPE trainer/encoder (pure JVM — no Spark
  * session needed): for arbitrary corpora and merge budgets,
  *  1. encoding round-trips — the subwords of a word concatenate back to
  *     the word plus the end-of-word marker;
  *  2. every emitted subword is either a raw symbol or the concatenation
  *     produced by some learned merge (closure vocabulary);
  *  3. encoding a word that appeared in training with enough merges to
  *     saturate collapses to a single token;
  *  4. training is deterministic across identical inputs.
  */
class BpePropertySpec extends AnyFunSuite {
  import graft.llm.Bpe

  private val rnd = new scala.util.Random(20260813L)
  private def randWord(): String =
    (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString

  test("round-trip, closure vocabulary, and determinism on random corpora") {
    for (_ <- 0 until 25) {
      val dict = (0 until (2 + rnd.nextInt(20)))
        .map(_ => randWord() -> (1L + rnd.nextInt(50)))
        .groupBy(_._1).map { case (w, ws) => w -> ws.map(_._2).sum }.toSeq
      val nm = rnd.nextInt(30)
      val m = Bpe.trainFromDict(dict, nm)
      assert(m.merges.size <= nm)
      // closure vocabulary: single chars, char+EOW, and merge outputs
      val vocab = scala.collection.mutable.Set.empty[String]
      ('a' to 'f').foreach { c => vocab += c.toString; vocab += (c.toString + Bpe.EOW) }
      m.merges.foreach { case (a, b) => vocab += (a + b) }
      val probes = dict.map(_._1) ++ (0 until 5).map(_ => randWord())
      probes.foreach { w =>
        val sub = Bpe.encodeWord(w, m)
        assert(sub.mkString("") == w + Bpe.EOW, s"round-trip failed for '$w'")
        sub.foreach(s => assert(vocab.contains(s), s"'$s' outside closure vocab"))
      }
      // determinism
      val m2 = Bpe.trainFromDict(dict, nm)
      assert(m2.merges == m.merges)
    }
  }

  test("a trained word saturates to one token given enough merges") {
    val dict = Seq("abcdef" -> 10L, "abc" -> 5L)
    // worst case needs |chars|-1 merges per word
    val m = Bpe.trainFromDict(dict, numMerges = 20)
    assert(Bpe.encodeWord("abcdef", m).length == 1)
    assert(Bpe.encodeWord("abc", m).length == 1)
  }
}
