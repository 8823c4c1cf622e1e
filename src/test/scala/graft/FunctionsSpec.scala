package graft

import graft.functions.{DamerauLevenshtein, DutchStemmer, StripAccents}
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  test("OSA Damerau-Levenshtein distances") {
    assert(DamerauLevenshtein.osa("", "") == 0)
    assert(DamerauLevenshtein.osa("abc", "") == 3)
    assert(DamerauLevenshtein.osa("", "ab") == 2)
    assert(DamerauLevenshtein.osa("kitten", "sitting") == 3)
    assert(DamerauLevenshtein.osa("ab", "ba") == 1)     // transposition
    assert(DamerauLevenshtein.osa("ca", "abc") == 3)    // OSA, not true DL (=2)
    assert(DamerauLevenshtein.osa("abcd", "abcd") == 0)
  }

  test("StripAccents drops diacritics and non-ascii (NFD + ascii-ignore)") {
    assert(StripAccents.strip("café") == "cafe")
    assert(StripAccents.strip("héllo ë ï ö ü") == "hello e i o u")
    assert(StripAccents.strip("plain") == "plain")
    assert(StripAccents.strip("naïve ß") == "naive ") // ß has no NFD ascii form
  }

  test("Dutch Snowball stemmer vectors (published algorithm examples)") {
    // vectors from the public snowball vocabulary list
    val cases = Map(
      "lichamelijk" -> "licham",
      "lichamelijke" -> "licham",
      "lichamen" -> "licham",
      "lichaam" -> "licham",
      "beelden" -> "beeld",
      "gekken" -> "gek",  // en-removal then kk undouble
      "ogen" -> "ogen",   // adjusted R1 (min 3 letters) blocks the en-removal
      "bedelen" -> "bedel",
      "bed" -> "bed",
      "gemeenheden" -> "gemen", // heden→heid, heid dropped in R2, ee undoubled
      "aandeel" -> "aandel")
    cases.foreach { case (in, want) =>
      assert(DutchStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("stemText preserves token structure") {
    assert(DutchStemmer.stemText("lichamen beelden") == "licham beeld")
    assert(DutchStemmer.stemText("") == "")
  }
}
