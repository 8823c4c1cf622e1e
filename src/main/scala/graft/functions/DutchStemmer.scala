package graft.functions

/** Snowball Dutch stemmer — an independent implementation of the published
  * algorithm (snowballstem.org/algorithms/dutch/stemmer.html), which is
  * what the reference applies through NLTK's SnowballStemmer("dutch")
  * (reference: Notebook_Diagnosis_Extraction.ipynb cells 16-17).
  */
object DutchStemmer {

  private val vowels = "aeiouyè" // a e i o u y è

  private def isVowel(c: Char): Boolean = vowels.indexOf(c) >= 0

  /** Stem every whitespace-separated token, preserving single spaces —
    * the shape of the reference's stemmingText (src/NLP_functions.py:89-104).
    */
  def stemText(s: String): String = {
    val parts = s.split(" ", -1)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < parts.length) {
      if (i > 0) sb.append(' ')
      sb.append(stem(parts(i)))
      i += 1
    }
    sb.toString
  }

  def stem(wordIn: String): String = {
    if (wordIn.isEmpty) return wordIn
    var w = wordIn.toLowerCase
    // Remove umlauts / acute accents over a e i o u
    w = w.map {
      case 'ä' | 'á' => 'a'
      case 'ë' | 'é' => 'e'
      case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'
      case 'ü' | 'ú' => 'u'
      case c => c
    }
    // Mark y/i treated as consonants: initial y, y after vowel, i between vowels
    val chars = w.toCharArray
    var i = 0
    while (i < chars.length) {
      val c = chars(i)
      if (c == 'y' && (i == 0 || isVowel(chars(i - 1)))) chars(i) = 'Y'
      else if (c == 'i' && i > 0 && i + 1 < chars.length &&
               isVowel(chars(i - 1)) && isVowel(chars(i + 1))) chars(i) = 'I'
      i += 1
    }
    w = new String(chars)

    def regions(word: String): (Int, Int) = {
      // R1: after the first non-vowel following a vowel; R2 likewise in R1.
      def regionAfter(from: Int): Int = {
        var k = from
        while (k < word.length && !isVowel(word.charAt(k))) k += 1 // to first vowel
        while (k < word.length && isVowel(word.charAt(k))) k += 1  // through vowels
        if (k < word.length) k + 1 else word.length
      }
      var r1 = regionAfter(0)
      // R1 adjusted so at least 3 letters precede it
      if (r1 < 3) r1 = math.min(3, word.length)
      val r2 = regionAfter(r1)
      (r1, r2)
    }

    def undouble(word: String): String =
      if (word.endsWith("kk") || word.endsWith("dd") || word.endsWith("tt"))
        word.substring(0, word.length - 1)
      else word

    var word = w
    var eRemoved = false

    // Step 1
    {
      val (r1, _) = regions(word)
      if (word.endsWith("heden")) {
        if (word.length - 5 >= r1)
          word = word.substring(0, word.length - 5) + "heid"
      } else if (word.endsWith("ene") || word.endsWith("en")) {
        val suf = if (word.endsWith("ene")) 3 else 2
        val stemEnd = word.length - suf
        // valid en-ending: preceded by a non-vowel, and not preceded by gem
        if (stemEnd >= r1 && stemEnd > 0 && !isVowel(word.charAt(stemEnd - 1)) &&
            !(stemEnd >= 3 && word.substring(stemEnd - 3, stemEnd) == "gem")) {
          word = undouble(word.substring(0, stemEnd))
        }
      } else if (word.endsWith("se") || word.endsWith("s")) {
        val suf = if (word.endsWith("se")) 2 else 1
        val stemEnd = word.length - suf
        // valid s-ending: preceded by a non-vowel other than j
        if (stemEnd >= r1 && stemEnd > 0 && !isVowel(word.charAt(stemEnd - 1)) &&
            word.charAt(stemEnd - 1) != 'j') {
          word = word.substring(0, stemEnd)
        }
      }
    }

    // Step 2: delete suffix e if in R1 and preceded by a non-vowel
    {
      val (r1, _) = regions(word)
      if (word.endsWith("e") && word.length - 1 >= r1 && word.length >= 2 &&
          !isVowel(word.charAt(word.length - 2))) {
        word = undouble(word.substring(0, word.length - 1))
        eRemoved = true
      }
    }

    // Step 3a: heid
    {
      val (r1, r2) = regions(word)
      if (word.endsWith("heid") && word.length - 4 >= r2 &&
          (word.length < 5 || word.charAt(word.length - 5) != 'c')) {
        word = word.substring(0, word.length - 4)
        // then treat a preceding en as in step 1
        if (word.endsWith("en")) {
          val stemEnd = word.length - 2
          if (stemEnd >= r1 && stemEnd > 0 && !isVowel(word.charAt(stemEnd - 1)) &&
              !(stemEnd >= 3 && word.substring(stemEnd - 3, stemEnd) == "gem")) {
            word = undouble(word.substring(0, stemEnd))
          }
        }
      }
    }

    // Step 3b: derivational suffixes
    {
      val (_, r2) = regions(word)
      if (word.endsWith("end") || word.endsWith("ing")) {
        if (word.length - 3 >= r2) {
          word = word.substring(0, word.length - 3)
          val (_, r2b) = regions(word)
          if (word.endsWith("ig") && word.length - 2 >= r2b &&
              (word.length < 3 || word.charAt(word.length - 3) != 'e')) {
            word = word.substring(0, word.length - 2)
          } else {
            word = undouble(word)
          }
        }
      } else if (word.endsWith("ig")) {
        if (word.length - 2 >= r2 &&
            (word.length < 3 || word.charAt(word.length - 3) != 'e')) {
          word = word.substring(0, word.length - 2)
        }
      } else if (word.endsWith("lijk")) {
        if (word.length - 4 >= r2) {
          word = word.substring(0, word.length - 4)
          // repeat step 2
          val (r1c, _) = regions(word)
          if (word.endsWith("e") && word.length - 1 >= r1c && word.length >= 2 &&
              !isVowel(word.charAt(word.length - 2))) {
            word = undouble(word.substring(0, word.length - 1))
          }
        }
      } else if (word.endsWith("baar")) {
        if (word.length - 4 >= r2) word = word.substring(0, word.length - 4)
      } else if (word.endsWith("bar")) {
        if (word.length - 3 >= r2 && eRemoved) word = word.substring(0, word.length - 3)
      }
    }

    // Step 4: undouble vowel — ends C V V D with D a non-vowel other than I
    // and V a doubled a/e/o/u
    if (word.length >= 4) {
      val d = word.charAt(word.length - 1)
      val v2 = word.charAt(word.length - 2)
      val v1 = word.charAt(word.length - 3)
      val c0 = word.charAt(word.length - 4)
      if (!isVowel(d) && d != 'I' && v1 == v2 && "aeou".indexOf(v1) >= 0 &&
          !isVowel(c0)) {
        word = word.substring(0, word.length - 2) + d
      }
    }

    // Turn I and Y back into lower case
    word.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }
}
