package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-normalization primitives mirroring the reference's
  * NLP surface (reference: src/NLP_functions.py) as pure
  * `org.apache.spark.sql.functions` compositions, so every step stays
  * inside whole-stage codegen and is expressible as ANSI SQL for the
  * DuckDB oracle. Each function also exposes the equivalent DuckDB SQL
  * fragment builder so Spark code and oracle SQL share one source of
  * truth.
  */
object TextFunctions {

  /** Char map from the reference's processArtefactsXML
    * (reference: src/NLP_functions.py:141-155). Applied in declaration
    * order, exactly like the Python dict iteration.
    */
  val artefactMap: Seq[(String, String)] = Seq(
    "ã«" -> "e", "ã¨" -> "e", "ã¶" -> "o",
    "\r" -> " ", "\n" -> " ", "\t" -> " ", "·" -> " ",
    "ã©" -> "e", "ã¯" -> "i", "ãº" -> "u",
    "ã³" -> "o", " " -> " ")

  def cleanArtefacts(c: Column): Column =
    artefactMap.foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  /** DuckDB fragment computing the same chained replacement over `inner`. */
  def cleanArtefactsSql(inner: String): String =
    artefactMap.foldLeft(inner) { case (acc, (k, v)) =>
      val kq = k match {
        case "\r" => "chr(13)"; case "\n" => "chr(10)"; case "\t" => "chr(9)"
        case s    => "'" + s + "'"
      }
      s"replace($acc, $kq, '$v')"
    }

  /** Punctuation/digit class from the reference's simpleCleaning
    * (reference: src/NLP_functions.py:106-123). Matches the original
    * `sticky_chars` regex character-for-character (incl. the literal
    * mojibake sequence), replaced by a space, then lowercased.
    */
  val stickyCharClass: String =
    """[!#,.:";@\-\+\\/&=$\]\[<>'^\*`â€™\(\)\d]"""

  def simpleClean(c: Column): Column =
    lower(regexp_replace(c, stickyCharClass, " "))

  def simpleCleanSql(inner: String): String = {
    val cls = stickyCharClass.replace("'", "''")
    s"lower(regexp_replace($inner, '$cls', ' ', 'g'))"
  }

  /** Whitespace tokens with empties dropped (both engines treat leading
    * whitespace as an empty first token, so the empty-drop keeps
    * parity). Implemented by the fused codegen'd [[TokenizeWs]]
    * expression — identical output to
    * `filter(split(c, "\\s+"), t => t =!= "")`, without the
    * HigherOrderFunction's interpreted per-element lambda (the hottest
    * text kernel in the engine; FunctionsSpec pins the equivalence).
    */
  def tokens(c: Column): Column = GraftExpressions.tokenizeWs(c)

  /** DuckDB fragment: a FROM-clause-ready unnest of whitespace tokens. */
  def tokensSqlSelect(inner: String): String =
    s"unnest(string_split_regex($inner, '\\s+'))"

  /** Dutch stopwords (NLTK's published nl list; the notebook removes these
    * after stemming, reference: Notebook_Diagnosis_Extraction.ipynb cell 23).
    */
  val dutchStopwords: Seq[String] = Seq(
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij", "het",
    "niet", "zijn", "is", "was", "op", "aan", "met", "als", "voor", "had",
    "er", "maar", "om", "hem", "dan", "zou", "of", "wat", "mijn", "men",
    "dit", "zo", "door", "over", "ze", "zich", "bij", "ook", "tot", "je",
    "mij", "uit", "der", "daar", "haar", "naar", "heb", "hoe", "heeft",
    "hebben", "deze", "u", "want", "nog", "zal", "me", "zij", "nu", "ge",
    "geen", "omdat", "iets", "worden", "toch", "al", "waren", "veel",
    "meer", "doen", "toen", "moet", "ben", "zonder", "kan", "hun", "dus",
    "alles", "onder", "ja", "eens", "hier", "wie", "werd", "altijd",
    "doch", "wordt", "wezen", "kunnen", "ons", "zelf", "tegen", "na",
    "reeds", "wil", "kon", "niets", "uw", "iemand", "geweest", "andere")

  /** English stopwords used by the corpus-analysis operators. */
  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "on", "for", "with", "as", "at", "by", "be", "this", "was", "are",
    "from", "but", "not", "have", "has", "had", "they", "you", "we")

  /** Remove stopwords while preserving token order
    * (reference: Notebook_Diagnosis_Extraction.ipynb cell 23).
    */
  def removeStopwords(c: Column, stop: Seq[String]): Column = {
    val stopArr = array(stop.map(lit): _*)
    array_join(filter(tokens(c), t => !array_contains(stopArr, t)), " ")
  }

  def removeStopwordsSql(inner: String, stop: Seq[String]): String = {
    val lst = stop.map(s => s"'$s'").mkString("[", ", ", "]")
    s"array_to_string(list_filter(list_filter(string_split_regex($inner, '\\s+'), t -> t <> ''), t -> NOT list_contains($lst, t)), ' ')"
  }
}
