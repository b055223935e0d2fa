package graft.operators

/** Signature-token profiles for [[TextAnalysis.languageId]]: the
  * highest-frequency function words per language (the classic
  * language-ID discriminator — function words are closed-class, extremely
  * frequent, and nearly disjoint across languages). Latin-script languages
  * only: the tokenizer is whitespace-based, which these share.
  *
  * Public linguistic knowledge (standard frequency-list words); no corpus
  * shipped or needed. Score = |tokens ∩ profile| per language, argmax wins
  * ([[TextAnalysis.languageId]]).
  */
object LanguageProfiles {

  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "was", "that", "for", "it",
      "with", "as", "his", "on", "be", "at", "by", "this", "had", "not",
      "are", "but", "from", "or", "have", "they", "which", "you", "were", "her"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "un", "une", "du",
      "que", "dans", "qui", "au", "pour", "sur", "pas", "plus", "par", "avec",
      "son", "ne", "se", "ce", "il", "sont", "mais", "comme", "ou", "nous"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "des",
      "im", "nicht", "ein", "eine", "als", "auch", "es", "auf", "für", "an",
      "sich", "dem", "war", "einer", "aber", "aus", "wird", "bei", "einem", "nach"),
    "es" -> Seq("de", "la", "que", "el", "en", "los", "se", "del", "las", "un",
      "por", "con", "una", "su", "para", "es", "al", "como", "más", "pero",
      "sus", "le", "ha", "o", "este", "sí", "porque", "esta", "entre", "cuando"),
    "it" -> Seq("di", "che", "la", "il", "un", "per", "una", "in", "del", "non",
      "si", "le", "con", "della", "dei", "nel", "alla", "più", "ma", "anche",
      "come", "dal", "sono", "gli", "lo", "questo", "questa", "essere", "ha", "era"),
    "pt" -> Seq("de", "que", "em", "do", "da", "os", "um", "dos", "uma", "com",
      "não", "para", "se", "na", "por", "mais", "as", "das", "como", "mas",
      "foi", "ao", "ele", "são", "pelo", "pela", "até", "isso", "ela", "seu"),
    "nl" -> Seq("de", "van", "het", "een", "en", "in", "is", "dat", "op", "te",
      "zijn", "met", "die", "voor", "niet", "aan", "er", "om", "ook", "als",
      "dan", "maar", "bij", "of", "uit", "naar", "door", "over", "ze", "hij"),
    "sv" -> Seq("och", "att", "det", "som", "en", "på", "är", "av", "för", "med",
      "till", "den", "har", "de", "inte", "om", "ett", "men", "var", "jag",
      "sig", "från", "vi", "så", "kan", "när", "man", "hade", "där", "eller"),
    "da" -> Seq("og", "at", "det", "er", "til", "en", "den", "af", "for", "med",
      "der", "på", "de", "ikke", "som", "har", "han", "et", "var", "men",
      "jeg", "om", "sig", "hun", "så", "fra", "vi", "kan", "du", "dem"),
    "pl" -> Seq("w", "i", "na", "z", "do", "to", "że", "nie", "jest", "się",
      "od", "po", "jak", "ale", "co", "za", "przez", "jego", "dla", "był",
      "tym", "tylko", "przy", "może", "już", "być", "ich", "tak", "oraz", "która"),
    "tr" -> Seq("bir", "ve", "bu", "da", "de", "için", "ile", "olarak", "daha", "çok",
      "en", "gibi", "kadar", "sonra", "ama", "ise", "var", "olan", "ne", "her",
      "o", "ki", "mi", "değil", "bu", "iki", "ilk", "aynı", "diğer", "yıl"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "ini", "untuk", "dari", "dalam", "tidak",
      "akan", "pada", "juga", "ke", "karena", "ada", "mereka", "sudah", "saya", "kita",
      "atau", "bisa", "oleh", "telah", "seperti", "sebagai", "tersebut", "hanya", "lebih", "satu"))
}
