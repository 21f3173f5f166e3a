package graft.text

/** The HTML named character reference table: the full HTML 4.01 set
  * (the three DTD entity sets — HTMLlat1, HTMLsymbol, HTMLspecial; 252
  * names) plus `apos` (XHTML 1.0), EXTENDED (r17, VERDICT r16 missing
  * #3) with the HTML5 long tail a real crawl actually hits: the ASCII
  * punctuation aliases (`&excl;` `&sol;` `&commat;` …), the legacy
  * uppercase aliases (`&AMP;` `&COPY;` …), the ISOlat2 Latin
  * Extended-A names (`&Amacr;` `&ncaron;` …), the ISOcyr1/ISOcyr2
  * Cyrillic names (`&acy;` `&IOcy;` …), the ISOdia diacritic marks,
  * the var-Greek forms (`&varphi;` `&straightepsilon;` …), common
  * symbol/arrow aliases, and the three MATH ALPHABETS (`&Ascr;`
  * `&afr;` `&Bopf;` … — script/fraktur/double-struck, GENERATED from
  * the Unicode 1D400-block layout with the letterlike-symbol
  * exceptions U+212C ℬ etc., which also exercises
  * supplementary-plane named decode). Public-spec data (W3C HTML 4.01
  * §24; WHATWG HTML §13.5 named references), stored as
  * name → CODEPOINT so the decoded strings on BOTH engines derive from
  * one table: Spark through [[graft.functions.HtmlEntity]]'s static
  * map, the DuckDB oracle through [[duckMapSql]]'s generated MAP
  * literal — the q149 discipline (ground truth generated at build time
  * from the single shared source, never typed twice).
  *
  * MULTI-codepoint names ride the same string-valued lookup
  * ([[MultiCodepoint]] — `&NotLessLess;` → U+226A U+0338, the
  * high-confidence subset). Remaining scope: the rarely-seen
  * negated-relation long tail stays out and passes through as literal
  * text; the table stays additive — extending it changes no machinery
  * on either engine. (Names are case-SENSITIVE per spec: `&cdot;` is
  * ċ, Latin c-dot-above, not the math operator — that one is
  * `&sdot;`.)
  */
object HtmlEntities {

  /** One math alphabet: `{letter}{suffix}` over A–Z + a–z, regular
    * offsets into the Mathematical Alphanumeric Symbols block with the
    * letterlike-symbol exceptions Unicode reserved earlier. */
  private def mathAlphabet(suffix: String, baseUpper: Int, baseLower: Int,
                           upperEx: Map[Char, Int],
                           lowerEx: Map[Char, Int]): Seq[(String, Int)] =
    ('A' to 'Z').map(c =>
      s"$c$suffix" -> upperEx.getOrElse(c, baseUpper + (c - 'A'))) ++
      ('a' to 'z').map(c =>
        s"$c$suffix" -> lowerEx.getOrElse(c, baseLower + (c - 'a')))

  /** The three HTML5 math alphabets (script, fraktur, double-struck). */
  private val MathAlphabets: Seq[(String, Int)] =
    mathAlphabet("scr", 0x1D49C, 0x1D4B6,
      Map('B' -> 0x212C, 'E' -> 0x2130, 'F' -> 0x2131, 'H' -> 0x210B,
        'I' -> 0x2110, 'L' -> 0x2112, 'M' -> 0x2133, 'R' -> 0x211B),
      Map('e' -> 0x212F, 'g' -> 0x210A, 'o' -> 0x2134)) ++
    mathAlphabet("fr", 0x1D504, 0x1D51E,
      Map('C' -> 0x212D, 'H' -> 0x210C, 'I' -> 0x2111, 'R' -> 0x211C,
        'Z' -> 0x2128),
      Map.empty) ++
    mathAlphabet("opf", 0x1D538, 0x1D552,
      Map('C' -> 0x2102, 'H' -> 0x210D, 'N' -> 0x2115, 'P' -> 0x2119,
        'Q' -> 0x211A, 'R' -> 0x211D, 'Z' -> 0x2124),
      Map.empty)

  /** The ISOcyr1 Cyrillic base alphabet (А..Я at U+0410, а..я at
    * U+0430, HTML5 `*cy` names in alphabet order) plus the ISOcyr2
    * extensions (Ё Ђ Ѓ Є Ѕ І Ї Ј Љ Њ Ћ Ќ Ў Џ and lowercase). */
  private val Cyrillic: Seq[(String, Int)] = {
    val upper = Seq("Acy", "Bcy", "Vcy", "Gcy", "Dcy", "IEcy", "ZHcy",
      "Zcy", "Icy", "Jcy", "Kcy", "Lcy", "Mcy", "Ncy", "Ocy", "Pcy",
      "Rcy", "Scy", "Tcy", "Ucy", "Fcy", "KHcy", "TScy", "CHcy", "SHcy",
      "SHCHcy", "HARDcy", "Ycy", "SOFTcy", "Ecy", "YUcy", "YAcy")
    val lower = upper.map(_.toLowerCase)
    val ext = Seq(
      "IOcy" -> 0x401, "DJcy" -> 0x402, "GJcy" -> 0x403, "Jukcy" -> 0x404,
      "DScy" -> 0x405, "Iukcy" -> 0x406, "YIcy" -> 0x407, "Jsercy" -> 0x408,
      "LJcy" -> 0x409, "NJcy" -> 0x40A, "TSHcy" -> 0x40B, "KJcy" -> 0x40C,
      "Ubrcy" -> 0x40E, "DZcy" -> 0x40F)
    upper.zipWithIndex.map { case (n, i) => n -> (0x410 + i) } ++
      lower.zipWithIndex.map { case (n, i) => n -> (0x430 + i) } ++
      ext ++ ext.map { case (n, cp) => n.toLowerCase -> (cp + 80) }
  }

  /** The ISOlat2 Latin Extended-A names (HTML5-retained subset). */
  private val LatinExtA: Seq[(String, Int)] = Seq(
    "Amacr" -> 0x100, "amacr" -> 0x101, "Abreve" -> 0x102, "abreve" -> 0x103,
    "Aogon" -> 0x104, "aogon" -> 0x105, "Cacute" -> 0x106, "cacute" -> 0x107,
    "Ccirc" -> 0x108, "ccirc" -> 0x109, "Cdot" -> 0x10A, "cdot" -> 0x10B,
    "Ccaron" -> 0x10C, "ccaron" -> 0x10D, "Dcaron" -> 0x10E, "dcaron" -> 0x10F,
    "Dstrok" -> 0x110, "dstrok" -> 0x111, "Emacr" -> 0x112, "emacr" -> 0x113,
    "Edot" -> 0x116, "edot" -> 0x117, "Eogon" -> 0x118, "eogon" -> 0x119,
    "Ecaron" -> 0x11A, "ecaron" -> 0x11B, "Gcirc" -> 0x11C, "gcirc" -> 0x11D,
    "Gbreve" -> 0x11E, "gbreve" -> 0x11F, "Gdot" -> 0x120, "gdot" -> 0x121,
    "Gcedil" -> 0x122, "Hcirc" -> 0x124, "hcirc" -> 0x125,
    "Hstrok" -> 0x126, "hstrok" -> 0x127, "Itilde" -> 0x128, "itilde" -> 0x129,
    "Imacr" -> 0x12A, "imacr" -> 0x12B, "Iogon" -> 0x12E, "iogon" -> 0x12F,
    "Idot" -> 0x130, "imath" -> 0x131, "IJlig" -> 0x132, "ijlig" -> 0x133,
    "Jcirc" -> 0x134, "jcirc" -> 0x135, "Kcedil" -> 0x136, "kcedil" -> 0x137,
    "kgreen" -> 0x138, "Lacute" -> 0x139, "lacute" -> 0x13A,
    "Lcedil" -> 0x13B, "lcedil" -> 0x13C, "Lcaron" -> 0x13D, "lcaron" -> 0x13E,
    "Lmidot" -> 0x13F, "lmidot" -> 0x140, "Lstrok" -> 0x141, "lstrok" -> 0x142,
    "Nacute" -> 0x143, "nacute" -> 0x144, "Ncedil" -> 0x145, "ncedil" -> 0x146,
    "Ncaron" -> 0x147, "ncaron" -> 0x148, "napos" -> 0x149,
    "ENG" -> 0x14A, "eng" -> 0x14B, "Omacr" -> 0x14C, "omacr" -> 0x14D,
    "Odblac" -> 0x150, "odblac" -> 0x151, "Racute" -> 0x154, "racute" -> 0x155,
    "Rcedil" -> 0x156, "rcedil" -> 0x157, "Rcaron" -> 0x158, "rcaron" -> 0x159,
    "Sacute" -> 0x15A, "sacute" -> 0x15B, "Scirc" -> 0x15C, "scirc" -> 0x15D,
    "Scedil" -> 0x15E, "scedil" -> 0x15F, "Tcedil" -> 0x162, "tcedil" -> 0x163,
    "Tcaron" -> 0x164, "tcaron" -> 0x165, "Tstrok" -> 0x166, "tstrok" -> 0x167,
    "Utilde" -> 0x168, "utilde" -> 0x169, "Umacr" -> 0x16A, "umacr" -> 0x16B,
    "Ubreve" -> 0x16C, "ubreve" -> 0x16D, "Uring" -> 0x16E, "uring" -> 0x16F,
    "Udblac" -> 0x170, "udblac" -> 0x171, "Uogon" -> 0x172, "uogon" -> 0x173,
    "Wcirc" -> 0x174, "wcirc" -> 0x175, "Ycirc" -> 0x176, "ycirc" -> 0x177,
    "Zacute" -> 0x179, "zacute" -> 0x17A, "Zdot" -> 0x17B, "zdot" -> 0x17C,
    "Zcaron" -> 0x17D, "zcaron" -> 0x17E)

  /** HTML5 additions beyond the alphabet families: ASCII punctuation
    * names, legacy uppercase aliases, diacritics (ISOdia), var-Greek,
    * letterlike symbols, arrows/operators/relations aliases, misc
    * dingbats. Each name is the WHATWG table's spelling; each value a
    * single codepoint. */
  private val Html5Misc: Seq[(String, Int)] = Seq(
    // ASCII punctuation
    "excl" -> 33, "num" -> 35, "dollar" -> 36, "percnt" -> 37,
    "lpar" -> 40, "rpar" -> 41, "ast" -> 42, "midast" -> 42, "plus" -> 43,
    "comma" -> 44, "period" -> 46, "sol" -> 47, "colon" -> 58, "semi" -> 59,
    "equals" -> 61, "quest" -> 63, "commat" -> 64,
    "lbrack" -> 91, "lsqb" -> 91, "bsol" -> 92, "rbrack" -> 93, "rsqb" -> 93,
    "Hat" -> 94, "lowbar" -> 95, "UnderBar" -> 95, "grave" -> 96,
    "DiacriticalGrave" -> 96, "lbrace" -> 123, "lcub" -> 123,
    "vert" -> 124, "verbar" -> 124, "VerticalLine" -> 124,
    "rbrace" -> 125, "rcub" -> 125,
    // legacy uppercase aliases (with-semicolon HTML5 forms)
    "AMP" -> 38, "QUOT" -> 34, "LT" -> 60, "GT" -> 62, "COPY" -> 169,
    "REG" -> 174, "TRADE" -> 8482,
    // Latin-1 / HTML4 synonym names + ISOdia diacritic marks
    "NonBreakingSpace" -> 160, "half" -> 189, "pm" -> 177,
    "PlusMinus" -> 177, "centerdot" -> 183, "CenterDot" -> 183,
    "Cedilla" -> 184, "DiacriticalAcute" -> 180, "Dot" -> 168, "die" -> 168,
    "DoubleDot" -> 168, "DiacriticalTilde" -> 732, "strns" -> 175,
    "angst" -> 197, "ohm" -> 937,
    "breve" -> 728, "Breve" -> 728, "caron" -> 711, "Hacek" -> 711,
    "dot" -> 729, "DiacriticalDot" -> 729, "ring" -> 730,
    "dblac" -> 733, "DiacriticalDoubleAcute" -> 733, "ogon" -> 731,
    // spaces, dashes, bars
    "hairsp" -> 8202, "VeryThinSpace" -> 8202, "ThinSpace" -> 8201,
    "puncsp" -> 8200, "numsp" -> 8199, "emsp13" -> 8196, "emsp14" -> 8197,
    "ZeroWidthSpace" -> 8203, "MediumSpace" -> 8287,
    "hyphen" -> 8208, "dash" -> 8208, "horbar" -> 8213,
    "Verbar" -> 8214, "Vert" -> 8214,
    "OverBar" -> 8254, "bprime" -> 8245, "tprime" -> 8244, "qprime" -> 8279,
    "mldr" -> 8230, "nldr" -> 8229,
    // letterlike symbols (the script/fraktur/opf exceptions' own names)
    "planck" -> 8463, "hbar" -> 8463, "hslash" -> 8463, "planckh" -> 8462,
    "ell" -> 8467, "numero" -> 8470, "copysr" -> 8471, "mho" -> 8487,
    "aleph" -> 8501, "beth" -> 8502, "gimel" -> 8503, "daleth" -> 8504,
    "bernou" -> 8492, "Bernoullis" -> 8492, "hamilt" -> 8459,
    "HilbertSpace" -> 8459, "lagran" -> 8466, "Laplacetrf" -> 8466,
    "phmmat" -> 8499, "Mellintrf" -> 8499, "order" -> 8500,
    "orderof" -> 8500, "imagline" -> 8464, "Im" -> 8465, "Re" -> 8476,
    "realine" -> 8475, "Fouriertrf" -> 8497, "expectation" -> 8496,
    "wp" -> 8472, "zeetrf" -> 8488, "Poincareplane" -> 8460,
    "DifferentialD" -> 8518, "dd" -> 8518, "CapitalDifferentialD" -> 8517,
    "DD" -> 8517, "ExponentialE" -> 8519, "ee" -> 8519, "exponentiale" -> 8519,
    "ImaginaryI" -> 8520, "ii" -> 8520,
    // var-Greek + archaic
    "thetav" -> 977, "vartheta" -> 977, "varpi" -> 982, "varsigma" -> 962,
    "varphi" -> 981, "phiv" -> 981, "straightphi" -> 981,
    "varepsilon" -> 1013, "epsiv" -> 1013, "straightepsilon" -> 1013,
    "varkappa" -> 1008, "kappav" -> 1008, "varrho" -> 1009, "rhov" -> 1009,
    "Gammad" -> 988, "gammad" -> 989,
    // arrows: word aliases, diagonals, hooks, long forms
    "leftarrow" -> 8592, "uparrow" -> 8593, "rightarrow" -> 8594,
    "downarrow" -> 8595, "leftrightarrow" -> 8596, "updownarrow" -> 8597,
    "varr" -> 8597, "nwarr" -> 8598, "nearr" -> 8599, "searr" -> 8600,
    "swarr" -> 8601, "nwarrow" -> 8598, "nearrow" -> 8599,
    "searrow" -> 8600, "swarrow" -> 8601,
    "Leftarrow" -> 8656, "Uparrow" -> 8657, "Rightarrow" -> 8658,
    "Downarrow" -> 8659, "Leftrightarrow" -> 8660, "Updownarrow" -> 8661,
    "vArr" -> 8661, "map" -> 8614, "mapsto" -> 8614,
    "larrhk" -> 8617, "rarrhk" -> 8618,
    "hookleftarrow" -> 8617, "hookrightarrow" -> 8618,
    "xlarr" -> 10229, "longleftarrow" -> 10229,
    "xrarr" -> 10230, "longrightarrow" -> 10230,
    "xharr" -> 10231, "longleftrightarrow" -> 10231,
    "xlArr" -> 10232, "Longleftarrow" -> 10232,
    "xrArr" -> 10233, "Longrightarrow" -> 10233,
    "xhArr" -> 10234, "Longleftrightarrow" -> 10234,
    // operators and relations (single-codepoint HTML5 names)
    "in" -> 8712, "isinv" -> 8712, "notinva" -> 8713, "niv" -> 8715,
    "SuchThat" -> 8715, "coprod" -> 8720, "mnplus" -> 8723, "mp" -> 8723,
    "MinusPlus" -> 8723, "plusdo" -> 8724, "setminus" -> 8726,
    "smallsetminus" -> 8726, "ssetmn" -> 8726, "setmn" -> 8726,
    "compfn" -> 8728, "SmallCircle" -> 8728,
    "wedge" -> 8743, "vee" -> 8744, "xcap" -> 8898, "xcup" -> 8899,
    "Int" -> 8748, "iiint" -> 8749, "conint" -> 8750, "oint" -> 8750,
    "because" -> 8757, "Because" -> 8757, "therefore" -> 8756,
    "Therefore" -> 8756, "ratio" -> 8758, "Colon" -> 8759,
    "Proportion" -> 8759,
    "backsim" -> 8765, "bsim" -> 8765, "nsim" -> 8769, "NotTilde" -> 8769,
    "simeq" -> 8771, "TildeEqual" -> 8771, "ncong" -> 8775,
    "NotTildeFullEqual" -> 8775, "approxeq" -> 8778,
    "thickapprox" -> 8776, "TildeTilde" -> 8776,
    "napprox" -> 8777, "nap" -> 8777, "NotTildeTilde" -> 8777,
    "NotEqual" -> 8800, "Congruent" -> 8801, "nequiv" -> 8802,
    "NotCongruent" -> 8802,
    "leq" -> 8804, "geq" -> 8805, "lE" -> 8806, "leqq" -> 8806,
    "gE" -> 8807, "geqq" -> 8807,
    "ll" -> 8810, "Lt" -> 8810, "NestedLessLess" -> 8810,
    "gg" -> 8811, "Gt" -> 8811, "NestedGreaterGreater" -> 8811,
    "nlt" -> 8814, "NotLess" -> 8814, "ngt" -> 8815, "ngtr" -> 8815,
    "NotGreater" -> 8815, "nle" -> 8816, "nleq" -> 8816,
    "NotLessEqual" -> 8816, "nge" -> 8817, "ngeq" -> 8817,
    "NotGreaterEqual" -> 8817,
    "prec" -> 8826, "Precedes" -> 8826, "succ" -> 8827, "Succeeds" -> 8827,
    "prcue" -> 8828, "sccue" -> 8829,
    "subset" -> 8834, "supset" -> 8835, "Subset" -> 8912, "Supset" -> 8913,
    "subseteq" -> 8838, "SubsetEqual" -> 8838, "supseteq" -> 8839,
    "SupersetEqual" -> 8839, "nsube" -> 8840, "nsubseteq" -> 8840,
    "NotSubsetEqual" -> 8840, "nsupe" -> 8841, "nsupseteq" -> 8841,
    "NotSupersetEqual" -> 8841, "subne" -> 8842, "subsetneq" -> 8842,
    "supne" -> 8843, "supsetneq" -> 8843,
    "uplus" -> 8846, "UnionPlus" -> 8846,
    "sqsub" -> 8847, "sqsup" -> 8848, "sqsube" -> 8849, "sqsupe" -> 8850,
    "sqcap" -> 8851, "sqcup" -> 8852,
    "ominus" -> 8854, "CircleMinus" -> 8854, "osol" -> 8856,
    "odot" -> 8857, "CircleDot" -> 8857, "ocir" -> 8858, "oast" -> 8859,
    "vdash" -> 8866, "RightTee" -> 8866, "dashv" -> 8867, "LeftTee" -> 8867,
    "top" -> 8868, "DownTee" -> 8868, "bot" -> 8869, "bottom" -> 8869,
    "UpTee" -> 8869, "models" -> 8871, "vDash" -> 8872,
    "DoubleRightTee" -> 8872,
    "intcal" -> 8890, "intercal" -> 8890, "veebar" -> 8891,
    "barwed" -> 8965, "barwedge" -> 8965,
    "ltimes" -> 8905, "rtimes" -> 8906, "bowtie" -> 8904,
    "diam" -> 8900, "diamond" -> 8900, "Diamond" -> 8900,
    "sstarf" -> 8902, "Star" -> 8902,
    "vellip" -> 8942, "ctdot" -> 8943,
    "LeftCeiling" -> 8968, "RightCeiling" -> 8969, "LeftFloor" -> 8970,
    "RightFloor" -> 8971,
    "ulcorn" -> 8988, "urcorn" -> 8989, "dlcorn" -> 8990, "drcorn" -> 8991,
    "frown" -> 8994, "sfrown" -> 8994, "smile" -> 8995, "ssmile" -> 8995,
    // geometric shapes and dingbats
    "squ" -> 9633, "square" -> 9633, "Square" -> 9633,
    "squf" -> 9642, "blacksquare" -> 9642, "FilledVerySmallSquare" -> 9642,
    "xutri" -> 9651, "bigtriangleup" -> 9651, "xdtri" -> 9661,
    "bigtriangledown" -> 9661, "utri" -> 9653, "triangle" -> 9653,
    "utrif" -> 9652, "blacktriangle" -> 9652, "dtri" -> 9663,
    "triangledown" -> 9663, "dtrif" -> 9662, "blacktriangledown" -> 9662,
    "cir" -> 9675, "xcirc" -> 9711, "bigcirc" -> 9711,
    "starf" -> 9733, "bigstar" -> 9733, "star" -> 9734,
    "phone" -> 9742, "female" -> 9792, "male" -> 9794,
    "sung" -> 9834, "flat" -> 9837, "natur" -> 9838, "natural" -> 9838,
    "sharp" -> 9839,
    "check" -> 10003, "checkmark" -> 10003, "cross" -> 10007,
    "malt" -> 10016, "maltese" -> 10016, "sext" -> 10038,
    // bracket pairs
    "lobrk" -> 10214, "robrk" -> 10215, "LeftDoubleBracket" -> 10214,
    "RightDoubleBracket" -> 10215,
    "langle" -> 10216, "rangle" -> 10217, "LeftAngleBracket" -> 10216,
    "RightAngleBracket" -> 10217, "Lang" -> 10218, "Rang" -> 10219,
    // Latin ligatures
    "fflig" -> 64256, "filig" -> 64257, "fllig" -> 64258,
    "ffilig" -> 64259, "ffllig" -> 64260)

  /** name → codepoint: the HTML 4.01 base table followed by the HTML5
    * extension families. Order is presentation-only — names are unique
    * across families (asserted at class-load in the spec). */
  val Codepoints: Seq[(String, Int)] = Seq(
    // HTMLspecial — markup-significant + Latin Extended + punctuation
    "quot" -> 34, "amp" -> 38, "apos" -> 39, "lt" -> 60, "gt" -> 62,
    "OElig" -> 338, "oelig" -> 339, "Scaron" -> 352, "scaron" -> 353,
    "Yuml" -> 376, "circ" -> 710, "tilde" -> 732,
    "ensp" -> 8194, "emsp" -> 8195, "thinsp" -> 8201,
    "zwnj" -> 8204, "zwj" -> 8205, "lrm" -> 8206, "rlm" -> 8207,
    "ndash" -> 8211, "mdash" -> 8212,
    "lsquo" -> 8216, "rsquo" -> 8217, "sbquo" -> 8218,
    "ldquo" -> 8220, "rdquo" -> 8221, "bdquo" -> 8222,
    "dagger" -> 8224, "Dagger" -> 8225, "permil" -> 8240,
    "lsaquo" -> 8249, "rsaquo" -> 8250, "euro" -> 8364,
    // HTMLlat1 — ISO 8859-1 160..255, in codepoint order
    "nbsp" -> 160, "iexcl" -> 161, "cent" -> 162, "pound" -> 163,
    "curren" -> 164, "yen" -> 165, "brvbar" -> 166, "sect" -> 167,
    "uml" -> 168, "copy" -> 169, "ordf" -> 170, "laquo" -> 171,
    "not" -> 172, "shy" -> 173, "reg" -> 174, "macr" -> 175,
    "deg" -> 176, "plusmn" -> 177, "sup2" -> 178, "sup3" -> 179,
    "acute" -> 180, "micro" -> 181, "para" -> 182, "middot" -> 183,
    "cedil" -> 184, "sup1" -> 185, "ordm" -> 186, "raquo" -> 187,
    "frac14" -> 188, "frac12" -> 189, "frac34" -> 190, "iquest" -> 191,
    "Agrave" -> 192, "Aacute" -> 193, "Acirc" -> 194, "Atilde" -> 195,
    "Auml" -> 196, "Aring" -> 197, "AElig" -> 198, "Ccedil" -> 199,
    "Egrave" -> 200, "Eacute" -> 201, "Ecirc" -> 202, "Euml" -> 203,
    "Igrave" -> 204, "Iacute" -> 205, "Icirc" -> 206, "Iuml" -> 207,
    "ETH" -> 208, "Ntilde" -> 209, "Ograve" -> 210, "Oacute" -> 211,
    "Ocirc" -> 212, "Otilde" -> 213, "Ouml" -> 214, "times" -> 215,
    "Oslash" -> 216, "Ugrave" -> 217, "Uacute" -> 218, "Ucirc" -> 219,
    "Uuml" -> 220, "Yacute" -> 221, "THORN" -> 222, "szlig" -> 223,
    "agrave" -> 224, "aacute" -> 225, "acirc" -> 226, "atilde" -> 227,
    "auml" -> 228, "aring" -> 229, "aelig" -> 230, "ccedil" -> 231,
    "egrave" -> 232, "eacute" -> 233, "ecirc" -> 234, "euml" -> 235,
    "igrave" -> 236, "iacute" -> 237, "icirc" -> 238, "iuml" -> 239,
    "eth" -> 240, "ntilde" -> 241, "ograve" -> 242, "oacute" -> 243,
    "ocirc" -> 244, "otilde" -> 245, "ouml" -> 246, "divide" -> 247,
    "oslash" -> 248, "ugrave" -> 249, "uacute" -> 250, "ucirc" -> 251,
    "uuml" -> 252, "yacute" -> 253, "thorn" -> 254, "yuml" -> 255,
    // HTMLsymbol — Greek
    "fnof" -> 402,
    "Alpha" -> 913, "Beta" -> 914, "Gamma" -> 915, "Delta" -> 916,
    "Epsilon" -> 917, "Zeta" -> 918, "Eta" -> 919, "Theta" -> 920,
    "Iota" -> 921, "Kappa" -> 922, "Lambda" -> 923, "Mu" -> 924,
    "Nu" -> 925, "Xi" -> 926, "Omicron" -> 927, "Pi" -> 928,
    "Rho" -> 929, "Sigma" -> 931, "Tau" -> 932, "Upsilon" -> 933,
    "Phi" -> 934, "Chi" -> 935, "Psi" -> 936, "Omega" -> 937,
    "alpha" -> 945, "beta" -> 946, "gamma" -> 947, "delta" -> 948,
    "epsilon" -> 949, "zeta" -> 950, "eta" -> 951, "theta" -> 952,
    "iota" -> 953, "kappa" -> 954, "lambda" -> 955, "mu" -> 956,
    "nu" -> 957, "xi" -> 958, "omicron" -> 959, "pi" -> 960,
    "rho" -> 961, "sigmaf" -> 962, "sigma" -> 963, "tau" -> 964,
    "upsilon" -> 965, "phi" -> 966, "chi" -> 967, "psi" -> 968,
    "omega" -> 969, "thetasym" -> 977, "upsih" -> 978, "piv" -> 982,
    // HTMLsymbol — punctuation, letterlike, arrows, math, misc
    "bull" -> 8226, "hellip" -> 8230, "prime" -> 8242, "Prime" -> 8243,
    "oline" -> 8254, "frasl" -> 8260,
    "weierp" -> 8472, "image" -> 8465, "real" -> 8476, "trade" -> 8482,
    "alefsym" -> 8501,
    "larr" -> 8592, "uarr" -> 8593, "rarr" -> 8594, "darr" -> 8595,
    "harr" -> 8596, "crarr" -> 8629,
    "lArr" -> 8656, "uArr" -> 8657, "rArr" -> 8658, "dArr" -> 8659,
    "hArr" -> 8660,
    "forall" -> 8704, "part" -> 8706, "exist" -> 8707, "empty" -> 8709,
    "nabla" -> 8711, "isin" -> 8712, "notin" -> 8713, "ni" -> 8715,
    "prod" -> 8719, "sum" -> 8721, "minus" -> 8722, "lowast" -> 8727,
    "radic" -> 8730, "prop" -> 8733, "infin" -> 8734, "ang" -> 8736,
    "and" -> 8743, "or" -> 8744, "cap" -> 8745, "cup" -> 8746,
    "int" -> 8747, "there4" -> 8756, "sim" -> 8764, "cong" -> 8773,
    "asymp" -> 8776, "ne" -> 8800, "equiv" -> 8801,
    "le" -> 8804, "ge" -> 8805,
    "sub" -> 8834, "sup" -> 8835, "nsub" -> 8836,
    "sube" -> 8838, "supe" -> 8839,
    "oplus" -> 8853, "otimes" -> 8855, "perp" -> 8869, "sdot" -> 8901,
    "lceil" -> 8968, "rceil" -> 8969, "lfloor" -> 8970, "rfloor" -> 8971,
    // lang/rang carry their HTML5 codepoints (U+27E8/U+27E9): HTML 4.01
    // pointed them at the deprecated U+2329/U+232A, which HTML5 (and
    // every modern browser) redefined to the math angle brackets
    "lang" -> 10216, "rang" -> 10217, "loz" -> 9674,
    "spades" -> 9824, "clubs" -> 9827, "hearts" -> 9829, "diams" -> 9830) ++
    Html5Misc ++ LatinExtA ++ Cyrillic ++ MathAlphabets

  /** HTML5 names decoding to MULTI-codepoint sequences — the
    * high-confidence subset (r17; the negated-relation long tail stays
    * out of scope). The named-lookup machinery is string-valued on
    * both engines, so these ride the same path as single-codepoint
    * names. */
  val MultiCodepoint: Seq[(String, String)] = Seq(
    "fjlig" -> "fj",                             // no FJ ligature codepoint exists
    "ThickSpace" -> "\u205F\u200A",              // MMSP + hair space
    "NotLessLess" -> "\u226A\u0338",             // much-less-than + combining solidus
    "NotGreaterGreater" -> "\u226B\u0338",
    "nLtv" -> "\u226A\u0338",
    "nGtv" -> "\u226B\u0338")

  /** name → decoded string (derived, the engine-side map's source). */
  val Table: Seq[(String, String)] =
    Codepoints.map { case (n, cp) => n -> new String(Character.toChars(cp)) } ++
      MultiCodepoint

  /** The same table as a DuckDB MAP literal (generated — never typed a
    * second time). Values go through chr(codepoint) — concatenated
    * chr() calls for the multi-codepoint names — so the oracle's
    * decoded strings come from DuckDB's own codepoint emitter exactly
    * as the engine's come from Character.toChars. */
  lazy val duckMapSql: String = {
    val single = Codepoints.map { case (n, cp) => s"'$n': chr($cp)" }
    val multi = MultiCodepoint.map { case (n, s) =>
      val chrs = s.codePoints().toArray.map(cp => s"chr($cp)").mkString(" || ")
      s"'$n': $chrs"
    }
    s"MAP {${(single ++ multi).mkString(", ")}}"
  }
}
