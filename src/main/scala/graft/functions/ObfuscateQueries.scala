package graft.functions

/** Deterministic structure-preserving query obfuscation — the
  * `clickhouse-format --obfuscate` feature (reference:
  * src/Parsers/obfuscateQueries.cpp). Shapes preserved, content
  * scrambled:
  *
  *  - SQL keywords and KNOWN identifiers (registered function names,
  *    type names) pass through untouched, so the query still parses
  *    to the same statement shape;
  *  - other identifiers split into words at `_` and lowerUpper camel
  *    boundaries; each word maps CONSISTENTLY (same word → same
  *    replacement, everywhere, across calls with one map) to an
  *    English noun chosen by seeded hash, collision-free, with the
  *    source word's capitalization style (First-cap / ALL-CAPS)
  *    re-applied. The tiny `keepWords` set (id/name/value/num) stays,
  *    as the reference keeps it;
  *  - quoted identifiers keep their quotes; inner text > 32 chars
  *    (auto-generated names) is replaced by a hash, else obfuscated
  *    as an identifier;
  *  - literals keep their shape: dates shift by a seeded 0-255 days
  *    (epoch 1970-01-01 stays), times rehash within the clock, a
  *    number keeps its power-of-two magnitude (0 and 1 pass through
  *    digit-by-digit), exponents clamp into 16 bits, alpha runs
  *    rescramble case-preserving, punctuation/whitespace pass, UTF-8
  *    sequences rehash within their lead/continuation byte class;
  *  - comments are DROPPED (they may carry confidential text).
  *
  * Determinism: everything derives from SipHash-2-4 (public
  * algorithm, Aumasson & Bernstein) keyed by the caller's seed —
  * same seed + same query → same output. Alpha runs draw their
  * letters from pcg64 seeded per run exactly like
  * obfuscateQueries.cpp:809 ([[Pcg64]], KAT-pinned against the
  * reference's vendored pcg_random.hpp) — the r15 SplittableRandom
  * divergence is closed.
  */
object ObfuscateQueries {

  /** SQL keywords that must survive obfuscation (the reference's
    * keyword set: statement forms, clauses, join/set operators,
    * access-control verbs). */
  private val keywords: Set[String] = Set(
    "CREATE", "DATABASE", "IF", "NOT", "EXISTS", "TEMPORARY", "TABLE",
    "ON", "CLUSTER", "DEFAULT", "MATERIALIZED", "ALIAS", "ENGINE",
    "AS", "VIEW", "POPULATE", "SETTINGS", "ATTACH", "DETACH", "DROP",
    "RENAME", "TO", "ALTER", "ADD", "MODIFY", "CLEAR", "COLUMN",
    "AFTER", "COPY", "PROJECT", "PRIMARY", "KEY", "CHECK", "PARTITION",
    "PART", "FREEZE", "FETCH", "FROM", "SHOW", "INTO", "OUTFILE",
    "FORMAT", "TABLES", "DATABASES", "LIKE", "PROCESSLIST", "CASE",
    "WHEN", "THEN", "ELSE", "END", "DESCRIBE", "DESC", "USE", "SET",
    "OPTIMIZE", "FINAL", "DEDUPLICATE", "INSERT", "VALUES", "SELECT",
    "DISTINCT", "SAMPLE", "ARRAY", "JOIN", "GLOBAL", "LOCAL", "ANY",
    "ALL", "INNER", "LEFT", "RIGHT", "FULL", "OUTER", "CROSS", "USING",
    "PREWHERE", "WHERE", "GROUP", "BY", "WITH", "TOTALS", "HAVING",
    "ORDER", "COLLATE", "LIMIT", "UNION", "AND", "OR", "ASC", "IN",
    "KILL", "QUERY", "SYNC", "ASYNC", "TEST", "BETWEEN", "TRUNCATE",
    "USER", "ROLE", "PROFILE", "QUOTA", "POLICY", "ROW", "GRANT",
    "REVOKE", "OPTION", "ADMIN", "EXCEPT", "REPLACE", "IDENTIFIED",
    "HOST", "NAME", "READONLY", "WRITABLE", "PERMISSIVE", "FOR",
    "RESTRICTIVE", "RANDOMIZED", "INTERVAL", "LIMITS", "ONLY",
    "TRACKING", "IP", "REGEXP", "ILIKE", "DICTIONARY", "OFFSET",
    "TRIM", "LTRIM", "RTRIM", "BOTH", "LEADING", "TRAILING")

  /** Words too generic to leak anything — kept verbatim (the
    * reference's keep_words, all three capitalizations). */
  private val keepWords: Set[String] = Set(
    "id", "name", "value", "num",
    "Id", "Name", "Value", "Num",
    "ID", "NAME", "VALUE", "NUM")

  /** Replacement vocabulary: everyday English nouns (own list — the
    * reference draws from a public-domain noun list; any large common
    * vocabulary satisfies the contract, which is only "consistent,
    * collision-free, innocuous"). */
  private val nouns: Array[String] = Array(
    "anchor", "apple", "arch", "arrow", "atlas", "attic", "autumn",
    "badge", "bakery", "balloon", "bamboo", "banner", "barley", "barn",
    "basin", "basket", "beacon", "bean", "bear", "beetle", "bell",
    "bench", "berry", "birch", "blanket", "blossom", "boat", "bolt",
    "bonfire", "book", "boot", "bottle", "boulder", "bow", "box",
    "branch", "brass", "bread", "breeze", "brick", "bridge", "brook",
    "broom", "bucket", "buckle", "bud", "buffalo", "bugle", "bundle",
    "burrow", "bush", "butter", "button", "cabin", "cable", "cactus",
    "camel", "camera", "canal", "candle", "canoe", "canyon", "cape",
    "caravan", "card", "cargo", "carpet", "carrot", "cart", "castle",
    "cave", "cedar", "cellar", "chain", "chair", "chalk", "chapel",
    "charcoal", "chart", "cheese", "cherry", "chest", "chimney",
    "church", "cider", "circle", "citadel", "clay", "cliff", "cloak",
    "clock", "cloud", "clover", "coal", "coast", "cobweb", "coconut",
    "comet", "compass", "copper", "coral", "cork", "corn", "cottage",
    "cotton", "cradle", "crane", "crater", "crayon", "creek", "cricket",
    "crown", "crystal", "cup", "curtain", "cushion", "cypress", "daisy",
    "dawn", "deer", "delta", "desert", "dew", "diamond", "dome",
    "donkey", "door", "dove", "dragon", "drum", "dune", "dusk", "eagle",
    "easel", "echo", "eclipse", "eel", "elm", "ember", "emerald",
    "engine", "envelope", "estuary", "falcon", "feather", "fence",
    "fern", "ferry", "fiddle", "field", "fig", "finch", "fjord",
    "flag", "flame", "flask", "fleet", "flint", "flock", "flour",
    "flute", "fog", "forest", "forge", "fountain", "fox", "frost",
    "furnace", "galaxy", "garden", "garlic", "gate", "gazebo", "gem",
    "geyser", "ginger", "glacier", "glade", "glass", "globe", "goat",
    "gondola", "gorge", "granite", "grape", "grove", "gull", "hammer",
    "hammock", "harbor", "harp", "harvest", "hatch", "hawk", "hazel",
    "hearth", "heather", "hedge", "heron", "hill", "hinge", "hive",
    "hollow", "honey", "hook", "horizon", "horn", "horse", "hour",
    "house", "hut", "iceberg", "inkwell", "island", "ivory", "ivy",
    "jade", "jar", "jasmine", "jetty", "jewel", "jigsaw", "juniper",
    "kayak", "kettle", "kite", "knot", "ladder", "lagoon", "lake",
    "lamp", "lantern", "larch", "lark", "latch", "lathe", "lava",
    "lavender", "leaf", "ledge", "lemon", "lens", "lighthouse", "lily",
    "lime", "linen", "lion", "lobster", "locket", "loft", "log",
    "loom", "lotus", "lumber", "lute", "mango", "mantle", "maple",
    "marble", "market", "marsh", "mast", "meadow", "melon", "mesa",
    "meteor", "mill", "mineral", "mint", "mirror", "mist", "moat",
    "monsoon", "moon", "moss", "moth", "mountain", "mule", "mural",
    "mushroom", "nectar", "needle", "nest", "net", "nickel", "night",
    "nutmeg", "oak", "oar", "oasis", "ocean", "olive", "onion", "opal",
    "orange", "orchard", "orchid", "organ", "otter", "oven", "owl",
    "oyster", "paddle", "pagoda", "palace", "palm", "panther", "paper",
    "parcel", "parrot", "pasture", "path", "peach", "peak", "pear",
    "pearl", "pebble", "pelican", "pepper", "perch", "pier", "pigeon",
    "pillar", "pillow", "pine", "pitcher", "plank", "plateau", "plaza",
    "plum", "pocket", "pond", "poplar", "poppy", "porch", "portal",
    "prairie", "prism", "pulley", "pumpkin", "quarry", "quartz",
    "quill", "quilt", "rabbit", "raft", "rail", "rain", "rainbow",
    "rake", "ranch", "raven", "reed", "reef", "ribbon", "ridge",
    "river", "road", "robin", "rocket", "roof", "rope", "rose",
    "rudder", "rug", "saddle", "sail", "salmon", "salt", "sand",
    "sapphire", "satchel", "scarf", "school", "scroll", "seal", "seed",
    "shadow", "shale", "shell", "shelter", "shingle", "ship", "shore",
    "shovel", "shrine", "silk", "silver", "sky", "sled", "slope",
    "smoke", "snail", "snow", "spark", "sparrow", "sphere", "spice",
    "spider", "spindle", "spiral", "spring", "spruce", "squash",
    "stable", "stair", "star", "statue", "steam", "steel", "stone",
    "stork", "storm", "stove", "straw", "stream", "street", "summit",
    "sun", "sundial", "swamp", "swan", "sycamore", "syrup", "tail",
    "tangerine", "tapestry", "tavern", "tea", "temple", "tent",
    "terrace", "thicket", "thimble", "thistle", "thorn", "thread",
    "throne", "thunder", "tide", "tiger", "tile", "timber", "toffee",
    "torch", "tower", "trail", "train", "tree", "trellis", "trench",
    "tribute", "trout", "trumpet", "trunk", "tulip", "tunnel",
    "turbine", "turnip", "turret", "turtle", "twig", "twilight",
    "umbrella", "urn", "valley", "vase", "vault", "velvet", "vine",
    "vineyard", "violet", "violin", "volcano", "wagon", "walnut",
    "walrus", "wave", "weasel", "well", "whale", "wharf", "wheat",
    "wheel", "willow", "wind", "windmill", "window", "wing", "winter",
    "wolf", "wood", "wool", "wren", "yacht", "yarn", "zephyr")

  /** CH type names and similar vocabulary a query's structure needs —
    * the static floor of the known-identifier predicate (the
    * reference's KnownIdentifierFunc is "is this a registered
    * function/type/storage name"; withRegistry() below extends this
    * with the live session's function registry). */
  private val knownTypeNames: Set[String] = Set(
    "Int8", "Int16", "Int32", "Int64", "Int128", "Int256",
    "UInt8", "UInt16", "UInt32", "UInt64", "UInt128", "UInt256",
    "Float32", "Float64", "Decimal", "Decimal32", "Decimal64",
    "Decimal128", "Decimal256", "String", "FixedString", "UUID",
    "Date", "Date32", "DateTime", "DateTime64", "Enum", "Enum8",
    "Enum16", "LowCardinality", "Nullable", "Array", "Tuple", "Map",
    "Nested", "IPv4", "IPv6", "Bool", "JSON", "Nothing", "Interval",
    "Point", "Ring", "Polygon", "MultiPolygon", "MergeTree",
    "ReplacingMergeTree", "SummingMergeTree", "AggregatingMergeTree",
    "CollapsingMergeTree", "VersionedCollapsingMergeTree", "Memory",
    "Log", "TinyLog", "StripeLog", "Join", "Set", "File", "URL",
    "Null", "Distributed", "Dictionary", "Merge", "Buffer")

  /** Fresh consistent-rename state: one map per obfuscation scope.
    * Reuse a single Maps across calls to rename several queries
    * consistently (the clickhouse-format contract: all queries of one
    * invocation share the map). */
  final class Maps {
    private[ObfuscateQueries] val wordMap =
      scala.collection.mutable.LinkedHashMap.empty[String, String]
    private[ObfuscateQueries] val usedNouns =
      scala.collection.mutable.HashSet.empty[String]
  }

  /** Known-identifier predicate backed by a live session's function
    * registry (every registered builtin + graft dialect name) on top
    * of the static type-name floor. */
  def withRegistry(spark: org.apache.spark.sql.SparkSession): String => Boolean = {
    GraftFunctions.ensureRegistered(spark)
    val fns = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName.toLowerCase).toSet
    s => knownTypeNames.contains(s) || fns.contains(s.toLowerCase)
  }

  def obfuscate(src: String, seed: String = "",
      knownIdentifier: String => Boolean = knownTypeNames.contains,
      maps: Maps = new Maps): String = {
    val out = new StringBuilder(src.length)
    val key = SipHash.keyFromSeed(seed)
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c == '-' && i + 1 < n && src.charAt(i + 1) == '-') {
        // line comment: dropped (may carry confidential text)
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '\'') {
        val (inner, next) = scanQuoted(src, i, '\'')
        out += '\''
        obfuscateLiteral(inner, out, key)
        out += '\''
        i = next
      } else if (c == '`' || c == '"') {
        val (inner, next) = scanQuoted(src, i, c)
        out += c
        if (inner.length > 32)
          // long quoted identifiers are usually auto-generated: hash
          out ++= java.lang.Long.toUnsignedString(
            SipHash.hash64(key, inner.getBytes("UTF-8")))
        else obfuscateIdentifier(inner, out, key, knownIdentifier, maps)
        out += c
        i = next
      } else if (Character.isDigit(c)) {
        val start = i
        i = scanNumber(src, i)
        obfuscateLiteral(src.substring(start, i), out, key)
      } else if (isWordStart(c)) {
        val start = i
        while (i < n && isWordPart(src.charAt(i))) i += 1
        val word = src.substring(start, i)
        if (keywords.contains(word.toUpperCase(java.util.Locale.ROOT)) ||
            knownIdentifier(word))
          out ++= word
        else obfuscateIdentifier(word, out, key, knownIdentifier, maps)
      } else {
        out += c
        i += 1
      }
    }
    out.toString
  }

  private def isWordStart(c: Char): Boolean =
    Character.isLetter(c) || c == '_'
  private def isWordPart(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Scan a quoted region from the opening quote at `i`; returns
    * (inner text, index past the closing quote). Backslash escapes
    * and doubled quotes stay part of the inner text. */
  private def scanQuoted(src: String, i: Int, q: Char): (String, Int) = {
    var j = i + 1
    val n = src.length
    while (j < n) {
      val c = src.charAt(j)
      if (c == '\\' && j + 1 < n) j += 2
      else if (c == q && j + 1 < n && src.charAt(j + 1) == q) j += 2
      else if (c == q) return (src.substring(i + 1, j), j + 1)
      else j += 1
    }
    (src.substring(i + 1, n), n) // unterminated: treat rest as inner
  }

  /** Number token extent, CH-lexer style: digits, dots, hex/binary
    * prefixes, exponent signs glued to e/E/p/P. */
  private def scanNumber(src: String, start: Int): Int = {
    var i = start
    val n = src.length
    var hex = false
    if (src.charAt(i) == '0' && i + 1 < n &&
        (src.charAt(i + 1) == 'x' || src.charAt(i + 1) == 'X')) {
      hex = true; i += 2
    }
    while (i < n) {
      val c = src.charAt(i)
      if (Character.isDigit(c) || c == '.' ||
          (hex && isHexDigit(c)) ||
          (!hex && (c == 'e' || c == 'E')) ||
          (hex && (c == 'p' || c == 'P')))
        i += 1
      else if ((c == '+' || c == '-') && i > start &&
          "eEpP".indexOf(src.charAt(i - 1)) >= 0)
        i += 1
      else return i
    }
    i
  }

  private def isHexDigit(c: Char): Boolean =
    Character.isDigit(c) || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')

  /** Identifier rename: split at `_` and lowerUpper boundaries, map
    * each sub-word consistently to a noun, re-apply the source word's
    * capitalization style. */
  private def obfuscateIdentifier(src: String, out: StringBuilder,
      key: (Long, Long), known: String => Boolean,
      maps: Maps): Unit = {
    if (src.isEmpty) return
    var wordBegin = 0
    var i = 0
    val n = src.length
    def appendWord(end: Int): Unit = {
      if (end <= wordBegin) return
      val word = src.substring(wordBegin, end)
      if (keepWords.contains(word)) out ++= word
      else {
        val noun = mapWord(word, key, maps)
        val firstCaps = word.nonEmpty && Character.isUpperCase(word.charAt(0))
        val allCaps = firstCaps && word.length >= 2 &&
          Character.isUpperCase(word.charAt(1))
        var k = 0
        while (k < noun.length) {
          if (allCaps || (k == 0 && firstCaps))
            out += Character.toUpperCase(noun.charAt(k))
          else out += noun.charAt(k)
          k += 1
        }
      }
      wordBegin = end
    }
    var hasAlnum = false
    while (i < n) {
      val c = src.charAt(i)
      if (Character.isLetterOrDigit(c)) hasAlnum = true
      if (hasAlnum && c == '_') {
        appendWord(i)
        out += '_'
        wordBegin = i + 1
      } else if (hasAlnum && i > 0 && Character.isUpperCase(c) &&
          Character.isLowerCase(src.charAt(i - 1))) {
        appendWord(i) // camelCase boundary: xX
      }
      i += 1
    }
    appendWord(n)
  }

  /** The consistent word→noun map: seeded hash pick, linear rehash on
    * collision, hard cap at half the vocabulary (the reference's
    * too-many-identifiers guard). */
  private def mapWord(word: String, key: (Long, Long), maps: Maps): String =
    maps.wordMap.getOrElseUpdate(word, {
      require(maps.wordMap.size * 2 <= nouns.length,
        "too many unique identifiers to obfuscate consistently")
      val h = new SipHash(key)
      h.update(word.getBytes("UTF-8"))
      var noun = nouns((java.lang.Long.remainderUnsigned(
        h.get64, nouns.length.toLong)).toInt)
      while (!maps.usedNouns.add(noun)) {
        h.update(Array[Byte](0))
        noun = nouns((java.lang.Long.remainderUnsigned(
          h.get64, nouns.length.toLong)).toInt)
      }
      noun
    })

  /** Literal content scramble — shape-preserving, per the reference's
    * obfuscateLiteral branch set. */
  private def obfuscateLiteral(src: String, out: StringBuilder,
      key: (Long, Long)): Unit = {
    val h = new SipHash(key)
    val b = src.getBytes("UTF-8")
    var i = 0
    val n = b.length
    def dig(j: Int): Boolean = j < n && b(j) >= '0' && b(j) <= '9'
    while (i < n) {
      val c = (b(i) & 0xff).toChar
      val dateShape = i + 10 <= n && dig(i) && dig(i + 1) && dig(i + 2) &&
        dig(i + 3) && b(i + 4) == '-' && dig(i + 5) && dig(i + 6) &&
        b(i + 7) == '-' && dig(i + 8) && dig(i + 9)
      lazy val parsedDate: Option[java.time.LocalDate] =
        try Some(java.time.LocalDate.parse(new String(b, i, 10, "ASCII")))
        catch { case _: Exception => None }
      if (dateShape && parsedDate.isDefined) {
        // date: shift by a seeded 0-255 days (epoch stays put)
        val hd = h.copy()
        val days = parsedDate.get.toEpochDay
        val shifted =
          if (days == 0L) 0L
          else days + java.lang.Long.remainderUnsigned(hd.get64, 256L)
        out ++= java.time.LocalDate.ofEpochDay(shifted).toString
        i += 10
        // optional " HH:MM:SS" tail: keep the separator, rehash the clock
        if (i + 9 <= n && dig(i + 1) && dig(i + 2) && b(i + 3) == ':' &&
            dig(i + 4) && dig(i + 5) && b(i + 6) == ':' &&
            dig(i + 7) && dig(i + 8)) {
          out += (b(i) & 0xff).toChar
          hd.update(java.util.Arrays.copyOfRange(b, i + 1, i + 9))
          var hv = hd.get64
          val hh = java.lang.Long.remainderUnsigned(hv, 24L).toInt
          hv = java.lang.Long.divideUnsigned(hv, 24L)
          val mm = java.lang.Long.remainderUnsigned(hv, 60L).toInt
          hv = java.lang.Long.divideUnsigned(hv, 60L)
          val ss = java.lang.Long.remainderUnsigned(hv, 60L).toInt
          out ++= f"$hh%02d:$mm%02d:$ss%02d"
          i += 9
        }
      } else if (c >= '0' && c <= '9') {
        if (c == '0' || c == '1') {
          // zero and one are semantically load-bearing: keep
          out += c
          i += 1
        } else {
          val start = i
          var num = 0L
          while (dig(i)) { num = num * 10 + (b(i) - '0'); i += 1 }
          val hn = h.copy()
          hn.update(java.util.Arrays.copyOfRange(b, start, i))
          if (num == 0L) out += '0'
          else {
            // same power-of-two magnitude, seeded mantissa
            val log2 = 63 - java.lang.Long.numberOfLeadingZeros(num)
            val obf = (1L << log2) + java.lang.Long.remainderUnsigned(
              hn.get64, 1L << log2)
            out ++= java.lang.Long.toUnsignedString(obf)
          }
        }
      } else if ((c == 'e' || c == 'E') && i + 1 < n &&
          (dig(i + 1) || (b(i + 1) == '-' && dig(i + 2)))) {
        // exponent: keep, wrapped into 16 bits (the reference reads
        // it as int16 — a huge exponent overflows instead of leaking)
        out += c
        i += 1
        var sign = 1
        if (b(i) == '-') { sign = -1; i += 1 }
        var v = 0L
        while (dig(i)) { v = v * 10 + (b(i) - '0'); i += 1 }
        out ++= (sign * v).toShort.toString
      } else if (isAsciiAlpha(c)) {
        val start = i
        while (i < n && isAsciiAlpha((b(i) & 0xff).toChar)) i += 1
        h.update(java.util.Arrays.copyOfRange(b, start, i))
        // pcg64 seeded per alpha run, exactly obfuscateQueries.cpp:809
        // (the Pcg64 port is KAT-pinned against the reference's own
        // vendored pcg_random.hpp) — the scrambled letters now equal
        // the C++ binary's byte-for-byte
        val rng = new Pcg64(h.get64)
        var j = start
        while (j < i) {
          val r = java.lang.Long.remainderUnsigned(rng.nextLong(), 26L).toInt
          val ch = (b(j) & 0xff).toChar
          out += (if (ch >= 'a' && ch <= 'z') ('a' + r).toChar
                  else ('A' + r).toChar)
          j += 1
        }
      } else if ((b(i) & 0x80) == 0) {
        // ASCII punctuation / whitespace / control: keep
        out += c
        i += 1
      } else if ((b(i) & 0xff) <= 0xBF) {
        // UTF-8 continuation byte: rehash within the class
        h.update(Array(b(i)))
        out ++= utf8Byte(0x80 + java.lang.Long.remainderUnsigned(
          h.get64, 0x40L).toInt)
        i += 1
      } else {
        // UTF-8 lead byte: rehash within its width class
        h.update(Array(b(i)))
        val hv = h.get64
        val lead = b(i) & 0xff
        val obf =
          if (lead < 0xE0) 0xC0 + java.lang.Long.remainderUnsigned(hv, 32L).toInt
          else if (lead < 0xF0) 0xE0 + java.lang.Long.remainderUnsigned(hv, 16L).toInt
          else 0xF0 + java.lang.Long.remainderUnsigned(hv, 8L).toInt
        out ++= utf8Byte(obf)
        i += 1
      }
    }
  }

  private def isAsciiAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** A raw (possibly invalid-sequence) byte carried through the
    * StringBuilder as a Latin-1 char; obfuscate() returns a String,
    * so callers see the byte via ISO-8859-1 round-trip. The reference
    * writes raw bytes; scrambled UTF-8 there is equally free to be an
    * invalid sequence. */
  private def utf8Byte(v: Int): String = (v & 0xff).toChar.toString
}

/** SipHash-2-4 (Aumasson & Bernstein, public reference algorithm) in
  * the incremental update/get64 style the obfuscator needs; get64
  * finalizes a COPY so the stream can keep extending — the
  * reference's SipHash usage pattern. */
private[functions] final class SipHash(key: (Long, Long)) {
  private var v0 = 0x736f6d6570736575L ^ key._1
  private var v1 = 0x646f72616e646f6dL ^ key._2
  private var v2 = 0x6c7967656e657261L ^ key._1
  private var v3 = 0x7465646279746573L ^ key._2
  private var buf = 0L
  private var bufLen = 0
  private var total = 0L

  def copy(): SipHash = {
    val c = new SipHash(key)
    c.v0 = v0; c.v1 = v1; c.v2 = v2; c.v3 = v3
    c.buf = buf; c.bufLen = bufLen; c.total = total
    c
  }

  private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  private def round(): Unit = {
    v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
    v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
    v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
    v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
  }

  private def compress(m: Long): Unit = {
    v3 ^= m; round(); round(); v0 ^= m
  }

  def update(bytes: Array[Byte]): Unit = {
    var i = 0
    while (i < bytes.length) {
      buf |= (bytes(i) & 0xffL) << (8 * bufLen)
      bufLen += 1
      total += 1
      if (bufLen == 8) { compress(buf); buf = 0L; bufLen = 0 }
      i += 1
    }
  }

  /** Finalize a copy of the current state. */
  def get64: Long = {
    var f0 = v0; var f1 = v1; var f2 = v2; var f3 = v3
    val m = buf | ((total & 0xffL) << 56)
    def r(): Unit = {
      f0 += f1; f1 = rotl(f1, 13); f1 ^= f0; f0 = rotl(f0, 32)
      f2 += f3; f3 = rotl(f3, 16); f3 ^= f2
      f0 += f3; f3 = rotl(f3, 21); f3 ^= f0
      f2 += f1; f1 = rotl(f1, 17); f1 ^= f2; f2 = rotl(f2, 32)
    }
    f3 ^= m; r(); r(); f0 ^= m
    f2 ^= 0xff
    r(); r(); r(); r()
    f0 ^ f1 ^ f2 ^ f3
  }
}

private[functions] object SipHash {
  /** Key pair from a caller seed string: empty seed → zero key;
    * else the seed hashes itself (zero-key SipHash) into both
    * halves. */
  def keyFromSeed(seed: String): (Long, Long) =
    if (seed.isEmpty) (0L, 0L)
    else {
      val h = hash64((0L, 0L), seed.getBytes("UTF-8"))
      val h2 = hash64((h, 0L), seed.getBytes("UTF-8"))
      (h, h2)
    }

  def hash64(key: (Long, Long), bytes: Array[Byte]): Long = {
    val h = new SipHash(key)
    h.update(bytes)
    h.get64
  }
}
