package graft.evolve

/** Per-DB-flavor DEFAULT sanitization rule sets (reference
  * `graflo/db/util.py:load_reserved_words` + `load_tigergraph_identifier_rules`
  * over `graflo/db/tigergraph/reserved_words.json`; policy orchestrated by
  * `graflo/hq/sanitizer.py` via SanitizeOp, apply.py:1368-1407).
  *
  * Only TigerGraph ships a non-empty default set: the GSQL keywords plus
  * the C++ keywords (both public language keyword lists), matched
  * case-insensitively against the UPPER forms below. TigerGraph
  * identifiers additionally forbid a prefix (`gsql_sys_` gets a `tg_`
  * prepend) and a character set (each occurrence replaced by `__`) —
  * db/util.py:sanitize_tigergraph_identifier. Executed-parity pinned by
  * the `san_default_*` rewrite-fixture cases.
  */
object SanitizeRules {

  /** GSQL reserved keywords (public TigerGraph GSQL language keywords). */
  val GsqlKeywords: Set[String] = Set(
    "ACCUM", "ADD", "ALL", "ALLOCATE", "ALTER", "AND", "ANY", "AS", "ASC",
    "AVG", "BAG", "BATCH", "BETWEEN", "BIGINT", "BLOB", "BOOL", "BOOLEAN",
    "BOTH", "BREAK", "BY", "CALL", "CASCADE", "CASE", "CATCH", "CHAR",
    "CHARACTER", "CHECK", "CLOB", "COALESCE", "COMPRESS", "CONST",
    "CONSTRAINT", "CONTINUE", "COST", "COUNT", "CREATE", "CURRENT_DATE",
    "CURRENT_TIME", "CURRENT_TIMESTAMP", "DATETIME", "DECIMAL", "DELETE",
    "DESC", "DISTINCT", "DO", "DOUBLE", "DROP", "ELSE", "END", "ESCAPE",
    "EXCEPT", "EXECUTE", "EXISTS", "FALSE", "FILTER", "FLOAT", "FOR",
    "FOREACH", "FROM", "FULL", "FUNCTION", "GRAPH", "GROUP",
    "GSQL_SYS_TAG", "HAVING", "IF", "IN", "INNER", "INSERT", "INT",
    "INTEGER", "INTERSECT", "INTO", "IS", "JOB", "JOIN", "KEY", "LEFT",
    "LIKE", "LIMIT", "LIST", "LOAD", "LOG", "MAP", "MATCH", "MAX", "MIN",
    "NOT", "NULL", "OF", "OFFSET", "ON", "OR", "ORDER", "OUTER", "PINNED",
    "POST-ACCUM", "POST_ACCUM", "PRIMARY", "PRIMARY_ID", "PRINT", "PROXY",
    "QUERY", "QUIT", "RAISE", "RANGE", "REDUCE", "REPLACE",
    "RESET_COLLECTION_ACCUM", "RETURN", "RETURNS", "RIGHT", "SAMPLE",
    "SECOND", "SELECT", "SELECTVERTEX", "SET", "STATIC", "STRING", "SUM",
    "TARGET", "TEMP_TABLE", "THEN", "TO", "TO_CSV", "TO_DATETIME",
    "TRAILING", "TRANSLATESQL", "TRIM", "TRUE", "TRY", "TUPLE", "TYPEDEF",
    "UINT", "UINT16", "UINT32", "UINT32_T", "UINT64_T", "UINT8", "UINT8_T",
    "UNION", "UPDATE", "UPSERT", "USE", "USING", "VALUES", "VERSION",
    "VERTEX", "WHEN", "WHERE", "WHILE", "WITH", "_INTERNAL_ATTR_TAG")

  /** C++ keywords (public ISO C++ language keywords — GSQL UDFs compile
    * to C++, so TigerGraph reserves them too).
    */
  val CppKeywords: Set[String] = Set(
    "ALIGNAS", "ALIGNOF", "AND", "AND_EQ", "ASM", "AUTO", "BITAND",
    "BITOR", "BOOL", "BREAK", "CASE", "CATCH", "CHAR", "CHAR16_T",
    "CHAR32_T", "CLASS", "COMPL", "CONCEPT", "CONST", "CONSTEXPR",
    "CONST_CAST", "CONTINUE", "DECLTYPE", "DEFAULT", "DELETE", "DO",
    "DOUBLE", "DYNAMIC_CAST", "ELSE", "ENUM", "EXPLICIT", "EXPORT",
    "EXTERN", "FALSE", "FLOAT", "FOR", "FRIEND", "GOTO", "IF", "INDEX",
    "INLINE", "INT", "LONG", "MUTABLE", "NAMESPACE", "NEW", "NOEXCEPT",
    "NOT", "NOT_EQ", "NULLPTR", "OPERATOR", "OR", "OR_EQ", "PACKAGE",
    "PRIVATE", "PROTECTED", "PUBLIC", "REGISTER", "REINTERPRET_CAST",
    "RETURN", "SHORT", "SIGNED", "SIZEOF", "STATIC", "STATIC_ASSERT",
    "STATIC_CAST", "STRUCT", "SWITCH", "TEMPLATE", "THIS", "THREAD_LOCAL",
    "THROW", "TRUE", "TRY", "TYPE", "TYPEDEF", "TYPEID", "TYPENAME",
    "UNION", "UNSIGNED", "USING", "VIRTUAL", "VOID", "VOLATILE", "WCHAR_T",
    "WHILE", "XOR", "XOR_EQ")

  /** load_reserved_words: gsql + cpp union, uppercase. */
  val TigerGraphReserved: Set[String] = GsqlKeywords ++ CppKeywords

  val TigerGraphForbiddenPrefixes: Seq[String] = Seq("gsql_sys_")
  val TigerGraphInvalidChars: Set[Char] = Set(' ', '.', '-', '@', '#', '$', '%', '^', '&', '*', '(', ')', '[', ']', '{', '}', '|', '\\', '/', '?', '<', '>', ',', ';', ':', '\'', '"', '`', '~', '!', '=', '+')
  val InvalidCharReplacement = "__"
  val ForbiddenPrefixReplacement = "tg_"

  /** db/util.py:load_reserved_words — the flavor's DEFAULT reserved set
    * (empty for every flavor but TigerGraph).
    */
  def defaultReserved(dbFlavor: String): Set[String] =
    if (dbFlavor == "tigergraph") TigerGraphReserved else Set.empty
}
