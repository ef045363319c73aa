"""Text-analysis operators for large-scale corpus pipelines.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen) — no
Python UDFs in the hot path. Designed for the ``documents`` table shape
(doc_id, text, lang, source, n_chars) but parameterized by column name.
"""

from __future__ import annotations

import pandas as pd  # annotation target for the one Arrow UDF below

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small deterministic English stopword list for the language heuristic
EN_STOPWORDS = [
    "the", "a", "of", "and", "to", "in", "is", "that", "it", "for",
]


def tokens(text: Column, sep: str = " ") -> Column:
    """Whitespace tokenization (single-space sep matches the corpus)."""
    return F.split(text, sep)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def char_count(text: Column) -> Column:
    return F.length(text)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint (md5 hex)."""
    return F.md5(text)


def rolling_fingerprint(text: Column, width: int = 16) -> Column:
    """Cheap shift-resistant fingerprint: md5 of the sorted distinct token
    set (word-order independent — catches shuffled near-dups)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_ish_token_count(text: Column) -> Column:
    """Subword-style token count: runs of letters, runs of digits, and
    each punctuation mark count separately (a BPE-pretokenizer-shaped
    regex, JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007


def rolling_fingerprint_poly(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash over whitespace tokens:
    ``fp = fold(tokens, acc*31 + h(tok) mod 1e9+7)`` with
    ``h(tok) = int(md5(tok)[:8], 16)`` — every step integer and
    sequential, so the value is engine-exact (unlike content md5, this
    localizes WHERE two near-dup docs diverge when computed over chunks).
    """
    h = lambda tok: F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
    return F.aggregate(
        F.transform(tokens(text), h),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + x) % ROLLING_MOD,
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach integer quality features: token/char/distinct/stopword counts
    and a crude language flag (stopword-ratio heuristic). Integer-only
    outputs so results are engine-exact (oracle-friendly)."""
    t = F.col(text_col)
    n_tok = token_count(t)
    n_stop = stopword_count(t)
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_distinct_tokens": distinct_token_count(t),
            "n_chars_calc": char_count(t),
            "n_stopwords": n_stop,
            # 10*stopwords >= tokens  <=>  stopword ratio >= 0.1
            "lang_pred": F.when(n_stop * 10 >= n_tok, F.lit("en")).otherwise(F.lit("unk")),
        }
    )


# Per-language word profiles for the language-ID heuristic: the highest-
# frequency function words of each language (public knowledge — any
# frequency list gives the same top-10). Word-unigram profile matching is
# the classic n-gram language-ID heuristic (Cavnar & Trenkle 1994, with
# n=1 over words instead of character n-grams).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "es": ["que", "los", "del", "las", "por", "una", "con", "para", "es", "su"],
    "fr": ["les", "des", "est", "une", "dans", "qui", "pas", "pour", "sur", "vous"],
    "it": ["che", "di", "non", "per", "una", "sono", "della", "il", "gli", "anche"],
    "pt": ["que", "não", "uma", "com", "para", "por", "mais", "dos", "como", "os"],
    "nl": ["het", "een", "van", "dat", "niet", "aan", "voor", "ook", "maar", "zijn"],
}

LANG_TOKEN_PATTERN = "[a-zà-ÿ]+"


def language_hits(text: Column, lang: str) -> Column:
    """Multiplicity-counting profile hits for one language: how many word
    tokens of ``text`` are in that language's top-frequency-word profile.
    Pure JVM expressions (regexp token extraction + higher-order filter)."""
    words = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
    toks = F.regexp_extract_all(F.lower(text), F.lit(LANG_TOKEN_PATTERN), F.lit(0))
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def language_id(df: DataFrame, text_col: str = "text",
                langs: list[str] | None = None) -> DataFrame:
    """Attach ``lang_pred`` (best-scoring language, 'und' when no profile
    word occurs) plus per-language ``<lang>_hits`` columns.

    Deterministic argmax: languages are compared in the fixed ``langs``
    order and the FIRST language whose hit count ties the maximum wins —
    the decision is a chained CASE, exactly expressible in any SQL engine
    (the driver oracle mirrors it in DuckDB). Scoring is one projection
    over the corpus: no shuffle, no UDF, survives any scale."""
    langs = list(langs or LANG_PROFILES)
    t = F.col(text_col)
    out = df.withColumns({f"{lg}_hits": language_hits(t, lg) for lg in langs})
    hit_cols = [F.col(f"{lg}_hits") for lg in langs]
    pred = F.lit("und")
    # build the CASE back-to-front so earlier languages take ties
    for i in range(len(langs) - 1, -1, -1):
        cond = (hit_cols[i] > 0)
        for j in range(len(langs)):
            if j != i:
                cond = cond & (hit_cols[i] >= hit_cols[j])
        pred = F.when(cond, F.lit(langs[i])).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def doc_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Continuous quality score in [0,1]: blend of length and stopword
    signals (double-valued — excluded from exact-hash oracles)."""
    t = F.col(text_col)
    n_tok = token_count(t).cast("double")
    n_stop = stopword_count(t).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(n_stop * F.lit(10.0) / F.greatest(n_tok, F.lit(1.0)), F.lit(1.0))
    return df.withColumn("quality", F.round(0.5 * len_score + 0.5 * stop_score, 6))


# --------------------------------------------------------------------------
# corpus cleaning: PII redaction + boilerplate-line removal
# --------------------------------------------------------------------------

# Patterns chosen to mean the same thing under Java regex (Spark) and
# RE2 (DuckDB oracle): no lookaround, no backreferences. Order matters
# when applied together: URLs first, so an email inside a URL folds into
# <URL> rather than leaving a mangled remainder.
REDACTION_PATTERNS = {
    "url": (r"https?://\S+", "<URL>"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d{7,15}", "<PHONE>"),
}


def redact_pii(df: DataFrame, text_col: str = "text",
               kinds=("url", "email", "ip"),
               out_col: str | None = None) -> DataFrame:
    """Replace PII-like spans with typed placeholder tokens — the
    standard pre-training scrub. A chain of JVM ``regexp_replace``
    projections: no shuffle, no UDF, linear in corpus bytes at any
    scale. ``kinds`` applies in the given order (see
    ``REDACTION_PATTERNS`` for why URL should precede email)."""
    col = F.col(text_col)
    for k in kinds:
        pat, repl = REDACTION_PATTERNS[k]
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col or text_col, col)


def redaction_counts(df: DataFrame, text_col: str = "text",
                     kinds=("url", "email", "ip")) -> DataFrame:
    """Per-document counts of each PII kind (audit the scrub before
    running it). One projection: ``size(regexp_extract_all(...))`` per
    kind."""
    return df.withColumns({
        f"n_{k}": F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(REDACTION_PATTERNS[k][0]), 0))
        for k in kinds
    })


_SIGNAL_COLS = ["n_lines", "n_dup_lines", "n_dup_line_chars", "n_ngrams",
                "n_dup_ngrams", "n_dup_ngram_chars", "top_bigram",
                "top_bigram_count", "top_bigram_chars"]
_TOKFEAT_COLS = ["__ntok", "__tokchars", "__alpha", "__stop",
                 "__linechars", "__chars"]


def _signals_udf(sep: str, ngram: int, char_union: bool,
                 token_features: bool, stopwords=None):
    """One Arrow-batched pandas UDF computing every repetition signal
    (and optionally the gopher per-token features) from the text column
    alone (r9 optimization round, guide §4.2: the previous pure-JVM
    higher-order-function chain evaluated interpreted per element —
    measured 1.47 s for 5,000 short docs at sf0.1 vs ~0.25 s for this
    batch kernel; HOF lambdas do not participate in whole-stage codegen).

    Exactness contract (the reason the JVM chain could be replaced):
    every output is an integer count or a string, and each piece has a
    direct Python equivalent with identical semantics —
    ``F.split(t, lit)`` with limit -1 == ``str.split(lit)`` (both keep
    leading/trailing empties), Spark string ordering is UTF-8 byte order
    == Python code-point order for the tie rule, and the char-union
    sweep is the same (chars, next-token, next-space) recurrence over
    ascending duplicated-occurrence indices. Only the text column
    crosses the Python boundary (a struct-returning scalar pandas UDF) —
    other columns stay JVM-side, so column pruning at the scan is
    unaffected."""
    from collections import Counter

    from pyspark.sql import types as T

    fields = [
        T.StructField("n_lines", T.LongType()),
        T.StructField("n_dup_lines", T.LongType()),
        T.StructField("n_dup_line_chars", T.LongType()),
        T.StructField("n_ngrams", T.LongType()),
        T.StructField("n_dup_ngrams", T.LongType()),
        T.StructField("n_dup_ngram_chars", T.LongType()),
        T.StructField("top_bigram", T.StringType()),
        T.StructField("top_bigram_count", T.LongType()),
        T.StructField("top_bigram_chars", T.LongType()),
    ]
    if token_features:
        fields += [T.StructField(c, T.LongType()) for c in _TOKFEAT_COLS]
    schema = T.StructType(fields)
    sw = frozenset(stopwords or EN_STOPWORDS)
    ncols = len(fields)

    def _has_alpha(tok: str) -> bool:
        return any("A" <= ch <= "Z" or "a" <= ch <= "z" for ch in tok)

    def compute(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            if t is None or (isinstance(t, float)):  # null text -> all null
                rows.append((None,) * ncols)
                continue
            lines = t.split(sep)
            toks = t.split(" ")
            nt = len(toks)
            grams = ([" ".join(toks[i:i + ngram])
                      for i in range(nt - ngram + 1)]
                     if nt >= ngram else [])
            n_lines = len(lines)
            lc = Counter(lines)
            n_dup_lines = n_lines - len(lc)
            dup_line_chars = (sum(map(len, lines))
                              - sum(map(len, lc)))
            n_grams = len(grams)
            gc = Counter(grams)
            n_dup_ngrams = n_grams - len(gc)
            if char_union:
                # ascending sweep over duplicated-occurrence indices:
                # occurrence i covers tokens [i, i+n-1] and interior
                # spaces [i, i+n-2]; (tc, sc) = next uncovered token /
                # space, so every char is counted at most once
                dup_gchars = 0
                if n_dup_ngrams:
                    toklen = [len(x) for x in toks]
                    tc = sc = 0
                    for i, g in enumerate(grams):
                        if gc[g] < 2:
                            continue
                        a = i if i > tc else tc
                        dup_gchars += sum(toklen[a:i + ngram])
                        sp = (i + ngram - 2) - (i if i > sc else sc) + 1
                        if sp > 0:
                            dup_gchars += sp
                        tc, sc = i + ngram, i + ngram - 1
            else:
                dup_gchars = None
            if nt >= 2:
                bc = Counter(" ".join(toks[i:i + 2]) for i in range(nt - 1))
                best_count = max(bc.values())
                best = min(g for g, c in bc.items() if c == best_count)
                top_chars = best_count * len(best)
            else:
                best, best_count, top_chars = None, 0, 0
            row = (n_lines, n_dup_lines, dup_line_chars, n_grams,
                   n_dup_ngrams, dup_gchars, best, best_count, top_chars)
            if token_features:
                row = row + (
                    nt,
                    sum(map(len, toks)),
                    sum(1 for x in toks if _has_alpha(x)),
                    sum(1 for x in toks if x in sw),
                    sum(map(len, lines)),
                    len(t),
                )
            rows.append(row)
        return pd.DataFrame(rows, columns=[f.name for f in fields])

    return F.pandas_udf(compute, returnType=schema)


def repetition_signals(df: DataFrame, text_col: str = "text",
                       sep: str = "\n", ngram: int = 5,
                       char_union: bool = True) -> DataFrame:
    """Within-document repetition signals in the Gopher/MassiveText family
    (duplicate-line and duplicate/top-n-gram fractions are the published
    repetition filters for pre-training corpora). All outputs are INTEGER
    numerators/denominators so results are engine-exact; callers form the
    fractions (or use cross-multiplied thresholds) downstream.

      n_lines            total ``sep``-separated lines
      n_dup_lines        line occurrences beyond each line's first
      n_dup_line_chars   chars in those beyond-first occurrences
      n_ngrams           word ``ngram``-grams (whitespace tokens)
      n_dup_ngrams       n-gram occurrences beyond each gram's first
      n_dup_ngram_chars  chars covered by the UNION of all occurrences of
                         duplicated n-grams (the published Gopher char
                         measure; overlapping spans count once). Spans
                         start/end at token boundaries, so the union is
                         exactly: chars of tokens inside >=1 duplicated
                         occurrence + inter-token spaces interior to one.
                         Denominator: ``length(text)`` (single-space
                         tokenization makes split+join the identity).
                         ``char_union=False`` skips the zip-sort + sweep
                         that produce it (the most expensive expression
                         here, ~+25% on the whole op) and emits the
                         column as NULL — schema-stable opt-out for
                         callers thresholding on counts only.
      top_bigram         most frequent word 2-gram (ties: lexicographically
                         smallest — deterministic across engines)
      top_bigram_count   its occurrence count
      top_bigram_chars   count * length(top_bigram)

    Scale shape: map-only — ONE Arrow-batched pandas UDF over the text
    column computes every signal per batch (r9: replaced the pure-JVM
    higher-order-function chain, whose lambdas evaluate interpreted
    outside whole-stage codegen — measured ~6x slower than this kernel
    on sf0.1 documents; see ``_signals_udf`` for the exactness
    contract). No shuffle, embarrassingly parallel at any corpus size;
    only the text column crosses the Python boundary, so scan-level
    column pruning of payload columns is unaffected. Null text => every
    signal null together."""
    sig = _signals_udf(sep, ngram, char_union, token_features=False)
    tagged = df.withColumn("__sig", sig(F.col(text_col)))
    return tagged.select(
        *df.columns,
        *[F.col("__sig")[c].alias(c) for c in _SIGNAL_COLS],
    )


def gopher_quality_filter(df: DataFrame, text_col: str = "text",
                          min_words: int = 50, max_words: int = 100_000,
                          sep: str = "\n", ngram: int = 5,
                          dup_ngram_measure: str = "chars") -> DataFrame:
    """Gopher/MassiveText-family document quality filter (Rae et al.
    2021 §A1.1 — the published rule set for pre-training corpora),
    composed from :func:`repetition_signals` plus per-token features.
    Every rule is an INTEGER cross-multiplied threshold (no float
    ratios), so verdicts are engine-exact:

      r_word_count    min_words <= n_tokens <= max_words
      r_mean_wordlen  3 <= mean token length <= 10
                      (3*n_tokens <= token_chars <= 10*n_tokens)
      r_alpha_words   >= 80% of tokens contain an alphabetic char
      r_stopwords     >= 2 stopword occurrences
      r_dup_lines     duplicate-line fraction <= 30%
      r_dup_line_chars duplicate-line char fraction <= 20%
                      (denominator: total line chars)
      r_top_bigram    top-bigram char fraction <= 20% of text chars
      r_dup_ngrams    duplicate n-gram fraction <= 15%. Default measure
                      ``dup_ngram_measure='chars'`` is the published
                      char-union fraction (chars inside the union of
                      duplicated n-gram occurrences / text chars —
                      overlapping spans count once);
                      ``'count'`` uses the occurrence-count fraction
                      (duplicate occurrences / total n-grams) instead.
      keep            all of the above

    Scale shape: map-only; the repetition signals AND the per-token
    features come out of the ONE Arrow-batched signal kernel
    (``_signals_udf`` with ``token_features=True`` — r9: the per-token
    features were separate interpreted JVM HOFs over a re-split token
    array). No shuffle. The char-union sweep (the most expensive signal)
    is computed ONLY when the configured measure thresholds on it."""
    if dup_ngram_measure not in ("chars", "count"):
        raise ValueError("dup_ngram_measure must be 'chars' or 'count'")
    t = F.col(text_col)
    sig = _signals_udf(sep, ngram, dup_ngram_measure == "chars",
                       token_features=True)
    tagged = df.withColumn("__sig", sig(t))
    staged = tagged.select(
        *df.columns,
        *[F.col("__sig")[c].alias(c)
          for c in _SIGNAL_COLS + _TOKFEAT_COLS],
    )
    c = F.col
    rules = {
        "r_word_count": (c("__ntok") >= min_words) & (c("__ntok") <= max_words),
        "r_mean_wordlen": (c("__tokchars") >= 3 * c("__ntok"))
        & (c("__tokchars") <= 10 * c("__ntok")),
        "r_alpha_words": c("__alpha") * 5 >= c("__ntok") * 4,
        "r_stopwords": c("__stop") >= 2,
        "r_dup_lines": c("n_dup_lines") * 10 <= c("n_lines") * 3,
        "r_dup_line_chars": c("n_dup_line_chars") * 5 <= c("__linechars"),
        "r_top_bigram": c("top_bigram_chars") * 5 <= c("__chars"),
    }
    if dup_ngram_measure == "chars":
        rules["r_dup_ngrams"] = (
            c("n_dup_ngram_chars") * 20 <= c("__chars") * 3)
    elif dup_ngram_measure == "count":
        rules["r_dup_ngrams"] = c("n_dup_ngrams") * 20 <= c("n_ngrams") * 3
    else:
        raise ValueError("dup_ngram_measure must be 'chars' or 'count'")
    # null text: every verdict null together (repetition_signals already
    # nulls its outputs; the per-token features here would otherwise mix
    # -1 sizes with null sums into arbitrary booleans)
    rules = {k: F.when(t.isNotNull(), v) for k, v in rules.items()}
    out = staged.withColumns(rules)
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    keep = F.when(t.isNotNull(), keep)
    return (out.withColumn("keep", keep)
            .drop("__ntok", "__tokchars", "__alpha", "__stop",
                  "__linechars", "__chars"))


def dedup_lines(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """Corpus-level exact line deduplication, C4-style: every line keeps
    only its FIRST occurrence across the whole corpus (ordered by
    ``id_col``, then position within the document); later occurrences
    are dropped and each document is rebuilt from its surviving lines.
    Blank lines are exempt (they are formatting, not content).

    Scale shape: the keeper per distinct line is
    ``groupBy(line).agg(min(struct(id, pos)))`` — min is map-side
    combinable, so a line repeated millions of times (exactly what this
    op exists to remove) partially aggregates in the scan stage instead
    of funneling one hot key through a single window task. The join
    back is keyed on the line with the ONE-row-per-line keeper table on
    the build side; skewed probe sides are what hash joins are for (and
    AQE splits them). Rebuild is one shuffle by ``id_col`` with an
    in-group ``array_sort`` — same shape as
    ``remove_boilerplate_lines``."""
    import re as _re

    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
        .alias("__pos", "__line"),
    )
    keeper = (
        lines.filter(F.trim("__line") != "")
        .groupBy("__line")
        .agg(F.min(F.struct(id_col, "__pos")).alias("__first"))
    )
    kept = (
        lines.join(keeper, "__line", "left")
        .filter(
            F.col("__first").isNull()  # blank lines: always kept
            | (F.col("__first") == F.struct(id_col, "__pos")))
        .drop("__first")
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("__pos", "__line")))
             .alias("__arr"))
        .select(
            F.col(id_col),
            F.concat_ws(sep, F.transform("__arr", lambda x: x["__line"]))
            .alias("__clean"),
        )
    )
    return (
        docs.join(rebuilt, id_col, "left")
        .withColumn(
            text_col,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce("__clean", F.lit(""))))
        .drop("__clean")
    )


def remove_boilerplate_lines(docs: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", min_docs: int = 2,
                             sep: str = "\n") -> DataFrame:
    """C4-style boilerplate scrub: drop every line whose exact text
    appears in ≥ ``min_docs`` DISTINCT documents, then rebuild each
    document from its surviving lines in original order (docs whose
    every line was boilerplate keep an empty string).

    Scale shape: one explode (linear), one aggregation keyed by line
    text to find the repeated set — which is SMALL by construction
    (navigation chrome, license headers), so the scrub join back is a
    broadcast LEFT ANTI against the exploded lines, and the per-doc
    rebuild is one shuffle by ``id_col`` with an in-group
    ``array_sort`` (no window). Blank lines are exempt — every document
    shares them, and removing them would reflow all formatting."""
    import re as _re

    # F.split takes a Java REGEX; sep is documented as a literal
    # separator, so escape it (sep="|" would otherwise be the
    # empty-alternation pattern and shred every doc into characters)
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
        .alias("__pos", "__line"),
    )
    boiler = (
        lines.filter(F.trim("__line") != "")
        .groupBy("__line")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__line")
    )
    kept = lines.join(F.broadcast(boiler), "__line", "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("__pos", "__line")))
             .alias("__arr"))
        .select(
            F.col(id_col),
            F.concat_ws(sep, F.transform("__arr", lambda x: x["__line"]))
            .alias("__clean"),
        )
    )
    # null text stays null (it produced no lines); only docs whose every
    # line was scrubbed collapse to ""
    return (
        docs.join(rebuilt, id_col, "left")
        .withColumn(
            text_col,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce("__clean", F.lit(""))))
        .drop("__clean")
    )


# --------------------------------------------------------------------------
# URL / domain hygiene (the C4/RefinedWeb source-filtering stage)
# --------------------------------------------------------------------------

_DOMAIN_RE = r"^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?//([^/?#@]*@)?([^/?#:]+)"


# control strip leaves the five ASCII whitespace controls
# (\t \n \x0b \x0c \r) to the whitespace step — stripping \x0b/\x0c
# here would GLUE adjacent words instead of spacing them
_CONTROL_RE = "[\\x00-\\x08\\x0e-\\x1f\\x7f]"
# explicit whitespace class — Java regex \s and DuckDB/RE2 \s disagree
# on \x0b, so the oracle-portable form spells the class out
_WS_RE = "[ \\t\\n\\r\\f\\x0b]+"


def normalize_text(df: DataFrame, *, text_col: str = "text",
                   output_col: str | None = None,
                   nfc: bool = True, lowercase: bool = False,
                   strip_accents: bool = False,
                   strip_control: bool = True,
                   collapse_whitespace: bool = True) -> DataFrame:
    """Canonical text normalization — the pass every pipeline runs
    BEFORE hashing/dedup/tokenization, because exact dedup keyed on
    un-normalized text silently misses byte-different equal strings
    (C4/CCNet both normalize first). Fixed step order: control-char
    strip → unicode NFC → accent strip → lowercase → whitespace
    collapse + trim. ``output_col=None`` replaces ``text_col``.

    Plan shape: everything except the unicode steps is JVM
    ``regexp_replace``/``lower`` (codegen, map-only). NFC / accent
    strip need Python's unicodedata — ONE Arrow-batched pandas UDF
    covering both, skipped entirely (pure-JVM plan) when both are off.
    At 100 TB this is a bare projection on the scan either way —
    no shuffle, no driver traffic. DuckDB oracle: ``regexp_replace(...,
    'g')`` + ``nfc_normalize`` + ``strip_accents`` + ``lower`` +
    ``trim`` compose to the same string (pinned at the gate on the
    ASCII corpus; unicode behavior pinned in pytest)."""
    out = output_col or text_col
    col = F.col(text_col)
    if strip_control:
        col = F.regexp_replace(col, _CONTROL_RE, "")
    if nfc or strip_accents:
        @F.pandas_udf("string")
        def _uni(s: pd.Series) -> pd.Series:
            import unicodedata

            def fix(x):
                if x is None:
                    return None
                if nfc:
                    x = unicodedata.normalize("NFC", x)
                if strip_accents:
                    x = "".join(
                        c for c in unicodedata.normalize("NFD", x)
                        if not unicodedata.combining(c))
                    x = unicodedata.normalize("NFC", x)
                return x

            return s.map(fix, na_action="ignore")

        col = _uni(col)
    if lowercase:
        col = F.lower(col)
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, _WS_RE, " "))
    return df.withColumn(out, col)


def extract_domain(url: Column, strip_www: bool = True) -> Column:
    """Registered host of a URL as a lowercase column — pure regex
    (engine-portable: the DuckDB oracle runs the same pattern), no UDF.
    Handles scheme and scheme-relative (``//host``) forms, strips
    userinfo and port; URLs without an authority yield null.
    ``strip_www`` drops ONE leading ``www.`` label (the standard
    normalization before per-domain grouping)."""
    host = F.lower(F.regexp_extract(url, _DOMAIN_RE, 2))
    host = F.when(host == "", F.lit(None)).otherwise(host)
    if strip_www:
        host = F.when(host.startswith("www."),
                      F.substring(host, 5, 1 << 30)).otherwise(host)
    return host


def domain_suffixes(domain: Column) -> Column:
    """All dot-suffixes of a domain (``a.b.com`` → [a.b.com, b.com,
    com]) as an array column — the blocklist-matching key set (blocking
    ``b.com`` must block every subdomain)."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, i, n)),
    )


def filter_blocked_domains(df: DataFrame, blocked: list,
                           url_col: str = "url",
                           block_subdomains: bool = True) -> DataFrame:
    """Drop rows whose URL's domain (or any parent domain, with
    ``block_subdomains``) appears in ``blocked``. Rows with no
    parseable domain are KEPT (hygiene filters must not silently eat
    schemeless rows — run a null-domain audit separately).

    Scale shape: map-only — the blocklist ships as a broadcast literal
    array and membership is an ``exists`` over the row's ≤ #labels
    suffixes; no join, no shuffle. For million-entry blocklists switch
    to a broadcast anti join on the exploded suffix (same semantics;
    this literal form covers the usual 10k-entry curated lists)."""
    blk = F.array(*[F.lit(b.lower()) for b in sorted(set(blocked))])
    dom = extract_domain(F.col(url_col))
    keys = domain_suffixes(dom) if block_subdomains else F.array(dom)
    hit = F.exists(keys, lambda s: F.array_contains(blk, s))
    return df.filter(dom.isNull() | ~F.coalesce(hit, F.lit(False)))
