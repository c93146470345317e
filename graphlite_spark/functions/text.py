"""Text-analysis expressions for the training-data pipeline.

All operators are pure ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage codegen — no Python in the hot path) with documented DuckDB
equivalents used by the correctness oracle:

* tokenization  — lowercase, split on whitespace runs, drop empties
* token counts  — total + distinct
* language ID   — stopword-ratio heuristic (n-gram-free, deterministic)
* quality score — length / stopword-ratio / mean-token-length blend
* fingerprint   — md5 over the sorted distinct token set (content-defined:
  invariant to word order and duplication)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

#: language-ID decision threshold on the stopword ratio
LANG_EN_THRESHOLD = 0.05


def let_expr(value: Column, body) -> Column:
    """let-binding for Columns: evaluate ``value`` ONCE per row, reference
    it any number of times inside ``body``.

    A pyspark Column reference INLINES its whole expression tree at every
    use site, and higher-order-function lambdas get no subexpression
    elimination — so an expression that reads e.g. the token array k
    times re-tokenizes k times per row (measured 3-4× slowdowns on the
    dedup shingle pass).  ``element_at(transform(array(x), v -> body(v)),
    1)`` binds x to the lambda variable v exactly once; every reference
    to v inside ``body`` is a cheap variable read.  Result values are
    identical (same expression semantics, same nullability)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def tokens_expr(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def shingles_expr(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined), empty array when < n tokens.

    let-bound internally: the input array is evaluated once per row even
    when callers pass an unstaged ``tokens_expr(...)`` (the lambda reads
    it ``n``+2 times)."""

    def body(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        make = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
        )
        return F.when(F.size(toks) >= n, F.transform(idx, make)).otherwise(
            F.array().cast("array<string>")
        )

    return let_expr(tokens, body)


def _stop_count(tokens: Column) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens, lambda t: F.array_contains(stop, t)))


def lang_id_expr(tokens: Column) -> Column:
    """'en' when stopword ratio >= threshold, else 'und' (tokens
    evaluated once — let-bound)."""

    def body(toks: Column) -> Column:
        ratio = _stop_count(toks) / F.greatest(F.size(toks), F.lit(1))
        return F.when(
            ratio >= F.lit(LANG_EN_THRESHOLD), F.lit("en")
        ).otherwise(F.lit("und"))

    return let_expr(tokens, body)


def quality_exprs(tokens: Column) -> dict[str, Column]:
    """Deterministic quality features + a blended score in [0, ~1.5].

    Each returned column let-binds the token array, so an unstaged
    ``tokens_expr(...)`` argument is tokenized once per output column
    (4×/row) instead of once per internal reference (~10×/row); staging
    the tokens at the call site is still the cheapest form."""

    def mk(field):
        def body(toks: Column) -> Column:
            n = F.size(toks)
            n_safe = F.greatest(n, F.lit(1))
            stop_ratio = _stop_count(toks) / n_safe
            mean_len = F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
            ) / n_safe
            score = (
                F.lit(0.2)
                + F.lit(1.5) * stop_ratio
                + F.lit(0.02) * mean_len
                + F.lit(0.1) * F.log1p(n.cast("double"))
            )
            return {
                "n_tokens": n.cast("long"),
                "stop_ratio": F.round(stop_ratio, 6),
                "mean_token_len": F.round(mean_len, 6),
                "quality": F.round(score, 6),
            }[field]

        return let_expr(tokens, body)

    return {
        k: mk(k)
        for k in ("n_tokens", "stop_ratio", "mean_token_len", "quality")
    }


def repetition_exprs(tokens: Column, n: int = 2) -> dict[str, Column]:
    """Gopher-style within-document repetition signals (Rae et al. 2021's
    repetition filters, integer-exact): the fraction of token n-gram
    INSTANCES that are repeats of an earlier instance, and the frequency
    share of the single most repeated token.  Both ride as micro-units
    (``10^6 * x div y``) so the oracle comparison is hash-exact.

    Pure per-row expressions — no shuffle, no join, no UDF: the operator
    is embarrassingly parallel at any corpus size.  The max-token-count
    scan is O(distinct × len) per document, bounded by document length.
    Each returned column let-binds the token array (evaluated once per
    column even from an unstaged ``tokens_expr``)."""
    sep = "\x1f"

    def micros(num: Column, den: Column) -> Column:
        # exact truncating division on BIGINTs: subtract the remainder
        # first so the one float division is between exact multiples
        num1m = (F.lit(1_000_000).cast("long") * num.cast("long"))
        return F.when(den == 0, F.lit(0).cast("long")).otherwise(
            ((num1m - num1m % den) / den).cast("long")
        )

    def mk(field):
        def body(toks: Column) -> Column:
            n_tok = F.size(toks)
            gram = lambda i: F.concat_ws(  # noqa: E731
                sep, *[F.element_at(toks, i + j) for j in range(n)]
            )
            grams = F.when(
                n_tok >= n,
                F.transform(F.sequence(F.lit(1), n_tok - (n - 1)), gram),
            ).otherwise(F.array().cast("array<string>"))
            n_grams = F.size(grams)
            n_dup = n_grams - F.size(F.array_distinct(grams))
            top_cnt = F.coalesce(
                F.array_max(
                    F.transform(
                        F.array_distinct(toks),
                        lambda u: F.size(F.filter(toks, lambda x: x == u)),
                    )
                ),
                F.lit(0),
            )
            return {
                "n_tokens": n_tok.cast("long"),
                "n_grams": n_grams.cast("long"),
                "n_dup_grams": n_dup.cast("long"),
                "dup_gram_micros": micros(n_dup, n_grams),
                "top_token_micros": micros(top_cnt, n_tok),
            }[field]

        return let_expr(tokens, body)

    return {
        k: mk(k)
        for k in (
            "n_tokens",
            "n_grams",
            "n_dup_grams",
            "dup_gram_micros",
            "top_token_micros",
        )
    }


def fingerprint_expr(tokens: Column) -> Column:
    """md5 of the sorted distinct token set — content-defined doc identity."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens)), " "))


def rolling_hash_expr(text: Column | str = "text", base: int = 31,
                      mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over the character stream:
    ``h = fold(chars, 0, (a, c) -> (a*base + ascii(c)) % mod)``.

    Order-sensitive (unlike :func:`fingerprint_expr`), all JVM-side
    (regexp char split + F.aggregate fold); DuckDB mirror via
    list_reduce (see oracle.rolling_fingerprint_sql).
    """
    c = F.col(text) if isinstance(text, str) else text
    # explicit [^\n] char class: Java-regex '.' also skips \r and unicode
    # line separators while DuckDB's RE2 '.' skips only \n — [^\n] means
    # the same thing in both engines, so \r-bearing docs hash identically
    chars = F.regexp_extract_all(c, F.lit("[^\n]"), 0)
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x) % F.lit(mod).cast("long"),
    )


def window_langs_expr(tokens: Column, window: int = 16) -> Column:
    """Array of per-window lang-ids over non-overlapping ``window``-token
    chunks (same stopword-ratio rule as :func:`lang_id_expr`, applied
    per chunk) — the building block for code-switch / mixed-language
    detection.  let-bound internally: the token array is evaluated once
    per row even from an unstaged ``tokens_expr`` (the per-window slice
    otherwise re-tokenized once per window)."""
    stop = F.array(*[F.lit(s) for s in STOPWORDS])

    def body(toks: Column) -> Column:
        n = F.size(toks)
        n_win = F.ceil(n / F.lit(window)).cast("int")

        def one(i):
            win = F.slice(toks, (i - 1) * window + 1, F.lit(window))
            ratio = F.size(
                F.filter(win, lambda t: F.array_contains(stop, t))
            ) / F.greatest(F.size(win), F.lit(1))
            return F.when(
                ratio >= F.lit(LANG_EN_THRESHOLD), F.lit("en")
            ).otherwise(F.lit("und"))

        return F.when(
            n >= 1, F.transform(F.sequence(F.lit(1), n_win), one)
        ).otherwise(F.array().cast("array<string>"))

    return let_expr(tokens, body)


def flesch_exprs(
    text: Column | str, tokens: Column
) -> dict[str, Column]:
    """Flesch reading-ease counts (Flesch 1948, public literature) with
    the classic heuristics — sentences = number of ``[.!?]+`` runs in
    the raw text (min 1), syllables = vowel-run count per token (min
    1/token, ``[aeiouy]+`` on the lowercased tokens).  Pure per-row
    expressions — codegen'd, shuffle-free, UDF-free; the oracle mirrors
    the identical regexes (simple classes, identical in Java regex and
    RE2).  Pass a STAGED ``tokens`` projection (Column reuse inlines
    trees — CLAUDE.md), then stage these three counts and finish with
    :func:`flesch_micros_expr` over the staged columns."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        "n_words": F.size(tokens).cast("long"),
        "n_sentences": F.greatest(
            F.size(F.regexp_extract_all(c, F.lit("[.!?]+"), 0)),
            F.lit(1),
        ).cast("long"),
        "n_syllables": F.aggregate(
            tokens,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.greatest(
                F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), 0)),
                F.lit(1),
            ).cast("long"),
        ),
    }


def flesch_micros_expr(
    n_words: Column, n_sentences: Column, n_syllables: Column
) -> Column:
    """206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) in
    exact integer micro-units: both ratio terms are non-negative
    truncating divisions via the remainder-subtract device (products
    ≤ 8.5·10^13 for million-token documents — well inside the 53-bit
    exact window); the score itself may go negative on dense prose,
    plain BIGINT subtraction.  NULL when the document has no words."""

    def div(num: Column, den: Column) -> Column:
        return ((num - num % den) / den).cast("long")

    t1 = F.lit(1_015_000).cast("long") * n_words
    t2 = F.lit(84_600_000).cast("long") * n_syllables
    return F.when(
        n_words > 0,
        F.lit(206_835_000).cast("long")
        - div(t1, n_sentences)
        - div(t2, n_words),
    ).cast("long")
