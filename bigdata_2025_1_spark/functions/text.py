"""Text scalar functions (SURVEY §2.D) + text-analysis primitives for the
LLM-pipeline extensions (language ID, quality scoring, token counting,
fingerprinting). All pure built-in column expressions — no Python UDFs.

Cross-engine portability notes (these expressions are mirrored in DuckDB
oracle SQL): md5 → lowercase hex string in both engines, so "min md5
string" is a valid random-permutation MinHash without any hex→int cast;
regexp flavors (Java vs RE2) agree on every pattern used here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Reference scalar functions (SURVEY §2.D)
# ---------------------------------------------------------------------------


# Exact Python str.isspace() character set — what str.strip()/str.split()
# treat as whitespace. Embedded as LITERAL characters so Java regex, RE2
# (DuckDB), and Python agree exactly: regex \s is ASCII-only in Java/RE2
# but Unicode-wide in Python, and HTML-scraped corpora carry NBSP etc.
PY_WS = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
PY_WS_CLASS = f"[{PY_WS}]"
PY_STRIP_PATTERN = f"^{PY_WS_CLASS}+|{PY_WS_CLASS}+$"
# oracle-side mirror (same literal characters inside the SQL text)
SQL_PY_STRIP = f"regexp_replace({{0}}, '{PY_STRIP_PATTERN}', '', 'g')"
SQL_PY_WS_COLLAPSE = f"regexp_replace({{0}}, '{PY_WS_CLASS}+', ' ', 'g')"


def py_strip(col: Column) -> Column:
    r"""Python ``str.strip()`` parity: removes ALL Unicode whitespace at
    both ends (``F.trim``/SQL ``trim`` strip ASCII spaces only; regex \s
    misses NBSP & friends)."""
    return F.regexp_replace(col, PY_STRIP_PATTERN, "")


def normalize_ws(col: Column) -> Column:
    """' '.join(text.split()) parity (crawl/crawl.py:198-199) — Unicode
    whitespace runs collapse to one space, ends stripped."""
    return F.regexp_replace(py_strip(col), f"{PY_WS_CLASS}+", " ")


def collapse_dashes(col: Column) -> Column:
    """re.sub(r'-{2,}','') parity (crawl/crawl.py:226)."""
    return F.regexp_replace(col, "-{2,}", "")


def preview(col: Column, n: int = 100) -> Column:
    """100-char preview + '...' when longer (spark/consumer.py:88)."""
    return F.when(
        F.length(col) > n, F.concat(F.substring(col, 1, n), F.lit("..."))
    ).otherwise(col)


# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------


def ws_tokens(col: Column) -> Column:
    r"""ASCII-whitespace tokenization, empty tokens dropped.

    Deliberate deviation: Python .split() also splits on exotic Unicode
    whitespace; this family (shingles/token counts/lang-id) tokenizes on
    ASCII \s consistently in BOTH engine and oracle — a tokenization
    choice, not a parity bug (the strip/normalize family, which mirrors
    reference behavior verbatim, uses PY_WS_CLASS)."""
    return F.filter(F.split(F.trim(col), r"\s+", -1), lambda w: w != F.lit(""))


# BPE-ish pre-tokenizer: word pieces | numbers | single non-space symbols
# (the GPT-2 pre-tokenizer shape, simplified to an ASCII-safe regex that
# behaves identically under Java regex and RE2).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (regexp scan, no UDF)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

# Tiny per-language marker lexicons. A real system would use fastText or
# CLD3; this is a deterministic, SQL-expressible heuristic with the same
# *shape* (score per language → argmax) so the Spark plumbing is honest.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "es": ("el", "la", "que", "los", "es"),
    "fr": ("le", "la", "et", "les", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}


def lang_scores(col: Column) -> list[tuple[str, Column]]:
    toks = ws_tokens(F.lower(col))
    out = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        out.append((lang, score))
    return out


def lang_id(col: Column) -> Column:
    """argmax language by marker hits; ties and zero-hits → 'und'.

    Deterministic: languages compared in fixed order, strict > to win.
    """
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------


def quality_features(col: Column) -> dict[str, Column]:
    """Gopher/C4-style cheap quality signals, all JVM-side."""
    toks = ws_tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    mean_word_len = F.when(n_tok > 0, (alpha.cast("double") / n_tok))
    stop_arr = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tok.cast("bigint"),
        "alpha_ratio": F.when(n_chars > 0, alpha.cast("double") / n_chars),
        "digit_ratio": F.when(n_chars > 0, digits.cast("double") / n_chars),
        "punct_ratio": F.when(n_chars > 0, punct.cast("double") / n_chars),
        "mean_word_len": mean_word_len,
        "stopword_ratio": F.when(n_tok > 0, stop_hits.cast("double") / n_tok),
    }


# ---------------------------------------------------------------------------
# Shingles / fingerprints (dedup + similarity substrate)
# ---------------------------------------------------------------------------


def word_shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles from an ALREADY-TOKENIZED array column
    (callers that have tokenized once reuse the array instead of paying
    a second regex pass).

    Short-doc guard: ``F.sequence(1, 0)`` counts DOWN (step defaults to
    -1 when start > stop) and would then call slice(start=0) → runtime
    error; docs with fewer than k tokens must yield an empty shingle set
    explicitly."""
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.array_distinct(sh)


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined) of the lowercased text,
    order of first appearance irrelevant downstream (we only take mins /
    set ops over them)."""
    return word_shingles_from_tokens(ws_tokens(F.lower(col)), k)


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash via md5-string ordering with hex-rotation permutations.

    Each shingle is md5-hashed ONCE; permutation i orders shingles by the
    hex string rotated left by i chars (rot_i(h) = h[i:] || h[:i]), and
    the signature element is the lexicographic min under that ordering.
    One md5 pass instead of ``num_hashes`` seeded passes — 8x cheaper at
    100 TB — while hex-digit uniformity keeps the orderings effectively
    independent for banding. Exactly reproducible in DuckDB (same md5
    hex, same substr/|| rotation, same [0-9a-f] string collation).
    Null-safe: empty shingle set → array of nulls. num_hashes <= 32.
    """
    hashes = F.transform(shingles, lambda s: F.md5(s))

    def rotations(h: Column) -> Column:
        return F.array(
            *[
                h
                if i == 0
                else F.concat(
                    h.substr(F.lit(i + 1), F.lit(32 - i)), h.substr(F.lit(1), F.lit(i))
                )
                for i in range(num_hashes)
            ]
        )

    # Single left-fold: ``hashes`` appears ONCE in the expression tree.
    # Catalyst does not CSE across higher-order functions, so the naive
    # "array of num_hashes array_min(transform(...))" form recomputes the
    # md5 pass per signature element — this form hashes each shingle once.
    sentinel = F.array(*[F.lit("~") for _ in range(num_hashes)])  # '~' > 'f'
    mins = F.aggregate(
        hashes,
        sentinel,
        lambda acc, h: F.zip_with(acc, rotations(h), lambda a, b: F.least(a, b)),
    )
    # empty shingle set → null elements (array_min-of-empty semantics)
    return F.when(F.size(shingles) > 0, mins).otherwise(
        F.array(*[F.lit(None).cast("string") for _ in range(num_hashes)])
    )


def doc_fingerprint(col: Column, k: int = 3) -> Column:
    """Single-value document fingerprint: min md5 over k-shingles
    (a 1-hash MinHash — stable under reordering/duplication of content
    blocks, the property winnowing-style fingerprints are used for)."""
    return F.array_min(F.transform(word_shingles(col, k), lambda s: F.md5(s)))


ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def simhash_bits(col: Column, bits: int = 16) -> Column:
    """SimHash over whitespace tokens using md5 hex-char parity as the
    per-token bit source: bit j of token t = parity(hex digit j of md5(t)).
    Returns a bigint in [0, 2^bits). Portable: same md5, same parity rule
    in DuckDB SQL.

    Single md5 per token: fold token-hash array into a per-bit vote vector
    (one pass), then threshold votes into bits. Per-row, shuffle-free.
    """
    toks = ws_tokens(F.lower(col))
    hashes = F.transform(toks, lambda t: F.md5(t))

    def bit_votes(h: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.lit(bits)),
            lambda j: F.when(h.substr(j, F.lit(1)).isin(*ODD_HEX), F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    zero = F.array(*[F.lit(0) for _ in range(bits)])
    votes = F.aggregate(hashes, zero, lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, b: a + b))
    powers = F.array(*[F.lit(2**j) for j in range(bits)])
    return F.aggregate(
        F.zip_with(votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint"),
    )
