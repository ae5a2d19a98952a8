"""Merges-table-driven BPE token counting.

pack_sequences (llm/text.py) accepts any precomputed token-length column
via ``tokens_col``; this module supplies REAL byte-pair-encoding counts
in-engine (the reference pipeline has no analogue — this is
training-data surface; the cheap proxy token_count_bpe_ish remains the
fallback when no merges table ships).

Algorithm note that makes the whole design work: for a WELL-FORMED
merges table — every multi-character side of rule i is the output of
some rule j < i, single characters are base, and no two rules produce
the same output string — applying the rules SEQUENTIALLY in rank order,
each merging all of its occurrences left-to-right, yields exactly the
classic priority-queue BPE ("repeatedly merge the lowest-ranked pair
present", Sennrich et al. 2016; the gpt-2 bpe() loop): at the moment
rule r is applied no pair of rank < r can exist, because producing one
would need a rule that creates its symbols to run later than r, which
well-formedness plus output-distinctness forbids (a duplicate output
string is exactly the loophole that would let a later rule mint an
earlier rule's symbol).
``validate_merges`` enforces the property, so the two execution paths
below are provably identical and a SQL oracle can replay the sequential
form:

- ``token_count_bpe`` — pure Column: the document becomes a
  symbol-separated char stream (one regexp_replace), each merge rule is
  one literal ``F.replace`` (left-to-right, non-overlapping — exactly
  the sequential pass), and the count is a length difference. Zero
  shuffles, zero UDFs, whole-stage codegen; each rule costs one linear
  scan of the stream, so the plan grows O(|merges|) — guarded, intended
  for fixture/domain vocabularies (tens to a few hundred rules).
  ``bpe_count_sql`` emits the exactly-mirroring DuckDB expression.
- ``token_count_bpe_arrow`` — the production path for real vocabularies
  (a 50k-rule GPT-2-style table would bloat every task's plan as
  literals): merges ride a Spark BROADCAST variable (shipped once per
  executor, not per task), counting runs in an Arrow-batched
  mapInPandas with a per-batch piece memo — corpora are Zipfian, so
  almost every piece is a cache hit. Parity with the Column path is
  pytest-pinned on the fixture.

Pre-tokenization is BPE_ISH_PATTERN (word / number / symbol pieces);
merges never cross piece boundaries, matching real BPE pre-tokenizers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import BPE_ISH_PATTERN

#: every symbol in the char stream is wrapped START..SEP (start marker +
#: terminator). BOTH are required for literal replace to equal greedy
#: BPE: a terminator-only scheme lets a rule's pattern match the SUFFIX
#: of a longer symbol (wrong merge), and a single boundary shared
#: between adjacent matches would be consumed by the first match (missed
#: merge); with the wrap, rule (a, b) is the literal replace
#: START+a+SEP+START+b+SEP -> START+ab+SEP, matches can only align to
#: symbol starts, and adjacent matches share no characters — semantics
#: identical in Spark, DuckDB, and Python str.replace.
_START = "\x1d"
_SEP = "\x1f"
#: piece-boundary marker; validate_merges bans it from rule symbols, so
#: no merge can ever cross a piece boundary
_BREAK = "\x1e"

#: Unicode White_Space as an EXPLICIT class body — identical semantics in
#: Java regex (Spark), RE2 (DuckDB), and the Python `regex` module, unlike
#: bare `\s` (ASCII-only in Java/RE2, Unicode in Python): the control
#: whitespace chars + NEL + every Z-category codepoint (Zs holds space
#: and NBSP, Zl/Zp the line/paragraph separators).
_WS = r"\t\n\x0B\f\r\x85\p{Z}"

#: GPT-2's pre-tokenizer (Radford et al. 2019; the released gpt-2
#: encoder.py regex): contractions, space-prefixed letter / number /
#: symbol pieces, and whitespace runs that yield their FINAL char to the
#: following piece. Reference form — it contains a lookahead, so only
#: the Python `regex` module can run it; the engines run the marked
#: equivalent below (equality pytest-pinned).
GPT2_PATTERN = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+"
    rf"| ?[^{_WS}\p{{L}}\p{{N}}]+"
    rf"|[{_WS}]+(?![^{_WS}])|[{_WS}]+"
)

#: Engine-portable equivalent: RE2 (the DuckDB oracle) has no
#: lookarounds, so `\s+(?!\S)` cannot ship. Instead a MARKER PRE-PASS
#: (regexp_replace of (ws)(non-ws) -> BREAK + both chars) inserts \x1E
#: before the final whitespace char of every run that precedes a piece —
#: exactly the split the lookahead encodes — after which this
#: lookahead-free alternation tokenizes identically: the marker matches
#: no branch (excluded from the symbol class, not whitespace), so it
#: acts as a pure boundary and extraction drops it. Matches must align:
#: a whitespace run mid-text now ends at the marker (`[ws]+` cannot
#: cross it) and the run-final space attaches to the next piece via the
#: branches' literal ' ?' prefix, exactly as in GPT2_PATTERN.
_GPT2_MARK_RE = rf"([{_WS}])([^{_WS}])"
GPT2_MARKED_PATTERN = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+"
    rf"| ?[^{_WS}\p{{L}}\p{{N}}\x1D-\x1F]+"
    rf"|[{_WS}]+"
)

_PRETOKENIZERS = ("bpe_ish", "gpt2")


def _check_pretokenizer(pretokenizer: str) -> None:
    if pretokenizer not in _PRETOKENIZERS:
        raise ValueError(
            f"pretokenizer must be one of {_PRETOKENIZERS}, "
            f"got {pretokenizer!r}"
        )


def _pieces_col(clean: Column, pretokenizer: str) -> Column:
    """Pre-tokenized pieces of an already-neutralized text Column."""
    if pretokenizer == "gpt2":
        marked = F.regexp_replace(
            clean, _GPT2_MARK_RE, _BREAK + "$1$2"
        )
        return F.regexp_extract_all(marked, F.lit(GPT2_MARKED_PATTERN), 0)
    return F.regexp_extract_all(clean, F.lit(BPE_ISH_PATTERN), 0)


def _sql_regex(pat: str) -> str:
    """DuckDB string literal for a regex pattern (quote-doubling only —
    standard strings keep backslashes literal)."""
    return "'" + pat.replace("'", "''") + "'"


def _pieces_sql(text_expr: str, pretokenizer: str) -> str:
    """The DuckDB list expression mirroring _pieces_col exactly."""
    if pretokenizer == "gpt2":
        marked = (
            f"regexp_replace({text_expr}, {_sql_regex(_GPT2_MARK_RE)}, "
            f"chr({ord(_BREAK)}) || '\\1\\2', 'g')"
        )
        return (
            f"regexp_extract_all({marked}, "
            f"{_sql_regex(GPT2_MARKED_PATTERN)}, 0)"
        )
    return f"regexp_extract_all({text_expr}, '{BPE_ISH_PATTERN}', 0)"


def _pieces_py(pretokenizer: str):
    """text -> list of pieces, for the Arrow kernel and the learner's
    model checks — same algorithm as _pieces_col (marked pre-pass, no
    lookahead), via the `regex` module for the \\p classes."""
    if pretokenizer == "gpt2":
        try:
            import regex as rx
        except ImportError as exc:  # pragma: no cover - present in CI
            raise RuntimeError(
                "the gpt2 pretokenizer's Python path needs the 'regex' "
                "module for \\p{L}/\\p{N}/\\p{Z} classes"
            ) from exc
        mark = rx.compile(_GPT2_MARK_RE)
        pat = rx.compile(GPT2_MARKED_PATTERN)
        return lambda t: pat.findall(mark.sub("\x1e\\1\\2", t))
    import re

    return re.compile(BPE_ISH_PATTERN).findall


#: deterministic fixture: 32 well-formed English-ish merges (char pairs
#: first, compounds only from earlier outputs) — the "real merges table"
#: stand-in for tests/oracles; swap in a learned table in production
BPE_FIXTURE_MERGES: "tuple[tuple[str, str], ...]" = (
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"), ("e", "s"),
    ("s", "t"), ("a", "l"), ("o", "u"), ("a", "r"), ("l", "e"),
    ("th", "e"), ("in", "g"), ("an", "d"), ("i", "s"), ("i", "t"),
    ("o", "f"), ("t", "o"), ("e", "d"), ("c", "h"), ("ch", "ar"),
    ("er", "s"), ("on", "e"), ("re", "s"), ("the", "re"), ("1", "9"),
    ("2", "0"), ("s", "e"),
)

#: Column-path guard: above this the nested-replace plan (and the
#: mirrored SQL) stops being a sane literal payload — use the Arrow path
MAX_COLUMN_MERGES = 512

#: the fixture's byte-level (hex-pair) image, defined after
#: to_byte_rules below — assigned at module bottom
BPE_FIXTURE_MERGES_BYTES: "tuple[tuple[str, str], ...]" = ()


def validate_merges(
    merges: "list[tuple[str, str]] | tuple[tuple[str, str], ...]",
    base_len: int = 1,
) -> "list[tuple[str, str]]":
    """Check well-formedness (the property the sequential == priority
    equivalence rests on) and return the merges as a list. `base_len`
    is the string length of an ATOMIC symbol — 1 for codepoint chars,
    2 for byte-level hex pairs."""
    out: "list[tuple[str, str]]" = []
    produced: set[str] = set()
    for i, rule in enumerate(merges):
        a, b = rule
        for side in (a, b):
            if not side:
                raise ValueError(f"rule {i}: empty symbol")
            if _SEP in side or _BREAK in side or _START in side:
                raise ValueError(
                    f"rule {i}: symbol contains a reserved separator char"
                )
            if len(side) > base_len and side not in produced:
                raise ValueError(
                    f"rule {i}: symbol {side!r} is not produced by an "
                    f"earlier rule — merges table is not well-formed "
                    f"(sequential application would diverge from BPE)"
                )
        if a + b in produced:
            # two rules with the same output string would let a LATER
            # rule mint new occurrences of an EARLIER rule's pair,
            # breaking the sequential == priority equivalence
            raise ValueError(
                f"rule {i}: output {a + b!r} duplicates an earlier rule's"
            )
        produced.add(a + b)
        out.append((a, b))
    return out


#: the C0 control chars every path maps to a space before
#: pre-tokenization: \x1d-\x1f because the stream encoding reserves
#: them (a literal \x1f in a piece reads as an extra terminator —
#: miscount and false merges), and \x1c because Python's \s — hence the
#: released GPT-2 tokenizer — treats all four file/group/record/unit
#: separators as whitespace while _WS (Z-category-based, engine-
#: portable) does not: mapping them to ' ' keeps them whitespace-shaped
#: on every engine. Residual documented divergence from the released
#: tokenizer: a whitespace RUN containing these chars tokenizes as if
#: they were spaces (the run structure is preserved, the codepoints are
#: not). _RESERVED_RE in Spark/Python, the chr()-built class in
#: bpe_count_sql.
_RESERVED_LO = "\x1c"
_RESERVED_RE = "[\x1c-\x1f]"


def _char_stream(
    text_col: Column, level: str = "chars", pretokenizer: str = "bpe_ish"
) -> "tuple[Column, Column]":
    """(symbol stream, piece count): pieces joined by BREAK, every
    symbol wrapped START..SEP. level='chars' wraps each codepoint;
    level='bytes' hex-encodes the UTF-8 byte stream and wraps each hex
    PAIR — one symbol per byte, the GPT-2-family regime, with the BREAK
    byte surfacing as the '1E' pair (banned from rule symbols, so no
    merge crosses pieces). The char wrap runs (?s) because gpt2 pieces
    (leading-space tokens, whitespace runs) may contain newlines —
    identical DOTALL semantics in Java regex and RE2. Reserved
    separator chars in the INPUT are mapped to spaces first — they act
    as piece boundaries, never as framing."""
    clean = F.regexp_replace(text_col, _RESERVED_RE, " ")
    pieces = _pieces_col(clean, pretokenizer)
    joined = F.array_join(pieces, _BREAK)
    if level == "bytes":
        stream = F.regexp_replace(
            F.hex(F.encode(joined, "UTF-8")),
            "(..)", _START + "$1" + _SEP,
        )
    else:
        stream = F.regexp_replace(joined, "(?s)(.)", _START + "$1" + _SEP)
    return stream, F.size(pieces)


#: hex pairs a byte-level rule symbol may never contain (they are the
#: framing bytes' hex images; input text never produces them after the
#: reserved-char neutralization, and a rule containing one could merge
#: across piece boundaries)
_FORBIDDEN_BYTE_PAIRS = {"1D", "1E", "1F"}


def _base_len(level: str) -> int:
    """Atomic-symbol string length for a level; validates the level."""
    if level not in ("chars", "bytes"):
        raise ValueError(f"level must be 'chars' or 'bytes', got {level!r}")
    return 2 if level == "bytes" else 1


def _check_level(rules: "list[tuple[str, str]]", level: str) -> None:
    _base_len(level)
    if level == "bytes":
        import re as _re

        for i, (a, b) in enumerate(rules):
            for side in (a, b):
                if len(side) % 2 or not _re.fullmatch(r"[0-9A-F]+", side):
                    raise ValueError(
                        f"rule {i}: byte-level symbols are UPPERCASE hex "
                        f"pairs, got {side!r}"
                    )
                if any(side[j:j + 2] in _FORBIDDEN_BYTE_PAIRS
                       for j in range(0, len(side), 2)):
                    raise ValueError(
                        f"rule {i}: symbol {side!r} contains a framing "
                        f"byte's hex pair"
                    )


def piece_symbols(piece: str, level: str = "chars") -> "list[str]":
    """The initial symbol sequence of one pre-tokenized piece: its
    codepoints, or its UTF-8 bytes as uppercase hex pairs."""
    if level == "bytes":
        h = piece.encode("utf-8").hex().upper()
        return [h[i:i + 2] for i in range(0, len(h), 2)]
    return list(piece)


def to_byte_rules(rules: "list[tuple[str, str]]") -> "list[tuple[str, str]]":
    """Map char-level rules over ASCII symbols to their byte-level
    (hex-pair) images — well-formedness is preserved because the map is
    a homomorphism on concatenation."""
    return [
        (a.encode("utf-8").hex().upper(), b.encode("utf-8").hex().upper())
        for a, b in rules
    ]


def token_count_bpe(
    df: DataFrame,
    merges: "list[tuple[str, str]] | None" = None,
    text_col: str = "text",
    out_col: str = "n_tokens",
    level: str = "chars",
    pretokenizer: str = "bpe_ish",
) -> DataFrame:
    """Exact BPE token count as a pure Column expression (see module
    docstring). The SEP count equals symbols + piece boundaries, so
    n_tokens = seps - (pieces - 1); empty text has zero pieces and zero
    tokens."""
    if merges is None:
        merges = (BPE_FIXTURE_MERGES_BYTES if level == "bytes"
                  else BPE_FIXTURE_MERGES)
    rules = validate_merges(merges, base_len=_base_len(level))
    _check_level(rules, level)
    _check_pretokenizer(pretokenizer)
    if len(rules) > MAX_COLUMN_MERGES:
        raise ValueError(
            f"{len(rules)} merges exceeds MAX_COLUMN_MERGES="
            f"{MAX_COLUMN_MERGES}: the nested-replace plan would embed "
            f"every rule as a task-side literal — use token_count_bpe_arrow"
        )
    s, n_pieces = _char_stream(F.col(text_col), level, pretokenizer)
    for a, b in rules:
        s = F.replace(
            s,
            F.lit(_START + a + _SEP + _START + b + _SEP),
            F.lit(_START + a + b + _SEP),
        )
    seps = F.length(s) - F.length(F.replace(s, F.lit(_SEP), F.lit("")))
    n = F.when(n_pieces == 0, F.lit(0)).otherwise(seps - (n_pieces - 1))
    return df.withColumn(out_col, n.cast("long"))


def _sql_str(s: str) -> str:
    """DuckDB string literal for text that may contain the control-char
    separators — quoted runs joined with chr() calls."""
    parts: list[str] = []
    run = ""
    for ch in s:
        if ch in (_SEP, _BREAK, _START):
            if run:
                parts.append("'" + run.replace("'", "''") + "'")
                run = ""
            parts.append(f"chr({ord(ch)})")
        else:
            run += ch
    if run:
        parts.append("'" + run.replace("'", "''") + "'")
    return " || ".join(parts) if parts else "''"


def bpe_count_sql(
    text_expr: str = "text",
    merges: "list[tuple[str, str]] | None" = None,
    level: str = "chars",
    pretokenizer: str = "bpe_ish",
) -> str:
    """The DuckDB scalar expression mirroring token_count_bpe exactly
    (DuckDB replace() is the same literal left-to-right non-overlapping
    substitution as F.replace; DuckDB hex(encode(..)) is the same
    uppercase hex byte image as F.hex(F.encode(..)))."""
    if merges is None:
        merges = (BPE_FIXTURE_MERGES_BYTES if level == "bytes"
                  else BPE_FIXTURE_MERGES)
    rules = validate_merges(merges, base_len=_base_len(level))
    _check_level(rules, level)
    _check_pretokenizer(pretokenizer)
    # mirror _char_stream's reserved-char neutralization exactly
    text_expr = (
        f"regexp_replace({text_expr}, "
        f"'[' || chr({ord(_RESERVED_LO)}) || '-' || chr({ord(_SEP)}) || ']', "
        f"' ', 'g')"
    )
    pieces = _pieces_sql(text_expr, pretokenizer)
    joined = f"array_to_string({pieces}, chr({ord(_BREAK)}))"
    if level == "bytes":
        s = (
            f"regexp_replace(hex(encode({joined})), "
            f"'(..)', chr({ord(_START)}) || '\\1' || chr({ord(_SEP)}), 'g')"
        )
    else:
        s = (
            f"regexp_replace({joined}, "
            f"'(?s)(.)', chr({ord(_START)}) || '\\1' || chr({ord(_SEP)}), 'g')"
        )
    for a, b in rules:
        s = (
            f"replace({s}, {_sql_str(_START + a + _SEP + _START + b + _SEP)}, "
            f"{_sql_str(_START + a + b + _SEP)})"
        )
    np = f"len({pieces})"
    seps = f"length({s}) - length(replace({s}, chr({ord(_SEP)}), ''))"
    return (
        f"CAST(CASE WHEN {np} = 0 THEN 0 "
        f"ELSE ({seps}) - ({np} - 1) END AS BIGINT)"
    )


def count_piece(piece: str, ranks: "dict[tuple[str, str], int]",
                level: str = "chars") -> int:
    """Reference Python BPE (the priority-queue form) for one
    pre-tokenized piece — the Arrow path's kernel, importable for
    model-checking against the Column path."""
    syms = piece_symbols(piece, level)
    while len(syms) > 1:
        best_rank = None
        a = b = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, a, b = r, syms[i], syms[i + 1]
        if best_rank is None:
            break
        # ONE merge kernel for counter and learner: the sequential ==
        # priority equivalence depends on identical non-overlap
        # semantics, so there must be a single definition to diverge
        syms = _merge_all(syms, a, b)
    return len(syms)


def token_count_bpe_arrow(
    df: DataFrame,
    merges: "list[tuple[str, str]] | None" = None,
    text_col: str = "text",
    out_col: str = "n_tokens",
    level: str = "chars",
    pretokenizer: str = "bpe_ish",
) -> DataFrame:
    """Exact BPE token count for production-size vocabularies: merges as
    ONE broadcast variable (per-executor, not per-task/plan), counting
    in Arrow-batched mapInPandas with a per-batch piece memo (Zipfian
    corpora make the memo hit rate extreme). Identical output to
    token_count_bpe — parity is pytest-pinned on the fixture."""
    import re

    from pyspark.sql.types import LongType, StructField, StructType

    if merges is None:
        merges = (BPE_FIXTURE_MERGES_BYTES if level == "bytes"
                  else BPE_FIXTURE_MERGES)
    rules = validate_merges(merges, base_len=_base_len(level))
    _check_level(rules, level)
    _check_pretokenizer(pretokenizer)
    if pretokenizer == "gpt2":
        _pieces_py("gpt2")  # fail fast on the driver if `regex` is absent
    ranks = {pair: i for i, pair in enumerate(rules)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType())]
    )
    pretok = pretokenizer

    reserved = _RESERVED_RE

    lvl = level

    def count_batches(batches):
        rk = bc.value
        find_pieces = _pieces_py(pretok)
        strip = re.compile(reserved)
        memo: dict[str, int] = {}

        def n_tokens(text):
            if text is None:  # NULL in, NULL out — matches the Column path
                return None
            if not text:
                return 0
            total = 0
            for p in find_pieces(strip.sub(" ", text)):
                c = memo.get(p)
                if c is None:
                    c = count_piece(p, rk, lvl)
                    memo[p] = c
                total += c
            return total

        for pdf in batches:
            yield pdf.assign(**{out_col: pdf[text_col].map(n_tokens)})

    return df.mapInPandas(count_batches, schema)


def _merge_all(syms: "list[str]", a: str, b: str) -> "list[str]":
    """Greedy left-to-right merge of every (a, b) adjacency — the same
    non-overlap semantics as literal replace."""
    out: "list[str]" = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_distinct_pieces: int = 1_000_000,
    level: str = "chars",
    pretokenizer: str = "bpe_ish",
) -> "list[tuple[str, str]]":
    """LEARN a merges table from the corpus (Sennrich et al. 2016) —
    the other half of the BPE story: the result is well-formed by
    construction and feeds token_count_bpe / token_count_bpe_arrow
    directly.

    Scale split: the CORPUS work is one distributed pass — pre-tokenize
    and count DISTINCT pieces (Zipf makes this table tiny next to the
    corpus; bounded by `max_distinct_pieces`, the eval_gram_set /
    IVF-centroid collect budget). The iterative pair-count/merge loop
    then runs driver-side over that weighted vocabulary — the classic
    algorithm, deterministic by construction: ties break on (count
    desc, pair lexicographic asc), so the same corpus always yields the
    same table on any cluster, any partitioning.

    Reserved framing chars are neutralized exactly like the counters,
    and learned symbols can therefore never contain them."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    _check_level([], level)
    _check_pretokenizer(pretokenizer)
    clean = F.regexp_replace(F.col(text_col), _RESERVED_RE, " ")
    counted = (
        df.select(
            F.explode(_pieces_col(clean, pretokenizer)).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # guard BEFORE collecting: the budget exists to protect the driver,
    # so it must fire without materializing the oversized table there
    over = counted.limit(max_distinct_pieces + 1).count()
    if over > max_distinct_pieces:
        raise ValueError(
            f"distinct pieces exceed max_distinct_pieces="
            f"{max_distinct_pieces}; pre-filter the corpus or raise the "
            f"budget"
        )
    rows = counted.collect()
    vocab: "dict[tuple[str, ...], int]" = {
        tuple(piece_symbols(r["piece"], level)): r["c"] for r in rows
    }
    # Incremental learner (the classic subword-nmt optimization): pair
    # counts update only for the pieces a merge actually touches
    # (inverted index pair -> piece ids), and the argmax is a
    # lazy-deletion heap keyed (-count, pair) — so a merge costs
    # O(affected pieces + log updates) instead of a full vocabulary
    # recount, making tens of thousands of merges tractable. Selection
    # order is IDENTICAL to the naive recount (count desc, pair
    # lexicographic asc — fully deterministic), pinned by the
    # reference-implementation equality test.
    import heapq

    pieces: "list[list[str]]" = []
    weights: "list[int]" = []
    for syms, c in vocab.items():
        pieces.append(list(syms))
        weights.append(c)

    pair_counts: "dict[tuple[str, str], int]" = {}
    pair_pieces: "dict[tuple[str, str], set[int]]" = {}
    heap: "list[tuple[int, tuple[str, str]]]" = []

    def apply_pairs(idx: int, sign: int) -> None:
        syms = pieces[idx]
        c = weights[idx] * sign
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            nc = pair_counts.get(p, 0) + c
            pair_counts[p] = nc
            if sign > 0:
                pair_pieces.setdefault(p, set()).add(idx)
            # push on EVERY change while positive: decreases must leave
            # a fresh entry too, or the stale higher one at the top
            # would be discarded with nothing underneath to find
            if nc > 0:
                heapq.heappush(heap, (-nc, p))

    for idx in range(len(pieces)):
        apply_pairs(idx, +1)

    merges: "list[tuple[str, str]]" = []
    produced: set[str] = set()
    while len(merges) < n_merges:
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) != -negc:
                continue  # stale entry
            # a pair whose output string an earlier rule already
            # produced would break the sequential==priority equivalence
            if p[0] + p[1] in produced:
                continue
            best = p
            break
        if best is None:
            break
        merges.append(best)
        produced.add(best[0] + best[1])
        a, b = best
        for idx in sorted(pair_pieces.get(best, ())):
            syms = pieces[idx]
            if not any(
                syms[i] == a and syms[i + 1] == b
                for i in range(len(syms) - 1)
            ):
                continue  # stale index entry
            apply_pairs(idx, -1)
            pieces[idx] = _merge_all(syms, a, b)
            apply_pairs(idx, +1)
    return validate_merges(merges, base_len=_base_len(level))


BPE_FIXTURE_MERGES_BYTES = tuple(to_byte_rules(list(BPE_FIXTURE_MERGES)))

#: the fixture extended with LEADING-SPACE merges — the GPT-2 hallmark
#: (' the' as one token) that only the gpt2 pretokenizer can feed:
#: bpe_ish pieces never contain spaces, so these rules are dead under it.
#: Well-formed: 'the' is produced by the base fixture's ('th','e').
GPT2_FIXTURE_MERGES: "tuple[tuple[str, str], ...]" = BPE_FIXTURE_MERGES + (
    (" ", "the"), (" ", "a"), (" ", "to"),
)
GPT2_FIXTURE_MERGES_BYTES = tuple(to_byte_rules(list(GPT2_FIXTURE_MERGES)))
