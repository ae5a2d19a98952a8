"""Merges-table BPE token counting: Column path == Arrow path ==
priority-queue Python model, validator guards, config-op dispatch."""

import re

import pytest

from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.llm.bpe import (
    BPE_FIXTURE_MERGES,
    MAX_COLUMN_MERGES,
    bpe_count_sql,
    count_piece,
    token_count_bpe,
    token_count_bpe_arrow,
    validate_merges,
)
from configurable_etl_python_repo_spark.llm.text import BPE_ISH_PATTERN
from configurable_etl_python_repo_spark.plans import Engine, OpSpec

#: adversarial cases: overlap chains (aaaa), merges whose output is a
#: substring of later text (thethe), suffix traps (erer: the 'r␟e␟'
#: suffix-match bug the wrapped encoding exists to prevent), unicode,
#: punctuation/number pieces, empties
ADVERSARIAL = [
    (1, "There is another character in the测试 20 there there"),
    (2, ""),
    (3, None),
    (4, "aaaa tttthhhh ananan anand thethe"),
    (5, "the quick brown fox, 1999-2020!! it is resting & ingesting"),
    (6, "thereresthere ererer ononeone"),
    (7, "a"),
    (8, "   \t  "),
    # reserved framing chars IN the text: must act as piece boundaries
    # on every path, never corrupt the stream encoding
    (9, "a\x1fb and\x1dthe\x1ethe \x1d\x1e\x1f"),
]


def _model_counts(texts):
    ranks = {p: i for i, p in enumerate(validate_merges(BPE_FIXTURE_MERGES))}
    pre = re.compile(BPE_ISH_PATTERN)
    strip = re.compile("[\x1d-\x1f]")
    out = {}
    for i, t in texts:
        out[i] = (
            None
            if t is None
            else sum(
                count_piece(p, ranks)
                for p in pre.findall(strip.sub(" ", t))
            )
        )
    return out


def test_bpe_column_equals_arrow_equals_model(spark):
    df = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    col = {r["doc_id"]: r["n_tokens"] for r in token_count_bpe(df).collect()}
    arr = {
        r["doc_id"]: r["n_tokens"] for r in token_count_bpe_arrow(df).collect()
    }
    assert col == arr == _model_counts(ADVERSARIAL)
    assert col[3] is None  # NULL in, NULL out on every path
    assert col[2] == 0 and col[8] == 0


def test_bpe_paths_agree_on_corpus(spark, sf_dir):
    """Column == Arrow over the real documents fixture (the Zipfian memo
    path gets exercised), and counts are >= the proxy's piece count
    (every piece yields at least one symbol)."""
    from configurable_etl_python_repo_spark.llm.text import token_count_bpe_ish

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    col = token_count_bpe(docs).withColumnRenamed("n_tokens", "c")
    arr = token_count_bpe_arrow(docs).withColumnRenamed("n_tokens", "a")
    prox = token_count_bpe_ish(docs).withColumnRenamed("n_tokens", "p")
    j = (
        col.select("doc_id", "c")
        .join(arr.select("doc_id", "a"), "doc_id")
        .join(prox.select("doc_id", "p"), "doc_id")
    )
    bad = j.where((F.col("c") != F.col("a")) | (F.col("c") < F.col("p")))
    assert bad.count() == 0


def test_validate_merges_rejects_malformed():
    with pytest.raises(ValueError, match="not produced by an earlier"):
        validate_merges([("wh", "ich")])
    with pytest.raises(ValueError, match="duplicates an earlier"):
        validate_merges([("a", "b"), ("a", "b")])
    with pytest.raises(ValueError, match="reserved"):
        validate_merges([("a", "\x1f")])
    with pytest.raises(ValueError, match="empty"):
        validate_merges([("", "x")])
    # well-formed passes and returns a list of tuples
    assert validate_merges((("a", "b"), ("ab", "c"))) == [
        ("a", "b"), ("ab", "c"),
    ]


def test_column_path_guard_and_sql_mirror():
    # a long well-formed chain a+b, ab+c, abc+d, ... to trip the guard
    chain = [("a", "b")]
    sym = "ab"
    for i in range(MAX_COLUMN_MERGES + 1):
        nxt = chr(97 + (i + 2) % 26)
        chain.append((sym, nxt))
        sym += nxt
    with pytest.raises(ValueError, match="MAX_COLUMN_MERGES"):
        token_count_bpe(None, merges=chain)
    # the SQL mirror embeds the control chars as chr() calls, never raw
    sql = bpe_count_sql("text")
    assert "chr(29)" in sql and "chr(31)" in sql and "chr(30)" in sql
    assert "\x1d" not in sql and "\x1f" not in sql


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


def _seq_count_via_replace(piece: str, rules) -> int:
    """Pure-Python simulation of the Column path: wrapped-symbol stream,
    one literal str.replace per rule in rank order (str.replace has the
    same left-to-right non-overlap semantics as F.replace/DuckDB)."""
    START, SEP = "\x1d", "\x1f"
    s = "".join(START + c + SEP for c in piece)
    for a, b in rules:
        s = s.replace(START + a + SEP + START + b + SEP, START + a + b + SEP)
    return s.count(SEP)


def _random_wellformed_merges(draw):
    """A random WELL-FORMED merges table over a 3-letter alphabet:
    each rule's sides drawn from {single chars} ∪ {earlier outputs},
    duplicate outputs discarded — tiny alphabet maximizes overlap and
    adjacent-merge collisions (the hard cases)."""
    alphabet = ["a", "b", "c"]
    n_rules = draw(st.integers(min_value=0, max_value=12))
    produced: list[str] = []
    rules = []
    for _ in range(n_rules):
        pool = alphabet + produced
        a = pool[draw(st.integers(0, len(pool) - 1))]
        b = pool[draw(st.integers(0, len(pool) - 1))]
        if a + b in set(produced):
            continue
        rules.append((a, b))
        produced.append(a + b)
    return rules


if HAVE_HYPOTHESIS:

    @settings(max_examples=300, deadline=None)
    @given(st.data())
    def test_sequential_replace_equals_priority_bpe_property(data):
        """THE theorem the Column path and SQL oracle rest on: for any
        well-formed merges table, sequential rank-order literal
        replacement over the wrapped-symbol stream == priority-queue
        BPE. Random tables over a 3-letter alphabet + random strings
        (overlap chains, self-adjacent merges, symbols that are
        substrings of other symbols)."""
        rules = _random_wellformed_merges(data.draw)
        rules = validate_merges(rules)  # must accept its own construction
        ranks = {p: i for i, p in enumerate(rules)}
        piece = data.draw(st.text(alphabet="abc", max_size=14))
        assert _seq_count_via_replace(piece, rules) == (
            count_piece(piece, ranks) if piece else 0
        )


def test_bpe_as_config_ops(spark):
    eng = Engine(spark)
    df = spark.createDataFrame(
        [(1, "the theatre is there")], ["doc_id", "text"]
    )
    eng.bind("docs", df)
    out = eng.run_op(OpSpec("TOKEN COUNT BPE", "t", ["docs"], {}))
    (row,) = out.collect()
    arrow = eng.run_op(OpSpec(
        "TOKEN COUNT BPE ARROW", "ta", ["docs"],
        {"merges": [["t", "h"], ["th", "e"]]},
    ))
    (arow,) = arrow.collect()
    # with only t+h,th+e: 'the'->1, 'theatre'->the,a,t,r,e=5, 'is'->2,
    # 'there'->the,r,e=3
    assert arow["n_tokens"] == 11
    assert row["n_tokens"] <= arow["n_tokens"]  # fixture has more merges


def test_learn_bpe_merges_hand_computed(spark):
    """Sennrich learning on a tiny corpus: 'low' x3 + 'lower' x1 ->
    first merge is (l,o) (count 4), then (lo,w) (count 4), then ties
    break lexicographically; the result is well-formed by construction
    and drives token_count_bpe directly."""
    from configurable_etl_python_repo_spark.llm.bpe import (
        learn_bpe_merges, token_count_bpe, validate_merges,
    )

    df = spark.createDataFrame(
        [(1, "low low low lower")], ["doc_id", "text"]
    )
    merges = learn_bpe_merges(df, 3)
    assert merges[0] == ("l", "o") and merges[1] == ("lo", "w")
    assert validate_merges(merges) == merges  # well-formed

    counted = {r["doc_id"]: r["n_tokens"]
               for r in token_count_bpe(df, merges=merges).collect()}
    # after (l,o),(lo,w),(low,e): low=1 token x3, lower = low+e? ->
    # third merge is (low, e) (count 1; lexicographic among count-1
    # pairs: ('e','r') < ('low','e')!) -- just assert monotonicity
    fewer = {r["doc_id"]: r["n_tokens"]
             for r in token_count_bpe(df, merges=merges[:1]).collect()}
    assert counted[1] <= fewer[1]


def test_learn_bpe_merges_deterministic_and_partition_invariant(spark, sf_dir):
    from configurable_etl_python_repo_spark.llm.bpe import learn_bpe_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    a = learn_bpe_merges(docs, 12)
    b = learn_bpe_merges(docs.repartition(7), 12)
    assert a == b and len(a) == 12
    # learned merges compose with the counters end-to-end
    from configurable_etl_python_repo_spark.llm.bpe import (
        token_count_bpe, token_count_bpe_arrow,
    )

    d2 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    col = {r["doc_id"]: r["n_tokens"]
           for r in token_count_bpe(d2, merges=a).collect()}
    arr = {r["doc_id"]: r["n_tokens"]
           for r in token_count_bpe_arrow(d2, merges=a).collect()}
    assert col == arr


def test_learn_bpe_merges_matches_reference_implementation(spark):
    """The driver-side loop equals a naive Sennrich reference (count all
    pairs over the expanded corpus, merge argmax) on a mixed corpus."""
    from configurable_etl_python_repo_spark.llm.bpe import (
        _merge_all, learn_bpe_merges,
    )
    import re

    texts = ["the cat sat on the mat", "that hat is the best hat",
             "cats chat, hats that matter"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    got = learn_bpe_merges(df, 8)

    # reference: expanded piece list (no distinct-weighting)
    pre = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    corpus = [list(p) for t in texts for p in pre.findall(t)]
    produced = set()
    expect = []
    for _ in range(8):
        pc = {}
        for syms in corpus:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + 1
        cand = {p: c for p, c in pc.items() if p[0] + p[1] not in produced}
        if not cand:
            break
        best = min(cand.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append(best)
        produced.add(best[0] + best[1])
        corpus = [_merge_all(s, *best) for s in corpus]
    assert got == expect


def test_byte_level_parity_and_ascii_invariant(spark):
    """level='bytes': Column == Arrow == DuckDB mirror; pure-ASCII text
    counts identically at both levels (1 byte == 1 char there), and
    multibyte text costs MORE byte symbols; NULL/empty unchanged."""
    import duckdb

    from configurable_etl_python_repo_spark.llm.bpe import bpe_count_sql

    texts = [(i, t) for i, t in enumerate([
        "There is another character in the测试 20 there there",
        "", None, "ascii only the cat resting 1999",
        "emoji 🙂 and dashes — multibyte", "a\x1fb\x1e\x1d framing",
    ])]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    colb = {r["doc_id"]: r["n_tokens"]
            for r in token_count_bpe(df, level="bytes").collect()}
    arrb = {r["doc_id"]: r["n_tokens"]
            for r in token_count_bpe_arrow(df, level="bytes").collect()}
    colc = {r["doc_id"]: r["n_tokens"] for r in token_count_bpe(df).collect()}
    assert colb == arrb
    assert colb[3] == colc[3]          # pure ASCII: byte == char
    assert colb[4] > colc[4]           # multibyte costs more bytes
    assert colb[1] == 0 and colb[2] is None
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", texts)
    duck = {r[0]: r[1] for r in con.execute(
        "SELECT doc_id, " + bpe_count_sql("text", level="bytes") + " FROM t"
    ).fetchall()}
    assert duck == colb


def test_byte_level_learner_roundtrip(spark):
    """learn_bpe_merges(level='bytes') yields hex-pair rules that are
    well-formed at base_len=2, drive both counters identically, and on
    ASCII corpora mirror the char-level learner's merges exactly (the
    hex map is a homomorphism)."""
    from configurable_etl_python_repo_spark.llm.bpe import (
        learn_bpe_merges, to_byte_rules,
    )

    df = spark.createDataFrame(
        [(1, "low low low lower the the cafe")], ["doc_id", "text"]
    )
    merges_b = learn_bpe_merges(df, 6, level="bytes")
    merges_c = learn_bpe_merges(df, 6)
    assert merges_b == to_byte_rules(merges_c)  # ASCII corpus: same tree
    colb = token_count_bpe(df, merges=merges_b, level="bytes").collect()
    arrb = token_count_bpe_arrow(df, merges=merges_b,
                                 level="bytes").collect()
    assert colb[0]["n_tokens"] == arrb[0]["n_tokens"]


def test_byte_level_validation():
    from configurable_etl_python_repo_spark.llm.bpe import (
        token_count_bpe as tc,
    )

    with pytest.raises(ValueError, match="hex pairs"):
        tc(None, merges=[("t", "h")], level="bytes")   # char symbols
    with pytest.raises(ValueError, match="framing byte"):
        tc(None, merges=[("1E", "41")], level="bytes")
    with pytest.raises(ValueError, match="level must be"):
        tc(None, merges=[("41", "42")], level="nibbles")


# --------------------------- GPT-2 pre-tokenizer ---------------------------

GPT2_TRICKY = [
    "He's sure we'll don't I'm you're they've I'd",
    "the  quick   brown\tfox\n\nover  the lazy dog  ",
    " leading space", "trailing run   ", "tabs\t\t\tx", "a\nb",
    "mixed 42abc 3.14 (par)en!!  ,comma 'quote'",
    "HE'S SHOUTY 'S s't", "x 's detached", "",
    "unicode café naïve 测试  nbsp emsp",
    " linesep parsep \x85nel", "   ", "\n \t mixed run \r\n x",
]


def test_gpt2_marked_equals_lookahead_reference():
    """The engine-portable marked algorithm must tokenize EXACTLY like
    GPT-2's released lookahead regex on contractions, multi-space runs,
    unicode whitespace, and trailing whitespace."""
    import regex as rx

    from configurable_etl_python_repo_spark.llm.bpe import (
        GPT2_PATTERN,
        _pieces_py,
    )

    truth = rx.compile(GPT2_PATTERN)
    marked = _pieces_py("gpt2")
    for t in GPT2_TRICKY:
        assert marked(t) == truth.findall(t), t
        # lossless: pieces concatenate back to the input
        assert "".join(truth.findall(t)) == t, t


def test_gpt2_pretokenizer_parity_column_arrow_duckdb(spark):
    """pretokenizer='gpt2': Column == Arrow == DuckDB mirror at both
    levels, and the leading-space merges actually fire (' the' is ONE
    token under gpt2, dead weight under bpe_ish)."""
    import duckdb

    from configurable_etl_python_repo_spark.llm.bpe import (
        GPT2_FIXTURE_MERGES,
        GPT2_FIXTURE_MERGES_BYTES,
        bpe_count_sql,
    )

    texts = [(i, t) for i, t in enumerate(GPT2_TRICKY)] + [
        (len(GPT2_TRICKY), None)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    col = {r["doc_id"]: r["n_tokens"]
           for r in token_count_bpe(
               df, merges=GPT2_FIXTURE_MERGES, pretokenizer="gpt2"
           ).collect()}
    arr = {r["doc_id"]: r["n_tokens"]
           for r in token_count_bpe_arrow(
               df, merges=GPT2_FIXTURE_MERGES, pretokenizer="gpt2"
           ).collect()}
    assert col == arr
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", texts)
    duck = {r[0]: r[1] for r in con.execute(
        "SELECT doc_id, " + bpe_count_sql(
            "text", merges=GPT2_FIXTURE_MERGES, pretokenizer="gpt2"
        ) + " FROM t"
    ).fetchall()}
    assert duck == col
    # byte level too
    colb = {r["doc_id"]: r["n_tokens"]
            for r in token_count_bpe(
                df, merges=GPT2_FIXTURE_MERGES_BYTES, level="bytes",
                pretokenizer="gpt2",
            ).collect()}
    duckb = {r[0]: r[1] for r in con.execute(
        "SELECT doc_id, " + bpe_count_sql(
            "text", merges=GPT2_FIXTURE_MERGES_BYTES, level="bytes",
            pretokenizer="gpt2",
        ) + " FROM t"
    ).fetchall()}
    assert duckb == colb


def test_gpt2_leading_space_merges_fire(spark):
    from configurable_etl_python_repo_spark.llm.bpe import GPT2_FIXTURE_MERGES

    df = spark.createDataFrame([(0, "go to the store")],
                               "doc_id long, text string")
    gpt2 = token_count_bpe(df, merges=GPT2_FIXTURE_MERGES,
                           pretokenizer="gpt2").collect()[0]["n_tokens"]
    ish = token_count_bpe(df, merges=GPT2_FIXTURE_MERGES).collect()[0][
        "n_tokens"]
    # gpt2 pieces: go| to| the| store -> 'go'(2 sym) ' to'(1) ' the'(1)
    # ' st'+'or'+'e' -> ' ' 'st' 'or' 'e'(4) = 8; bpe_ish: go to the
    # store without spaces = 2+1+1+3 = 7 (spaces dropped pre-merge)
    assert gpt2 == 8 and ish == 7


def test_gpt2_learner_learns_space_symbols(spark):
    from configurable_etl_python_repo_spark.llm.bpe import learn_bpe_merges

    df = spark.createDataFrame(
        [(i, "the cat and the dog and the bird") for i in range(4)],
        "doc_id long, text string",
    )
    rules = learn_bpe_merges(df, 8, pretokenizer="gpt2")
    assert any(" " in a + b for a, b in rules)  # leading-space merges exist


def test_gpt2_pretokenizer_validation(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pretokenizer"):
        token_count_bpe(df, pretokenizer="nope")
