"""Property-based tests (hypothesis) for the macro library: Spark results
must match a pure-Python model of the reference's row-wise semantics on
arbitrary generated inputs — edge cases the example-based unit tests and
fixture-driven oracle checks don't reach (empty segments, short URLs,
locale corner cases, junk numerics).

Each property evaluates ONE Spark job per hypothesis example-batch: the
example is a list of strings that becomes a single-column DataFrame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql.types import StringType, StructField, StructType

from ug_dwh_etl_spark.functions.numeric import fill_cast, lenient_int, locale_decimal
from ug_dwh_etl_spark.functions.urls import URL_LEVEL_NAMES, url_levels

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_seg = st.text(alphabet="abz09._-%", min_size=0, max_size=4)
_urls = st.lists(
    st.builds(lambda segs: "/".join(segs), st.lists(_seg, min_size=0, max_size=9)),
    min_size=1,
    max_size=40,
)


def _frame(spark, values):
    schema = StructType([StructField("v", StringType())])
    return spark.createDataFrame([(v,) for v in values], schema)


def _ref_url_levels(url: str) -> dict[str, str | None]:
    # the reference's guard: x.split('/')[k] if len(x.split('/')) > k
    # else None, for k=2..7 (sf_html_data.py:109-115)
    parts = url.split("/")
    return {
        name: parts[k] if len(parts) > k else None
        for k, name in zip(range(2, 8), URL_LEVEL_NAMES)
    }


@SETTINGS
@given(urls=_urls)
def test_url_levels_matches_reference_semantics(spark, urls):
    df = _frame(spark, urls).withColumns(url_levels("v"))
    for row in df.collect():
        expected = _ref_url_levels(row.v)
        for name in URL_LEVEL_NAMES:
            assert getattr(row, name) == expected[name], (row.v, name)


_num_text = st.one_of(
    st.from_regex(r"[0-9]{1,3}(\.[0-9]{3})?,[0-9]{2}", fullmatch=True),
    st.text(alphabet="0123456789.,x-", min_size=0, max_size=8),
)


def _ref_locale_decimal(s: str) -> float | None:
    # reference keeps full float precision (product_data.py:63-64) —
    # no quantization in the model either
    cleaned = s.replace(".", "").replace(",", ".")
    try:
        return float(cleaned)
    except ValueError:
        return None


@SETTINGS
@given(vals=st.lists(_num_text, min_size=1, max_size=40))
def test_locale_decimal_matches_python_model(spark, vals):
    df = _frame(spark, vals).select(
        "v", locale_decimal("v").cast("double").alias("d")
    )
    for row in df.collect():
        expected = _ref_locale_decimal(row.v)
        # try_cast rejects what float() rejects, modulo floats like '1e4'
        # or leading +/-/whitespace that our alphabet can't produce
        if expected is None:
            assert row.d is None, row.v
        elif row.d is not None:
            assert abs(row.d - expected) < 1e-6, (row.v, row.d, expected)


def _ref_lenient_int(s: str) -> int:
    try:
        return int(s)
    except ValueError:
        return 0


@SETTINGS
@given(vals=st.lists(st.text(alphabet="0123456789-ab ", max_size=8), min_size=1, max_size=40))
def test_lenient_int_matches_pandas_coerce(spark, vals):
    df = _frame(spark, vals).select("v", lenient_int("v").alias("i"))
    for row in df.collect():
        # try_cast('long') also accepts surrounding whitespace, like
        # pd.to_numeric; the Python model strips to mirror that
        assert row.i == _ref_lenient_int(row.v.strip() or "x"), row.v


@SETTINGS
@given(vals=st.lists(st.text(alphabet="0123456789.e-", max_size=8), min_size=1, max_size=40))
def test_fill_cast_never_null_and_numeric(spark, vals):
    df = _frame(spark, vals).select("v", fill_cast("v").alias("d"))
    for row in df.collect():
        assert row.d is not None  # intended C13 semantics: default fills
        try:
            expected = float(row.v)
            # '1e309' overflows to inf identically in both engines
            assert row.d == expected or abs(row.d - expected) < 1e-9 or row.d == 0.0
        except (ValueError, OverflowError):
            assert row.d == 0.0, (row.v, row.d)


# --- tokenizer cross-engine equivalence ---------------------------------------
# The tokenizer is the foundation every dedup/text oracle rests on: a
# unicode edge where Spark (Java regex + locale lower) and DuckDB (RE2 +
# utf8proc lower) disagree would silently bias ALL of them. Property:
# for arbitrary unicode input, Spark `hashing.tokens` == DuckDB
# `hashing.sql_tokens`, and likewise for the 3-gram shingles built on top.

_any_text = st.lists(
    st.text(min_size=0, max_size=24),  # full unicode, no alphabet cap
    min_size=1,
    max_size=30,
)


def _duck_eval(values, sql_expr: str):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": values}))
    out = con.execute(f"SELECT {sql_expr} AS r FROM t").fetchdf()["r"]
    con.close()
    return [list(x) for x in out]


@SETTINGS
@given(vals=_any_text)
def test_tokens_match_duckdb_oracle(spark, vals):
    from ug_dwh_etl_spark.operators import hashing as H

    srows = _frame(spark, vals).select(H.tokens("v").alias("t")).collect()
    duck = _duck_eval(vals, H.sql_tokens("v"))
    for (row, d, v) in zip(srows, duck, vals):
        assert list(row.t) == d, repr(v)


def _duck_eval_shingles(values, n: int = 3):
    import duckdb
    import pandas as pd

    from ug_dwh_etl_spark.operators import hashing as H

    con = duckdb.connect()
    con.register("raw", pd.DataFrame({"v": values}))
    out = con.execute(
        f"WITH tok AS (SELECT {H.sql_tokens('v')} AS t FROM raw) "
        f"SELECT {H.sql_shingles('t', n)} AS r FROM tok"
    ).fetchdf()["r"]
    con.close()
    return [list(x) for x in out]


@SETTINGS
@given(vals=_any_text)
def test_shingles_match_duckdb_oracle(spark, vals):
    from ug_dwh_etl_spark.operators import hashing as H

    srows = (
        _frame(spark, vals)
        .select(H.tokens("v").alias("t"))
        .select(H.shingles(F.col("t"), 3).alias("s"))
        .collect()
    )
    duck = _duck_eval_shingles(vals, 3)
    for (row, d, v) in zip(srows, duck, vals):
        assert list(row.s) == d, repr(v)


def test_tokens_match_duckdb_on_known_unicode_edges(spark):
    """Deterministic nasty-unicode cases the random strategy rarely hits:
    locale-sensitive lowercasing (Turkish İ, German ẞ), combining marks,
    full-width digits, emoji, NBSP. The tokenizer must agree cross-engine
    on ALL of them — any divergence silently biases every dedup oracle."""
    from ug_dwh_etl_spark.operators import hashing as H

    vals = [
        "İstanbul I ı",            # U+0130 lowers to i+combining-dot in Java
        "STRAẞE Straße",           # U+1E9E capital sharp s
        "café café",         # combining acute vs precomposed
        "１２ 12",         # full-width digits
        "a b",                # NBSP separator
        "🚀 rocket 🚀x",
        "ΣΊΣΥΦΟΣ σίσυφος",
        "ＡＢＣ abc",               # full-width latin
    ]
    srows = _frame(spark, vals).select(H.tokens("v").alias("t")).collect()
    duck = _duck_eval(vals, H.sql_tokens("v"))
    for (row, d, v) in zip(srows, duck, vals):
        assert list(row.t) == d, repr(v)


def _py_interleave(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@SETTINGS
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_zorder_interleave_matches_python_and_duckdb(spark, pairs):
    """Both engine spellings of the Morton key must equal the bit-level
    Python model on arbitrary 16-bit inputs — the cross-engine guarantee
    storage_zorder_stats' oracle parity rests on."""
    import duckdb

    from ug_dwh_etl_spark.operators.storage import zorder_interleave_sql

    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.selectExpr(
            "x", "y", zorder_interleave_sql("x", "y", duck=False) + " AS z"
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    duck = {
        (x, y): z
        for x, y, z in con.execute(
            f"SELECT x, y, {zorder_interleave_sql('x', 'y', duck=True)} FROM t"
        ).fetchall()
    }
    for x, y in pairs:
        expect = _py_interleave(x, y)
        assert got[(x, y)] == expect
        assert duck[(x, y)] == expect


# --- tokenizer-training parity: vocab rank ties are the risk surface ----------

import hashlib
import re as _re


def _model_tokens(text: str) -> list[str]:
    # pure-Python model of hashing.tokens(): ASCII-alnum runs, separator
    # pass BEFORE lower, single-space split
    norm = _re.sub(r"[^0-9A-Za-z]+", " ", text).strip().lower()
    return norm.split(" ") if norm else []


def _model_encode(texts: list[str], vocab_k: int):
    from collections import Counter

    toks = {i: _model_tokens(t) for i, t in enumerate(texts)}
    counts = Counter(t for ts in toks.values() for t in ts)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {term: rank + 1 for rank, (term, _) in enumerate(ranked[:vocab_k])}
    out = {}
    for i, ts in toks.items():
        ids = [vocab.get(t, 0) for t in ts]
        if not ids:
            continue  # posexplode drops token-less docs
        out[i] = (
            len(ids),
            sum(1 for x in ids if x == 0),
            hashlib.md5(",".join(map(str, ids)).encode()).hexdigest(),
        )
    return out


_tie_text = st.lists(
    st.text(alphabet="ab c.A0", min_size=0, max_size=12), min_size=1, max_size=25
)


@SETTINGS
@given(texts=_tie_text)
def test_encode_token_ids_matches_python_model(spark, texts):
    # tiny alphabet → massive count ties → the (count desc, term asc)
    # vocabulary tiebreak is exercised on every example; a K smaller
    # than the vocab forces real OOV hits
    from ug_dwh_etl_spark.operators.textstats import encode_token_ids

    schema = StructType(
        [StructField("doc_id", StringType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], schema
    )
    got = {
        int(r.doc_id): (r.n_tokens, r.n_oov, r.ids_md5)
        for r in encode_token_ids(df, "doc_id", "text", vocab_k=3).collect()
    }
    assert got == _model_encode(texts, 3)


def _model_bpe(texts: list[str], top_k: int):
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in _re.split(r"[^a-z]+", t.lower()):
            if w:
                words[w] += 1
    pairs = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += n
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return [(p, n, i + 1) for i, (p, n) in enumerate(ranked)]


@SETTINGS
@given(texts=_tie_text)
def test_bpe_pair_stats_matches_python_model(spark, texts):
    from ug_dwh_etl_spark.operators.textstats import bpe_pair_stats

    schema = StructType([StructField("text", StringType())])
    df = spark.createDataFrame([(t,) for t in texts], schema)
    got = [
        (r.pair, r.total, r.rnk)
        for r in bpe_pair_stats(df, "text", top_k=5).orderBy("rnk").collect()
    ]
    assert got == _model_bpe(texts, 5)


def _model_bpe_rounds(texts: list[str], n_rounds: int):
    """Pure-Python mirror of bpe_train_rounds: greedy (total desc, pair
    asc) winner per round, str.replace recode into chr(round), rendering
    with newest-first placeholder expansion."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in _re.split(r"[^a-z]+", t.lower()):
            if w:
                words[w] += 1
    vocab = list(words.items())  # [(sym, n)]
    raw: list[tuple[str, int]] = []  # winning (pair, total) per round
    for rnd in range(1, n_rounds + 1):
        pairs = Counter()
        for s, n in vocab:
            for i in range(len(s) - 1):
                pairs[s[i : i + 2]] += n
        if not pairs:
            break
        best, total = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        raw.append((best, total))
        vocab = [(s.replace(best, chr(rnd)), n) for s, n in vocab]
    out = []
    for rnd, (pair, total) in enumerate(raw, start=1):
        for prev in range(rnd - 1, 0, -1):
            pair = pair.replace(chr(prev), "<" + raw[prev - 1][0] + ">")
        out.append((rnd, pair, total))
    return out


@SETTINGS
@given(texts=_tie_text)
def test_bpe_train_rounds_matches_python_model(spark, texts):
    # tie-heavy tiny-alphabet corpora hammer the greedy winner's
    # (total desc, pair asc) tie-break AND the placeholder recode path
    # (merged symbols re-pairing with neighbors in later rounds)
    from ug_dwh_etl_spark.operators.textstats import bpe_train_rounds

    schema = StructType([StructField("text", StringType())])
    df = spark.createDataFrame([(t,) for t in texts], schema)
    got = [
        (r.round, r.pair, r.total)
        for r in bpe_train_rounds(df, "text", n_rounds=3).orderBy("round").collect()
    ]
    assert got == _model_bpe_rounds(texts, 3)


# --- incremental near-dup == full re-run, on arbitrary corpora ------------------
_nd_word = st.sampled_from(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
)
_nd_text = st.lists(_nd_word, min_size=6, max_size=14).map(" ".join)
_nd_corpus = st.lists(_nd_text, min_size=1, max_size=5)
_nd_batch = st.lists(_nd_text, min_size=1, max_size=4)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus_texts=_nd_corpus, batch_texts=_nd_batch)
def test_incremental_neardup_equals_full_rerun_property(
    spark, corpus_texts, batch_texts
):
    """For ANY corpus/batch from a tiny shared vocabulary (maximally
    collision- and near-dup-prone), the index-lookup path must produce
    exactly the batch-touching subset of a full-corpus verified-pairs
    re-run — same pairs, same jaccard values."""
    from ug_dwh_etl_spark.operators.dedup import (
        doc_shingle_hashes,
        incremental_neardup,
        lsh_band_keys,
        minhash_lsh_pairs,
        spread,
        verify_pairs_jaccard,
    )

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    batch_ids = set(range(100, 100 + len(batch_texts)))
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in incremental_neardup(
            batch,
            lsh_band_keys(corpus, "doc_id", "text"),
            doc_shingle_hashes(spread(corpus), "doc_id", "text"),
            "doc_id",
            "text",
            0.5,
        ).collect()
    }
    full = corpus.unionByName(batch)
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in verify_pairs_jaccard(
            full, minhash_lsh_pairs(full, "doc_id", "text"), "doc_id", "text", 0.5
        ).collect()
        if r.id_a in batch_ids or r.id_b in batch_ids
    }
    assert got == want


# --- PII redaction round-trip ---------------------------------------------------
_pii_email = st.builds(
    lambda u, d: f"{u}@{d}.example.com",
    st.text(alphabet="abz09._", min_size=1, max_size=6),
    st.text(alphabet="abz09", min_size=1, max_size=5),
)
_pii_ip = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
    *[st.integers(min_value=0, max_value=255) for _ in range(4)],
)
_pii_phone = st.builds(
    lambda cc, a, b, c, s: f"+{cc}{s}{a}{s}{b}{s}{c}",
    st.integers(min_value=1, max_value=999),
    st.text(alphabet="0123456789", min_size=2, max_size=4),
    st.text(alphabet="0123456789", min_size=3, max_size=4),
    st.text(alphabet="0123456789", min_size=2, max_size=4),
    st.sampled_from([" ", "-"]),  # "." is IPv4-ambiguous, not a phone sep
)
_pii_iban = st.builds(
    lambda cc, chk, bban: f"{cc}{chk:02d}{bban}",
    st.sampled_from(["DE", "FR", "GB", "NL"]),
    st.integers(min_value=0, max_value=99),
    st.text(alphabet="ABCDEF0123456789", min_size=11, max_size=30),
)
_pii_item = st.one_of(
    st.tuples(st.just("<EMAIL>"), _pii_email),
    st.tuples(st.just("<IP>"), _pii_ip),
    st.tuples(st.just("<PHONE>"), _pii_phone),
    st.tuples(st.just("<IBAN>"), _pii_iban),
)
# lowercase-alpha filler can't match any PII pattern, so every injected
# span is exactly one match and the expected redaction is computable
_pii_filler = st.text(alphabet="abcdefgz", min_size=1, max_size=8)
_pii_docs = st.lists(
    st.lists(st.tuples(_pii_filler, _pii_item), min_size=0, max_size=5),
    min_size=1,
    max_size=15,
)


@SETTINGS
@given(docs=_pii_docs)
def test_redact_pii_round_trip(spark, docs):
    """Round-trip property: text assembled from safe filler + generated
    PII spans must come back with exactly the injected spans replaced by
    their typed tags (md5-compared against the Python-built expectation)
    and per-type counts equal to what was injected."""
    import hashlib

    from ug_dwh_etl_spark.operators.textstats import redact_pii

    rows, want = [], {}
    for i, parts in enumerate(docs):
        raw, red = [], []
        counts = {"<EMAIL>": 0, "<IP>": 0, "<PHONE>": 0, "<IBAN>": 0}
        for filler, (tag, span) in parts:
            raw += [filler, span]
            red += [filler, tag]
            counts[tag] += 1
        text = " ".join(raw)
        expected = " ".join(red)
        rows.append((str(i), text))
        want[str(i)] = (
            counts["<EMAIL>"],
            counts["<IP>"],
            counts["<PHONE>"],
            counts["<IBAN>"],
            hashlib.md5(expected.encode()).hexdigest(),
        )
    schema = StructType(
        [StructField("doc_id", StringType()), StructField("text", StringType())]
    )
    out = redact_pii(spark.createDataFrame(rows, schema), "doc_id", "text")
    got = {
        r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.n_ibans, r.redacted_md5)
        for r in out.collect()
    }
    assert got == want


# --- URL canonicalization: cross-engine parity + idempotence -------------------

import duckdb as _duckdb

_scheme = st.sampled_from(["http://", "https://", "HTTPS://", "hTtP://"])
_host = st.sampled_from(["Example.COM", "www.example.com", "A.b.C"])
_seg = st.text(alphabet="abE9._-", min_size=1, max_size=4)
_messy_url = st.builds(
    lambda sch, host, segs, dbl, track, trail, frag: (
        sch
        + host
        + ("//" if dbl else "/")
        + "/".join(segs)
        + ("/" if trail else "")
        + ("?utm_source=x&keep=1&gclid=z" if track else "")
        + ("#frag" if frag else "")
    ),
    _scheme,
    _host,
    st.lists(_seg, min_size=0, max_size=3),
    st.booleans(),
    st.booleans(),
    st.booleans(),
    st.booleans(),
)


@SETTINGS
@given(urls=st.lists(_messy_url, min_size=1, max_size=25))
def test_url_canonicalize_cross_engine_and_idempotent(spark, urls):
    from ug_dwh_etl_spark.functions.urls import sql_url_canonicalize, url_canonicalize

    df = _frame(spark, urls)
    got = [
        (r.v, r.c1, r.c2)
        for r in df.select(
            "v",
            url_canonicalize("v").alias("c1"),
            url_canonicalize(url_canonicalize("v")).alias("c2"),
        ).collect()
    ]
    # idempotence: a canonical URL is its own canonical form
    for v, c1, c2 in got:
        assert c1 == c2, (v, c1, c2)
        assert "utm_" not in c1 and "gclid" not in c1 and "#" not in c1, (v, c1)
    # cross-engine: DuckDB's spelling produces the identical string
    con = _duckdb.connect()
    expr = sql_url_canonicalize("v")
    duck = dict(
        con.execute(
            f"SELECT v, {expr} FROM (SELECT unnest(?) AS v)", [urls]
        ).fetchall()
    )
    for v, c1, _ in got:
        assert duck[v] == c1, (v, duck[v], c1)


# --- merge_asof (backward + forward) vs pandas' own merge_asof -------------------
_asof_times = st.lists(
    st.integers(min_value=0, max_value=50), min_size=1, max_size=12
)


@SETTINGS
@given(lt=_asof_times, rt=_asof_times, tol=st.sampled_from([None, 0, 3, 10]))
def test_merge_asof_directions_match_pandas(spark, lt, rt, tol):
    """Both as-of directions must reproduce pandas.merge_asof exactly —
    including tolerance cut-offs and equal-timestamp ties (backward and
    forward both include exact matches). Times are day offsets from an
    epoch so tolerance_days is exercised directly; a single key keeps
    the pandas model unambiguous."""
    import pandas as pd

    from ug_dwh_etl_spark.operators.joins import (
        merge_asof,
        merge_asof_forward,
        merge_asof_nearest,
    )

    base = pd.Timestamp("2020-01-01")
    left = pd.DataFrame(
        {
            "k": 1,
            "lt": [base + pd.Timedelta(days=d) for d in sorted(lt)],
            "lid": list(range(len(lt))),
        }
    )
    right_days = sorted(set(rt))  # unique right times: tie-break-free model
    right = pd.DataFrame(
        {
            "k": 1,
            "rt": [base + pd.Timedelta(days=d) for d in right_days],
            "rv": [d * 100 for d in right_days],
        }
    )
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    tol_td = pd.Timedelta(days=tol) if tol is not None else None
    for direction, fn in (
        ("backward", merge_asof),
        ("forward", merge_asof_forward),
        ("nearest", merge_asof_nearest),
    ):
        expected = pd.merge_asof(
            left.sort_values("lt"),
            right.sort_values("rt"),
            left_on="lt",
            right_on="rt",
            by="k",
            direction=direction,
            tolerance=tol_td,
        )
        exp = {
            int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
            for r in expected.itertuples()
        }
        got_rows = fn(
            sl,
            sr,
            key="k",
            left_time="lt",
            right_time="rt",
            left_vals=["lid"],
            right_vals=["rv"],
            tolerance_days=tol,
        ).collect()
        got = {
            int(r.lid): (None if r.asof_rv is None else int(r.asof_rv))
            for r in got_rows
        }
        assert got == exp, direction
