"""Text analysis: language-ID heuristic, quality features, token counts,
fingerprints (portable min-shingle + winnowing)."""

import pytest
from pyspark.sql import functions as F

from kermit_spark.ops.text import (
    analyze_documents,
    bpe_token_estimate,
    detect_language,
    min_shingle_fingerprint,
    quality_features,
    token_count,
    winnow_fingerprint,
)

SENTS = [
    (1, "the cat and the dog went to the house of friends", "en"),
    (2, "der Hund und die Katze sind nicht in das Haus gegangen", "de"),
    (3, "le chat et la souris sont dans les jardins est bien", "fr"),
    (4, "el perro y la gata que viven con los vecinos es una historia", "es"),
    (5, "zzz qqq xxx", "und"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t, _ in SENTS], "id long, text string")


def test_language_id(docs):
    got = {
        r["id"]: r["lang"]
        for r in docs.select("id", detect_language(F.col("text")).alias("lang")).collect()
    }
    assert got == {i: lang for i, _, lang in SENTS}


def test_language_id_tie_breaks_in_fixed_order(spark):
    """Equal nonzero scores resolve to the earliest language in
    (en, de, fr, es) — the documented contract and what the DuckDB oracle's
    'score_en >= ...' CASE produces."""
    df = spark.createDataFrame(
        [
            (1, "the der"),       # en 1 vs de 1 -> en
            (2, "der le"),        # de 1 vs fr 1 -> de
            (3, "le el"),         # fr 1 vs es... 'el' es-marker -> fr wins tie
        ],
        "id long, text string",
    )
    got = {r["id"]: r["l"] for r in df.select("id", detect_language(F.col("text")).alias("l")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr"}


def test_token_counts(docs):
    row = docs.filter("id = 1").select(
        token_count(F.col("text")).alias("n"),
        bpe_token_estimate(F.col("text")).alias("bpe"),
    ).first()
    assert row["n"] == 11
    assert row["bpe"] == -(-len(SENTS[0][1]) // 4)


def test_quality_features_bounds(docs):
    out = quality_features(docs).collect()
    for r in out:
        assert 0.0 <= r["q_alpha_ratio"] <= 1.0
        assert 0.0 <= r["q_score"] <= 1.0
    byid = {r["id"]: r for r in out}
    # real sentences outscore junk
    assert byid[1]["q_score"] > byid[5]["q_score"]


def test_min_shingle_fingerprint_stable_and_discriminative(docs):
    fp = docs.select("id", min_shingle_fingerprint(F.col("text")).alias("f"))
    a = {r["id"]: r["f"] for r in fp.collect()}
    b = {r["id"]: r["f"] for r in fp.collect()}
    assert a == b  # deterministic
    assert len(set(a.values())) == len(a)  # distinct docs -> distinct prints


def test_winnow_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz" * 3), (2, "abcdefghijklmnopqrstuvwxyz" * 3), (3, "short")],
        "id long, text string",
    )
    rows = {r["id"]: r["f"] for r in df.select("id", winnow_fingerprint(F.col("text")).alias("f")).collect()}
    assert rows[1] == rows[2] and len(rows[1]) > 0  # deterministic
    assert rows[3] == []  # below k-gram size
    # identical prefix/suffix share most fingerprints (locality)
    df2 = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz" * 3 + " tail change")], "id long, text string"
    )
    f2 = df2.select(winnow_fingerprint(F.col("text")).alias("f")).first()["f"]
    shared = set(rows[1]) & set(f2)
    assert len(shared) / len(set(rows[1])) > 0.7


def test_analyze_documents_surface(docs):
    out = analyze_documents(docs)
    cols = set(out.columns)
    assert {"lang_pred", "bpe_tokens", "fingerprint", "q_score"} <= cols
    assert out.count() == len(SENTS)


# ---------------------------------------------------------------------------
# Gopher repetition + word-shape rules
# ---------------------------------------------------------------------------

GOPHER_DOCS = [
    (0, "the cat sat on the mat with a hat and that is that to be sure of it " * 3),
    (1, "foo bar\nfoo bar\nfoo bar\nbaz qux quux corge"),
    (2, "- bullet one\n- bullet two\n* bullet three\nplain line...\nanother…"),
    (3, ""),
    (4, None),
    (5, "aaa bbb " * 60),
    (6, "# heading ## other ### more hashes everywhere # again # and # again"),
    (7, "the and of to is that have with " + "unique%d " % 0 + " ".join(f"w{i}" for i in range(60))),
]


def _gopher_oracle(text):
    """Independent per-doc reference (plain Python, no Spark constructs)."""
    import re
    from collections import Counter

    t = text or ""
    words = [w for w in re.split(r"\s+", t) if w]
    lines = t.split("\n")
    nw, nl, nc = len(words), len(lines), len(t)

    def rh(x):
        import math
        return math.floor(x * 10000 + 0.5) / 10000

    def frac(a, b):
        return rh(a / max(b, 1))

    def grams(n):
        return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]

    lc = Counter(lines)
    g2, g5 = Counter(grams(2)), Counter(grams(5))
    top = max(g2.items(), key=lambda kv: (kv[1], len(kv[0]), kv[0]), default=None)
    return {
        "n_chars": nc,
        "n_words": nw,
        "n_lines": nl,
        "mean_word_len": frac(sum(len(w) for w in words), nw),
        "frac_alpha_words": frac(sum(bool(re.search("[A-Za-z]", w)) for w in words), nw),
        "symbol_ratio": frac(len(re.findall(r"#|\.\.\.|…", t)), nw),
        "stop_hits": sum(
            w.lower() in ("the", "be", "to", "of", "and", "that", "have", "with")
            for w in words
        ),
        "frac_bullet_lines": frac(sum(bool(re.match(r"^\s*[-*•]", l)) for l in lines), nl),
        "frac_ellipsis_lines": frac(
            sum(bool(re.search(r"(\.\.\.|…)\s*$", l)) for l in lines), nl
        ),
        "dup_line_frac": frac(nl - len(lc), nl),
        "dup_line_char_frac": min(
            frac(sum(n * len(v) for v, n in lc.items() if n > 1), nc), 1.0
        ),
        "top_ngram_char_frac": min(
            frac(top[1] * len(top[0]) if top else 0, nc), 1.0
        ),
        "dup_ngram_char_frac": min(
            frac(sum(n * len(v) for v, n in g5.items() if n > 1), nc), 1.0
        ),
    }


def test_gopher_features_match_python_oracle(spark):
    from kermit_spark.ops.text import gopher_features

    df = spark.createDataFrame(GOPHER_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_features(df).collect()}
    assert set(got) == {d for d, _ in GOPHER_DOCS}
    for doc_id, text in GOPHER_DOCS:
        want = _gopher_oracle(text)
        row = got[doc_id]
        for k, v in want.items():
            assert row[k] == pytest.approx(v, abs=0), (doc_id, k, row[k], v)


def test_gopher_pass_thresholds(spark):
    """Rule wiring: a long healthy doc passes; short/reps/bullets fail."""
    from kermit_spark.ops.text import gopher_features, gopher_filter

    healthy = "the quick brown fox jumps over that lazy dog to be seen with " + " ".join(
        f"word{i:03d}" for i in range(50)
    )
    df = spark.createDataFrame(
        [(0, healthy), (1, "too short"), (2, "foo bar\n" * 40)],
        "doc_id long, text string",
    )
    flags = {r["doc_id"]: r["gopher_pass"] for r in gopher_features(df).collect()}
    assert flags == {0: True, 1: False, 2: False}
    kept = gopher_filter(df)
    assert kept.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in kept.collect()] == [0]


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

PII_DOCS = [
    (0, "contact alice.smith+dev@example.co.uk or bob@test.io today"),
    (1, "server at 192.168.0.1 and 255.255.255.255 but not 999.1.1.1"),
    (2, "card 4111111111111111 and id 12345678901234567 but order 12345"),
    (3, "call +1 (555) 123-4567 or +49-89-1234567 now"),
    (4, "clean text with no identifiers at all"),
    (5, None),
    (6, "mixed: a@b.com at 10.0.0.7 card 4111111111111111 tel +44 20 7946 0958"),
]


def test_redact_pii_matches_python_re(spark):
    import re

    from kermit_spark.ops.text import PII_PATTERNS, redact_pii

    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    for doc_id, text in PII_DOCS:
        cur = text or ""
        for kind, pat, repl in PII_PATTERNS:
            assert got[doc_id][f"n_{kind}"] == len(re.findall(pat, cur)), (doc_id, kind)
            cur = re.sub(pat, repl, cur)
        assert got[doc_id]["text_redacted"] == cur, doc_id
    # spot-check the semantics, not just engine parity
    assert got[0]["text_redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert got[1]["text_redacted"] == "server at <IP> and <IP> but not 999.1.1.1"
    assert got[2]["text_redacted"] == "card <ID> and id <ID> but order 12345"
    assert got[3]["n_phone"] == 2 and "<PHONE>" in got[3]["text_redacted"]
    assert got[4]["text_redacted"] == PII_DOCS[4][1]
    assert got[5]["text_redacted"] == ""


# ---------------------------------------------------------------------------
# chunking / vocabulary / sequence packing
# ---------------------------------------------------------------------------


def test_chunk_documents_windows_and_overlap(spark):
    from kermit_spark.ops.text import chunk_documents

    words20 = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(0, words20), (1, "a b c"), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=8, overlap=2)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 0: starts 1,7,13,19 -> last has 2 tokens <= overlap, dropped
    assert sorted(c for d, c in rows if d == 0) == [0, 1, 2]
    assert rows[(0, 0)]["chunk"] == " ".join(f"w{i}" for i in range(8))
    assert rows[(0, 1)]["chunk"] == " ".join(f"w{i}" for i in range(6, 14))
    assert rows[(0, 2)]["n_tokens"] == 8
    # short doc: one chunk, its own size
    assert rows[(1, 0)]["chunk"] == "a b c" and rows[(1, 0)]["n_tokens"] == 3
    # empty/null docs: no rows
    assert not any(d in (2, 3) for d, _ in rows)
    # overlap tokens are shared between consecutive chunks
    tail = rows[(0, 0)]["chunk"].split()[-2:]
    head = rows[(0, 1)]["chunk"].split()[:2]
    assert tail == head


def test_corpus_vocabulary_topk(spark):
    from kermit_spark.ops.text import corpus_vocabulary

    df = spark.createDataFrame(
        [
            (0, "Apple banana apple CHERRY the and"),
            (1, "apple cherry cherry dates"),
            (2, "banana apple"),
        ],
        "doc_id long, text string",
    )
    out = [(r["term"], r["tf"], r["df_count"]) for r in corpus_vocabulary(df, top_k=3).collect()]
    # 'the'/'and' excluded; apple tf=4 df=3; cherry tf=3 df=2; banana tf=2 df=2
    assert out == [("apple", 4, 3), ("cherry", 3, 2), ("banana", 2, 2)]


def test_pack_sequences_greedy_bins(spark):
    from kermit_spark.ops.text import pack_sequences

    def doc(n):  # n whitespace tokens
        return " ".join("x" for _ in range(n))

    rows = [
        ("s1", 0, doc(100)), ("s1", 1, doc(100)), ("s1", 2, doc(60)),
        ("s1", 3, doc(300)),  # oversized: own bin
        ("s1", 4, doc(10)),
        ("s2", 0, doc(256)), ("s2", 1, doc(1)),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {
        (r["source"], r["doc_id"]): r["bin_id"]
        for r in pack_sequences(df, max_tokens=256).collect()
    }
    # s1: [100+100+60... 100+100=200, +60=260>256 -> doc2 starts bin1; doc3
    # 300 overflows bin1 (60+300) -> bin2 alone; doc4 10 overflows? 300+10
    # > 256 -> bin3
    assert out[("s1", 0)] == 0 and out[("s1", 1)] == 0
    assert out[("s1", 2)] == 1
    assert out[("s1", 3)] == 2
    assert out[("s1", 4)] == 3
    # s2: exact fit keeps bin, next doc overflows
    assert out[("s2", 0)] == 0 and out[("s2", 1)] == 1
    # invariant: no bin exceeds max_tokens unless it is a single oversized doc
    from collections import defaultdict
    tot = defaultdict(int); cnt = defaultdict(int)
    for r in pack_sequences(df, max_tokens=256).collect():
        tot[(r["source"], r["bin_id"])] += r["n_tokens"]
        cnt[(r["source"], r["bin_id"])] += 1
    for k, t in tot.items():
        assert t <= 256 or cnt[k] == 1


def test_tfidf_matches_python_oracle(spark):
    import math
    from collections import Counter

    from kermit_spark.ops.text import tfidf_terms

    texts = {0: "apple banana apple", 1: "banana cherry", 2: "apple dates dates"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {(r["doc_id"], r["term"]): r for r in tfidf_terms(df).collect()}
    n = len(texts)
    dfc = Counter(t for body in texts.values() for t in set(body.split()))
    for d, body in texts.items():
        for term, tf in Counter(body.split()).items():
            row = got[(d, term)]
            score = math.floor(tf * (math.log((n + 1) / (dfc[term] + 1)) + 1.0) * 10000 + 0.5) / 10000
            assert row["tf"] == tf and row["df_count"] == dfc[term]
            assert row["score"] == pytest.approx(score, abs=0)
    assert len(got) == sum(len(set(b.split())) for b in texts.values())


@pytest.mark.parametrize("seed", [0, 1])
def test_chunk_and_pack_properties(spark, seed):
    """Invariants under random corpora: chunking covers every token exactly
    (reassembling chunks minus overlaps == the token stream) and packing
    assigns every doc exactly once to monotone bins that never overflow
    except for singleton oversized docs."""
    import random

    from kermit_spark.ops.text import chunk_documents, pack_sequences

    rng = random.Random(seed)
    docs = [
        ("s%d" % (i % 3), i, " ".join("t%d_%d" % (i, j) for j in range(rng.randint(0, 40))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "source string, doc_id long, text string")

    chunk, overlap = 7, 3
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk"]))
    for _, i, text in docs:
        words = text.split()
        chunks = [c.split() for _, c in sorted(by_doc.get(i, []))]
        if not words:
            assert chunks == []
            continue
        rebuilt = list(chunks[0]) if chunks else []
        for c in chunks[1:]:
            rebuilt.extend(c[overlap:])
        # full coverage, no token lost or duplicated beyond the overlap rule
        assert rebuilt == words, i

    packed = pack_sequences(df, max_tokens=50).collect()
    seen = {}
    tot, cnt = {}, {}
    for r in packed:
        key = (r["source"], r["doc_id"])
        assert key not in seen  # exactly-once assignment
        seen[key] = r["bin_id"]
        tot[(r["source"], r["bin_id"])] = tot.get((r["source"], r["bin_id"]), 0) + r["n_tokens"]
        cnt[(r["source"], r["bin_id"])] = cnt.get((r["source"], r["bin_id"]), 0) + 1
    assert len(seen) == len(docs)
    for k, t in tot.items():
        assert t <= 50 or cnt[k] == 1, k
    # bins are monotone in doc order within each source
    for src in {s for s, _ in seen}:
        ordered = [seen[(s, d)] for s, d in sorted(seen) if s == src]
        assert ordered == sorted(ordered)


def test_bm25_rank_matches_python_oracle(spark):
    import math

    from kermit_spark.ops.text import bm25_rank

    texts = {
        0: "spark table scan table join",
        1: "table",
        2: "cats and dogs play outside all day long",
        3: "scan scan scan table",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    terms = ("table", "scan")
    got = [(r["doc_id"], r["rnk"], r["score"]) for r in bm25_rank(df, terms, k=3).collect()]

    n = len(texts)
    dls = {d: len(t.split()) for d, t in texts.items()}
    avgdl = sum(dls.values()) / n
    dfc = {t: sum(1 for b in texts.values() if t in b.split()) for t in terms}
    k1, b = 1.2, 0.75
    scores = {}
    for d, body in texts.items():
        contribs = []
        for t in sorted(terms):
            tf = body.split().count(t)
            if not tf:
                continue
            idf = math.log((n - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1.0)
            contribs.append(idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dls[d] / avgdl))))
        if contribs:
            acc = 0.0
            for c in contribs:
                acc += c
            scores[d] = math.floor(acc * 10000 + 0.5) / 10000
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == [(d, i + 1, s) for i, (d, s) in enumerate(want)]
    assert got[0][0] in (0, 3)  # docs with both terms outrank the rest
    assert all(d != 2 for d, _, _ in got)  # no query term -> unranked


def test_unigram_logprob_matches_python_mirror(spark):
    import math

    from kermit_spark.ops.text import unigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog"),
        (3, "zq"),          # rare token -> high NLL
        (4, ""),            # empty -> null score
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["nll"]) for r in unigram_logprob(df).collect()}

    # independent mirror (same fold order: sorted terms)
    docs = {i: (t or "").lower().split() for i, t in rows}
    freq: dict[str, int] = {}
    for ws in docs.values():
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
    total = float(sum(len(ws) for ws in docs.values()))
    for i, ws in docs.items():
        assert got[i][0] == len(ws)
        if not ws:
            assert got[i][1] is None
            continue
        per_term: dict[str, int] = {}
        for w in ws:
            per_term[w] = per_term.get(w, 0) + 1
        s = 0.0
        for w in sorted(per_term):
            s += per_term[w] * math.log(freq[w] / total)
        want = math.floor((-s / len(ws)) * 10000.0 + 0.5) / 10000.0
        assert got[i][1] == want
    # the rare-token doc is the least corpus-typical
    scored = {i: v[1] for i, v in got.items() if v[1] is not None}
    assert max(scored, key=scored.get) == 3


# ---------------------------------------------------------------------------
# unicode normalization
# ---------------------------------------------------------------------------


def test_normalize_text_nfc_ctrl_ws(spark):
    from kermit_spark.ops.text import normalize_text

    rows = [
        (1, "café  du\tmonde\r\nok"),   # combining acute + ws runs
        (2, "plain text"),                      # already canonical
        (3, "bad\x00chars\x07here"),            # control chars stripped
        (4, "  lead and trail  "),              # trimmed
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text"] == "café du monde ok" and out[1]["changed"]
    assert out[1]["n_chars_raw"] == len(rows[0][1])
    assert out[1]["n_chars"] == len("café du monde ok")
    assert out[2]["text"] == "plain text" and not out[2]["changed"]
    assert out[3]["text"] == "badcharshere" and out[3]["changed"]
    assert out[4]["text"] == "lead and trail" and out[4]["changed"]


def test_normalize_text_stabilizes_hashing(spark):
    """The motivating property: NFC + ws canonicalization makes visually
    identical docs byte-identical, so exact_dedup collapses them."""
    from pyspark.sql import functions as F

    from kermit_spark.ops.dedup import exact_dedup
    from kermit_spark.ops.text import normalize_text

    df = spark.createDataFrame(
        [(1, "café crema"), (2, "café  crema"), (3, "other doc")],
        "id long, text string",
    )
    before = exact_dedup(df).filter(F.col("n_copies") > 1).count()
    after = exact_dedup(normalize_text(df)).filter(F.col("n_copies") > 1).count()
    assert before == 0 and after == 1


# ---------------------------------------------------------------------------
# hashed linear classifier apply
# ---------------------------------------------------------------------------


def test_hashed_linear_score_matches_python_mirror(spark):
    import hashlib

    from kermit_spark.ops.text import hashed_linear_score

    n_buckets = 32
    weights = {b: (b * 37) % 500 - 250 for b in range(n_buckets)}
    rows = [
        (1, "The quick brown fox JUMPS over  the lazy dog"),
        (2, "short"),
        (3, "   "),          # blank -> 0 tokens, score 0
        (4, None),           # null text -> 0 tokens, score 0
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (r["n_tokens"], r["score_ppm"]) for r in
           hashed_linear_score(df, weights, n_buckets).collect()}

    def mirror(text):
        toks = [t for t in (text or "").strip().lower().split() if t]
        s = 0
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % n_buckets
            s += weights.get(b, 0)
        return len(toks), s

    for i, text in rows:
        assert got[i] == mirror(text), f"doc {i}"
    assert got[3] == (0, 0) and got[4] == (0, 0)


def test_hashed_linear_score_validates_and_zero_shuffle(spark):
    from kermit_spark.ops.text import hashed_linear_score

    df = spark.createDataFrame([(1, "a b")], "id long, text string")
    with pytest.raises(ValueError):
        hashed_linear_score(df, {}, 8)
    with pytest.raises(ValueError):
        hashed_linear_score(df, {9: 1}, 8)
    plan = hashed_linear_score(df, {0: 1}, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_train_hashed_classifier_matches_python_mirror(spark):
    import hashlib

    from kermit_spark.ops.text import train_hashed_classifier

    n_buckets = 32
    rows = [
        (1, "good wine fine dine", 1),
        (2, "good good shine line", 1),
        (3, "bad sad mad cad", 0),
        (4, "bad bad rad", 0),
        (5, "good bad mixed", 1),
        (6, "   ", 0),   # blank: margin 0, always misclassified, no tokens
        (7, None, 1),    # null text: same
    ]
    df = spark.createDataFrame(rows, "id long, text string, label int")
    got_w, got_err = train_hashed_classifier(
        df, n_buckets, iterations=3, id_col="id", label_col="label"
    )

    def buckets(text):
        return [
            int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % n_buckets
            for t in (text or "").strip().lower().split()
            if t
        ]

    docs = [(buckets(t), 2 * y - 1) for _, t, y in rows]
    w: dict[int, int] = {}
    errs = []
    for _ in range(3):
        mis = [(bs, y) for bs, y in docs if y * sum(w.get(b, 0) for b in bs) <= 0]
        errs.append(len(mis))
        upd: dict[int, int] = {}
        for bs, y in mis:
            for b in bs:
                upd[b] = upd.get(b, 0) + y
        if not any(bs for bs, _ in mis):
            break
        for b, d in upd.items():
            nw = w.get(b, 0) + d
            if nw:
                w[b] = nw
            else:
                w.pop(b, None)
    assert got_w == w
    assert got_err == errs


def test_train_hashed_classifier_learns_and_applies(spark):
    from kermit_spark.ops.text import hashed_linear_score, train_hashed_classifier

    # linearly separable vocabulary: every positive doc speaks "prose",
    # every negative doc speaks "boilerplate" — disjoint token sets
    pos_words = ["study", "report", "analysis", "method", "result"]
    neg_words = ["click", "subscribe", "cookie", "banner", "login"]
    rows = []
    for i in range(40):
        words = [(pos_words if i % 2 else neg_words)[(i + j) % 5] for j in range(6)]
        rows.append((i, " ".join(words), i % 2))
    df = spark.createDataFrame(rows, "id long, text string, label int")
    weights, errors = train_hashed_classifier(df, 64, iterations=6, id_col="id")
    assert errors[0] == 40  # zero weights misclassify everything
    assert errors[-1] == 0  # converged on separable data
    assert len(errors) < 6  # convergence break fired before the cap
    scored = {
        r["id"]: r["score_ppm"]
        for r in hashed_linear_score(df, weights, 64, id_col="id").collect()
    }
    for i, _, label in rows:
        assert (scored[i] > 0) == bool(label), f"doc {i}"


def test_train_hashed_classifier_validates(spark):
    from kermit_spark.ops.text import train_hashed_classifier

    df = spark.createDataFrame([(1, "a", 1)], "id long, text string, label int")
    with pytest.raises(ValueError):
        train_hashed_classifier(df, 0)
    with pytest.raises(ValueError):
        train_hashed_classifier(df, 8, iterations=0)


# ---------------------------------------------------------------------------
# soft-404 detection
# ---------------------------------------------------------------------------


def test_soft404_score_flags_error_pages(spark):
    from kermit_spark.ops.text import soft404_score

    rows = [
        (1, "Page Not Found. The page you requested does not exist. "
            "Return to the homepage."),                       # 3 markers
        (2, "Our guide to error 404 handling in web servers."),  # 1 marker
        (3, "perfectly ordinary prose about foxes and dogs"),    # 0
        (4, None),                                               # null-safe
        (5, "404 not found — this file has been removed, try searching."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in soft404_score(df).collect()}
    assert out[1]["soft404_score"] == 3 and out[1]["is_soft404"]
    assert (out[1]["n_notfound"], out[1]["n_missing"], out[1]["n_gohome"]) == (1, 1, 1)
    # single mention (an article ABOUT 404s) stays below the default threshold
    assert out[2]["soft404_score"] == 1 and not out[2]["is_soft404"]
    assert out[3]["soft404_score"] == 0 and not out[3]["is_soft404"]
    assert out[4]["soft404_score"] == 0 and not out[4]["is_soft404"]
    assert out[5]["soft404_score"] == 3 and out[5]["is_soft404"]


def test_soft404_threshold_and_plan(spark):
    from kermit_spark.ops.text import soft404_score

    df = spark.createDataFrame([(1, "page not found")], "doc_id long, text string")
    assert soft404_score(df, threshold=1).collect()[0]["is_soft404"]
    with pytest.raises(ValueError):
        soft404_score(df, threshold=0)
    plan = soft404_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# domain quality rollup / blocklist
# ---------------------------------------------------------------------------


GOOD = ("the cat and the dog are friends that live in a house with the family "
        "and they play in the garden all day, which is lovely to see.")
JUNK = "xx 0@@@#### !!!! ~~~~ %%%%"


def test_domain_quality_rollup_blocks_junk_domains(spark):
    from kermit_spark.ops.text import domain_quality_rollup, filter_blocked_domains

    rows = (
        [(i, "good.com", GOOD) for i in range(4)]
        + [(10 + i, "junk.com", JUNK) for i in range(4)]
        + [(20, "tiny.com", JUNK)]          # junky but below min_docs
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    roll = {r["source"]: r for r in domain_quality_rollup(df, min_docs=3).collect()}
    assert not roll["good.com"]["blocked"]
    assert roll["junk.com"]["blocked"] and roll["junk.com"]["low_ppm"] == 1_000_000
    assert not roll["tiny.com"]["blocked"]          # min_docs guard
    assert roll["good.com"]["n_docs"] == 4
    assert roll["good.com"]["avg_score_e4"] > roll["junk.com"]["avg_score_e4"]

    kept = filter_blocked_domains(df, domain_quality_rollup(df, min_docs=3))
    assert sorted(r["source"] for r in kept.select("source").distinct().collect()) == [
        "good.com", "tiny.com"
    ]


def test_domain_quality_rollup_validates_and_single_shuffle(spark):
    from kermit_spark.ops.text import domain_quality_rollup

    df = spark.createDataFrame([(1, "a", GOOD)], "doc_id long, source string, text string")
    with pytest.raises(ValueError):
        domain_quality_rollup(df, low_threshold=2.0)
    with pytest.raises(ValueError):
        domain_quality_rollup(df, min_docs=0)
    plan = domain_quality_rollup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1          # one shuffle, on the group key


# ---------------------------------------------------------------------------
# within-document line dedup
# ---------------------------------------------------------------------------


def test_dedupe_lines_keeps_first_occurrence(spark):
    from kermit_spark.ops.text import dedupe_lines

    text = "Cookie banner\nreal paragraph one\nCookie banner\n\nreal two\n\nreal paragraph one"
    df = spark.createDataFrame([(1, text), (2, None)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedupe_lines(df).collect()}
    r = out[1]
    # duplicates removed, blank lines (below min_chars) both kept, order held
    assert r["text_deduped"] == "Cookie banner\nreal paragraph one\n\nreal two\n"
    assert (r["n_lines"], r["n_kept"]) == (7, 5)
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (1, 1)   # null-safe

    # min_chars=0: blank-line duplicates dedupe too
    strict = dedupe_lines(df, min_chars=0).collect()
    r0 = {x["doc_id"]: x for x in strict}[1]
    assert r0["text_deduped"] == "Cookie banner\nreal paragraph one\n\nreal two"
    assert r0["n_kept"] == 4


def test_dedupe_lines_validates_and_zero_shuffle(spark):
    from kermit_spark.ops.text import dedupe_lines

    df = spark.createDataFrame([(1, "a\na")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedupe_lines(df, min_chars=-1)
    plan = dedupe_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dsir_logratio_matches_python_mirror(spark):
    import math

    from kermit_spark.ops.text import dsir_logratio, dsir_select
    from pyspark.sql import functions as F

    rows = [
        (1, "the cat sat on the mat"),   # target (2x 'the')
        (2, "the dog and the bone the"), # target (3x 'the')
        (3, "zq zq wt"),                 # raw-only gibberish
        (4, "the cat"),                  # only 1x 'the' -> raw
        (5, ""),                         # empty -> null score
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = (
        F.size(
            F.expr(
                "filter(transform(filter(split(coalesce(text,''), '\\\\s+'),"
                " w -> length(w) > 0), w -> lower(w)), w -> w = 'the')"
            )
        )
        >= 2
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["is_target"], r["logratio"])
        for r in dsir_logratio(df, tgt).collect()
    }

    # independent mirror: add-one smoothed target/raw LMs, term-sorted fold
    docs = {i: (t or "").lower().split() for i, t in rows}
    is_tgt = {i: ws.count("the") >= 2 for i, ws in docs.items()}
    cr: dict[str, int] = {}
    ct: dict[str, int] = {}
    for i, ws in docs.items():
        for w in ws:
            cr[w] = cr.get(w, 0) + 1
            if is_tgt[i]:
                ct[w] = ct.get(w, 0) + 1
    v = len(cr)
    tr = sum(len(ws) for ws in docs.values())
    tt = sum(len(ws) for i, ws in docs.items() if is_tgt[i])
    for i, ws in docs.items():
        assert got[i][0] == len(ws)
        assert got[i][1] == is_tgt[i]
        if not ws:
            assert got[i][2] is None
            continue
        per: dict[str, int] = {}
        for w in ws:
            per[w] = per.get(w, 0) + 1
        s = 0.0
        for w in sorted(per):
            s += per[w] * (
                math.log((ct.get(w, 0) + 1) / (tt + v))
                - math.log((cr[w] + 1) / (tr + v))
            )
        assert got[i][2] == math.floor((s / len(ws)) * 10000.0 + 0.5) / 10000.0

    # semantics: target-like docs outrank the gibberish doc
    assert got[1][2] > got[3][2]
    assert got[2][2] > got[3][2]

    sel = dsir_select(df, tgt, k=2).collect()
    assert [r["rnk"] for r in sel] == [1, 2]
    assert {r["doc_id"] for r in sel} <= {1, 2, 4}


def test_ccnet_buckets_terciles(spark):
    from kermit_spark.ops.text import ccnet_buckets

    # 9 scoreable docs -> exact terciles of 3/3/3; fluent repeated prose
    # scores low NLL (head), singleton-token docs score high (tail)
    rows = [(i, "the cat sat on the mat") for i in range(1, 4)]
    rows += [(i, "a dog ran fast today") for i in range(4, 7)]
    rows += [(6 + i, f"zq{i} xw{i} vk{i}") for i in range(1, 4)]
    rows += [(10, ""), (11, None)]  # unscored -> null bucket
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ccnet_buckets(df).collect()}

    assert [got[i]["bucket"] for i in (10, 11)] == [None, None]
    buckets = [got[i]["bucket"] for i in range(1, 10)]
    assert buckets.count("head") == 3
    assert buckets.count("middle") == 3
    assert buckets.count("tail") == 3
    # bucket order follows NLL order: every head nll <= every middle nll <= tail
    by = {b: [got[i]["nll"] for i in range(1, 10) if got[i]["bucket"] == b]
          for b in ("head", "middle", "tail")}
    assert max(by["head"]) <= min(by["middle"]) <= max(by["middle"]) <= min(by["tail"])
    # the gibberish singleton docs are the tail
    assert {i for i in range(1, 10) if got[i]["bucket"] == "tail"} == {7, 8, 9}


def test_bigram_backoff_matches_python_mirror(spark):
    import math

    from kermit_spark.ops.text import bigram_backoff_logprob

    lm_rows = [(100, "the cat sat on the mat"), (101, "the cat ran")]
    doc_rows = [
        (1, "the cat sat"),    # all bigrams seen in the LM
        (2, "sat the cat"),    # "sat the" unseen -> backoff
        (3, "zq cat"),         # OOV context -> backoff, cw(cat) known
        (4, "cat zq"),         # OOV target -> backoff with cw floor 1
        (5, "one"),            # < 2 tokens -> null
        (6, None),
    ]
    lm = spark.createDataFrame(lm_rows, "doc_id long, text string")
    df = spark.createDataFrame(doc_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll2"])
        for r in bigram_backoff_logprob(df, lm=lm).collect()
    }

    # python mirror
    lm_tok = [t.lower().split() for _, t in lm_rows]
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    n = 0.0
    for ws in lm_tok:
        n += len(ws)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[f"{a} {b}"] = bi.get(f"{a} {b}", 0) + 1

    def score(text):
        ws = (text or "").lower().split()
        if len(ws) < 2:
            return None
        per: dict[str, int] = {}
        for a, b in zip(ws, ws[1:]):
            per[f"{a} {b}"] = per.get(f"{a} {b}", 0) + 1
        s = 0.0
        for bg in sorted(per):
            v, w = bg.split(" ")
            cb = bi.get(bg, 0)
            if cb > 0:
                val = cb / uni.get(v, 1)
            else:
                val = (0.4 * uni.get(w, 1)) / n
            s += per[bg] * math.log(val)
        x = -s / (len(ws) - 1)
        return math.floor(x * 10000.0 + 0.5) / 10000.0

    for i, t in doc_rows:
        ws = (t or "").split()
        assert got[i][0] == max(len(ws) - 1, 0)
        assert got[i][1] == score(t), (i, got[i], score(t))

    # word ORDER sensitivity: same bag, seen order scores better
    assert got[1][1] < got[2][1]


def test_bpe_train_and_encode_match_python_mirror(spark):
    from kermit_spark.ops.text import _EOW, bpe_encode, bpe_train

    rows = [
        (1, "low low low lower lower lowest"),
        (2, "new new newer newer newest wider"),
        (3, "low new wider"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, num_merges=8, min_count=2)

    # python mirror over the same word histogram
    hist: dict[str, int] = {}
    for _, t in rows:
        for w in t.lower().split():
            hist[w] = hist.get(w, 0) + 1
    syms = {w: list(w) + [_EOW] for w in hist}

    def apply_merge(parts, a, b):
        out, j = [], 0
        while j < len(parts):
            if j < len(parts) - 1 and parts[j] == a and parts[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(parts[j])
                j += 1
        return out

    want = []
    for _ in range(8):
        counts: dict[tuple[str, str], int] = {}
        for w, n in hist.items():
            p = syms[w]
            for i in range(len(p) - 1):
                counts[(p[i], p[i + 1])] = counts.get((p[i], p[i + 1]), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), cnt = best
        want.append((a, b, cnt))
        for w in syms:
            syms[w] = apply_merge(syms[w], a, b)

    assert merges == want, (merges, want)
    assert len(merges) >= 4  # the corpus supports several merges

    # encode invariant: applying the learned ranks reproduces the
    # trainer's final symbols for every training word
    enc = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    for i, t in rows:
        expect = [tok for w in t.lower().split() for tok in syms[w]]
        assert enc[i] == expect, (i, enc[i], expect)


def test_script_profile_scripts_and_mojibake(spark):
    from kermit_spark.ops.text import script_profile

    rows = [
        (1, "The quick brown fox jumps over the dog"),
        (2, "\u041f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440 \u044d\u0442\u043e \u0442\u0435\u0441\u0442 \u043a\u0438\u0440\u0438\u043b\u043b\u0438\u0446\u044b \u0441\u0435\u0433\u043e\u0434\u043d\u044f"),
        (3, "\u0645\u0631\u062d\u0628\u0627 \u0628\u0627\u0644\u0639\u0627\u0644\u0645 \u0647\u0630\u0627 \u0627\u062e\u062a\u0628\u0627\u0631 \u0639\u0631\u0628\u064a"),
        (4, "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8\u3068\u6f22\u5b57\u304c\u6df7\u3056\u3063\u3066\u3044\u308b"),
        (5, "ascii with mojibake \u00c3\u00a9 \u00c3\u00a8 \u00c2\u00a0 broken " + "\ufffd" * 3),
        (6, ""),
        (7, "12345 !!! ???"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in script_profile(df).collect()}

    assert got[1]["script"] == "latin" and not got[1]["is_mojibake"]
    assert got[2]["script"] == "cyrillic" and got[2]["cyrillic_n"] > 20
    assert got[3]["script"] == "arabic"
    assert got[4]["script"] == "cjk" and got[4]["latin_n"] == 0
    assert got[5]["is_mojibake"] and got[5]["mojibake_per_kchar"] > 5
    assert got[6]["script"] == "und" and got[6]["n_chars"] == 0
    assert got[7]["script"] == "und" and not got[7]["is_mojibake"]
    # python mirror of the rate for the mojibake doc
    import re

    t5 = rows[4][1]
    n = len(re.findall("[\ufffd]|[\u00c2\u00c3][\u0080-\u00bf]", t5))
    assert got[5]["mojibake_per_kchar"] == (n * 1000) // len(t5)


def test_c4_clean_python_mirror(spark):
    import re

    from kermit_spark.ops.text import (
        C4_LINE_BLOCKWORD,
        C4_PAGE_BLOCK_SUBSTRINGS,
        C4_TERMINAL_RE,
        c4_clean,
    )

    rows = [
        # prose page: 3 real sentences + a nav fragment + a short line
        (1, "This is a perfectly ordinary prose sentence for testing.\n"
            "Home | About | Contact\n"
            "Another complete sentence appears right here in the text!\n"
            "Too short.\n"
            "Finally a third full sentence closes out the page, nicely done?"),
        # javascript banner line must be dropped, rest kept
        (2, "Please enable JavaScript to view the comments powered by a widget.\n"
            "Here is the first real sentence of the document body text.\n"
            "Here is the second real sentence of the document body text.\n"
            "Here is the third real sentence of the document body text."),
        # lorem ipsum page-level drop
        (3, "Lorem ipsum dolor sit amet consectetur adipiscing elit sed do.\n"
            "A second real sentence that would otherwise pass the filter.\n"
            "A third real sentence that would otherwise pass the filter too."),
        # curly brace page-level drop
        (4, "function f() { return 1; } is leaked template code here today.\n"
            "One more sentence that is long enough to pass the line rules.\n"
            "And another sentence that is long enough to pass them as well."),
        # quote-terminated line kept; too-few-sentences page dropped
        (5, 'He said the whole thing was "entirely fine by me."\nShort tail'),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}

    # independent python mirror of the same published rules
    term = re.compile(C4_TERMINAL_RE)
    def mirror(text):
        text = text or ""
        lines = [ln.strip() for ln in text.split("\n")]
        kept = [
            ln for ln in lines
            if term.search(ln)
            and len([w for w in re.split(r"\s+", ln) if w]) >= 5
            and C4_LINE_BLOCKWORD not in ln.lower()
        ]
        clean = "\n".join(kept)
        n_sent = len(re.findall(C4_TERMINAL_RE[:-1], clean))
        blocks = [s in text.lower() for s in C4_PAGE_BLOCK_SUBSTRINGS]
        return clean, len(lines), len(kept), n_sent, blocks, (
            n_sent >= 3 and not any(blocks)
        )

    for doc_id, text in rows:
        clean, n_lines, n_kept, n_sent, blocks, keep = mirror(text)
        r = got[doc_id]
        assert r["text_clean"] == clean, doc_id
        assert r["n_lines"] == n_lines and r["n_kept_lines"] == n_kept, doc_id
        assert r["n_sentences"] == n_sent, doc_id
        assert [r[f"has_block_{i}"] for i in range(len(blocks))] == blocks, doc_id
        assert r["c4_keep"] == keep, doc_id

    # semantic spot checks (the mirror could be wrong the same way twice)
    assert got[1]["c4_keep"] and "Home | About" not in got[1]["text_clean"]
    assert "Too short." not in got[1]["text_clean"]
    assert got[2]["c4_keep"] and "JavaScript" not in got[2]["text_clean"]
    assert not got[3]["c4_keep"] and got[3]["has_block_0"]
    assert not got[4]["c4_keep"] and got[4]["has_block_1"]
    assert not got[5]["c4_keep"]  # only 1 sentence survives
    assert '"' in got[5]["text_clean"]  # quote-terminated line was kept
    assert got[6]["text_clean"] == "" and not got[6]["c4_keep"]


def test_c4_clean_no_shuffle_no_python(spark):
    from kermit_spark.ops.text import c4_clean

    df = spark.createDataFrame([(1, "A sentence that is long enough.")],
                               "doc_id long, text string")
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_c4_clean_validation(spark):
    from kermit_spark.ops.text import c4_clean

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        c4_clean(df, min_words_per_line=0)
    with pytest.raises(ValueError):
        c4_clean(df, min_sentences=-1)
