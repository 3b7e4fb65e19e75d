from __future__ import annotations

import pytest

from scala_etl_test_spark.operators.bpe import bpe_merges


def _ref_bpe(word_counts: dict[str, int], k: int) -> list[tuple]:
    """Reference BPE (Sennrich-style): overlapping pair counts, greedy
    left-to-right non-overlapping merge, (count desc, pair asc) winner."""
    words = {tuple(w): n for w, n in word_counts.items()}
    out = []
    for step in range(1, k + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + n
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, l, r, l + r, c))
        new: dict[tuple, int] = {}
        for syms, n in words.items():
            lst = list(syms)
            res: list[str] = []
            i = 0
            while i < len(lst):
                if i < len(lst) - 1 and lst[i] == l and lst[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(lst[i])
                    i += 1
            new[tuple(res)] = new.get(tuple(res), 0) + n
        words = new
    return out


def _run(spark, wc: dict[str, int], k: int) -> list[tuple]:
    df = spark.createDataFrame(list(wc.items()), "word string, n long")
    return [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe_merges(df, k).orderBy("step").collect()
    ]


def test_classic_corpus_matches_reference(spark):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 2}
    assert _run(spark, wc, 8) == _ref_bpe(wc, 8)


def test_overlapping_runs_merge_every_other(spark):
    # 'aaaa' counts 3 overlapping (a,a) pairs but merges to exactly [aa, aa];
    # 'aaa' merges to [aa, a]
    wc = {"aaaa": 1, "aaa": 1}
    got = _run(spark, wc, 2)
    assert got == _ref_bpe(wc, 2)
    assert got[0][:3] == (1, "a", "a") and got[0][4] == 5  # 3 + 2 overlapping
    # step 2 ties (aa,aa) with (aa,a) at count 1; lexicographic pick wins
    assert got[1] == (2, "aa", "a", "aaa", 1)


def test_exhausted_vocab_stops_contributing(spark):
    wc = {"ab": 3}
    got = _run(spark, wc, 5)
    assert got == [(1, "a", "b", "ab", 3)]  # steps 2..5 have no pairs left


def test_tie_breaks_lexicographic(spark):
    wc = {"ba": 1, "ab": 1}  # (a,b) and (b,a) both count 1
    got = _run(spark, wc, 1)
    assert got[0][1:3] == ("a", "b")


def test_bad_merge_count_rejected(spark):
    df = spark.createDataFrame([("ab", 1)], "word string, n long")
    with pytest.raises(ValueError):
        bpe_merges(df, 0)


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encode: apply merges once each in training order, greedy
    left-to-right non-overlapping (equivalent to rank-priority apply-BPE)."""
    syms = list(word)
    for l, r in merges:
        res: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                res.append(l + r)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def test_encode_matches_reference_per_word(spark):
    from scala_etl_test_spark.operators.bpe import bpe_encode, collect_merges

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 2}
    df = spark.createDataFrame(list(wc.items()), "word string, n long")
    merges = collect_merges(bpe_merges(df, 8))
    docs = spark.createDataFrame(
        [(0, "low lower newest"), (1, "widest aaaa low"), (2, "aaaa aaaa")],
        "doc_id long, text string",
    )
    got: dict[tuple[int, int], list[str]] = {}
    for r in bpe_encode(docs, merges).orderBy("doc_id", "pos", "tok_idx").collect():
        got.setdefault((r["doc_id"], r["pos"]), []).append(r["token"])
    texts = {0: "low lower newest", 1: "widest aaaa low", 2: "aaaa aaaa"}
    for (doc, pos), toks in got.items():
        word = texts[doc].split()[pos]
        assert toks == _ref_encode(word, merges), (doc, pos, word, toks)
    # every word position is present
    assert {(d, p) for (d, p) in got} == {
        (d, p) for d, t in texts.items() for p in range(len(t.split()))
    }


def test_encode_roundtrip_concat(spark):
    """Concatenating a word's subword tokens reconstructs the word."""
    from scala_etl_test_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(0, "interchange changer"), (1, "exchange")], "doc_id long, text string"
    )
    merges = [("c", "h"), ("ch", "a"), ("n", "g"), ("cha", "ng"), ("e", "r")]
    rows = bpe_encode(docs, merges).orderBy("doc_id", "pos", "tok_idx").collect()
    rebuilt: dict[tuple[int, int], str] = {}
    for r in rows:
        key = (r["doc_id"], r["pos"])
        rebuilt[key] = rebuilt.get(key, "") + r["token"]
    assert rebuilt == {
        (0, 0): "interchange",
        (0, 1): "changer",
        (1, 0): "exchange",
    }


def test_empty_string_word_type_ignored(spark):
    wc = {"": 1000, "ab": 3}
    df = spark.createDataFrame(list(wc.items()), "word string, n long")
    got = [(r["lhs"], r["rhs"]) for r in bpe_merges(df, 1).collect()]
    assert got == [("a", "b")]  # the '' type contributes no phantom pair


def test_encode_with_empty_merge_list_is_char_level(spark):
    from scala_etl_test_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame([(0, "hi there")], "doc_id long, text string")
    rows = bpe_encode(docs, []).orderBy("pos", "tok_idx").collect()
    toks = [r["token"] for r in rows]
    assert toks == list("hi") + list("there")
