"""Tests for unigram-LM scoring (operators/lm.py) and cross-host mirror
detection (operators/mirror.py) — SURVEY 2.10 L27/L28."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from webscraper_spark.operators.lm import unigram_lm_score
from webscraper_spark.operators.mirror import mirror_host_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_unigram_lm_matches_python(spark):
    rows = [
        (0, "ref", "the cat sat on the mat"),
        (1, "ref", "the dog sat on the rug"),
        (2, "web", "the cat and the dog"),
        (3, "web", "zzz qqq xxx vvv"),
        (4, "web", ""),
    ]
    out = {
        r["doc_id"]: r
        for r in unigram_lm_score(_docs(spark, rows), F.col("source") == "ref").collect()
    }
    ref_tokens = "the cat sat on the mat".split() + "the dog sat on the rug".split()
    cnt = Counter(ref_tokens)
    denom_per_tok = len(ref_tokens) + len(cnt)
    for doc_id, _, text in rows:
        toks = text.split()
        n_tok = len(toks)
        num = sum(cnt.get(t, 0) + 1 for t in toks)
        r = out[doc_id]
        assert r["n_tok"] == n_tok
        assert r["lm_num"] == num
        expect = 0.0 if n_tok == 0 else num / (n_tok * denom_per_tok)
        assert r["lm_score"] == expect  # exact: single IEEE division both sides


def test_unigram_lm_ranks_in_domain_above_gibberish(spark):
    rows = [(i, "ref", "common words repeated in the reference slice") for i in range(5)]
    rows += [(10, "web", "common words in the reference style"),
             (11, "web", "xqj zvw plk mnb tyu rde")]
    out = {r["doc_id"]: r["lm_score"]
           for r in unigram_lm_score(_docs(spark, rows), F.col("source") == "ref").collect()}
    assert out[10] > out[11]
    assert 0.0 < out[11] < out[10] <= 1.0


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_mirror_hosts_finds_planted_pair(spark):
    rows = []
    for i in range(5):  # A and B share 5 pages -> mirror pair
        rows += [("a.com", f"page {i} body"), ("b.com", f"page {i} body")]
    rows += [("a.com", "only on a"), ("c.com", "page 0 body")]  # c shares 1 < min_shared
    got = {(r["host_a"], r["host_b"]): r
           for r in mirror_host_pairs(_pages(spark, rows), min_shared=3).collect()}
    assert set(got) == {("a.com", "b.com")}
    r = got[("a.com", "b.com")]
    # degree cap keeps only shared fps: 'only on a' (1 host) is dropped from
    # sizes too, and 'page 0 body' sits on 3 hosts (a,b,c) - still <= cap.
    assert r["shared"] == 5
    assert r["n_a"] == 5 and r["n_b"] == 5
    assert r["overlap"] == 1.0


def test_mirror_boilerplate_cap_drops_common_fp(spark):
    # One '403 Forbidden' page on 25 hosts: above the cap -> no pairs at all.
    rows = [(f"h{i}.com", "403 Forbidden") for i in range(25)]
    assert mirror_host_pairs(_pages(spark, rows), min_shared=1, max_hosts_per_fp=20).count() == 0
    # At cap 30 the same input yields all 300 pairs (each sharing 1 fp).
    allp = mirror_host_pairs(_pages(spark, rows), min_shared=1, max_hosts_per_fp=30)
    assert allp.count() == 25 * 24 // 2
