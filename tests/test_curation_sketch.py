"""Semantic contracts for the r9-continuation curation/sketch ops.

Oracle parity (tools/check_oracle.py) proves cross-engine equality;
these tests pin the ALGORITHMIC invariants on constructed inputs —
the guarantees a user of the operator relies on, independent of what
the synthetic corpus happens to contain.
"""

from __future__ import annotations

from spark_dns_spark.plans.q_curation import (
    BOILER_MIN_DOCS,
    curation_boilerplate_fraction,
)
from spark_dns_spark.plans.q_sampling import (
    CMS_PROBE_K,
    sketch_countmin_freq,
)
from tests.conftest import SF_SMALL


def test_countmin_one_sided_error(spark):
    """CMS estimates NEVER undercount (every occurrence lands in the
    queried cell plus possibly others) and the probe set is exactly
    the top-K terms."""
    rows = sketch_countmin_freq(spark, SF_SMALL).collect()
    assert len(rows) == CMS_PROBE_K
    for r in rows:
        assert r["overcount"] >= 0, f"CMS undercounted {r['w']}"
        assert r["est_n"] == r["exact_n"] + r["overcount"]
        assert r["exact_n"] >= 1


def test_boilerplate_flags_repeated_phrase(spark, tmp_path):
    """A 4-word phrase shared by >= BOILER_MIN_DOCS docs of one source
    is boilerplate; the same phrase in a DIFFERENT source with fewer
    repeats is not (the per-source scoping that makes this CCNet-like
    rather than global dedup)."""
    phrase = "all rights strictly reserved"
    docs = [
        # srcA: the phrase appears in 3 docs (== BOILER_MIN_DOCS)
        (1, f"{phrase} alpha beta gamma delta", "srcA"),
        (2, f"{phrase} epsilon zeta eta theta", "srcA"),
        (3, f"{phrase} iota kappa lam mu", "srcA"),
        # srcA: no phrase — zero boilerplate shingles
        (4, "nu xi omicron pi rho sigma tau", "srcA"),
        # srcB: the phrase appears ONCE — below the threshold there
        (5, f"{phrase} upsilon phi chi psi", "srcB"),
    ]
    src = tmp_path / "documents.parquet"
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(src))
    out = {
        r["doc_id"]: r
        for r in curation_boilerplate_fraction(spark, str(tmp_path)).collect()
    }
    assert BOILER_MIN_DOCS == 3  # the fixture above is built for this
    # docs 1-3: exactly the one shared 4-word shingle is boilerplate
    for d in (1, 2, 3):
        assert out[d]["n_boiler"] == 1, out[d]
        assert 0 < out[d]["boiler_pct_e4"] < 10000
        assert (
            out[d]["boiler_pct_e4"]
            == 10000 // out[d]["n_shingles"]
        )
    # doc 4 (no phrase) and doc 5 (phrase, wrong source): clean
    assert out[4]["n_boiler"] == 0 and out[4]["boiler_pct_e4"] == 0
    assert out[5]["n_boiler"] == 0 and out[5]["boiler_pct_e4"] == 0


def test_boilerplate_fraction_full_doc(spark, tmp_path):
    """A doc that is NOTHING BUT a repeated template scores 10000 e4
    (the signal a mix-filter thresholds on)."""
    tmpl = "copyright two thousand twenty six acme"
    docs = [(i, tmpl, "srcA") for i in range(1, 4)] + [
        (9, "completely original content words here", "srcA")
    ]
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in curation_boilerplate_fraction(spark, str(tmp_path)).collect()
    }
    assert all(out[d]["boiler_pct_e4"] == 10000 for d in (1, 2, 3))
    assert out[9]["boiler_pct_e4"] == 0


def test_bloom_one_sided_error(spark):
    """Bloom membership NEVER misses a true bench gram (every bit of a
    bench gram is set by construction), so n_bloom_hits >= n_exact_hits
    per doc; false positives are the bounded cost of the 1 KB state."""
    from spark_dns_spark.plans.q_curation import contamination_bloom_filter

    rows = contamination_bloom_filter(spark, SF_SMALL).collect()
    assert rows, "corpus produced no probe docs"
    assert all(r["n_false_pos"] >= 0 for r in rows)
    assert all(
        r["n_bloom_hits"] == r["n_exact_hits"] + r["n_false_pos"]
        for r in rows
    )
    # the exact side is a subset of the corpus gram count
    assert all(r["n_exact_hits"] <= r["n_grams"] for r in rows)


def test_boilerplate_clean_removes_exact_spans(spark, tmp_path):
    """The apply side drops EXACTLY the covered 4-word spans: docs
    sharing the phrase lose those 4 words (every occurrence), clean
    docs are byte-identical to their input."""
    import hashlib

    from spark_dns_spark.plans.q_curation import curation_boilerplate_clean

    phrase = "all rights strictly reserved"
    docs = [
        (1, f"{phrase} alpha beta gamma delta", "srcA"),
        (2, f"{phrase} epsilon zeta eta theta", "srcA"),
        (3, f"{phrase} iota kappa lam mu", "srcA"),
        (4, "nu xi omicron pi rho sigma tau", "srcA"),
        (5, f"{phrase} upsilon phi chi psi", "srcB"),  # 1 dup in srcB only
    ]
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in curation_boilerplate_clean(spark, str(tmp_path)).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # docs 1-3: the 4 phrase words drop, the unique tail survives
    assert out[1]["n_kept"] == 4
    assert out[1]["clean_digest"] == md5("alpha beta gamma delta")
    assert out[3]["clean_digest"] == md5("iota kappa lam mu")
    # doc 4 (never boilerplate) and doc 5 (phrase unique in srcB): intact
    assert out[4]["n_kept"] == out[4]["n_words"] == 7
    assert out[4]["clean_digest"] == md5("nu xi omicron pi rho sigma tau")
    assert out[5]["n_kept"] == out[5]["n_words"] == 8


def test_phash_exact_dup_is_hamming_zero(spark, tmp_path):
    """Byte-identical payloads hash identically (hamming 0) and the
    banding NEVER misses them; a very different payload stays out."""
    from spark_dns_spark.plans.q_multimodal import (
        HAM_T,
        multimodal_phash_neardup,
    )

    same = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, same, "srcA"),
        (2, same, "srcA"),  # exact dup of 1
        (9, "ZZZZ 9999 !!!! @@@@ #### $$$$ %%%% ^^^^ &&&& ****", "srcA"),
    ]
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = multimodal_phash_neardup(spark, str(tmp_path)).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert pairs[(1, 2)] == 0
    assert all(h <= HAM_T for h in pairs.values())
