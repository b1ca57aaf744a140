"""Round-9 property tests: the per-cell budget threaded through the
rest of the SemDeDup family (capped == uncapped below the cap, capped
keeps a superset above it is pinned at r8 for the base query), and
paragraph-dedup invariants (exact paragraph repeats always dropped,
first occurrence always kept, rebuild consistency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.01"


def _kv(df, *cols):
    return {tuple(r[c] for c in cols[:-1]): r[cols[-1]] for r in df.collect()}


def test_diverse_capped_identical_below_cap(spark):
    """At sf0.01 max cell 42 < 64: the capped edge set equals the
    uncapped one, so components and keep verdicts are identical."""
    got = {
        r.vec_id: (r.cell, r.component, r.keep)
        for r in QUERIES["x_semdedup_diverse_capped"].spark(spark, SF).collect()
    }
    want = {
        r.vec_id: (r.cell, r.component, r.keep)
        for r in QUERIES["x_semdedup_diverse"].spark(spark, SF).collect()
    }
    assert got == want


def test_keep_best_capped_identical_below_cap(spark):
    got = {
        r.component: (r.n_members, r.kept_vec_id, r.kept_qual_fp)
        for r in QUERIES["x_semdedup_keep_best_capped"].spark(spark, SF).collect()
    }
    want = {
        r.component: (r.n_members, r.kept_vec_id, r.kept_qual_fp)
        for r in QUERIES["x_semdedup_keep_best"].spark(spark, SF).collect()
    }
    assert got == want


def test_refined_capped_identical_below_cap(spark):
    got = {
        r.vec_id: (r.cell, r.keep)
        for r in QUERIES["x_semdedup_refined_capped"].spark(spark, SF).collect()
    }
    want = {
        r.vec_id: (r.cell, r.keep)
        for r in QUERIES["x_semdedup_refined"].spark(spark, SF).collect()
    }
    assert got == want


def test_paragraph_dedup_drops_exact_repeats_keeps_first(spark):
    """Build a corpus with a known boilerplate paragraph injected into
    several docs: every occurrence after the first (in (doc_id, pidx)
    order) must be dropped, the first kept, unique paragraphs kept."""
    from realtime_banking_cdc_pipeline_spark.queries.round9 import (
        _PARA_TOKENS,
        x_paragraph_dedup,
    )
    import os
    import tempfile

    boiler = " ".join(f"boiler{i}" for i in range(_PARA_TOKENS))
    docs = []
    for d in range(6):
        uniq = " ".join(f"u{d}w{i}" for i in range(_PARA_TOKENS))
        uniq2 = " ".join(f"v{d}w{i}" for i in range(_PARA_TOKENS))
        # boilerplate sits at block 1 of every even doc
        text = uniq + " " + (boiler if d % 2 == 0 else uniq2) + " " + uniq2
        docs.append((d, text, "en", "test", len(text)))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )
        out = {r.doc_id: r for r in x_paragraph_dedup(spark, tmp).collect()}
    # doc 0 keeps all 3 paragraphs (first boiler occurrence)
    assert out[0].n_paras == 3 and out[0].n_removed == 0
    assert boiler in out[0].clean_text
    # docs 2 and 4 lose exactly the boilerplate block
    for d in (2, 4):
        assert out[d].n_paras == 3 and out[d].n_removed == 1
        assert boiler not in out[d].clean_text
        # surviving text is the unique blocks in original order
        assert out[d].clean_text.startswith(f"u{d}w0 ")
    # odd docs (no boilerplate, duplicated uniq2 block within doc):
    # second occurrence of uniq2 inside the same doc is an exact
    # repeat -> dropped, keep-first within the doc
    for d in (1, 3, 5):
        assert out[d].n_paras == 3 and out[d].n_removed == 1


def test_paragraph_dedup_rebuild_consistency(spark):
    """On the real fixture: n_paras = ceil(tokens/20); kept text's
    token count = (n_paras - n_removed) * 20 except the final short
    block; dropped mass is non-negative and bounded."""
    from realtime_banking_cdc_pipeline_spark.functions.text import ws_tokens

    res = QUERIES["x_paragraph_dedup"].spark(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.size(ws_tokens("text")).alias("n_tok")
    )
    j = res.join(docs, "doc_id").select(
        "doc_id", "n_paras", "n_removed", "n_tok",
        F.size(ws_tokens("clean_text")).alias("n_kept_tok"),
    )
    for r in j.collect():
        assert r.n_paras == (r.n_tok + 19) // 20
        assert 0 <= r.n_removed <= r.n_paras
        # kept tokens can't exceed original and must be >= kept-block
        # lower bound (every kept block has >= 1 token)
        assert r.n_kept_tok <= r.n_tok
        if r.n_removed == 0:
            assert r.n_kept_tok == r.n_tok
