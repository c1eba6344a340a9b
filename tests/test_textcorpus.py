"""JSONL/CSV corpus readers: explicit schema, corrupt-line quarantine."""

from __future__ import annotations

import os

from blockchain_etl_spark.sources.textcorpus import (
    read_csv_documents,
    read_jsonl_documents,
    split_corrupt,
)


def test_jsonl_reader_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10}',
        '{"doc_id": 2, "text": "gamma", "lang": "en", "source": "s1", "n_chars": 5}',
        '{"doc_id": 3, "text": "broken',  # malformed JSON
        '{"doc_id": "not_a_number", "text": "x", "lang": "en", "source": "s0", "n_chars": 1}',
    ]
    p.write_text("\n".join(lines) + "\n")
    clean, corrupt = split_corrupt(read_jsonl_documents(spark, str(p)))
    got = {r.doc_id: r.text for r in clean.collect()}
    assert got == {1: "alpha beta", 2: "gamma"}
    bad = [r[0] for r in corrupt.collect()]
    assert len(bad) == 2
    assert any("broken" in b for b in bad)
    assert any("not_a_number" in b for b in bad)


def test_jsonl_reader_enforces_declared_types(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 7, "text": "t", "lang": "en", "source": "s", "n_chars": 1}\n')
    df = read_jsonl_documents(spark, str(p))
    types = dict(df.drop("_corrupt_record").dtypes)
    assert types == {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    }


def test_csv_reader_roundtrip_with_quarantine(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,alpha beta,en,s0,10\n"
        "oops,not a doc_id,en,s0,xyz\n"
        "2,gamma,fr,s1,5\n"
    )
    clean, corrupt = split_corrupt(read_csv_documents(spark, str(p)))
    got = {r.doc_id: (r.lang, r.n_chars) for r in clean.collect()}
    assert got == {1: ("en", 10), 2: ("fr", 5)}
    assert corrupt.count() == 1


def test_jsonl_parallel_read_matches_single(spark, tmp_path):
    """Many files (the 100 TB layout) read to the same corpus as one file."""
    rows = [
        f'{{"doc_id": {i}, "text": "w{i}", "lang": "en", "source": "s{i % 3}", "n_chars": {i}}}'
        for i in range(20)
    ]
    one = tmp_path / "one.jsonl"
    one.write_text("\n".join(rows) + "\n")
    many = tmp_path / "many"
    os.makedirs(many)
    for i, r in enumerate(rows):
        (many / f"part-{i:03d}.jsonl").write_text(r + "\n")
    a, _ = split_corrupt(read_jsonl_documents(spark, str(one)))
    b, _ = split_corrupt(read_jsonl_documents(spark, str(many)))
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_temperature_mixture_sits_between_proportional_and_equalized(spark, tmp_path):
    """On a SKEWED corpus (the registered corpora are uniform, so this
    writes its own), alpha=1/2 temperature sampling must (a) keep every
    rare source at full rate, (b) downsample the dominant source, and
    (c) land the dominant source's target share strictly between the
    equalized share (1/n_sources) and its proportional share."""
    from pyspark.sql import Row

    from blockchain_etl_spark.plans.registry import get_queries

    rows = []
    did = 0
    for src, n in (("big", 900), ("mid", 80), ("rare", 20)):
        for _ in range(n):
            rows.append(
                Row(doc_id=did, text=f"document {did} body", lang="en",
                    source=src, n_chars=20)
            )
            did += 1
    sf = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{sf}/documents.parquet")

    got = {
        r.source: r
        for r in get_queries()["doc_mixture_temperature"](spark, sf).collect()
    }
    assert set(got) == {"big", "mid", "rare"}
    # sqrt weights: 30 / 8.94 / 4.47 → shares ~0.692 / 0.206 / 0.103
    big, mid, rare = got["big"], got["mid"], got["rare"]
    assert rare.rate_ppm == 1_000_000 and rare.n_kept == 20
    assert big.rate_ppm < 1_000_000, big
    # dominant share: equalized (333333) < temperature < proportional (900000)
    assert 333_333 < big.target_share_ppm < 900_000, big
    # and rarer sources gain share relative to proportional
    assert rare.target_share_ppm > 20_000, rare
    # realized keeps roughly follow the rates (md5 buckets are uniform)
    assert abs(big.n_kept - big.n_docs * big.rate_ppm / 1e6) <= 0.1 * big.n_docs
