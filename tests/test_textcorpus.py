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
