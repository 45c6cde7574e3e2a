"""JSONL document source/sink: schema-on-read, dead-letter quarantine,
round-trip fidelity."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from code_challenge___data_engineer___machinemax_spark.sources.jsonl import (
    dead_letter_split,
    read_documents_jsonl,
    write_documents_jsonl,
)
from code_challenge___data_engineer___machinemax_spark.tables import load_table


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path)
    clean, bad = dead_letter_split(read_documents_jsonl(spark, path))
    assert bad.count() == 0
    want = {r.doc_id: (r.text, r.lang, r.source) for r in docs.collect()}
    got = {r.doc_id: (r.text, r.lang, r.source) for r in clean.collect()}
    assert got == want


def test_jsonl_corrupt_lines_are_dead_letters(spark, tmp_path):
    p = tmp_path / "dirty"
    p.mkdir()
    with open(p / "part-0.jsonl", "w") as f:
        f.write('{"doc_id": 1, "text": "good row", "lang": "en"}\n')
        f.write("this is not json at all\n")
        f.write('{"doc_id": 2, "text": "another good", "lang": "en"}\n')
        f.write('{"doc_id": 3, "text": "truncated...\n')
    clean, bad = dead_letter_split(read_documents_jsonl(spark, str(p)))
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    bad_lines = [r.raw_line for r in bad.collect()]
    assert len(bad_lines) == 2
    assert any("not json" in l for l in bad_lines)


def test_jsonl_write_is_line_splittable_gzip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(20).select("doc_id", "text")
    path = str(tmp_path / "gz_jsonl")
    write_documents_jsonl(docs, path)
    parts = [f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".gz")]
    assert parts
    n_lines = 0
    for part in parts:
        with gzip.open(os.path.join(path, part), "rt") as f:
            for line in f:
                assert line.strip().startswith("{") and line.strip().endswith("}")
                n_lines += 1
    assert n_lines == 20


def test_csv_roundtrip_and_dead_letters(spark, sf_dir, tmp_path):
    from code_challenge___data_engineer___machinemax_spark.sources.jsonl import (
        read_documents_csv,
        write_documents_csv,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = str(tmp_path / "docs_csv")
    write_documents_csv(docs, path)
    clean, bad = dead_letter_split(read_documents_csv(spark, path))
    assert bad.count() == 0
    want = {r.doc_id: (r.text, r.lang, r.n_chars) for r in docs.collect()}
    got = {r.doc_id: (r.text, r.lang, r.n_chars) for r in clean.collect()}
    assert got == want

    p = tmp_path / "dirty_csv"
    p.mkdir()
    with open(p / "part-0.csv", "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write('1,"good row",en,web,8\n')
        f.write('not_a_number,"bad id",en,web,6\n')
        f.write('2,"another good",en,web,12\n')
    clean2, bad2 = dead_letter_split(read_documents_csv(spark, str(p)))
    assert {r.doc_id for r in clean2.collect()} == {1, 2}
    assert bad2.count() == 1


def test_dead_letter_split_releases_cache(spark, tmp_path):
    # the split is a context manager that unpersists the shared parsed
    # frame (DISK_ONLY) so ingest loops don't accumulate cached partitions
    import json

    from code_challenge___data_engineer___machinemax_spark.sources.jsonl import (
        read_documents_jsonl,
    )

    p = tmp_path / "docs_cm"
    p.mkdir()
    with open(p / "a.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "t", "lang": "en", "source": "s", "n_chars": 1}) + "\n")
        f.write("{broken\n")
    with dead_letter_split(read_documents_jsonl(spark, str(p))) as split:
        assert split._parsed.storageLevel.useDisk
        assert not split._parsed.storageLevel.useMemory  # DISK_ONLY
        clean, bad = split  # tuple unpacking still works
        assert clean.count() == 1
        assert bad.count() == 1
    assert not split._parsed.storageLevel.useDisk  # released on exit
