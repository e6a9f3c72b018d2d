"""JSONL corpus source: schema-enforced parse, corrupt-record capture,
required-field triage (sources/jsonl.py)."""

import json

from oasisdb_spark.sources.jsonl import read_jsonl_corpus


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_jsonl_good_bad_split(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    _write(
        p,
        [
            json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}),
            json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}),
            "{not valid json at all",
            json.dumps({"doc_id": 3, "lang": "en", "source": "web"}),  # missing text
            json.dumps({"text": "no id", "lang": "en", "source": "web"}),  # missing doc_id
        ],
    )
    good, bad = read_jsonl_corpus(spark, str(p))
    g = {r["doc_id"] for r in good.collect()}
    assert g == {1, 2}
    assert "_corrupt_record" not in good.columns
    b = bad.collect()
    assert len(b) == 3
    corrupt = [r for r in b if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and "not valid json" in corrupt[0]["_corrupt_record"]


def test_jsonl_roundtrips_documents_table(spark, documents, tmp_path):
    """The fixture documents table written as JSONL reads back
    identically through the corpus source (no silent coercions)."""
    p = str(tmp_path / "docs_jsonl")
    documents.select("doc_id", "text", "lang", "source").coalesce(2).write.json(p)
    good, bad = read_jsonl_corpus(spark, p)
    assert bad.count() == 0
    assert good.count() == documents.count()
    orig = {(r["doc_id"], r["text"]) for r in documents.select("doc_id", "text").collect()}
    back = {(r["doc_id"], r["text"]) for r in good.select("doc_id", "text").collect()}
    assert back == orig
