"""Document reader (S7/X6): format dispatch, error semantics, stub
discipline, and the enrichment pipeline driven from a document file
instead of a pre-extracted string."""

import datetime as dt

import pytest

from rss_feed_etl_spark.operators.enrichment import deterministic_stub_client_factory
from rss_feed_etl_spark.plans.enrichment_pipeline import run_enrichment_from_document
from rss_feed_etl_spark.sources.documents import (
    broadcast_document,
    read_document,
)

STAGE_SCHEMA = (
    "job_title string, link string, entry_title string, published timestamp, "
    "feed_title string, reader string, time_window string, summary string, "
    "notes string"
)


def test_read_document_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        read_document("/nonexistent/resume.pdf")


def test_read_document_unsupported_format(tmp_path):
    p = tmp_path / "resume.txt"
    p.write_text("plain text resume")
    with pytest.raises(ValueError, match="Unsupported"):
        read_document(str(p))


def test_read_document_strict_raises_without_codec(tmp_path):
    p = tmp_path / "resume.pdf"
    p.write_bytes(b"%PDF-1.4 fake")
    with pytest.raises(NotImplementedError, match="PyPDF2"):
        read_document(str(p), strict=True)
    d = tmp_path / "resume.docx"
    d.write_bytes(b"PK fake zip")
    with pytest.raises(NotImplementedError, match="python-docx"):
        read_document(str(d), strict=True)


def test_read_document_stub_roundtrips_text_fixture(tmp_path):
    p = tmp_path / "resume.pdf"
    p.write_text("spark  join\nwindow   skills")
    # stub decode collapses whitespace deterministically
    assert read_document(str(p)) == "spark join window skills"
    assert read_document(str(p)) == read_document(str(p))


def test_read_document_injected_extractor_wins(tmp_path):
    p = tmp_path / "resume.docx"
    p.write_bytes(b"ignored")
    assert read_document(str(p), extractor=lambda _: "injected text") == "injected text"


def test_broadcast_document(spark, tmp_path):
    p = tmp_path / "resume.pdf"
    p.write_text("spark join")
    b = broadcast_document(spark, str(p))
    assert b.value == "spark join"


def test_enrichment_pipeline_from_document(spark, tmp_path):
    """The full reference shape: resume file → extract → enrich.  Scores
    must equal the injected-string path on the same stage rows."""
    p = tmp_path / "resume.pdf"
    p.write_text("resume: spark join experience")
    stage = spark.createDataFrame(
        [
            ("Eng", "L1", "t", dt.datetime(2024, 5, 22, 10), "f", "r", "w", "spark join row", ""),
            ("Eng", "L2", "t", dt.datetime(2024, 5, 22, 11), "f", "r", "w", "cobol stuff", ""),
        ],
        STAGE_SCHEMA,
    )
    factory = deterministic_stub_client_factory(
        lexicon=["spark", "join", "cobol"], resume_skills=["spark", "join"]
    )
    out = run_enrichment_from_document(
        stage, str(p), factory, as_of="2024-05-23 00:00:00", hours_back=24
    )
    rows = {r["link"]: r.asDict() for r in out.collect()}
    assert rows["L1"]["match_percentage"] == 100.0
    assert rows["L2"]["match_percentage"] == 0.0
    assert rows["L2"]["missing_skills"] == ["cobol"]
