from __future__ import annotations

from document_extraction_spark.core.extract import extract_one
from document_extraction_spark.sources.binary_ingest import (
    binary_to_turns,
    extract_binary_files,
    read_binary,
)


def _write_files(tmp_path):
    (tmp_path / "a.txt").write_text("hello first page\fsecond page here\fthird")
    (tmp_path / "b.txt").write_text("single page doc with  spacing\n\n\n\nand paras")
    (tmp_path / "bad.bin").write_bytes(b"ok prefix \xff\xfe invalid utf8 tail")
    (tmp_path / "empty.txt").write_bytes(b"")
    return str(tmp_path)


def test_binary_to_turns_pagination_and_decode(spark, tmp_path):
    src = _write_files(tmp_path)
    rows = binary_to_turns(read_binary(spark, src)).collect()
    # conv_id is the full path (collision safety across subdirs); key the
    # assertions by basename for readability
    turns = {
        (r["conv_id"].rsplit("/", 1)[-1], r["turn_idx"]): r for r in rows
    }
    assert all(r["conv_id"].startswith("/") for r in rows)  # scheme stripped
    assert turns[("a.txt", 0)]["text"] == "hello first page"
    assert turns[("a.txt", 2)]["text"] == "third"
    assert turns[("b.txt", 0)]["turn_idx"] == 0
    # malformed bytes decode deterministically with U+FFFD, never crash
    assert "�" in turns[("bad.bin", 0)]["text"]
    assert turns[("bad.bin", 0)]["text"].startswith("ok prefix ")
    # Spark's binaryFile source skips zero-length files entirely
    assert not any(c == "empty.txt" for c, _ in turns)
    # file mtime carried as the turn timestamp (lineage)
    assert turns[("a.txt", 0)]["ts"] is not None


def test_extract_binary_files_end_to_end(spark, tmp_path):
    """The full reference ingestion loop (extractor.py:21-32), distributed:
    raw bytes -> pages -> extraction kernel; per-page text must equal the
    scalar oracle on the decoded page."""
    src = _write_files(tmp_path)
    out = {
        (r["conv_id"].rsplit("/", 1)[-1], r["turn_idx"]): r
        for r in extract_binary_files(spark, src).collect()
    }
    raw_pages = {
        ("a.txt", 0): "hello first page",
        ("a.txt", 1): "second page here",
        ("a.txt", 2): "third",
        ("b.txt", 0): "single page doc with  spacing\n\n\n\nand paras",
    }
    for key, raw in raw_pages.items():
        assert out[key]["text"] == extract_one(raw)["text"], key
    assert out[("b.txt", 0)]["text"] == "single page doc with spacing\n\nand paras"
    assert len(out) == 5  # 3 + 1 + 1 pages (empty file skipped by the source)


def test_read_binary_glob_filter(spark, tmp_path):
    _write_files(tmp_path)
    only_txt = read_binary(spark, str(tmp_path), glob="*.txt")
    names = {r["path"].rsplit("/", 1)[-1] for r in only_txt.select("path").collect()}
    assert names == {"a.txt", "b.txt"}  # empty.txt skipped (zero-length)


def test_same_basename_different_dirs_do_not_collide(spark, tmp_path):
    """Two files named doc.txt in sibling subdirectories must yield distinct
    conversations — basename-keyed conv_ids collapsed them into one conv
    with duplicate (conv_id, turn_idx) pairs, corrupting keyed dedup."""
    (tmp_path / "d1").mkdir()
    (tmp_path / "d2").mkdir()
    (tmp_path / "d1" / "doc.txt").write_text("from dir one\fpage two")
    (tmp_path / "d2" / "doc.txt").write_text("from dir two")
    turns = binary_to_turns(
        read_binary(spark, f"{tmp_path}/*/")
    ).collect()
    convs = {r["conv_id"] for r in turns}
    assert len(convs) == 2
    keys = [(r["conv_id"], r["turn_idx"]) for r in turns]
    assert len(keys) == len(set(keys)) == 3
    by_key = {k: r["text"] for k, r in zip(keys, turns)}
    assert by_key[(f"{tmp_path}/d1/doc.txt", 0)] == "from dir one"
    assert by_key[(f"{tmp_path}/d2/doc.txt", 0)] == "from dir two"
