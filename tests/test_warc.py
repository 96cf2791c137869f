"""WARC export/import (kermit_spark/warc.py): byte-exact framing, lossless
round trip, determinism, and robustness to adversarial bodies."""

import glob

from pyspark.sql import functions as F

from kermit_spark.warc import read_warc, write_warc


def _docs(spark):
    rows = [
        ("http://a.test/1", 0, 200, "text/html", "<html>one é</html>"),
        ("http://a.test/2", 0, 404, "text/plain", ""),
        ("http://a.test/3", 1, 200, "text/html",
         "body containing\r\n\r\nWARC/1.0\r\nfake record header"),
        ("http://a.test/4", 1, 200, None, None),
    ]
    return spark.createDataFrame(
        rows, "url string, wave int, status int, content_type string, body string"
    )


def test_warc_round_trip(spark, tmp_path):
    path = str(tmp_path / "w")
    write_warc(_docs(spark).repartition(2), path)
    back = {r["url"]: r for r in read_warc(spark, path).collect()}
    assert len(back) == 4
    r1 = back["http://a.test/1"]
    assert (r1["status"], r1["content_type"], r1["body"]) == (200, "text/html", "<html>one é</html>")
    assert back["http://a.test/2"]["status"] == 404
    # a body that LOOKS like a record header parses fine (length-framed)
    assert back["http://a.test/3"]["body"].endswith("fake record header")
    assert back["http://a.test/3"]["wave"] == 1
    # null body/content-type: octet-stream default, empty body
    assert back["http://a.test/4"]["body"] == ""


def test_warc_files_are_valid_and_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs = _docs(spark).repartition(1)
    write_warc(docs, a)
    write_warc(docs, b)
    fa = sorted(glob.glob(f"{a}/part-*"))
    fb = sorted(glob.glob(f"{b}/part-*"))
    assert fa and len(fa) == len(fb)
    for x, y in zip(fa, fb):
        bytes_x = open(x, "rb").read()
        assert bytes_x == open(y, "rb").read()   # identical re-run
        assert bytes_x.startswith(b"WARC/1.0\r\n")
        assert bytes_x.endswith(b"\r\n\r\n")
        # fixed date parameter, never wall clock
        assert b"WARC-Date: 2000-01-01T00:00:00Z" in bytes_x
