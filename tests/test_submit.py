"""spark-submit --py-files launch-path integration test (north rule: runs
are "launched via spark-submit --py-files on multi-executor clusters").

Builds the dist zip with scripts/package.py, then drives a REAL
``spark-submit --master local[4] --py-files kermit_spark.zip
scripts/submit_crawl.py`` from a NEUTRAL cwd (so ``kermit_spark`` can only
resolve from the zip — proving the artifact is self-contained), against a
parquet corpus. The submitted run's final frontier (url, status, wave) set
and document count must equal an in-process crawl with identical config —
same-binary/different-launcher equivalence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from kermit_spark.catalog import SnapshotCatalog
from kermit_spark.corpus import CorpusSpec, build_corpus
from kermit_spark.crawler import Crawler, CrawlConfig
from kermit_spark.fetch import CorpusFetcher
from kermit_spark.frontier import Limit, Politeness

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = CorpusSpec(n_hosts=4, base_pages=10, media_id_space=20)
SEED = "http://h0.test/p/0.html"
BUDGET, WAVES, PARTS = 4, 3, 4


def _spark_submit_bin() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("submit") / "corpus.parquet")
    build_corpus(spark, SPEC).write.parquet(path)
    return path


def _config() -> CrawlConfig:
    return CrawlConfig(
        num_partitions=PARTS,
        politeness=Politeness((Limit(r".*", BUDGET),)),
        max_waves=WAVES,
        sub_salts=2,
    )


def _frontier_state(spark, root):
    cat = SnapshotCatalog(spark, root)
    rows = cat.read("frontier").select("url", "status", "wave").collect()
    docs = cat.read("documents").count()
    return {(r["url"], r["status"], r["wave"]) for r in rows}, docs


def test_spark_submit_py_files_equals_in_process(spark, corpus_path, tmp_path):
    zip_path = str(tmp_path / "kermit_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py"), zip_path],
        check=True, capture_output=True,
    )
    # determinism of the artifact itself (reproducible deploys)
    second = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py"),
         str(tmp_path / "again.zip")],
        check=True, capture_output=True,
    )
    assert second.returncode == 0
    with open(zip_path, "rb") as a, open(tmp_path / "again.zip", "rb") as b:
        assert a.read() == b.read()

    submit_cat = str(tmp_path / "cat_submit")
    neutral_cwd = str(tmp_path / "neutral")
    os.makedirs(neutral_cwd)
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only kermit_spark source
    proc = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            "--catalog", submit_cat,
            "--seeds", SEED,
            "--corpus", corpus_path,
            "--max-waves", str(WAVES),
            "--budget", str(BUDGET),
            "--num-partitions", str(PARTS),
            "--sub-salts", "2",
            "--shuffle-partitions", "8",
        ],
        capture_output=True, text=True, timeout=600, cwd=neutral_cwd, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["fetched_ok"] > 0 and summary["waves"] >= 1

    # in-process twin with identical config
    local_cat = str(tmp_path / "cat_local")
    crawler = Crawler(
        spark, SnapshotCatalog(spark, local_cat),
        CorpusFetcher(spark.read.parquet(corpus_path)), _config(),
    )
    crawler.seed([SEED])
    stats = crawler.crawl()

    submit_state, submit_docs = _frontier_state(spark, submit_cat)
    local_state, local_docs = _frontier_state(spark, local_cat)
    assert submit_state == local_state
    assert submit_docs == local_docs
    assert summary["fetched_ok"] == sum(s.n_fetched_ok for s in stats)
