"""spark-submit --py-files deployment smoke — the north_rule's run mode.

Packages ``urlmap_spark`` into a zip, launches a REAL ``spark-submit``
subprocess whose driver imports the package ONLY from ``--py-files``
(PYTHONPATH stripped, cwd outside the repo), runs the CLI crawl over a
corpus parquet, and checks the text output against the oracle BFS.
This is the sandbox stand-in for "runs via spark-submit --py-files on
multi-executor clusters": the same zip + launcher pair submits
unchanged to a real cluster master.
"""

import glob
import os
import subprocess
import sys
import zipfile

import pytest

from urlmap_spark.plans.oracle import oracle_bfs
from urlmap_spark.sources import corpus as C

SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_py_files_crawl(tmp_path):
    zip_path = tmp_path / "urlmap_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "urlmap_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))

    pdf = C.corpus_pandas(seed=42, n_hosts=3, total_pages=30,
                          with_bytes=False)
    corpus = tmp_path / "corpus.parquet"
    pdf.to_parquet(corpus)

    launcher = tmp_path / "run_cli.py"
    launcher.write_text(
        "import sys\nfrom urlmap_spark.cli import main\n"
        "sys.exit(main())\n")
    out_dir = tmp_path / "out"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    seed = "https://h0.example-42.test/"
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", str(zip_path), str(launcher),
         "--corpus", str(corpus), "--depth", "2",
         "--output", str(out_dir), "--output-format", "text",
         "--master", "local[4]", seed],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])

    got = []
    for part in sorted(glob.glob(str(out_dir / "part-*"))):
        with open(part) as f:
            got += [ln.strip() for ln in f if ln.strip()]
    eres, _ = oracle_bfs(pdf, seed, max_depth=2)
    want = sorted({res.url for res in eres})
    assert got == want
