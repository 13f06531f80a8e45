"""Real `spark-submit --py-files` launch of the extraction job — the
exact production invocation from BASELINE.json north_rule — run from a
clean cwd with no repo PYTHONPATH, so driver AND executor imports of
dompa_spark come only from the shipped zip. Also proves checkpoint
resume across separate spark-submit processes.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = 120


def _spark_submit() -> str:
    import pyspark

    path = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    if not os.path.exists(path):  # pragma: no cover
        pytest.skip("spark-submit launcher not found")
    return path


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("submit")
    # package zip, exactly as --py-files expects it
    zpath = wd / "dompa_spark.zip"
    pkg = os.path.join(REPO, "dompa_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    # primary script copied OUT of the repo: nothing importable from cwd
    shutil.copy(os.path.join(REPO, "dompa_spark", "jobs", "extract.py"),
                wd / "extract.py")
    sys.path.insert(0, REPO)
    from dompa_spark import corpus

    corpus.write_corpus(str(wd / "corpus"), N_DOCS)
    return wd


def _submit(workdir, *extra) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(workdir / "dompa_spark.zip"),
            str(workdir / "extract.py"),
            "--input", str(workdir / "corpus"),
            "--output", str(workdir / "out"),
            "--light-parts", "4", "--heavy-parts", "2",
            *extra,
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats_line = [ln for ln in proc.stdout.splitlines()
                  if ln.startswith("{")][-1]
    return json.loads(stats_line)


def test_spark_submit_pyfiles_end_to_end(workdir):
    stats = _submit(workdir)
    assert stats["docs"] == N_DOCS
    assert stats["parts_total"] == 6
    assert stats["parts_skipped"] == 0
    # written dataset is readable and complete
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(DISTINCT doc_id) FROM "
        f"'{workdir}/out/data/chunk=*/*.parquet'"
    ).fetchone()[0]
    assert n == N_DOCS
    manifest = con.execute(
        f"SELECT sum(doc_count) FROM "
        f"'{workdir}/out/_manifest/chunk=*/*.parquet'"
    ).fetchone()[0]
    assert manifest == N_DOCS


def test_spark_submit_resume_skips_done_chunks(workdir):
    # depends on the previous test's completed output (module-scoped dir)
    stats = _submit(workdir)
    assert stats["parts_skipped"] == stats["parts_total"] == 6
    assert stats["chunks_run"] == 0
    assert stats["docs"] == 0


def test_spark_submit_pretrain_corpus_pipeline(workdir):
    """The composed pipeline job under REAL spark-submit --py-files —
    the production invocation for the full extract->curate->dedup->kept
    flow. Runs from the clean workdir: imports come only from the zip."""
    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "pretrain_corpus.py"),
        os.path.join(str(workdir), "pretrain_corpus.py"),
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(workdir / "dompa_spark.zip"),
            str(workdir / "pretrain_corpus.py"),
            "--input", str(workdir / "corpus"),
            "--workdir", str(workdir / "pipeline_work"),
            "--chunk-parts", "4",
            "--light-parts", "4", "--heavy-parts", "2",
            "--with-repetition", "--with-line-dedup",
            "--with-span-dedup",
            "--domain-cap", "100",
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert stats["docs"] == N_DOCS
    assert 0 < stats["kept"] < N_DOCS
    # span stage ran (count present; >= 0 — the kept set is already
    # doc-level deduped, so cross-doc 8-gram repeats may be sparse)
    assert stats["span_tokens_removed"] >= 0
    con = duckdb.connect()
    n_kept = con.execute(
        f"SELECT count(DISTINCT doc_id) FROM "
        f"'{workdir}/pipeline_work/kept/*.parquet'"
    ).fetchone()[0]
    assert n_kept == stats["kept"]
