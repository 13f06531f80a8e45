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
            "--with-repetition", "--with-host-boilerplate",
            "--with-line-dedup", "--with-span-dedup",
            "--with-mixture",
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
    # host-boilerplate stage ran (host-scoped template strip; the
    # synthetic corpus has few docs per source so the 60%/3-doc vote
    # may legitimately strip nothing — presence + non-negative is the
    # contract here, semantics are pinned by the operator tests)
    assert stats["host_template_segments_removed"] >= 0
    con = duckdb.connect()
    n_kept = con.execute(
        f"SELECT count(DISTINCT doc_id) FROM "
        f"'{workdir}/pipeline_work/kept/*.parquet'"
    ).fetchone()[0]
    assert n_kept == stats["kept"]
    # mixture plan: en-language docs survive with >= 1 copies each;
    # mixed/other (target 0) drop; ids stay the ORIGINAL string ids
    assert 0 < stats["mixture_docs"] <= stats["kept"]
    assert stats["mixture_copies"] >= stats["mixture_docs"]
    plan_langs = con.execute(
        f"SELECT DISTINCT lang FROM "
        f"'{workdir}/pipeline_work/mixture_plan/*.parquet'"
    ).fetchall()
    assert plan_langs == [("en",)]


def test_spark_submit_incremental_dedup_sig_cycle(workdir):
    """The monthly re-crawl loop under real spark-submit, TWO cycles:
    cycle 1 hashes the prior corpus in-job (--old) and persists the
    signature union (--save-sigs); cycle 2 consumes the persisted
    table (--old-sigs) — flags must agree with an --old run on the
    same snapshot pair, proving stored sigs == recomputed sigs."""
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT CAST(i AS BIGINT) AS doc_id,
                 'old words number ' || CAST(i AS VARCHAR) ||
                 ' alpha beta gamma delta' AS text
          FROM range(40) t(i)
        ) TO '{workdir}/inc_old' (FORMAT parquet)""")
    # new crawl: 10 docs copy old texts verbatim, 10 are novel
    con.execute(f"""
        COPY (
          SELECT CAST(100 + i AS BIGINT) AS doc_id,
                 CASE WHEN i < 10 THEN
                   'old words number ' || CAST(i AS VARCHAR) ||
                   ' alpha beta gamma delta'
                 ELSE 'fresh content ' || CAST(i AS VARCHAR) ||
                   ' epsilon zeta eta theta' END AS text
          FROM range(20) t(i)
        ) TO '{workdir}/inc_new' (FORMAT parquet)""")
    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "incremental_dedup.py"),
        os.path.join(str(workdir), "incremental_dedup.py"),
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def run(extra):
        proc = subprocess.run(
            [
                _spark_submit(),
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", str(workdir / "dompa_spark.zip"),
                str(workdir / "incremental_dedup.py"),
                "--new", str(workdir / "inc_new"),
            ] + extra,
            cwd=str(workdir), env=env, capture_output=True, text=True,
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return json.loads(
            [ln for ln in proc.stdout.splitlines()
             if ln.startswith("{")][-1]
        )

    s1 = run(["--old", str(workdir / "inc_old"),
              "--output", str(workdir / "inc_flags1"),
              "--save-sigs", str(workdir / "inc_sigs")])
    assert s1 == {"new_docs_hashed": 20, "novel": 10}
    s2 = run(["--old-sigs", str(workdir / "inc_sigs"),
              "--output", str(workdir / "inc_flags2")])
    # cycle 2's old side includes the cycle-1 NEW docs too (the union),
    # so the 10 copies still flag and the 10 novel docs now ALSO flag
    # (they are in the accumulated sig table verbatim)
    assert s2["new_docs_hashed"] == 20 and s2["novel"] == 0
    a = con.execute(
        f"SELECT doc_id, is_dup_of_prior FROM "
        f"'{workdir}/inc_flags1/*.parquet' ORDER BY doc_id").fetchall()
    assert sum(1 for _d, f in a if f) == 10


def test_spark_submit_incremental_dedup_bloom_prefilter(workdir):
    """--exact-prefilter under real spark-submit, TWO cycles: cycle 1
    derives the Bloom artifacts from --old in-job, drops the verbatim
    copies BEFORE minhash hashing, and persists bitmap/fps/params
    (--save-bloom-index); cycle 2 consumes the persisted index
    (--old-bloom-index) — the accumulated filter now contains cycle
    1's new docs too, so every re-sent doc is dropped exactly."""
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT CAST(i AS BIGINT) AS doc_id,
                 'prior words number ' || CAST(i AS VARCHAR) ||
                 ' alpha beta gamma delta' AS text
          FROM range(40) t(i)
        ) TO '{workdir}/bl_old' (FORMAT parquet)""")
    # new crawl: 10 verbatim copies of prior docs, 10 novel
    con.execute(f"""
        COPY (
          SELECT CAST(100 + i AS BIGINT) AS doc_id,
                 CASE WHEN i < 10 THEN
                   'prior words number ' || CAST(i AS VARCHAR) ||
                   ' alpha beta gamma delta'
                 ELSE 'fresh content ' || CAST(i AS VARCHAR) ||
                   ' epsilon zeta eta theta' END AS text
          FROM range(20) t(i)
        ) TO '{workdir}/bl_new' (FORMAT parquet)""")
    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "incremental_dedup.py"),
        os.path.join(str(workdir), "incremental_dedup.py"),
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def run(extra):
        proc = subprocess.run(
            [
                _spark_submit(),
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", str(workdir / "dompa_spark.zip"),
                str(workdir / "incremental_dedup.py"),
                "--new", str(workdir / "bl_new"),
                "--exact-prefilter",
            ] + extra,
            cwd=str(workdir), env=env, capture_output=True, text=True,
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return json.loads(
            [ln for ln in proc.stdout.splitlines()
             if ln.startswith("{")][-1]
        )

    s1 = run(["--old", str(workdir / "bl_old"),
              "--output", str(workdir / "bl_flags1"),
              "--save-bloom-index", str(workdir / "bl_index")])
    # the 10 verbatim copies never reach minhash hashing
    assert s1["exact_dups_dropped"] == 10
    assert s1["new_docs_hashed"] == 10 and s1["novel"] == 10
    assert os.path.isdir(str(workdir / "bl_index" / "bitmap"))
    assert os.path.isdir(str(workdir / "bl_index" / "fps"))
    # cycle 2: same crawl resent against the persisted index — the
    # accumulated filter holds prior + cycle-1 new content, so ALL 20
    # docs are exact dups now and nothing reaches the near-dup stage
    s2 = run(["--old", str(workdir / "bl_old"),
              "--old-bloom-index", str(workdir / "bl_index"),
              "--output", str(workdir / "bl_flags2")])
    assert s2["exact_dups_dropped"] == 20
    assert s2["new_docs_hashed"] == 0 and s2["novel"] == 0


def test_spark_submit_frontier_job(workdir):
    """URL-frontier prep under real spark-submit: canonicalize ->
    dup-drop -> blocklist -> per-host cap as the surviving fetch
    list, then the --keep-denied audit form with verdict columns."""
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT * FROM (VALUES
            (0, 'HTTP://EX.com:80/a/'),
            (1, 'http://ex.com/a'),
            (2, 'http://ex.com/a?utm_x=1'),
            (3, 'https://Blocked.org/Bad/x'),
            (4, 'https://blocked.org/ok'),
            (5, 'https://other.net/p5'),
            (6, 'https://flood.io/p6'),
            (7, 'https://flood.io/p7'),
            (8, 'https://flood.io/p8'),
            (9, 'https://flood.io/p9'),
            (10, 'https://flood.io/p10'),
            (11, 'https://flood.io/p11'),
            (12, NULL),
            (13, 'example.com/noscheme'),
            (14, 'https://Blocked.org/Bad/x')
          ) t(doc_id, url)
        ) TO '{workdir}/fr_urls' (FORMAT parquet)""")
    con.execute(f"""
        COPY (
          SELECT * FROM (VALUES (1, 'blocked.org', '/Bad'))
            t(rule_id, host, path_prefix)
        ) TO '{workdir}/fr_rules' (FORMAT parquet)""")
    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "frontier.py"),
        os.path.join(str(workdir), "frontier.py"),
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def run(extra):
        proc = subprocess.run(
            [
                _spark_submit(),
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", str(workdir / "dompa_spark.zip"),
                str(workdir / "frontier.py"),
                "--urls", str(workdir / "fr_urls"),
                "--blocklist", str(workdir / "fr_rules"),
            ] + extra,
            cwd=str(workdir), env=env, capture_output=True, text=True,
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return json.loads(
            [ln for ln in proc.stdout.splitlines()
             if ln.startswith("{")][-1]
        )

    s1 = run(["--output", str(workdir / "fr_kept"), "--per-host-cap", "3"])
    # 15 in; out: ex.com/a keeper (0), blocked.org/ok (4), other.net
    # (5), and the 3 lowest flood.io docs (6,7,8); the null-url,
    # scheme-less, and denied-group rows never reach the fetch list
    assert s1 == {"urls_in": 15, "rows_out": 6}
    kept = con.execute(
        f"SELECT doc_id, url_canon FROM '{workdir}/fr_kept/*.parquet' "
        "ORDER BY doc_id").fetchall()
    assert [r[0] for r in kept] == [0, 4, 5, 6, 7, 8]
    assert kept[0][1] == "http://ex.com/a"

    s2 = run(["--output", str(workdir / "fr_audit"), "--keep-denied"])
    # denied propagates to the whole canonical group: docs 3 AND 14
    assert s2 == {"urls_in": 15, "rows_out": 15, "denied": 2, "dups": 3}
    audit = {
        r[0]: r for r in con.execute(
            f"SELECT doc_id, denied, is_dup, fetchable FROM "
            f"'{workdir}/fr_audit/*.parquet'").fetchall()
    }
    assert audit[3][1] is True and audit[1][2] is True
    assert audit[14][1] is True and audit[14][2] is True  # dup of denied
    assert audit[12][1] is False  # null url: not denied, not a dup
    assert audit[12][3] is False and audit[13][3] is False  # unfetchable
    assert audit[0][3] is True

    # third form: robots politeness + sitemap ingestion. ex.com's
    # policy disallows /a for '*' (blocks the doc-0 keeper); the
    # sitemap contributes one new URL under the reserved negative
    # doc_id space and one that dedups against an existing crawl URL
    con.execute(f"""
        COPY (
          SELECT * FROM (VALUES
            ('ex.com', 'User-agent: *' || chr(10) || 'Disallow: /a')
          ) t(host, robots_txt)
        ) TO '{workdir}/fr_robots' (FORMAT parquet)""")
    con.execute(f"""
        COPY (
          SELECT '90' AS doc_id,
                 [struct_pack(kind := 'html',
                    text := '<urlset><url><loc>https://sm.new/page/</loc>'
                            || '</url><url><loc>https://other.net/p5#x</loc>'
                            || '</url></urlset>',
                    media_ref := CAST(NULL AS VARCHAR),
                    "offset" := CAST(0 AS INTEGER))] AS spans
        ) TO '{workdir}/fr_sitemaps' (FORMAT parquet)""")
    s3 = run([
        "--output", str(workdir / "fr_kept3"),
        "--robots", str(workdir / "fr_robots"),
        "--sitemaps", str(workdir / "fr_sitemaps"),
    ])
    # 15 urls + 2 sitemap locs in; sitemap ids are the reserved
    # hash-slot composite -1 - (md5_60('90') % 2^43)*2^16 - url_pos:
    # pos 0 = sm.new/page/, pos 1 = other.net/p5#x (it dedups against
    # crawl doc 5 and, being the minimum id, takes the keeper slot).
    # Fetch list: the two sitemap rows, blocked.org/ok (4), flood.io
    # 6-11; ex.com/a is robots-blocked, doc 5 is now a dup
    assert s3 == {"urls_in": 17, "rows_out": 9}
    import hashlib as _hl0

    sm_base = -1 - (
        int(_hl0.md5(b"90").hexdigest()[:15], 16) % 2 ** 43
    ) * 2 ** 16
    kept3 = con.execute(
        f"SELECT doc_id, url_canon FROM '{workdir}/fr_kept3/*.parquet' "
        "ORDER BY doc_id").fetchall()
    assert [r[0] for r in kept3] == [
        sm_base - 1, sm_base, 4, 6, 7, 8, 9, 10, 11]
    assert -(2 ** 60) < sm_base - 1 < 0  # above the discovery band
    assert kept3[0][1] == "https://other.net/p5"
    assert kept3[1][1] == "https://sm.new/page"
    assert all(r[0] != 0 for r in kept3)  # robots blocked the keeper

    # fourth form: --discover-sitemaps pulls the Sitemap: directive
    # out of robots.txt and makes the sitemap FILE itself a fetch
    # candidate (step 0 of --sitemaps), under the far-negative
    # md5_60(host) id band
    con.execute(f"""
        COPY (
          SELECT * FROM (VALUES
            ('ex.com', 'User-agent: *' || chr(10) || 'Disallow: /a'
                       || chr(10)
                       || 'Sitemap: https://EX.com/sitemap.xml')
          ) t(host, robots_txt)
        ) TO '{workdir}/fr_robots2' (FORMAT parquet)""")
    s4 = run([
        "--output", str(workdir / "fr_kept4"),
        "--robots", str(workdir / "fr_robots2"),
        "--discover-sitemaps",
    ])
    assert s4 == {
        "urls_in": 16, "rows_out": 9, "sitemap_files_discovered": 1,
    }
    import hashlib as _hl

    sm_id = (
        -(2 ** 60)
        - (int(_hl.md5(b"ex.com").hexdigest()[:15], 16) % 2 ** 44)
        * 2 ** 16
    )
    kept4 = {
        r[0]: r[1] for r in con.execute(
            f"SELECT doc_id, url_canon "
            f"FROM '{workdir}/fr_kept4/*.parquet'").fetchall()
    }
    assert kept4[sm_id] == "https://ex.com/sitemap.xml"
    assert 0 not in kept4  # ex.com/a still robots-blocked
    assert sorted(k for k in kept4 if k >= 0) == [4, 5, 6, 7, 8, 9, 10, 11]


def test_spark_submit_ingest_warc_job(workdir, spark):
    """WARC archives -> interleaved corpus -> extraction, one submit:
    raw *.warc files read via binaryFile, records parsed by
    Content-Length, first-capture dedup across archives, media
    resources as media-span docs, then the standard resumable
    extraction on the ingested table."""
    from pyspark.sql import functions as F

    from dompa_spark import warc as warcmod

    docs = spark.createDataFrame(
        [(i, f"body of document {i} with several words here", "srcA")
         for i in range(12)],
        "doc_id long, text string, source string",
    )
    wdir = workdir / "warcs"
    os.makedirs(wdir, exist_ok=True)
    for r in warcmod.docs_to_warc(docs).collect():
        with open(wdir / f"shard{r.warc_id}.warc", "wb") as f:
            f.write(bytes(r.content))
    # duplicate capture: doc 3 fetched again in a later archive
    (dup,) = warcmod.docs_to_warc(
        docs.filter(F.col("doc_id") == 3)
    ).collect()
    with open(wdir / "dupshard.warc", "wb") as f:
        f.write(bytes(dup.content))
    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "ingest_warc.py"),
        os.path.join(str(workdir), "ingest_warc.py"),
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
            str(workdir / "ingest_warc.py"),
            "--input", str(wdir),
            "--output", str(workdir / "wout"),
            "--extract", str(workdir / "wext"),
            "--light-parts", "4", "--heavy-parts", "2",
        ],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    ext = stats.pop("extract")
    # 2 archives: shard0 = warcinfo + 12 responses + 3 image resources
    # (docs 0,5,10), dupshard = warcinfo + 1 response. 15 unique URIs.
    assert stats == {
        "shards": 2, "records": 18, "kept_records": 16,
        "docs": 15, "html_docs": 12, "media_docs": 3,
        "dup_captures": 1, "filtered_records": 2,
    }
    assert ext["docs"] == 15 and ext["parts_total"] == 6
    con = duckdb.connect()
    out = con.execute(
        f"SELECT doc_id, spans FROM '{workdir}/wout/*.parquet'"
    ).fetchall()
    urls = {r[0] for r in out}
    assert "https://srcA.example.org/doc/3" in urls
    assert "https://srcA.example.org/img/5.png" in urls
    # extracted dataset covers every ingested doc, media spans intact
    n = con.execute(
        f"SELECT count(DISTINCT doc_id) FROM "
        f"'{workdir}/wext/data/chunk=*/*.parquet'").fetchone()[0]
    assert n == 15
    # extraction canonicalizes image/audio/video kinds to 'media'
    # (kernel.extract_document_cols), keeping the media_ref
    media = con.execute(
        f"SELECT count(*) FROM (SELECT unnest(spans) AS s FROM "
        f"'{workdir}/wext/data/chunk=*/*.parquet') "
        f"WHERE s.kind = 'media' AND s.media_ref IS NOT NULL"
    ).fetchone()[0]
    assert media == 3


def test_spark_submit_ann_index_build_then_query(workdir, spark):
    """IVF-PQ index lifecycle under real spark-submit: build persists
    the three artifact tables + geometry guard; a SEPARATE query
    submit (no retraining) reproduces exactly the library's fused
    ann_ivfpq_topk answer; mismatched geometry is refused."""
    from dompa_spark import textops

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "build_ann_index.py"),
        os.path.join(str(workdir), "build_ann_index.py"),
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    base = [
        _spark_submit(), "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(workdir / "dompa_spark.zip"),
        str(workdir / "build_ann_index.py"),
        "--index", str(workdir / "annidx"),
    ]
    proc = subprocess.run(
        base + ["--mode", "build", "--input", emb_path, "--dim", "64"],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    bstats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert bstats["vectors"] == 500
    assert bstats["code_rows"] == 500 * textops.PQ_M
    assert bstats["list_max"] >= bstats["list_mean"] > 0

    # queries = the first 10 corpus vectors (the ann-family convention)
    qpath = str(workdir / "queries")
    spark.read.parquet(emb_path).filter("vec_id < 10").write.parquet(qpath)
    proc = subprocess.run(
        base + ["--mode", "query", "--queries", qpath,
                "--output", str(workdir / "topk")],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    qstats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert qstats == {"mode": "query", "queries": 10, "rows": 50}

    # persisted-index answer == the library's fused single-session path
    want = sorted(
        map(tuple, textops.ann_ivfpq_topk(
            spark.read.parquet(emb_path), dim=64
        ).collect())
    )
    got = sorted(
        map(tuple, spark.read.parquet(str(workdir / "topk")).collect())
    )
    assert got == want

    # geometry guard: a query claiming different m must be refused
    proc = subprocess.run(
        base + ["--mode", "query", "--queries", qpath, "--m", "8",
                "--output", str(workdir / "topk2")],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode != 0
    assert "geometry mismatch" in (proc.stderr + proc.stdout)


def test_spark_submit_text_index_build_then_search(workdir, spark):
    """BM25 text-index lifecycle under real spark-submit: build
    persists postings/dictionary/docstats + params guard; a SEPARATE
    search submit (no corpus re-read) reproduces exactly the library's
    bm25_search answer for the same explicit queries; mismatched
    scoring constants are refused."""
    from pyspark.sql import functions as F

    from dompa_spark import textops

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "build_text_index.py"),
        os.path.join(str(workdir), "build_text_index.py"),
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    base = [
        _spark_submit(), "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(workdir / "dompa_spark.zip"),
        str(workdir / "build_text_index.py"),
        "--index", str(workdir / "txtidx"),
    ]
    proc = subprocess.run(
        base + ["--mode", "build", "--input", docs_path],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    bstats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert bstats["mode"] == "build" and bstats["docs"] == 500
    assert bstats["posting_rows"] > 0 and bstats["terms"] > 0

    query_arg = "data stream join,table scan"
    proc = subprocess.run(
        base + ["--mode", "search", "--query", query_arg,
                "--output", str(workdir / "bm25out")],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    sstats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert sstats == {"mode": "search", "queries": 2, "rows": 10}

    # persisted-index answer == the library path over the same tables
    idx = str(workdir / "txtidx")
    qrows = [
        (qid, term)
        for qid, qtext in enumerate(query_arg.split(","))
        for term in qtext.split()
    ]
    qterms = spark.createDataFrame(qrows, "query_id long, term string")
    want = sorted(map(tuple, textops.bm25_search(
        qterms,
        spark.read.parquet(f"{idx}/postings"),
        spark.read.parquet(f"{idx}/dictionary"),
        spark.read.parquet(f"{idx}/docstats"),
    ).collect()))
    got = sorted(
        map(tuple, spark.read.parquet(str(workdir / "bm25out")).collect())
    )
    assert got == want
    # and sane retrieval: every hit actually contains a query term
    hit_ids = [t[2] for t in got]
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(docs_path)
        .filter(F.col("doc_id").isin(hit_ids)).collect()
    }
    terms = {t for _, t in qrows}
    assert all(terms & set(texts[d].split()) for d in hit_ids)

    # params guard: a search claiming different k1 must be refused
    proc = subprocess.run(
        base + ["--mode", "search", "--query", "data", "--k1", "2.0",
                "--output", str(workdir / "bm25out2")],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode != 0
    assert "params mismatch" in (proc.stderr + proc.stdout)


def test_spark_submit_corpus_report(workdir, spark):
    """Telemetry report job under real spark-submit: one submit writes
    all five gauge tables + summary.json, and every table equals the
    library operator's own answer over the same input."""
    from dompa_spark import textops

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "corpus_report.py"),
        os.path.join(str(workdir), "corpus_report.py"),
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    rpt = str(workdir / "report")
    proc = subprocess.run(
        [
            _spark_submit(), "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(workdir / "dompa_spark.zip"),
            str(workdir / "corpus_report.py"),
            "--input", docs_path, "--output", rpt,
        ],
        cwd=str(workdir), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["docs"] == 500
    assert summary["p50_chars"] and summary["p99_chars"] >= summary["p50_chars"]
    # persisted summary == printed summary
    with open(os.path.join(rpt, "summary.json")) as f:
        assert json.load(f) == summary

    docs = spark.read.parquet(docs_path)
    for sub, want_df in [
        ("length_quantiles", textops.length_quantiles(docs)),
        ("mixture", textops.corpus_mixture(docs)),
        ("distinct_sketch", textops.distinct_sketch(docs)),
        ("heavy_hitters", textops.heavy_hitters(docs)),
        ("script_mixture", textops.script_mixture(docs)),
    ]:
        got = sorted(
            map(tuple, spark.read.parquet(f"{rpt}/{sub}").collect())
        )
        want = sorted(map(tuple, want_df.collect()))
        assert got == want, sub


def test_spark_submit_text_index_update_compact(workdir, spark):
    """LSM-style index accumulation: build on half the corpus, APPEND
    the other half as a delta (no main rewrite), and the delta-merged
    search answers EXACTLY as the fused library path over the full
    corpus — the disjoint-partial-counts argument. Overlapping updates
    are refused; compact merges to a fresh index that answers the
    same."""
    from dompa_spark import textops

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    half_a = str(workdir / "docs_a")
    half_b = str(workdir / "docs_b")
    full = spark.read.parquet(docs_path)
    full.filter("doc_id < 250").write.mode("overwrite").parquet(half_a)
    full.filter("doc_id >= 250").write.mode("overwrite").parquet(half_b)

    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "build_text_index.py"),
        os.path.join(str(workdir), "build_text_index.py"),
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def submit(*extra, index):
        return subprocess.run(
            [
                _spark_submit(), "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", str(workdir / "dompa_spark.zip"),
                str(workdir / "build_text_index.py"),
                "--index", index, *extra,
            ],
            cwd=str(workdir), env=env, capture_output=True, text=True,
            timeout=420,
        )

    idx = str(workdir / "txtidx_lsm")
    proc = submit("--mode", "build", "--input", half_a, index=idx)
    assert proc.returncode == 0, proc.stderr[-4000:]

    proc = submit("--mode", "update", "--input", half_b, index=idx)
    assert proc.returncode == 0, proc.stderr[-4000:]
    ustats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert ustats["delta"] == "d0000" and ustats["docs_added"] == 250

    query_arg = "data stream join,table scan"
    proc = submit("--mode", "search", "--query", query_arg,
                  "--output", str(workdir / "lsm_out"), index=idx)
    assert proc.returncode == 0, proc.stderr[-4000:]

    # delta-merged answer == the fused library path over the FULL corpus
    qrows = [
        (qid, term)
        for qid, qtext in enumerate(query_arg.split(","))
        for term in qtext.split()
    ]
    qterms = spark.createDataFrame(qrows, "query_id long, term string")
    p_, d_, s_ = textops.bm25_index(full)
    want = sorted(map(tuple, textops.bm25_search(
        qterms, p_, d_, s_
    ).collect()))
    got = sorted(
        map(tuple, spark.read.parquet(str(workdir / "lsm_out")).collect())
    )
    assert got == want

    # append-only contract: resending half_b must be refused
    proc = submit("--mode", "update", "--input", half_b, index=idx)
    assert proc.returncode != 0
    assert "update refused" in (proc.stderr + proc.stdout)

    # compact to a fresh index; same answer, zero deltas
    idx2 = str(workdir / "txtidx_compacted")
    proc = submit("--mode", "compact", "--out-index", idx2, index=idx)
    assert proc.returncode == 0, proc.stderr[-4000:]
    cstats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert cstats["deltas_merged"] == 1 and cstats["docs"] == 500
    proc = submit("--mode", "search", "--query", query_arg,
                  "--output", str(workdir / "lsm_out2"), index=idx2)
    assert proc.returncode == 0, proc.stderr[-4000:]
    got2 = sorted(
        map(tuple, spark.read.parquet(str(workdir / "lsm_out2")).collect())
    )
    assert got2 == want


def test_spark_submit_text_index_delete_tombstones(workdir, spark):
    """Targeted deletion without rewriting: tombstones + a NEGATED
    dictionary delta make the merged index answer EXACTLY as an index
    built without the deleted docs; compaction applies the removal
    physically; a tombstoned id is refused on re-add until compaction
    clears it (no generation order in the anti-join)."""
    from pyspark.sql import functions as F

    from dompa_spark import textops

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    full = spark.read.parquet(docs_path)
    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "build_text_index.py"),
        os.path.join(str(workdir), "build_text_index.py"),
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def submit(*extra, index):
        return subprocess.run(
            [
                _spark_submit(), "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", str(workdir / "dompa_spark.zip"),
                str(workdir / "build_text_index.py"),
                "--index", index, *extra,
            ],
            cwd=str(workdir), env=env, capture_output=True, text=True,
            timeout=420,
        )

    idx = str(workdir / "txtidx_del")
    proc = submit("--mode", "build", "--input", docs_path, index=idx)
    assert proc.returncode == 0, proc.stderr[-4000:]

    del_path = str(workdir / "del_ids")
    full.filter("doc_id >= 250").select("doc_id").write.mode(
        "overwrite"
    ).parquet(del_path)
    proc = submit("--mode", "delete", "--input", del_path, index=idx)
    assert proc.returncode == 0, proc.stderr[-4000:]
    dstats = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert dstats["docs_deleted"] == 250

    query_arg = "data stream join,table scan"
    proc = submit("--mode", "search", "--query", query_arg,
                  "--output", str(workdir / "del_out"), index=idx)
    assert proc.returncode == 0, proc.stderr[-4000:]

    # tombstoned answer == the fused library path WITHOUT those docs
    kept = full.filter("doc_id < 250")
    qrows = [
        (qid, term)
        for qid, qtext in enumerate(query_arg.split(","))
        for term in qtext.split()
    ]
    qterms = spark.createDataFrame(qrows, "query_id long, term string")
    p_, d_, s_ = textops.bm25_index(kept)
    want = sorted(map(tuple, textops.bm25_search(
        qterms, p_, d_, s_
    ).collect()))
    got = sorted(
        map(tuple, spark.read.parquet(str(workdir / "del_out")).collect())
    )
    assert got == want
    assert all(t[2] < 250 for t in got)  # no deleted doc surfaces

    # compact applies the deletion physically and answers the same
    idx2 = str(workdir / "txtidx_del_compacted")
    proc = submit("--mode", "compact", "--out-index", idx2, index=idx)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert spark.read.parquet(f"{idx2}/postings").filter(
        F.col("doc_id") >= 250
    ).count() == 0
    proc = submit("--mode", "search", "--query", query_arg,
                  "--output", str(workdir / "del_out2"), index=idx2)
    assert proc.returncode == 0, proc.stderr[-4000:]
    got2 = sorted(
        map(tuple, spark.read.parquet(str(workdir / "del_out2")).collect())
    )
    assert got2 == want

    # re-adding a TOMBSTONED id into the delta index must be refused
    # (the search anti-join has no generation order — the new doc
    # would be silently invisible); after compaction the tombstone is
    # gone and the re-add succeeds
    readd = str(workdir / "readd")
    full.filter("doc_id = 400").write.mode("overwrite").parquet(readd)
    proc = submit("--mode", "update", "--input", readd, index=idx)
    assert proc.returncode != 0
    assert "tombstoned" in (proc.stderr + proc.stdout)
    proc = submit("--mode", "update", "--input", readd, index=idx2)
    assert proc.returncode == 0, proc.stderr[-4000:]
    proc = submit("--mode", "search", "--query", query_arg,
                  "--output", str(workdir / "del_out3"), index=idx2)
    assert proc.returncode == 0, proc.stderr[-4000:]
    p2, d2, s2 = textops.bm25_index(
        full.filter("doc_id < 250 OR doc_id = 400")
    )
    want3 = sorted(map(tuple, textops.bm25_search(
        qterms, p2, d2, s2
    ).collect()))
    got3 = sorted(
        map(tuple, spark.read.parquet(str(workdir / "del_out3")).collect())
    )
    assert got3 == want3  # re-added doc fully live again


def test_spark_submit_media_pipeline(workdir, spark):
    """The media-family job under REAL spark-submit --py-files: one
    submit over a mixed media table -> decode stats for all three
    kinds, frame sampling (real Y4M clock + stub), exact dedup, and
    the three perceptual near-dup families."""
    from pyspark.sql import functions as F  # noqa: F401

    from dompa_spark import media, pngcodec

    docs12 = spark.createDataFrame([(i,) for i in range(12)],
                                   "doc_id long")
    vids = media.docs_to_y4m_variants(docs12)
    docs8 = spark.createDataFrame([(i,) for i in range(8)],
                                  "doc_id long")
    auds = media.docs_to_wav_variants(docs8)
    w, h = 16, 12
    px = bytes((j * 7) % 200 for j in range(w * h))
    px2 = bytes(p + 1 for p in px)  # brightness pair: same dHash
    rows = [
        ("png://a", "image", bytearray(pngcodec.encode_png(px, w, h)),
         "image/png", None, None, None),
        ("png://a2", "image", bytearray(pngcodec.encode_png(px, w, h)),
         "image/png", None, None, None),  # byte-exact dup of png://a
        ("png://b", "image", bytearray(pngcodec.encode_png(px2, w, h)),
         "image/png", None, None, None),
        ("img://junk", "image", bytearray(b"junk-img"), "image/png",
         None, None, None),
        ("aud://junk", "audio", bytearray(b"junk-aud"), "audio/wav",
         None, None, None),
        ("vid://opaque", "video", bytearray(b"mp4garbage"), "video/mp4",
         None, None, 1200),
    ]
    extra = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    in_path = str(workdir / "media_tbl")
    vids.unionByName(auds).unionByName(extra).write.mode(
        "overwrite").parquet(in_path)

    shutil.copy(
        os.path.join(REPO, "dompa_spark", "jobs", "media_pipeline.py"),
        os.path.join(str(workdir), "media_pipeline.py"),
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
            str(workdir / "media_pipeline.py"),
            "--input", in_path,
            "--output", str(workdir / "media_out"),
            "--parts", "4",
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
    assert stats["media"] == {"image": 4, "audio": 9, "video": 13}
    # junk rows drop from the decode stats (strict=False), never crash
    assert stats["decoded_images"] == 3
    assert stats["decoded_audio"] == 8
    assert stats["decoded_videos"] == 12
    # frames: Y4M docs clock off the stream (nf frames at F4:1 ->
    # nf*250 ms), the opaque mp4 off its table duration_ms
    want_frames = 2  # vid://opaque: max(1, 1200 // 500)
    for doc in range(12):
        src = doc - (1 if doc % 6 == 5 else 0)
        nf = 2 + src % 4
        want_frames += max(1, nf * 250 // 500)
    assert stats["frames"] == want_frames
    assert stats["exact_dups"] == 1  # png://a2 repeats png://a's bytes
    # identical/brightness-shifted dHashes pair all three PNGs; the
    # engineered audio (5,6) and video (4,5),(10,11) re-renders pair
    assert stats["near_dups"]["image"] == 3
    pairs = {
        (r.family, r.media_ref_a, r.media_ref_b, r.hamming)
        for r in spark.read.parquet(
            str(workdir / "media_out" / "near_dups")).collect()
    }
    assert ("audio", "wav://doc/5", "wav://doc/6", 0) in pairs
    assert ("video", "y4m://doc/4", "y4m://doc/5", 0) in pairs
    assert ("video", "y4m://doc/10", "y4m://doc/11", 0) in pairs
    assert ("image", "png://a", "png://a2", 0) in pairs
    assert ("image", "png://a", "png://b", 0) in pairs
    # summary.json persisted next to the tables and matches stdout
    with open(str(workdir / "media_out" / "summary.json")) as f:
        assert json.load(f) == stats
