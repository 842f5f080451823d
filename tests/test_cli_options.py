"""CLI option precedence (r03 advisory): an explicitly passed flag
beats the config value, which beats the default — plus the argparse
wiring that makes "not given" distinguishable (default=None)."""

from __future__ import annotations

from fscrawler_spark.cli import _flag_over_config, main


def test_flag_beats_config_beats_default():
    cfg = {"frontier_checkpoint": "full"}
    # flag given -> flag wins over config
    assert _flag_over_config(cfg, "frontier_checkpoint", "delta", "delta") == "delta"
    # flag not given -> config wins over default
    assert _flag_over_config(cfg, "frontier_checkpoint", None, "delta") == "full"
    # neither -> default
    assert _flag_over_config({}, "frontier_checkpoint", None, "delta") == "delta"


def test_frontier_flag_default_is_none_marker(monkeypatch):
    """--frontier must default to None so cmd_crawl can tell 'not
    given' from an explicit choice (the precedence above relies on it)."""
    captured = {}

    def fake_cmd_crawl(args):
        captured["frontier"] = args.frontier

    monkeypatch.setattr("fscrawler_spark.cli.cmd_crawl", fake_cmd_crawl)
    base = ["crawl", "--pages", "p.parquet", "--checkpoint", "/tmp/ck"]
    main(base)
    assert captured["frontier"] is None
    main(base + ["--frontier", "full"])
    assert captured["frontier"] == "full"


def test_budget_waves_bloom_flags_are_none_markers(monkeypatch):
    """--budget/--waves/--bloom must also default to None (r03 advisory
    applied to every flag with a config twin): explicit flags win over
    config, and --no-bloom is distinguishable from 'not given'."""
    captured = {}
    monkeypatch.setattr(
        "fscrawler_spark.cli.cmd_crawl", lambda a: captured.update(vars(a))
    )
    base = ["crawl", "--pages", "p.parquet", "--checkpoint", "/tmp/ck"]
    main(base)
    assert captured["budget"] is None
    assert captured["waves"] is None
    assert captured["bloom"] is None
    main(base + ["--waves", "3", "--budget", "2", "--bloom"])
    assert (captured["waves"], captured["budget"], captured["bloom"]) == (3, 2, True)
    main(base + ["--no-bloom"])
    assert captured["bloom"] is False
    # an explicit False flag must beat a True config value
    assert _flag_over_config({"use_bloom": True}, "use_bloom", False, False) is False
    # and config still beats the default when no flag is given
    assert _flag_over_config({"max_waves": 7}, "max_waves", None, 50) == 7


def test_media_subcommand_end_to_end(spark, tmp_path, capsys, monkeypatch):
    """`media --op info/thumbnails` runs the real codecs over a media
    parquet: a JPEG, a GIF and a corrupt blob in one table."""
    import numpy as np

    from fscrawler_spark.functions import multimodal as MM
    from fscrawler_spark.functions.gif import encode_gif
    from fscrawler_spark.functions.jpeg import encode_jpeg
    from fscrawler_spark import session as S

    monkeypatch.setattr(S, "get_spark", lambda *a, **k: spark)
    import fscrawler_spark.cli as cli
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)

    rng = np.random.Generator(np.random.PCG64(77))
    jpg = encode_jpeg(rng.integers(0, 256, (8, 12, 3), dtype=np.uint8),
                      quality=100)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    gif = encode_gif(pal[rng.integers(0, 16, (6, 10))])
    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(
        [(1, "u1", "image", jpg, {}), (2, "u2", "image", gif, {}),
         (3, "u3", "image", jpg[:10], {})],
        MM.MEDIA_SCHEMA,
    ).write.parquet(src)

    out = str(tmp_path / "info.parquet")
    main(["media", "--input", src, "--op", "info", "--out", out])
    rows = {r["media_id"]: r for r in spark.read.parquet(out).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (12, 8)
    assert (rows[2]["width"], rows[2]["height"]) == (10, 6)
    assert rows[3]["width"] is None  # corrupt blob contained

    tout = str(tmp_path / "thumbs.parquet")
    main(["media", "--input", src, "--op", "thumbnails",
          "--max-px", "4", "--thumb-codec", "jpeg", "--out", tout])
    thumbs = spark.read.parquet(tout).collect()
    assert {r["media_id"] for r in thumbs} == {1, 2}
    assert all(bytes(r["thumb"])[:3] == b"\xff\xd8\xff" for r in thumbs)
    capsys.readouterr()  # drain the JSON summaries


def test_media_meta_subcommand(spark, tmp_path, capsys, monkeypatch):
    """`media --op meta` catalogs compressed containers (MP3/MP4/Ogg)
    the engine never entropy-decodes."""
    from fscrawler_spark.functions import mediameta as MD
    from fscrawler_spark.functions import multimodal as MM
    import fscrawler_spark.cli as cli

    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)

    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(
        [(1, "u1", "audio", MD.synth_mp3(20, 128, 44100, 2), {}),
         (2, "u2", "video",
          MD.synth_mp4(6.5, 1000, 640, 480, sps=MD.encode_sps(640, 480)),
          {}),
         (3, "u3", "audio", MD.synth_ogg("opus", 48000 * 2), {}),
         (4, "u4", "audio", b"\x00garbage\x00" * 4, {})],
        MM.MEDIA_SCHEMA,
    ).write.parquet(src)

    out = str(tmp_path / "meta.parquet")
    main(["media", "--input", src, "--op", "meta", "--out", out])
    rows = {r["media_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["container"] == "mp3"
    assert rows[1]["duration_sec"] == 20 * 1152 / 44100
    assert rows[2]["codec"] == "avc1/h264"
    assert (rows[2]["width"], rows[2]["height"]) == (640, 480)
    assert rows[3]["codec"] == "opus" and rows[3]["duration_sec"] == 2.0
    assert rows[4]["container"] is None  # contained
    capsys.readouterr()


def test_cli_text_ops(tmp_path):
    """`text` subcommand drives winnow/classify/prep end-to-end from a
    fresh process (the spark-submit surface)."""
    import json as _json
    import subprocess
    import sys

    import duckdb

    for op, min_rows in [("classify", 400), ("prep", 1)]:
        out = tmp_path / f"text_{op}"
        r = subprocess.run(
            [sys.executable, "-m", "fscrawler_spark.cli", "--cores", "4",
             "text", "--input", "/root/testdata/sf0.001/documents.parquet",
             "--op", op, "--out", str(out)],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = _json.loads(r.stdout.strip().splitlines()[-1])
        assert payload["rows"] >= min_rows, (op, payload)
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{out}/*.parquet')"
        ).fetchone()[0]
        assert n == payload["rows"]


def test_cli_profile_ops(tmp_path):
    """`profile` subcommand drives hll/cms/quantiles end-to-end from a
    fresh process, and `text --op lmscore` rides the same surface."""
    import json as _json
    import subprocess
    import sys

    import duckdb

    for op, extra, min_rows in [
        ("hll", [], 1),
        ("cms", [], 30),  # sf0.001 has 15 distinct users -> <= 60 cells
        ("quantiles", ["--lo", "0.0", "--hi", "1000.0", "--bins", "100"], 1),
    ]:
        out = tmp_path / f"profile_{op}"
        r = subprocess.run(
            [sys.executable, "-m", "fscrawler_spark.cli", "--cores", "4",
             "profile", "--input", "/root/testdata/sf0.001/events.parquet",
             "--op", op, "--out", str(out), *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = _json.loads(r.stdout.strip().splitlines()[-1])
        assert payload["rows"] >= min_rows, (op, payload)
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{out}/*.parquet')"
        ).fetchone()[0]
        assert n == payload["rows"]

    out = tmp_path / "text_lmscore"
    r = subprocess.run(
        [sys.executable, "-m", "fscrawler_spark.cli", "--cores", "4",
         "text", "--input", "/root/testdata/sf0.001/documents.parquet",
         "--op", "lmscore", "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = _json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["rows"] >= 40, payload


def test_cli_session8_ops(tmp_path):
    """`text --op pack/mixture/funnel`, `dedup --method containment`,
    and the new `frontier` subcommand, each end-to-end from a fresh
    process (the spark-submit surface)."""
    import json as _json
    import subprocess
    import sys

    import duckdb

    docs = "/root/testdata/sf0.001/documents.parquet"

    def run(argv):
        r = subprocess.run(
            [sys.executable, "-m", "fscrawler_spark.cli", "--cores", "4", *argv],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    out = tmp_path / "pack"
    p = run(["text", "--input", docs, "--op", "pack", "--cap", "64",
             "--out", str(out)])
    assert p["rows"] >= 16  # at least one sequence per bucket
    # every packed sequence holds >= 1 doc and the doc total re-adds
    tot = duckdb.sql(
        f"SELECT sum(n_docs), min(n_docs) FROM read_parquet('{out}/*.parquet')"
    ).fetchone()
    assert tot[0] == 500 and tot[1] >= 1

    p = run(["text", "--input", docs, "--op", "mixture",
             "--targets", "en=4000,de=1500,es=1500,fr=1500,zh=1500",
             "--out", str(tmp_path / "mix")])
    assert p["rows"] == 5

    p = run(["text", "--input", docs, "--op", "funnel",
             "--out", str(tmp_path / "funnel")])
    assert p["rows"] == 3

    p = run(["text", "--input", docs, "--op", "segdedup",
             "--out", str(tmp_path / "segd")])
    assert p["rows"] == 500  # report total over documents

    p = run(["text", "--input", docs, "--op", "chunks", "--cap", "16",
             "--stride", "12", "--out", str(tmp_path / "chunks")])
    assert p["rows"] >= 500

    p = run(["dedup", "--input", docs, "--method", "containment",
             "--threshold", "0.8", "--max-df", "100",
             "--out", str(tmp_path / "contain")])
    assert p["pairs"] >= 0 and p["dropped"] <= p["pairs"]

    p = run(["frontier", "--input", docs, "--op", "waterfill",
             "--group-col", "source", "--budget", "100",
             "--out", str(tmp_path / "wf")])
    assert p["rows"] == 20
    alloc = duckdb.sql(
        f"SELECT sum(alloc) FROM read_parquet('{tmp_path / 'wf'}/*.parquet')"
    ).fetchone()[0]
    assert alloc <= 100


def test_cli_process_subcommand(spark, tmp_path):
    """`process` drives the staged index pipeline end-to-end from a
    fresh process; every page lands INDEXED (or tagged ERROR, never
    dropped)."""
    import json as _json
    import subprocess
    import sys

    from fscrawler_spark import schemas
    from fscrawler_spark.datagen import generate_pages

    pages, _, _ = generate_pages("tiny", seed=42)
    rows = [tuple(r.get(f.name) for f in schemas.PAGES.fields) for r in pages]
    inp = str(tmp_path / "pages")
    spark.createDataFrame(rows, schemas.PAGES).write.parquet(inp)
    r = subprocess.run(
        [sys.executable, "-m", "fscrawler_spark.cli", "--cores", "4",
         "process", "--input", inp, "--out", str(tmp_path / "staged")],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = _json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["rows"] == len(pages)
    assert set(payload["stages"]) <= {"INDEXED", "ERROR"}
    assert payload["stages"].get("INDEXED", 0) >= len(pages) - 10
