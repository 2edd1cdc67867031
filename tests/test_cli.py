"""CLI smoke: the management-command surface runs end-to-end in a fresh
process (owns its own Ray session) and resumes from checkpoints."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "cerberus_ray", "--num-cpus", "2", *args],
        env=env, capture_output=True, text=True, timeout=240, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_validate_and_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    r1 = run_cli("validate", "--docs", "gen:600", "--checkpoint-dir", ckpt,
                 "--fragment-size", "200")
    assert r1["n_docs"] == 600
    assert len(r1["processed_fragments"]) == 3
    r2 = run_cli("validate", "--docs", "gen:600", "--checkpoint-dir", ckpt,
                 "--fragment-size", "200", "--run-id", "run-1")
    assert r2["processed_fragments"] == []
    assert r2["n_violations"] == r1["n_violations"]


def test_cli_outbox(tmp_path):
    out = str(tmp_path / "outbox")
    r = run_cli("outbox", "--fixtures", "--out", out)
    assert r["n_messages"] >= 1 and r["n_files"] >= 1
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows == r["n_messages"]
    assert b"Subject: Invoice INV-" in t["rfc822"][0].as_py()


def test_cli_datasheet(tmp_path):
    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "sheet.parquet")
    r = run_cli("datasheet", "--input", src, "--group", "source,lang",
                "--out", out)
    rows = r["rows"]
    assert rows and all("n_docs" in x and "dup_frac" in x for x in rows)
    assert sum(x["n_docs"] for x in rows) == 500
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows == len(rows)
