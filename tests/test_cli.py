"""End-to-end CLI test: ingest (replay) -> silver -> gold, in-process.

python -m jobhouse_spark is the reference's src/main.py equivalent; the
test drives main() directly so the already-running test SparkSession is
reused instead of paying a JVM spawn per subcommand.
"""

from __future__ import annotations

import os

from jobhouse_spark.__main__ import main


def test_cli_ingest_silver_gold_roundtrip(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")

    assert main([
        "ingest", "--search", "python data engineer", "--out", bronze,
        "--at", "2024-03-05T14:30:45",
    ]) == 0
    # hive-partitioned bronze lake exists with source partition dirs
    assert any(d.startswith("source=") for d in os.listdir(bronze))

    assert main(["silver", "--bronze", bronze, "--out", silver]) == 0
    sdf = spark.read.parquet(silver)
    assert sdf.count() > 0
    assert "salary_mid" in sdf.columns

    assert main(["gold", "--silver", silver, "--out", gold]) == 0
    gdf = spark.read.parquet(gold)
    assert gdf.count() > 0
    assert {"n_postings", "avg_salary_mid"} <= set(gdf.columns)


def test_cli_flat_layout_writes_reference_key(spark, tmp_path):
    """layout=flat must produce the reference's exact key scheme:
    {source}/{yyyy}/{MM}/{dd}/{HH}/{batch_id}.jsonl.gz"""
    out = str(tmp_path / "flat")
    assert main([
        "ingest", "--search", "python data engineer", "--out", out,
        "--at", "2024-03-05T14:30:45", "--layout", "flat",
    ]) == 0
    expect = os.path.join(
        out, "HH", "2024", "03", "05", "14",
        "python data engineer_20240305_143045.jsonl.gz",
    )
    assert os.path.exists(expect), os.listdir(out)
