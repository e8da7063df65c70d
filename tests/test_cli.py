"""CLI parity surface (helium_etl_lite_spark/cli.py): the reference's
`migrate`/`start` commands + settings.toml config (src/main.rs:19-23).
cmd_* functions are driven with the shared test session; `main()` owns
its own session lifecycle so it is exercised only for config errors."""

from __future__ import annotations

import json
import os

import pytest

from helium_etl_lite_spark import cli
from helium_etl_lite_spark.etl import fixtures


@pytest.fixture(scope="module")
def chain_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_chain")
    blocks, txns = fixtures.make_chain(spark, first_block=1000, n_blocks=60)
    bp, tp = str(root / "blocks"), str(root / "txns")
    blocks.write.mode("overwrite").parquet(bp)
    txns.write.mode("overwrite").parquet(tp)
    return bp, tp, str(root)


def write_config(path, bp, tp, out_dir, **extra):
    lines = [
        f'blocks_path = "{bp}"',
        f'txns_path = "{tp}"',
        f'out_dir = "{out_dir}"',
    ]
    for k, v in extra.items():
        if isinstance(v, bool):
            lines.append(f"{k} = {'true' if v else 'false'}")
        elif isinstance(v, (int, float)):
            lines.append(f"{k} = {v}")
        else:
            lines.append(f'{k} = "{v}"')
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_migrate_writes_schema_manifest(spark, chain_dirs, tmp_path):
    bp, tp, _ = chain_dirs
    out = str(tmp_path / "out")
    cfg = cli.load_config(write_config(tmp_path / "s.toml", bp, tp, out, mode="rewards"))
    cli.cmd_migrate(spark, cfg)
    manifest = json.load(open(os.path.join(out, "_schema_manifest.json")))
    assert "rewards" in manifest and "block" in manifest["rewards"]
    assert manifest["partitioning"].startswith("block_range")


def test_once_catches_up_and_is_idempotent(spark, chain_dirs, tmp_path):
    bp, tp, _ = chain_dirs
    out = str(tmp_path / "out")
    cfg = cli.load_config(
        write_config(tmp_path / "s.toml", bp, tp, out, mode="full", backfill=True)
    )
    assert cli.cmd_once(spark, cfg) == 60
    assert cli.cmd_once(spark, cfg) == 0  # already at tip
    rewards = spark.read.parquet(os.path.join(out, "rewards"))
    assert rewards.count() > 0


def test_config_validation_errors(tmp_path, chain_dirs):
    bp, tp, _ = chain_dirs
    bad = tmp_path / "bad.toml"
    bad.write_text('blocks_path = "x"\n')  # missing txns_path/out_dir
    with pytest.raises(SystemExit, match="missing required key"):
        cli.load_config(str(bad))
    bad2 = write_config(tmp_path / "bad2.toml", bp, tp, "/tmp/x", mode="nope")
    with pytest.raises(SystemExit, match="invalid mode"):
        cli.load_config(bad2)


def test_log_dir_writes_file(spark, chain_dirs, tmp_path):
    bp, tp, _ = chain_dirs
    out = str(tmp_path / "out")
    log_dir = str(tmp_path / "logs")
    cfg = cli.load_config(write_config(tmp_path / "s.toml", bp, tp, out, mode="rewards"))
    cfg["log"] = {"log_dir": log_dir}  # [log] table analog
    cli.cmd_migrate(spark, cfg)
    log_file = os.path.join(log_dir, "helium_etl_lite_spark.log")
    assert os.path.exists(log_file)
    assert "migrate: layout ready" in open(log_file).read()


def test_sql_command_over_serving_views(spark, chain_dirs, tmp_path, capsys):
    bp, tp, _ = chain_dirs
    out = str(tmp_path / "out")
    cfg = cli.load_config(
        write_config(tmp_path / "s.toml", bp, tp, out, mode="full", backfill=True)
    )
    cli.cmd_once(spark, cfg)
    n = cli.cmd_sql(
        spark, cfg,
        "SELECT gateway, SUM(amount) AS earned FROM rewards "
        "WHERE gateway <> '1Wh4bh' GROUP BY gateway ORDER BY earned DESC LIMIT 5",
    )
    assert n == 5
    printed = capsys.readouterr().out
    assert printed.splitlines()[0] == "gateway\tearned"
    assert len(printed.splitlines()) == 6


def test_atomic_once_and_vacuum(spark, chain_dirs, tmp_path):
    # once with atomic=true lands through the snapshot sink; a forced
    # re-commit supersedes v2 and `vacuum --keep-versions 1` reclaims it.
    from helium_etl_lite_spark.etl.snapshot import SnapshotStore, read_snapshot

    bp, tp, _ = chain_dirs
    out = str(tmp_path / "out")
    cfg_path = write_config(
        tmp_path / "s.toml", bp, tp, out, mode="rewards", backfill=True,
        atomic=True, block_range_size=20,
    )
    cfg = cli.load_config(cfg_path)
    cli.cmd_once(spark, cfg)
    store = SnapshotStore(out)
    m = store.current()
    assert m is not None and m["height"] == 1059
    rows_before = read_snapshot(spark, out, "rewards").count()
    # replay the whole span: same data, new version owning every range
    from helium_etl_lite_spark.etl.pipeline import FollowerConfig, IncrementalFollower

    f = cli._follower(spark, cfg)
    f._commit_range_atomic(1000, 1059, m["first_block"])
    assert store.current()["version"] == m["version"] + 1
    removed = cli.cmd_vacuum({"out_dir": out}, keep_versions=1)
    assert any("v=" in p for p in removed)
    assert read_snapshot(spark, out, "rewards").count() == rows_before
