"""CLI parity surface (helium_etl_lite_spark/cli.py): the reference's
`migrate`/`start` commands + settings.toml config (src/main.rs:19-23).
cmd_* functions are driven with the shared test session; `main()` owns
its own session lifecycle so it is exercised only for config errors."""

from __future__ import annotations

import pytest

# r15 heavy lane: CLI integration (126 s) on the r15 sandbox — runs with
# SPARK_GRAFT_TEST_LANE=full (or -m heavy); see tests/conftest.py.
pytestmark = pytest.mark.heavy

import json
import os


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


def _part_files(tdir):
    out = {}
    for d in sorted(os.listdir(tdir)):
        if d.startswith("block_range="):
            out[d] = sum(
                1
                for f in os.listdir(os.path.join(tdir, d))
                if f.endswith(".parquet")
            )
    return out


def _fragment(pdir, n_splits=3):
    # Content-preserving fragmentation (the small-file state a bulk
    # import or per-block appender leaves behind): split the partition's
    # file into row slices. The follower's own sink writes one file per
    # partition, so tests fabricate the fragmentation to compact.
    import pyarrow.parquet as pq

    f = next(x for x in sorted(os.listdir(pdir)) if x.endswith(".parquet"))
    t = pq.read_table(os.path.join(pdir, f))
    step = max(1, t.num_rows // n_splits)
    k = 0
    for i in range(0, t.num_rows, step):
        pq.write_table(
            t.slice(i, step), os.path.join(pdir, f"part-frag{k}.parquet")
        )
        k += 1
    os.remove(os.path.join(pdir, f))


def test_compact_plain_layout(spark, chain_dirs, tmp_path):
    # `compact` must merge small files per partition, preserving
    # content exactly and leaving already-compact partitions alone.
    bp, tp, _ = chain_dirs
    out = str(tmp_path / "out")
    cfg = cli.load_config(
        write_config(
            tmp_path / "s.toml", bp, tp, out, mode="rewards", backfill=True,
            block_range_size=20,
        )
    )
    cli.cmd_once(spark, cfg)
    tdir = os.path.join(out, "rewards")
    frag = next(iter(_part_files(tdir)))
    _fragment(os.path.join(tdir, frag))
    before_files = _part_files(tdir)
    assert before_files[frag] > 1, before_files
    before_rows = sorted(
        map(tuple, spark.read.parquet(tdir).drop("block_range").collect())
    )

    results = cli.cmd_compact(spark, {"out_dir": out}, target_mb=128)
    after_files = _part_files(tdir)
    assert all(n == 1 for n in after_files.values()), after_files
    assert set(results["rewards"]) == {
        p for p, n in before_files.items() if n > 1
    }
    after_rows = sorted(
        map(tuple, spark.read.parquet(tdir).drop("block_range").collect())
    )
    assert after_rows == before_rows
    # idempotent: second run finds nothing to do
    assert cli.cmd_compact(spark, {"out_dir": out}, target_mb=128) == {}


def test_compact_snapshot_sink(spark, chain_dirs, tmp_path):
    # atomic mode: compaction publishes a NEW snapshot version mapping
    # the fragmented partitions to compacted files; committed reads are
    # unchanged, old version dirs survive for older-snapshot readers
    # until vacuum, and uncommitted (orphan) directories are untouched.
    from helium_etl_lite_spark.etl.snapshot import SnapshotStore, read_snapshot

    bp, tp, _ = chain_dirs
    out = str(tmp_path / "out")
    cfg = cli.load_config(
        write_config(
            tmp_path / "s.toml", bp, tp, out, mode="rewards", backfill=True,
            atomic=True, block_range_size=20,
        )
    )
    cli.cmd_once(spark, cfg)
    store = SnapshotStore(out)
    m1 = store.current()
    # fragment every committed partition (bulk-import debris) so the
    # compaction version supersedes v1 entirely and vacuum can reclaim
    for frag_range, frag_ver in m1["tables"]["rewards"].items():
        _fragment(
            os.path.join(
                out, "rewards", f"v={frag_ver}", f"block_range={frag_range}"
            )
        )
    rows_before = sorted(
        map(tuple, read_snapshot(spark, out, "rewards").collect())
    )
    # an uncommitted orphan partition (crashed writer) must survive
    # untouched and stay out of the compacted corpus
    orphan = os.path.join(out, "rewards", "v=1", "block_range=9999")
    os.makedirs(orphan)
    open(os.path.join(orphan, "junk.parquet"), "w").write("not parquet")

    got = cli.cmd_compact(spark, {"out_dir": out, "atomic": True}, target_mb=128)
    assert got and got["version"] == m1["version"] + 1
    m2 = store.current()
    assert m2["version"] == m1["version"] + 1
    assert m2["height"] == m1["height"]  # cursor untouched
    assert "9999" not in m2["tables"]["rewards"]
    assert os.path.exists(os.path.join(orphan, "junk.parquet"))
    # committed read identical; compacted partitions now one file each
    rows_after = sorted(
        map(tuple, read_snapshot(spark, out, "rewards").collect())
    )
    assert rows_after == rows_before
    vdir = os.path.join(out, "rewards", f"v={m2['version']}")
    assert _part_files(vdir) and all(
        n == 1 for n in _part_files(vdir).values()
    )
    # old version dirs still present until vacuum reclaims them
    assert os.path.isdir(os.path.join(out, "rewards", f"v={m1['version']}"))
    removed = cli.cmd_vacuum({"out_dir": out}, keep_versions=1)
    assert any(f"v={m1['version']}" in p for p in removed)
    assert sorted(
        map(tuple, read_snapshot(spark, out, "rewards").collect())
    ) == rows_before
    # nothing left to compact
    assert cli.cmd_compact(spark, {"out_dir": out, "atomic": True}, target_mb=128) == {}


def test_compact_crash_recovery(spark, chain_dirs, tmp_path):
    # plain-mode swap interrupted between the two renames: data sits in
    # .__compact_old and the partition dir is missing. The next run
    # must restore it before compacting.
    bp, tp, _ = chain_dirs
    out = str(tmp_path / "out")
    cfg = cli.load_config(
        write_config(
            tmp_path / "s.toml", bp, tp, out, mode="rewards", backfill=True,
            block_range_size=20, max_blocks_per_batch=7,
        )
    )
    cli.cmd_once(spark, cfg)
    tdir = os.path.join(out, "rewards")
    rows = spark.read.parquet(tdir).count()
    part = next(iter(_part_files(tdir)))
    pdir = os.path.join(tdir, part)
    os.rename(pdir, pdir + ".__compact_old")  # simulate the crash window
    cli.cmd_compact(spark, {"out_dir": out}, target_mb=128)
    assert os.path.isdir(pdir)
    assert not os.path.isdir(pdir + ".__compact_old")
    assert spark.read.parquet(tdir).count() == rows


def test_sql_at_version_time_travels_atomic_sink(spark, chain_dirs, tmp_path, capsys):
    # --at-version on an atomic sink serves the historical snapshot; v1
    # keeps its row count after a superseding commit, and a vacuumed
    # version errors clearly.
    import pytest as _pytest

    from helium_etl_lite_spark.etl.snapshot import SnapshotStore

    bp, tp, _ = chain_dirs
    out = str(tmp_path / "out")
    cfg_path = write_config(
        tmp_path / "s.toml", bp, tp, out, mode="rewards", backfill=True,
        atomic=True, block_range_size=20,
    )
    cfg = cli.load_config(cfg_path)
    cli.cmd_once(spark, cfg)
    v1 = SnapshotStore(out).current()["version"]
    n_v1 = cli.cmd_sql(spark, cfg, "SELECT COUNT(*) AS n FROM rewards")
    f = cli._follower(spark, cfg)
    f._commit_range_atomic(1000, 1059, SnapshotStore(out).current()["first_block"])
    capsys.readouterr()
    n_tt = cli.cmd_sql(
        spark, cfg, "SELECT block, gateway FROM rewards ORDER BY block", at_version=v1
    )
    assert n_tt > 0
    cli.cmd_vacuum({"out_dir": out}, keep_versions=1)
    with _pytest.raises(ValueError, match="no snapshot version"):
        cli.cmd_sql(spark, cfg, "SELECT 1", at_version=v1)


def test_sql_changes_since_registers_cdc_views(spark, tmp_path, capsys):
    # --changes-since N registers <table>_changes views: the CDC feed
    # between snapshot N and the served version, with _change_type.
    import logging

    import pyspark.sql.functions as F

    from helium_etl_lite_spark.etl.snapshot import commit_batch_atomic

    out = str(tmp_path / "out")
    b1 = spark.range(0, 50).select(
        F.col("id").alias("block"), (F.col("id") * 1.0).alias("amount")
    )
    commit_batch_atomic(
        spark, out, {"rewards": b1}, 0, 49, 49, 0, heights=b1.select("block")
    )
    # v2: replace block 7 (new amount), drop block 9
    claimed = spark.createDataFrame([(7,), (9,)], "block long")
    b2 = spark.createDataFrame([(7, -7.0)], "block long, amount double")
    commit_batch_atomic(spark, out, {"rewards": b2}, 0, 49, 49, 0, heights=claimed)

    n = cli.cmd_sql(
        spark,
        {"out_dir": out},
        "SELECT block, _change_type FROM rewards_changes "
        "ORDER BY block, _change_type",
        log=logging.getLogger("test"),
        changes_since=1,
    )
    assert n == 3  # delete(7) + insert(7) + delete(9)
    printed = capsys.readouterr().out
    assert "insert" in printed and "delete" in printed

    # --key-cols upgrades the view to the KEYED feed: block 7's change
    # pairs as update_preimage/update_postimage, block 9 stays a delete
    n = cli.cmd_sql(
        spark,
        {"out_dir": out},
        "SELECT block, _change_type FROM rewards_changes "
        "ORDER BY block, _change_type",
        log=logging.getLogger("test"),
        changes_since=1,
        change_key_cols=["block"],
    )
    assert n == 3
    printed = capsys.readouterr().out
    assert "update_preimage" in printed and "update_postimage" in printed
    assert printed.count("delete") == 1
    assert "insert" not in printed.replace("update_postimage", "")

    # a key column the table lacks: falls back to the plain feed
    n = cli.cmd_sql(
        spark,
        {"out_dir": out},
        "SELECT _change_type FROM rewards_changes ORDER BY 1",
        log=logging.getLogger("test"),
        changes_since=1,
        change_key_cols=["no_such_col"],
    )
    assert n == 3
    printed = capsys.readouterr().out
    assert "update_preimage" not in printed

    # plain (non-atomic) sink: clear error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="atomic sink"):
        cli.cmd_sql(
            spark, {"out_dir": str(tmp_path / "nosnap")}, "SELECT 1",
            log=logging.getLogger("test"), changes_since=1,
        )


def test_status_reports_both_sink_modes(spark, chain_dirs, tmp_path, capsys):
    # `status` works WITHOUT a SparkSession: plain sinks read the
    # cursor via pyarrow + walk partition dirs; atomic sinks read
    # everything from the manifest.
    import logging

    bp, tp, _ = chain_dirs
    for atomic in (False, True):
        out = str(tmp_path / ("a" if atomic else "p"))
        cfg = cli.load_config(
            write_config(
                tmp_path / f"s{atomic}.toml", bp, tp, out, mode="rewards",
                backfill=True, atomic=atomic, block_range_size=20,
            )
        )
        cli.cmd_once(spark, cfg)
        capsys.readouterr()
        st = cli.cmd_status({"out_dir": out}, log=logging.getLogger("t"))
        assert st["sink"] == ("atomic" if atomic else "plain")
        assert st["height"] == 1059 and st["first_block"] == 1000
        assert st["tables"]["rewards"]["n_files"] >= 1
        assert st["tables"]["rewards"]["n_bytes"] > 0
        if atomic:
            assert st["snapshot_version"] >= 1
        printed = capsys.readouterr().out
        assert '"height": 1059' in printed

def test_status_falls_back_to_old_cursor_dir(spark, chain_dirs, tmp_path, capsys):
    # Mid-swap crash window: CursorStore.write renames the live cursor
    # to follower_info.old before promoting the new one. status must
    # read the .old cursor instead of reporting null (r7 ADVICE —
    # mirrors CursorStore.read()).
    import logging
    import os
    import shutil

    bp, tp, _ = chain_dirs
    out = str(tmp_path / "p")
    cfg = cli.load_config(
        write_config(
            tmp_path / "s.toml", bp, tp, out, mode="rewards",
            backfill=True, atomic=False, block_range_size=20,
        )
    )
    cli.cmd_once(spark, cfg)
    cur = os.path.join(out, "_meta", "follower_info")
    shutil.move(cur, cur + ".old")
    capsys.readouterr()
    st = cli.cmd_status({"out_dir": out}, log=logging.getLogger("t"))
    assert st["height"] == 1059 and st["first_block"] == 1000
