"""CLI — the reference's operator surface (`helium-etl-lite start` /
`migrate` driven by settings.toml, reference src/main.rs:19-23,
src/settings.rs:33-48) re-expressed for the Spark engine.

Commands:
  migrate   initialize the output layout + schema manifest (the refinery
            migrations analog, reference src/migrate.rs:4-18)
  once      one catch-up pass: process (cursor, tip] and exit
  start     follow loop: catch up, then poll every `tick_seconds`
            (reference's 10 s tokio tick, src/main.rs:55-63), ctrl-c to
            stop gracefully (src/main.rs:48-52)
  sql       run ad-hoc SQL over the serving views (rewards /
            transactions / follower_info — what a reference user does
            with psql against the Postgres tables):
            ... sql --config settings.toml -e "SELECT ..."

Config (TOML, reference settings.toml keys where they translate):
  node_addr                 live blockchain-node JSON-RPC endpoint
                            (reference src/settings.rs:33) — follows the
                            chain via HttpRpcClient when set
  blocks_path / txns_path   parquet or JSON-lines chain source (landed
                            block data; used when node_addr is absent)
  out_dir                   output tables root (database_url analog)
  mode                      rewards | full | filters
  backfill                  true/false (same semantics as reference)
  filters_path              parquet with (type, value) for filters mode
  tick_seconds              poll interval for `start` (default 10)
  block_range_size          output partition granularity (default 1000)

Usage:
  python -m helium_etl_lite_spark.cli migrate --config settings.toml
  python -m helium_etl_lite_spark.cli once    --config settings.toml
  python -m helium_etl_lite_spark.cli start   --config settings.toml
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import signal
import sys
import time
import tomllib

from .etl.pipeline import FollowerConfig, IncrementalFollower
from .etl.schemas import (
    BLOCK_SCHEMA,
    REWARDS_OUT_SCHEMA,
    TRANSACTIONS_OUT_SCHEMA,
    TXN_SCHEMA,
)
from .session import get_spark


def load_config(path: str) -> dict:
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    if "node_addr" in cfg:
        required = ("out_dir",)  # live JSON-RPC source (reference settings.toml)
    else:
        required = ("blocks_path", "txns_path", "out_dir")
    for key in required:
        if key not in cfg:
            raise SystemExit(f"config missing required key: {key}")
    if str(cfg.get("mode", "rewards")) not in ("rewards", "full", "filters"):
        raise SystemExit(f"invalid mode: {cfg.get('mode')!r}")
    return cfg


def setup_logger(cfg) -> logging.Logger:
    """File logger when [log].log_dir is configured (the reference's
    flexi_logger-to-file setup, src/main.rs:70-89); stderr otherwise."""
    logger = logging.getLogger("helium_etl_lite_spark")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    log_dir = (cfg.get("log") or {}).get("log_dir")
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        handler: logging.Handler = logging.FileHandler(
            os.path.join(log_dir, "helium_etl_lite_spark.log")
        )
    else:
        handler = logging.StreamHandler()
    handler.setFormatter(fmt)
    logger.addHandler(handler)
    return logger


def _sources(spark, cfg):
    fmt = "json" if str(cfg["blocks_path"]).endswith((".json", ".jsonl")) or cfg.get(
        "source_format"
    ) == "json" else "parquet"
    reader_b = spark.read.schema(BLOCK_SCHEMA)
    reader_t = spark.read.schema(TXN_SCHEMA)
    if fmt == "json":
        return reader_b.json(cfg["blocks_path"]), reader_t.json(cfg["txns_path"])
    return reader_b.parquet(cfg["blocks_path"]), reader_t.parquet(cfg["txns_path"])


def _filters(spark, cfg):
    if cfg.get("mode") != "filters":
        return None
    if "filters_path" not in cfg:
        raise SystemExit("filters mode requires filters_path")
    return spark.read.parquet(cfg["filters_path"])


def _follower_config(cfg) -> FollowerConfig:
    return FollowerConfig(
        mode=str(cfg.get("mode", "rewards")),
        backfill=bool(cfg.get("backfill", False)),
        out_dir=str(cfg["out_dir"]),
        max_blocks_per_batch=cfg.get("max_blocks_per_batch"),
        block_range_size=int(cfg.get("block_range_size", 1000)),
        # atomic = true switches to the snapshot-manifest sink: data +
        # cursor publish in one rename (etl/snapshot.py).
        atomic=bool(cfg.get("atomic", False)),
    )


def _follower(spark, cfg) -> IncrementalFollower:
    blocks, txns = _sources(spark, cfg)
    return IncrementalFollower(
        spark, blocks, txns, _follower_config(cfg), filters=_filters(spark, cfg)
    )


def _catch_up(spark, cfg) -> tuple[int, tuple[int, int]]:
    """One catch-up pass via the configured source: live JSON-RPC when
    node_addr is set (reference settings.node_addr, src/settings.rs:33),
    landed block files otherwise. Returns (blocks loaded, cursor)."""
    if "node_addr" in cfg:
        from .etl.pipeline import CursorStore, rpc_catch_up
        from .sources.block_source import HttpRpcClient

        client = HttpRpcClient(str(cfg["node_addr"]))
        fc = _follower_config(cfg)
        n = rpc_catch_up(spark, client, fc, filters=_filters(spark, cfg))
        if fc.atomic:
            from .etl.snapshot import SnapshotStore

            m = SnapshotStore(fc.out_dir).current()
            return n, (None if m is None else (m["height"], m["first_block"]))
        cur = CursorStore(spark, os.path.join(str(cfg["out_dir"]), "_meta", "follower_info")).read()
        return n, cur
    f = _follower(spark, cfg)
    n = f.catch_up()
    if f.config.atomic:
        from .etl.snapshot import SnapshotStore

        m = SnapshotStore(f.config.out_dir).current()
        return n, (None if m is None else (m["height"], m["first_block"]))
    return n, f.cursor.read()


def cmd_migrate(spark, cfg, log=None) -> None:
    """Create the output layout + a schema manifest — idempotent, like
    re-running refinery migrations."""
    out = str(cfg["out_dir"])
    os.makedirs(out, exist_ok=True)
    manifest = {
        "rewards": REWARDS_OUT_SCHEMA.simpleString(),
        "transactions": TRANSACTIONS_OUT_SCHEMA.simpleString(),
        "follower_info": "struct<height:bigint,first_block:bigint>",
        "partitioning": f"block_range = block div {cfg.get('block_range_size', 1000)}",
    }
    with open(os.path.join(out, "_schema_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    (log or setup_logger(cfg)).info(f"migrate: layout ready at {out}")


def cmd_once(spark, cfg, log=None) -> int:
    n, (height, first) = _catch_up(spark, cfg)
    (log or setup_logger(cfg)).info(
        f"once: loaded {n} blocks; cursor at {height} (first_block {first})"
    )
    return n


def cmd_start(spark, cfg, log=None, max_ticks: int | None = None) -> None:
    """Follow loop. max_ticks bounds the number of poll passes (tests);
    None = run until ctrl-c like the reference."""
    log = log or setup_logger(cfg)
    stop = {"flag": False}

    def on_sigint(sig, frame):  # graceful shutdown (reference src/main.rs:48-52)
        stop["flag"] = True
        log.info("start: shutdown requested; finishing current pass")

    signal.signal(signal.SIGINT, on_sigint)
    tick = float(cfg.get("tick_seconds", 10))
    while not stop["flag"]:
        try:
            n, cur = _catch_up(spark, cfg)
        except Exception as exc:
            # fail-stop per pass, retry next tick (reference logs the
            # block error and re-polls, src/follower.rs:86-93) — a
            # flaky node or a bad batch must not kill the follower;
            # the idempotent sink makes the retry converge.
            log.error(f"start: pass failed ({exc}); retrying next tick")
            n = 0
        else:
            if n:
                log.info(f"start: +{n} blocks, cursor {cur[0]}")
        if max_ticks is not None:
            max_ticks -= 1
            if max_ticks <= 0:
                break
        # sleep in small slices so ctrl-c is responsive
        deadline = time.monotonic() + tick
        while not stop["flag"] and time.monotonic() < deadline:
            time.sleep(0.2)
    log.info("start: stopped")


def cmd_sql(
    spark,
    cfg,
    sql_text: str,
    log=None,
    at_version: int | None = None,
    changes_since: int | None = None,
    change_key_cols: list[str] | None = None,
) -> int:
    """Serving-layer escape hatch: register the output tables under the
    reference's names (cursor-bounded committed view; --at-version
    time-travels an atomic sink; --changes-since N adds
    `<table>_changes` CDC views diffing version N -> the served one;
    --key-cols upgrades those views to the KEYED feed with
    update_preimage/update_postimage pairing) and run one SQL
    statement, printing up to 1000 rows. Returns the row count."""
    from . import serving

    serving.register_views(
        spark, str(cfg["out_dir"]), at_version=at_version,
        changes_since=changes_since, change_key_cols=change_key_cols,
    )
    out = spark.sql(sql_text)
    rows = out.limit(1000).collect()
    header = "\t".join(out.columns)
    print(header)
    for r in rows:
        print("\t".join("NULL" if v is None else str(v) for v in r))
    (log or setup_logger(cfg)).info(f"sql: {len(rows)} rows")
    return len(rows)


def cmd_status(cfg, log=None) -> dict:
    """Operational status without a SparkSession (the reference's
    follower_info peek, src/follower.rs:123-142, plus the physical
    inventory an operator actually wants): cursor position, sink mode,
    snapshot version, and per-table partition/file/byte counts. Atomic
    sinks read everything from the manifest; plain sinks read the
    cursor with pyarrow and walk the table dirs."""
    import pyarrow.parquet as pq

    from .etl.snapshot import SnapshotStore

    out = str(cfg["out_dir"])
    status: dict = {"out_dir": out}

    def table_stats(paths: list[str]) -> dict:
        n_files = 0
        n_bytes = 0
        for p in paths:
            if not os.path.isdir(p):
                continue
            for f in os.listdir(p):
                if f.endswith(".parquet"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(p, f))
        return {"n_partitions": len(paths), "n_files": n_files, "n_bytes": n_bytes}

    store = SnapshotStore(out)
    m = store.current()
    if m is not None:
        status["sink"] = "atomic"
        status["snapshot_version"] = m["version"]
        status["height"] = m["height"]
        status["first_block"] = m["first_block"]
        status["tables"] = {
            t: table_stats(
                [
                    os.path.join(out, t, f"v={v}", f"block_range={r}")
                    for r, v in parts.items()
                ]
            )
            for t, parts in m["tables"].items()
        }
    else:
        status["sink"] = "plain"
        cursor_dir = os.path.join(out, "_meta", "follower_info")
        # Mirror CursorStore.read() (etl/pipeline.py): during the
        # two-rename cursor swap (or after a crash between renames) the
        # live cursor sits in follower_info.old — falling back there
        # keeps status truthful instead of reporting null (r7 ADVICE).
        status["height"] = None
        status["first_block"] = None
        for d in (cursor_dir, cursor_dir + ".old"):
            try:
                t = pq.read_table(d)
            except (FileNotFoundError, OSError):
                continue
            if t.num_rows:
                status["height"] = int(t.column("height")[0].as_py())
                status["first_block"] = int(t.column("first_block")[0].as_py())
                break
        status["tables"] = {}
        for table in ("rewards", "transactions"):
            tdir = os.path.join(out, table)
            if os.path.isdir(tdir):
                parts = [
                    os.path.join(tdir, d)
                    for d in os.listdir(tdir)
                    if d.startswith("block_range=")
                ]
                status["tables"][table] = table_stats(parts)
    print(json.dumps(status, indent=1, sort_keys=True))
    (log or setup_logger(cfg)).info(f"status: {status['sink']} sink at {out}")
    return status


def cmd_vacuum(cfg, keep_versions: int, log=None) -> list[str]:
    """Reclaim snapshot-sink data directories no kept version references
    (atomic = true sinks only). Needs no SparkSession — pure manifest
    bookkeeping."""
    from .etl.snapshot import SnapshotStore

    store = SnapshotStore(str(cfg["out_dir"]))
    if store.current_version() is None:
        raise SystemExit("vacuum: no snapshot store at out_dir (atomic sink only)")
    removed = store.vacuum(keep_versions=keep_versions)
    (log or setup_logger(cfg)).info(
        f"vacuum: removed {len(removed)} version dirs (kept last {keep_versions})"
    )
    return removed


def cmd_compact(spark, cfg, target_mb: int = 128, log=None) -> dict:
    """Maintenance: merge the small files the append loop accumulates
    (one batch per pass — the parquet analog of the reference's
    one-INSERT-per-block append, src/reward.rs:38-44). Honors the sink
    mode: atomic=true compacts via a new snapshot version (committed
    partitions only, readers never torn, needs a later vacuum);
    otherwise per-partition in-place rewrite of the plain layout.
    Single-writer contract either way: don't run concurrently with the
    follower."""
    from .etl.compact import compact_partitioned_table, compact_snapshot

    log = log or setup_logger(cfg)
    out = str(cfg["out_dir"])
    target = int(target_mb) * 1024 * 1024
    if bool(cfg.get("atomic", False)):
        manifest = compact_snapshot(spark, out, target_file_bytes=target)
        if manifest is None:
            log.info("compact: nothing to compact (or no snapshot store)")
            return {}
        log.info(f"compact: published snapshot version {manifest['version']}")
        return manifest
    results: dict[str, dict] = {}
    for table in ("rewards", "transactions"):
        tdir = os.path.join(out, table)
        if os.path.isdir(tdir):
            r = compact_partitioned_table(spark, tdir, target_file_bytes=target)
            if r:
                results[table] = r
    n = sum(len(v) for v in results.values())
    log.info(f"compact: rewrote {n} partition(s) across {len(results)} table(s)")
    return results


def cmd_dedup_state(spark, state_path: str, action: str, target_mb: int = 128, log=None) -> dict:
    """Maintenance for the incremental-dedup state tables
    (operators/dedup.py dedup_state_add / minhash_state_add): `stats`
    reports physical rows/shards/files/bytes (append-only fold-ins mean
    replayed appends inflate `rows` until compaction); `compact` merges
    the one-file-per-fold-in accumulation and drops replay-duplicate
    rows, per shard, without changing probe results (the state is a
    set — tested)."""
    from .operators.dedup import dedup_state_compact, dedup_state_stats

    if action == "stats":
        out = dedup_state_stats(spark, state_path)
        print(json.dumps(out))
        return out
    rewritten = dedup_state_compact(spark, state_path, int(target_mb) * 1024 * 1024)
    out = {shard: {"files_before": b, "files_after": a} for shard, (b, a) in rewritten.items()}
    print(json.dumps({"rewritten_shards": len(out), "detail": out}))
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="helium_etl_lite_spark")
    p.add_argument(
        "command",
        choices=[
            "migrate", "once", "start", "sql", "vacuum", "compact",
            "dedup-state", "status",
        ],
    )
    p.add_argument("--config", help="TOML config path")
    p.add_argument(
        "--state-path", help="dedup-state: path of the persisted state table"
    )
    p.add_argument(
        "--action", choices=["stats", "compact"], default="stats",
        help="dedup-state: stats (default) or compact",
    )
    p.add_argument("-e", "--execute", help="SQL statement (sql command)")
    p.add_argument(
        "--at-version", type=int, default=None,
        help="sql: time-travel an atomic-sink store to this snapshot version",
    )
    p.add_argument(
        "--changes-since", type=int, default=None,
        help="sql: register <table>_changes CDC views diffing this "
        "snapshot version against the served one (atomic sinks only)",
    )
    p.add_argument(
        "--key-cols", default=None,
        help="sql: comma-separated key columns — upgrades the "
        "--changes-since views to the keyed feed (in-place changes "
        "pair as update_preimage/update_postimage)",
    )
    p.add_argument(
        "--keep-versions", type=int, default=2,
        help="vacuum: snapshot versions to keep (default 2)",
    )
    p.add_argument(
        "--target-mb", type=int, default=128,
        help="compact: target output file size in MiB (default 128)",
    )
    args = p.parse_args(argv)
    if args.command == "dedup-state":
        if not args.state_path:
            raise SystemExit("dedup-state requires --state-path")
        spark = get_spark("helium-cli-dedup-state")
        try:
            cmd_dedup_state(spark, args.state_path, args.action, args.target_mb)
        finally:
            spark.stop()
        return 0
    if not args.config:
        raise SystemExit(f"{args.command} requires --config")
    if args.command in ("vacuum", "compact", "status"):
        # maintenance verbs: only out_dir matters; skip source-path
        # validation
        with open(args.config, "rb") as f:
            cfg = tomllib.load(f)
        if "out_dir" not in cfg:
            raise SystemExit("config missing required key: out_dir")
        if args.command == "vacuum":
            cmd_vacuum(cfg, args.keep_versions)  # no Spark needed
            return 0
        if args.command == "status":
            cmd_status(cfg)  # no Spark needed
            return 0
    else:
        cfg = load_config(args.config)
    if args.command == "sql" and not args.execute:
        raise SystemExit("sql command requires -e/--execute")
    if getattr(args, "key_cols", None) and args.changes_since is None:
        raise SystemExit(
            "--key-cols only applies to the --changes-since CDC views; "
            "pass --changes-since N as well"
        )
    spark = get_spark(f"helium-cli-{args.command}")
    try:
        if args.command == "migrate":
            cmd_migrate(spark, cfg)
        elif args.command == "once":
            cmd_once(spark, cfg)
        elif args.command == "sql":
            cmd_sql(
                spark, cfg, args.execute, at_version=args.at_version,
                changes_since=args.changes_since,
                change_key_cols=(
                    [c.strip() for c in args.key_cols.split(",") if c.strip()]
                    if args.key_cols
                    else None
                ),
            )
        elif args.command == "compact":
            cmd_compact(spark, cfg, args.target_mb)
        else:
            cmd_start(spark, cfg)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
