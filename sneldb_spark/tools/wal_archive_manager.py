"""CLI for WAL archives — the counterpart of the reference's
`wal_archive_manager` binary (docs/src/design/wal_archiving.md "CLI tool").

Usage:
  sneldb-wal-archive <cmd> ...   (console script; python -m sneldb_spark.tools.wal_archive_manager also works)
  python tools/wal_archive_manager.py list <archive_dir>
  python tools/wal_archive_manager.py info <archive.wal.gz|zst>
  python tools/wal_archive_manager.py export <archive> <out.jsonl>
  python tools/wal_archive_manager.py recover <archive_dir>   # entry count + per-type totals (Spark scan)
  python tools/wal_archive_manager.py archive <wal.jsonl> <archive_dir>
"""

from __future__ import annotations

import os
import sys

from sneldb_spark.store import wal_archive as wa


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    cmd = sys.argv[1]
    if cmd == "list":
        archives = wa.list_archives(sys.argv[2])
        print(f"Found {len(archives)} archive(s):\n")
        for h in archives:
            print(
                f"  {os.path.basename(h['path'])} | log {h['log_id']} | "
                f"{h['n_entries']} entries | {h['bytes'] / 1024:.2f} KB | "
                f"ts [{h['ts_min']}, {h['ts_max']}] | {h['compression']}"
            )
    elif cmd == "info":
        for k, v in wa.read_header(sys.argv[2]).items():
            print(f"{k}: {v}")
    elif cmd == "export":
        n = wa.export_json(sys.argv[2], sys.argv[3])
        print(f"exported {n} entries -> {sys.argv[3]}")
    elif cmd == "recover":
        from sneldb_spark.session import get_spark, quiet_logs

        spark = get_spark(app_name="wal-recover")
        quiet_logs(spark)
        df = wa.recover_df(spark, sys.argv[2])
        counts = df.groupBy("t").count().collect()
        total = sum(r["count"] for r in counts)
        print(f"recoverable entries: {total}")
        for r in sorted(counts, key=lambda r: r["t"]):
            print(f"  {r['t']}: {r['count']}")
    elif cmd == "archive":
        path = wa.archive_wal_file(sys.argv[2], sys.argv[3])
        print(f"archived -> {path}")
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()
